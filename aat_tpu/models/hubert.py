"""HuBERT / wav2vec2 speech encoder in pure JAX.

Capability parity with the reference's use of ``transformers.HubertModel`` /
``Wav2Vec2Model`` as the segment audio encoder
(/root/reference/scripts/trainer_train.py:195-215,
/root/reference/src/aslm/modeling_aslm.py:165-229). Re-designed for TPU:
functional modules over explicit parameter pytrees, bf16-friendly matmuls
with float32 accumulation, static shapes, and attention that can route
through the Pallas flash kernel (aat_tpu.ops.attention).

Architecture (both families share it at inference time):
  conv feature extractor (7 strided 1-D convs, 'group' or 'layer' norm)
  → feature projection (LayerNorm → Linear → dropout)
  → convolutional relative positional embedding (grouped conv, weight-norm)
  → transformer encoder (post-LN 'base' or pre-LN 'stable layer norm' large)

Weights port from torch checkpoints via aat_tpu.utils.port.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = True
    feat_extract_norm: str = "layer"  # 'layer' (large) | 'group' (base)
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    layer_norm_eps: float = 1e-5
    do_stable_layer_norm: bool = True
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    feature_projection_dropout: float = 0.0
    hidden_dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    layerdrop: float = 0.0  # torch train-mode LayerDrop (whole-layer skip)
    attention_impl: str = "xla"  # 'xla' | 'pallas' (fused flash kernel)
    remat: bool = False  # rematerialize encoder layers (memory for FLOPs)
    # 'full': recompute the whole layer in the backward (max memory saving);
    # 'dots': jax dots_with_no_batch_dims_saveable — matmul outputs are kept,
    # so the backward recompute is elementwise-only plus the attention
    # kernel re-run (the QKV/out/FFN GEMMs, ~80% of a layer's recompute
    # FLOPs at whole-utterance lengths, run once instead of twice).
    remat_policy: str = "full"  # 'full' | 'dots'
    # Sequence parallelism (whole-utterance T≈1500): when set to a
    # jax.sharding.Mesh whose 'sp' axis has extent > 1, every attention
    # call runs Ulysses-style over that axis (parallel/sequence.py) —
    # activations shard time between layers, heads inside attention.
    # compare=False keeps the (frozen) config hashable/comparable without
    # dragging device topology into equality.
    sp_mesh: Optional[object] = dataclasses.field(
        default=None, compare=False, repr=False)
    # Pipeline parallelism: a Mesh whose 'pp' axis has extent > 1 runs the
    # encoder layer stack GPipe-style (parallel/pipeline.py) — stage-sharded
    # stacked layers, microbatched activations ring-passed via ppermute.
    pp_mesh: Optional[object] = dataclasses.field(
        default=None, compare=False, repr=False)
    pp_microbatches: int = 0  # 0 → 2 * pp (bubble fraction (pp-1)/(m+pp-1))

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads


def hubert_large_config() -> HubertConfig:
    """facebook/hubert-large-ls960-ft (the reference default encoder).

    attention_impl='pallas': the fused kernel is 1.51x faster end to end at
    whole-utterance lengths and matches XLA within bf16 noise at segment
    lengths (both measured on v5e).

    Dropout rates follow the HF HubertConfig defaults the checkpoint carries
    (train-mode parity: the reference's HF Trainer runs model.train(), which
    applies these even on the frozen encoder). Porting a real checkpoint
    should overwrite them from its config.json (zero-egress here)."""
    return HubertConfig(
        attention_impl="pallas",
        hidden_dropout=0.1,
        attention_dropout=0.1,
        activation_dropout=0.1,
        layerdrop=0.1,
    )


def hubert_base_config() -> HubertConfig:
    return HubertConfig(
        conv_bias=False,
        feat_extract_norm="group",
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=3072,
        do_stable_layer_norm=False,
    )


def wav2vec2_large_config() -> HubertConfig:
    """facebook/wav2vec2-large-lv60: same inference graph as hubert-large."""
    return HubertConfig(attention_impl="pallas")


def tiny_test_config() -> HubertConfig:
    """Small random config for hermetic parity tests against torch."""
    return HubertConfig(
        conv_dim=(16, 16, 16),
        conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2),
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
    )


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------


def np_rng_from(rng) -> np.random.Generator:
    """Host numpy RNG from a jax PRNG key or int seed. Init runs host-side:
    bulk numpy arrays avoid per-leaf device round-trips (which are both slow
    and flaky over remoted TPU backends)."""
    if isinstance(rng, (int, np.integer)):
        return np.random.default_rng(int(rng))
    data = np.asarray(jax.random.key_data(rng)).ravel()
    return np.random.default_rng(np.random.SeedSequence([int(x) for x in data]))


def init_hubert_params(rng, config: HubertConfig) -> dict:
    """Random-normal init (std 0.02), shapes match the ported checkpoint
    layout. Kernels are stored as [K, C_in, C_out] (NHC conv)."""
    r = np_rng_from(rng)
    std = 0.02

    def normal(*shape):
        return r.normal(0.0, std, shape).astype(np.float32)

    def dense(din, dout):
        return {"kernel": normal(din, dout), "bias": np.zeros((dout,), np.float32)}

    def layernorm(d):
        return {"scale": np.ones((d,), np.float32), "bias": np.zeros((d,), np.float32)}

    params: dict = {"feature_extractor": []}
    in_ch = 1
    for i, (dim, kernel) in enumerate(zip(config.conv_dim, config.conv_kernel)):
        layer = {"conv": {"kernel": normal(kernel, in_ch, dim)}}
        if config.conv_bias:
            layer["conv"]["bias"] = np.zeros((dim,), np.float32)
        if config.feat_extract_norm == "layer":
            layer["layer_norm"] = layernorm(dim)
        elif i == 0:  # 'group': group norm only on the first conv layer
            layer["group_norm"] = layernorm(dim)
        params["feature_extractor"].append(layer)
        in_ch = dim

    h = config.hidden_size
    params["feature_projection"] = {
        "layer_norm": layernorm(config.conv_dim[-1]),
        "projection": dense(config.conv_dim[-1], h),
    }
    params["pos_conv"] = {
        "kernel": normal(
            config.num_conv_pos_embeddings,
            h // config.num_conv_pos_embedding_groups, h,
        ),
        "bias": np.zeros((h,), np.float32),
    }
    params["layers"] = []
    for _ in range(config.num_hidden_layers):
        params["layers"].append({
            "attention": {
                "q": dense(h, h),
                "k": dense(h, h),
                "v": dense(h, h),
                "out": dense(h, h),
            },
            "layer_norm": layernorm(h),
            "feed_forward": {
                "intermediate": dense(h, config.intermediate_size),
                "output": dense(config.intermediate_size, h),
            },
            "final_layer_norm": layernorm(h),
        })
    params["encoder_layer_norm"] = layernorm(h)
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_norm(x, p, eps):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)
    return (out + p["bias"].astype(jnp.float32)).astype(x.dtype)


def _dense(x, p):
    return jnp.einsum("...i,io->...o", x, p["kernel"],
                      preferred_element_type=jnp.float32).astype(x.dtype) + p["bias"]


def _dense_row_parallel(x, p, tp_axis):
    """Row-parallel dense for manual tensor parallelism inside a pipeline
    body (input dim tp-sliced → psum partial products, add the replicated
    bias once). ``tp_axis=None`` degrades to :func:`_dense`."""
    y = jnp.einsum("...i,io->...o", x, p["kernel"],
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if tp_axis is not None:
        y = jax.lax.psum(y, tp_axis)
    return y + p["bias"]


def tp_partitionable(config: "HubertConfig", tp: int) -> bool:
    """True when the encoder stack's widths split evenly across ``tp``
    (attention heads and the FF hidden) — gates Megatron-style tp inside
    the pipelined stack."""
    return (
        tp > 1
        and config.num_attention_heads % tp == 0
        and config.intermediate_size % tp == 0
    )


def _conv1d(x, kernel, bias=None, stride=1, padding="VALID", groups=1):
    """NHC conv: x [B, L, C_in], kernel [K, C_in/groups, C_out].

    No preferred_element_type: the conv transpose rule requires matching
    dtypes (an f32-upcast output would feed an f32 cotangent against bf16
    operands in backward), and TPU bf16 convs already accumulate in f32 on
    the MXU.
    """
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel, x.dtype),
        window_strides=(stride,),
        padding=padding,
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + jnp.asarray(bias, x.dtype)
    return out


def _conv1d_im2col(x, kernel, bias=None, stride=1):
    """Strided VALID 1-D conv as an explicit patch-matmul (im2col).

    Forward is equivalent to ``_conv1d`` (MXU dot, f32 accumulation), but the
    payoff is the BACKWARD: autodiff of ``lax.conv`` with stride s emits a
    transposed conv with ``lhs_dilate=s`` whose MACs are half zeros at s=2,
    and a ``rhs_dilate=s`` weight-grad conv with the same waste. Autodiff of
    slice+dot instead gives full-width matmuls (dx = pad-scatter of
    dout·Wᵀ — the zero-insertion moves to a cheap elementwise pad; dW =
    patchesᵀ·dout). Measured on v5e this lifts the hubert-large conv stack
    from ~65 to matmul-class TFLOP/s in the training step.
    """
    k = kernel.shape[0]
    lo = (x.shape[1] - k) // stride + 1
    # [B, Lo, K, C]: k strided views of x, stacked on a new axis
    patches = jnp.stack(
        [x[:, j : j + stride * (lo - 1) + 1 : stride, :] for j in range(k)],
        axis=2,
    )
    out = jnp.einsum("blkc,kco->blo", patches, jnp.asarray(kernel, x.dtype),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + jnp.asarray(bias, x.dtype)
    return out


def _conv1d_s2d(x, kernel, bias=None, stride=2):
    """Stride-2 VALID conv as space-to-depth + dense GEMMs.

    ``[B, T, C] → [B, T//2, 2C]`` is a CONTIGUOUS row-major reshape (element
    (b, t, c) ↦ (b, t//2, (t%2)·C + c)); a K-tap stride-2 window then covers
    ⌈K/2⌉ consecutive s2d rows, so the conv is ⌈K/2⌉ full-width matmuls
    summed — no im2col patch tensor (K× activation traffic), no strided
    slices, and autodiff emits plain transposed GEMMs (dx = shifted pad-adds,
    dW = dense GEMMs) instead of the lhs/rhs-dilated convs whose MACs are
    half zeros at stride 2. The odd-T pad row below is never read by a valid
    output window: the W_a term reads s2d rows [0, lo), i.e. input rows up
    to 2·lo−1 = T−K+1 ≤ T−1, and the K=3 W_b term reads only channels [:C]
    (input row 2·lo = T−1) of s2d row lo."""
    k, cin, cout = kernel.shape
    b, t, c = x.shape
    lo = (t - k) // 2 + 1
    if t % 2:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))
        t += 1
    x2 = x.reshape(b, t // 2, 2 * c)
    w = jnp.asarray(kernel, x.dtype)
    if k == 2:
        out = jnp.einsum(
            "btc,co->bto", x2[:, :lo], w.reshape(2 * c, cout),
            preferred_element_type=jnp.float32,
        )
    else:  # k == 3
        out = jnp.einsum(
            "btc,co->bto", x2[:, :lo], w[:2].reshape(2 * c, cout),
            preferred_element_type=jnp.float32,
        ) + jnp.einsum(
            "btc,co->bto", x2[:, 1 : lo + 1, :c], w[2],
            preferred_element_type=jnp.float32,
        )
    out = out.astype(x.dtype)
    if bias is not None:
        out = out + jnp.asarray(bias, x.dtype)
    return out


def _conv_stack(params, config: HubertConfig, x: jnp.ndarray) -> jnp.ndarray:
    """The raw conv stack over [B, L, 1] → [B, T, conv_dim[-1]]."""
    for i, layer in enumerate(params["feature_extractor"]):
        kernel_size = layer["conv"]["kernel"].shape[0]
        if x.shape[-1] < 128:
            conv = _conv1d
        elif config.conv_stride[i] == 2 and kernel_size in (2, 3):
            conv = _conv1d_s2d
        else:
            conv = _conv1d_im2col
        x = conv(
            x, layer["conv"]["kernel"], layer["conv"].get("bias"),
            stride=config.conv_stride[i],
        )
        if "layer_norm" in layer:
            x = _layer_norm(x, layer["layer_norm"], config.layer_norm_eps)
        if "group_norm" in layer:
            # torch GroupNorm(num_groups=dim, num_channels=dim): per-channel
            # normalization over the length dimension.
            mean = jnp.mean(x, axis=-2, keepdims=True)
            var = jnp.var(x, axis=-2, keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + config.layer_norm_eps)
            x = x * layer["group_norm"]["scale"] + layer["group_norm"]["bias"]
        x = jax.nn.gelu(x, approximate=False)
    return x


def conv_receptive_field(config: HubertConfig):
    """(receptive_field, total_stride) of the conv stack in samples."""
    rf, stride = 1, 1
    for k, s in zip(config.conv_kernel, config.conv_stride):
        rf += (k - 1) * stride
        stride *= s
    return rf, stride


_CHUNK_TARGET_ROWS = 16  # fills the 8-sublane tiles with headroom


def feature_extractor(params, config: HubertConfig, waveform: jnp.ndarray) -> jnp.ndarray:
    """[B, L] → [B, T, conv_dim[-1]] (49.95 Hz frame rate at 16 kHz).

    Small-batch long waveforms (the whole-utterance path: B=2, L=480k) are
    CHUNKED before the stack: XLA lays [2, 95999, 512] conv activations out
    at T(2,128) tiling — 2/8 sublane occupancy, a 4× bandwidth tax on every
    LayerNorm/GELU/im2col op in the stack (measured ~100+ ms of a 234 ms
    whole-utterance device step). Each row splits into overlapping chunks
    whose input windows carry the stack's receptive-field halo, the stack
    runs at [B·K, L', C] (full sublanes), and the outputs concatenate —
    VALID convolutions compose, so every retained frame sees exactly the
    same input window and the result is bit-identical to the unchunked
    stack (tests pin equality). Per-position norms chunk freely; the 'group'
    norm (hubert-base) normalizes over LENGTH and disables chunking."""
    b, l = waveform.shape
    x = waveform[..., None]  # [B, L, 1]
    rf, stride = conv_receptive_field(config)
    frames_total = l  # static python arithmetic (the per-layer floors)
    for kk, s in zip(config.conv_kernel, config.conv_stride):
        frames_total = (frames_total - kk) // s + 1
    k = max(1, -(-_CHUNK_TARGET_ROWS // b))
    if (b >= _CHUNK_TARGET_ROWS or config.feat_extract_norm != "layer"
            or frames_total < 4 * k or l < 8 * rf):
        return _conv_stack(params, config, x)

    frames_per = -(-frames_total // k)
    in_per = (frames_per - 1) * stride + rf
    # every chunk layer length must divide exactly (no floor slack), or a
    # chunk would emit frames at shifted windows — fall back if not
    ln = in_per
    for kk, s in zip(config.conv_kernel, config.conv_stride):
        if (ln - kk) % s:
            return _conv_stack(params, config, x)
        ln = (ln - kk) // s + 1
    assert ln == frames_per, (ln, frames_per)
    # chunk c covers output frames [c·frames_per, (c+1)·frames_per) and
    # reads samples [c·frames_per·stride, c·frames_per·stride + in_per)
    l_need = (k - 1) * frames_per * stride + in_per
    if l_need > l:
        x = jnp.pad(x, ((0, 0), (0, l_need - l), (0, 0)))
    chunks = jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(x, c * frames_per * stride, in_per,
                                         axis=1)
            for c in range(k)
        ],
        axis=1,
    )  # [B, K, in_per, 1]
    y = _conv_stack(params, config,
                    chunks.reshape(b * k, in_per, 1))  # [B·K, frames_per, C]
    y = y.reshape(b, k * frames_per, y.shape[-1])
    return y[:, :frames_total]


def feature_lengths(config: HubertConfig, input_lengths: jnp.ndarray) -> jnp.ndarray:
    """Conv output lengths (the torch ``_get_feat_extract_output_lengths``)."""
    lengths = input_lengths
    for kernel, stride in zip(config.conv_kernel, config.conv_stride):
        lengths = (lengths - kernel) // stride + 1
    return lengths


def feature_vector_attention_mask(
    config: HubertConfig, feature_seq_len: int, attention_mask: jnp.ndarray
) -> jnp.ndarray:
    """[B, L] sample mask → [B, T] frame mask (reference encode_audio uses the
    torch twin at src/aslm/modeling_aslm.py:217)."""
    out_lens = feature_lengths(config, attention_mask.sum(-1))
    return jnp.arange(feature_seq_len)[None, :] < out_lens[:, None]


_POS_CHUNK_TARGET_ROWS = 8  # rows needed to fill the 8-sublane tiles


def _pos_conv_embedding(params, config: HubertConfig, hidden: jnp.ndarray) -> jnp.ndarray:
    """Grouped relative-positional conv + GELU (wav2vec2 SamePad semantics).

    Small-batch long sequences (whole-utterance: B=2, T≈1500) are chunked
    along time like ``feature_extractor``: XLA tiles the [2, T, G, C/G] conv
    at T(2,128) — 2/8 sublane occupancy — which traced at ~7.8 ms/step of
    the whole-utterance train step (fwd 2.1 ms + input/filter grads 5.7 ms
    at ~10 TFLOP/s). Splitting each row into K stride-1 chunks that carry
    the kernel's k−1 halo runs the conv at [B·K, T/K + k − 1, C] (full
    sublanes) and is mathematically identical: every retained output frame
    sees exactly the same input window (VALID convolutions compose).
    Bitwise-equal on CPU; on the TPU the different conv batch shape can pick
    a different f32 reduction order (measured ≤2.4e-6 at [2,1500,1024]).
    """
    k = config.num_conv_pos_embeddings
    pad = k // 2
    groups = config.num_conv_pos_embedding_groups
    kernel, bias = params["pos_conv"]["kernel"], params["pos_conv"]["bias"]
    b, t, c = hidden.shape
    x = jnp.pad(hidden, ((0, 0), (pad, pad), (0, 0)))  # [B, T + 2·pad, C]
    nchunks = max(1, -(-_POS_CHUNK_TARGET_ROWS // b))
    frames_per = -(-t // nchunks)
    # chunk only when rows are short of a sublane tile AND the halo overhead
    # (k−1 extra frames per chunk) stays below the 4× tiling win
    if nchunks == 1 or frames_per < k:
        out = _conv1d(x, kernel, bias, groups=groups)
        if k % 2 == 0:  # SamePad: drop the trailing element for even kernels
            out = out[:, :-1, :]
        return jax.nn.gelu(out, approximate=False)
    in_per = frames_per + k - 1  # stride-1 VALID window for frames_per outputs
    need = (nchunks - 1) * frames_per + in_per
    if need > x.shape[1]:
        # frames ≥ t are sliced off below; frames < t never read the extra pad
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[1]), (0, 0)))
    chunks = jnp.stack(
        [
            jax.lax.dynamic_slice_in_dim(x, ci * frames_per, in_per, axis=1)
            for ci in range(nchunks)
        ],
        axis=1,
    )  # [B, K, in_per, C]
    y = _conv1d(chunks.reshape(b * nchunks, in_per, c), kernel, bias,
                groups=groups)  # [B·K, frames_per, C]
    y = jax.nn.gelu(y, approximate=False)
    return y.reshape(b, nchunks * frames_per, c)[:, :t]


def _attention(params, config: HubertConfig, x: jnp.ndarray,
               frame_mask: Optional[jnp.ndarray], dropout_rng=None,
               tp_axis=None):
    b, t, h = x.shape
    # head count derives from the KERNEL shape: inside a tp-sliced pipeline
    # body the qkv kernels hold nh/tp heads (outside it equals the config)
    hd = config.head_dim
    nh = params["q"]["kernel"].shape[-1] // hd
    # heads split by reshape only — attention_bthd keeps the [B,T,H,D]
    # layout end to end, so no permute ever materializes at segment lengths
    q = _dense(x, params["q"]).reshape(b, t, nh, hd)
    k = _dense(x, params["k"]).reshape(b, t, nh, hd)
    v = _dense(x, params["v"]).reshape(b, t, nh, hd)

    key_mask = (
        frame_mask.astype(jnp.int32)
        if frame_mask is not None
        else jnp.ones((b, t), jnp.int32)
    )
    from aat_tpu.ops.attention import attention_bthd
    from aat_tpu.ops.dropout import attention_seed

    seed = attention_seed(dropout_rng)
    if seed is not None and tp_axis is not None and config.attention_dropout > 0.0:
        # the in-kernel dropout hash keys on the kernel-LOCAL head index;
        # tp-sliced head groups would regenerate identical masks — salt by
        # the tp shard index (same recipe as parallel/sequence.py)
        seed = (jnp.asarray(seed, jnp.int32)
                + jax.lax.axis_index(tp_axis) * jnp.int32(0x3C6EF35F))
    kwargs = dict(
        sm_scale=hd ** -0.5,
        use_pallas=config.attention_impl == "pallas",
        dropout_rate=config.attention_dropout,
        dropout_seed=seed,
    )
    sp_mesh = config.sp_mesh
    if sp_mesh is not None and sp_mesh.shape.get("sp", 1) > 1:
        from aat_tpu.parallel.sequence import ulysses_attention_bthd

        ctx = ulysses_attention_bthd(q, k, v, key_mask, sp_mesh, **kwargs)
    else:
        ctx = attention_bthd(q, k, v, key_mask, causal=False, **kwargs)
    return _dense_row_parallel(ctx.reshape(b, t, nh * hd), params["out"],
                               tp_axis)


def _feed_forward(params, x, config: HubertConfig, dropout_rng=None,
                  tp_axis=None):
    from aat_tpu.ops.dropout import dropout

    y = jax.nn.gelu(_dense(x, params["intermediate"]), approximate=False)
    if dropout_rng is not None:
        # HF HubertFeedForward: intermediate_dropout (activation_dropout)
        # then output_dropout (hidden_dropout)
        k1, k2 = jax.random.split(dropout_rng)
        if tp_axis is not None:
            # activation dropout acts on the tp-SLICED hidden — positional
            # masks would repeat across column groups; salt per shard.
            # (k2's mask acts on the post-psum REPLICATED output and must
            # stay shard-identical — unsalted.)
            k1 = jax.random.fold_in(k1, jax.lax.axis_index(tp_axis))
        y = dropout(k1, y, config.activation_dropout)
        return dropout(
            k2, _dense_row_parallel(y, params["output"], tp_axis),
            config.hidden_dropout)
    return _dense_row_parallel(y, params["output"], tp_axis)


def encoder(params, config: HubertConfig, hidden: jnp.ndarray,
            frame_mask: Optional[jnp.ndarray], dropout_rng=None) -> jnp.ndarray:
    """Transformer encoder. ``dropout_rng`` enables torch train-mode
    regularization: hidden dropout after the positional conv, per-layer
    attention-prob / hidden / activation dropout, and LayerDrop
    (HF HubertEncoder[StableLayerNorm] train semantics)."""
    from aat_tpu.ops.dropout import dropout

    eps = config.layer_norm_eps
    if frame_mask is not None:
        hidden = hidden * frame_mask[..., None].astype(hidden.dtype)

    hidden = hidden + _pos_conv_embedding(params, config, hidden)
    if not config.do_stable_layer_norm:
        hidden = _layer_norm(hidden, params["encoder_layer_norm"], eps)
    if dropout_rng is not None:
        dropout_rng, k = jax.random.split(dropout_rng)
        hidden = dropout(k, hidden, config.hidden_dropout)

    # Pre-pad the sequence ONCE to the flash kernel's block multiple (pad
    # rows masked) so the per-layer q/k/v pads + output slices inside the
    # attention wrapper become no-ops — 24 layers × fwd+bwd of [B,T,H] pad
    # traffic at whole-utterance shapes. Row-wise ops (LN/MLP) on masked pad
    # rows don't feed real rows, and masked attention ignores pad keys, so
    # real-row outputs are unchanged. Gated at ≤10% extra rows: short-T
    # paths (segments) and poorly-aligned lengths keep per-call padding.
    from aat_tpu.ops.attention import padded_seq_len

    t_real = hidden.shape[1]
    t_pad = padded_seq_len(t_real, causal=False)
    if t_real < t_pad <= int(1.1 * t_real):
        hidden = jnp.pad(hidden, ((0, 0), (0, t_pad - t_real), (0, 0)))
        fm = (frame_mask if frame_mask is not None
              else jnp.ones((hidden.shape[0], t_real), jnp.int32))
        frame_mask = jnp.pad(fm, ((0, 0), (0, t_pad - t_real)))

    # Megatron-style tp inside the pipeline body: decided here (static) so
    # it binds as a closure default — jax.checkpoint below can't forward a
    # string kwarg
    pp_mesh = config.pp_mesh
    tp_in_pipe = None
    if pp_mesh is not None and pp_mesh.shape.get("pp", 1) > 1:
        if tp_partitionable(config, pp_mesh.shape.get("tp", 1)):
            tp_in_pipe = "tp"

    def layer_step(hidden, layer, rng, fm=frame_mask, tp_axis=tp_in_pipe):
        k_attn = k_res1 = k_ff = None
        if rng is not None:
            k_attn, k_res1, k_ff = jax.random.split(rng, 3)
        if config.do_stable_layer_norm:  # pre-LN (large)
            attn_in = _layer_norm(hidden, layer["layer_norm"], eps)
            attn_out = _attention(layer["attention"], config, attn_in,
                                  fm, k_attn, tp_axis=tp_axis)
            if rng is not None:
                attn_out = dropout(k_res1, attn_out, config.hidden_dropout)
            hidden = hidden + attn_out
            ff_in = _layer_norm(hidden, layer["final_layer_norm"], eps)
            hidden = hidden + _feed_forward(layer["feed_forward"], ff_in,
                                            config, k_ff, tp_axis=tp_axis)
        else:  # post-LN (base)
            attn_out = _attention(layer["attention"], config, hidden,
                                  fm, k_attn, tp_axis=tp_axis)
            if rng is not None:
                attn_out = dropout(k_res1, attn_out, config.hidden_dropout)
            hidden = hidden + attn_out
            hidden = _layer_norm(hidden, layer["layer_norm"], eps)
            hidden = hidden + _feed_forward(layer["feed_forward"], hidden,
                                            config, k_ff, tp_axis=tp_axis)
            hidden = _layer_norm(hidden, layer["final_layer_norm"], eps)
        return hidden

    if config.remat:
        policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                  if config.remat_policy == "dots" else None)
        layer_step = jax.checkpoint(layer_step, policy=policy)

    if pp_mesh is not None and pp_mesh.shape.get("pp", 1) > 1:
        hidden = _encoder_pipelined(params, config, hidden, frame_mask,
                                    dropout_rng, layer_step, pp_mesh)
    else:
        from aat_tpu.parallel.pipeline import layer_seq

        for idx, layer in enumerate(
                layer_seq(params["layers"], config.num_hidden_layers)):
            rng = (
                jax.random.fold_in(dropout_rng, idx)
                if dropout_rng is not None else None
            )
            new_hidden = layer_step(hidden, layer, rng)
            if dropout_rng is not None and config.layerdrop > 0.0:
                # torch LayerDrop: one draw per layer per step skips the
                # whole layer for the whole batch (compute-then-select keeps
                # shapes static; no FLOPs saved, semantics preserved)
                keep = jax.random.bernoulli(
                    jax.random.fold_in(rng, 1 << 20), 1.0 - config.layerdrop
                )
                new_hidden = jnp.where(keep, new_hidden, hidden)
            hidden = new_hidden

    if config.do_stable_layer_norm:
        hidden = _layer_norm(hidden, params["encoder_layer_norm"], eps)
    return hidden[:, :t_real]


def _encoder_pipelined(params, config: HubertConfig, hidden, frame_mask,
                       dropout_rng, layer_step, pp_mesh):
    """GPipe the layer stack over the 'pp' mesh axis (parallel/pipeline.py).

    LayerDrop draws key on the GLOBAL layer index exactly like the plain
    loop (one draw per layer per step), so drop decisions match a 1-device
    run bit for bit. Per-layer dropout keys additionally fold the
    microbatch index (masks are valid but decorrelated from 1-dev — the
    microbatch slice changes elementwise positions anyway). Incompatible
    with sp>1 (nested shard_map); the trainer enforces the exclusion."""
    from aat_tpu.parallel.pipeline import (
        gpipe_apply, is_stacked, stack_layers, stacked_layer_specs)

    pp = pp_mesh.shape["pp"]
    sp_mesh = config.sp_mesh
    assert sp_mesh is None or sp_mesh.shape.get("sp", 1) == 1, \
        "pipeline and sequence parallelism cannot nest in the encoder"
    microbatches = config.pp_microbatches or 2 * pp
    # stage-resident masters arrive pre-stacked (trainer stacks them at
    # placement; leading dim lives sharded P('pp') — zero resharding here)
    stacked = (params["layers"] if is_stacked(params["layers"])
               else stack_layers(params["layers"]))
    tp_n = pp_mesh.shape.get("tp", 1)
    tp_in_pipe = tp_partitionable(config, tp_n)
    fm = (frame_mask if frame_mask is not None
          else jnp.ones(hidden.shape[:2], jnp.int32))
    has_drop = dropout_rng is not None
    shared = (dropout_rng,) if has_drop else ()

    def layer_fn(h, layer, gidx, mb_idx, fm_mb, *maybe_key):
        rng = None
        if has_drop:
            rng = jax.random.fold_in(
                jax.random.fold_in(maybe_key[0], gidx), mb_idx + (1 << 16))
        new_h = layer_step(h, layer, rng, fm=fm_mb)
        if has_drop and config.layerdrop > 0.0:
            keep = jax.random.bernoulli(
                jax.random.fold_in(
                    jax.random.fold_in(maybe_key[0], gidx), 1 << 20),
                1.0 - config.layerdrop)
            new_h = jnp.where(keep, new_h, h)
        return new_h

    return gpipe_apply(
        layer_fn, stacked, hidden, (fm,), shared, pp_mesh,
        num_layers=config.num_hidden_layers, microbatches=microbatches,
        layer_specs=stacked_layer_specs(stacked, tp_n if tp_in_pipe else 1,
                                        fsdp=pp_mesh.shape.get("fsdp", 1)),
    )


def hubert_encode(
    params: dict,
    config: HubertConfig,
    waveform: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    dropout_rng=None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Full encoder: [B, L] waveforms → ([B, T, H] frames, [B, T] frame mask).

    Mirrors ``HubertModel.forward`` (mask_time_prob=0, the reference loads
    encoders that way, scripts/trainer_train.py:204). Passing ``dropout_rng``
    selects torch train-mode semantics (dropout active per the config
    rates); omitting it gives eval/inference semantics.
    """
    from aat_tpu.ops.dropout import dropout

    features = feature_extractor(params, config, waveform)
    frame_mask = None
    if attention_mask is not None:
        frame_mask = feature_vector_attention_mask(
            config, features.shape[1], attention_mask
        )
    fp = params["feature_projection"]
    hidden = _layer_norm(features, fp["layer_norm"], config.layer_norm_eps)
    hidden = _dense(hidden, fp["projection"])
    k_fp = k_enc = None
    if dropout_rng is not None:
        k_fp, k_enc = jax.random.split(dropout_rng)
        hidden = dropout(k_fp, hidden, config.feature_projection_dropout)
    hidden = encoder(params, config, hidden, frame_mask, k_enc)
    return hidden, frame_mask
