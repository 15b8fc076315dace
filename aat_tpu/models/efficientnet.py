"""EfficientNet-b0 audio encoder adapter in pure JAX.

Capability parity with ``EfficientNetAudioEncdoerAdapter``
(/root/reference/src/aslm/modeling_aslm.py:66-93): consume per-segment
mel-spectrograms ``[bs, 1, n_mels, T]``, repeat to 3 channels, run
EfficientNet-b0 without its classifier head, return a
``last_hidden_state`` of shape ``[bs, 1, 1280]`` and an all-ones feature
mask (:91-93).

Architecture: standard EfficientNet-b0 (stem conv → 16 MBConv blocks with
squeeze-excitation → 1x1 head conv → global average pool), TF-SAME padding
(matching the reference's Conv2dStaticSamePadding), SiLU activations.

Batch norm runs in both torch modes: inference (running statistics) and
train (batch statistics + running-stat EMA). The reference's HF Trainer
calls ``model.train()``, so its EfficientNet BN normalizes with batch
stats and EMAs the running stats during every training step — even when
the encoder's weights are frozen (scripts/trainer_train.py:216-225).
``efficientnet_features(..., train=True)`` reproduces that: it normalizes
with the current batch's statistics and returns the batch stats so the
caller can fold them into the running estimates with
``apply_bn_updates`` (torch updates running_var with the *unbiased*
variance while normalizing with the biased one; momentum 0.01 matches
lukemelas/EfficientNet-PyTorch's ``1 - batch_norm_momentum``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# (expand_ratio, channels, repeats, stride, kernel) per stage — b0.
_B0_BLOCKS = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]
_STEM_CH = 32
_HEAD_CH = 1280
_SE_RATIO = 0.25
_BN_EPS = 1e-3
BN_MOMENTUM = 0.01  # lukemelas b0: 1 - batch_norm_momentum (0.99)


@dataclasses.dataclass(frozen=True)
class EfficientNetConfig:
    hidden_size: int = _HEAD_CH
    in_channels: int = 3


def _conv_params(r, k, cin, cout, groups=1):
    fan = k * k * cin // groups
    return {"kernel": (r.normal(0, np.sqrt(2.0 / max(fan, 1)), (k, k, cin // groups, cout))
                        ).astype(np.float32)}


def _bn_params(c):
    return {
        "scale": np.ones((c,), np.float32),
        "bias": np.zeros((c,), np.float32),
        "mean": np.zeros((c,), np.float32),
        "var": np.ones((c,), np.float32),
    }


def block_specs():
    """Static per-block metadata (stride, kernel, cin, cout, expand) for b0;
    kept out of the parameter pytree so grads see only arrays."""
    specs = []
    cin = _STEM_CH
    for t, c, n, s, k in _B0_BLOCKS:
        for i in range(n):
            specs.append({
                "stride": s if i == 0 else 1, "kernel": k,
                "cin": cin, "cout": c, "expand": t,
            })
            cin = c
    return specs


def init_efficientnet_params(seed: int = 0) -> dict:
    r = np.random.default_rng(seed)
    params: dict = {
        "stem": {"conv": _conv_params(r, 3, 3, _STEM_CH), "bn": _bn_params(_STEM_CH)},
        "blocks": [],
        "head": {"conv": _conv_params(r, 1, 320, _HEAD_CH), "bn": _bn_params(_HEAD_CH)},
    }
    for spec in block_specs():
        cin, c, t, k = spec["cin"], spec["cout"], spec["expand"], spec["kernel"]
        mid = cin * t
        p = {}
        if t != 1:
            p["expand_conv"] = _conv_params(r, 1, cin, mid)
            p["expand_bn"] = _bn_params(mid)
        p["dw_conv"] = _conv_params(r, k, mid, mid, groups=mid)
        p["dw_bn"] = _bn_params(mid)
        se = max(1, int(cin * _SE_RATIO))
        p["se_reduce"] = {
            "kernel": _conv_params(r, 1, mid, se)["kernel"],
            "bias": np.zeros((se,), np.float32),
        }
        p["se_expand"] = {
            "kernel": _conv_params(r, 1, se, mid)["kernel"],
            "bias": np.zeros((mid,), np.float32),
        }
        p["project_conv"] = _conv_params(r, 1, mid, c)
        p["project_bn"] = _bn_params(c)
        params["blocks"].append(p)
    return params


def _conv2d(x, kernel, stride=1, groups=1):
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(kernel),
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _bn(x, p, batch_stats=None):
    """Inference BN (running stats), or — given ``batch_stats=(mean, var)``
    — torch train-mode BN (normalize with the batch's biased statistics)."""
    if batch_stats is None:
        mean, var = jnp.asarray(p["mean"]), jnp.asarray(p["var"])
    else:
        mean, var = batch_stats
    inv = jax.lax.rsqrt(var + _BN_EPS)
    return (x - mean) * inv * jnp.asarray(p["scale"]) + jnp.asarray(p["bias"])


def _batch_stats(x):
    """Per-channel statistics over (N, H, W), computed in f32: the
    compute-dtype (mean, biased var) pair normalizes the batch, while the
    f32 (mean, unbiased var) pair feeds the running-stat EMA — torch keeps
    running stats in f32 regardless of input dtype, so rounding the stored
    mean to bf16 would accumulate drift the oracle doesn't have."""
    xf = x.astype(jnp.float32)
    n = x.shape[0] * x.shape[1] * x.shape[2]
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
    unbiased = var * (n / max(n - 1, 1))
    return mean.astype(x.dtype), var.astype(x.dtype), mean, unbiased


def _silu(x):
    return jax.nn.silu(x)


def efficientnet_features(params: dict, images: jnp.ndarray, train: bool = False):
    """[B, H, W, 3] → [B, 1280] pooled features.

    ``train=True`` normalizes every BN with the batch's statistics (torch
    ``.train()`` semantics) and returns ``(features, bn_stats)`` where
    ``bn_stats`` mirrors the params tree's BN subtrees with the batch
    ``{mean, var}`` (var unbiased, stop-gradient) for ``apply_bn_updates``.
    """
    stats: dict = {"stem": {}, "blocks": [], "head": {}}

    def bn(x, p, slot, key):
        if not train:
            return _bn(x, p)
        mean, var, mean32, unbiased = _batch_stats(x)
        slot[key] = {
            "mean": jax.lax.stop_gradient(mean32),
            "var": jax.lax.stop_gradient(unbiased),
        }
        return _bn(x, p, batch_stats=(mean, var))

    x = bn(_conv2d(images, params["stem"]["conv"]["kernel"], stride=2),
           params["stem"]["bn"], stats["stem"], "bn")
    x = _silu(x)
    for spec, p in zip(block_specs(), params["blocks"]):
        bstats: dict = {}
        inp = x
        if spec["expand"] != 1:
            x = _silu(bn(_conv2d(x, p["expand_conv"]["kernel"]), p["expand_bn"],
                         bstats, "expand_bn"))
        mid = x.shape[-1]
        x = _silu(bn(
            _conv2d(x, p["dw_conv"]["kernel"], stride=spec["stride"], groups=mid),
            p["dw_bn"], bstats, "dw_bn",
        ))
        # squeeze-excitation
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = _silu(_conv2d(se, p["se_reduce"]["kernel"]) + jnp.asarray(p["se_reduce"]["bias"]))
        se = jax.nn.sigmoid(_conv2d(se, p["se_expand"]["kernel"]) + jnp.asarray(p["se_expand"]["bias"]))
        x = x * se
        x = bn(_conv2d(x, p["project_conv"]["kernel"]), p["project_bn"],
               bstats, "project_bn")
        if spec["stride"] == 1 and spec["cin"] == spec["cout"]:
            x = x + inp
        stats["blocks"].append(bstats)
    x = _silu(bn(_conv2d(x, params["head"]["conv"]["kernel"]), params["head"]["bn"],
                 stats["head"], "bn"))
    pooled = jnp.mean(x, axis=(1, 2))  # global average pool → [B, 1280]
    if train:
        return pooled, stats
    return pooled


def apply_bn_updates(params: dict, bn_stats: dict,
                     momentum: float = BN_MOMENTUM) -> dict:
    """EMA the batch statistics from ``efficientnet_features(train=True)``
    into the running estimates: ``running = (1-m)*running + m*batch``
    (torch ``nn.BatchNorm2d`` update rule). Returns a new params tree;
    everything except BN ``mean``/``var`` leaves is shared untouched."""

    def merge(p, s):
        out = dict(p)
        for key, batch in s.items():
            if isinstance(batch, dict) and "mean" in batch:
                b = dict(p[key])
                b["mean"] = (1.0 - momentum) * jnp.asarray(p[key]["mean"], jnp.float32) \
                    + momentum * batch["mean"]
                b["var"] = (1.0 - momentum) * jnp.asarray(p[key]["var"], jnp.float32) \
                    + momentum * batch["var"]
                out[key] = b
        return out

    new = dict(params)
    new["stem"] = merge(params["stem"], bn_stats["stem"])
    new["head"] = merge(params["head"], bn_stats["head"])
    new["blocks"] = [merge(p, s) for p, s in zip(params["blocks"], bn_stats["blocks"])]
    return new


class EfficientNetAudioEncoderAdapter:
    """Reference adapter semantics (modeling_aslm.py:70-93)."""

    def __init__(self, config: EfficientNetConfig = EfficientNetConfig()):
        self.config = config
        # duck-type the HubertConfig surface AslmModel touches
        self.hidden_size = config.hidden_size

    def __call__(self, params: dict, melspec: jnp.ndarray, train: bool = False):
        """melspec ``[bs, 1, n_mels, T]`` (or ``[bs, n_mels, T]``) →
        last_hidden_state ``[bs, 1, 1280]`` — plus the batch BN statistics
        when ``train=True`` (see ``efficientnet_features``)."""
        if melspec.ndim == 3:
            melspec = melspec[:, None, :, :]
        images = jnp.repeat(melspec, 3, axis=1)  # [bs, 3, H, W]
        images = images.transpose(0, 2, 3, 1)  # NHWC
        if train:
            feats, bn_stats = efficientnet_features(params, images, train=True)
            return feats[:, None, :], bn_stats
        feats = efficientnet_features(params, images)
        return feats[:, None, :]

    @staticmethod
    def feature_vector_attention_mask(batch_size: int) -> jnp.ndarray:
        return jnp.ones((batch_size, 1), dtype=bool)


def build_efficientnet_encoder(pretrained: bool = False):
    """→ (params, EfficientNetConfig). Pretrained loading requires the
    efficientnet_pytorch package + network; falls back to random init."""
    cfg = EfficientNetConfig()
    if pretrained:
        try:
            from efficientnet_pytorch import EfficientNet

            torch_model = EfficientNet.from_pretrained("efficientnet-b0").eval()
            return port_efficientnet(torch_model), cfg
        except ImportError:
            import logging

            logging.getLogger(__name__).warning(
                "efficientnet_pytorch unavailable; using random init"
            )
    return init_efficientnet_params(), cfg


def port_efficientnet(torch_model) -> dict:
    """Port lukemelas/EfficientNet-PyTorch b0 weights into our layout."""

    def t(x):
        return x.detach().cpu().numpy()

    def conv(m):
        return {"kernel": t(m.weight).transpose(2, 3, 1, 0)}

    def bn(m):
        return {
            "scale": t(m.weight), "bias": t(m.bias),
            "mean": t(m.running_mean), "var": t(m.running_var),
        }

    params = init_efficientnet_params()
    params["stem"] = {"conv": conv(torch_model._conv_stem), "bn": bn(torch_model._bn0)}
    for spec, p, tb in zip(block_specs(), params["blocks"], torch_model._blocks):
        if spec["expand"] != 1:
            p["expand_conv"] = conv(tb._expand_conv)
            p["expand_bn"] = bn(tb._bn0)
        dw = conv(tb._depthwise_conv)
        # torch depthwise [mid,1,k,k] → HWIO [k,k,1,mid]
        p["dw_conv"] = {"kernel": t(tb._depthwise_conv.weight).transpose(2, 3, 1, 0)}
        p["dw_bn"] = bn(tb._bn1)
        p["se_reduce"] = {
            "kernel": conv(tb._se_reduce)["kernel"], "bias": t(tb._se_reduce.bias)
        }
        p["se_expand"] = {
            "kernel": conv(tb._se_expand)["kernel"], "bias": t(tb._se_expand.bias)
        }
        p["project_conv"] = conv(tb._project_conv)
        p["project_bn"] = bn(tb._bn2)
    params["head"] = {"conv": conv(torch_model._conv_head), "bn": bn(torch_model._bn1)}
    return params
