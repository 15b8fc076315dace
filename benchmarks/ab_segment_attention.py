"""Prototype: fused Pallas kernel for tiny-T segment attention (forward).

Flagship encoder attention runs at T=12 per 250 ms segment: XLA spends
0.433 ms/layer fwd+bwd (trace: mostly layout copies + small-op overhead)
against a ~0.03 ms traffic floor. Two fused formulations, A/B'd against
XLA at [128 segs, 12, 16, 64]:

  flat: block of G segments as one [G*T, D] matrix per head — big MXU dots
        with block-diagonal masking (waste factor G in score FLOPs);
  batched: per-head 3-D dot_general with the segment as a batch dim —
        exactly the useful [T, T] scores per segment, no waste, but tiny
        per-tile matmuls.

    python benchmarks/ab_segment_attention.py
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from aat_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scan_timing import scan_time_diff  # noqa: E402

N, T, H, D = 128, 12, 16, 64
HID = H * D
MASK = -2e30


def _flat_kernel(bias_ref, q_ref, k_ref, v_ref, out_ref, *, t, h, d, rows):
    """Block of G segments flattened to [G*T, H*D]; per-head big dots with
    block-diagonal masking."""
    seg_i = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // t
    seg_j = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // t
    diag = seg_i == seg_j
    bias = bias_ref[0][None, :]  # [1, rows]
    for hh in range(h):
        sl = slice(hh * d, (hh + 1) * d)
        s = jax.lax.dot_general(
            q_ref[:, sl], k_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = jnp.where(diag, s + bias, MASK)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - jnp.maximum(m, -1e30))
        l = jnp.sum(p, axis=1, keepdims=True)
        p = p * (1.0 / jnp.maximum(l, 1e-30))
        out_ref[:, sl] = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def seg_attention_flat(q, k, v, key_mask, g, sm_scale):
    n, t, h, d = q.shape
    rows = g * t
    assert rows % 128 == 0, rows
    qf = (q.astype(jnp.float32) * sm_scale).astype(q.dtype).reshape(n * t, h * d)
    kf = k.reshape(n * t, h * d)
    vf = v.reshape(n * t, h * d)
    bias = jnp.where(key_mask.reshape(1, n * t) > 0, 0.0, MASK).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_flat_kernel, t=t, h=h, d=d, rows=rows),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((1, rows), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, h * d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, h * d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, h * d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, h * d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * t, h * d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.PARALLEL,),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(bias, qf, kf, vf)
    return out.reshape(n, t, h, d)


def _batched_kernel(bias_ref, q_ref, k_ref, v_ref, out_ref, *, t, h, d):
    """Per-head 3-D dot_general with segments as the batch dim — scores are
    exactly [G, T, T] per head (no block-diag waste)."""
    bias = bias_ref[:, 0, :][:, None, :]  # [G, 1, T]
    for hh in range(h):
        sl = slice(hh * d, (hh + 1) * d)
        s = jax.lax.dot_general(
            q_ref[:, :, sl], k_ref[:, :, sl],
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [G, T, T]
        s = s + bias
        m = jnp.max(s, axis=2, keepdims=True)
        p = jnp.exp(s - jnp.maximum(m, -1e30))
        l = jnp.sum(p, axis=2, keepdims=True)
        p = p * (1.0 / jnp.maximum(l, 1e-30))
        out_ref[:, :, sl] = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[:, :, sl],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)


def seg_attention_batched(q, k, v, key_mask, g, sm_scale):
    n, t, h, d = q.shape
    qf = (q.astype(jnp.float32) * sm_scale).astype(q.dtype).reshape(n, t, h * d)
    kf = k.reshape(n, t, h * d)
    vf = v.reshape(n, t, h * d)
    bias = jnp.where(key_mask[:, None, :] > 0, 0.0, MASK).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_batched_kernel, t=t, h=h, d=d),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, 1, t), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, t, h * d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, t, h * d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, t, h * d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, t, h * d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, h * d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.PARALLEL,),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(bias, qf, kf, vf)
    return out.reshape(n, t, h, d)


def _flat_bwd_kernel(bias_ref, q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref,
                     dv_ref, *, t, h, d, rows, sm_scale):
    """Fused recompute backward: dq/dk/dv from one visit, NO residuals —
    s/p recompute from q/k (5 dots per head: s, dp, dq, dk, dv)."""
    seg_i = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0) // t
    seg_j = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1) // t
    diag = seg_i == seg_j
    bias = bias_ref[0][None, :]
    for hh in range(h):
        sl = slice(hh * d, (hh + 1) * d)
        s = jax.lax.dot_general(
            q_ref[:, sl], k_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale
        s = jnp.where(diag, s + bias, MASK)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - jnp.maximum(m, -1e30))
        l = jnp.sum(p, axis=1, keepdims=True)
        p = p * (1.0 / jnp.maximum(l, 1e-30))
        dp = jax.lax.dot_general(
            do_ref[:, sl], v_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(p * dp, axis=1, keepdims=True)
        ds = p * (dp - delta) * sm_scale
        dq_ref[:, sl] = jax.lax.dot_general(
            ds.astype(k_ref.dtype), k_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)
        dk_ref[:, sl] = jax.lax.dot_general(
            ds.astype(q_ref.dtype), q_ref[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)
        dv_ref[:, sl] = jax.lax.dot_general(
            p.astype(do_ref.dtype), do_ref[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)


def _flat_fwd_post(q, k, v, key_mask, g, sm_scale):
    # scale applied in f32 INSIDE the kernel would need another operand;
    # prototype folds into q like the flash kernel
    return seg_attention_flat(q, k, v, key_mask, g, sm_scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def seg_attention_vjp(q, k, v, key_mask, g, sm_scale):
    return seg_attention_flat(q, k, v, key_mask, g, sm_scale)


def _sa_fwd(q, k, v, key_mask, g, sm_scale):
    return seg_attention_flat(q, k, v, key_mask, g, sm_scale), (q, k, v, key_mask)


def _sa_bwd(g, sm_scale, res, do):
    q, k, v, key_mask = res
    n, t, h, d = q.shape
    rows = g * t
    qf = q.reshape(n * t, h * d)
    kf = k.reshape(n * t, h * d)
    vf = v.reshape(n * t, h * d)
    dof = do.reshape(n * t, h * d)
    bias = jnp.where(key_mask.reshape(1, n * t) > 0, 0.0, MASK).astype(jnp.float32)
    spec = pl.BlockSpec((rows, h * d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_flat_bwd_kernel, t=t, h=h, d=d, rows=rows,
                          sm_scale=sm_scale),
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((1, rows), lambda i: (0, i), memory_space=pltpu.VMEM),
            spec, spec, spec, spec,
        ],
        out_specs=(spec, spec, spec),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n * t, h * d), x.dtype) for x in (q, k, v)
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(pltpu.PARALLEL,),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=jax.default_backend() != "tpu",
    )(bias, qf, kf, vf, dof)
    return (dq.reshape(q.shape), dk.reshape(k.shape), dv.reshape(v.shape),
            None)


seg_attention_vjp.defvjp(_sa_fwd, _sa_bwd)


def xla_ref(q, k, v, key_mask, sm_scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    allowed = key_mask[:, None, None, :] > 0
    s = jnp.where(allowed, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.any(allowed, axis=-1, keepdims=True), p, 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(0, 1, (N, T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (N, T, H, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (N, T, H, D)), jnp.bfloat16)
    mask = np.ones((N, T), np.int32)
    mask[-2:] = 0  # two fully padded segments
    mask[0, -3:] = 0  # ragged frames in segment 0
    mask = jnp.asarray(mask)
    scale = D ** -0.5

    ref = np.asarray(xla_ref(q, k, v, mask, scale), np.float32)
    variants = {}
    for g in (32, 64):
        variants[f"flat_g{g}"] = functools.partial(seg_attention_flat, g=g)
    for g in (8, 16, 32, 64):
        variants[f"batched_g{g}"] = functools.partial(seg_attention_batched, g=g)
    good = {}
    for name, fn in variants.items():
        try:
            out = np.asarray(fn(q, k, v, key_mask=mask, sm_scale=scale),
                             np.float32)
            err = np.abs(out - ref).max()
            print(json.dumps({"variant": name, "max_abs_diff": float(err)}),
                  flush=True)
            if err < 0.05:
                good[name] = fn
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name,
                              "error": str(e)[:160]}), flush=True)

    def make_step(fn):
        def step(x, q, k, v):
            o = fn((q + x[0, 0, 0, 0].astype(q.dtype)), k, v,
                   key_mask=mask, sm_scale=scale)
            return x + o.astype(jnp.float32) * 1e-6

        return step

    x0 = jnp.zeros((N, T, H, D), jnp.float32)
    timed = {"xla_fwd": lambda q, k, v, key_mask, sm_scale: xla_ref(
        q, k, v, key_mask, sm_scale)}
    timed.update(good)
    for rep in range(2):
        for name, fn in timed.items():
            dt = scan_time_diff(make_step(fn), x0, iters_hi=220, iters_lo=20,
                                pairs=3, consts=(q, k, v))
            print(json.dumps({"variant": name, "rep": rep,
                              "ms": round(dt * 1e3, 4)}), flush=True)

    # fwd + bwd: XLA autodiff vs the fused recompute-backward custom_vjp
    def vjp_fn(q, k, v, m):  # custom_vjp nondiff args must be positional
        return seg_attention_vjp(q, k, v, m, 32, scale)

    gv = jax.grad(lambda q, k, v: jnp.sum(
        vjp_fn(q, k, v, mask).astype(jnp.float32) ** 2), argnums=(0, 1, 2))
    gx = jax.grad(lambda q, k, v: jnp.sum(
        xla_ref(q, k, v, mask, scale).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2))
    for a, b, nm in zip(gv(q, k, v), gx(q, k, v), ("dq", "dk", "dv")):
        print(json.dumps({"grad": nm, "max_abs_diff": float(
            np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()
        )}), flush=True)

    def make_grad_step(attn):
        def step(x, q, k, v):
            def loss(qq):
                return jnp.sum(attn(qq, k, v).astype(jnp.float32) ** 2) * 1e-6
            g = jax.grad(loss)(q + x.astype(q.dtype) * 1e-3)
            return x + g.astype(jnp.float32) * 1e-6

        return step

    grads = {
        "xla_fwdbwd": lambda q, k, v: xla_ref(q, k, v, mask, scale),
        "pallas_vjp_fwdbwd_g32": lambda q, k, v: vjp_fn(q, k, v, mask),
    }
    for rep in range(2):
        for name, attn in grads.items():
            dt = scan_time_diff(make_grad_step(attn), x0, iters_hi=120,
                                iters_lo=20, pairs=3, consts=(q, k, v))
            print(json.dumps({"variant": name, "rep": rep,
                              "ms": round(dt * 1e3, 4)}), flush=True)


if __name__ == "__main__":
    main()
