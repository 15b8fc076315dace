"""Same-process A/B of tiny-T encoder attention formulations.

The flagship trains 250 ms segments (T=12): encoder attention there is all
layout/overhead, no MXU. The HLO trace shows ~3.6 ms/step of
bf16[128,12,16,64] layout copies across hubert-large's 24 layers. Suspect:
the context einsum "bhqk,bkhd->bqhd" — h is a dot batch dim, so the
requested bqhd output is an explicit transpose, and its VJP transposes
again. Variants keep everything in dot-natural orders:

  A (current): scores bqhd,bkhd->bhqk; ctx bhqk,bkhd->bqhd; out via
     reshape(b,t,h*d) @ W
  B: ctx stays bhqd (natural); out-projection fuses the head merge:
     einsum bhqd,hdo->bqo (one dot_general, no transpose)
  C: B + scores via explicit lax.dot_general (no einsum parsing changes)

Timing: scan_time_diff over fwd+bwd of a 4-layer stack (RTT-immune).

    python benchmarks/ab_tiny_attention.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from aat_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scan_timing import scan_time_diff  # noqa: E402

B, T, H, D = 128, 12, 16, 64
HID = H * D
LAYERS = 4


def attn_a(x, w):
    q = (x @ w["q"]).reshape(B, T, H, D)
    k = (x @ w["k"]).reshape(B, T, H, D)
    v = (x @ w["v"]).reshape(B, T, H, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * (D ** -0.5)
    p = jax.nn.softmax(s, axis=-1)
    ctx = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return ctx.reshape(B, T, HID) @ w["o"]


def attn_b(x, w):
    q = (x @ w["q"]).reshape(B, T, H, D)
    k = (x @ w["k"]).reshape(B, T, H, D)
    v = (x @ w["v"]).reshape(B, T, H, D)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * (D ** -0.5)
    p = jax.nn.softmax(s, axis=-1)
    # ctx in dot-natural bhqd (batch dims lead); head-merge fused into the
    # out-projection dot (contract h AND d) — no transpose anywhere
    ctx = jnp.einsum("bhqk,bkhd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return jnp.einsum("bhqd,hdo->bqo", ctx, w["o"].reshape(H, D, HID),
                      preferred_element_type=jnp.float32).astype(x.dtype)


def attn_c(x, w):
    q = (x @ w["q"]).reshape(B, T, H, D)
    k = (x @ w["k"]).reshape(B, T, H, D)
    v = (x @ w["v"]).reshape(B, T, H, D)
    s = jax.lax.dot_general(
        q, k, (((3,), (3,)), ((0, 2), (0, 2))),
        preferred_element_type=jnp.float32) * (D ** -0.5)  # [b,h,q,k]
    p = jax.nn.softmax(s, axis=-1)
    ctx = jax.lax.dot_general(  # [b,h,q,d]
        p.astype(v.dtype), v, (((3,), (1,)), ((0, 1), (0, 2))),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return jax.lax.dot_general(
        ctx, w["o"].reshape(H, D, HID), (((1, 3), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def make_fn(attn, weights):
    def step(x, *ws):
        def loss(x):
            h = x
            for w in ws:
                h = h + attn(h, w)
            return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-6
        g = jax.grad(loss)(x)
        return (x - 1e-3 * g.astype(x.dtype)).astype(x.dtype)

    return step


def main():
    rng = np.random.default_rng(0)
    weights = tuple(
        {k: jnp.asarray(rng.normal(0, 0.02, (HID, HID)), jnp.bfloat16)
         for k in ("q", "k", "v", "o")}
        for _ in range(LAYERS)
    )
    x0 = jnp.asarray(rng.normal(0, 1, (B, T, HID)), jnp.bfloat16)
    flat = tuple(w for lw in weights for w in lw.values())

    def pack(ws):
        return tuple({k: ws[i * 4 + j] for j, k in enumerate(("q", "k", "v", "o"))}
                     for i in range(LAYERS))

    # numeric sanity: variants must agree
    outs = {}
    for name, attn in (("A", attn_a), ("B", attn_b), ("C", attn_c)):
        h = x0
        for w in weights:
            h = h + attn(h, w)
        outs[name] = np.asarray(h, np.float32)
    for name in ("B", "C"):
        err = np.abs(outs[name] - outs["A"]).max()
        print(json.dumps({"variant": name, "max_abs_diff_vs_A": float(err)}),
              flush=True)

    for rep in range(2):
        for name, attn in (("A_current", attn_a), ("B_fused_out", attn_b),
                           ("C_dot_general", attn_c)):
            fn = make_fn(attn, None)

            def step(x, *ws, fn=fn):
                return fn(x, *pack(ws))

            dt = scan_time_diff(step, x0, iters_hi=120, iters_lo=20, pairs=3,
                                consts=flat)
            print(json.dumps({"variant": name, "rep": rep,
                              "ms_per_fwd_bwd_4layers": round(dt * 1e3, 3),
                              "ms_per_layer": round(dt * 1e3 / LAYERS, 4)}),
                  flush=True)


if __name__ == "__main__":
    main()
