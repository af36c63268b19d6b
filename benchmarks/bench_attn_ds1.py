"""Shootout for THE hot attention site: SD2 512² ds1 self-attention
(B=16 CFG-folded, N=4096, C=320, heads=5, d=64) — scan-amortized on TPU.

Usage: python benchmarks/bench_attn_ds1.py [variant ...]
Prints ms/op and TFLOP/s (4*B*H*N^2*D).
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/minddiffusion_jax_cache")

from minddiffusion_tpu.ops import flash_attention as fa  # noqa: E402

B, N, C, H = 16, 4096, 320, 5
D = C // H
SCALE = D ** -0.5
STEPS = 20
FLOPS = 4 * B * H * N * N * D


def bench(name, fn):
    x = jnp.asarray(np.random.RandomState(0).randn(B, N, C), jnp.bfloat16)

    def body(h, _):
        o = fn(h, h, h)
        return (o * 1e-3 + h * 0.999).astype(h.dtype), ()

    run = jax.jit(lambda x0: jax.lax.scan(body, x0, None, length=STEPS)[0])
    out = run(x)
    np.asarray(out[0, 0])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(x)
        np.asarray(out[0, 0])
        ts.append(time.perf_counter() - t0)
    per = min(ts) / STEPS
    print(f"{name:24s}: {per*1e3:7.3f} ms  {FLOPS/per/1e12:6.1f} T", flush=True)


def packed(bq, exact, grouped=False):
    return lambda q, k, v: fa.flash_attention_packed(
        q, k, v, SCALE, H, block_q=bq, exact=exact, grouped=grouped)


def ones(bq, exact):
    return lambda q, k, v: fa.flash_attention_packed_ones(
        q, k, v, SCALE, H, block_q=bq, exact=exact)


def bhnd(bq, bk, exact):
    def f(q, k, v):
        q4 = q.reshape(B, N, H, D)
        o = fa.flash_attention(q4, k.reshape(B, N, H, D), v.reshape(B, N, H, D),
                               SCALE, block_q=bq, block_k=bk,
                               exact_softmax=exact)
        return o.reshape(B, N, C)
    return f


VARIANTS = {
    "packed_bq256_fast": packed(256, False),
    "packed_bq512_fast": packed(512, False),
    "packed_bq1024_fast": packed(1024, False),
    "packed_bq2048_fast": packed(2048, False),
    "packed_bq256_exact": packed(256, True),
    "packed_bq128_fast": packed(128, False),
    "packed_bq256_fast_grp": packed(256, False, True),
    "packed_bq128_fast_grp": packed(128, False, True),
    "packed_bq512_fast_grp": packed(512, False, True),
    "ones_bq256_fast": ones(256, False),
    "ones_bq512_fast": ones(512, False),
    "bhnd_q512_k4096_fast": bhnd(512, 4096, False),
    "bhnd_q512_k1024_fast": bhnd(512, 1024, False),
}


def main():
    print(f"device: {jax.devices()[0].device_kind}  "
          f"shape B{B} N{N} C{C} h{H}  flops/op {FLOPS/1e12:.3f} T", flush=True)
    names = sys.argv[1:] or list(VARIANTS)
    for n in names:
        bench(n, VARIANTS[n])




# ---- diagnostic ablation kernels (not part of the library) ----
import jax.experimental.pallas as _pl
import jax.experimental.pallas.tpu as _pltpu
import functools as _ft


def _diag_kernel(q_ref, k_ref, v_ref, o_ref, *, head_dim, heads, mode):
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if mode == "qk":
            # collapse s cheaply so the MXU work isn't dead-code-eliminated
            o_ref[0, :, sl] = jnp.broadcast_to(
                jnp.sum(s, axis=-1, keepdims=True), (s.shape[0], head_dim)
            ).astype(o_ref.dtype)
            continue
        if mode in ("exp", "full", "fp32pv"):
            p = jnp.exp(s)
        else:  # nosm: skip softmax entirely
            p = s
        if mode == "exp":
            o_ref[0, :, sl] = jnp.broadcast_to(
                jnp.sum(p, axis=-1, keepdims=True), (p.shape[0], head_dim)
            ).astype(o_ref.dtype)
            continue
        l = jnp.sum(p, axis=-1, keepdims=True) if mode == "full" else 1.0
        pin = p if mode == "fp32pv" else p.astype(v.dtype)
        acc = jax.lax.dot_general(pin, v, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (acc / l).astype(o_ref.dtype)


def diag(mode, bq=256):
    def f(q, k, v):
        kern = _ft.partial(_diag_kernel, head_dim=D, heads=H, mode=mode)
        return _pl.pallas_call(
            kern,
            grid=(B, N // bq),
            in_specs=[
                _pl.BlockSpec((1, bq, C), lambda b_, i: (b_, i, 0)),
                _pl.BlockSpec((1, N, C), lambda b_, i: (b_, 0, 0)),
                _pl.BlockSpec((1, N, C), lambda b_, i: (b_, 0, 0)),
            ],
            out_specs=_pl.BlockSpec((1, bq, C), lambda b_, i: (b_, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
            compiler_params=_pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(q, k, v)
    return f


for _m in ("qk", "exp", "nosm", "fp32pv", "full"):
    VARIANTS[f"diag_{_m}"] = diag(_m)




def _diag_kt_kernel(q_ref, kt_ref, v_ref, o_ref, *, head_dim, heads, mode):
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0][:, sl]
        kt = kt_ref[0][sl]                     # (d, N): contraction on sublanes
        s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if mode == "qk":
            o_ref[0, :, sl] = jnp.broadcast_to(
                jnp.sum(s, axis=-1, keepdims=True), (s.shape[0], head_dim)
            ).astype(o_ref.dtype)
            continue
        p = jnp.exp(s)
        l = jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0][:, sl]
        acc = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (acc / l).astype(o_ref.dtype)


def diag_kt(mode, bq=256):
    def f(q, k, v):
        kt = k.transpose(0, 2, 1)              # (B, C, N) host-side, once
        kern = _ft.partial(_diag_kt_kernel, head_dim=D, heads=H, mode=mode)
        return _pl.pallas_call(
            kern,
            grid=(B, N // bq),
            in_specs=[
                _pl.BlockSpec((1, bq, C), lambda b_, i: (b_, i, 0)),
                _pl.BlockSpec((1, C, N), lambda b_, i: (b_, 0, 0)),
                _pl.BlockSpec((1, N, C), lambda b_, i: (b_, 0, 0)),
            ],
            out_specs=_pl.BlockSpec((1, bq, C), lambda b_, i: (b_, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
            compiler_params=_pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(q, kt, v)
    return f


VARIANTS["diag_kt_qk"] = diag_kt("qk")
VARIANTS["diag_kt_full"] = diag_kt("full")


def _diag_slice_kernel(q_ref, k_ref, v_ref, o_ref, *, head_dim, heads, mode):
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if mode == "expslice":
            s = jnp.exp(s)
        o_ref[0, :, sl] = s[:, :head_dim].astype(o_ref.dtype)


def diag_slice(mode, bq=256):
    def f(q, k, v):
        kern = _ft.partial(_diag_slice_kernel, head_dim=D, heads=H, mode=mode)
        return _pl.pallas_call(
            kern,
            grid=(B, N // bq),
            in_specs=[
                _pl.BlockSpec((1, bq, C), lambda b_, i: (b_, i, 0)),
                _pl.BlockSpec((1, N, C), lambda b_, i: (b_, 0, 0)),
                _pl.BlockSpec((1, N, C), lambda b_, i: (b_, 0, 0)),
            ],
            out_specs=_pl.BlockSpec((1, bq, C), lambda b_, i: (b_, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
            compiler_params=_pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(q, k, v)
    return f


VARIANTS["diag_qk_slice"] = diag_slice("slice")
VARIANTS["diag_qkexp_slice"] = diag_slice("expslice")


def fold(bq, exact):
    return lambda q, k, v: fa.flash_attention_packed_fold(
        q, k, v, SCALE, H, block_q=bq, exact=exact)


VARIANTS["fold_bq256_fast"] = fold(256, False)
VARIANTS["fold_bq512_fast"] = fold(512, False)
VARIANTS["fold_bq256_exact"] = fold(256, True)


def _diag_bf16s_kernel(q_ref, k_ref, v_ref, o_ref, *, head_dim, heads):
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        p = jnp.exp(s.astype(q_ref.dtype))   # bf16 exp (packed VPU ops)
        l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        v = v_ref[0][:, sl]
        acc = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (acc / l).astype(o_ref.dtype)


def diag_bf16s(bq=256):
    def f(q, k, v):
        kern = _ft.partial(_diag_bf16s_kernel, head_dim=D, heads=H)
        return _pl.pallas_call(
            kern,
            grid=(B, N // bq),
            in_specs=[
                _pl.BlockSpec((1, bq, C), lambda b_, i: (b_, i, 0)),
                _pl.BlockSpec((1, N, C), lambda b_, i: (b_, 0, 0)),
                _pl.BlockSpec((1, N, C), lambda b_, i: (b_, 0, 0)),
            ],
            out_specs=_pl.BlockSpec((1, bq, C), lambda b_, i: (b_, i, 0)),
            out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
            compiler_params=_pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(q, k, v)
    return f


VARIANTS["diag_bf16s"] = diag_bf16s()


def splash_variant():
    from jax.experimental.pallas.ops.tpu import splash_attention as sa

    masks = sa.MultiHeadMask([sa.FullMask((N, N)) for _ in range(H)])
    kernel = sa.make_splash_mha(masks, head_shards=1, q_seq_shards=1)

    def f(q, k, v):
        qh = (q * SCALE).reshape(B, N, H, D).transpose(0, 2, 1, 3)
        kh = k.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        vh = v.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        o = jax.vmap(kernel)(qh, kh, vh)     # (B, H, N, D)
        return o.transpose(0, 2, 1, 3).reshape(B, N, C)
    return f


try:
    VARIANTS["splash"] = splash_variant()
except Exception as _e:
    print("splash unavailable:", _e)


if __name__ == "__main__":
    main()
