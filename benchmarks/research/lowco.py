"""STATUS: REJECTED (r4d/r4g, e2e + profile). GLIDE SR cascade 1.986-1.991
vs 2.006 shipped (-29 ms SR stage); SD2 VAE tail 1.9385 vs 1.9425. The r4g
profile attributes the loss to 128-lane padding of every tiny-channel
materialization: the co=6 output (and the 54-lane z) pad to 128 lanes, so
the split/divide/multiply consumers that previously FUSED into the direct
conv become standalone passes reading ~21x padded bytes
(divide_multiply_fusion 4.6->26.9 ms, split 4.8->16.4, copy +8). The
7.3 TF/s direct conv wins by keeping the whole chain in one fusion.
Lesson: on TPU, tiny-channel tensors must never be materialized more than
once — FLOP-efficiency tricks that add materializations lose to lane
padding.

Low-output-channel 3x3 conv as taps-in-N GEMM + constant fix-up conv.

Problem: a 3x3 conv with c_out << 128 wastes the MXU's lane dimension —
GLIDE's SR out_conv (192 -> 6 at 256²) ran 43 ms @ 7.3 TF/s (r3d xprof,
fusion.10361): the N=6 output pads to 128 lanes, 4.7% utilization, and
space-to-depth cannot help a 3x3 kernel (redundancy x padding is invariant
for small kernels — see models/srgan.blocked_tail_conv, which only pays for
the 9x9 tail).

Trick (original, TPU-native): move the 9 taps INTO the GEMM's N dimension.

    z[b,i,j, t*co+o] = sum_ci x[b,i,j,ci] * W[t//3, t%3, ci, o]   (1x1 GEMM,
                                                                   N = 9*co)
    y[b,i,j,o]       = sum_t z[b, i+t//3-1, j+t%3-1, t*co+o] + bias

The GEMM has identical FLOPs to the direct conv but N = 9*co lanes (54 for
co=6 -> ~8x better lane utilization); the tap-shifted summation is itself a
3x3 convolution with a CONSTANT {0,1} kernel over z — tiny FLOPs (9*co*co
MACs/pixel vs 9*c_in*co), so its own lane waste is irrelevant.

Numerics: identical contraction up to reassociation (per-tap partial sums
instead of one fused (tap, ci) reduction); the z intermediate is kept fp32
so no extra rounding is introduced before the final cast. Fully
differentiable (plain XLA ops — the constant kernel has no parameters).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def lowco_wins(h: int, w: int, c_in: int, c_out: int) -> bool:
    """Shape rule: big spatial, wide input, tiny output — where the direct
    conv's N-lane padding dominates (measured pathology class: GLIDE SR
    out_conv 256²x192->6 @ 7.3 TF/s; gate excludes shapes where the z
    intermediate's traffic could rival the MAC savings)."""
    return c_out <= 16 and c_in >= 96 and min(h, w) >= 128


def conv3x3_lowco(x: jnp.ndarray, kernel: jnp.ndarray,
                  bias: jnp.ndarray | None) -> jnp.ndarray:
    """Same-pad stride-1 NHWC 3x3 conv, taps-in-N form. kernel: (3,3,Ci,Co)."""
    b, h, w, ci = x.shape
    co = kernel.shape[-1]
    # (3,3,Ci,Co) -> (Ci, 9*Co), tap-major on N
    wflat = jnp.transpose(kernel, (2, 0, 1, 3)).reshape(ci, 9 * co)
    z = jnp.einsum("bhwc,cn->bhwn", x, wflat.astype(x.dtype),
                   preferred_element_type=jnp.float32)      # (B,H,W,9*Co) f32
    # constant binary 3x3 conv summing each tap's column block at its offset:
    # y[o] = sum_t shift_t(z)[t*Co+o]
    k2 = np.zeros((3, 3, 9 * co, co), np.float32)
    for t in range(9):
        for o in range(co):
            # XLA conv is cross-correlation (no kernel flip): kernel position
            # (di, dj) reads input (i+di-1, j+dj-1) — exactly where tap
            # (di, dj) of the original conv must be evaluated (CPU-verified
            # equal to the direct conv, tests/test_lowco.py).
            di, dj = t // 3, t % 3
            k2[di, dj, t * co + o, o] = 1.0
    y = jax.lax.conv_general_dilated(
        z, jnp.asarray(k2), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
