"""Pallas fused GroupNorm(+SiLU) — the sampler's measured hot spot.

Profiling the compiled 250-step sampler on v5e (PERFNOTES.md) shows 52% of
device time in `convert_reduce_fusion` ops — the GroupNorm statistics
reductions — versus 6% in convolutions: the CCDM UNet is GroupNorm-bandwidth
bound, not MXU bound. XLA lowers each GroupNorm as separate stats-reduce and
normalize passes over HBM (3+ traversals of up-to-134MB activations).

This kernel loads one sample's activation block into VMEM once and does
everything there: fp32 sum/sum-of-squares stats, per-group mean/rstd,
normalize, affine, optional fused SiLU — exactly 1 HBM read + 1 HBM write.

Layout trick: with C channels on the lane axis (C = 32..128 in this model),
a plain `[H*W, C]` reduction uses C/128 of the VPU. The kernel reinterprets
the row-major block as `[H*W/k, k*C]` with `k = 128 // C` (a free reshape of
contiguous data), reduces at full lane width, and folds the k channel copies
afterwards.

STATUS: experimental, NOT wired into the model. Measured on v5e
(PERFNOTES.md), XLA's convert+reduce fusion plus conv-prologue fusion beats
this standalone kernel (1.55 ms vs 2.35 ms at the hot shape) — inside the
compiled sampler the GN passes fuse with their neighbours, which a
standalone kernel forfeits. It stays in the tree (interpret-mode parity
tested) as the starting point for a future ResBlock mega-kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# one sample's activations must fit VMEM alongside the output block
_VMEM_BYTES_LIMIT = 6 * 1024 * 1024


def _gn_stats_norm_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int,
                          eps: float, silu: bool, pack: int, c: int):
    """One sample, packed layout [rows, pack*C]: stats + normalize in VMEM."""
    x = x_ref[0].astype(jnp.float32)  # [rows, pack*C]

    s1 = jnp.sum(x, axis=0, keepdims=True)       # [1, pack*C]
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    n_rows = x.shape[0]

    cpg = c // groups
    count = n_rows * pack * cpg
    # fold packed copies and channels-per-group via a [pack*C, G] one-hot
    # matmul (tiny; avoids in-kernel reshapes that Mosaic can't shape-cast)
    lane = jax.lax.broadcasted_iota(jnp.int32, (pack * c, groups), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (pack * c, groups), 1)
    fold = ((lane % c) // cpg == grp).astype(jnp.float32)  # [pack*C, G]
    g1 = jnp.dot(s1, fold, preferred_element_type=jnp.float32)  # [1, G]
    g2 = jnp.dot(s2, fold, preferred_element_type=jnp.float32)
    mean = g1 / count
    var = g2 / count - mean * mean
    rstd = jax.lax.rsqrt(var + eps)

    # scatter group stats back to lanes: [1, G] @ [G, pack*C]
    unfold = fold.T  # [G, pack*C]
    mean_l = jnp.dot(mean, unfold, preferred_element_type=jnp.float32)
    rstd_l = jnp.dot(rstd, unfold, preferred_element_type=jnp.float32)

    scale = scale_ref[:]  # [1, pack*C] (pre-tiled outside)
    bias = bias_ref[:]
    mul = rstd_l * scale
    add = bias - mean_l * mul
    y = x * mul + add
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pick_pack(n: int, c: int) -> int:
    pack = max(1, 128 // c)
    while pack > 1 and n % pack:
        pack //= 2
    return pack


@functools.partial(jax.jit, static_argnames=("groups", "eps", "silu", "interpret"))
def pallas_group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                      groups: int, eps: float = 1e-5, silu: bool = False,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused GroupNorm(+SiLU) over `[B,H,W,C]`, one HBM round-trip.

    The lane-packing reshape `[B,H,W,C] -> [B, HW/pack, pack*C]` happens
    OUTSIDE the kernel (contiguous view, free) so the in-VMEM reduction runs
    at full 128-lane width; Mosaic cannot shape-cast across lanes in-kernel.
    """
    b, h, w, c = x.shape
    n = h * w
    pack = _pick_pack(n, c)
    rows = n // pack
    xp = x.reshape(b, rows, pack * c)
    scale_p = jnp.tile(scale.astype(jnp.float32), pack).reshape(1, pack * c)
    bias_p = jnp.tile(bias.astype(jnp.float32), pack).reshape(1, pack * c)
    kernel = functools.partial(_gn_stats_norm_kernel, groups=groups, eps=eps,
                               silu=silu, pack=pack, c=c)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, pack * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pack * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pack * c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, pack * c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * x.size, bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=x.size if silu else 0),
    )(xp, scale_p, bias_p)
    return out.reshape(b, h, w, c)


def group_norm_supported(x_shape, groups: int) -> bool:
    """Kernel applicability: sample fits VMEM, channels divide groups evenly."""
    b, h, w, c = x_shape
    if c % groups:
        return False
    sample_bytes = h * w * c * 4  # fp32 working copy
    return sample_bytes <= _VMEM_BYTES_LIMIT and (h * w) % 8 == 0


def xla_group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   groups: int, eps: float = 1e-5, silu: bool = False) -> jnp.ndarray:
    """Reference XLA implementation (matches flax GroupNorm numerics)."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(xf * xf, axis=(1, 3), keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(b, h, w, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)
