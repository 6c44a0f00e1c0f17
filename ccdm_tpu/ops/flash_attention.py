"""Pallas TPU flash(-style) attention for the UNet's spatial self-attention.

Why: the dense QKV attention (parity form, `unet.py:334-360`) materialises a
`[B, heads, T, T]` probability tensor in HBM. At the Cityscapes 256x512 DINO
config the ds=8 feature map has T = 32*64 = 2048 tokens; with the batched
multi-sample protocol (B up to 128) that single tensor is ~8.6 GB fp32 — an
HBM blow-up that caps batch size. This kernel never materialises it:
for each query block, logits and the softmax live in VMEM only.

Design (v5e): CCDM token counts are modest (<= 8k) and head dims small
(32-64), so keys/values for one (batch, head) fit comfortably in VMEM
(T=8192, dh=64 -> 2x2 MB). The kernel therefore streams *query blocks* with
fully-resident K/V — a one-pass softmax per q-block, no online rescaling —
which is both simpler and faster than the textbook streaming-KV variant at
these sizes. Numerics match the parity attention: scale `1/sqrt(sqrt(dh))`
applied to both q and k, softmax in fp32 (`unet.py:354-358`).

`flash_attention(q, k, v)`: `[B, T, H, dh] -> [B, T, H, dh]`, bf16 or fp32.
Falls back to the dense XLA path on non-TPU backends (interpret mode is used
in tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref):
    """One (batch, head, q-block): softmax(q k^T) v, all in VMEM."""
    q = q_ref[0]  # [bq, dh]
    k = k_ref[0]  # [T, dh]
    v = v_ref[0]  # [T, dh]
    dh = q.shape[-1]
    scale = (1.0 / math.sqrt(math.sqrt(dh))) ** 2  # applied once to logits
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [bq, T] fp32
    weights = jax.nn.softmax(logits, axis=-1)
    out = jax.lax.dot_general(
        weights.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _flash_bh(qh, kh, vh, block_q: int, interpret: bool):
    """qh: [BH, Tq, dh] (Tq padded to block_q), kh/vh: [BH, Tk, dh]."""
    bh, tq, dh = qh.shape
    tk = kh.shape[1]
    grid = (bh, pl.cdiv(tq, block_q))
    return pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct(qh.shape, qh.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, dh), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, dh), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, dh), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dh), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * tq * tk * dh,
            bytes_accessed=qh.size * qh.dtype.itemsize * 4,
            transcendentals=bh * tq * tk,
        ),
    )(qh, kh, vh)


def _auto_block_q(t: int, dh: int) -> int:
    """Largest query block whose VMEM working set fits the 16 MB scoped
    limit with margin: fp32 logits + bf16 weights (6 bytes per logit entry)
    plus the resident K/V. Measured at the Cityscapes knee shape (B=128,
    T=2048, dh=32, v5e): 1024 is 9.6% faster per call than the old fixed
    256 (4.55 vs 5.03 ms); 2048 is rejected by Mosaic at 20.5 MB
    (PERFNOTES round 5)."""
    budget = 14 * 1024 * 1024 - 2 * t * dh * 2
    for b in (1024, 512, 256):
        if b * t * 6 <= budget:
            return b
    return 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = None, interpret: bool = False) -> jnp.ndarray:
    """Self-attention `[B, T, H, dh] -> [B, T, H, dh]` without the T x T HBM tensor.

    `block_q=None` picks the largest VMEM-fitting query block for the
    geometry (`_auto_block_q`).

    Differentiable: the custom VJP computes the standard attention backward
    in XLA — dense (one fused program) up to `BWD_DENSE_MAX_ELEMENTS`
    attention entries per head, streaming over query blocks beyond that so
    large-T training never materialises the T x T tensor either.
    """
    return _flash_fwd_impl(q, k, v, block_q, interpret)


def _flash_fwd_impl(q, k, v, block_q, interpret):
    b, t, h, dh = q.shape
    if block_q is None:
        block_q = _auto_block_q(t, dh)

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, t, dh)

    # Only the QUERY axis is padded to a block multiple (the grid tiles over
    # queries; keys/values stay at full length T, so the softmax sees no
    # padded key positions and needs no mask). The padded query rows produce
    # garbage that is sliced off below.
    pad_q = (-t) % block_q
    qh, kh, vh = to_bh(q), to_bh(k), to_bh(v)
    if pad_q:
        qh = jnp.pad(qh, ((0, 0), (0, pad_q), (0, 0)))
    out = _flash_bh(qh, kh, vh, block_q, interpret)
    if pad_q:
        out = out[:, :t]
    return out.reshape(b, h, t, dh).transpose(0, 2, 1, 3)


def _flash_vjp_fwd(q, k, v, block_q, interpret):
    return _flash_fwd_impl(q, k, v, block_q, interpret), (q, k, v)


# Above this many attention-matrix elements per (batch, head) — T_q x T_k —
# the backward streams query blocks instead of materialising the full T x T
# tensor, which would silently reintroduce the HBM blow-up the forward kernel
# exists to avoid (e.g. training the 256x512 DINO config: T=2048, 16 heads,
# batch 16 -> 4 GB fp32 just for A). 1024^2 keeps every LIDC/Cityscapes
# geometry below the switch on the dense path, where one fused XLA program
# is fastest.
BWD_DENSE_MAX_ELEMENTS = 1024 * 1024
BWD_BLOCK_Q = 512


def _flash_vjp_bwd(block_q, interpret, residuals, g):
    q, k, v = residuals
    t = q.shape[1]
    if t * t <= BWD_DENSE_MAX_ELEMENTS:
        return _bwd_dense(q, k, v, g)
    return _bwd_streaming(q, k, v, g)


def _bwd_dense(q, k, v, g):
    """Standard attention backward (XLA): with A = softmax(s·q·kᵀ),
    dV = Aᵀ·g, dS = A ⊙ (g·vᵀ − rowsum(A ⊙ g·vᵀ)), dQ = s·dS·k, dK = s·dSᵀ·q."""
    dh = q.shape[-1]
    s = 1.0 / math.sqrt(dh)  # combined scale of the two 1/sqrt(sqrt(dh)) factors
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) * s
    a = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dv = jnp.einsum("bhts,bthd->bshd", a, gf, preferred_element_type=jnp.float32)
    da = jnp.einsum("bthd,bshd->bhts", gf, vf, preferred_element_type=jnp.float32)
    ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
    dq = jnp.einsum("bhts,bshd->bthd", ds, k.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * s
    dk = jnp.einsum("bhts,bthd->bshd", ds, q.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * s
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _bwd_streaming(q, k, v, g):
    """Query-block streaming backward: same math as `_bwd_dense` but the
    attention matrix only ever exists as a [B, H, block, T] slab. dK/dV are
    accumulated across blocks in a `lax.scan`; dQ blocks are emitted per
    step. Peak extra memory: O(B·H·block·T) instead of O(B·H·T²).

    Zero-padded query rows are exact no-ops: their g rows are zero, so their
    dV/dK contributions vanish and their (sliced-off) dQ rows are ignored.
    """
    b, t, h, dh = q.shape
    s = 1.0 / math.sqrt(dh)
    block = min(BWD_BLOCK_Q, t)
    pad = (-t) % block

    def pad_q_axis(x):
        return jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else x

    n_blocks = (t + pad) // block
    # [n_blocks, B, block, H, dh] so scan's leading axis walks query blocks
    qb = pad_q_axis(q).reshape(b, n_blocks, block, h, dh).transpose(1, 0, 2, 3, 4)
    gb = pad_q_axis(g).reshape(b, n_blocks, block, h, dh).transpose(1, 0, 2, 3, 4)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    def body(carry, inp):
        dk_acc, dv_acc = carry
        qi, gi = inp
        logits = jnp.einsum("bthd,bshd->bhts", qi.astype(jnp.float32), kf,
                            preferred_element_type=jnp.float32) * s
        a = jax.nn.softmax(logits, axis=-1)
        gf = gi.astype(jnp.float32)
        dv_acc = dv_acc + jnp.einsum("bhts,bthd->bshd", a, gf,
                                     preferred_element_type=jnp.float32)
        da = jnp.einsum("bthd,bshd->bhts", gf, vf,
                        preferred_element_type=jnp.float32)
        ds = a * (da - jnp.sum(da * a, axis=-1, keepdims=True))
        dq_i = jnp.einsum("bhts,bshd->bthd", ds, kf,
                          preferred_element_type=jnp.float32) * s
        dk_acc = dk_acc + jnp.einsum("bhts,bthd->bshd", ds, qi.astype(jnp.float32),
                                     preferred_element_type=jnp.float32) * s
        return (dk_acc, dv_acc), dq_i

    zeros = jnp.zeros((b, t, h, dh), jnp.float32)
    (dk, dv), dq_blocks = jax.lax.scan(body, (zeros, zeros), (qb, gb))
    dq = dq_blocks.transpose(1, 0, 2, 3, 4).reshape(b, n_blocks * block, h, dh)[:, :t]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


flash_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def dense_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Reference dense path (parity: `QKVAttentionLegacy`, `unet.py:343-360`)."""
    dh = q.shape[-1]
    scale = 1.0 / math.sqrt(math.sqrt(dh))
    logits = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale,
                        preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", weights, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
