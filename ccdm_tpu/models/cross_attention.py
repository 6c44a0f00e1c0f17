"""Latent-diffusion-style spatial transformer (self + cross attention).

Capability parity with `ddpm/models/unet_openai/attention.py:40-192`
(`SpatialTransformer`/`BasicTransformerBlock`/`CrossAttention`/`GEGLU`). In
the reference this is wired into `TimestepEmbedSequential.forward`
(`unet.py:76-84`) but never instantiated by `UNetModel` — context is always
None (`unet.py:761`). It is provided here with the same status: available for
context-conditioned variants, unused by the stock CCDM configs.

Structure per block: LN -> self-attention -> res, LN -> cross-attention
(context or self) -> res, LN -> GEGLU feed-forward -> res; the transformer
wraps blocks with a GroupNorm + 1x1 in/out projection and a residual
(zero-init output projection, parity with `zero_module` usage).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ccdm_tpu.models.layers import GroupNorm32, conv1x1


class CrossAttention(nn.Module):
    """Multi-head attention where kv come from `context` (or x if None)."""

    num_heads: int = 8
    head_dim: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        inner = self.num_heads * self.head_dim
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        def split(a):
            b, t, _ = a.shape
            return a.reshape(b, t, self.num_heads, self.head_dim)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32) * (self.head_dim ** -0.5)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        b, t = x.shape[:2]
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out.reshape(b, t, inner))


class GEGLU(nn.Module):
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(2 * self.out_dim, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class BasicTransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    mlp_mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        d = x.shape[-1]
        x = x + CrossAttention(self.num_heads, self.head_dim, self.dtype, name="attn1")(
            nn.LayerNorm(dtype=self.dtype, name="norm1")(x))
        x = x + CrossAttention(self.num_heads, self.head_dim, self.dtype, name="attn2")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x), context)
        y = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        y = GEGLU(d * self.mlp_mult, self.dtype, name="ff_geglu")(y)
        y = nn.Dense(d, dtype=self.dtype, name="ff_out")(y)
        return x + y


class SpatialTransformer(nn.Module):
    """Transformer over flattened spatial tokens with conv in/out projections."""

    num_heads: int
    head_dim: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b, h, w, c = x.shape
        inner = self.num_heads * self.head_dim
        residual = x
        y = GroupNorm32(name="norm")(x)
        y = conv1x1(inner, self.dtype, name="proj_in")(y).reshape(b, h * w, inner)
        for i in range(self.depth):
            y = BasicTransformerBlock(self.num_heads, self.head_dim,
                                      dtype=self.dtype, name=f"block_{i}")(y, context)
        y = y.reshape(b, h, w, inner)
        y = conv1x1(c, self.dtype, name="proj_out", zero_init=True)(y)
        return y + residual
