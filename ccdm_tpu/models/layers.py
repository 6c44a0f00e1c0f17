"""Building blocks for the diffusion UNet, Flax linen, channels-last.

Re-expresses the guided-diffusion blocks used by the reference
(`ddpm/models/unet_openai/unet.py`, `nn.py`) in TPU-idiomatic form:

- NHWC layout throughout (lanes hold channels; convs map directly to the MXU),
- bf16 torso with fp32 islands: GroupNorm statistics in fp32
  (parity: `GroupNorm32`, `nn.py:17-19`) and attention softmax in fp32
  (parity: `unet.py:358`),
- zero-initialised output projections (parity: `zero_module`, `nn.py:68-74`),
- explicit torch-style padding ((1,1),(1,1)) on 3x3 convs so a later
  PyTorch-checkpoint conversion is pixel-exact.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

PAD1 = ((1, 1), (1, 1))


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding `[B] -> [B, dim]` (cos-first).

    Parity: `unet_openai/nn.py:103-121` — note the reference concatenates
    `[cos, sin]` (not the more common sin-first order).
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm(32) with fp32 statistics.

    Parity: `normalization`/`GroupNorm32` (`nn.py:17-19,93-100`) — the
    reference upcasts the whole tensor to fp32. Mean/variance here are always
    accumulated in fp32 (flax promotes stats); with `full_fp32=True` the
    elementwise normalise also runs in fp32 (exact reference semantics), with
    `False` it stays in the input dtype — half the HBM traffic on the
    bandwidth-bound outer UNet levels, stats still fp32.
    """

    full_fp32: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # Largest divisor of C that is <= 32: exactly 32 for every real config
        # (channels are 32-multiples, matching the reference's GroupNorm(32));
        # generalises to narrow test configs.
        c = x.shape[-1]
        groups = min(32, c)
        while c % groups:
            groups -= 1
        dtype = jnp.float32 if self.full_fp32 else x.dtype
        y = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=dtype,
                         param_dtype=jnp.float32)(x)
        return y.astype(x.dtype)


def conv3x3(features: int, dtype, name: Optional[str] = None, zero_init: bool = False,
            quant: bool = False) -> nn.Module:
    init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    if quant:
        from ccdm_tpu.ops.quant import QuantConv

        return QuantConv(features, (3, 3), padding=PAD1, kernel_init=init, name=name)
    return nn.Conv(features, (3, 3), padding=PAD1, dtype=dtype,
                   param_dtype=jnp.float32, kernel_init=init, name=name)


def conv1x1(features: int, dtype, name: Optional[str] = None, zero_init: bool = False,
            quant: bool = False) -> nn.Module:
    init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    if quant:
        from ccdm_tpu.ops.quant import QuantConv

        return QuantConv(features, (1, 1), padding=((0, 0), (0, 0)),
                         kernel_init=init, name=name)
    return nn.Conv(features, (1, 1), dtype=dtype, param_dtype=jnp.float32,
                   kernel_init=init, name=name)


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x spatial upsample (parity: `unet.py:106-116`)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class Upsample(nn.Module):
    """2x nearest upsample + optional 3x3 conv (parity: `unet.py:85-116`)."""

    out_channels: int
    use_conv: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nearest_upsample_2x(x)
        if self.use_conv:
            x = conv3x3(self.out_channels, self.dtype, name="conv", quant=self.quant)(x)
        return x


class Downsample(nn.Module):
    """Stride-2 3x3 conv or 2x2 average pool (parity: `unet.py:119-146`)."""

    out_channels: int
    use_conv: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_conv:
            if self.quant:
                from ccdm_tpu.ops.quant import QuantConv

                return QuantConv(self.out_channels, (3, 3), strides=(2, 2),
                                 padding=PAD1, name="op")(x)
            return nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=PAD1,
                           dtype=self.dtype, param_dtype=jnp.float32, name="op")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResBlock(nn.Module):
    """Timestep-conditioned residual block (parity: `unet.py:149-262`).

    Layer order matches the reference exactly: `norm→SiLU→conv3x3`, add (or
    FiLM with `use_scale_shift_norm`) the time embedding, then
    `norm→SiLU→dropout→zero-conv3x3`, plus a 1x1-projected skip when the
    channel count changes. `up`/`down` resample both branches before the
    first conv (parity: `unet.py:242-248`).
    """

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    norm_fp32: bool = True
    # int8 convs for inference (ops/quant.py); float path when False
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # NOTE: deterministic is positional-or-keyword so the remat wrapper
        # can mark it static by argnum (unet.py static_argnums=(3,))
        in_ch = x.shape[-1]
        h = nn.silu(GroupNorm32(self.norm_fp32, name="in_norm")(x))
        if self.up:
            h = nearest_upsample_2x(h)
            x = nearest_upsample_2x(x)
        elif self.down:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        h = conv3x3(self.out_channels, self.dtype, name="in_conv", quant=self.quant)(h)

        emb_width = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        emb_out = nn.Dense(emb_width, dtype=self.dtype, param_dtype=jnp.float32,
                           name="emb_proj")(nn.silu(emb))
        emb_out = emb_out[:, None, None, :].astype(h.dtype)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(self.norm_fp32, name="out_norm")(h) * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = nn.silu(GroupNorm32(self.norm_fp32, name="out_norm")(h))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv3x3(self.out_channels, self.dtype, name="out_conv", zero_init=True,
                    quant=self.quant)(h)

        if in_ch != self.out_channels:
            x = conv1x1(self.out_channels, self.dtype, name="skip", quant=self.quant)(x)
        return x + h


class AttentionBlock(nn.Module):
    """Spatial self-attention over flattened H·W tokens.

    Parity: `AttentionBlock` + `QKVAttentionLegacy` (`unet.py:265-311,334-360`):
    pre-norm, fused qkv projection, per-head scale `1/sqrt(sqrt(d))` applied to
    both q and k, softmax in fp32, zero-init output projection, residual add.
    Token counts here are small (≤2048 at ds=8 for 256x512 inputs) so a dense
    fp32-softmax attention lowers cleanly onto the MXU; no flash kernel needed.
    """

    num_heads: int = 1
    num_head_channels: int = -1
    dtype: jnp.dtype = jnp.bfloat16
    norm_fp32: bool = True
    # None = auto (flash on TPU at >=2048 tokens), True/False = force
    flash_attention: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            assert c % self.num_head_channels == 0, (
                f"channels {c} not divisible by num_head_channels {self.num_head_channels}"
            )
            heads = c // self.num_head_channels
        dh = c // heads

        tokens = x.reshape(b, h * w, c)
        norm = GroupNorm32(self.norm_fp32, name="norm")(tokens)
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(norm)
        q, k, v = jnp.split(qkv.reshape(b, h * w, heads, 3 * dh), 3, axis=-1)

        from ccdm_tpu.ops.flash_attention import dense_attention, flash_attention

        # Pallas flash path above the token count where the dense [B,H,T,T]
        # tensor starts to dominate HBM (Cityscapes 256x512 at ds=8 = 2048
        # tokens); dense below it, where XLA fusion wins.
        if self.flash_attention or (
            self.flash_attention is None
            and h * w >= 2048
            and jax.default_backend() == "tpu"
        ):
            out = flash_attention(q, k, v)
        else:
            out = dense_attention(q, k, v)
        out = out.astype(self.dtype).reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=nn.initializers.zeros, name="proj")(out)
        return (tokens + out).reshape(b, h, w, c)
