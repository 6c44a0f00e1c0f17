"""The image-conditioned diffusion UNet, Flax linen, channels-last.

Structural parity with the reference `UNetModel`
(`ddpm/models/unet_openai/unet.py:402-808`):

- input = concat([x_t one-hot, condition image], channel axis) (`unet.py:760`)
- sinusoidal timestep embedding -> 2-layer SiLU MLP (`unet.py:504-510`)
- encoder: per level `num_res_blocks` ResBlocks (+ attention where the
  downsample rate `ds` is in `attention_resolutions`), Downsample between
  levels; middle Res+Attn+Res; decoder mirrors with skip concats
  (`unet.py:515-699,757-798`)
- head: GroupNorm -> SiLU -> zero-init 3x3 conv -> softmax over classes
  (`unet.py:701-713`); optional parallel CE-logits head (`unet.py:716-726`)
- optional DINO feature-map concat just before a configured encoder block at
  a configured stride (`unet.py:544-550,770-788`)

TPU-first choices: NHWC, bf16 torso / fp32 GroupNorm + softmax islands,
`jax.checkpoint` rematerialisation on attention (matching the reference's
always-on attention checkpointing, `unet.py:303`) and optionally ResBlocks.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ccdm_tpu.models.layers import (
    AttentionBlock,
    Downsample,
    GroupNorm32,
    ResBlock,
    Upsample,
    conv3x3,
    timestep_embedding,
)


def default_channel_mult(image_size: int) -> Tuple[float, ...]:
    """Channel-multiplier table by image size (`unet_openai/__init__.py:28-38`)."""
    table = {
        512: (0.5, 1, 1, 2, 2, 4, 4),
        256: (1, 1, 2, 2, 4, 4),
        128: (1, 1, 2, 3, 4),
        64: (1, 2, 3, 4),
    }
    if image_size not in table:
        raise ValueError(f"unsupported image size: {image_size}")
    return table[image_size]


class UNetModel(nn.Module):
    """See module docstring. Output is a dict
    `{"diffusion_out": probs [B,H,W,num_classes], "logits": optional}`
    (parity: `unet.py:802-808`)."""

    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    channel_mult: Sequence[float]
    dropout: float = 0.0
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    softmax_output: bool = True
    ce_head: bool = False
    # DINO conditioning: concat a [B, H/stride, W/stride, Cf] feature map
    # before encoder block `feature_cond_block_idx` (1-based over input
    # blocks, parity with `input_blocks_cnt` / `target_layer`, `unet.py:546`).
    feature_cond_block_idx: int = -1
    feature_cond_stride: int = 8
    remat_attention: bool = True
    remat_resblocks: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    # fp32 elementwise GroupNorm (exact reference semantics). False keeps
    # fp32 statistics but bf16 normalise - faster on bandwidth-bound levels.
    norm_fp32: bool = True
    # int8 convs in ResBlocks/resampling/in_conv (ops/quant.py): ~2.4x conv
    # throughput on the v5e MXU. Heads and attention stay float. OFF by
    # default; inference-only (the quantization round is not differentiable).
    quantize_convs: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        condition: jnp.ndarray,
        t: jnp.ndarray,
        feature_condition: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
        cached_skips: Optional[tuple] = None,
        return_skips: bool = False,
    ) -> dict:
        mc = self.model_channels
        attn_cls = nn.remat(AttentionBlock, static_argnums=()) if self.remat_attention else AttentionBlock
        # deterministic passes positionally through the remat boundary
        # (argnum 3 counting self) so it stays a static Python bool
        res_cls = (
            nn.remat(ResBlock, static_argnums=(3,)) if self.remat_resblocks else ResBlock
        )

        def res(h, emb, out_ch, *, up=False, down=False, name=None):
            block = res_cls(
                out_channels=out_ch, dropout=self.dropout,
                use_scale_shift_norm=self.use_scale_shift_norm,
                up=up, down=down, dtype=self.dtype,
                norm_fp32=self.norm_fp32, quant=self.quantize_convs, name=name,
            )
            if self.remat_resblocks:
                return block(h, emb, deterministic)
            return block(h, emb, deterministic=deterministic)

        def attn(h, name):
            return attn_cls(num_heads=self.num_heads,
                            num_head_channels=self.num_head_channels,
                            dtype=self.dtype, norm_fp32=self.norm_fp32,
                            name=name)(h)

        # Timestep embedding (parity: unet.py:504-510,758)
        emb = timestep_embedding(t, mc)
        time_dim = mc * 4
        emb = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32, name="time_mlp1")(emb)
        emb = nn.Dense(time_dim, dtype=self.dtype, param_dtype=jnp.float32, name="time_mlp2")(nn.silu(emb))

        # ---- encoder -------------------------------------------------------
        # `cached_skips` (experimental encoder-reuse sampling, see
        # diffusion/sampling.py) replays a previous step's encoder
        # activations: the encoder blocks are not executed at all
        ds = 1
        if cached_skips is not None:
            skips = list(cached_skips)
            h = skips[-1]
            ds = 2 ** (len(self.channel_mult) - 1)
            ch = int(self.channel_mult[-1] * mc)
        else:
            h = jnp.concatenate([x, condition], axis=-1).astype(self.dtype)
            ch = int(self.channel_mult[0] * mc)
            h = conv3x3(ch, self.dtype, name="in_conv", quant=self.quantize_convs)(h)
            skips = [h]
            block_idx = 1  # parity with input_blocks_cnt (unet.py:522)
            for level, mult in enumerate(self.channel_mult):
                for _ in range(self.num_res_blocks):
                    if (
                        feature_condition is not None
                        and block_idx == self.feature_cond_block_idx
                        and ds == self.feature_cond_stride
                    ):
                        h = jnp.concatenate([h, feature_condition.astype(self.dtype)], axis=-1)
                    ch = int(mult * mc)
                    h = res(h, emb, ch, name=f"down_{block_idx}_res")
                    if ds in self.attention_resolutions:
                        h = attn(h, name=f"down_{block_idx}_attn")
                    skips.append(h)
                    block_idx += 1
                if level != len(self.channel_mult) - 1:
                    h = Downsample(ch, use_conv=True, dtype=self.dtype,
                                   quant=self.quantize_convs,
                                   name=f"down_{block_idx}_downsample")(h)
                    skips.append(h)
                    block_idx += 1
                    ds *= 2
        encoder_skips = tuple(skips) if return_skips else None

        # ---- middle --------------------------------------------------------
        h = res(h, emb, ch, name="mid_res1")
        h = attn(h, name="mid_attn")
        h = res(h, emb, ch, name="mid_res2")

        # ---- decoder -------------------------------------------------------
        out_idx = 0
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                ch = int(mult * mc)
                h = res(h, emb, ch, name=f"up_{out_idx}_res")
                if ds in self.attention_resolutions:
                    h = attn(h, name=f"up_{out_idx}_attn")
                if level and i == self.num_res_blocks:
                    h = Upsample(ch, use_conv=True, dtype=self.dtype,
                                 quant=self.quantize_convs,
                                 name=f"up_{out_idx}_upsample")(h)
                    ds //= 2
                out_idx += 1
        assert not skips

        # ---- heads (fp32; parity: unet.py:701-726) --------------------------
        h = h.astype(jnp.float32)
        feats = nn.silu(GroupNorm32(name="out_norm")(h))
        out = conv3x3(self.out_channels, jnp.float32, name="out_conv", zero_init=True)(feats)
        if self.softmax_output:
            out = nn.softmax(out, axis=-1)
        ret = {"diffusion_out": out, "logits": None}
        if return_skips:
            ret["skips"] = encoder_skips
        if self.ce_head:
            # the CE head has its OWN normalization, independently trained
            # (parity: `out_ce = Sequential(normalization, SiLU, zero conv)`,
            # unet.py:716-726 — not shared with the diffusion head's out.0)
            ce_feats = nn.silu(GroupNorm32(name="out_ce_norm")(h))
            ret["logits"] = conv3x3(self.out_channels - 1, jnp.float32,
                                    name="out_ce_conv", zero_init=True)(ce_feats)
        return ret


def create_unet(
    image_size: int,
    base_channels: int,
    out_channels: int,
    num_res_blocks: int = 2,
    channel_mult: Optional[Sequence[float]] = None,
    attention_resolutions: Sequence[int] = (32, 16, 8),
    num_heads: int = 1,
    num_head_channels: int = -1,
    use_scale_shift_norm: bool = False,
    dropout: float = 0.0,
    softmax_output: bool = True,
    ce_head: bool = False,
    feature_cond_block_idx: int = -1,
    feature_cond_stride: int = 8,
    dtype: jnp.dtype = jnp.bfloat16,
    remat_resblocks: bool = False,
    remat_attention: bool = True,
    norm_fp32: bool = True,
    quantize_convs: bool = False,
) -> UNetModel:
    """Factory mirroring `create_unet_openai` (`unet_openai/__init__.py:5-61`)."""
    if channel_mult is None:
        channel_mult = default_channel_mult(image_size)
    return UNetModel(
        model_channels=base_channels,
        out_channels=out_channels,
        num_res_blocks=num_res_blocks,
        attention_resolutions=tuple(attention_resolutions),
        channel_mult=tuple(channel_mult),
        dropout=dropout,
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        use_scale_shift_norm=use_scale_shift_norm,
        softmax_output=softmax_output,
        ce_head=ce_head,
        feature_cond_block_idx=feature_cond_block_idx,
        feature_cond_stride=feature_cond_stride,
        dtype=dtype,
        remat_resblocks=remat_resblocks,
        remat_attention=remat_attention,
        norm_fp32=norm_fp32,
        quantize_convs=quantize_convs,
    )
