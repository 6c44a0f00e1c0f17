"""DINO ViT feature extractor (ViT-S/8, ViT-B/8) in Flax.

Re-expresses the reference's `ViTExtractor` (`ddpm/models/dino.py:15-340`)
TPU-style: instead of torch forward hooks capturing attention facets
(`dino.py:161-229`), the Flax module returns the requested facet directly
from the target block; instead of monkey-patched conv stride + a swapped
`interpolate_pos_encoding` method (`dino.py:84-139`), stride and
position-embedding interpolation are ordinary module parameters/functions.

Behavioural parity:
- patch embed conv with stride `output_stride` (<= patch size, dividing it)
- bicubic interpolation of the patch position embeddings to the token grid
  (`dino.py:92-116`), cls token prepended
- facet extraction at a configurable layer (default 11, the last): 'key' /
  'query' / 'value' are per-head attention tensors flattened back to
  `[B, tokens, dim]`; 'token' is the block output (`dino.py:279-324`)
- descriptors reshaped to `[B, H/stride, W/stride, dim]` channels-last and
  bilinearly resized (`dino.py:303-307`) — ready to concat into the UNet

Pretrained weights: this container has no network egress, so torch-hub
download (`dino.py:66`) is replaced by `scripts/convert_dino_checkpoint.py`
(torch .pth -> .npz) + `load_dino_npz`. Random init carries a loud warning.

Configs: dino_vits8 (dim 384, 6 heads, 12 blocks), dino_vitb8 (768, 12, 12).
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LOGGER = logging.getLogger(__name__)

VIT_CONFIGS = {
    "dino_vits8": dict(embed_dim=384, depth=12, num_heads=6, patch_size=8),
    "dino_vitb8": dict(embed_dim=768, depth=12, num_heads=12, patch_size=8),
    "dino_vits16": dict(embed_dim=384, depth=12, num_heads=6, patch_size=16),
    "dino_vitb16": dict(embed_dim=768, depth=12, num_heads=12, patch_size=16),
}

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


_CUBIC_A = -0.75  # torch's bicubic kernel coefficient (Keys, a = -0.75)


def _torch_bicubic_matrix(in_size: int, out_size: int, src_scale: float) -> np.ndarray:
    """Interpolation weights `[out, in]` replicating torch
    `F.interpolate(mode='bicubic', align_corners=False,
    recompute_scale_factor=False)` exactly: source coordinate
    `(dst + 0.5) * src_scale - 0.5`, 4-tap Keys kernel with a = -0.75,
    edge-clamped taps, NO antialiasing on downscale.

    `jax.image.resize` can't express this (it uses a = -0.5 and always
    antialiases when minifying), and the reference's `cdm_dino_256x512`
    checkpoint was trained against torch's convention — so the exact sampling
    is reproduced as a precomputed (static-shape) linear map.
    """
    a = _CUBIC_A
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        src = (i + 0.5) * src_scale - 0.5
        f = np.floor(src)
        t = src - f
        coeffs = (
            ((a * (t + 1) - 5 * a) * (t + 1) + 8 * a) * (t + 1) - 4 * a,
            ((a + 2) * t - (a + 3)) * t * t + 1,
            ((a + 2) * (1 - t) - (a + 3)) * (1 - t) * (1 - t) + 1,
            ((a * (2 - t) - 5 * a) * (2 - t) + 8 * a) * (2 - t) - 4 * a,
        )
        for tap, c in zip((-1, 0, 1, 2), coeffs):
            idx = int(np.clip(f + tap, 0, in_size - 1))
            w[i, idx] += c
    return w.astype(np.float32)


def interpolate_pos_embed(pos_embed: jnp.ndarray, grid_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bicubic-resize the (non-cls) position embeddings to a new token grid.

    Parity: `_fix_pos_enc.interpolate_pos_encoding` (`dino.py:92-116`),
    including DINO's `+ 0.1` scale-factor nudge (floating-point guard from
    facebookresearch/dino#8) and torch's exact bicubic sampling.
    `pos_embed`: [1, 1 + N, D] with N a square grid.
    """
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:]
    n = patch_pe.shape[1]
    side = int(round(float(np.sqrt(n))))
    assert side * side == n, f"non-square pretrain grid {n}"
    h, w = grid_hw
    if (h, w) == (side, side):
        return pos_embed
    grid = patch_pe.reshape(1, side, side, -1)
    # torch receives scale_factor (g + 0.1)/side and inverts it for sampling
    wh = jnp.asarray(_torch_bicubic_matrix(side, h, side / (h + 0.1)))
    ww = jnp.asarray(_torch_bicubic_matrix(side, w, side / (w + 0.1)))
    grid = jnp.einsum("hs,bstd->bhtd", wh, grid)
    grid = jnp.einsum("wt,bhtd->bhwd", ww, grid)
    return jnp.concatenate([cls_pe, grid.reshape(1, h * w, -1)], axis=1)


class ViTBlock(nn.Module):
    """Pre-LN transformer block returning (output, facets dict)."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, t, d = x.shape
        dh = d // self.num_heads
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        qkv = nn.Dense(3 * d, dtype=self.dtype, name="attn_qkv")(y)
        qkv = qkv.reshape(b, t, 3, self.num_heads, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B,T,H,dh]
        logits = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(dh)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = nn.Dense(d, dtype=self.dtype, name="attn_proj")(out.reshape(b, t, d))
        x = x + out
        y2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        hdim = int(d * self.mlp_ratio)
        y2 = nn.Dense(hdim, dtype=self.dtype, name="mlp_fc1")(y2)
        # exact erf GELU — torch nn.GELU default (flax defaults to tanh approx)
        y2 = nn.Dense(d, dtype=self.dtype, name="mlp_fc2")(nn.gelu(y2, approximate=False))
        x = x + y2

        # Facet channel order parity: the reference flattens `[B, heads, T, dh]`
        # as `permute(0, 2, 3, 1).flatten(-2, -1)` (`dino.py:303`), i.e.
        # channel = dh_index * heads + head_index (head-MINOR). The converted
        # `cdm_dino_256x512` UNet weights expect exactly that ordering.
        def flat(z):  # [B,T,heads,dh] -> [B,T,dh*heads]
            return z.transpose(0, 1, 3, 2).reshape(b, t, d)

        facets = {
            "query": flat(q),
            "key": flat(k),
            "value": flat(v),
            "token": x,
            # post-softmax attention [B, heads, T, T] — the reference captures
            # it after `attn_drop` (identity at eval), `dino.py:195-196`
            "attn": attn,
        }
        return x, facets


class DinoViT(nn.Module):
    """DINO ViT returning the facet of a chosen block as a feature map."""

    embed_dim: int
    depth: int
    num_heads: int
    patch_size: int
    stride: int
    source_layer: int = 11
    facet: str = "key"
    pretrain_size: int = 224  # image size of the pretrained pos-embed grid
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, facet: Optional[str] = None,
                 layers: Optional[Tuple[int, ...]] = None):
        """images: [B,H,W,3] ImageNet-normalised.

        `facet`/`layers` are static overrides of the module defaults.
        Returns [B,h',w',D] for spatial facets ('key'/'query'/'value'/'token'),
        or the raw post-softmax attention [B, heads, 1+h'w', 1+h'w'] for
        facet='attn' (the reference's `_extract_features(..., 'attn')` shape,
        `dino.py:219-221` — used by saliency maps, `dino.py:326-340`).
        With `layers` (the reference's multi-layer `extract_descriptors`
        path, `dino.py:311-324`) a list of per-layer results is returned.
        """
        facet = facet or self.facet
        capture = tuple(layers) if layers is not None else (self.source_layer,)
        assert all(0 <= l < self.depth for l in capture), \
            f"capture layers {capture} out of range for depth {self.depth}"
        b, h, w, _ = images.shape
        p, s = self.patch_size, self.stride
        assert p % s == 0 or s == p, f"stride {s} must divide patch {p}"
        gh = 1 + (h - p) // s
        gw = 1 + (w - p) // s

        x = nn.Conv(self.embed_dim, (p, p), strides=(s, s), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(images.astype(self.dtype))
        x = x.reshape(b, gh * gw, self.embed_dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.embed_dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + (self.pretrain_size // p) ** 2, self.embed_dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.embed_dim)).astype(x.dtype), x], axis=1)
        x = x + interpolate_pos_embed(pos, (gh, gw)).astype(x.dtype)

        grabbed = {}
        for i in range(self.depth):
            x, facets = ViTBlock(self.num_heads, dtype=self.dtype, name=f"block_{i}")(x)
            if i in capture:
                grabbed[i] = facets[facet]
        if facet == "attn":
            outs = [grabbed[i] for i in capture]  # [B, heads, T, T]
        else:
            # drop cls (dino.py:298) and fold back to the token grid
            outs = [grabbed[i][:, 1:].reshape(b, gh, gw, self.embed_dim)
                    for i in capture]
        return outs if layers is not None else outs[0]


def log_bin_descriptors(feats: jnp.ndarray, hierarchy: int = 2) -> jnp.ndarray:
    """Log-binned descriptors over a token-grid facet map.

    Parity: `ViTExtractor._log_bin` (`dino.py:231-277`) — per spatial
    location, `1 + 8*hierarchy` bins: level k pools with a 3^k average
    (edge counts exclude padding, torch `count_include_pad=False`) sampled
    at the 3x3 ring of offsets `{-3^k, 0, 3^k}` (row-major; the center bin
    only at k=0), out-of-range offsets edge-clamped. Channel layout is
    bin-major blocks of D, matching the reference's
    `[:, part_idx*d:(part_idx+1)*d]` fill order.

    NOTE: in the upstream CLI `--bin` never reaches `_log_bin` — the
    `extract_descriptors(batch, layer, facet, bin)` call lands on the
    `include_cls` parameter (`dino.py:279-285,378`), so upstream `_log_bin`
    is dead code. It is implemented for real here.

    TPU-style: the reference's O(H*W*bins) Python loop over pixels becomes
    vectorized clipped-index gathers of the pooled maps — no per-pixel code.

    feats: [B, gh, gw, D] channels-last.  Returns [B, gh, gw, D*(1+8*h)].
    """
    b, gh, gw, d = feats.shape
    f32 = feats.astype(jnp.float32)

    pools = []
    for k in range(hierarchy):
        win = 3 ** k
        if win == 1:
            pools.append(f32)
            continue
        ones = jnp.ones((1, gh, gw, 1), jnp.float32)
        sums = jax.lax.reduce_window(
            f32, 0.0, jax.lax.add, (1, win, win, 1), (1, 1, 1, 1), "SAME")
        counts = jax.lax.reduce_window(
            ones, 0.0, jax.lax.add, (1, win, win, 1), (1, 1, 1, 1), "SAME")
        pools.append(sums / counts)

    ys = np.arange(gh)
    xs = np.arange(gw)
    parts = []
    for k in range(hierarchy):
        step = 3 ** k
        for di in (-step, 0, step):
            for dj in (-step, 0, step):
                if di == 0 and dj == 0 and k != 0:
                    continue
                iy = np.clip(ys + di, 0, gh - 1)
                ix = np.clip(xs + dj, 0, gw - 1)
                parts.append(pools[k][:, iy][:, :, ix])
    return jnp.concatenate(parts, axis=-1).astype(feats.dtype)


# heads averaged for saliency, `dino.py:336` (dino_vits8-specific)
SALIENCY_HEAD_IDXS = (0, 2, 4, 5)


class DinoFeatureEncoder:
    """Functional wrapper: the `_build_feature_cond_encoder` analogue
    (`condition_encoder.py:56-82`). Frozen by default (`train: no`)."""

    def __init__(self, fce_params: dict):
        name = fce_params.get("model", "dino_vits8")
        # `vit_config` overrides the named architecture (tiny test encoders)
        cfg = fce_params.get("vit_config") or VIT_CONFIGS[name]
        self.name = name
        self.stride = int(fce_params.get("output_stride", 8))
        self.module = DinoViT(
            embed_dim=cfg["embed_dim"], depth=cfg["depth"],
            num_heads=cfg["num_heads"], patch_size=cfg["patch_size"],
            stride=self.stride,
            source_layer=int(fce_params.get("source_layer", 11)),
            facet=str(fce_params.get("facet", "key")),
            pretrain_size=int(cfg.get("pretrain_size", 224)),
        )
        self.channels = cfg["embed_dim"]
        self.trainable = bool(fce_params.get("train", False))

    def init(self, key: jax.Array, image_shape: Tuple[int, int, int]):
        h, w, _ = image_shape
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        return self.module.init({"params": key}, dummy)["params"]

    def load_pretrained(self, npz_path: str, params):
        return load_dino_npz(npz_path, params)

    def __call__(self, params, images: jnp.ndarray,
                 resize_to: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
        """[B,H,W,3] -> [B, H/stride, W/stride, D] (or `resize_to`)."""
        feats = self.module.apply({"params": params}, images)
        b, gh, gw, d = feats.shape
        h, w = images.shape[1:3]
        target = resize_to or (h // self.stride, w // self.stride)
        if (gh, gw) != target:
            feats = jax.image.resize(feats, (b, *target, d), method="bilinear")
        if not self.trainable:
            feats = jax.lax.stop_gradient(feats)
        return feats

    def extract_descriptors(self, params, images: jnp.ndarray,
                            layers=None, facet: Optional[str] = None,
                            resize_shape: Optional[Tuple[int, int]] = None,
                            log_bin: bool = False):
        """Reference `ViTExtractor.extract_descriptors` (`dino.py:279-324`).

        `layers` an int (or None = configured layer) returns one [B,h',w',D]
        map bilinear-resized to `resize_shape` (default H//stride, W//stride,
        `dino.py:303-307`); a list returns per-layer maps (resized only when
        `resize_shape` is given, `dino.py:311-324`). `log_bin=True` applies
        `log_bin_descriptors` to the raw token grid first (the upstream
        `--bin` intent; see the NOTE there).
        """
        facet = facet or self.module.facet
        assert facet in ("key", "query", "value", "token"), (
            f"{facet} is not a supported facet for descriptors")  # dino.py:290
        multi = isinstance(layers, (list, tuple))
        capture = tuple(layers) if multi else (
            (self.module.source_layer,) if layers is None else (int(layers),))
        grids = self.module.apply({"params": params}, images,
                                  facet=facet, layers=capture)
        if log_bin:
            grids = [log_bin_descriptors(g) for g in grids]
        h, w = images.shape[1:3]
        target = resize_shape or (h // self.stride, w // self.stride)
        out = []
        for g in grids:
            b, gh, gw, d = g.shape
            if multi and resize_shape is None:
                out.append(g)  # multi-layer path resizes only on request
            elif (gh, gw) != target:
                out.append(jax.image.resize(g, (b, *target, d), method="bilinear"))
            else:
                out.append(g)
        return out if multi else out[0]

    def extract_saliency_maps(self, params, images: jnp.ndarray) -> jnp.ndarray:
        """Reference `ViTExtractor.extract_saliency_maps` (`dino.py:326-340`):
        cls-token attention of the last block, averaged over heads
        {0,2,4,5}, min-max normalised per image. Returns [B, tokens-1]."""
        assert self.name == "dino_vits8", (
            "saliency maps are supported only for dino_vits model_type")
        attn = self.module.apply({"params": params}, images, facet="attn",
                                 layers=(self.module.depth - 1,))[0]
        cls_attn = attn[:, jnp.asarray(SALIENCY_HEAD_IDXS), 0, 1:].mean(axis=1)
        lo = cls_attn.min(axis=1, keepdims=True)
        hi = cls_attn.max(axis=1, keepdims=True)
        # eps guards constant attention (hi == lo would be 0/0; the reference
        # divides unguarded, dino.py:339 — a zero map beats a NaN map)
        return (cls_attn - lo) / jnp.maximum(hi - lo, 1e-12)


def load_dino_npz(npz_path: str, params):
    """Load converted DINO weights (see scripts/convert_dino_checkpoint.py)
    into the Flax param tree by matching flattened key paths."""
    blob = np.load(npz_path)
    leaves_with_path, _ = jax.tree_util.tree_flatten_with_path(params)
    new_leaves = []
    for path, leaf in leaves_with_path:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if name not in blob:
            raise KeyError(f"converted checkpoint missing {name!r}")
        arr = jnp.asarray(blob[name], dtype=leaf.dtype)
        assert arr.shape == leaf.shape, f"{name}: {arr.shape} != {leaf.shape}"
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(jax.tree.structure(params), new_leaves)
