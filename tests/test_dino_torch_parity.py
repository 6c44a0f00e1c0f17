"""Numerical parity of the Flax DINO extractor vs the torch reference.

Mirrors tests/test_torch_parity.py for the UNet: build the REFERENCE
architecture in torch (a faithful miniature of facebookresearch/dino's
`VisionTransformer` + the `ViTExtractor` stride patching / hook capture /
descriptor pipeline, `/root/reference/ddpm/models/dino.py:84-139,161-229,
279-324`), with random weights, convert them through
`scripts/convert_dino_checkpoint.convert`, and assert the facet feature maps
agree to ~1e-4 — on a NON-SQUARE input so the bicubic pos-embed interpolation
path (incl. DINO's +0.1 scale nudge and torch's a=-0.75 kernel) is exercised,
at stride < patch (overlapping patch conv) and stride == patch.
"""

import math
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

EMBED, DEPTH, HEADS, PATCH, PRETRAIN = 64, 3, 2, 8, 32


class _Attention(tnn.Module):
    """facebookresearch/dino `Attention` (qkv packed, scale after q@k^T)."""

    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads, C // self.num_heads)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class _Mlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class _Block(tnn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = _Attention(dim, num_heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = _Mlp(dim, int(dim * 4.0))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class _PatchEmbed(tnn.Module):
    def __init__(self, patch, dim):
        super().__init__()
        self.proj = tnn.Conv2d(3, dim, kernel_size=patch, stride=patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class MiniDinoViT(tnn.Module):
    """Reference architecture with the `patch_vit_resolution` stride patch
    applied (`dino.py:121-139`): patch conv stride overridden, pos-embed
    interpolation per `_fix_pos_enc` (`dino.py:84-118`) — verbatim semantics,
    including the reference's dim naming (`w` = shape[2], `h` = shape[3])."""

    def __init__(self, stride):
        super().__init__()
        self.patch_size = PATCH
        self.stride = (stride, stride)
        self.patch_embed = _PatchEmbed(PATCH, EMBED)
        self.patch_embed.proj.stride = self.stride  # dino.py:136
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, EMBED))
        side = PRETRAIN // PATCH
        self.pos_embed = tnn.Parameter(torch.zeros(1, 1 + side * side, EMBED))
        self.blocks = tnn.ModuleList(_Block(EMBED, HEADS) for _ in range(DEPTH))

    def interpolate_pos_encoding(self, x, w, h):  # dino.py:92-116 verbatim
        npatch = x.shape[1] - 1
        N = self.pos_embed.shape[1] - 1
        if npatch == N and w == h:
            return self.pos_embed
        class_pos_embed = self.pos_embed[:, 0]
        patch_pos_embed = self.pos_embed[:, 1:]
        dim = x.shape[-1]
        w0 = 1 + (w - self.patch_size) // self.stride[1]
        h0 = 1 + (h - self.patch_size) // self.stride[0]
        assert w0 * h0 == npatch
        w0, h0 = w0 + 0.1, h0 + 0.1
        patch_pos_embed = F.interpolate(
            patch_pos_embed.reshape(
                1, int(math.sqrt(N)), int(math.sqrt(N)), dim).permute(0, 3, 1, 2),
            scale_factor=(w0 / math.sqrt(N), h0 / math.sqrt(N)),
            mode="bicubic", align_corners=False, recompute_scale_factor=False)
        assert int(w0) == patch_pos_embed.shape[-2] and int(h0) == patch_pos_embed.shape[-1]
        patch_pos_embed = patch_pos_embed.permute(0, 2, 3, 1).view(1, -1, dim)
        return torch.cat((class_pos_embed.unsqueeze(0), patch_pos_embed), dim=1)

    def prepare_tokens(self, x):  # dino VisionTransformer.prepare_tokens
        B, nc, w, h = x.shape  # (reference naming: w = H-dim, h = W-dim)
        x = self.patch_embed(x)
        cls_tokens = self.cls_token.expand(B, -1, -1)
        x = torch.cat((cls_tokens, x), dim=1)
        return x + self.interpolate_pos_encoding(x, w, h)

    def extract_key_descriptors(self, x, layer):
        """Hook capture (`dino.py:179-183`) + descriptor pipeline
        (`dino.py:296-307`): key facet at `layer`, cls dropped, channels
        flattened head-MINOR, reshaped to the token grid, bilinear-resized
        to (H//stride, W//stride)."""
        B, C, H, W = x.shape
        tokens = self.prepare_tokens(x)
        feats = None
        for i, blk in enumerate(self.blocks):
            if i == layer:
                inp = blk.norm1(tokens)
                Bq, N, D = inp.shape
                qkv = blk.attn.qkv(inp).reshape(
                    Bq, N, 3, HEADS, D // HEADS).permute(2, 0, 3, 1, 4)
                feats = qkv[1]  # key: [B, heads, T, dh]
            tokens = blk(tokens)
        x = feats[:, :, 1:, :]  # drop cls
        x = x.permute(0, 2, 3, 1).flatten(start_dim=-2, end_dim=-1).unsqueeze(1)
        gh = 1 + (H - self.patch_size) // self.stride[0]
        gw = 1 + (W - self.patch_size) // self.stride[1]
        x = x.view(B, 1, gh, gw, -1).squeeze(1).permute(0, 3, 1, 2)
        x = F.interpolate(x, (H // self.stride[0], W // self.stride[1]),
                          mode="bilinear")
        return x  # [B, D, H/stride, W/stride]


@pytest.mark.parametrize("stride", [4, 8])
def test_dino_facet_parity(stride):
    import jax

    from ccdm_tpu.models.dino import DinoFeatureEncoder
    from convert_dino_checkpoint import convert

    torch.manual_seed(0)
    ref = MiniDinoViT(stride)
    with torch.no_grad():
        for p in ref.parameters():
            p.uniform_(-0.08, 0.08)
    ref.eval()

    h, w = 32, 48  # non-square: pos-embed grid 4x4 -> (gh, gw), gh != gw
    x = np.random.default_rng(0).standard_normal((2, h, w, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref.extract_key_descriptors(
            torch.from_numpy(x).permute(0, 3, 1, 2), layer=DEPTH - 1)
    want = want.permute(0, 2, 3, 1).numpy()  # NCHW -> NHWC

    enc = DinoFeatureEncoder({
        "vit_config": dict(embed_dim=EMBED, depth=DEPTH, num_heads=HEADS,
                           patch_size=PATCH, pretrain_size=PRETRAIN),
        "output_stride": stride,
        "source_layer": DEPTH - 1,
    })
    params = enc.init(jax.random.PRNGKey(0), (h, w, 3))
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    converted = convert(state)

    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        np.savez(f.name, **converted)
        params = enc.load_pretrained(f.name, params)

    got = np.asarray(enc(params, x))
    assert got.shape == want.shape == (2, h // stride, w // stride, EMBED)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
