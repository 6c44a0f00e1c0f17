"""DINO extractor extras: log-binned descriptors, saliency maps, attn facet,
multi-layer descriptor extraction.

Closes the last deliberate absences of SURVEY.md #8 (reference
`ddpm/models/dino.py:231-277` `_log_bin`, `:326-340` saliency, `:311-324`
multi-layer descriptors). Each is checked against a torch oracle
re-implementing the reference semantics (the same in-test-oracle style as
tests/test_dino_torch_parity.py).
"""

import os
import sys
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from test_dino_torch_parity import _Block, _PatchEmbed  # noqa: E402


def torch_log_bin(x: torch.Tensor, gh: int, gw: int, hierarchy: int = 2):
    """Oracle: reference `_log_bin` semantics (`dino.py:231-277`) on a
    channels-last grid [B, gh, gw, D] -> [B, gh, gw, D*(1+8*hierarchy)].
    Per location: level-k 3^k average pools (count_include_pad=False)
    sampled at offsets {-3^k,0,3^k}^2 row-major (center only at k=0),
    edge-clamped; channels filled bin-major."""
    b, _, _, d = x.shape
    grid = x.permute(0, 3, 1, 2)  # [B, D, gh, gw]
    pools = []
    for k in range(hierarchy):
        win = 3 ** k
        pools.append(tnn.AvgPool2d(win, stride=1, padding=win // 2,
                                   count_include_pad=False)(grid))
    num_bins = 1 + 8 * hierarchy
    out = torch.zeros((b, d * num_bins, gh, gw))
    for y in range(gh):
        for xx in range(gw):
            part = 0
            for k in range(hierarchy):
                ks = 3 ** k
                for i in range(y - ks, y + ks + 1, ks):
                    for j in range(xx - ks, xx + ks + 1, ks):
                        if i == y and j == xx and k != 0:
                            continue
                        ti = max(0, min(i, gh - 1))
                        tj = max(0, min(j, gw - 1))
                        out[:, part * d:(part + 1) * d, y, xx] = \
                            pools[k][:, :, ti, tj]
                        part += 1
    return out.permute(0, 2, 3, 1)


def test_log_bin_matches_torch_oracle():
    from ccdm_tpu.models.dino import log_bin_descriptors

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 5, 7, 4)).astype(np.float32)
    got = np.asarray(log_bin_descriptors(feats))
    want = torch_log_bin(torch.from_numpy(feats), 5, 7).numpy()
    assert got.shape == (2, 5, 7, 4 * 17)
    np.testing.assert_allclose(got, want, atol=1e-6)


EMBED, DEPTH, HEADS, PATCH, PRETRAIN = 48, 2, 6, 8, 32


class MiniAttnViT(tnn.Module):
    """6-head mini DINO (stride == patch, input == pretrain size, so no
    pos-embed interpolation) exposing the post-softmax attention of the
    last block — the quantity `_extract_features(..., 'attn')` hooks at
    `dino.py:195-196`."""

    def __init__(self):
        super().__init__()
        self.patch_embed = _PatchEmbed(PATCH, EMBED)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, EMBED))
        side = PRETRAIN // PATCH
        self.pos_embed = tnn.Parameter(torch.zeros(1, 1 + side * side, EMBED))
        self.blocks = tnn.ModuleList(_Block(EMBED, HEADS) for _ in range(DEPTH))

    def last_block_attn(self, x):
        tokens = self.patch_embed(x)
        tokens = torch.cat((self.cls_token.expand(x.shape[0], -1, -1), tokens), dim=1)
        tokens = tokens + self.pos_embed
        attn_out = None
        for i, blk in enumerate(self.blocks):
            if i == DEPTH - 1:
                y = blk.norm1(tokens)
                B, N, C = y.shape
                qkv = blk.attn.qkv(y).reshape(
                    B, N, 3, HEADS, C // HEADS).permute(2, 0, 3, 1, 4)
                q, k = qkv[0], qkv[1]
                attn_out = ((q @ k.transpose(-2, -1)) * blk.attn.scale).softmax(dim=-1)
            tokens = blk(tokens)
        return attn_out  # [B, heads, T, T]


def _mini_encoder_and_params(facet="key"):
    import jax

    from ccdm_tpu.models.dino import DinoFeatureEncoder
    from convert_dino_checkpoint import convert

    torch.manual_seed(1)
    ref = MiniAttnViT()
    with torch.no_grad():
        for p in ref.parameters():
            p.uniform_(-0.08, 0.08)
    ref.eval()

    enc = DinoFeatureEncoder({
        "vit_config": dict(embed_dim=EMBED, depth=DEPTH, num_heads=HEADS,
                           patch_size=PATCH, pretrain_size=PRETRAIN),
        "output_stride": PATCH,
        "source_layer": DEPTH - 1,
        "facet": facet,
    })
    params = enc.init(jax.random.PRNGKey(0), (PRETRAIN, PRETRAIN, 3))
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        np.savez(f.name, **convert(state))
        params = enc.load_pretrained(f.name, params)
    return ref, enc, params


def test_saliency_matches_torch_oracle():
    ref, enc, params = _mini_encoder_and_params()
    x = np.random.default_rng(2).standard_normal(
        (2, PRETRAIN, PRETRAIN, 3)).astype(np.float32)

    with torch.no_grad():
        attn = ref.last_block_attn(torch.from_numpy(x).permute(0, 3, 1, 2))
        cls_attn = attn[:, [0, 2, 4, 5], 0, 1:].mean(dim=1)  # dino.py:336-337
        mins = cls_attn.min(dim=1, keepdim=True)[0]
        maxs = cls_attn.max(dim=1, keepdim=True)[0]
        want = ((cls_attn - mins) / (maxs - mins)).numpy()

    got = np.asarray(enc.extract_saliency_maps(params, x))
    assert got.shape == (2, (PRETRAIN // PATCH) ** 2)
    # min-max normalisation divides by a small range, amplifying einsum-order
    # float noise; 5e-4 on a [0,1] quantity is the same scale as the 1e-4
    # facet parity tolerance
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
    assert got.min() == pytest.approx(0.0) and got.max() == pytest.approx(1.0)


def test_saliency_requires_vits8():
    from ccdm_tpu.models.dino import DinoFeatureEncoder

    enc = DinoFeatureEncoder({"model": "dino_vitb8"})
    with pytest.raises(AssertionError, match="dino_vits"):
        enc.extract_saliency_maps({}, np.zeros((1, 32, 32, 3), np.float32))


def test_multi_layer_descriptors():
    """Reference multi-layer path (`dino.py:311-324`): per-layer grids, no
    resize unless requested; single-layer call agrees with the list entry."""
    _, enc, params = _mini_encoder_and_params()
    x = np.random.default_rng(3).standard_normal(
        (1, PRETRAIN, PRETRAIN, 3)).astype(np.float32)
    g = PRETRAIN // PATCH

    multi = enc.extract_descriptors(params, x, layers=[0, DEPTH - 1])
    assert isinstance(multi, list) and len(multi) == 2
    assert all(m.shape == (1, g, g, EMBED) for m in multi)
    single = enc.extract_descriptors(params, x, layers=DEPTH - 1)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(multi[1]))
    # layers differ => features differ
    assert not np.allclose(np.asarray(multi[0]), np.asarray(multi[1]))

    resized = enc.extract_descriptors(params, x, layers=[0], resize_shape=(8, 8))
    assert resized[0].shape == (1, 8, 8, EMBED)

    binned = enc.extract_descriptors(params, x, log_bin=True)
    assert binned.shape == (1, g, g, EMBED * 17)

    with pytest.raises(AssertionError, match="facet"):
        enc.extract_descriptors(params, x, facet="attn")  # dino.py:290
