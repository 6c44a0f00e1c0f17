import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.models.dino import (
    DinoFeatureEncoder,
    DinoViT,
    interpolate_pos_embed,
)


def test_interpolate_pos_embed_identity_and_resize():
    pe = np.random.default_rng(0).standard_normal((1, 1 + 16, 8)).astype(np.float32)
    same = interpolate_pos_embed(jnp.asarray(pe), (4, 4))
    np.testing.assert_allclose(np.asarray(same), pe, atol=1e-6)
    bigger = interpolate_pos_embed(jnp.asarray(pe), (6, 8))
    assert bigger.shape == (1, 1 + 48, 8)
    # cls embedding is passed through untouched
    np.testing.assert_allclose(np.asarray(bigger[:, 0]), pe[:, 0], atol=1e-6)


@pytest.fixture(scope="module")
def tiny_vit():
    vit = DinoViT(embed_dim=32, depth=2, num_heads=4, patch_size=8, stride=8,
                  source_layer=1)
    imgs = jnp.zeros((1, 32, 32, 3))
    params = vit.init({"params": jax.random.PRNGKey(0)}, imgs)["params"]
    return vit, params


def test_vit_feature_grid_shape(tiny_vit):
    vit, params = tiny_vit
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    feats = vit.apply({"params": params}, imgs)
    assert feats.shape == (2, 4, 4, 32)  # 32/8 grid
    # rectangular input works (pos-embed interpolation path)
    feats2 = vit.apply({"params": params}, jnp.zeros((1, 32, 64, 3)))
    assert feats2.shape == (1, 4, 8, 32)


def test_feature_encoder_protocol():
    fce = {"type": "dino", "model": "dino_vits8", "output_stride": 8,
           "source_layer": 11, "train": False}
    enc = DinoFeatureEncoder(fce)
    assert enc.channels == 384
    # use a tiny stand-in module to keep the test fast
    enc.module = DinoViT(embed_dim=16, depth=2, num_heads=2, patch_size=8,
                         stride=8, source_layer=1)
    enc.channels = 16
    params = enc.init(jax.random.PRNGKey(0), (32, 32, 3))
    imgs = jnp.ones((2, 32, 32, 3))
    feats = enc(params, imgs)
    assert feats.shape == (2, 4, 4, 16)
    # frozen encoder -> zero gradient through features
    def loss(p):
        return jnp.sum(enc(p, imgs) ** 2)
    grads = jax.grad(loss)(params)
    assert all(float(jnp.abs(g).max()) == 0.0 for g in jax.tree.leaves(grads))


def test_dino_conditioned_train_step():
    """Full jitted train step with a frozen feature encoder in-graph."""
    import optax

    from ccdm_tpu.models.builder import build_model
    from ccdm_tpu.train.state import create_train_state
    from ccdm_tpu.train.step import make_train_step

    enc = DinoViT(embed_dim=16, depth=2, num_heads=2, patch_size=8, stride=8,
                  source_layer=1)
    enc_params = enc.init({"params": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 32, 32, 3)))["params"]

    def feature_fn(p, images):
        return jax.lax.stop_gradient(enc.apply({"params": p}, images))

    cfg = {
        "beta_schedule": "cosine", "time_steps": 4, "compute_dtype": "float32",
        "feature_cond_encoder": {"type": "dino", "target_layer": 3,
                                 "output_stride": 8, "channels": 16},
        "unet_openai": {"base_channels": 8, "image_size": 32,
                        "channel_mult": [1, 2], "attention_resolutions": [],
                        "num_head_channels": 4},
    }
    model = build_model(cfg, num_classes=2, image_channels=3)
    params = model.init(jax.random.PRNGKey(1), (32, 32, 3),
                        feature_shape=(4, 4, 16))
    state = create_train_state(params, optax.adam(1e-3), polyak_alpha=0.9)
    step = jax.jit(make_train_step(model, jnp.ones((2,)), feature_fn=feature_fn))
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3)),
        "x0": jax.nn.one_hot(jax.random.randint(jax.random.PRNGKey(3), (2, 32, 32), 0, 2), 2),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(4), enc_params)
    assert np.isfinite(float(metrics["loss"]))
    assert not bool(metrics["invalid"])


def test_dino_conditioned_unet_forward():
    """UNet consumes a DINO feature map at block 10 / stride 8."""
    from ccdm_tpu.models.unet import create_unet

    unet = create_unet(
        image_size=64, base_channels=8, out_channels=2, num_res_blocks=2,
        channel_mult=(1, 1, 2, 3), attention_resolutions=(8,),
        num_head_channels=4, feature_cond_block_idx=10, feature_cond_stride=8,
        dtype=jnp.float32,
    )
    xt = jnp.zeros((1, 64, 64, 2))
    cond = jnp.zeros((1, 64, 64, 3))
    fc = jnp.ones((1, 8, 8, 16))  # 64/8 grid, 16 feature channels
    t = jnp.array([3.0])
    params = unet.init({"params": jax.random.PRNGKey(0)}, xt, cond, t, fc)["params"]
    out = unet.apply({"params": params}, xt, cond, t, fc)["diffusion_out"]
    assert out.shape == (1, 64, 64, 2)
    # the conditioned block must actually consume extra channels
    res10_in = params["down_10_res"]["in_conv"]["kernel"].shape[2]
    assert res10_in > params["down_7_res"]["in_conv"]["kernel"].shape[2]


def test_extract_descriptors_cli(tmp_path, monkeypatch):
    """Standalone descriptor-extraction CLI (parity: `dino.py:355-381`)."""
    import os
    import sys

    import numpy as np
    from PIL import Image

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "scripts"))
    import extract_dino_descriptors as cli

    img = tmp_path / "x.png"
    Image.fromarray((np.random.default_rng(0).random((64, 96, 3)) * 255)
                    .astype("uint8")).save(img)
    out = tmp_path / "desc.npy"
    monkeypatch.setattr(sys, "argv", [
        "cli", "--image_path", str(img), "--output_path", str(out),
        "--load_size", "64", "--stride", "8", "--facet", "value"])
    cli.main()
    desc = np.load(out)
    # 64x96 -> load_size 64 on the short side -> 64x96; /8 token grid
    assert desc.shape == (1, 8, 12, 384)
    assert np.isfinite(desc).all()
