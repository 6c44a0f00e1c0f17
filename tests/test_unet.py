import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.models.layers import timestep_embedding
from ccdm_tpu.models.unet import create_unet, default_channel_mult
from ccdm_tpu.models.builder import build_model


def test_timestep_embedding_matches_reference_formula():
    # unet_openai/nn.py:103-121 — cos-first concat.
    t = jnp.array([0.0, 1.0, 250.0])
    dim = 32
    emb = np.asarray(timestep_embedding(t, dim))
    half = dim // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / half)
    args = np.asarray(t)[:, None] * freqs[None]
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(emb, expected, atol=1e-5)


def test_default_channel_mult_table():
    assert default_channel_mult(128) == (1, 1, 2, 3, 4)
    assert default_channel_mult(64) == (1, 2, 3, 4)
    with pytest.raises(ValueError):
        default_channel_mult(100)


@pytest.fixture(scope="module")
def tiny_unet():
    # Tiny config: 32x32, 2 levels, attention at ds=2.
    unet = create_unet(
        image_size=32, base_channels=8, out_channels=2, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(2,), num_head_channels=4,
        dtype=jnp.float32,
    )
    key = jax.random.PRNGKey(0)
    xt = jnp.zeros((2, 32, 32, 2))
    cond = jnp.zeros((2, 32, 32, 1))
    t = jnp.array([1, 5])
    params = unet.init({"params": key}, xt, cond, t)["params"]
    return unet, params


def test_unet_output_is_distribution(tiny_unet):
    unet, params = tiny_unet
    key = jax.random.PRNGKey(1)
    xt = jax.nn.one_hot(jax.random.randint(key, (2, 32, 32), 0, 2), 2)
    cond = jax.random.normal(key, (2, 32, 32, 1))
    t = jnp.array([3, 7])
    out = unet.apply({"params": params}, xt, cond, t)
    probs = np.asarray(out["diffusion_out"])
    assert probs.shape == (2, 32, 32, 2)
    assert probs.dtype == np.float32
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    # zero-init output conv => exactly uniform at init
    np.testing.assert_allclose(probs, 0.5, atol=1e-6)
    assert out["logits"] is None


def test_unet_time_dependence(tiny_unet):
    """After perturbing params away from zero-init, output must differ across t."""
    unet, params = tiny_unet
    params = jax.tree.map(
        lambda p: p + 0.3 * jax.random.normal(jax.random.PRNGKey(2), p.shape, p.dtype),
        params,
    )
    xt = jax.nn.one_hot(jnp.zeros((1, 32, 32), jnp.int32), 2)
    cond = jnp.ones((1, 32, 32, 1))
    o1 = unet.apply({"params": params}, xt, cond, jnp.array([1]))["diffusion_out"]
    o2 = unet.apply({"params": params}, xt, cond, jnp.array([200]))["diffusion_out"]
    assert np.any(np.asarray(o1) != np.asarray(o2))


def test_build_model_from_params_dict():
    params = {
        "beta_schedule": "cosine",
        "time_steps": 10,
        "unet_openai": {
            "base_channels": 8,
            "image_size": 32,
            "channel_mult": [1, 2],
            "attention_resolutions": [2],
            "num_head_channels": 4,
        },
        "compute_dtype": "float32",
    }
    model = build_model(params, num_classes=2, image_channels=1)
    assert model.time_steps == 10
    p = model.init(jax.random.PRNGKey(0), (32, 32, 1), batch=1)
    out = model.apply(
        p,
        jnp.zeros((1, 32, 32, 2)),
        jnp.zeros((1, 32, 32, 1)),
        jnp.array([5]),
    )
    assert out["diffusion_out"].shape == (1, 32, 32, 2)


def test_unet_ce_head():
    unet = create_unet(
        image_size=32, base_channels=8, out_channels=3, num_res_blocks=1,
        channel_mult=(1, 2), attention_resolutions=(), ce_head=True,
        dtype=jnp.float32,
    )
    xt = jnp.zeros((1, 16, 16, 3))
    cond = jnp.zeros((1, 16, 16, 1))
    t = jnp.array([1])
    params = unet.init({"params": jax.random.PRNGKey(0)}, xt, cond, t)["params"]
    out = unet.apply({"params": params}, xt, cond, t)
    assert out["logits"].shape == (1, 16, 16, 2)  # out_channels - 1 (unet.py:722)


def test_remat_resblocks_init_apply_grad():
    """use_checkpoint: yes (remat_resblocks) must init, run, and differentiate
    — regression for a keyword-only/static_argnums mismatch that crashed init."""
    import jax
    import jax.numpy as jnp

    from ccdm_tpu.models.unet import create_unet

    u = create_unet(image_size=64, base_channels=8, out_channels=2,
                    channel_mult=(1, 2), attention_resolutions=(4,),
                    num_head_channels=4, dtype=jnp.float32,
                    remat_resblocks=True, softmax_output=False)
    key = jax.random.PRNGKey(3)
    xt = jax.nn.one_hot(jax.random.randint(key, (2, 16, 16), 0, 2), 2)
    cond = jax.random.normal(key, (2, 16, 16, 1))
    t = jnp.ones((2,))
    v = u.init({"params": jax.random.PRNGKey(0)}, xt, cond, t)
    out = u.apply(v, xt, cond, t)["diffusion_out"]
    assert out.shape == (2, 16, 16, 2)
    g = jax.grad(lambda p: jnp.sum(
        u.apply({"params": p}, xt, cond, t)["diffusion_out"]))(v["params"])
    assert any(float(jnp.abs(x).sum()) > 0 for x in jax.tree.leaves(g))


def test_ce_head_has_independent_norm():
    """The CE head normalizes with its own GroupNorm (reference out_ce.0,
    unet.py:716-726), not the diffusion head's out_norm."""
    import jax
    import jax.numpy as jnp

    from ccdm_tpu.models.unet import create_unet

    u = create_unet(image_size=64, base_channels=8, out_channels=3,
                    channel_mult=(1, 2), attention_resolutions=(),
                    num_head_channels=4, dtype=jnp.float32, ce_head=True)
    xt = jnp.zeros((1, 16, 16, 3))
    cond = jnp.zeros((1, 16, 16, 1))
    v = u.init({"params": jax.random.PRNGKey(0)}, xt, cond, jnp.ones((1,)))
    assert "out_ce_norm" in v["params"]
    out = u.apply(v, xt, cond, jnp.ones((1,)))
    assert out["logits"].shape == (1, 16, 16, 2)  # num_classes - 1
