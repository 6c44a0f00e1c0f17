import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.diffusion.sampling import (
    SamplerConfig,
    ancestral_sampler,
    sample_prior,
    subsampled_t_values,
)
from ccdm_tpu.models.builder import build_model

PARAMS = {
    "beta_schedule": "cosine",
    "time_steps": 8,
    "compute_dtype": "float32",
    "unet_openai": {
        "base_channels": 8, "image_size": 16, "channel_mult": [1, 2],
        "attention_resolutions": [2], "num_head_channels": 4,
    },
}
C, H, W = 2, 16, 16


def test_subsampled_t_values_parity():
    # diffusion_denoising.py:178-187: full range for K==T, else rounded linspace.
    np.testing.assert_array_equal(subsampled_t_values(250, 250), np.arange(250, 0, -1))
    grid = subsampled_t_values(250, 10)
    expected = [round(v) for v in np.linspace(250, 1, 10)]
    np.testing.assert_array_equal(grid, expected)
    assert grid[0] == 250 and grid[-1] == 1
    with pytest.raises(ValueError):
        subsampled_t_values(250, 0)
    with pytest.raises(ValueError):
        subsampled_t_values(250, 251)


@pytest.fixture(scope="module")
def model_and_params():
    model = build_model(PARAMS, num_classes=C, image_channels=1)
    params = model.init(jax.random.PRNGKey(0), (H, W, 1))
    # perturb away from zero-init so the sampler isn't trivially uniform
    params = jax.tree.map(
        lambda p: p + 0.1 * jax.random.normal(jax.random.PRNGKey(9), p.shape, p.dtype),
        params,
    )
    return model, params


def test_sampler_majority_output(model_and_params):
    model, params = model_and_params
    key = jax.random.PRNGKey(1)
    xT = sample_prior(key, 2, H, W, C)
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, H, W, 1))
    out = jax.jit(lambda p, x, c, k: model.sample(p, x, c, k))(params, xT, cond, key)
    arr = np.asarray(out)
    assert arr.shape == (2, H, W, C)
    # majority mode -> exact one-hot
    np.testing.assert_allclose(arr.sum(-1), 1.0, atol=1e-6)
    assert set(np.unique(arr)).issubset({0.0, 1.0})


def test_sampler_deterministic_and_key_sensitivity(model_and_params):
    model, params = model_and_params
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, H, W, 1))
    xT = sample_prior(jax.random.PRNGKey(3), 1, H, W, C)
    f = jax.jit(lambda k: model.sample(params, xT, cond, k))
    a = np.asarray(f(jax.random.PRNGKey(7)))
    b = np.asarray(f(jax.random.PRNGKey(7)))
    c = np.asarray(f(jax.random.PRNGKey(8)))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)  # stochastic segmentation: keys matter


def test_sampler_subsampled_steps(model_and_params):
    model, params = model_and_params
    cond = jnp.zeros((1, H, W, 1))
    xT = sample_prior(jax.random.PRNGKey(3), 1, H, W, C)
    out = jax.jit(lambda: model.sample(params, xT, cond, jax.random.PRNGKey(0), num_steps=3))()
    assert np.asarray(out).shape == (1, H, W, C)


def test_sampler_confidence_mode(model_and_params):
    model, params = model_and_params
    from ccdm_tpu.diffusion.sampling import ancestral_sampler as sampler

    cond = jnp.zeros((1, H, W, 1))
    xT = sample_prior(jax.random.PRNGKey(3), 1, H, W, C)
    cfg = SamplerConfig(num_steps=8, step_T_sample="confidence")
    out = np.asarray(
        jax.jit(lambda: sampler(model.diffusion, model.denoise_fn(params, cond), xT,
                                jax.random.PRNGKey(0), cfg))()
    )
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)
    # confidence mode returns probabilities, not one-hots
    assert ((out > 0) & (out < 1)).any()
