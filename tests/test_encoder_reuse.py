"""Encoder-reuse sampling (EXPERIMENTAL, beyond the reference).

`SamplerConfig.encoder_reuse = R` runs the UNet encoder only on every R-th
reverse step and replays its cached skip activations in between ("Faster
Diffusion", arXiv 2312.09608 — applied to the categorical sampler). These
tests pin the mechanism exactly:

- replaying skips at the SAME (x, t) is bit-identical to the full forward
  (the decoder is a deterministic function of skips + time embedding);
- the compiled reuse-sampler trajectory equals an eager replay that calls
  the full/reuse closures by hand with the same PRNG discipline;
- R=1 is the untouched exact path.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ccdm_tpu.diffusion.categorical import (
    max_prob_onehot,
    sample_categorical_icdf,
    sample_onehot,
    theta_post_prob,
)
from ccdm_tpu.diffusion.sampling import (
    SamplerConfig,
    ancestral_sampler,
    sample_prior,
    subsampled_t_values,
)
from ccdm_tpu.models.builder import build_model

PARAMS = {
    "time_steps": 5,
    "beta_schedule": "cosine",
    "compute_dtype": "float32",
    "step_T_sample": "majority",
    "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                    "attention_resolutions": [2], "num_head_channels": 4},
}


def _setup():
    model = build_model(PARAMS, num_classes=2, image_channels=1, image_size=16)
    params = model.init(jax.random.PRNGKey(0), (16, 16, 1))
    # un-zero the zero-init output head: otherwise p0 is input-independent
    # (uniform softmax) and every sampler variant trivially coincides
    params = jax.tree_util.tree_map_with_path(
        lambda path, leaf: (leaf + 0.05 * jax.random.normal(
            jax.random.PRNGKey(hash(str(path)) % (2**31)), leaf.shape, leaf.dtype))
        if "out_conv" in str(path) else leaf,
        params)
    rng = np.random.default_rng(1)
    cond = jnp.asarray(rng.standard_normal((2, 16, 16, 1)), jnp.float32)
    xt = sample_prior(jax.random.PRNGKey(2), 2, 16, 16, 2)
    return model, params, cond, xt


def test_cached_skips_replay_is_bit_identical():
    model, params, cond, xt = _setup()
    t = jnp.array([3, 3], jnp.int32)
    full = model.unet.apply({"params": params}, xt, cond, t, return_skips=True)
    replay = model.unet.apply({"params": params}, xt, cond, t,
                              cached_skips=full["skips"])
    np.testing.assert_array_equal(np.asarray(full["diffusion_out"]),
                                  np.asarray(replay["diffusion_out"]))


def test_reuse_sampler_matches_eager_replay():
    model, params, cond, xt = _setup()
    key = jax.random.PRNGKey(7)
    cfg = SamplerConfig(num_steps=4, step_T_sample="majority", encoder_reuse=2)
    pair = model.denoise_fns_cached(params, cond)

    compiled = jax.jit(lambda x, k: ancestral_sampler(
        model.diffusion, model.denoise_fn(params, cond), x, k, cfg,
        denoise_pair=pair))(xt, key)

    # eager replay of the exact schedule: full encoder on even step indices.
    # C=2 resolves to the one-hot state path (Gumbel draws, where-resolved
    # final step — sampling.py `_resolve_state`)
    full_fn, reuse_fn = pair
    x = xt
    skips = None
    for step_idx, t_s in enumerate(subsampled_t_values(model.time_steps, 4)):
        t = jnp.full((2,), int(t_s), jnp.int32)
        if step_idx % 2 == 0:
            p0, skips = full_fn(x, t)
        else:
            p0 = reuse_fn(x, t, skips)
        probs = jnp.clip(theta_post_prob(model.diffusion, x,
                                         p0.astype(jnp.float32), t), min=1e-12)
        drawn = sample_onehot(jax.random.fold_in(key, step_idx), probs)
        x = jnp.where(int(t_s) > 1, drawn, max_prob_onehot(probs))
    np.testing.assert_allclose(np.asarray(compiled), np.asarray(x),
                               rtol=1e-5, atol=1e-6)


def test_reuse_sampler_matches_eager_replay_index_state():
    """The same trajectory-equality pin for the wide-C path (int-index
    carry + inverse-CDF draws + final step outside the scan), forced via
    `state=\"index\"` at C=2 so the replay stays cheap."""
    model, params, cond, xt = _setup()
    key = jax.random.PRNGKey(7)
    cfg = SamplerConfig(num_steps=4, step_T_sample="majority",
                        encoder_reuse=2, state="index")
    pair = model.denoise_fns_cached(params, cond)

    compiled = jax.jit(lambda x, k: ancestral_sampler(
        model.diffusion, model.denoise_fn(params, cond), x, k, cfg,
        denoise_pair=pair))(xt, key)

    full_fn, reuse_fn = pair
    x = xt
    skips = None
    grid = subsampled_t_values(model.time_steps, 4)
    for step_idx, t_s in enumerate(grid):
        t = jnp.full((2,), int(t_s), jnp.int32)
        if step_idx % 2 == 0:
            p0, skips = full_fn(x, t)
        else:
            p0 = reuse_fn(x, t, skips)
        probs = jnp.clip(theta_post_prob(model.diffusion, x,
                                         p0.astype(jnp.float32), t), min=1e-12)
        if int(t_s) > 1:
            idx = sample_categorical_icdf(jax.random.fold_in(key, step_idx), probs)
            x = jax.nn.one_hot(idx, 2, dtype=jnp.float32)
        else:
            x = max_prob_onehot(probs)
    np.testing.assert_allclose(np.asarray(compiled), np.asarray(x),
                               rtol=1e-5, atol=1e-6)


def test_reuse_differs_from_exact_but_stays_valid():
    model, params, cond, xt = _setup()
    key = jax.random.PRNGKey(9)

    def run(reuse):
        cfg = SamplerConfig(num_steps=5, step_T_sample="confidence",
                            encoder_reuse=reuse)
        pair = (model.denoise_fns_cached(params, cond) if reuse > 1 else None)
        return jax.jit(lambda x, k: ancestral_sampler(
            model.diffusion, model.denoise_fn(params, cond), x, k, cfg,
            denoise_pair=pair))(xt, key)

    exact = np.asarray(run(1))
    approx = np.asarray(run(3))
    assert np.isfinite(approx).all()
    np.testing.assert_allclose(approx.sum(-1), 1.0, atol=1e-5)  # simplex
    # it is an approximation: with random weights the trajectories diverge
    assert not np.allclose(exact, approx)


def test_prob_sampler_reuse_plumbing():
    from ccdm_tpu.eval.lidc_uncertainty import make_prob_sampler

    model, params, cond, _ = _setup()
    out = make_prob_sampler(model, num_samples=2, num_steps=4,
                            encoder_reuse=2)(params, cond, jax.random.PRNGKey(3))
    assert out.shape == (2, 2, 16, 16, 2)
    assert bool(jnp.isfinite(out).all())


def test_reuse_composes_with_quantized_convs():
    """encoder_reuse and int8 convs (`quantized_inference`) ship together in
    bench/eval configs — pin that the composition compiles, that the skip
    replay stays bit-identical under quantized convs, and that the sampler
    output is a valid simplex."""
    model = build_model(dict(PARAMS, quantized_inference=True),
                        num_classes=2, image_channels=1, image_size=16)
    params = model.init(jax.random.PRNGKey(0), (16, 16, 1))
    rng = np.random.default_rng(1)
    cond = jnp.asarray(rng.standard_normal((2, 16, 16, 1)), jnp.float32)
    xt = sample_prior(jax.random.PRNGKey(2), 2, 16, 16, 2)

    # bit-identical replay at the same (x, t), through the quantized convs
    t = jnp.array([3, 3], jnp.int32)
    full = model.unet.apply({"params": params}, xt, cond, t, return_skips=True)
    replay = model.unet.apply({"params": params}, xt, cond, t,
                              cached_skips=full["skips"])
    np.testing.assert_array_equal(np.asarray(full["diffusion_out"]),
                                  np.asarray(replay["diffusion_out"]))

    cfg = SamplerConfig(num_steps=4, step_T_sample="confidence",
                        encoder_reuse=2)
    pair = model.denoise_fns_cached(params, cond)
    out = jax.jit(lambda x, k: ancestral_sampler(
        model.diffusion, model.denoise_fn(params, cond), x, k, cfg,
        denoise_pair=pair))(xt, jax.random.PRNGKey(11))
    out = np.asarray(out)
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)
