"""Unit tests for the categorical diffusion core.

Includes a NumPy oracle that independently re-implements the reference's
formulas (diffusion_denoising.py:72-128) in the reference's own [B,C,H,W]
layout, so the channels-last collapsed forms are checked against a genuinely
different code path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.diffusion.categorical import (
    CategoricalDiffusion,
    categorical_kl,
    max_prob_onehot,
    q_xt_given_x0_probs,
    q_xt_given_xtm1_probs,
    sample_categorical,
    theta_post,
    theta_post_prob,
    theta_post_prob_naive,
    uniform_onehot_noise,
)


def make_diffusion(C=3, T=7, schedule="cosine"):
    return CategoricalDiffusion.create(schedule, T, C)


def random_onehot(rng, B, H, W, C):
    idx = rng.integers(0, C, size=(B, H, W))
    return np.eye(C, dtype=np.float32)[idx]


def random_probs(rng, B, H, W, C):
    p = rng.random((B, H, W, C)).astype(np.float32) + 0.05
    return p / p.sum(-1, keepdims=True)


# ---- NumPy oracle (reference layout: [B, C, H, W]) -----------------------

def oracle_theta_post(betas, alphas, cumalphas, xt, x0, t, C):
    # xt/x0: [B,C,H,W]; t: [B] 1-based
    ti = t - 1
    a = alphas[ti][:, None, None, None].copy()
    cab = cumalphas[ti - 1][:, None, None, None].copy()
    a[ti == 0] = 0.0
    cab[ti == 0] = 1.0
    theta = (a * xt + (1 - a) / C) * (cab * x0 + (1 - cab) / C)
    return theta / theta.sum(1, keepdims=True)


def oracle_theta_post_prob(betas, alphas, cumalphas, xt, p0, t, C):
    ti = t - 1
    a = alphas[ti][:, None, None, None].copy()
    cab = cumalphas[ti - 1][:, None, None, None, None].copy()
    a[ti == 0] = 0.0
    cab[ti == 0] = 1.0
    x0_eye = np.eye(C)[None, :, :, None, None]  # [1,C1,C2,1,1]
    theta_xt_xtm1 = a * xt + (1 - a) / C  # [B,C,H,W]
    theta_xtm1_x0 = cab * x0_eye + (1 - cab) / C  # [B,C1,C2,1,1]
    aux = theta_xt_xtm1[:, :, None] * theta_xtm1_x0  # [B,C1,C2,H,W]
    theta = aux / aux.sum(1, keepdims=True)
    return np.einsum("bcdhw,bdhw->bchw", theta, p0)


def to_ref_layout(x):  # [B,H,W,C] -> [B,C,H,W]
    return np.moveaxis(x, -1, 1)


def from_ref_layout(x):
    return np.moveaxis(x, 1, -1)


# ---- tests ----------------------------------------------------------------

def test_q_xt_given_x0_is_distribution(rng):
    d = make_diffusion()
    x0 = random_onehot(rng, 2, 4, 4, 3)
    t = jnp.array([1, 7])
    probs = np.asarray(q_xt_given_x0_probs(d, x0, t))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-6)
    assert (probs >= 0).all()
    # t=1: mostly x0; t=T: near uniform
    assert probs[0].max() > 0.9
    np.testing.assert_allclose(probs[1], 1 / 3, atol=0.05)


def test_q_xt_given_xtm1_formula(rng):
    d = make_diffusion()
    x = random_onehot(rng, 2, 4, 4, 3)
    t = jnp.array([3, 5])
    probs = np.asarray(q_xt_given_xtm1_probs(d, x, t))
    betas = np.asarray(d.schedule.betas)
    expected = (1 - betas[t - 1])[:, None, None, None] * x + betas[t - 1][:, None, None, None] / 3
    np.testing.assert_allclose(probs, expected, rtol=1e-6)


@pytest.mark.parametrize("schedule", ["cosine", "linear"])
def test_theta_post_matches_oracle(rng, schedule):
    C, T = 4, 9
    d = make_diffusion(C, T, schedule)
    xt = random_onehot(rng, 3, 5, 6, C)
    x0 = random_onehot(rng, 3, 5, 6, C)
    t = np.array([1, 4, 9])

    ours = np.asarray(theta_post(d, xt, x0, jnp.asarray(t)))
    ref = oracle_theta_post(
        np.asarray(d.schedule.betas, dtype=np.float64),
        np.asarray(d.schedule.alphas, dtype=np.float64),
        np.asarray(d.schedule.cumalphas, dtype=np.float64),
        to_ref_layout(xt), to_ref_layout(x0), t, C,
    )
    np.testing.assert_allclose(ours, from_ref_layout(ref), atol=1e-5)


@pytest.mark.parametrize("C", [2, 5])
def test_theta_post_prob_matches_oracle(rng, C):
    T = 11
    d = make_diffusion(C, T)
    xt = random_onehot(rng, 2, 4, 4, C)
    p0 = random_probs(rng, 2, 4, 4, C)
    t = np.array([1, 6])

    ours = np.asarray(theta_post_prob(d, xt, p0, jnp.asarray(t)))
    naive = np.asarray(theta_post_prob_naive(d, xt, p0, jnp.asarray(t)))
    ref = oracle_theta_post_prob(
        np.asarray(d.schedule.betas, dtype=np.float64),
        np.asarray(d.schedule.alphas, dtype=np.float64),
        np.asarray(d.schedule.cumalphas, dtype=np.float64),
        to_ref_layout(xt), to_ref_layout(p0), t, C,
    )
    np.testing.assert_allclose(ours, naive, atol=1e-5)
    np.testing.assert_allclose(ours, from_ref_layout(ref), atol=1e-5)
    np.testing.assert_allclose(ours.sum(-1), 1.0, atol=1e-5)


def test_theta_post_prob_onehot_consistency(rng):
    """Docstring-level contract (diffusion_denoising.py:100-106): when the x0
    distribution is one-hot, theta_post_prob == theta_post."""
    d = make_diffusion(4, 13)
    xt = random_onehot(rng, 2, 4, 4, 4)
    x0 = random_onehot(rng, 2, 4, 4, 4)
    t = jnp.array([2, 13])
    a = np.asarray(theta_post(d, xt, x0, t))
    b = np.asarray(theta_post_prob(d, xt, x0, t))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_theta_post_t1_returns_x0(rng):
    """At t==1 the posterior collapses onto x0 exactly."""
    d = make_diffusion(3, 5)
    xt = random_onehot(rng, 2, 4, 4, 3)
    x0 = random_onehot(rng, 2, 4, 4, 3)
    t = jnp.array([1, 1])
    np.testing.assert_allclose(np.asarray(theta_post(d, xt, x0, t)), x0, atol=1e-6)


def test_golden_tiny_case():
    """Hand-computed C=2 single-pixel case."""
    d = CategoricalDiffusion.create("linear", 4, 2)
    betas = np.asarray(d.schedule.betas, dtype=np.float64)
    alphas = 1 - betas
    cumalphas = np.cumprod(alphas)
    # xt = [1,0], x0 = [0,1], t = 3
    xt = jnp.array([[[[1.0, 0.0]]]])
    x0 = jnp.array([[[[0.0, 1.0]]]])
    t = jnp.array([3])
    a, cab = alphas[2], cumalphas[1]
    th0 = (a * 1 + (1 - a) / 2) * (cab * 0 + (1 - cab) / 2)
    th1 = (a * 0 + (1 - a) / 2) * (cab * 1 + (1 - cab) / 2)
    expected = np.array([th0, th1]) / (th0 + th1)
    got = np.asarray(theta_post(d, xt, x0, t))[0, 0, 0]
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_categorical_kl_semantics():
    # KL(p ‖ p) == 0, including exact zeros in target (xlogy semantics).
    target = jnp.array([[[[0.0, 1.0]]]])
    pred = jnp.array([[[[0.25, 0.75]]]])
    kl_self = categorical_kl(target, target)
    np.testing.assert_allclose(np.asarray(kl_self), 0.0, atol=1e-6)
    kl = float(categorical_kl(pred, target)[0, 0, 0])
    np.testing.assert_allclose(kl, -np.log(0.75), rtol=1e-3)
    assert kl >= 0


def test_sampling_statistics():
    key = jax.random.PRNGKey(0)
    probs = jnp.tile(jnp.array([0.2, 0.8]), (1, 64, 64, 1))
    idx = np.asarray(sample_categorical(key, probs))
    assert idx.shape == (1, 64, 64)
    np.testing.assert_allclose(idx.mean(), 0.8, atol=0.03)

    onehot = np.asarray(max_prob_onehot(probs))
    assert (onehot[..., 1] == 1).all()

    noise = np.asarray(uniform_onehot_noise(key, (2, 32, 32), 4))
    np.testing.assert_allclose(noise.sum(-1), 1.0)
    np.testing.assert_allclose(noise.mean((0, 1, 2)), 0.25, atol=0.05)


def test_theta_post_prob_from_idx_matches_generic():
    """The sampler's index-specialised posterior equals the generic form on
    exactly one-hot x_t (up to the generic path's fp32 S_u being 1±ulp)."""
    from ccdm_tpu.diffusion.categorical import (
        CategoricalDiffusion,
        theta_post_prob,
        theta_post_prob_from_idx,
    )

    rng = np.random.default_rng(5)
    for c in (2, 20):
        d = CategoricalDiffusion.create("cosine", 50, c)
        idx = jnp.asarray(rng.integers(0, c, (3, 8, 8)), jnp.int32)
        x = jax.nn.one_hot(idx, c, dtype=jnp.float32)
        p0 = jnp.asarray(rng.dirichlet(np.ones(c), (3, 8, 8)), jnp.float32)
        for t_val in (1, 2, 25, 50):
            t = jnp.full((3,), t_val, jnp.int32)
            generic = np.asarray(theta_post_prob(d, x, p0, t))
            special = np.asarray(theta_post_prob_from_idx(d, idx, p0, t))
            np.testing.assert_allclose(special, generic, rtol=1e-6, atol=1e-6)


def test_icdf_sampling_matches_distribution():
    """`sample_categorical_icdf` (the ancestral sampler's draw) is an exact
    categorical draw: per-class frequencies match the probabilities, it
    handles unnormalised inputs, and never emits out-of-range indices."""
    from ccdm_tpu.diffusion.categorical import sample_categorical_icdf

    key = jax.random.PRNGKey(3)
    p = np.array([0.05, 0.3, 0.0, 0.45, 0.2], np.float32)
    probs = jnp.tile(jnp.asarray(p), (400, 400, 1))
    idx = np.asarray(sample_categorical_icdf(key, probs))
    assert idx.shape == (400, 400)
    assert idx.min() >= 0 and idx.max() <= 4
    freq = np.bincount(idx.reshape(-1), minlength=5) / idx.size
    np.testing.assert_allclose(freq, p, atol=5e-3)
    assert freq[2] == 0.0  # zero-probability class is never drawn

    # unnormalised probs draw from the normalised distribution
    idx2 = np.asarray(sample_categorical_icdf(key, probs * 7.3))
    np.testing.assert_array_equal(idx, idx2)
