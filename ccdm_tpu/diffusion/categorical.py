"""Categorical (uniform-transition) diffusion math, channels-last, pure functions.

Behavioural parity with `DiffusionModel` (`ddpm/models/diffusion_denoising.py:42-128`)
and `OneHotCategoricalBCHW` (`ddpm/models/one_hot_categorical.py`), re-derived
for TPU:

- layout is `[B, H, W, C]` (channels-last; the lane dimension holds classes),
- all math is float32 elementwise chains that XLA fuses into a handful of
  HBM-bandwidth-bound kernels,
- the marginalised posterior `theta_post_prob` — the reference's hot spot,
  which materialises a `[B, C, C, H, W]` tensor and einsums it away
  (`diffusion_denoising.py:99-128`) — is collapsed algebraically to an
  O(B·H·W·C) expression with **no C² intermediate at all** (derivation in the
  `theta_post_prob` docstring). `theta_post_prob_naive` keeps the direct
  C×C-matrix form as a test oracle.

Timesteps `t` are 1-based int arrays of shape `[B]`, matching the reference's
`t ~ U{1..T}` convention (`ddpm/trainer.py:256`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ccdm_tpu.core.schedules import Schedule, make_schedule


class CategoricalDiffusion(NamedTuple):
    """Schedule + class count. A tiny pytree passed into jitted functions."""

    schedule: Schedule
    num_classes: int

    @property
    def time_steps(self) -> int:
        return self.schedule.time_steps

    @staticmethod
    def create(schedule: str, time_steps: int, num_classes: int, schedule_params=None):
        return CategoricalDiffusion(
            schedule=make_schedule(schedule, time_steps, schedule_params),
            num_classes=num_classes,
        )


def _gather_bcast(values: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Gather schedule values at 1-based timesteps, broadcast to [B,1,1,1]."""
    v = values[t - 1]
    return v[:, None, None, None].astype(jnp.float32)


def q_xt_given_xtm1_probs(d: CategoricalDiffusion, xtm1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """One-step forward kernel `q(x_t | x_{t-1})` probabilities.

    Parity: `DiffusionModel.q_xt_given_xtm1` (`diffusion_denoising.py:72-78`).
    """
    betas = _gather_bcast(d.schedule.betas, t)
    return (1.0 - betas) * xtm1 + betas / d.num_classes


def q_xt_given_x0_probs(d: CategoricalDiffusion, x0: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Closed-form forward marginal `q(x_t | x_0)` probabilities.

    Parity: `DiffusionModel.q_xt_given_x0` (`diffusion_denoising.py:80-86`).
    """
    cumalphas = _gather_bcast(d.schedule.cumalphas, t)
    return cumalphas * x0 + (1.0 - cumalphas) / d.num_classes


def theta_post(d: CategoricalDiffusion, xt: jnp.ndarray, x0: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Exact posterior `q(x_{t-1} | x_t, x_0)` for one-hot `x0`.

    Parity: `DiffusionModel.theta_post` (`diffusion_denoising.py:88-97`),
    including the t==1 boundary (`alphas -> 0`, `cumalphas_{t-1} -> 1`, baked
    into `Schedule.alphas_eff` / `Schedule.cumalphas_prev`).
    """
    a = _gather_bcast(d.schedule.alphas_eff, t)
    cab = _gather_bcast(d.schedule.cumalphas_prev, t)
    theta = (a * xt + (1.0 - a) / d.num_classes) * (cab * x0 + (1.0 - cab) / d.num_classes)
    return theta / jnp.sum(theta, axis=-1, keepdims=True)


def theta_post_prob(d: CategoricalDiffusion, xt: jnp.ndarray, theta_x0: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Posterior marginalised over a predicted x0 distribution.

    Parity: `DiffusionModel.theta_post_prob` (`diffusion_denoising.py:99-128`),
    which computes, per pixel, with `u[c] = a_t*xt[c] + (1-a_t)/C` and the
    uniform-transition matrix `M[c,k] = cab*I[c==k] + (1-cab)/C`:

        out[c] = sum_k  u[c] * M[c,k] / (sum_c' u[c'] * M[c',k]) * p0[k]

    materialising the `[B, C, C, H, W]` tensor `u[c]*M[c,k]`. Because `M` is
    `cab*I + (1-cab)/C * ones`, every contraction collapses:

        denom[k] = cab * u[k] + (1-cab)/C * S_u        with S_u = sum_c u[c]
        r[k]     = p0[k] / denom[k]
        out[c]   = u[c] * (cab * r[c] + (1-cab)/C * sum_k r[k])

    i.e. an O(C)-per-pixel elementwise chain — no C² intermediate, no einsum,
    ~C× less HBM traffic than the reference formulation. Verified against
    `theta_post_prob_naive` in tests.
    """
    a = _gather_bcast(d.schedule.alphas_eff, t)
    cab = _gather_bcast(d.schedule.cumalphas_prev, t)
    c = d.num_classes

    u = a * xt + (1.0 - a) / c
    s_u = jnp.sum(u, axis=-1, keepdims=True)
    denom = cab * u + (1.0 - cab) / c * s_u
    r = theta_x0 / denom
    s_r = jnp.sum(r, axis=-1, keepdims=True)
    return u * (cab * r + (1.0 - cab) / c * s_r)


def theta_post_prob_from_idx(d: CategoricalDiffusion, idx: jnp.ndarray, theta_x0: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """`theta_post_prob` specialised to an EXACTLY one-hot `x_t` given as
    indices `[B,H,W]` — the ancestral sampler's index-state path.

    With `x_t = onehot(idx)`: `u_k = (1-a)/C + a·1[k=idx]` is analytic and
    `S_u = Σu = 1` exactly, so the generic form's `S_u` reduction pass over
    the `[B,H,W,C]` tensor disappears and `denom` needs no broadcast of a
    computed sum. Algebraically identical to
    `theta_post_prob(d, onehot(idx), theta_x0, t)` up to fp reassociation
    (the generic path's fp32 `S_u` is 1±ulp); tested to 1e-6.
    """
    a = _gather_bcast(d.schedule.alphas_eff, t)
    cab = _gather_bcast(d.schedule.cumalphas_prev, t)
    c = theta_x0.shape[-1]

    hit = jax.lax.broadcasted_iota(jnp.int32, theta_x0.shape, theta_x0.ndim - 1) == idx[..., None]
    u = (1.0 - a) / c + a * hit.astype(jnp.float32)
    denom = cab * u + (1.0 - cab) / c  # S_u == 1 exactly for one-hot x_t
    r = theta_x0.astype(jnp.float32) / denom
    s_r = jnp.sum(r, axis=-1, keepdims=True)
    return u * (cab * r + (1.0 - cab) / c * s_r)


def theta_post_prob_naive(d: CategoricalDiffusion, xt: jnp.ndarray, theta_x0: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Direct C×C-matrix evaluation of the marginalised posterior.

    Structurally mirrors the reference's outer-product + einsum form
    (`diffusion_denoising.py:115-128`) as a slow oracle for testing the
    collapsed `theta_post_prob`.
    """
    a = _gather_bcast(d.schedule.alphas_eff, t)
    cab = d.schedule.cumalphas_prev[t - 1][:, None, None, None, None].astype(jnp.float32)
    c = d.num_classes

    eye = jnp.eye(c, dtype=jnp.float32)
    # theta_xt_xtm1: [B,H,W,C1]; theta_xtm1_x0: [B,1,1,C1,C2]
    theta_xt_xtm1 = a * xt + (1.0 - a) / c
    theta_xtm1_x0 = cab * eye[None, None, None] + (1.0 - cab) / c
    aux = theta_xt_xtm1[..., :, None] * theta_xtm1_x0  # [B,H,W,C1,C2]
    theta_xtm1_xtx0 = aux / jnp.sum(aux, axis=-2, keepdims=True)
    return jnp.einsum("bhwcd,bhwd->bhwc", theta_xtm1_xtx0, theta_x0)


def categorical_kl(pred_probs: jnp.ndarray, target_probs: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Per-pixel `KL(target ‖ pred)` summed over the class axis.

    Parity with `kl_div(log(clamp(pred, 1e-12)), target, reduction='none').sum(dim=1)`
    (`ddpm/trainer.py:266-276`): torch's `kl_div` computes
    `xlogy(target, target) - target * input`, so exact zeros in the target
    contribute 0 (relevant at t==1 where the posterior is exactly one-hot).
    """
    log_pred = jnp.log(jnp.clip(pred_probs, min=eps))
    terms = jax.scipy.special.xlogy(target_probs, target_probs) - target_probs * log_pred
    return jnp.sum(terms, axis=-1)


def sample_categorical(key: jax.Array, probs: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Draw per-pixel class indices from `[..., C]` probabilities.

    Replaces `OneHotCategoricalBCHW.sample()` (`one_hot_categorical.py:18-33`)
    with a Gumbel-max draw over the class (lane) axis.
    """
    logits = jnp.log(jnp.clip(probs, min=eps))
    return jax.random.categorical(key, logits, axis=-1)


def sample_onehot(key: jax.Array, probs: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Categorical draw returned as one-hot float32, same shape as `probs`."""
    idx = sample_categorical(key, probs, eps)
    return jax.nn.one_hot(idx, probs.shape[-1], dtype=jnp.float32)


def sample_categorical_icdf(key: jax.Array, probs: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF categorical draw over the trailing axis -> int32 indices.

    Same distribution as `sample_categorical` but via the classical
    inverse-CDF method (the family `torch.multinomial` uses): ONE uniform
    per outcome instead of one Gumbel per class element. On TPU this
    removes two transcendental ops (log/neg-log) per class element and
    divides RNG volume by C — at the Cityscapes geometry
    ([128,256,512,20]) the Gumbel draw alone cost ~34 ms/step while this
    form fuses into the posterior chain (PERFNOTES round 5). `probs` need
    not be normalised: the draw targets `u * sum(probs)`.

    The prefix sum is a triangular-matrix einsum, NOT `jnp.cumsum`: on TPU
    cumsum's HLO demands a different layout from the probs producer's and
    forces a full relayout copy (traced at 6.4 ms/step on [128,256,512,20]),
    while the C x C lower-triangular dot rides the MXU in the producer's
    layout — measured +2.0% end-to-end at the Cityscapes knee. (A
    shift-doubling prefix sum was also tried and measured -12%: its
    pad+add passes materialise.) fp32 accumulation over non-negative terms
    in a fixed order keeps the cdf monotone.
    """
    p = probs.astype(jnp.float32)
    c = p.shape[-1]
    tri = jnp.triu(jnp.ones((c, c), jnp.float32))  # tri[j,k] = 1[j <= k]
    cdf = jnp.einsum("...c,cd->...d", p, tri)
    u = jax.random.uniform(key, probs.shape[:-1], dtype=jnp.float32)
    target = u[..., None] * cdf[..., -1:]
    idx = jnp.sum((cdf <= target).astype(jnp.int32), axis=-1)
    return jnp.minimum(idx, probs.shape[-1] - 1)


def max_prob_onehot(probs: jnp.ndarray) -> jnp.ndarray:
    """Argmax one-hot ("majority" vote).

    Parity: `OneHotCategoricalBCHW.max_prob_sample` (`one_hot_categorical.py:35-44`).
    """
    idx = jnp.argmax(probs, axis=-1)
    return jax.nn.one_hot(idx, probs.shape[-1], dtype=jnp.float32)


def uniform_onehot_noise(key: jax.Array, shape, num_classes: int) -> jnp.ndarray:
    """x_T prior draw: uniform categorical, one-hot encoded.

    Parity with `OneHotCategoricalBCHW(logits=zeros).sample()`
    (`ddpm/trainer.py:336-337`). `shape` excludes the class axis.
    """
    idx = jax.random.randint(key, shape, 0, num_classes)
    return jax.nn.one_hot(idx, num_classes, dtype=jnp.float32)
