"""Compiled ancestral sampling for categorical diffusion.

The reference runs the reverse process as a Python loop of 250 sequential
UNet launches (`ddpm/models/diffusion_denoising.py:164-215`). Here the entire
loop is a single `lax.scan`: one compilation, weights stay resident in HBM,
per-step categorical sampling / posterior math / final argmax all fuse
on-device, and the host is only touched once at the end.

Timestep subsampling parity: the reference encodes "run K of T steps" as
`init_t = 10000 + K` decoded into `round(linspace(T, 1, K))`
(`diffusion_denoising.py:178-187`). Here K is simply a static argument
(`subsampled_t_values`), so each K compiles its own scan once and is reused.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ccdm_tpu.diffusion.categorical import (
    CategoricalDiffusion,
    max_prob_onehot,
    sample_onehot,
    theta_post_prob,
    uniform_onehot_noise,
)

# DenoiseFn: (xt [B,H,W,C] one-hot, t [B] int32 1-based) -> p0 probs [B,H,W,C].
# Conditioning (image, DINO features, params) is closed over by the caller.
DenoiseFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


class SamplerConfig(NamedTuple):
    """Static sampler options.

    `step_T_sample`: how to resolve the final (t==1) step — "majority" takes
    the argmax one-hot, "confidence" returns the posterior probabilities
    themselves (parity: `diffusion_denoising.py:209-212`).

    `encoder_reuse`: beyond the reference (after "Faster Diffusion",
    arXiv 2312.09608): run the UNet ENCODER only on every R-th step and
    replay its cached skip activations in between (the decoder always runs
    with the current step's time embedding and posterior). 1 = off (exact
    reference semantics). R=2 and R=3 are measured quality-neutral on the
    demo-gate protocol and +11-17% throughput (PERFNOTES.md round 3); R=2
    is the shipped eval-config default. Requires a `denoise_pair` from
    `DenoisingModel.denoise_fns_cached`.
    """

    num_steps: int  # K: number of reverse steps actually executed
    step_T_sample: str = "majority"  # "majority" | "confidence"
    encoder_reuse: int = 1  # R: full encoder every R-th step


def subsampled_t_values(time_steps: int, num_steps: int) -> np.ndarray:
    """The descending timestep grid for a K-of-T step sampler run.

    Parity: `diffusion_denoising.py:178-187` — full range when K == T, else
    `round(linspace(T, 1, K))` (np.linspace + banker's-free round()).
    """
    if not 0 < num_steps <= time_steps:
        raise ValueError(f"num_steps must be in (0, {time_steps}], got {num_steps}")
    if num_steps == time_steps:
        return np.arange(time_steps, 0, -1, dtype=np.int32)
    return np.array(
        [round(v) for v in np.linspace(time_steps, 1, num_steps)], dtype=np.int32
    )


def ancestral_sampler(
    d: CategoricalDiffusion,
    denoise_fn: DenoiseFn,
    xt: jnp.ndarray,
    key: jax.Array,
    config: SamplerConfig,
    *,
    element_keys: jnp.ndarray = None,
    denoise_pair=None,
) -> jnp.ndarray:
    """Run the reverse process from `xt ~ q(x_T)` down to a segmentation map.

    Returns one-hot (majority) or probability (confidence) maps `[B,H,W,C]`.
    Parity: `DenoisingModel.forward_denoising` (`diffusion_denoising.py:164-215`)
    minus the vestigial classifier-guidance hooks (dead code upstream:
    `guidance_fn` is referenced but never defined, `:199-202`).

    With `element_keys` ([B] PRNG keys, `key` ignored) every batch element
    draws its chain noise from its OWN key, so an element's trajectory is
    independent of its position in — or the composition of — the batch.
    Eval harnesses derive these from global dataset positions, making
    results identical across batch sizes, host counts, and shardings.

    Wrap in `jax.jit` (donate `xt` for in-place HBM reuse); `config` and the
    step grid are static so each K compiles exactly once.
    """
    t_grid = jnp.asarray(subsampled_t_values(d.time_steps, config.num_steps))
    batch = xt.shape[0]

    def resolve(x, p0, t_scalar, step_idx):
        """Posterior + draw/final resolution shared by both sampler forms."""
        t = jnp.full((batch,), t_scalar, dtype=jnp.int32)
        probs = theta_post_prob(d, x, p0.astype(jnp.float32), t)
        probs = jnp.clip(probs, min=1e-12)
        if element_keys is not None:
            step_keys = jax.vmap(jax.random.fold_in, (0, None))(element_keys, step_idx)
            drawn = jax.vmap(sample_onehot)(step_keys, probs)
        else:
            drawn = sample_onehot(jax.random.fold_in(key, step_idx), probs)
        if config.step_T_sample == "confidence":
            final = probs
        else:  # "majority" (also the reference's None default, `:209`)
            final = max_prob_onehot(probs)
        return jnp.where(t_scalar > 1, drawn, final)

    steps = jnp.arange(config.num_steps, dtype=jnp.int32)

    if config.encoder_reuse > 1:
        if denoise_pair is None:
            raise ValueError("encoder_reuse > 1 needs denoise_pair "
                             "(DenoisingModel.denoise_fns_cached)")
        full_fn, reuse_fn = denoise_pair
        r = int(config.encoder_reuse)

        # shape-only placeholder for the skips carry; step 0 always takes
        # the full branch, so the zeros never influence any result
        skips0 = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(lambda v: full_fn(v, jnp.full((batch,), 1, jnp.int32))[1], xt))

        def step_reuse(carry, inputs):
            x, skips = carry
            t_scalar, step_idx = inputs
            t = jnp.full((batch,), t_scalar, dtype=jnp.int32)
            p0, skips = jax.lax.cond(
                step_idx % r == 0,
                lambda op: full_fn(*op[:2]),
                lambda op: (reuse_fn(*op), op[2]),
                (x, t, skips))
            return (resolve(x, p0, t_scalar, step_idx), skips), None

        (x_final, _), _ = jax.lax.scan(step_reuse, (xt, skips0), (t_grid, steps))
        return x_final

    def step(carry, inputs):
        x, = carry
        t_scalar, step_idx = inputs
        t = jnp.full((batch,), t_scalar, dtype=jnp.int32)
        p0 = denoise_fn(x, t)
        return (resolve(x, p0, t_scalar, step_idx),), None

    (x_final,), _ = jax.lax.scan(step, (xt,), (t_grid, steps))
    return x_final


def sample_prior(key: jax.Array, batch: int, height: int, width: int, num_classes: int) -> jnp.ndarray:
    """Draw `x_T` from the uniform categorical prior, one-hot `[B,H,W,C]`."""
    return uniform_onehot_noise(key, (batch, height, width), num_classes)


def sample_prior_per_key(keys: jnp.ndarray, height: int, width: int, num_classes: int) -> jnp.ndarray:
    """`x_T` prior with one PRNG key per batch element -> `[B,H,W,C]`.

    Batch-composition-independent counterpart of `sample_prior` (see
    `ancestral_sampler`'s `element_keys`)."""
    return jax.vmap(
        lambda k: uniform_onehot_noise(k, (height, width), num_classes))(keys)
