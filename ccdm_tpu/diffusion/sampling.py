"""Compiled ancestral sampling for categorical diffusion.

The reference runs the reverse process as a Python loop of 250 sequential
UNet launches (`ddpm/models/diffusion_denoising.py:164-215`). Here the entire
loop is a single `lax.scan`: one compilation, weights stay resident in HBM,
per-step categorical sampling / posterior math / final argmax all fuse
on-device, and the host is only touched once at the end.

TPU-native state layout is GEOMETRY-ADAPTIVE (both paths measured,
PERFNOTES round 5):

- **index state** (wide class axis, C >= 8): the scan carries per-pixel
  class INDICES (`int32 [B,H,W]`), not one-hot floats. The one-hot
  expansion is recomputed in-register where it is consumed (the UNet input
  concat and the posterior), so the chain never materialises a `[B,H,W,C]`
  carry in HBM, and the draw is inverse-CDF (`sample_categorical_icdf`:
  one uniform per pixel, no transcendentals) instead of per-class Gumbel.
  At the Cityscapes knee ([128,256,512,20]) this cut the non-UNet step
  cost from ~40 ms to ~8 ms. The final (t==1) step runs OUTSIDE the scan:
  it resolves to majority/confidence and draws no noise.
- **one-hot state** (narrow class axis, e.g. LIDC's C=2): the round-1
  layout — one-hot float carry, Gumbel draws, final step resolved by a
  `where` inside the scan. At C=2 the carry is small, the whole chain
  fuses into the UNet epilogue, and the index restructure measured a
  net LOSS (-12% on the flagship bench), so it stays.

`SamplerConfig.state` ("auto" default) picks per `_INDEX_STATE_MIN_CLASSES`;
force "index"/"onehot" to override. Both paths draw exact categorical
samples; their PRNG streams differ.

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
    sample_categorical_icdf,
    sample_onehot,
    theta_post_prob,
    theta_post_prob_from_idx,
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
    state: str = "auto"  # "auto" | "index" | "onehot" (see module docstring)


# Measured crossover: the index/inverse-CDF layout wins at C=20 (-32 ms
# isolated chain) and loses at C=2 (-12% flagship bench, the one-hot chain
# fuses into the UNet epilogue there). Only C=2 and C=20 exist in the
# reference's configs; 8 splits them with the scaling argument (icdf's
# advantage grows ~linearly in C).
_INDEX_STATE_MIN_CLASSES = 8


def _resolve_state(config: SamplerConfig, num_classes: int) -> str:
    if config.state != "auto":
        return config.state
    return "index" if num_classes >= _INDEX_STATE_MIN_CLASSES else "onehot"


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
    `guidance_fn` is referenced but never defined, `:199-202`). The state
    layout and draw algorithm are geometry-adaptive (module docstring);
    both are exact categorical ancestral sampling.

    With `element_keys` ([B] PRNG keys, `key` ignored) every batch element
    draws its chain noise from its OWN key, so an element's trajectory is
    independent of its position in — or the composition of — the batch.
    Eval harnesses derive these from global dataset positions, making
    results identical across batch sizes, host counts, and shardings.

    Wrap in `jax.jit`; `config` and the step grid are static so each K
    compiles exactly once.
    """
    if _resolve_state(config, xt.shape[-1]) == "index":
        return _sample_index_state(d, denoise_fn, xt, key, config,
                                   element_keys, denoise_pair)
    return _sample_onehot_state(d, denoise_fn, xt, key, config,
                                element_keys, denoise_pair)


def _sample_index_state(d, denoise_fn, xt, key, config, element_keys,
                        denoise_pair):
    """Wide-C path: int32 index carry, inverse-CDF draws, final step
    outside the scan (measured -32 ms/step at the Cityscapes knee)."""
    t_grid_np = subsampled_t_values(d.time_steps, config.num_steps)
    k = int(config.num_steps)
    batch = xt.shape[0]
    num_classes = xt.shape[-1]

    def onehot(idx):
        return jax.nn.one_hot(idx, num_classes, dtype=jnp.float32)

    def posterior_probs(idx, p0, t):
        # index-specialised posterior: x_t is exactly one-hot here, so the
        # generic form's S_u reduction pass is skipped (categorical.py)
        probs = theta_post_prob_from_idx(d, idx, p0.astype(jnp.float32), t)
        return jnp.clip(probs, min=1e-12)

    def draw(step_idx, probs):
        if element_keys is not None:
            step_keys = jax.vmap(jax.random.fold_in, (0, None))(element_keys, step_idx)
            return jax.vmap(sample_categorical_icdf)(step_keys, probs)
        return sample_categorical_icdf(jax.random.fold_in(key, step_idx), probs)

    # prior arrives one-hot (API parity); the carried state is its indices
    idx0 = jnp.argmax(xt, axis=-1).astype(jnp.int32)
    t_scan = jnp.asarray(t_grid_np[:-1])
    steps_scan = jnp.arange(k - 1, dtype=jnp.int32)
    t_final = int(t_grid_np[-1])
    t_final_vec = jnp.full((batch,), t_final, dtype=jnp.int32)

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
            idx, skips = carry
            t_scalar, step_idx = inputs
            x = onehot(idx)
            t = jnp.full((batch,), t_scalar, dtype=jnp.int32)
            p0, skips = jax.lax.cond(
                step_idx % r == 0,
                lambda op: full_fn(*op[:2]),
                lambda op: (reuse_fn(*op), op[2]),
                (x, t, skips))
            probs = posterior_probs(idx, p0, t)
            return (draw(step_idx, probs), skips), None

        (idx, skips), _ = jax.lax.scan(
            step_reuse, (idx0, skips0), (t_scan, steps_scan))
        x = onehot(idx)
        # the final step's branch is static: step index k-1 against R
        if (k - 1) % r == 0:
            p0, _ = full_fn(x, t_final_vec)
        else:
            p0 = reuse_fn(x, t_final_vec, skips)
    else:
        def step(idx, inputs):
            t_scalar, step_idx = inputs
            x = onehot(idx)
            t = jnp.full((batch,), t_scalar, dtype=jnp.int32)
            probs = posterior_probs(idx, denoise_fn(x, t), t)
            return draw(step_idx, probs), None

        idx, _ = jax.lax.scan(step, idx0, (t_scan, steps_scan))
        x = onehot(idx)
        p0 = denoise_fn(x, t_final_vec)

    probs = posterior_probs(idx, p0, t_final_vec)
    if t_final > 1:
        # only reachable for K == 1 < T: the reference's loop never hits
        # its t==1 resolution and the single step ends in an ordinary draw
        # (`diffusion_denoising.py:204-212` with t > 1)
        return onehot(draw(k - 1, probs))
    if config.step_T_sample == "confidence":
        return probs
    # "majority" (also the reference's None default, `:209`)
    return max_prob_onehot(probs)


def _sample_onehot_state(d, denoise_fn, xt, key, config, element_keys,
                         denoise_pair):
    """Narrow-C path: one-hot float carry, Gumbel draws, final step
    resolved by a `where` inside the scan — at C=2 the whole chain fuses
    into the UNet epilogue and the index restructure measured a net loss
    (PERFNOTES round 5)."""
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
