"""The jitted training step: forward, KL loss, grads, update, EMA — one XLA program.

Parity with `Trainer.train_step` (`ddpm/trainer.py:231-293`):

- `t ~ U{1..T}` per sample (`:256`)
- `x_t ~ q(x_t | x_0)` categorical draw (`:257`)
- UNet predicts an x0 distribution (`:260-261`)
- loss = `KL( theta_post(x_t, x_0, t) ‖ theta_post_prob(x_t, x0pred, t) )`
  with the 1e-12 clamp (`:263-270`), per-pixel class-weight mask from
  `class_weights[argmax x0]` (`:274-276`), summed over pixels / batch (`:277`)
- optimizer step + Polyak EMA update (`:279-289`)

All of it — including the EMA and the NaN/neg-KL invariant check
(`_check_loss`, `:308-327`, surfaced as an `invalid` flag in the metrics) —
is a single compiled program; the host only reads back a few scalars.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ccdm_tpu.diffusion.categorical import (
    categorical_kl,
    q_xt_given_x0_probs,
    sample_onehot,
    theta_post,
    theta_post_prob,
)
from ccdm_tpu.models.builder import DenoisingModel
from ccdm_tpu.train.state import TrainState


def train_loss(
    model: DenoisingModel,
    params,
    batch: dict,
    rng: jax.Array,
    class_weights: jnp.ndarray,
    feature_condition: Optional[jnp.ndarray] = None,
) -> tuple:
    """Compute the CCDM training loss for one batch. Returns (loss, aux)."""
    image = batch["image"]
    x0 = batch["x0"]
    b = x0.shape[0]
    d = model.diffusion

    t_key, q_key, drop_key = jax.random.split(rng, 3)
    t = jax.random.randint(t_key, (b,), 1, d.time_steps + 1)
    xt = sample_onehot(q_key, q_xt_given_x0_probs(d, x0, t))

    dropout_on = model.unet.dropout > 0.0
    ret = model.apply(
        params, xt, image, t, feature_condition,
        deterministic=not dropout_on,
        rngs={"dropout": drop_key} if dropout_on else None,
    )
    x0pred = ret["diffusion_out"].astype(jnp.float32)

    target = theta_post(d, xt, x0, t)
    pred = theta_post_prob(d, xt, x0pred, t)
    kl = categorical_kl(pred, target)  # [B,H,W]

    mask = class_weights[jnp.argmax(x0, axis=-1)]
    loss = jnp.sum(kl * mask) / b

    aux = {
        "kl_min": jnp.min(kl),
        # parity with _check_loss (trainer.py:308-327): nan/inf/negative KL
        "invalid": jnp.logical_or(
            jnp.logical_not(jnp.isfinite(loss)), jnp.min(kl) < -1e-3
        ),
    }
    return loss, aux


def make_train_step(
    model: DenoisingModel,
    class_weights: jnp.ndarray,
    lr_schedule: Optional[Callable] = None,
    feature_fn: Optional[Callable] = None,
    encoder_apply: Optional[Callable] = None,
) -> Callable:
    """Build the (un-jitted) train step `(state, batch, rng) -> (state, metrics)`.

    Jit it with donated state and sharded batch; XLA emits the gradient
    all-reduce over the 'data' mesh axis and any TP collectives implied by
    the parameter shardings.

    Two conditioning modes (parity: `condition_encoder.py:36-38`,
    `optimizer.py:13-14`, `trainer.py:712`):
    - `feature_fn(enc_params, images)`: FROZEN encoder; the weights enter
      the program as the step's `enc_params` ARGUMENT, never as closed-over
      constants — a ViT-B/8 baked into the HLO would exceed remote-compile
      request limits and defeat the persistent compile cache.
    - `encoder_apply(enc_params, images)`: TRAINABLE encoder; `state.params`
      must be `{"unet": ..., "encoder": ...}` — the encoder is optimised
      jointly and the tree-wide EMA doubles as the encoder Polyak pair.
    """

    def step(state: TrainState, batch: dict, rng: jax.Array, enc_params=None):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            if encoder_apply is not None:
                fc = encoder_apply(params["encoder"], batch["image"])
                return train_loss(model, params["unet"], batch, step_rng,
                                  class_weights, fc)
            fc = batch.get("feature_condition")
            if fc is None and feature_fn is not None:
                # frozen DINO conditioning computed in-graph
                # (trainer.py:246 parity)
                fc = feature_fn(enc_params, batch["image"])
            return train_loss(model, params, batch, step_rng, class_weights, fc)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        metrics = {
            "loss": loss,
            "invalid": aux["invalid"],
            "kl_min": aux["kl_min"],
            "grad_norm": optax.global_norm(grads),
            "num_items": jnp.asarray(batch["x0"].shape[0], jnp.int32),
        }
        if lr_schedule is not None:
            metrics["lr"] = lr_schedule(state.step)
        return new_state, metrics

    return step


def make_multi_step(step_fn: Callable) -> Callable:
    """Scan K train steps in ONE compiled launch.

    `batches` holds stacked arrays `[K, B, ...]`. Per-step RNG folding uses
    `state.step` exactly like the single-step path, so K launches of 1 and
    one launch of K produce identical parameter trajectories. Metrics: last
    step's values plus `loss_mean` and an any-step `invalid` flag.

    Amortises per-launch dispatch latency — measured on v5e, the flagship
    train step is 24 ms on-device at batch 16 while a dispatch round-trip
    through a remote tunnel costs ~75 ms (PERFNOTES.md).
    """

    def multi(state: TrainState, batches: dict, rng: jax.Array, enc_params=None):
        def body(st, batch):
            return step_fn(st, batch, rng, enc_params)

        state, ms = jax.lax.scan(body, state, batches)
        metrics = {k: v[-1] for k, v in ms.items()}
        metrics["invalid"] = jnp.any(ms["invalid"])
        metrics["loss_mean"] = jnp.mean(ms["loss"])
        return state, metrics

    return multi
