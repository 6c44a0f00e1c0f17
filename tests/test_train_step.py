"""End-to-end train-step tests on a tiny model, incl. the 8-device mesh path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.models.builder import build_model
from ccdm_tpu.parallel.mesh import (
    MeshConfig,
    batch_sharding,
    make_mesh,
    replicated,
    shard_train_state,
    state_shardings,
)
from ccdm_tpu.train.optimizer import build_optimizer
from ccdm_tpu.train.state import create_train_state
from ccdm_tpu.train.step import make_train_step

TINY_PARAMS = {
    "beta_schedule": "cosine",
    "time_steps": 5,
    "polyak_alpha": 0.9,
    "compute_dtype": "float32",
    "optim": {"name": "Adam", "learning_rate": 1e-3,
              "lr_function": "polynomial",
              "lr_params": {"power": 1.0, "min_lr": 1e-5}, "epochs": 1},
    "max_epochs": 1,
    "unet_openai": {
        "base_channels": 8, "image_size": 16, "channel_mult": [1, 2],
        "attention_resolutions": [2], "num_head_channels": 4,
    },
}
C = 2
H = W = 16


def make_batch(key, batch=4):
    k1, k2 = jax.random.split(key)
    image = jax.random.normal(k1, (batch, H, W, 1))
    x0 = jax.nn.one_hot(jax.random.randint(k2, (batch, H, W), 0, C), C)
    return {"image": image, "x0": x0}


@pytest.fixture(scope="module")
def setup():
    model = build_model(TINY_PARAMS, num_classes=C, image_channels=1)
    tx, sched = build_optimizer(TINY_PARAMS, steps_per_epoch=100)

    def make_state():
        params = model.init(jax.random.PRNGKey(0), (H, W, 1))
        return create_train_state(params, tx, polyak_alpha=0.9)

    step_fn = make_train_step(model, jnp.ones((C,)), sched)
    return model, make_state, step_fn


def test_train_step_runs_and_loss_decreases(setup):
    model, make_state, step_fn = setup
    state = make_state()
    jit_step = jax.jit(step_fn)
    batch = make_batch(jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(2)
    losses = []
    for _ in range(12):
        state, metrics = jit_step(state, batch, rng)
        assert not bool(metrics["invalid"])
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 12
    assert float(metrics["lr"]) < 1e-3  # schedule decays


def test_ema_update_semantics(setup):
    model, make_state, step_fn = setup
    state = make_state()
    jit_step = jax.jit(step_fn)
    batch = make_batch(jax.random.PRNGKey(1))
    new_state, _ = jit_step(state, batch, jax.random.PRNGKey(2))
    # polyak.py:34 parity: ema' = α·ema + (1-α)·param', on every leaf
    a = 0.9
    moved = False
    for p_old, e_old, p_new, e_new in zip(
        jax.tree.leaves(state.params), jax.tree.leaves(state.ema_params),
        jax.tree.leaves(new_state.params), jax.tree.leaves(new_state.ema_params),
    ):
        np.testing.assert_allclose(
            np.asarray(e_new), a * np.asarray(e_old) + (1 - a) * np.asarray(p_new),
            rtol=1e-5, atol=1e-7,
        )
        moved = moved or not np.allclose(np.asarray(p_old), np.asarray(p_new))
    assert moved  # params actually changed somewhere


def test_train_step_sharded_8dev(setup):
    """DP×TP mesh (4×2) over the virtual 8-CPU backend: one full step."""
    model, make_state, step_fn = setup
    state = make_state()
    assert len(jax.devices()) == 8
    mesh = make_mesh(MeshConfig(data=4, model=2))
    state = shard_train_state(state, mesh)
    sh = state_shardings(state, mesh)
    jit_step = jax.jit(
        step_fn,
        in_shardings=(sh, batch_sharding(mesh), replicated(mesh)),
        out_shardings=(sh, replicated(mesh)),
        donate_argnums=0,
    )
    batch = jax.device_put(make_batch(jax.random.PRNGKey(1), batch=8), batch_sharding(mesh))
    rng = jax.device_put(jax.random.PRNGKey(2), replicated(mesh))
    new_state, metrics = jit_step(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1  # the sharded step increments the counter

    # Sharded and replicated results agree: run same batch unsharded.
    # (Sums across devices reorder adds; tolerance accounts for fp32.)
    single = jax.jit(step_fn)(make_state(), make_batch(jax.random.PRNGKey(1), batch=8),
                              jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(metrics["loss"]), float(single[1]["loss"]), rtol=1e-4)


def test_class_weight_masking(setup):
    """Zero weight for a class removes its pixels from the loss."""
    model, make_state, _ = setup
    state = make_state()
    from ccdm_tpu.train.step import train_loss

    batch = make_batch(jax.random.PRNGKey(3))
    rng = jax.random.PRNGKey(4)
    full, _ = train_loss(model, state.params, batch, rng, jnp.ones((C,)))
    masked, _ = train_loss(model, state.params, batch, rng, jnp.array([1.0, 0.0]))
    assert float(masked) < float(full)
