"""Multi-step launches: K scanned steps == K single launches, exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ccdm_tpu.models.builder import build_model
from ccdm_tpu.train.state import create_train_state
from ccdm_tpu.train.step import make_multi_step, make_train_step

PARAMS = {
    "beta_schedule": "cosine", "time_steps": 4, "compute_dtype": "float32",
    "unet_openai": {"base_channels": 8, "image_size": 16, "channel_mult": [1, 2],
                    "attention_resolutions": [], "num_head_channels": 4},
}


def test_multi_step_matches_single_steps():
    model = build_model(PARAMS, num_classes=2, image_channels=1)
    tx = optax.adam(1e-3)

    def fresh():
        return create_train_state(
            model.init(jax.random.PRNGKey(0), (16, 16, 1)), tx, polyak_alpha=0.9)

    step = make_train_step(model, jnp.ones((2,)))
    rng = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    b1 = {"image": jax.random.normal(k1, (4, 16, 16, 1)),
          "x0": jax.nn.one_hot(jax.random.randint(k1, (4, 16, 16), 0, 2), 2)}
    b2 = {"image": jax.random.normal(k2, (4, 16, 16, 1)),
          "x0": jax.nn.one_hot(jax.random.randint(k2, (4, 16, 16), 0, 2), 2)}

    s_single = fresh()
    jit_step = jax.jit(step)
    s_single, m1 = jit_step(s_single, b1, rng)
    s_single, m2 = jit_step(s_single, b2, rng)

    s_multi = fresh()
    multi = jax.jit(make_multi_step(step))
    stacked = {k: jnp.stack([b1[k], b2[k]]) for k in b1}
    s_multi, mm = multi(s_multi, stacked, rng)

    assert int(s_multi.step) == int(s_single.step) == 2
    # identical trajectory: the step-2 loss (computed from step-1 params)
    # must match exactly
    np.testing.assert_allclose(float(mm["loss"]), float(m2["loss"]), rtol=1e-6)
    assert not bool(mm["invalid"])
    # Params: Adam normalises near-zero gradients (zero-init biases) to
    # O(lr) regardless of magnitude, amplifying compilation-dependent fp
    # noise — so compare at the update scale (lr=1e-3), not bitwise.
    for a, b in zip(jax.tree.leaves(s_single.params), jax.tree.leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    for a, b in zip(jax.tree.leaves(s_single.ema_params), jax.tree.leaves(s_multi.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_trainer_steps_per_launch(tmp_path):
    """run_train with steps_per_launch=2 reaches the same step count and
    still writes checkpoints/validation artifacts."""
    import ccdm_tpu.data.synthetic as syn

    orig_train, orig_val = syn.training_dataset, syn.validation_dataset
    syn.training_dataset = lambda: syn.synthetic_training_dataset(n=16, resolution=32)
    syn.validation_dataset = lambda max_size=4: syn.synthetic_test_dataset(n=4, resolution=32)
    try:
        from ccdm_tpu.train.trainer import run_train

        params = {
            "output_path": str(tmp_path / "ml_run"),
            "dataset_file": "ccdm_tpu.data.synthetic",
            "batch_size": 8, "samples": 2, "max_epochs": 4,
            "time_steps": 4, "beta_schedule": "cosine", "polyak_alpha": 0.9,
            "compute_dtype": "float32",
            "optim": {"name": "Adam", "learning_rate": 1e-3},
            "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                            "attention_resolutions": [4], "num_head_channels": 4},
            "display_freq": 2, "save_freq": 4, "validation_freq": 100,
            "dataset_val_max_size": 4, "validation_max_batches": 1,
            "steps_per_launch": 2,
        }
        state = run_train(params, max_steps=4)
        assert int(state.step) == 4
        import os

        assert os.path.isdir(tmp_path / "ml_run" / "model")
    finally:
        syn.training_dataset, syn.validation_dataset = orig_train, orig_val


def test_trainer_steps_per_launch_with_tail(tmp_path):
    """Epoch length NOT divisible by K: the tail batches run as single
    launches so no step is dropped (2 batches/epoch, K=3 -> 0 groups + 2
    singles per epoch; total step count is exact)."""
    import ccdm_tpu.data.synthetic as syn

    orig_train, orig_val = syn.training_dataset, syn.validation_dataset
    syn.training_dataset = lambda: syn.synthetic_training_dataset(n=16, resolution=32)
    syn.validation_dataset = lambda max_size=4: syn.synthetic_test_dataset(n=4, resolution=32)
    try:
        from ccdm_tpu.train.trainer import run_train

        params = {
            "output_path": str(tmp_path / "tail_run"),
            "dataset_file": "ccdm_tpu.data.synthetic",
            "batch_size": 8, "samples": 2, "max_epochs": 3,
            "time_steps": 4, "beta_schedule": "cosine", "polyak_alpha": 0.9,
            "compute_dtype": "float32",
            "optim": {"name": "Adam", "learning_rate": 1e-3},
            "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                            "attention_resolutions": [4], "num_head_channels": 4},
            "display_freq": 10, "save_freq": 100, "validation_freq": 100,
            "dataset_val_max_size": 4, "validation_max_batches": 1,
            "steps_per_launch": 3,
        }
        # 16 imgs / batch 8 = 2 batches/epoch; 3 epochs = 6 steps total,
        # none of which fill a K=3 group within an epoch
        state = run_train(params)
        assert int(state.step) == 6
    finally:
        syn.training_dataset, syn.validation_dataset = orig_train, orig_val
