"""End-to-end smoke test: train on synthetic data, validate, checkpoint, resume.

SURVEY.md §4(f): smoke train on synthetic data exercises the full stack —
dataset module resolution, loaders, mesh sharding, jitted step, GED/HM-IoU
validation with the compiled sampler, Orbax checkpointing and resume.
"""

import os

import numpy as np
import pytest

SMOKE_PARAMS = {
    "dataset_file": "ccdm_tpu.data.synthetic",
    "batch_size": 8,
    "samples": 4,
    "max_epochs": 1,
    "time_steps": 4,
    "beta_schedule": "cosine",
    "polyak_alpha": 0.9,
    "compute_dtype": "float32",
    "optim": {"name": "Adam", "learning_rate": 1e-3, "lr_function": "polynomial",
              "lr_params": {"power": 1.0, "min_lr": 1e-5}, "epochs": 1},
    "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                    "attention_resolutions": [4], "num_head_channels": 4},
    "display_freq": 2,
    "save_freq": 4,
    "validation_freq": 4,
    "dataset_val_max_size": 4,
    "validation_max_batches": 1,
    "n_validation_images": 2,
    "n_validation_predictions": 2,
    "mesh": {"model": 1},
}


@pytest.fixture(scope="module")
def tiny_synthetic():
    # shrink the synthetic dataset via a patched module-level default
    import ccdm_tpu.data.synthetic as syn

    orig_train, orig_val = syn.training_dataset, syn.validation_dataset
    syn.training_dataset = lambda: syn.synthetic_training_dataset(n=16, resolution=32)
    syn.validation_dataset = lambda max_size=4: syn.synthetic_test_dataset(n=4, resolution=32)
    yield
    syn.training_dataset, syn.validation_dataset = orig_train, orig_val


def test_run_train_smoke(tmp_path, tiny_synthetic):
    from ccdm_tpu.train.trainer import run_train

    params = dict(SMOKE_PARAMS, output_path=str(tmp_path / "run"))
    state = run_train(params, max_steps=4)
    assert int(state.step) == 4
    # periodic checkpoint written at step 4
    assert os.path.isdir(tmp_path / "run" / "model")
    # GED validation ran at step 4 -> best checkpoints exist
    assert os.path.isdir(tmp_path / "run" / "best_ged")
    # qualitative grid written
    pngs = [f for f in os.listdir(tmp_path / "run") if f.endswith(".png")]
    assert pngs

    # resume from the checkpoint and take more steps
    params2 = dict(params, load_from=str(tmp_path / "run"),
                   output_path=str(tmp_path / "run2"))
    state2 = run_train(params2, max_steps=2)
    assert int(state2.step) == 6  # 4 restored + 2 new


def test_max_steps_exit_saves_final_checkpoint(tmp_path, tiny_synthetic):
    """An early `max_steps` exit persists the final state even when save_freq
    never fired — a follow-up eval must load THESE weights (the demo-gate
    flow: run_train(max_steps) then eval on `latest_step`)."""
    from ccdm_tpu.train.checkpoint import load_tree
    from ccdm_tpu.train.trainer import run_train

    params = dict(SMOKE_PARAMS, output_path=str(tmp_path / "run"),
                  save_freq=1000, validation_freq=1000)
    run_train(params, max_steps=3)
    tree = load_tree(str(tmp_path / "run"))
    assert int(np.asarray(tree["step"])) == 3


def test_resume_trajectory_identical(tmp_path, tiny_synthetic):
    """Engine-state resume parity (`ddpm/trainer.py:374,582-586`):
    train(2 epochs) must be BIT-IDENTICAL to train-interrupted-mid-epoch +
    resume — same epoch position, same continued shuffle sequence, and
    max_epochs acting as the total budget."""
    import jax

    from ccdm_tpu.train.trainer import run_train

    # 16 images / batch 8 -> 2 steps per epoch; 2 epochs = 4 steps total
    base = dict(SMOKE_PARAMS, max_epochs=2, validation_freq=1000,
                save_freq=1000, display_freq=1000)

    state_a = run_train(dict(base, output_path=str(tmp_path / "a")))
    assert int(state_a.step) == 4

    # interrupted run: stop mid-epoch-1 (after 3 steps), checkpoint every step
    state_b1 = run_train(dict(base, output_path=str(tmp_path / "b"),
                              save_freq=1), max_steps=3)
    assert int(state_b1.step) == 3
    # resume with the SAME total budget; it must do exactly the remaining step
    state_b2 = run_train(dict(base, output_path=str(tmp_path / "b2"),
                              load_from=str(tmp_path / "b")))
    assert int(state_b2.step) == 4, "max_epochs must be a total budget"

    for name, a, b in (("params", state_a.params, state_b2.params),
                       ("ema", state_a.ema_params, state_b2.ema_params)):
        fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
        assert len(fa) == len(fb)
        for xa, xb in zip(fa, fb):
            np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb),
                                          err_msg=f"{name} diverged on resume")

    # a run resumed at/after the budget does no further work
    state_c = run_train(dict(base, output_path=str(tmp_path / "c"),
                             load_from=str(tmp_path / "b2")))
    assert int(state_c.step) == 4


def test_checkpoint_save_after_close(tmp_path):
    """run() closes the managers on exit, but standalone validate()/save
    afterwards is a documented use-case — managers must reopen lazily
    (same contract as MetricsLogger.log)."""
    import jax.numpy as jnp
    import optax

    from ccdm_tpu.train.checkpoint import CheckpointManagers, load_tree
    from ccdm_tpu.train.state import create_train_state

    params = {"w": jnp.ones((3,))}
    state = create_train_state(params, optax.sgd(1e-2))
    mgrs = CheckpointManagers(str(tmp_path / "ckpt"))
    mgrs.save_periodic(state)
    mgrs.close()

    # post-close saves must not raise and must land on disk
    mgrs.save_best("ged", state.replace(step=state.step + 1), 0.5)
    mgrs.save_periodic(state.replace(step=state.step + 2))
    mgrs.close()
    assert load_tree(str(tmp_path / "ckpt" / "best_ged"))["step"] == 1
    assert load_tree(str(tmp_path / "ckpt" / "model"))["step"] == 2
    mgrs.close()  # idempotent


def test_invalid_loss_aborts(tmp_path, tiny_synthetic):
    """NaN-poisoned params must trigger the debug dump + raise."""
    import jax
    import jax.numpy as jnp

    from ccdm_tpu.train.trainer import TrainingRun

    params = dict(SMOKE_PARAMS, output_path=str(tmp_path / "bad"), display_freq=1)
    run = TrainingRun(params)
    run.state = run.state.replace(
        params=jax.tree.map(lambda p: p * jnp.nan, run.state.params))
    with pytest.raises(ValueError, match="Invalid loss"):
        run.run(max_steps=3)
    assert os.path.isdir(tmp_path / "bad" / "debug_state")


def test_profile_steps_writes_trace(tmp_path, tiny_synthetic):
    """profile_steps: N (SURVEY §5 tracing parity) wraps steps 10..10+N in a
    jax.profiler trace written under <output_path>/profile."""
    from ccdm_tpu.train.trainer import run_train

    params = dict(SMOKE_PARAMS, output_path=str(tmp_path / "prof_run"),
                  profile_steps=2, validation_freq=1000, save_freq=1000)
    run_train(params, max_steps=13)
    prof_dir = tmp_path / "prof_run" / "profile"
    assert prof_dir.is_dir()
    # the trace writer produces at least one plugins/profile artifact
    assert any(prof_dir.rglob("*"))


def test_validation_sampler_is_cached(tmp_path, tiny_synthetic):
    """Validation events reuse ONE jitted sampler per (num_samples, num_steps)
    — rebuilding each event re-traces and re-compiles the whole K-step scan
    (minutes on real TPU for the flagship model)."""
    from unittest import mock

    from ccdm_tpu.train import trainer as trainer_mod
    from ccdm_tpu.train.trainer import TrainingRun

    params = dict(SMOKE_PARAMS, output_path=str(tmp_path / "cache_run"),
                  save_freq=1000, validation_freq=1000)
    run = TrainingRun(params)
    with mock.patch.object(trainer_mod, "make_batched_sampler",
                           wraps=trainer_mod.make_batched_sampler) as spy:
        run.validate()
        run.validate()
        run.validate_miou()
        run.validate_miou()
    # one build for the GED sampler (samples=4), one for mIoU (samples=1)
    assert spy.call_count == 2, spy.call_count
