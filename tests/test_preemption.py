"""Graceful preemption: SIGTERM mid-training saves state and exits cleanly.

No reference analog — SURVEY §5 records the reference has no elasticity
(recovery is manual `load_from`). On Cloud TPU the scheduler sends SIGTERM
ahead of eviction; the trainer turns that into a final checkpoint + clean
exit, and the existing resume machinery (epoch position derived from the
restored step, `max_epochs` as a total budget) does the rest.

Runs the trainer in a REAL subprocess and delivers a REAL SIGTERM, because
the interesting behavior is the signal handler + loop interplay, not the
flag plumbing.
"""

import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

CHILD = textwrap.dedent("""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import sys

    import ccdm_tpu.data.synthetic as syn
    syn.training_dataset = lambda: syn.synthetic_training_dataset(n=64, resolution=32)
    syn.validation_dataset = lambda max_size=4: syn.synthetic_test_dataset(n=4, resolution=32)

    from ccdm_tpu.train.trainer import run_train

    params = {
        "dataset_file": "ccdm_tpu.data.synthetic",
        "output_path": sys.argv[1],
        "batch_size": 8,
        "samples": 4,
        "max_epochs": 100000,
        "time_steps": 4,
        "beta_schedule": "cosine",
        "polyak_alpha": 0.9,
        "compute_dtype": "float32",
        "optim": {"name": "Adam", "learning_rate": 1e-3,
                  "lr_function": "polynomial",
                  "lr_params": {"power": 1.0, "min_lr": 1e-5}, "epochs": 100000},
        "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                        "attention_resolutions": [4], "num_head_channels": 4},
        "display_freq": 2,
        "save_freq": 10**9,
        "validation_freq": 10**9,
        "mesh": {"model": 1},
    }
    state = run_train(params)
    print("FINAL_STEP", int(state.step), flush=True)
""")


def test_sigterm_saves_and_resumes(tmp_path):
    run_dir = tmp_path / "run"
    log_path = tmp_path / "child.log"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    with open(log_path, "w") as log:
        child = subprocess.Popen(
            [sys.executable, "-c", CHILD, str(run_dir)],
            stdout=log, stderr=subprocess.STDOUT, env=env,
        )
    try:
        # wait until the step loop is demonstrably past compile and stepping
        deadline = time.time() + 600
        while time.time() < deadline:
            if child.poll() is not None:
                pytest.fail(
                    "trainer exited before SIGTERM:\n" + log_path.read_text())
            if "iter=" in log_path.read_text():
                break
            time.sleep(1.0)
        else:
            pytest.fail("trainer never reached the step loop:\n"
                        + log_path.read_text())
        child.send_signal(signal.SIGTERM)
        rc = child.wait(timeout=300)
    finally:
        if child.poll() is None:
            child.kill()
    out = log_path.read_text()
    assert rc == 0, out
    assert "preemption notice" in out, out
    assert "FINAL_STEP" in out, out  # run_train returned normally

    # a checkpoint was saved at the preemption step
    from ccdm_tpu.train.checkpoint import load_tree

    tree = load_tree(str(run_dir))
    saved_step = int(tree["step"])
    assert saved_step >= 2

    # the standard resume path continues from the preempted position
    import ccdm_tpu.data.synthetic as syn
    orig_train, orig_val = syn.training_dataset, syn.validation_dataset
    syn.training_dataset = lambda: syn.synthetic_training_dataset(n=64, resolution=32)
    syn.validation_dataset = lambda max_size=4: syn.synthetic_test_dataset(n=4, resolution=32)
    try:
        from ccdm_tpu.train.trainer import run_train

        params = {
            "dataset_file": "ccdm_tpu.data.synthetic",
            "output_path": str(tmp_path / "resumed"),
            "load_from": str(run_dir),
            "batch_size": 8,
            "samples": 4,
            "max_epochs": 1,
            "time_steps": 4,
            "beta_schedule": "cosine",
            "polyak_alpha": 0.9,
            "compute_dtype": "float32",
            "optim": {"name": "Adam", "learning_rate": 1e-3,
                      "lr_function": "polynomial",
                      "lr_params": {"power": 1.0, "min_lr": 1e-5}, "epochs": 1},
            "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                            "attention_resolutions": [4],
                            "num_head_channels": 4},
            "display_freq": 2,
            "save_freq": 10**9,
            "validation_freq": 10**9,
            "mesh": {"model": 1},
        }
        state = run_train(params, max_steps=2)
        assert int(state.step) == saved_step + 2
    finally:
        syn.training_dataset, syn.validation_dataset = orig_train, orig_val


def test_sigterm_flag_in_process(tmp_path):
    """The in-process path: setting the trainer's SIGTERM flag makes the loop
    save and return (fast check that doesn't need a subprocess)."""
    import ccdm_tpu.data.synthetic as syn

    orig_train, orig_val = syn.training_dataset, syn.validation_dataset
    syn.training_dataset = lambda: syn.synthetic_training_dataset(n=16, resolution=32)
    syn.validation_dataset = lambda max_size=4: syn.synthetic_test_dataset(n=4, resolution=32)
    try:
        from ccdm_tpu.train.checkpoint import load_tree
        from ccdm_tpu.train.trainer import TrainingRun

        params = {
            "dataset_file": "ccdm_tpu.data.synthetic",
            "output_path": str(tmp_path / "run"),
            "batch_size": 8,
            "samples": 4,
            "max_epochs": 50,
            "time_steps": 4,
            "beta_schedule": "cosine",
            "polyak_alpha": 0.9,
            "compute_dtype": "float32",
            "optim": {"name": "Adam", "learning_rate": 1e-3,
                      "lr_function": "polynomial",
                      "lr_params": {"power": 1.0, "min_lr": 1e-5},
                      "epochs": 50},
            "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                            "attention_resolutions": [4],
                            "num_head_channels": 4},
            "display_freq": 10**9,
            "save_freq": 10**9,
            "validation_freq": 10**9,
            "mesh": {"model": 1},
        }
        run = TrainingRun(params)
        # deliver the "signal" via the real handler before the loop starts:
        # the first loop iteration must save and exit
        run._on_sigterm(signal.SIGTERM, None)
        state = run.run()
        assert int(state.step) == 1  # stopped after the first step
        tree = load_tree(str(tmp_path / "run"))
        assert int(tree["step"]) == 1
    finally:
        syn.training_dataset, syn.validation_dataset = orig_train, orig_val
