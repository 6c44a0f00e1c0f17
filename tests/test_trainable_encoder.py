"""Trainable DINO encoder: joint optimisation + encoder EMA + checkpointing.

Parity targets: encoder params joined into the optimizer
(`ddpm/optimizer.py:13-14`), a Polyak pair for the encoder
(`ddpm/trainer.py:712`), checkpoint keys `feature_cond_encoder` /
`average_feature_cond_encoder` (`trainer.py:366-371`).
"""

import os

import jax
import numpy as np
import pytest


@pytest.fixture
def fake_cityscapes(tmp_path, cityscapes_tree_factory):
    return cityscapes_tree_factory(tmp_path, splits={"train": 4, "val": 2},
                                   size=(32, 64), classes=(7, 8, 26, 0))


PARAMS = {
    "dataset_file": "ccdm_tpu.data.cityscapes",
    "dataset_pipeline_train": ["resize", "torchvision_normalise"],
    "dataset_pipeline_train_settings": {"target_size": [32, 64]},
    "dataset_pipeline_val": ["resize", "torchvision_normalise"],
    "dataset_pipeline_val_settings": {"target_size": [32, 64]},
    "dataset_val_max_size": 2,
    "batch_size": 4,
    "max_epochs": 2,
    "time_steps": 3,
    "beta_schedule": "cosine",
    "polyak_alpha": 0.9,
    "compute_dtype": "float32",
    "optim": {"name": "Adam", "learning_rate": 1e-3},
    # inject at encoder block 4, which sits at ds=2 for channel_mult [1,1,2]
    "feature_cond_encoder": {
        "type": "dino", "model": "dino_vits8", "train": True,
        "output_stride": 2, "target_layer": 4, "source_layer": 1,
        "channels": 16,
        "vit_config": {"embed_dim": 16, "depth": 2, "num_heads": 2, "patch_size": 8},
    },
    "unet_openai": {"base_channels": 8, "channel_mult": [1, 1, 2],
                    "attention_resolutions": [], "num_head_channels": 4},
    "display_freq": 10,
    "save_freq": 2,
    "validation_freq": 100,
}


def test_trainable_encoder_updates_and_checkpoints(fake_cityscapes, tmp_path, monkeypatch):
    monkeypatch.setenv("CCDM_CITYSCAPES_PATH", fake_cityscapes)
    from ccdm_tpu.train.trainer import TrainingRun

    run = TrainingRun(dict(PARAMS, output_path=str(tmp_path / "enc_run")))
    assert run.encoder_apply is not None
    assert set(run.state.params.keys()) == {"unet", "encoder"}
    enc_before = jax.tree.map(np.asarray, run.state.params["encoder"])

    # one step first: with e0 == p0 at init, the tree-wide EMA acting as the
    # encoder Polyak pair must produce EXACTLY e1 = a*p0 + (1-a)*p1
    state1 = run.run(max_steps=1)
    a = 0.9
    for p0, p_new, e_new in zip(
        jax.tree.leaves(enc_before),
        jax.tree.leaves(jax.tree.map(np.asarray, state1.params["encoder"])),
        jax.tree.leaves(jax.tree.map(np.asarray, state1.ema_params["encoder"])),
    ):
        np.testing.assert_allclose(e_new, a * p0 + (1 - a) * p_new,
                                   rtol=2e-5, atol=1e-6)

    state = run.run(max_steps=1)  # second step -> total step count 2
    enc_after = jax.tree.map(np.asarray, state.params["encoder"])
    moved = any(
        not np.allclose(a_, b_)
        for a_, b_ in zip(jax.tree.leaves(enc_before), jax.tree.leaves(enc_after))
    )
    assert moved, "encoder params did not receive gradients"

    # checkpoint schema carries the encoder keys
    run.checkpoints.wait()
    ckpt_dir = tmp_path / "enc_run" / "model" / "2"
    assert ckpt_dir.is_dir()

    from ccdm_tpu.train.checkpoint import load_tree

    tree = load_tree(str(tmp_path / "enc_run"))
    assert "feature_cond_encoder" in tree
    assert "average_feature_cond_encoder" in tree

    # resume restores the composite tree
    run2 = TrainingRun(dict(PARAMS, output_path=str(tmp_path / "enc_run2"),
                            load_from=str(tmp_path / "enc_run")))
    assert int(run2.state.step) == 2
    state2 = run2.run(max_steps=1)
    assert int(state2.step) == 3

    # eval side: cityscapes inference loads the EMA encoder from the
    # checkpoint (fallback chain, eval_cdm.py:131-144 parity)
    from ccdm_tpu.eval.cityscapes_eval import run_inference

    eval_params = dict(PARAMS,
                       output_path=str(tmp_path / "enc_eval"),
                       load_from=str(tmp_path / "enc_run"),
                       batch_size=2,
                       evaluation={"resolution": "dataloader", "evaluations": 1,
                                   "evaluation_vote_strategy": "confidence"})
    res = run_inference(eval_params)
    assert res["images"] == 2
