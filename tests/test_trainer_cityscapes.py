"""Trainer smoke on the Cityscapes-style path: 20 classes, class weights
zeroing the ignore class, mIoU validation branch, best_miou checkpointing."""

import os

import pytest


@pytest.fixture
def fake_cityscapes(tmp_path, cityscapes_tree_factory):
    return cityscapes_tree_factory(tmp_path, splits={"train": 8, "val": 2})


def test_cityscapes_train_smoke(fake_cityscapes, tmp_path, monkeypatch):
    monkeypatch.setenv("CCDM_CITYSCAPES_PATH", fake_cityscapes)
    from ccdm_tpu.train.trainer import run_train

    params = {
        "output_path": str(tmp_path / "cs_run"),
        "dataset_file": "ccdm_tpu.data.cityscapes",
        "dataset_pipeline_train": ["flip", "resize", "torchvision_normalise"],
        "dataset_pipeline_train_settings": {"target_size": [32, 64]},
        "dataset_pipeline_val": ["resize", "torchvision_normalise"],
        "dataset_pipeline_val_settings": {"target_size": [32, 64]},
        "dataset_val_max_size": 2,
        "batch_size": 4,
        "max_epochs": 1,
        "time_steps": 3,
        "beta_schedule": "cosine",
        "polyak_alpha": 0.9,
        "compute_dtype": "float32",
        "optim": {"name": "Adam", "learning_rate": 1e-3},
        "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                        "attention_resolutions": [4], "num_head_channels": 4},
        "display_freq": 1,
        "save_freq": 10,
        "validation_freq": 2,
        "n_validation_images": 1,
        "n_validation_predictions": 1,
    }
    state = run_train(params, max_steps=2)
    assert int(state.step) == 2
    # mIoU validation branch ran and checkpointed best_miou
    assert os.path.isdir(tmp_path / "cs_run" / "best_miou" / "2")
    # metrics.jsonl has a val mIoU entry
    import json

    events = [json.loads(l) for l in open(tmp_path / "cs_run" / "metrics.jsonl")]
    assert any(e["tag"] == "val" and "mIoU" in e for e in events)
