"""LIDC v2 (PNG-folder) reader against a synthetic HPU-Net-layout tree."""

import numpy as np
import pytest
from PIL import Image


@pytest.fixture
def fake_lidc_tree(tmp_path):
    rng = np.random.default_rng(0)
    for split, n in [("train", 3), ("val", 2), ("test", 2)]:
        img_dir = tmp_path / f"lidc_crops_{split}" / split / "images" / "case0"
        gt_dir = tmp_path / f"lidc_crops_{split}" / split / "gt" / "case0"
        img_dir.mkdir(parents=True)
        gt_dir.mkdir(parents=True)
        for i in range(n):
            img = (rng.random((180, 180)) * 255).astype(np.uint8)
            Image.fromarray(img).save(img_dir / f"slice{i}.png")
            for a in range(4):
                mask = (rng.random((180, 180)) > 0.8).astype(np.uint8) * 255
                Image.fromarray(mask).save(gt_dir / f"slice{i}_l{a}.png")
    return str(tmp_path)


def test_lidc_orig_train_protocol(fake_lidc_tree, monkeypatch):
    monkeypatch.setenv("CCDM_LIDC_ORIG_PATH", fake_lidc_tree)
    import ccdm_tpu.data.lidc_orig as lidc_orig

    ds = lidc_orig.training_dataset()
    assert len(ds) == 3
    s = ds.get(0, np.random.default_rng(1))
    # center crop 128, image in [-1,1] (lidc_orig.py:64-67)
    assert s["image"].shape == (128, 128, 1)
    assert s["x0"].shape == (128, 128, 2)
    assert s["image"].min() >= -1.0 and s["image"].max() <= 1.0
    np.testing.assert_allclose(s["x0"].sum(-1), 1.0)


def test_lidc_orig_test_protocol(fake_lidc_tree, monkeypatch):
    monkeypatch.setenv("CCDM_LIDC_ORIG_PATH", fake_lidc_tree)
    import ccdm_tpu.data.lidc_orig as lidc_orig

    ds = lidc_orig.test_dataset(max_size=None)
    assert len(ds) == 2
    s = ds.get(0)
    assert s["labels"].shape == (4, 128, 128, 2)
    np.testing.assert_allclose(s["likelihoods"], 0.25)

    sub = lidc_orig.validation_dataset(max_size=1)
    assert len(sub) == 1


def test_lidc_orig_missing_tree(monkeypatch, tmp_path):
    monkeypatch.setenv("CCDM_LIDC_ORIG_PATH", str(tmp_path / "nope"))
    import ccdm_tpu.data.lidc_orig as lidc_orig

    with pytest.raises(FileNotFoundError, match="CCDM_LIDC_ORIG_PATH"):
        lidc_orig.training_dataset()
