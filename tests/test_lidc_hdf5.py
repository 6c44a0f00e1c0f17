"""LIDC v1 HDF5 reader + the pickle->HDF5 converter, on synthetic files."""

import pickle
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture
def fake_hdf5(tmp_path):
    import h5py

    rng = np.random.default_rng(0)
    path = tmp_path / "data_lidc.hdf5"
    with h5py.File(path, "w") as f:
        for split, n in [("train", 6), ("val", 3), ("test", 4)]:
            g = f.create_group(split)
            g.create_dataset("images", data=rng.random((n, 64, 64)) - 0.5)
            g.create_dataset("labels",
                             data=(rng.random((n, 4, 64, 64)) > 0.8).astype(np.uint8))
            g.create_dataset("uids", data=np.arange(n, dtype=np.int64))
    return str(path)


def test_hdf5_datasets(fake_hdf5, monkeypatch):
    monkeypatch.setenv("CCDM_LIDC_PATH", fake_hdf5)
    import ccdm_tpu.data.lidc as lidc

    train = lidc.training_dataset()
    assert len(train) == 6
    s = train.get(0, np.random.default_rng(1))
    assert s["image"].shape == (64, 64, 1) and s["x0"].shape == (64, 64, 2)

    val = lidc.validation_dataset(max_size=2)
    assert len(val) == 2
    test = lidc.test_dataset(max_size=3)
    assert len(test) == 3
    np.testing.assert_array_equal(test.indices, [0, 1, 2])  # first-N (lidc.py:210)
    sub = lidc.test_dataset(indices=[3, 1])
    assert len(sub) == 2
    assert sub.get(0)["labels"].shape == (4, 64, 64, 2)


def test_pickle_converter(tmp_path):
    rng = np.random.default_rng(0)
    data = {}
    for i in range(10):
        data[f"slice{i}"] = {
            "image": rng.random((32, 32)).astype(np.float32),
            "masks": (rng.random((4, 32, 32)) > 0.7).astype(np.uint8),
            "series_uid": f"subject{i % 5}",  # 5 subjects, 2 slices each
        }
    pkl = tmp_path / "data.pickle"
    with open(pkl, "wb") as f:
        pickle.dump(data, f)
    out = tmp_path / "out.hdf5"
    subprocess.run(
        [sys.executable, "scripts/lidc_pickle_to_hdf5.py", str(pkl), str(out)],
        check=True, capture_output=True)

    import h5py

    with h5py.File(out) as f:
        total = sum(len(f[s]["images"]) for s in ("train", "val", "test"))
        assert total == 10
        assert all(f[s]["labels"].shape[1:] == (4, 32, 32) for s in ("train", "val", "test"))
        # subject-level split: slices of the same subject stay together —
        # no series_uid may appear in more than one split (data leakage)
        uid_sets = [{u.decode() if isinstance(u, bytes) else str(u)
                     for u in f[s]["uids"][...]} for s in ("train", "val", "test")]
        assert sum(len(u) for u in uid_sets) == len(set().union(*uid_sets)), \
            "a subject's slices leaked across splits"
        # images shifted by -0.5 (lidc.py:79 parity)
        assert f["train"]["images"][0].min() >= -0.5 - 1e-6


def test_hdf5_missing_file(monkeypatch, tmp_path):
    monkeypatch.setenv("CCDM_LIDC_PATH", str(tmp_path / "absent.hdf5"))
    import ccdm_tpu.data.lidc as lidc

    with pytest.raises(FileNotFoundError, match="CCDM_LIDC_PATH"):
        lidc.training_dataset()
