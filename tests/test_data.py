import numpy as np
import pytest

from ccdm_tpu.data import cityscapes_labels as cl
from ccdm_tpu.data.loader import EpochLoader
from ccdm_tpu.data.registry import resolve_dataset_module
from ccdm_tpu.data.synthetic import (
    make_synthetic_lidc_group,
    synthetic_test_dataset,
    synthetic_training_dataset,
)
from ccdm_tpu.data.transforms import build_transforms, color_jitter, flip, normalize, resize


def test_synthetic_lidc_schema():
    g = make_synthetic_lidc_group(4, 64)
    assert g["images"].shape == (4, 64, 64)
    assert g["labels"].shape == (4, 4, 64, 64)
    assert g["images"].min() >= -0.5 and g["images"].max() <= 0.5
    assert set(np.unique(g["labels"])).issubset({0, 1})


def test_lidc_train_sample_protocol():
    ds = synthetic_training_dataset(n=4, resolution=64)
    rng = np.random.default_rng(0)
    s = ds.get(0, rng)
    assert s["image"].shape == (64, 64, 1)
    assert s["x0"].shape == (64, 64, 2)
    np.testing.assert_allclose(s["x0"].sum(-1), 1.0)
    # image scaled x2 into [-1, 1] (lidc.py:147)
    assert s["image"].min() >= -1.0 and s["image"].max() <= 1.0


def test_lidc_test_sample_protocol():
    ds = synthetic_test_dataset(n=3, resolution=64)
    s = ds.get(1)
    assert s["labels"].shape == (4, 64, 64, 2)
    np.testing.assert_allclose(s["likelihoods"], 0.25)


def test_epoch_loader_determinism_and_sharding():
    ds = synthetic_training_dataset(n=17, resolution=32)
    loader = EpochLoader(ds, batch_size=4, seed=7)
    b0 = list(loader.epoch(0))
    b0_again = list(loader.epoch(0))
    b1 = list(loader.epoch(1))
    assert len(b0) == len(loader) == 4
    np.testing.assert_array_equal(b0[0]["image"], b0_again[0]["image"])
    assert not np.array_equal(b0[0]["image"], b1[0]["image"])

    # two processes each take half the global batch, covering disjoint data
    l0 = EpochLoader(ds, batch_size=4, seed=7, process_index=0, process_count=2)
    l1 = EpochLoader(ds, batch_size=4, seed=7, process_index=1, process_count=2)
    s0, s1 = next(iter(l0.epoch(0))), next(iter(l1.epoch(0)))
    assert s0["image"].shape[0] == s1["image"].shape[0] == 2
    assert not np.array_equal(s0["image"], s1["image"])


def test_registry_aliases():
    mod = resolve_dataset_module("datasets.synthetic")
    assert mod.get_num_classes() == 2
    mod2 = resolve_dataset_module("ccdm_tpu.data.synthetic")
    assert mod2 is mod
    with pytest.raises(ModuleNotFoundError):
        resolve_dataset_module("datasets.nonexistent")


# ---- transforms -----------------------------------------------------------

def test_flip_and_resize():
    rng = np.random.default_rng(0)
    img = np.arange(24, dtype=np.float32).reshape(4, 6, 1)
    lbl = np.arange(24).reshape(4, 6) % 3
    out_img, out_lbl, _ = flip(probability=(1.0, 1.0))(img, lbl, rng, None)
    np.testing.assert_array_equal(out_img, img[::-1, ::-1])
    np.testing.assert_array_equal(out_lbl, lbl[::-1, ::-1])

    r_img, r_lbl, _ = resize(target_size=(8, 12), ignore_class=2)(img, lbl, rng, None)
    assert r_img.shape == (8, 12, 1)
    assert r_lbl.shape == (8, 12)
    assert set(np.unique(r_lbl)).issubset({0, 1, 2})  # NEAREST keeps label ids


def test_resize_fit_stride_pads_with_ignore():
    rng = np.random.default_rng(0)
    img = np.zeros((5, 7, 3), np.uint8)
    lbl = np.zeros((5, 7), np.int64)
    out_img, out_lbl, _ = resize(target_size=(5, 7), fit_stride=4, ignore_class=9)(
        img, lbl, rng, None)
    assert out_img.shape == (8, 8, 3)
    assert out_lbl.shape == (8, 8)
    assert (out_lbl[5:, :] == 9).all() and (out_lbl[:, 7:] == 9).all()


def test_normalize_imagenet():
    rng = np.random.default_rng(0)
    img = np.full((2, 2, 3), 255, np.uint8)
    out, _, _ = normalize()(img, np.zeros((2, 2)), rng, None)
    expected = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0], expected, rtol=1e-5)


def test_color_jitter_label_untouched():
    rng = np.random.default_rng(0)
    img = (np.random.default_rng(1).random((8, 8, 3)) * 255).astype(np.uint8)
    lbl = np.arange(64).reshape(8, 8) % 5
    out_img, out_lbl, _ = color_jitter()(img, lbl, rng, None)
    np.testing.assert_array_equal(out_lbl, lbl)
    assert out_img.shape == img.shape


def test_build_transforms_factory():
    pipe = build_transforms(
        ["flip", "resize", "colorjitter", "torchvision_normalise"],
        {"target_size": [16, 32]},
        num_classes=20,
    )
    rng = np.random.default_rng(0)
    img = (np.random.default_rng(2).random((33, 65, 3)) * 255).astype(np.uint8)
    lbl = (np.random.default_rng(3).integers(0, 20, (33, 65))).astype(np.int64)
    out_img, out_lbl, _ = pipe(img, lbl, rng, None)
    assert out_img.shape == (16, 32, 3)
    assert out_lbl.shape == (16, 32)
    assert out_img.dtype == np.float32
    with pytest.raises(ValueError):
        build_transforms(["unknown"], {}, 20)


# ---- cityscapes label maps --------------------------------------------------

def test_cityscapes_label_maps():
    assert cl.NUM_TRAIN_CLASSES == 20
    # road id=7 -> train 0; car id=26 -> train 13; void ids -> 19
    assert cl.encode_target(np.array([7]))[0] == 0
    assert cl.encode_target(np.array([26]))[0] == 13
    assert cl.encode_target(np.array([0]))[0] == 19
    assert cl.encode_target(np.array([4]))[0] == 19
    # round trip for the 19 eval classes
    train_ids = np.arange(19)
    ids = cl.map_train_id_to_id(train_ids)
    np.testing.assert_array_equal(cl.encode_target(ids), train_ids)
    # colors: road purple-ish, ignore black
    np.testing.assert_array_equal(cl.decode_target_to_color(np.array([0])), [[128, 64, 128]])
    np.testing.assert_array_equal(cl.decode_target_to_color(np.array([19])), [[0, 0, 0]])
    np.testing.assert_array_equal(cl.decode_target_to_color(np.array([255])), [[0, 0, 0]])


def test_cityscapes_weights():
    from ccdm_tpu.data.cityscapes import get_weights

    w = get_weights()
    assert w.shape == (20,)
    assert w[19] == 0.0 and w[:19].min() == 1.0


def test_random_scale_and_pad():
    from ccdm_tpu.data.transforms import pad, random_scale

    rng = np.random.default_rng(0)
    img = np.zeros((20, 30, 3), np.uint8)
    lbl = np.zeros((20, 30), np.int64)
    # probability 1: always rescales; target_size pads back up to (32, 40)
    out_img, out_lbl, _ = random_scale(
        scale_range=(0.5, 0.6), probability=1.0, target_size=(32, 40),
        ignore_class=7)(img, lbl, rng, None)
    assert out_img.shape[0] >= 10 and out_lbl.shape == out_img.shape[:2]
    # scaled below target then padded back up -> padded label areas = ignore
    assert out_lbl.shape == (32, 40)
    assert (out_lbl == 7).any()

    p_img, p_lbl, _ = pad(target_size=(25, 35), ignore_class=9)(img, lbl, rng, None)
    assert p_img.shape == (25, 35, 3) and p_lbl.shape == (25, 35)
    assert (p_lbl == 9).sum() == 25 * 35 - 20 * 30


def test_random_crop_class_ratio_constraint():
    from ccdm_tpu.data.transforms import random_crop

    rng = np.random.default_rng(0)
    # left half class 0, right half class 1; a 8x8 crop satisfying
    # max_ratio<0.9 must straddle the boundary
    lbl = np.zeros((16, 32), np.int64)
    lbl[:, 16:] = 1
    img = np.zeros((16, 32, 1), np.float32)
    out_img, out_lbl, _ = random_crop(
        shape=(8, 8), crop_class_max_ratio=0.9, ignore_class=5)(img, lbl, rng, None)
    assert out_lbl.shape == (8, 8)
    classes, counts = np.unique(out_lbl, return_counts=True)
    assert len(classes) == 2 and counts.max() / counts.sum() < 0.9


def test_epoch_loader_worker_count_invariance():
    """mp_loaders parity: the data stream is bit-identical for any worker
    count (per-sample rng keyed by (seed, epoch, index))."""
    ds = synthetic_training_dataset(n=17, resolution=32)
    serial = list(EpochLoader(ds, batch_size=4, seed=7).epoch(3))
    threaded = list(EpochLoader(ds, batch_size=4, seed=7, num_workers=3).epoch(3))
    assert len(serial) == len(threaded)
    for a, b in zip(serial, threaded):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])


def test_color_jitter_preserves_uint8():
    from ccdm_tpu.data.transforms import color_jitter

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
    out, _, _ = color_jitter()(img, np.zeros((8, 8), np.int64), rng)
    assert out.dtype == np.uint8
    fl, _, _ = color_jitter()(img.astype(np.float32) / 255.0,
                              np.zeros((8, 8), np.int64), rng)
    assert fl.dtype == np.float32
