"""Native C++ scoring kernels vs NumPy oracles."""

import numpy as np

from ccdm_tpu import native


def test_native_builds_and_loads():
    assert native.native_available(), "g++ build of libccdm_native.so failed"


def test_confusion_matrix_matches_numpy(rng):
    gt = rng.integers(0, 34, size=(64, 64)).astype(np.uint8)
    pred = rng.integers(0, 34, size=(64, 64)).astype(np.uint8)
    cm = native.add_to_confusion_matrix(gt, pred, 256)
    expected = np.bincount(
        gt.astype(np.int64).ravel() * 256 + pred.ravel(), minlength=256 * 256
    ).reshape(256, 256)
    np.testing.assert_array_equal(cm, expected)
    # accumulation into an existing matrix
    cm2 = native.add_to_confusion_matrix(gt, pred, 256, cm)
    np.testing.assert_array_equal(cm2, 2 * expected)


def test_confusion_matrix_i32_path(rng):
    gt = rng.integers(0, 20, size=(32, 32)).astype(np.int32)
    pred = rng.integers(0, 20, size=(32, 32)).astype(np.int32)
    cm = native.add_to_confusion_matrix(gt, pred, 20)
    assert cm.sum() == 32 * 32
    np.testing.assert_array_equal(
        cm, np.bincount(gt.astype(np.int64).ravel() * 20 + pred.ravel(),
                        minlength=400).reshape(20, 20))


def test_pairwise_intersection_union(rng):
    x = rng.integers(0, 3, size=(4, 100)).astype(np.uint8)
    y = rng.integers(0, 3, size=(5, 100)).astype(np.uint8)
    inter, union = native.pairwise_intersection_union(x, y, 3)
    xb = np.eye(3, dtype=bool)[x]
    yb = np.eye(3, dtype=bool)[y]
    np.testing.assert_array_equal(inter, (xb[:, None] & yb[None]).sum(2))
    np.testing.assert_array_equal(union, (xb[:, None] | yb[None]).sum(2))
