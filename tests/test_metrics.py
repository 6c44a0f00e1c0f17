"""Metric tests, incl. a NumPy oracle replicating the reference's GED math
(ddpm/utils.py:129-175) from its published formulas."""

import numpy as np

from ccdm_tpu.eval.metrics import (
    ConfusionMatrix,
    generalised_energy_distance,
    hungarian_matched_iou,
    pairwise_class_distance,
)


# ---- NumPy oracle ----------------------------------------------------------

def oracle_distance(x, y, num_classes):
    """x: [B,Sx,P] ints, y: [B,Sy,P] -> [B,Sx,Sy]; IoU NaN->1, skip class 0."""
    eye = np.eye(num_classes, dtype=bool)
    xb = eye[x]  # [B,Sx,P,C]
    yb = eye[y]
    inter = (xb[:, :, None] & yb[:, None]).sum(-2).astype(float)
    union = (xb[:, :, None] | yb[:, None]).sum(-2).astype(float)
    with np.errstate(invalid="ignore"):
        iou = inter / union
    iou[np.isnan(iou)] = 1.0
    return 1 - iou[..., 1:].mean(-1)


def oracle_ged(s, y, num_classes):
    cross = oracle_distance(s, y, num_classes).mean((1, 2))
    d0 = oracle_distance(s, s, num_classes).mean((1, 2))
    d1 = oracle_distance(y, y, num_classes).mean((1, 2))
    return 2 * cross - d0 - d1, d0, d1


def rand_maps(rng, b, s, h, w, c):
    return rng.integers(0, c, size=(b, s, h, w))


def test_pairwise_distance_matches_oracle(rng):
    b, h, w, c = 2, 8, 8, 3
    x = rand_maps(rng, b, 4, h, w, c)
    y = rand_maps(rng, b, 3, h, w, c)
    ours = np.asarray(pairwise_class_distance(x, y, c))
    ref = oracle_distance(x.reshape(b, 4, -1), y.reshape(b, 3, -1), c)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_distance_empty_masks_nan_to_one(rng):
    # both all-background: per-class IoU for class 1 is NaN -> 1 -> distance 0
    x = np.zeros((1, 2, 4, 4), dtype=int)
    d = np.asarray(pairwise_class_distance(x, x, 2))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_ged_identical_sets_equals_zero(rng):
    s = rand_maps(rng, 2, 4, 8, 8, 2)
    ged, div_s, div_r = generalised_energy_distance(s, s, 2)
    np.testing.assert_allclose(ged, 0.0, atol=1e-5)
    np.testing.assert_allclose(div_s, div_r, atol=1e-6)


def test_ged_matches_oracle(rng):
    b, h, w, c = 3, 8, 8, 2
    s = rand_maps(rng, b, 5, h, w, c)
    y = rand_maps(rng, b, 4, h, w, c)
    ged, div_s, div_y = generalised_energy_distance(s, y, c)
    oged, od0, od1 = oracle_ged(s.reshape(b, 5, -1), y.reshape(b, 4, -1), c)
    np.testing.assert_allclose(ged, oged, atol=1e-5)
    np.testing.assert_allclose(div_s, od0, atol=1e-5)
    np.testing.assert_allclose(div_y, od1, atol=1e-5)


def test_hmiou_permuted_identical_sets_is_one(rng):
    s = rand_maps(rng, 2, 4, 8, 8, 2)
    perm = s[:, [2, 0, 3, 1]]
    scores = hungarian_matched_iou(s, perm, 2)
    np.testing.assert_allclose(scores, 1.0, atol=1e-6)


def test_hmiou_lcm_alignment(rng):
    s = rand_maps(rng, 1, 6, 8, 8, 2)  # 6 samples vs 4 refs -> lcm 12
    y = rand_maps(rng, 1, 4, 8, 8, 2)
    scores = hungarian_matched_iou(s, y, 2)
    assert scores.shape == (1,)
    assert 0.0 <= scores[0] <= 1.0


def test_confusion_matrix_metrics():
    cm = ConfusionMatrix(num_classes=3, ignore_class=2)
    pred = np.array([[0, 0, 1, 1, 2, 2]])
    true = np.array([[0, 1, 1, 1, 2, 0]])
    cm.update(pred, true)
    m = cm.matrix
    assert m[0, 0] == 1 and m[1, 0] == 1 and m[1, 1] == 2 and m[2, 2] == 1 and m[0, 2] == 1
    iou = cm.iou()
    assert iou.shape == (2,)  # ignore class removed
    # class0: inter 1, union 1(pred0) + 2(true0) - 1 = wait: rows=true, cols=pred
    # true0 count 2, pred0 count 2, diag 1 -> iou = 1/3
    np.testing.assert_allclose(iou[0], 1 / 3, rtol=1e-6)
    # class1: diag 2, true1=3, pred1=2 -> 2/3
    np.testing.assert_allclose(iou[1], 2 / 3, rtol=1e-6)
    np.testing.assert_allclose(cm.miou(), 0.5, rtol=1e-6)
    dice = cm.dice()
    np.testing.assert_allclose(dice[0], 2 * 1 / (2 + 2), rtol=1e-6)
    cm.reset()
    assert cm.matrix.sum() == 0
