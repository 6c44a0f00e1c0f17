"""Distributional segmentation metrics: GED, HM-IoU, mIoU, Dice.

Semantics parity with `ddpm/utils.py:129-175` (duplicated in
`evaluation/evaluate_lidc_uncertainty.py:27-73`):

- one-hot IoU per class with the NaN -> 1 convention for empty unions
  (`utils.py:129-132`)
- pairwise distance `1 - mean_{c>=1} IoU_c` — class 0 (background) excluded
  (`utils.py:136-142`)
- `GED^2 = 2 E[d(S,Y)] - E[d(S,S')] - E[d(Y,Y')]` (`utils.py:145-157`),
  returning per-image values plus both diversities
- HM-IoU: Hungarian assignment on the pairwise distance matrix after
  repeating both sample sets to lcm length (`utils.py:160-175`,
  `evaluate_lidc_uncertainty.py:115-123`), score = mean matched `1 - d`

TPU-first layout: the O(B*S*S'*C*HW) pairwise intersections/unions are batched
`jnp.einsum` contractions over one-hot floats (MXU work, jit-able, runs where
the samples already live); only the tiny `S x S'` Hungarian assignment runs on
host (scipy). A ConfusionMatrix accumulator replaces ignite's
`ConfusionMatrix -> IoU/mIoU/DiceCoefficient` metrics (`ddpm/trainer.py:398-407`,
`evaluate_lidc_uncertainty.py:145-154`).
"""

from __future__ import annotations

from math import lcm
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _one_hot_flat(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """[B,S,H,W] int -> [B,S,HW,C] float32 one-hot."""
    b, s = labels.shape[:2]
    flat = labels.reshape(b, s, -1)
    return jax.nn.one_hot(flat, num_classes, dtype=jnp.float32)


def pairwise_class_distance(x: jnp.ndarray, y: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """`1 - mean_{c>=1} IoU_c` for every sample pair.

    x: [B,Sx,H,W] int class maps; y: [B,Sy,H,W]. Returns [B,Sx,Sy] float32.
    Empty-union classes count as IoU 1 (`utils.py:131`).
    """
    xh = _one_hot_flat(x, num_classes)
    yh = _one_hot_flat(y, num_classes)
    inter = jnp.einsum("bspc,btpc->bstc", xh, yh)
    sum_x = jnp.sum(xh, axis=2)[:, :, None, :]
    sum_y = jnp.sum(yh, axis=2)[:, None, :, :]
    union = sum_x + sum_y - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1.0), 1.0)
    return 1.0 - jnp.mean(iou[..., 1:], axis=-1)


@jax.jit
def _ged_terms(d_cross, d_xx, d_yy):
    cross = jnp.mean(d_cross, axis=(1, 2))
    div_x = jnp.mean(d_xx, axis=(1, 2))
    div_y = jnp.mean(d_yy, axis=(1, 2))
    return 2 * cross - div_x - div_y, div_x, div_y


def generalised_energy_distance(
    samples: jnp.ndarray, references: jnp.ndarray, num_classes: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-image (GED, sample diversity, reference diversity).

    samples: [B,S,H,W] int; references: [B,A,H,W] int (e.g. 4 expert masks).
    Parity: `calc_batched_generalised_energy_distance` (`utils.py:145-157`).
    """
    d_cross = pairwise_class_distance(samples, references, num_classes)
    d_ss = pairwise_class_distance(samples, samples, num_classes)
    d_rr = pairwise_class_distance(references, references, num_classes)
    ged, div_s, div_r = _ged_terms(d_cross, d_ss, d_rr)
    return np.asarray(ged), np.asarray(div_s), np.asarray(div_r)


def hungarian_matched_iou(
    samples: jnp.ndarray, references: jnp.ndarray, num_classes: int
) -> np.ndarray:
    """Per-image HM-IoU (parity: `batched_hungarian_matching`, `utils.py:160-175`).

    Both sets are repeated to `lcm(S, A)` so the assignment is square
    (`evaluate_lidc_uncertainty.py:115-123` protocol). Cost matrices are tiny;
    scipy's `linear_sum_assignment` runs on host.
    """
    from scipy.optimize import linear_sum_assignment

    s, a = samples.shape[1], references.shape[1]
    m = lcm(s, a)
    samples_r = jnp.repeat(samples, m // s, axis=1)
    refs_r = jnp.repeat(references, m // a, axis=1)
    cost = np.asarray(pairwise_class_distance(samples_r, refs_r, num_classes))
    scores = np.empty((cost.shape[0],), dtype=np.float64)
    for i in range(cost.shape[0]):
        rows, cols = linear_sum_assignment(cost[i])
        scores[i] = (1.0 - cost[i])[rows, cols].mean()
    return scores


from functools import partial


@partial(jax.jit, static_argnums=2)
def _cm_bincount(pred: jnp.ndarray, true: jnp.ndarray, num_classes: int):
    idx = true.reshape(-1) * num_classes + pred.reshape(-1)
    return jnp.bincount(idx, length=num_classes * num_classes)


class ConfusionMatrix:
    """Streaming confusion matrix with IoU/mIoU/Dice/accuracy readouts.

    Replaces ignite `ConfusionMatrix + IoU/mIoU/DiceCoefficient`
    (`trainer.py:398-407`, `evaluate_lidc_uncertainty.py:145-154`). Updates
    run as a jitted bincount on device; the matrix accumulates on host.
    """

    def __init__(self, num_classes: int, ignore_class: Optional[int] = None):
        self.num_classes = num_classes
        self.ignore_class = ignore_class
        self.matrix = np.zeros((num_classes, num_classes), dtype=np.int64)

    def update(self, pred, true):
        """pred/true: integer class maps of identical shape."""
        counts = _cm_bincount(jnp.asarray(pred), jnp.asarray(true), self.num_classes)
        self.matrix += np.asarray(counts).reshape(self.num_classes, self.num_classes)

    def _select(self, values: np.ndarray) -> np.ndarray:
        if self.ignore_class is None:
            return values
        return np.delete(values, self.ignore_class)

    def iou(self) -> np.ndarray:
        diag = np.diag(self.matrix).astype(np.float64)
        rows = self.matrix.sum(1).astype(np.float64)
        cols = self.matrix.sum(0).astype(np.float64)
        denom = rows + cols - diag
        with np.errstate(invalid="ignore", divide="ignore"):
            iou = np.where(denom > 0, diag / denom, np.nan)
        return self._select(iou)

    def miou(self) -> float:
        return float(np.nanmean(self.iou()))

    def dice(self) -> np.ndarray:
        diag = np.diag(self.matrix).astype(np.float64)
        denom = self.matrix.sum(1) + self.matrix.sum(0)
        with np.errstate(invalid="ignore", divide="ignore"):
            dice = np.where(denom > 0, 2 * diag / denom, np.nan)
        return self._select(dice)

    def accuracy(self) -> float:
        return float(np.diag(self.matrix).sum() / max(self.matrix.sum(), 1))

    def reset(self):
        self.matrix[:] = 0
