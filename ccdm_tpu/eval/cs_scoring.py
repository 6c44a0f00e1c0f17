"""Official-protocol Cityscapes scoring of label-id PNGs.

Re-implements the scoring path the reference vendors from
`cityscapesscripts` (`evaluation/cs_eval.py:579+` `evaluateImgLists` /
`evaluatePair`): a confusion matrix over *label ids* accumulated across
(prediction, ground-truth) PNG pairs, reduced to per-class IoU over the 19
eval classes, per-category IoU, and pixel accuracy, exported as JSON.

The reference's optional Cython `addToConfusionMatrix` fast path
(`cs_eval.py:15-21`) — its only native-code dependency — is replaced by a
vectorised `np.bincount` over `gt * 256 + pred` codes, which is equally
O(pixels) and allocation-free. Instance-weighted iIoU requires
`*_instanceIds.png` annotations and is reported as None when absent
(the CCDM pipeline scores semantic PNGs only).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ccdm_tpu.data.cityscapes_labels import LABELS

LOGGER = logging.getLogger(__name__)

MAX_ID = 256  # label ids fit in uint8

EVAL_LABELS = [l for l in LABELS if not l.ignore_in_eval and l.id >= 0]
CATEGORIES = sorted({l.category for l in EVAL_LABELS})


def confusion_matrix_from_pairs(
    pairs: Sequence[Tuple[str, str]],
) -> np.ndarray:
    """Accumulate a [256, 256] (gt, pred) confusion matrix over PNG pairs.

    Uses the native C++ kernel when available (ccdm_tpu.native), mirroring
    the reference's optional Cython fast path (`cs_eval.py:15-21`)."""
    from ccdm_tpu.native import add_to_confusion_matrix

    cm = np.zeros((MAX_ID, MAX_ID), dtype=np.int64)
    for pred_path, gt_path in pairs:
        pred = np.asarray(Image.open(pred_path), dtype=np.uint8)
        gt = np.asarray(Image.open(gt_path), dtype=np.uint8)
        if pred.shape != gt.shape:
            raise ValueError(
                f"shape mismatch {pred.shape} vs {gt.shape}: {pred_path} / {gt_path}")
        add_to_confusion_matrix(gt, pred, MAX_ID, cm)
    return cm


def _iou_for_ids(cm: np.ndarray, ids: List[int], all_eval_ids: List[int]) -> float:
    """IoU of the union-of-ids 'class' against everything else, official
    semantics: FP counts only pixels whose gt is an *evaluated* class."""
    ids = list(ids)
    tp = float(cm[np.ix_(ids, ids)].sum())
    fn = float(cm[ids, :].sum() - tp)
    gt_eval_rows = np.zeros(MAX_ID, dtype=bool)
    gt_eval_rows[all_eval_ids] = True
    fp = float(cm[np.ix_(gt_eval_rows, ids)].sum() - tp)
    denom = tp + fp + fn
    return tp / denom if denom > 0 else float("nan")


def score_img_lists(
    pred_list: Sequence[str],
    gt_list: Sequence[str],
    export_file: Optional[str] = None,
) -> Dict:
    """Score prediction PNGs (label-id space) against gtFine labelIds PNGs.

    Returns the official-shaped result dict: per-class IoU, mean IoU,
    per-category IoU, mean category IoU, pixel accuracy.
    Parity: `evaluateImgLists` (`cs_eval.py:579+`) + JSON export
    (`eval_cdm.py:424-432`).
    """
    assert len(pred_list) == len(gt_list)
    cm = confusion_matrix_from_pairs(list(zip(pred_list, gt_list)))

    eval_ids = [l.id for l in EVAL_LABELS]
    class_scores = {l.name: _iou_for_ids(cm, [l.id], eval_ids) for l in EVAL_LABELS}
    category_scores = {
        cat: _iou_for_ids(cm, [l.id for l in EVAL_LABELS if l.category == cat], eval_ids)
        for cat in CATEGORIES
    }
    valid = [v for v in class_scores.values() if not np.isnan(v)]
    valid_cat = [v for v in category_scores.values() if not np.isnan(v)]

    eval_rows = cm[eval_ids, :]
    tp_total = float(cm[eval_ids, eval_ids].sum())
    px_total = float(eval_rows.sum())

    results = {
        "classScores": class_scores,
        "averageScoreClasses": float(np.mean(valid)) if valid else float("nan"),
        "categoryScores": category_scores,
        "averageScoreCategories": float(np.mean(valid_cat)) if valid_cat else float("nan"),
        "pixelAccuracy": tp_total / px_total if px_total else float("nan"),
        "averageScoreInstClasses": None,  # needs *_instanceIds annotations
        "nbImages": len(pred_list),
    }
    if export_file:
        os.makedirs(os.path.dirname(export_file) or ".", exist_ok=True)
        with open(export_file, "w") as f:
            json.dump(results, f, indent=2)
        LOGGER.info("wrote results to %s", export_file)
    return results
