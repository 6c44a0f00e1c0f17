"""ctypes bindings for the native scoring kernels, with NumPy fallbacks.

Mirrors the reference's optional-Cython pattern (`cs_eval.py:15-21`): if the
shared library is absent it is built on first use (g++ is in the image); if
that fails, callers fall back to vectorised NumPy transparently.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

LOGGER = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libccdm_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
        except Exception as e:  # pragma: no cover - toolchain missing
            LOGGER.warning("native build failed (%s); using NumPy fallback", e)
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:  # pragma: no cover
        LOGGER.warning("native load failed (%s); using NumPy fallback", e)
        return None
    i64 = ctypes.c_int64
    p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.add_to_confusion_matrix.argtypes = [p_u8, p_u8, i64, i64, p_i64]
    lib.add_to_confusion_matrix_i32.argtypes = [p_i32, p_i32, i64, i64, p_i64]
    lib.pairwise_intersection_union.argtypes = [p_u8, p_u8, i64, i64, i64, i64, p_i64, p_i64]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def add_to_confusion_matrix(gt: np.ndarray, pred: np.ndarray, n_ids: int,
                            cm: Optional[np.ndarray] = None) -> np.ndarray:
    """Accumulate [gt, pred] counts into an [n_ids, n_ids] int64 matrix."""
    if cm is None:
        cm = np.zeros((n_ids, n_ids), dtype=np.int64)
    lib = _load()
    gt_flat = np.ascontiguousarray(gt).ravel()
    pred_flat = np.ascontiguousarray(pred).ravel()
    if lib is not None and gt_flat.dtype == pred_flat.dtype:
        if gt_flat.dtype == np.uint8:
            lib.add_to_confusion_matrix(gt_flat, pred_flat, gt_flat.size, n_ids, cm)
            return cm
        if gt_flat.dtype == np.int32:
            lib.add_to_confusion_matrix_i32(gt_flat, pred_flat, gt_flat.size, n_ids, cm)
            return cm
    # NumPy fallback (cs_eval.py's own fallback pattern)
    idx = gt_flat.astype(np.int64) * n_ids + pred_flat.astype(np.int64)
    cm += np.bincount(idx, minlength=n_ids * n_ids).reshape(n_ids, n_ids)
    return cm


def pairwise_intersection_union(
    x: np.ndarray, y: np.ndarray, n_classes: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-pair per-class intersection/union counts.

    x: [Sx, P] uint8 class maps, y: [Sy, P]. Returns ([Sx,Sy,C], [Sx,Sy,C]).
    """
    x = np.ascontiguousarray(x, dtype=np.uint8)
    y = np.ascontiguousarray(y, dtype=np.uint8)
    sx, p = x.shape
    sy = y.shape[0]
    lib = _load()
    if lib is not None:
        inter = np.zeros((sx, sy, n_classes), dtype=np.int64)
        union = np.zeros((sx, sy, n_classes), dtype=np.int64)
        lib.pairwise_intersection_union(x, y, sx, sy, p, n_classes,
                                        inter.reshape(-1), union.reshape(-1))
        return inter, union
    xb = np.eye(n_classes, dtype=bool)[x]  # [Sx,P,C]
    yb = np.eye(n_classes, dtype=bool)[y]
    inter = (xb[:, None] & yb[None]).sum(2).astype(np.int64)
    union = (xb[:, None] | yb[None]).sum(2).astype(np.int64)
    return inter, union
