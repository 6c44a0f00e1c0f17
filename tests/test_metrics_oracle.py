"""GED / HM-IoU parity: our metrics vs the reference's own functions
executed as an oracle (`/root/reference/ddpm/utils.py:129-175`).

The module is loaded with a stub for its torchvision import (unused by the
metric functions); the lcm-repeat alignment for HM-IoU replicates the
reference caller (`evaluate_lidc_uncertainty.py:115-123`).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from ccdm_tpu.eval.metrics import generalised_energy_distance, hungarian_matched_iou

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted")


def _load_reference_utils():
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvt.ToPILImage = object  # unused by the metric functions
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tvt)
    spec = importlib.util.spec_from_file_location(
        "_ref_ddpm_utils", os.path.join(REFERENCE, "ddpm", "utils.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ged_and_hmiou_match_reference_oracle():
    ref = _load_reference_utils()
    rng = np.random.default_rng(0)
    C = 3
    B, S, A, H, W = 4, 6, 4, 12, 10
    # correlated samples/references so IoUs span (0, 1); include an all-zero
    # (empty-mask) reference to hit the NaN->1 convention (utils.py:131)
    base = rng.integers(0, C, (B, 1, H, W))
    samples = np.where(rng.random((B, S, H, W)) < 0.8, base, rng.integers(0, C, (B, S, H, W)))
    refs = np.where(rng.random((B, A, H, W)) < 0.8, base, rng.integers(0, C, (B, A, H, W)))
    refs[0, 1] = 0  # one expert sees nothing
    samples[0, 2] = 0  # one sample predicts nothing

    ged, div_s, div_r = generalised_energy_distance(
        np.asarray(samples), np.asarray(refs), C)
    ref_ged, ref_div_s, ref_div_r = ref.calc_batched_generalised_energy_distance(
        samples, refs, C)
    np.testing.assert_allclose(ged, ref_ged, atol=1e-6)
    np.testing.assert_allclose(div_s, ref_div_s, atol=1e-6)
    np.testing.assert_allclose(div_r, ref_div_r, atol=1e-6)

    # HM-IoU: the reference caller repeats both sets to lcm(S, A) first
    m = np.lcm(S, A)
    rep_samples = np.repeat(samples, m // S, axis=1)
    rep_refs = np.repeat(refs, m // A, axis=1)
    ref_hm = np.asarray(ref.batched_hungarian_matching(rep_samples, rep_refs, C))
    ours_hm = hungarian_matched_iou(np.asarray(samples), np.asarray(refs), C)
    np.testing.assert_allclose(ours_hm, ref_hm, atol=1e-6)
