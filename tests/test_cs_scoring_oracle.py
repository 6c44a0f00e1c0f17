"""Official-scorer parity: `cs_scoring.score_img_lists` vs the reference's
vendored `evaluation/cs_eval.py` executed as an oracle on the same PNGs.

The reference module imports `cityscapesscripts.helpers.{labels,annotation}`
at module level; those are stubbed with the reference's OWN vendored
`evaluation/labels.py` table (the import is the only dependency — the
scoring math is self-contained). Random label/instance images exercise
per-class IoU, category IoU, the NaN-skipping averages, and the
instance-weighted iIoU path (`cs_eval.py:725-762`).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest
from PIL import Image

from ccdm_tpu.eval.cs_scoring import score_img_lists

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted")


def _load_reference_cs_eval():
    spec = importlib.util.spec_from_file_location(
        "_ref_cs_labels", os.path.join(REFERENCE, "evaluation", "labels.py"))
    ref_labels = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_labels)

    pkg = types.ModuleType("cityscapesscripts")
    helpers = types.ModuleType("cityscapesscripts.helpers")
    lab = types.ModuleType("cityscapesscripts.helpers.labels")
    for name in ("labels", "name2label", "id2label", "trainId2label",
                 "category2labels"):
        setattr(lab, name, getattr(ref_labels, name))
    ann = types.ModuleType("cityscapesscripts.helpers.annotation")
    ann.Annotation = object  # unused by the scoring path
    sys.modules.setdefault("cityscapesscripts", pkg)
    sys.modules["cityscapesscripts.helpers"] = helpers
    sys.modules["cityscapesscripts.helpers.labels"] = lab
    sys.modules["cityscapesscripts.helpers.annotation"] = ann

    spec2 = importlib.util.spec_from_file_location(
        "_ref_cs_eval", os.path.join(REFERENCE, "evaluation", "cs_eval.py"))
    mod = importlib.util.module_from_spec(spec2)
    spec2.loader.exec_module(mod)
    mod.args.quiet = True
    mod.args.JSONOutput = False
    mod.args.colorized = False
    mod.args.bold = mod.args.nocol = ""
    return mod


def test_scoring_matches_reference_oracle(tmp_path):
    import torch

    rng = np.random.default_rng(0)
    # a spread of official ids: void/ignored (0, 1), flat (7, 8), human (24,
    # 25), vehicle (26, 27, 33), construction (11), nature (21), sky (23)
    ids = np.array([0, 1, 7, 8, 11, 21, 23, 24, 25, 26, 27, 33], np.uint8)

    pred_list, gt_list = [], []
    for i in range(3):
        gt = ids[rng.integers(0, len(ids), (24, 32))]
        pred = gt.copy()
        # corrupt ~30% of pixels to a random (possibly ignored) label
        mask = rng.random((24, 32)) < 0.3
        pred[mask] = ids[rng.integers(0, len(ids), int(mask.sum()))]

        # instances for every pixel of the hasInstances classes: person 24,
        # rider 25, car 26, truck 27, bicycle 33 -> ids labelId*1000 + k
        inst = gt.astype(np.int32).copy()
        for lbl in (24, 25, 26, 27, 33):
            where = gt == lbl
            if not where.any():
                continue
            # two instances per class per image, split by column parity
            cols = np.arange(32)[None, :].repeat(24, axis=0)
            inst[where] = lbl * 1000 + 1 + (cols[where] % 2)

        gt_p = str(tmp_path / f"img{i}_gtFine_labelIds.png")
        in_p = str(tmp_path / f"img{i}_gtFine_instanceIds.png")
        pr_p = str(tmp_path / f"img{i}_pred.png")
        Image.fromarray(gt).save(gt_p)
        Image.fromarray(inst.astype(np.uint16)).save(in_p)
        Image.fromarray(pred).save(pr_p)
        gt_list.append(gt_p)
        pred_list.append(pr_p)

    ours = score_img_lists(pred_list, gt_list)

    ref = _load_reference_cs_eval()
    theirs = ref.evaluateImgLists(pred_list, gt_list, ref.args,
                                  lambda x: torch.as_tensor(x))

    for key in ("classScores", "classInstScores", "categoryScores",
                "categoryInstScores"):
        # the reference also lists ignored-in-eval labels/categories — all
        # NaN by construction; we omit them, losing no information
        assert set(ours[key]) <= set(theirs[key]), key
        for name in theirs[key]:
            if name not in ours[key]:
                assert np.isnan(theirs[key][name]), f"{key}[{name}]"
                continue
            np.testing.assert_allclose(
                ours[key][name], theirs[key][name],
                atol=1e-9, equal_nan=True,
                err_msg=f"{key}[{name}]")
    for key in ("averageScoreClasses", "averageScoreInstClasses",
                "averageScoreCategories", "averageScoreInstCategories"):
        np.testing.assert_allclose(ours[key], theirs[key], atol=1e-9,
                                   equal_nan=True, err_msg=key)
