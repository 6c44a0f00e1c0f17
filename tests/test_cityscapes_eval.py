"""Cityscapes scoring + inference harness tests on a fake mini-dataset."""

import os

import numpy as np
import pytest
from PIL import Image

from ccdm_tpu.eval.cs_scoring import score_img_lists


def _save(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr.astype(np.uint8)).save(path)


def test_score_img_lists_golden(tmp_path):
    # gt: left half road (id 7), right half car (id 26)
    gt = np.full((16, 16), 7, np.uint8)
    gt[:, 8:] = 26
    # pred: road correct; car half-correct (top rows car, bottom rows road)
    pred = np.full((16, 16), 7, np.uint8)
    pred[:8, 8:] = 26
    gt_p = str(tmp_path / "gt.png")
    pr_p = str(tmp_path / "pred.png")
    _save(gt_p, gt)
    _save(pr_p, pred)
    res = score_img_lists([pr_p], [gt_p], export_file=str(tmp_path / "res.json"))
    # car: tp=64, fn=64, fp=0 -> 0.5 ; road: tp=128, fn=0, fp=64 -> 128/192
    np.testing.assert_allclose(res["classScores"]["car"], 0.5, atol=1e-6)
    np.testing.assert_allclose(res["classScores"]["road"], 128 / 192, atol=1e-6)
    assert np.isnan(res["classScores"]["person"])  # absent class
    # categories: flat = road ids {7,8}: tp=128, fp=64 -> 2/3 ; vehicle -> 0.5
    np.testing.assert_allclose(res["categoryScores"]["flat"], 128 / 192, atol=1e-6)
    np.testing.assert_allclose(res["pixelAccuracy"], (128 + 64) / 256, atol=1e-6)
    assert os.path.exists(tmp_path / "res.json")


def test_score_ignores_void_gt(tmp_path):
    # gt all unlabeled (id 0, ignored): no evaluated pixels -> NaN scores
    gt = np.zeros((8, 8), np.uint8)
    pred = np.full((8, 8), 7, np.uint8)
    gt_p, pr_p = str(tmp_path / "g.png"), str(tmp_path / "p.png")
    _save(gt_p, gt)
    _save(pr_p, pred)
    res = score_img_lists([pr_p], [gt_p])
    assert np.isnan(res["averageScoreClasses"])


@pytest.fixture
def fake_cityscapes(tmp_path, cityscapes_tree_factory):
    """Minimal leftImg8bit/gtFine tree: 2 val images, 64x128, instanceIds."""
    return cityscapes_tree_factory(tmp_path, splits={"val": 2},
                                   instance_ids=True)


def test_run_inference_smoke(fake_cityscapes, tmp_path, monkeypatch):
    monkeypatch.setenv("CCDM_CITYSCAPES_PATH", fake_cityscapes)
    from ccdm_tpu.eval.cityscapes_eval import run_inference

    params = {
        "output_path": str(tmp_path / "eval_out"),
        "dataset_file": "ccdm_tpu.data.cityscapes",
        "dataset_val_max_size": 2,
        "batch_size": 2,
        "time_steps": 3,
        "beta_schedule": "cosine",
        "compute_dtype": "float32",
        "evaluation": {"resolution": "dataloader", "evaluations": 2,
                       "evaluation_vote_strategy": "confidence"},
        "dataset_pipeline_val": ["resize", "torchvision_normalise"],
        "dataset_pipeline_val_settings": {"target_size": [32, 64]},
        "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                        "attention_resolutions": [4], "num_head_channels": 4},
    }
    res = run_inference(params)
    assert res["images"] == 2
    assert 0.0 <= res["mIoU"] <= 1.0 or np.isnan(res["mIoU"])
    assert "averageScoreClasses" in res["official"]
    out = tmp_path / "eval_out"
    assert (out / "resultPixelLevelSemanticLabeling.json").exists()
    assert len(list((out / "submit").glob("*.png"))) == 2
    assert len(list((out / "color").glob("*.png"))) == 2


def test_run_inference_original_resolution(fake_cityscapes, tmp_path, monkeypatch):
    """eval_resolution 'original': predictions upsampled to gt resolution
    (eval_cdm.py:221-226 parity)."""
    monkeypatch.setenv("CCDM_CITYSCAPES_PATH", fake_cityscapes)
    from PIL import Image

    from ccdm_tpu.eval.cityscapes_eval import run_inference

    params = {
        "output_path": str(tmp_path / "eval_orig"),
        "dataset_file": "ccdm_tpu.data.cityscapes",
        "dataset_val_max_size": 2,
        "batch_size": 2,
        "time_steps": 2,
        "beta_schedule": "cosine",
        "compute_dtype": "float32",
        "evaluation": {"resolution": "original", "evaluations": 1,
                       "evaluation_vote_strategy": "confidence"},
        "dataset_pipeline_val": ["resize", "torchvision_normalise"],
        "dataset_pipeline_val_settings": {"target_size": [32, 64],
                                          "return_original_labels": True},
        "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                        "attention_resolutions": [4], "num_head_channels": 4},
    }
    res = run_inference(params)
    assert res["images"] == 2
    # dumped PNGs are at the ORIGINAL 64x128 resolution
    png = next((tmp_path / "eval_orig" / "submit").glob("*.png"))
    assert Image.open(png).size == (128, 64)
    # original resolution -> instanceIds found -> iIoU computed
    assert res["official"]["nbInstanceImages"] == 2
    assert res["official"]["classInstScores"] is not None
    assert "car" in res["official"]["classInstScores"]


def test_score_instance_iiou_golden(tmp_path):
    """Instance-weighted iIoU (cs_eval.py:725-762,377-396): weighted tp/fn
    from per-instance masks, unweighted fp from the confusion matrix."""
    from ccdm_tpu.eval.cs_scoring import AVG_CLASS_SIZE

    # gt: one 16-px person instance (id 24, instance 24001) on a road scene
    gt = np.full((16, 16), 7, np.uint8)
    gt[0:4, 0:4] = 24
    inst = gt.astype(np.int32).copy()  # crowd/stuff ids == label id (<=1000)
    inst[0:4, 0:4] = 24001
    # pred: 12 of the 16 person px correct; 2 road px mislabelled person
    pred = np.full((16, 16), 7, np.uint8)
    pred[0:4, 0:3] = 24
    pred[10, 0:2] = 24
    gt_p = str(tmp_path / "x_gtFine_labelIds.png")
    pr_p = str(tmp_path / "x_pred_labelIds.png")
    _save(gt_p, gt)
    _save(pr_p, pred)
    # default path derivation: labelIds -> instanceIds (cs_eval.py:686)
    Image.fromarray(inst.astype(np.uint16)).save(tmp_path / "x_gtFine_instanceIds.png")

    res = score_img_lists([pr_p], [gt_p])
    w = AVG_CLASS_SIZE["person"] / 16.0
    expect = 12 * w / (12 * w + 4 * w + 2)
    np.testing.assert_allclose(res["classInstScores"]["person"], expect, rtol=1e-9)
    # category "human" = {person, rider}: same masks here
    np.testing.assert_allclose(res["categoryInstScores"]["human"], expect, rtol=1e-9)
    assert np.isnan(res["classInstScores"]["car"])  # instance class, absent
    assert np.isnan(res["classInstScores"]["road"])  # stuff class: no iIoU
    np.testing.assert_allclose(res["averageScoreInstClasses"], expect, rtol=1e-9)
    assert res["nbInstanceImages"] == 1


def test_score_without_instance_files_reports_none(tmp_path):
    gt = np.full((8, 8), 7, np.uint8)
    pr_p, gt_p = str(tmp_path / "p.png"), str(tmp_path / "g.png")
    _save(gt_p, gt)
    _save(pr_p, gt)
    res = score_img_lists([pr_p], [gt_p])
    assert res["averageScoreInstClasses"] is None
    assert res["classInstScores"] is None
