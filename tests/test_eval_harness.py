"""Eval-harness tests on synthetic data with a tiny model."""

import pytest


@pytest.fixture(scope="module")
def tiny_synthetic():
    import ccdm_tpu.data.synthetic as syn

    orig = syn.test_dataset
    syn.test_dataset = lambda max_size=None, indices=None: syn.synthetic_test_dataset(
        n=4, resolution=32)
    yield
    syn.test_dataset = orig


EVAL_PARAMS = {
    "dataset_file": "ccdm_tpu.data.synthetic",
    "dataset_val_max_size": 4,
    "batch_size": 2,
    "evaluations": [1, 2],
    "evaluation_vote_strategy": "confidence",
    "time_steps": 4,
    "beta_schedule": "cosine",
    "compute_dtype": "float32",
    "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                    "attention_resolutions": [4], "num_head_channels": 4},
}


def test_eval_lidc_uncertainty_smoke(tiny_synthetic):
    from ccdm_tpu.eval.lidc_uncertainty import eval_lidc_uncertainty

    res = eval_lidc_uncertainty(dict(EVAL_PARAMS))
    assert res["count"] == 4
    for s in (1, 2):
        assert 0.0 <= res[f"GED_{s}"] <= 2.0
        assert 0.0 <= res[f"HMIoU_{s}"] <= 1.0
    assert 0.0 <= res["mIoU"] <= 1.0
    assert res["samples_per_sec"] > 0
    assert len(res["IoU"]) == 2 and len(res["Dice"]) == 2


def test_eval_sampling_speed_sweep(tiny_synthetic):
    from ccdm_tpu.eval.lidc_sampling_speed import eval_lidc_sampling_speed

    res = eval_lidc_sampling_speed(dict(EVAL_PARAMS), step_sweep=[4, 2])
    assert set(res.keys()) == {4, 2}
    assert all("samples_per_sec" in r for r in res.values())


def test_eval_lidc_uncertainty_static_int8(tiny_synthetic):
    """`quantized_inference: static` auto-calibrates per-site activation
    scales and runs the whole harness through the baked-scale int8 sampler."""
    from ccdm_tpu.eval.lidc_uncertainty import eval_lidc_uncertainty
    from ccdm_tpu.ops import quant

    try:
        res = eval_lidc_uncertainty(dict(EVAL_PARAMS, quantized_inference="static"))
    finally:
        quant.set_static_scales(None)
    assert res["count"] == 4
    assert 0.0 <= res["GED_2"] <= 2.0
    assert all(0.0 <= d <= 1.0 for d in res["Dice"])


def test_eval_results_batch_size_invariant(tiny_synthetic):
    """Eval results are identical for ANY batch size: every (image, sample)
    draw is keyed by its global dataset position (make_prob_sampler
    `indices`), so batch composition — including the repeated-image tail
    padding at batch_size=3 over 4 images — cannot change them."""
    from ccdm_tpu.eval.lidc_uncertainty import eval_lidc_uncertainty

    runs = [eval_lidc_uncertainty(dict(EVAL_PARAMS, batch_size=bs))
            for bs in (1, 3, 4)]
    for other in runs[1:]:
        for k in ("GED_1", "GED_2", "HMIoU_2", "diversity_2", "mIoU",
                  "nonzero_fraction"):
            assert runs[0][k] == pytest.approx(other[k], rel=1e-6), k
