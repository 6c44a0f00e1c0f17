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

    res = eval_lidc_uncertainty(dict(EVAL_PARAMS, quantized_inference="static"))
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


def test_compute_ged_max_batches_topology_invariant(tiny_synthetic):
    """`validation_max_batches` is a GLOBAL image budget: the scored image
    set — and the count-weighted combination of per-host partial means —
    is identical for any simulated process_count."""
    import jax
    import numpy as np

    import ccdm_tpu.data.synthetic as syn
    from ccdm_tpu.eval.ged_eval import compute_ged
    from ccdm_tpu.models.builder import build_model
    from ccdm_tpu.parallel.mesh import host_slice

    ds = syn.synthetic_test_dataset(n=4, resolution=32)
    model = build_model(EVAL_PARAMS, num_classes=2, image_channels=1,
                        image_size=32)
    params = model.init(jax.random.PRNGKey(0), (32, 32, 1))
    key = jax.random.PRNGKey(5)
    bs, max_batches = 2, 1

    full = compute_ged(model, params, ds, num_samples=2, batch_size=bs,
                       key=key, max_batches=max_batches)
    n_eff = min(len(ds), max_batches * bs)
    parts, counts = [], []
    for pi in (0, 1):
        # single-process simulation: the combining allgather degenerates to
        # identity (one real process), so each call returns host pi's
        # partial means over its own strided slice
        parts.append(compute_ged(model, params, ds, num_samples=2,
                                 batch_size=bs, key=key,
                                 max_batches=max_batches,
                                 process_index=pi, process_count=2))
        counts.append(len(host_slice(n_eff, pi, 2)))
    assert sum(counts) == n_eff == 2
    for m, (a, b) in enumerate(zip(*parts)):
        combined = (a * counts[0] + b * counts[1]) / sum(counts)
        np.testing.assert_allclose(combined, full[m], rtol=1e-6)


def test_eval_lidc_uncertainty_encoder_reuse(tiny_synthetic):
    """`encoder_reuse: 2` plumbs through the harness end-to-end and returns
    valid metrics (the mechanism itself is exact-tested in
    test_encoder_reuse.py; default 1 = off)."""
    from ccdm_tpu.eval.lidc_uncertainty import eval_lidc_uncertainty

    res = eval_lidc_uncertainty(dict(EVAL_PARAMS, encoder_reuse=2))
    assert res["count"] == 4
    assert 0.0 <= res["GED_2"] <= 2.0
    assert all(0.0 <= d <= 1.0 for d in res["Dice"])
