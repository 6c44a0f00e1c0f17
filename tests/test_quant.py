"""Int8 quantized inference path (ops/quant.py): numerics + plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ccdm_tpu.models.builder import build_model
from ccdm_tpu.ops.quant import QuantConv, quantized_conv

PARAMS = {
    "time_steps": 4,
    "beta_schedule": "cosine",
    "compute_dtype": "float32",
    "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                    "attention_resolutions": [2], "num_head_channels": 4},
}


def test_quantized_conv_close_to_float():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)) * 0.01, jnp.float32)

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))) + b
    out = quantized_conv(x, w, b)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, f"int8 conv relative error {rel}"


def test_quantconv_params_match_nn_conv():
    """QuantConv must consume float-trained checkpoints unchanged: same
    param names ('kernel'/'bias') and shapes as flax.linen.Conv."""
    x = jnp.zeros((1, 8, 8, 4))
    fp = nn.Conv(6, (3, 3), padding=((1, 1), (1, 1)), param_dtype=jnp.float32)
    qp = QuantConv(6, (3, 3))
    p_fp = fp.init(jax.random.PRNGKey(0), x)["params"]
    p_qp = qp.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree.structure(p_fp) == jax.tree.structure(p_qp)
    for a, b in zip(jax.tree.leaves(p_fp), jax.tree.leaves(p_qp)):
        assert a.shape == b.shape and a.dtype == b.dtype
    # the quantized module evaluates float params to ~the float answer
    out_fp = fp.apply({"params": p_fp}, x + 1.0)
    out_qp = qp.apply({"params": p_fp}, x + 1.0)
    rel = float(jnp.linalg.norm(out_qp - out_fp) /
                jnp.maximum(jnp.linalg.norm(out_fp), 1e-9))
    assert rel < 0.02


def test_quantized_unet_matches_float_params_and_output():
    """quantized_inference: yes builds a UNet with the IDENTICAL param tree
    and near-identical probability outputs (softmax damps quant noise)."""
    fp_model = build_model(PARAMS, num_classes=2, image_channels=1, image_size=16)
    q_model = build_model(dict(PARAMS, quantized_inference=True), num_classes=2,
                          image_channels=1, image_size=16)
    p = fp_model.init(jax.random.PRNGKey(0), (16, 16, 1))
    q = q_model.init(jax.random.PRNGKey(0), (16, 16, 1))
    assert jax.tree.structure(p) == jax.tree.structure(q)

    rng = np.random.default_rng(1)
    xt = jax.nn.one_hot(jnp.asarray(rng.integers(0, 2, (2, 16, 16))), 2)
    cond = jnp.asarray(rng.standard_normal((2, 16, 16, 1)), jnp.float32)
    t = jnp.array([2, 3], jnp.int32)
    out_fp = fp_model.apply(p, xt, cond, t)["diffusion_out"]
    out_q = q_model.apply(p, xt, cond, t)["diffusion_out"]
    assert out_q.shape == out_fp.shape
    assert float(jnp.max(jnp.abs(out_q - out_fp))) < 0.05
    np.testing.assert_allclose(np.asarray(jnp.sum(out_q, -1)), 1.0, atol=1e-4)


def test_quantized_sampler_runs():
    q_model = build_model(dict(PARAMS, quantized_inference=True,
                               step_T_sample="majority"),
                          num_classes=2, image_channels=1, image_size=16)
    p = q_model.init(jax.random.PRNGKey(0), (16, 16, 1))
    rng = np.random.default_rng(2)
    cond = jnp.asarray(rng.standard_normal((2, 16, 16, 1)), jnp.float32)
    from ccdm_tpu.diffusion.sampling import sample_prior

    xt = sample_prior(jax.random.PRNGKey(3), 2, 16, 16, 2)
    out = jax.jit(lambda p, x, c, k: q_model.sample(p, x, c, k))(
        p, xt, cond, jax.random.PRNGKey(4))
    assert out.shape == (2, 16, 16, 2)
    np.testing.assert_allclose(np.asarray(jnp.sum(out, -1)), 1.0, atol=1e-6)


def test_quantized_inference_rejected_for_training(tmp_path):
    """The int8 path is inference-only: training configs must fail fast."""
    import pytest

    from ccdm_tpu.train.trainer import TrainingRun

    params = {
        "output_path": str(tmp_path / "qtrain"),
        "dataset_file": "ccdm_tpu.data.synthetic",
        "batch_size": 4, "max_epochs": 1, "time_steps": 2,
        "beta_schedule": "cosine", "compute_dtype": "float32",
        "quantized_inference": True,
        "unet_openai": {"base_channels": 8, "channel_mult": [1, 2],
                        "attention_resolutions": [4], "num_head_channels": 4},
    }
    with pytest.raises(ValueError, match="inference-only"):
        TrainingRun(params)


def test_static_scale_calibration_and_sampler():
    """Calibrated static scales: eager rollout collects one absmax per conv
    site, the baked-scale sampler runs finitely, and its output stays close
    to the dynamic-int8 output (identical quantization grid up to the scale
    estimate)."""
    from ccdm_tpu.eval.lidc_uncertainty import make_prob_sampler
    from ccdm_tpu.ops import quant

    model = build_model(dict(PARAMS, quantized_inference=True,
                             step_T_sample="confidence"),
                        num_classes=2, image_channels=1, image_size=16)
    params = model.init(jax.random.PRNGKey(0), (16, 16, 1))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((2, 16, 16, 1)), jnp.float32)

    scales = quant.calibrate_sampler(model, params, images, jax.random.PRNGKey(3),
                                     num_steps=3)
    leaves = jax.tree.leaves(scales)
    assert leaves and all(float(v) > 0 for v in leaves)

    key = jax.random.PRNGKey(7)
    dyn = np.asarray(make_prob_sampler(model, 2, 4)(params, images, key))
    # the scales travel with the model (no global state to clean up)
    static_model = model.with_quant_scales(scales)
    stat = np.asarray(make_prob_sampler(static_model, 2, 4)(params, images, key))
    assert np.isfinite(stat).all()
    assert stat.shape == dyn.shape
    # same RNG, slightly different scales: distributions agree closely
    assert float(np.mean(np.abs(stat - dyn))) < 0.15


def test_calibration_collection_is_jit_safe():
    """Calibration runs inside jit: the mutable 'quant_stats' collection sows
    a running per-site absmax and the conv falls back to the exact float
    path during the pass."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    conv = QuantConv(4, (3, 3))
    p = conv.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def run(v):
        return conv.apply(p, v, mutable=["quant_stats"])

    out, mutated = run(x)
    leaves = jax.tree.leaves(mutated["quant_stats"])
    assert len(leaves) == 1
    np.testing.assert_allclose(float(leaves[0]), float(jnp.max(jnp.abs(x))),
                               rtol=1e-6)
    # float path during calibration (no int8 rounding error)
    ref = nn.Conv(4, (3, 3), padding=((1, 1), (1, 1))).apply(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
