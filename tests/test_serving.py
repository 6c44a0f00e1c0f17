"""Serving export round-trip (ccdm_tpu/utils/serving.py).

No reference analog — TPU-native deployment artifact: the compiled sampler
(weights baked in) serialized via jax.export, deserializable and runnable
with only jax on the serving side.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.eval.lidc_uncertainty import make_prob_sampler
from ccdm_tpu.models.builder import build_model
from ccdm_tpu.utils.serving import export_sampler, load_sampler, save_sampler

PARAMS = {
    "beta_schedule": "cosine",
    "time_steps": 6,
    "compute_dtype": "float32",
    "step_T_sample": "confidence",
    "unet_openai": {
        "base_channels": 8, "image_size": 16, "channel_mult": [1, 2],
        "attention_resolutions": [2], "num_head_channels": 4,
    },
}
C, H, W, B, S = 2, 16, 16, 2, 3


@pytest.fixture(scope="module")
def model_and_params():
    model = build_model(PARAMS, num_classes=C, image_channels=1, image_size=H)
    params = model.init(jax.random.PRNGKey(0), (H, W, 1))
    return model, params


def test_round_trip_bitwise(model_and_params, tmp_path):
    model, params = model_and_params
    images = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, H, W, 1)), jnp.float32)
    seed = jax.random.PRNGKey(42)

    direct = make_prob_sampler(model, S)(params, images, seed)

    path = save_sampler(str(tmp_path / "sampler.shlo"), model, params,
                        (H, W, 1), num_samples=S, batch_size=B)
    serve = load_sampler(path)
    served = serve(images, seed)

    assert served.shape == (B, S, H, W, C)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(served))


def test_artifact_is_self_contained(model_and_params, tmp_path):
    """The blob deserializes and runs through jax.export alone — no model
    rebuild, no flax module, proving the weights travel inside."""
    model, params = model_and_params
    blob = export_sampler(model, params, (H, W, 1), num_samples=S,
                          batch_size=B, num_steps=3)
    from jax import export as jax_export

    exported = jax_export.deserialize(blob)
    assert [tuple(s.shape) for s in exported.in_avals] == [(B, H, W, 1), (2,)]
    out = exported.call(jnp.zeros((B, H, W, 1), jnp.float32),
                        jax.random.PRNGKey(0))
    assert out.shape == (B, S, H, W, C)
    assert bool(jnp.isfinite(out).all())


def test_wrong_batch_shape_rejected(model_and_params):
    model, params = model_and_params
    blob = export_sampler(model, params, (H, W, 1), num_samples=S,
                          batch_size=B, num_steps=2)
    serve = load_sampler(blob)
    with pytest.raises(Exception):
        serve(jnp.zeros((B + 1, H, W, 1), jnp.float32), jax.random.PRNGKey(0))
