import jax
import numpy as np

from ccdm_tpu.models.cross_attention import SpatialTransformer


def test_spatial_transformer_shapes_and_context():
    st = SpatialTransformer(num_heads=2, head_dim=8, depth=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
    params = st.init({"params": jax.random.PRNGKey(2)}, x, ctx)["params"]
    out_ctx = st.apply({"params": params}, x, ctx)
    out_self = st.apply({"params": params}, x, None)
    assert out_ctx.shape == x.shape
    # zero-init output projection -> identity at init
    np.testing.assert_allclose(np.asarray(out_ctx), np.asarray(x), atol=1e-6)
    # perturb and check context actually matters
    params = jax.tree.map(
        lambda p: p + 0.1 * jax.random.normal(jax.random.PRNGKey(3), p.shape, p.dtype),
        params)
    a = np.asarray(st.apply({"params": params}, x, ctx))
    b = np.asarray(st.apply({"params": params}, x, None))
    assert not np.allclose(a, b)


def test_metrics_logger_jsonl(tmp_path):
    import json

    from ccdm_tpu.utils.metrics_log import MetricsLogger

    log = MetricsLogger(str(tmp_path), {"wandb": False})
    log.log(1, {"loss": 2.5}, tag="train")
    log.log(2, {"GED": 0.8}, tag="val")
    log.close()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["loss"] == 2.5 and lines[0]["tag"] == "train"
    assert lines[1]["GED"] == 0.8 and lines[1]["step"] == 2
