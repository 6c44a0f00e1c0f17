"""Pallas flash attention vs the dense parity path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccdm_tpu.ops.flash_attention import dense_attention, flash_attention


@pytest.mark.parametrize("t,block_q", [(256, 128), (320, 128)])  # incl. padding path
def test_flash_matches_dense(t, block_q):
    b, h, dh = 2, 4, 32
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, h, dh), jnp.float32)
    k = jax.random.normal(kk, (b, t, h, dh), jnp.float32)
    v = jax.random.normal(kv, (b, t, h, dh), jnp.float32)
    ours = np.asarray(flash_attention(q, k, v, block_q=block_q, interpret=True))
    ref = np.asarray(dense_attention(q, k, v))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_flash_bf16():
    """bf16 inputs: flash (fp32 logits throughout) must be at least as close
    to the fp32 truth as the dense bf16 path."""
    b, t, h, dh = 1, 128, 2, 32
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (b, t, h, dh), jnp.bfloat16)
    truth = np.asarray(dense_attention(
        q.astype(jnp.float32), q.astype(jnp.float32), q.astype(jnp.float32)))
    ours = np.asarray(flash_attention(q, q, q, block_q=128, interpret=True), np.float32)
    dense = np.asarray(dense_attention(q, q, q), np.float32)
    err_flash = np.abs(ours - truth).max()
    err_dense = np.abs(dense - truth).max()
    assert err_flash <= err_dense + 1e-3, (err_flash, err_dense)


def test_flash_gradients_match_dense():
    """custom VJP: grads through flash equal grads through the dense path."""
    b, t, h, dh = 1, 128, 2, 16
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(keys[0], (b, t, h, dh), jnp.float32)
    k = jax.random.normal(keys[1], (b, t, h, dh), jnp.float32)
    v = jax.random.normal(keys[2], (b, t, h, dh), jnp.float32)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, 128, True)
        return jnp.sum(out ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(dense_attention(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_attention_block_flash_flag_matches_dense():
    """AttentionBlock with flash forced on equals the dense path."""
    from ccdm_tpu.models.layers import AttentionBlock

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 32))
    dense_blk = AttentionBlock(num_head_channels=16, dtype=jnp.float32,
                               flash_attention=False)
    params = dense_blk.init({"params": jax.random.PRNGKey(3)}, x)["params"]
    params = jax.tree.map(
        lambda p: p + 0.1 * jax.random.normal(jax.random.PRNGKey(4), p.shape, p.dtype),
        params)
    a = np.asarray(dense_blk.apply({"params": params}, x))
    # flash path runs in interpret mode on CPU via pallas interpret fallback
    import ccdm_tpu.ops.flash_attention as fa

    orig = fa.flash_attention
    fa_interp = lambda q, k, v, **kw: orig(q, k, v, interpret=True)  # noqa: E731
    fa.flash_attention, saved = fa_interp, orig
    try:
        flash_blk = AttentionBlock(num_head_channels=16, dtype=jnp.float32,
                                   flash_attention=True)
        b = np.asarray(flash_blk.apply({"params": params}, x))
    finally:
        fa.flash_attention = saved
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_streaming_backward_matches_dense(monkeypatch):
    """Large-T backward streams query blocks; grads must equal the dense
    backward exactly-in-semantics (fp32 accumulation both sides), including
    when T is not a multiple of the backward block (padding no-op rows)."""
    import ccdm_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "BWD_DENSE_MAX_ELEMENTS", 0)  # force streaming
    monkeypatch.setattr(fa, "BWD_BLOCK_Q", 64)
    b, t, h, dh = 2, 160, 2, 32  # 160 = 2*64 + 32 -> exercises the pad path
    key = jax.random.PRNGKey(7)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, h, dh), jnp.float32)
    k = jax.random.normal(kk, (b, t, h, dh), jnp.float32)
    v = jax.random.normal(kv, (b, t, h, dh), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, block_q=128,
                                               interpret=True)))

    def loss_dense(q, k, v):
        return jnp.sum(jnp.sin(dense_attention(q, k, v)))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for ours, ref, name in zip(gf, gd, "qkv"):
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=3e-5, err_msg=name)
