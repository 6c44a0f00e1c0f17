"""Pallas GroupNorm kernel vs flax/XLA references (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ccdm_tpu.ops.group_norm import (
    group_norm_supported,
    pallas_group_norm,
    xla_group_norm,
)


@pytest.mark.parametrize("c,groups", [(32, 32), (64, 32), (96, 32), (16, 8)])
def test_kernel_matches_flax(c, groups):
    b, h, w = 2, 8, 8
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, c), jnp.float32) * 3 + 1
    scale = jax.random.normal(jax.random.PRNGKey(1), (c,)) + 1
    bias = jax.random.normal(jax.random.PRNGKey(2), (c,))

    ours = np.asarray(pallas_group_norm(x, scale, bias, groups, interpret=True))
    ref_mod = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    ref = np.asarray(ref_mod.apply({"params": {"scale": scale, "bias": bias}}, x))
    np.testing.assert_allclose(ours, ref, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(xla_group_norm(x, scale, bias, groups)), ref, atol=2e-5)


def test_kernel_silu_fusion():
    b, h, w, c = 1, 8, 8, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c))
    scale = jnp.ones((c,))
    bias = jnp.zeros((c,))
    fused = np.asarray(pallas_group_norm(x, scale, bias, 32, silu=True, interpret=True))
    ref = np.asarray(jax.nn.silu(xla_group_norm(x, scale, bias, 32)))
    np.testing.assert_allclose(fused, ref, atol=2e-5)


def test_kernel_bf16():
    b, h, w, c = 2, 16, 16, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c), jnp.bfloat16)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)
    ours = np.asarray(pallas_group_norm(x, scale, bias, 32, interpret=True), np.float32)
    ref = np.asarray(xla_group_norm(x, scale, bias, 32), np.float32)
    np.testing.assert_allclose(ours, ref, atol=3e-2)


def test_supported_predicate():
    assert group_norm_supported((8, 128, 128, 32), 32)
    assert not group_norm_supported((1, 512, 512, 32), 32)  # > VMEM budget
    assert not group_norm_supported((1, 8, 8, 30), 32)      # groups don't divide
