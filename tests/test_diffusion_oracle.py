"""Categorical-diffusion parity: our math vs the reference's own
`DiffusionModel` executed as an oracle (`ddpm/models/diffusion_denoising.py`).

Stronger than the re-derived NumPy oracles in test_diffusion_math.py: the
reference code itself produces the expected values — schedules (incl. the
cosine s-override quirk and the 0.999 beta clip), `q(x_t|x_0)`,
`theta_post` with its in-place t==1 boundary masking, and the
marginalised `theta_post_prob` (the C x C einsum our implementation
collapses to O(C)). Layouts: reference BCHW vs ours BHWC.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_module():
    sys.path.insert(0, REFERENCE)
    if "ddpm" not in sys.modules:
        pkg = types.ModuleType("ddpm")
        pkg.__path__ = [os.path.join(REFERENCE, "ddpm")]
        sys.modules["ddpm"] = pkg
    from ddpm.models import diffusion_denoising

    return diffusion_denoising


@pytest.mark.parametrize("name,params", [
    ("linear", None),
    ("cosine", None),
    ("cosine", {"s": 0.02}),
])
def test_schedules_match_reference(ref_module, name, params):
    from ccdm_tpu.core.schedules import make_schedule

    T = 50
    fn = {"linear": ref_module.linear_schedule,
          "cosine": ref_module.cosine_schedule}[name]
    betas, alphas, cumalphas = (fn(T, **params) if params else fn(T))
    ours = make_schedule(name, T, params)
    # atol floor: torch computes in fp32, ours in fp64 — the clipped
    # beta=0.999 makes alpha=0.001 differ by ~1e-8 between the two
    np.testing.assert_allclose(np.asarray(ours.betas), betas.numpy(),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ours.alphas), alphas.numpy(),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ours.cumalphas), cumalphas.numpy(),
                               rtol=1e-6, atol=1e-7)


def test_diffusion_math_matches_reference(ref_module):
    import torch

    from ccdm_tpu.core.schedules import make_schedule
    from ccdm_tpu.diffusion.categorical import (
        CategoricalDiffusion,
        q_xt_given_x0_probs,
        theta_post,
        theta_post_prob,
    )

    T, C, B, H, W = 8, 3, 5, 6, 4
    ref = ref_module.DiffusionModel("cosine", T, C)
    ours = CategoricalDiffusion(schedule=make_schedule("cosine", T), num_classes=C)

    rng = np.random.default_rng(0)
    x0 = np.eye(C, dtype=np.float32)[rng.integers(0, C, (B, H, W))]  # BHWC
    xt = np.eye(C, dtype=np.float32)[rng.integers(0, C, (B, H, W))]
    soft = rng.random((B, H, W, C)).astype(np.float32)
    soft /= soft.sum(-1, keepdims=True)
    # include the t==1 boundary and T
    t = np.array([1, 2, 3, T - 1, T], np.int32)

    def bchw(a):
        return torch.from_numpy(np.moveaxis(a, -1, 1).copy())

    tt = torch.from_numpy(t.astype(np.int64))

    # the distribution stores probs channels-LAST (one_hot_categorical.py:24)
    ref_q = ref.q_xt_given_x0(bchw(x0), tt).probs  # already BHWC
    np.testing.assert_allclose(
        np.asarray(q_xt_given_x0_probs(ours, x0, t)),
        ref_q.numpy(), rtol=1e-5, atol=1e-7)

    ref_tp = ref.theta_post(bchw(xt), bchw(x0), tt)
    np.testing.assert_allclose(
        np.asarray(theta_post(ours, xt, x0, t)),
        np.moveaxis(ref_tp.numpy(), 1, -1), rtol=1e-5, atol=1e-6)

    ref_tpp = ref.theta_post_prob(bchw(xt), bchw(soft), tt)
    np.testing.assert_allclose(
        np.asarray(theta_post_prob(ours, xt, soft, t)),
        np.moveaxis(ref_tpp.numpy(), 1, -1), rtol=1e-5, atol=1e-6)
