import math

import numpy as np
import pytest

from ccdm_tpu.core.schedules import cosine_schedule, linear_schedule, make_schedule


def test_linear_schedule_values():
    s = linear_schedule(10, start=1e-2, end=0.2)
    betas = np.linspace(1e-2, 0.2, 10)
    np.testing.assert_allclose(np.asarray(s.betas), betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.alphas), 1 - betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.cumalphas), np.cumprod(1 - betas), rtol=1e-6)


def test_cosine_schedule_matches_reference_formula():
    # Independent recomputation of the reference formulas
    # (diffusion_denoising.py:25-39), including the s-override quirk.
    T = 250
    s = 0.008
    sched = cosine_schedule(T, s=123.0)  # the arg must be ignored (parity quirk)
    t = np.arange(T)
    cumalphas = np.cos(((t / T + s) / (1 + s)) * (math.pi / 2)) ** 2

    def f(u):
        return math.cos((u + s) / (1.0 + s) * math.pi / 2) ** 2

    betas = np.array([min(1 - f((i + 1) / T) / f(i / T), 0.999) for i in range(T)])
    np.testing.assert_allclose(np.asarray(sched.cumalphas), cumalphas, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sched.betas), betas, rtol=1e-5)
    assert np.asarray(sched.betas).max() <= 0.999 + 1e-7


def test_boundary_overrides_baked_in():
    s = cosine_schedule(50)
    assert float(s.alphas_eff[0]) == 0.0
    assert float(s.cumalphas_prev[0]) == 1.0
    np.testing.assert_allclose(
        np.asarray(s.cumalphas_prev[1:]), np.asarray(s.cumalphas[:-1]), rtol=1e-7
    )
    np.testing.assert_allclose(np.asarray(s.alphas_eff[1:]), np.asarray(s.alphas[1:]), rtol=1e-7)


def test_make_schedule_dispatch():
    s = make_schedule("cosine", 20, {"s": 0.008})
    assert s.time_steps == 20
    with pytest.raises(ValueError):
        make_schedule("quadratic", 20)
