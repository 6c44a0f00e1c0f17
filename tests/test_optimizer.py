import numpy as np

from ccdm_tpu.train.optimizer import build_lr_schedule, build_optimizer


def ref_polynomial(step, base_lr, min_lr, power, total):
    # Independent NumPy re-derivation of lr_functions.py:121-135 (no-restart path).
    min_base = min_lr / base_lr if min_lr > 0 else 0.0
    coeff = (1 - step / (total - 1)) ** power
    return base_lr * max((1 - min_base) * coeff + min_base, min_base)


def test_polynomial_schedule_parity():
    optim = {
        "learning_rate": 1e-4,
        "lr_function": "polynomial",
        "lr_params": {"power": 1.0, "min_lr": 1e-6},
        "epochs": 10,
    }
    sched = build_lr_schedule(optim, steps_per_epoch=100)
    total = 1000
    for step in [0, 1, 250, 500, 999]:
        expected = ref_polynomial(step, 1e-4, 1e-6, 1.0, total)
        np.testing.assert_allclose(float(sched(step)), expected, rtol=1e-5)
    # Past the end: floored at min_lr.
    np.testing.assert_allclose(float(sched(2000)), 1e-6, rtol=1e-5)


def test_warmup_polynomial_schedule():
    optim = {
        "learning_rate": 1e-4,
        "lr_function": "linear-warmup-polynomial",
        "lr_params": {"warmup_iters": 10, "warmup_rate": 1e-6, "power": 1.0},
        "epochs": 1,
    }
    sched = build_lr_schedule(optim, steps_per_epoch=100)
    # step 0: mult = 1 - (1 - 1/10)(1 - 1e-6) ≈ 0.1
    np.testing.assert_allclose(float(sched(0)), 1e-4 * (1 - 0.9 * (1 - 1e-6)), rtol=1e-5)
    # step 9 (last warmup step): mult = 1
    np.testing.assert_allclose(float(sched(9)), 1e-4, rtol=1e-5)
    # after warmup: polynomial over full range
    np.testing.assert_allclose(float(sched(50)), ref_polynomial(50, 1e-4, 0, 1.0, 100), rtol=1e-5)


def test_static_and_exponential():
    assert float(build_lr_schedule({"learning_rate": 0.5}, 10)(7)) == 0.5
    sched = build_lr_schedule(
        {"learning_rate": 1.0, "lr_function": "exponential", "lr_params": {"gamma": 0.9}, "epochs": 1},
        10,
    )
    np.testing.assert_allclose(float(sched(3)), 0.9 ** 3, rtol=1e-5)


def test_piecewise_static():
    sched = build_lr_schedule(
        {
            "learning_rate": 1.0,
            "lr_function": "piecewise_static",
            "lr_params": {"piecewise_static_schedule": [[40, 1.0], [50, 0.1]]},
            "epochs": 1,
        },
        50,
    )
    # lr_functions.py:102-107: step <= 40 -> 1.0, step <= 50 -> 0.1
    assert float(sched(10)) == 1.0
    assert float(sched(40)) == 1.0
    np.testing.assert_allclose(float(sched(41)), 0.1, rtol=1e-6)


def test_build_optimizer_variants():
    import optax

    for name in ["Adam", "AdamW", "SGD"]:
        tx, sched = build_optimizer(
            {"optim": {"name": name, "learning_rate": 1e-3}, "max_epochs": 1}, 10)
        assert isinstance(tx, optax.GradientTransformation)
    tx, sched = build_optimizer({}, 10)
    assert float(sched(0)) == 1e-4
