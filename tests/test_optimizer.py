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


class RefLRFcts:
    """Independent NumPy re-derivation of the reference warm-restart
    semantics (`ddpm/lr_functions.py:16-139`, restart path) as a test
    oracle."""

    def __init__(self, config, total, restarts):
        self.base_lr = config["learning_rate"]
        self.fct = config["lr_function"]
        self.p = config.get("lr_params", {})
        restarts = list(restarts)
        if 0 not in restarts:
            restarts.insert(0, 0)
        vals = [1.0]
        rv = config.get("lr_restart_vals", 1)
        if isinstance(rv, (int, float)):
            for _ in range(1, len(restarts)):
                vals.append(vals[-1] * rv)
        else:
            vals.extend(rv)
        if total not in restarts:
            restarts.append(total)
            vals.append(0.0)
        self.restarts = np.array(restarts)
        self.vals = np.array(vals)
        self.lengths = np.ones_like(self.restarts)
        self.lengths[:-1] = self.restarts[1:] - self.restarts[:-1]

    def __call__(self, step):
        curr = int(np.sum(step >= self.restarts) - 1)
        since = step - self.restarts[curr]
        base = self.vals[curr]
        n = self.lengths[curr]
        if self.fct == "static":
            return base
        if self.fct == "exponential":
            return base * self.p.get("gamma", 0.98) ** since
        if self.fct == "cosine":
            return base * 0.5 * (1.0 + np.cos(np.pi * since / n))
        if self.fct == "polynomial":
            power = self.p.get("power", 1.0)
            min_lr = self.p.get("min_lr", 0.0)
            mb = min_lr / self.base_lr if min_lr else 0.0
            # the final boundary segment has length 1; the reference would
            # divide by zero there (`lr_functions.py:131`, unreachable dead
            # code upstream) — we define it as coeff=1, i.e. lr = base = 0
            coeff = (1 - since / max(n - 1, 1)) ** power
            return max((base - mb) * coeff + mb, mb)
        raise ValueError(self.fct)


def test_warm_restart_schedules():
    """`optim.lr_restart_steps` reproduces `LRFcts` restart semantics
    (scalar compounding restart_vals, per-segment schedule re-run, zero
    multiplier past the final boundary)."""
    total = 100  # 10 steps/epoch x 10 epochs
    for fct, lr_params in [("cosine", {}), ("polynomial", {"power": 1.0}),
                           ("static", {}), ("exponential", {"gamma": 0.9})]:
        optim = {
            "learning_rate": 1e-3,
            "lr_function": fct,
            "lr_params": lr_params,
            "epochs": 10,
            "lr_restart_steps": [40, 70],
            "lr_restart_vals": 0.5,
        }
        oracle = RefLRFcts(optim, total, [40, 70])
        sched = build_lr_schedule(optim, steps_per_epoch=10)
        for step in [0, 1, 39, 40, 41, 69, 70, 99, 100]:
            np.testing.assert_allclose(
                float(sched(step)), 1e-3 * oracle(step), rtol=1e-4, atol=1e-9,
                err_msg=f"{fct} @ step {step}")


def test_warm_restart_vals_list_and_bad_fct():
    import pytest

    optim = {
        "learning_rate": 1e-3,
        "lr_function": "cosine",
        "epochs": 10,
        "lr_restart_steps": [50],
        "lr_restart_vals": [0.25],
    }
    oracle = RefLRFcts(optim, 100, [50])
    sched = build_lr_schedule(optim, steps_per_epoch=10)
    for step in [0, 49, 50, 75, 100]:
        np.testing.assert_allclose(float(sched(step)), 1e-3 * oracle(step),
                                   rtol=1e-5, atol=1e-12)

    with pytest.raises(ValueError, match="lr_restart_steps"):
        build_lr_schedule({"learning_rate": 1e-3,
                           "lr_function": "piecewise_static",
                           "lr_restart_steps": [10], "epochs": 1},
                          steps_per_epoch=10)
