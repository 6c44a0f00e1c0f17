"""Optimizer + learning-rate schedule construction (optax).

Parity with `ddpm/optimizer.py:9-61` and `LRFcts`
(`ddpm/lr_functions.py:5-139`). The reference always passes
`lr_restart_steps = []` (`optimizer.py:48`) so its warm-restart machinery is
dead config surface upstream; here it IS live — set
`optim.lr_restart_steps: [s1, s2, ...]` (+ optional `lr_restart_vals`,
scalar decay factor or explicit list) to get the reference's restart
semantics (`lr_functions.py:16-80`) for static/exponential/polynomial/cosine
schedules, as a pure jit-safe `step -> lr` function.

The no-restart schedules:

- `polynomial`: `coeff = (1 - step/(total-1))**power`,
  `mult = (1 - min_ratio)*coeff + min_ratio`, floored at `min_ratio`
  (`lr_functions.py:121-135`)
- `linear-warmup-polynomial`: `mult = 1 - (1 - (step+1)/warmup_iters) *
  (1 - warmup_rate)` for `step < warmup_iters`, then polynomial over the
  full step range (`lr_functions.py:91-98,109-114`)
- `exponential`: `gamma ** step` (`lr_functions.py:116-119`)
- `static` / `piecewise_static`: constant multiplier / ordered
  `[phase_end, mult]` table with `step <= phase_end` semantics
  (`lr_functions.py:102-107`)

Optimizers: Adam (no weight decay), AdamW (wd 0.01, betas (0.9, 0.999)),
SGD (momentum 0.9, wd 5e-4) with the reference's defaults
(`optimizer.py:25-36`). Total steps = `steps_per_epoch * optim.epochs`
(`optimizer.py:44-46`).

All schedules are pure `step -> lr` functions usable inside `jit`
(`jnp.where` instead of Python branches).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict

import jax.numpy as jnp
import optax

LOGGER = logging.getLogger(__name__)


def _polynomial_mult(min_ratio: float, power: float, total_steps: int) -> Callable:
    denom = max(total_steps - 1, 1)

    def fn(step):
        # clamp past the schedule end: for step > total, lr stays at min_lr
        # (the reference's documented intent, params.yml:33) — without the
        # clamp a negative base to a fractional power would go NaN
        coeff = jnp.maximum(1.0 - step / denom, 0.0) ** power
        mult = (1.0 - min_ratio) * coeff + min_ratio
        return jnp.maximum(mult, min_ratio)

    return fn


def _restart_mult(name: str, p: Dict[str, Any], restarts_cfg: list,
                  restart_vals, total_steps: int, base_lr: float) -> Callable:
    """Warm-restart multiplier (parity: `LRFcts.__init__`/`__call__` with
    non-empty restarts, `lr_functions.py:16-80`): boundary 0 prepended, the
    total appended with multiplier 0, scalar `lr_restart_vals` compounding
    per restart (or an explicit list), each segment re-running the base
    schedule from its own start over its own length."""
    restarts = [int(r) for r in restarts_cfg]
    if 0 not in restarts:
        restarts.insert(0, 0)
    vals = [1.0]
    if isinstance(restart_vals, (int, float)):
        for _ in range(1, len(restarts)):
            vals.append(vals[-1] * float(restart_vals))
    else:
        assert len(restart_vals) == len(restarts) - 1, \
            "lr_restart_vals list must have one entry per restart boundary"
        vals.extend(float(v) for v in restart_vals)
    if total_steps not in restarts:
        restarts.append(total_steps)
        vals.append(0.0)
    lengths = [restarts[i + 1] - restarts[i] for i in range(len(restarts) - 1)] + [1]

    r_arr = jnp.asarray(restarts, dtype=jnp.float32)
    v_arr = jnp.asarray(vals, dtype=jnp.float32)
    l_arr = jnp.asarray(lengths, dtype=jnp.float32)

    if name == "static":
        seg_fn = lambda base, since, seg_len: base  # noqa: E731
    elif name == "exponential":
        gamma = float(p.get("gamma", 0.98))
        seg_fn = lambda base, since, seg_len: base * gamma ** since  # noqa: E731
    elif name == "polynomial":
        power = float(p.get("power", 1.0))
        min_lr = float(p.get("min_lr", 0.0))
        min_ratio = min_lr / base_lr if min_lr > 0 else 0.0

        def seg_fn(base, since, seg_len):
            coeff = jnp.maximum(1.0 - since / jnp.maximum(seg_len - 1.0, 1.0), 0.0) ** power
            return jnp.maximum((base - min_ratio) * coeff + min_ratio, min_ratio)
    elif name == "cosine":
        def seg_fn(base, since, seg_len):
            return base * 0.5 * (1.0 + jnp.cos(jnp.pi * since / seg_len))
    else:
        raise ValueError(f"lr_function {name!r} does not support lr_restart_steps")

    def mult(step):
        seg = jnp.clip(jnp.sum(step >= r_arr) - 1, 0, len(restarts) - 1)
        return seg_fn(v_arr[seg], step - r_arr[seg], l_arr[seg])

    return mult


def build_lr_schedule(optim_params: Dict[str, Any], steps_per_epoch: int,
                      max_epochs: int = 1) -> Callable:
    """Return an absolute `step -> lr` schedule function."""
    base_lr = float(optim_params.get("learning_rate", 1e-4))
    name = optim_params.get("lr_function")
    p = dict(optim_params.get("lr_params") or {})
    epochs = int(optim_params.get("epochs", max_epochs))
    total_steps = max(steps_per_epoch * epochs, 1)

    restarts = list(optim_params.get("lr_restart_steps") or [])
    if restarts:
        mult = _restart_mult(name, p, restarts,
                             optim_params.get("lr_restart_vals", 1),
                             total_steps, base_lr)
        return lambda step: base_lr * mult(jnp.asarray(step, dtype=jnp.float32))

    if name is None or name == "static":
        mult = lambda step: jnp.asarray(1.0)  # noqa: E731
    elif name == "polynomial":
        min_lr = float(p.get("min_lr", 0.0))
        min_ratio = min_lr / base_lr if min_lr > 0 else 0.0
        mult = _polynomial_mult(min_ratio, float(p.get("power", 1.0)), total_steps)
    elif name == "cosine":
        def mult(step):
            return 0.5 * (1.0 + jnp.cos(jnp.pi * jnp.minimum(step, total_steps) / total_steps))
    elif name == "exponential":
        gamma = float(p.get("gamma", 0.98))

        def mult(step):
            return gamma ** step
    elif name in ("linear-warmup-polynomial", "warmup_polynomial"):
        warmup_iters = int(p["warmup_iters"])
        warmup_rate = float(p["warmup_rate"])
        min_lr = float(p.get("min_lr", 0.0))
        min_ratio = min_lr / base_lr if min_lr > 0 else 0.0
        poly = _polynomial_mult(min_ratio, float(p.get("power", 1.0)), total_steps)

        def mult(step):
            warm = 1.0 - (1.0 - (step + 1.0) / warmup_iters) * (1.0 - warmup_rate)
            return jnp.where(step <= warmup_iters - 1, warm, poly(step))
    elif name == "piecewise_static":
        table = p["piecewise_static_schedule"]  # list of [phase_end, mult]
        ends = jnp.asarray([row[0] for row in table], dtype=jnp.float32)
        vals = jnp.asarray([row[1] for row in table], dtype=jnp.float32)

        def mult(step):
            idx = jnp.sum(step > ends)  # first phase_end with step <= phase_end
            return vals[jnp.minimum(idx, len(table) - 1)]
    else:
        raise ValueError(f"unknown lr_function {name!r}")

    return lambda step: base_lr * mult(jnp.asarray(step, dtype=jnp.float32))


def build_optimizer(params: Dict[str, Any], steps_per_epoch: int):
    """Build `(optax transform, schedule fn)` from a reference-format params dict."""
    if "optim" not in params:
        LOGGER.info("no optim config; defaulting to Adam(lr=1e-4)")
        schedule = lambda step: 1e-4  # noqa: E731
        return optax.adam(1e-4), schedule

    p_opt = dict(params["optim"])
    name = p_opt["name"]
    schedule = build_lr_schedule(p_opt, steps_per_epoch, int(params.get("max_epochs", 1)))

    if name == "SGD":
        tx = optax.sgd(schedule, momentum=float(p_opt.get("momentum", 0.9)))
        wd = float(p_opt.get("weight_decay", 0.0005))
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
    elif name == "Adam":
        tx = optax.adam(schedule)
    elif name == "AdamW":
        betas = tuple(p_opt.get("betas", (0.9, 0.999)))
        tx = optax.adamw(schedule, b1=betas[0], b2=betas[1],
                         weight_decay=float(p_opt.get("weight_decay", 0.01)))
    else:
        raise ValueError(f"optimizer {name!r} not recognized")

    LOGGER.info("optimizer=%s lr_function=%s", name, p_opt.get("lr_function"))
    return tx, schedule
