#!/usr/bin/env python
"""Train-step breakdown profile (VERDICT r2 #5): where do the ms/step go?

Times four jitted programs on the flagship train geometry (batch 16,
128x128, the same setup as `BENCH_MODE=train`) and reports the deltas:

    fwd        — loss forward only (train_loss)
    grad       — value_and_grad of the same loss      (bwd = grad - fwd)
    grad+opt   — grad then tx.update+apply_updates    (opt = this - grad)
    full step  — make_train_step incl. EMA + metrics  (ema+misc = full - grad+opt)

Each program is compiled once, then timed over BENCH_REPS x BENCH_INNER
launches with a final blocking readback. Combine with the
BENCH_REMAT_ATTENTION / BENCH_NORM_FP32 A/B knobs of `BENCH_MODE=train`
for the full roofline story (PERFNOTES "train-step roofline").

Reference hot loop being profiled: `ddpm/trainer.py:231-293` (forward, KL,
backward, optimizer step, Polyak EMA).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import FLAGSHIP_PARAMS
    from ccdm_tpu.models.builder import build_model
    from ccdm_tpu.train.optimizer import build_optimizer
    from ccdm_tpu.train.state import create_train_state
    from ccdm_tpu.train.step import make_train_step, train_loss

    batch = int(os.environ.get("BENCH_BATCH", 16))
    reps = int(os.environ.get("BENCH_REPS", 3))
    inner = int(os.environ.get("BENCH_INNER", 10))
    h = w = 128

    cfg = dict(FLAGSHIP_PARAMS)
    bb = dict(cfg["unet_openai"])
    if os.environ.get("BENCH_REMAT_ATTENTION") is not None:
        bb["remat_attention"] = os.environ["BENCH_REMAT_ATTENTION"] not in ("0", "no")
    if os.environ.get("BENCH_NORM_FP32") is not None:
        bb["norm_fp32"] = os.environ["BENCH_NORM_FP32"] not in ("0", "no")
    cfg["unet_openai"] = bb

    model = build_model(cfg, num_classes=2, image_channels=1, image_size=h)
    params = model.init(jax.random.PRNGKey(0), (h, w, 1))
    tx, sched = build_optimizer(FLAGSHIP_PARAMS, steps_per_epoch=1000)
    state = create_train_state(
        params, tx, polyak_alpha=float(FLAGSHIP_PARAMS["polyak_alpha"]))
    cw = jnp.ones((2,))

    rng_np = np.random.default_rng(0)
    b = {
        "image": jnp.asarray(
            rng_np.standard_normal((batch, h, w, 1)).astype(np.float32)),
        "x0": jnp.asarray(
            np.eye(2, dtype=np.float32)[rng_np.integers(0, 2, (batch, h, w))]),
    }
    key = jax.random.PRNGKey(1)

    def loss_of(p, bt, r):
        return train_loss(model, p, bt, r, cw)[0]

    fwd = jax.jit(loss_of)
    grad = jax.jit(lambda p, bt, r: jax.value_and_grad(loss_of)(p, bt, r))

    def grad_opt(st, bt, r):
        loss, grads = jax.value_and_grad(loss_of)(st.params, bt, r)
        updates, new_opt = st.tx.update(grads, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, updates)
        return st.replace(params=new_params, opt_state=new_opt), loss

    gopt = jax.jit(grad_opt)
    full = jax.jit(make_train_step(model, cw, sched))

    def timeit(fn, *args, result_leaf):
        out = fn(*args)  # compile + warmup
        jax.block_until_ready(result_leaf(out))
        t0 = time.perf_counter()
        for _ in range(reps * inner):
            out = fn(*args)
        jax.block_until_ready(result_leaf(out))
        return 1e3 * (time.perf_counter() - t0) / (reps * inner), out

    ms_fwd, _ = timeit(fwd, state.params, b, key, result_leaf=lambda o: o)
    ms_grad, _ = timeit(grad, state.params, b, key, result_leaf=lambda o: o[0])
    ms_gopt, _ = timeit(gopt, state, b, key, result_leaf=lambda o: o[1])
    ms_full, _ = timeit(full, state, b, key,
                        result_leaf=lambda o: o[1]["loss"])

    rows = {
        "fwd_ms": ms_fwd,
        "bwd_ms": ms_grad - ms_fwd,
        "opt_ms": ms_gopt - ms_grad,
        "ema_misc_ms": ms_full - ms_gopt,
        "full_ms": ms_full,
    }
    print(json.dumps({
        "metric": "train_step_breakdown",
        "unit": "ms/step",
        "config": {"batch": batch, "reps": reps, "inner": inner,
                   "remat_attention": bb.get("remat_attention", True),
                   "norm_fp32": bb.get("norm_fp32", True),
                   "device": str(jax.devices()[0]),
                   "backend": jax.default_backend()},
        **{k: round(v, 3) for k, v in rows.items()},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
