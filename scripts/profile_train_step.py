#!/usr/bin/env python
"""Per-phase profile + A/B matrix of the flagship TRAIN step on TPU.

The sampler got a roofline treatment in round 2 (profile_sampler.py); this
gives the train step the same (VERDICT r2 #5):

- ms/step of the full fused step (fwd + bwd + Adam + EMA) at batch 16,
- ms of separately-jitted phases: loss forward, value_and_grad
  (fwd+bwd), optimizer+EMA update on fixed grads — showing where the time
  goes (phases are compiled separately so they don't sum exactly to the
  fused step, but the ratios are what matters),
- XLA cost-analysis FLOPs/bytes for forward and fwd+bwd -> roofline bounds,
- the remat_attention x norm_fp32 A/B matrix (4 configs, ms/step each).

Run alone (one JAX process at a time through the TPU tunnel):
    python scripts/profile_train_step.py
Env: BENCH_BATCH (16), BENCH_REPS (30), PROFILE_DIR for a jax.profiler trace.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, *args, reps=30):
    out = fn(*args)
    jax_block(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax_block(out)
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def jax_block(tree):
    import jax

    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import FLAGSHIP_PARAMS
    from ccdm_tpu.models.builder import build_model
    from ccdm_tpu.train.optimizer import build_optimizer
    from ccdm_tpu.train.state import create_train_state
    from ccdm_tpu.train.step import make_train_step, train_loss

    batch = int(os.environ.get("BENCH_BATCH", 16))
    reps = int(os.environ.get("BENCH_REPS", 30))
    h = w = 128
    rng = np.random.default_rng(0)
    batch_data = {
        "image": jnp.asarray(
            rng.standard_normal((batch, h, w, 1)).astype(np.float32)),
        "x0": jnp.asarray(
            np.eye(2, dtype=np.float32)[rng.integers(0, 2, (batch, h, w))]),
    }
    key = jax.random.PRNGKey(1)

    def build(remat_attention, norm_fp32):
        cfg = dict(FLAGSHIP_PARAMS)
        cfg["unet_openai"] = dict(cfg["unet_openai"],
                                  remat_attention=remat_attention,
                                  norm_fp32=norm_fp32)
        model = build_model(cfg, num_classes=2, image_channels=1, image_size=h)
        params = model.init(jax.random.PRNGKey(0), (h, w, 1))
        tx, sched = build_optimizer(FLAGSHIP_PARAMS, steps_per_epoch=1000)
        state = create_train_state(
            params, tx, polyak_alpha=float(FLAGSHIP_PARAMS["polyak_alpha"]))
        return model, state, sched, tx

    # ---- A/B matrix ---------------------------------------------------------
    print(f"batch={batch} reps={reps} device={jax.devices()[0]}")
    results = {}
    for ra in (True, False):
        for nf in (True, False):
            model, state, sched, _ = build(ra, nf)
            step = jax.jit(make_train_step(model, jnp.ones((2,)), sched))
            ms = _timed(lambda s: step(s, batch_data, key)[0], state, reps=reps)
            results[(ra, nf)] = ms
            print(f"full step  remat_attention={int(ra)} norm_fp32={int(nf)}: "
                  f"{ms:.2f} ms/step  ({batch / ms * 1e3:.0f} img/s)")

    # ---- phase decomposition at the DEFAULT config --------------------------
    model, state, sched, tx = build(True, True)

    @jax.jit
    def fwd_only(params):
        return train_loss(model, params, batch_data, key, jnp.ones((2,)))[0]

    @jax.jit
    def fwd_bwd(params):
        return jax.value_and_grad(
            lambda p: train_loss(model, p, batch_data, key, jnp.ones((2,)))[0]
        )(params)

    grads = fwd_bwd(state.params)[1]
    jax_block(grads)

    @jax.jit
    def update_only(state, grads):
        return state.apply_gradients(grads)

    ms_fwd = _timed(fwd_only, state.params, reps=reps)
    ms_fwd_bwd = _timed(lambda p: fwd_bwd(p)[0], state.params, reps=reps)
    ms_update = _timed(update_only, state, grads, reps=reps)
    print(f"phase: forward(loss)        {ms_fwd:.2f} ms")
    print(f"phase: forward+backward     {ms_fwd_bwd:.2f} ms  "
          f"(backward ~= {ms_fwd_bwd - ms_fwd:.2f} ms)")
    print(f"phase: Adam update + EMA    {ms_update:.2f} ms")

    # ---- cost analysis -> roofline bounds ------------------------------------
    for name, fn, args in (("forward", fwd_only, (state.params,)),
                           ("fwd+bwd", fwd_bwd, (state.params,))):
        cost = jax.jit(fn).lower(*args).compile().cost_analysis()
        flops = cost.get("flops", 0.0)
        bytes_ = cost.get("bytes accessed", 0.0)
        print(f"cost[{name}]: {flops/1e9:.2f} GFLOP, {bytes_/1e6:.1f} MB "
              f"-> bf16-MXU bound {flops/197e12*1e3:.2f} ms, "
              f"HBM bound {bytes_/819e9*1e3:.2f} ms")

    profile_dir = os.environ.get("PROFILE_DIR")
    if profile_dir:
        step = jax.jit(make_train_step(model, jnp.ones((2,)), sched))
        step(state, batch_data, key)  # warm
        with jax.profiler.trace(profile_dir):
            jax_block(step(state, batch_data, key)[0])
        print(f"trace -> {profile_dir}")


if __name__ == "__main__":
    main()
