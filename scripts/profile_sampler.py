#!/usr/bin/env python
"""Per-op profile + timing breakdown of the flagship LIDC sampler on TPU.

Produces:
- wall-clock per sampler step at the bench batch (8 images x 16 samples),
- XLA cost-analysis bytes/FLOPs for one UNet forward,
- optionally a jax.profiler trace (PROFILE_DIR env) for op-level inspection.

Used to decide kernel-fusion work (PERFNOTES.md). Run alone: one JAX process
at a time through the TPU tunnel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import FLAGSHIP_PARAMS
    from ccdm_tpu.eval.lidc_uncertainty import make_prob_sampler
    from ccdm_tpu.models.builder import build_model

    num_images = int(os.environ.get("BENCH_IMAGES", 8))
    num_samples = int(os.environ.get("BENCH_SAMPLES", 16))
    num_steps = int(os.environ.get("BENCH_STEPS", 250))
    h = w = 128
    cfg = dict(FLAGSHIP_PARAMS, step_T_sample="confidence")

    model = build_model(cfg, num_classes=2, image_channels=1, image_size=h)
    params = model.init(jax.random.PRNGKey(0), (h, w, 1))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((num_images, h, w, 1)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    sampler = make_prob_sampler(model, num_samples, num_steps)
    float(jnp.sum(sampler(params, images, key)))  # compile + warm

    t0 = time.perf_counter()
    float(jnp.sum(sampler(params, images, key)))
    dt = time.perf_counter() - t0
    print(f"sampler: {dt*1e3:.1f} ms total, {dt/num_steps*1e3:.3f} ms/step, "
          f"{num_images*num_samples/dt:.2f} samples/s")

    # one UNet forward at the in-scan batch, cost analysis
    b = num_images * num_samples
    xt = jax.nn.one_hot(jnp.zeros((b, h, w), jnp.int32), 2)
    cond = jnp.broadcast_to(images[:, None], (num_images, num_samples, h, w, 1)
                            ).reshape(b, h, w, 1)
    t = jnp.full((b,), 125, jnp.int32)

    def fwd(p, xt, cond, t):
        return model.apply(p, xt, cond, t)["diffusion_out"]

    lowered = jax.jit(fwd).lower(params, xt, cond, t)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print(f"unet fwd cost analysis: {ca.get('flops', 0)/1e9:.1f} GFLOP, "
          f"{ca.get('bytes accessed', 0)/1e9:.2f} GB accessed")
    for k in sorted(ca):
        if k.startswith("bytes accessed") and ca[k] > 1e8:
            print(f"  {k}: {ca[k]/1e9:.2f} GB")

    jitted = jax.jit(fwd)
    out = jitted(params, xt, cond, t)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(5):
        out = jitted(params, xt, cond, t)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / 5
    print(f"unet fwd alone: {dt*1e3:.2f} ms/call at batch {b} (incl dispatch)")

    pdir = os.environ.get("PROFILE_DIR")
    if pdir:
        with jax.profiler.trace(pdir):
            float(jnp.sum(sampler(params, images, jax.random.fold_in(key, 7))))
        print(f"trace written to {pdir}")


if __name__ == "__main__":
    main()
