#!/usr/bin/env python
"""Per-op profile + timing breakdown of the flagship LIDC sampler on TPU.

Produces:
- wall-clock per sampler step at the bench batch (8 images x 16 samples),
- XLA cost-analysis bytes/FLOPs for one UNet forward,
- optionally a jax.profiler trace (PROFILE_DIR env) for op-level inspection.

PROFILE_MODE=cityscapes profiles the hard config instead: 256x512 20-class
UNet with DINO ViT-B/8 features at the measured knee batch (16 images x 8
votes, PERFNOTES round-4 "Cityscapes batch scaling"), reporting ms/step,
the UNet forward's cost analysis, and the implied HBM roofline fraction.

Used to decide kernel-fusion work (PERFNOTES.md). Run alone: one JAX process
at a time through the TPU tunnel, AND on an otherwise idle host — a loaded
host starves the tunnel client thread and inflates scan timings (measured:
the same B=128 scan read 424 ms/step under a concurrent pytest run vs
216 ms/step idle, a clean 2x lie).
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
    from bench import _await_backend, _resolve_backend

    _resolve_backend()
    _await_backend()

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


def main_cityscapes():
    """Where the time goes in the 256x512 + DINO sampler at the knee batch."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # Same fail-fast backend probe + init watchdog as bench.py: the first
    # device touch through the axon tunnel can otherwise hang for hours
    # when the chip claim retries in a sleep loop (ADVICE r4 low #3).
    from bench import _await_backend, _resolve_backend

    _resolve_backend()
    _await_backend()

    from bench import CITYSCAPES_BENCH_PARAMS
    from ccdm_tpu.eval.lidc_uncertainty import build_eval_feature_fn, make_prob_sampler
    from ccdm_tpu.models.builder import build_model

    num_images = int(os.environ.get("BENCH_IMAGES", 16))
    num_samples = int(os.environ.get("BENCH_SAMPLES", 8))
    # two scan lengths difference the ~25-35 ms tunnel launch overhead out
    # (the PERFNOTES round-1 "calibrated micro-profile" method)
    steps_lo = int(os.environ.get("PROFILE_STEPS_LO", 10))
    steps_hi = int(os.environ.get("PROFILE_STEPS_HI", 50))
    h, w, c = 256, 512, 20

    cfg = dict(CITYSCAPES_BENCH_PARAMS)
    model = build_model(cfg, num_classes=c, image_channels=3, image_size=h)
    feature_fn, feature_shape, enc_params = build_eval_feature_fn(cfg, (h, w, 3))
    params = model.init(jax.random.PRNGKey(0), (h, w, 3),
                        feature_shape=feature_shape)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((num_images, h, w, 3)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    # DINO features once (fixed per-call cost, timed separately); the value
    # readback forces real completion — through the tunnel,
    # block_until_ready returns optimistically (PERFNOTES round-1 lever #3)
    feat_jit = jax.jit(feature_fn)
    feats = feat_jit(enc_params, images)
    float(jnp.sum(feats))
    t0 = time.perf_counter()
    float(jnp.sum(feat_jit(enc_params, images)))
    enc_dt = time.perf_counter() - t0
    print(f"dino vitb8 encoder: {enc_dt*1e3:.1f} ms/call "
          f"(once per {num_images}-image protocol call)")

    samplers = {}
    for steps in (steps_lo, steps_hi):
        s = make_prob_sampler(model, num_samples, steps,
                              feature_fn=lambda f, img: f)
        float(jnp.sum(s(params, images, key, feature_params=feats)))  # compile
        samplers[steps] = s

    def timed(steps, reps=3):
        t0 = time.perf_counter()
        for i in range(reps):
            float(jnp.sum(samplers[steps](
                params, images, jax.random.fold_in(key, i),
                feature_params=feats)))
        return (time.perf_counter() - t0) / reps

    dt_lo, dt_hi = timed(steps_lo), timed(steps_hi)
    ms_step = (dt_hi - dt_lo) / (steps_hi - steps_lo) * 1e3
    b = num_images * num_samples
    print(f"sampler: {ms_step:.2f} ms/step at B={b} in flight "
          f"({steps_hi}-{steps_lo} scan difference); "
          f"full 250-step protocol implies "
          f"{b / (ms_step / 1e3 * 250 + enc_dt):.3f} samples/s/chip")

    # one UNet forward at the in-scan batch: FLOPs + HBM bytes -> roofline
    xt = jax.nn.one_hot(jnp.zeros((b, h, w), jnp.int32), c)
    cond = jnp.broadcast_to(images[:, None],
                            (num_images, num_samples, h, w, 3)).reshape(b, h, w, 3)
    fcond = jnp.broadcast_to(
        feats[:, None], (num_images, num_samples) + feats.shape[1:]
    ).reshape((b,) + feats.shape[1:])
    t = jnp.full((b,), 125, jnp.int32)

    def fwd(p, xt, cond, fc, t):
        return model.apply(p, xt, cond, t, feature_condition=fc)["diffusion_out"]

    compiled = jax.jit(fwd).lower(params, xt, cond, fcond, t).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops, byts = ca.get("flops", 0), ca.get("bytes accessed", 0)
    print(f"unet fwd cost analysis at B={b}: {flops/1e12:.2f} TFLOP, "
          f"{byts/1e9:.2f} GB accessed")
    # v5e: ~197 bf16 TFLOP/s, ~819 GB/s HBM
    t_mxu = flops / 197e12
    t_hbm = byts / 819e9
    print(f"  speed-of-light: MXU-bound {t_mxu*1e3:.2f} ms vs HBM-bound "
          f"{t_hbm*1e3:.2f} ms -> {'HBM' if t_hbm > t_mxu else 'MXU'}-limited; "
          f"fraction of roofline achieved (max(bound) / measured step) = "
          f"{max(t_mxu, t_hbm)*1e3 / ms_step * 100:.0f}% "
          f"(step also includes posterior+sampling)")

    pdir = os.environ.get("PROFILE_DIR")
    if pdir:
        with jax.profiler.trace(pdir):
            float(jnp.sum(samplers[steps_lo](
                params, images, jax.random.fold_in(key, 7),
                feature_params=feats)))
        print(f"trace written to {pdir}")


if __name__ == "__main__":
    if os.environ.get("PROFILE_MODE") == "cityscapes":
        main_cityscapes()
    else:
        main()
