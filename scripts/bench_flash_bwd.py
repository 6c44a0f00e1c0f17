#!/usr/bin/env python
"""Time the flash-attention BACKWARD paths on TPU: streaming query-block
scan vs dense T x T (and XLA's dense-attention autodiff as the control).

The streaming backward (ops/flash_attention.py, `_bwd_streaming`) engages
above BWD_DENSE_MAX_ELEMENTS attention entries per (batch, head); it exists
so that large-T training (256x512 DINO at ds=8: T=2048) never materialises
the [B,H,T,T] tensor. This script records what that memory guarantee costs
(or saves) in wall-clock at the geometry that triggers it, and validates the
switch constant by timing BOTH paths at each geometry (the module constant
is overridden before tracing — the path choice is a trace-time branch).

Measurement protocol (PERFNOTES "Host-dispatch" note): through the axon
tunnel `block_until_ready` returns optimistically and per-call host timing
under-measures, so each variant runs REPS chained grad calls inside ONE
compiled `lax.scan` (q is perturbed by eps*dq each step to serialise the
chain) and ms/call = (T(reps=R) - T(reps=1)) / (R-1), with a scalar
readback forcing execution. Compile time is excluded via explicit AOT
lower+compile.

Usage: python scripts/bench_flash_bwd.py   # BENCH_TS/BENCH_B/BENCH_H/BENCH_DH
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

    from ccdm_tpu.ops import flash_attention as fa

    ts_list = [int(x) for x in os.environ.get("BENCH_TS", "2048,1024").split(",")]
    b = int(os.environ.get("BENCH_B", 16))
    h = int(os.environ.get("BENCH_H", 16))
    dh = int(os.environ.get("BENCH_DH", 32))
    reps = int(os.environ.get("BENCH_REPS", 8))
    timings = int(os.environ.get("BENCH_TIMINGS", 3))

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v).astype(jnp.float32) ** 2)

    def loss_dense_control(q, k, v):
        # plain XLA attention, autodiff backward (the non-flash path)
        s = 1.0 / (dh ** 0.5)
        logits = jnp.einsum("bthd,bshd->bhts", q, k,
                            preferred_element_type=jnp.float32) * s
        a = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhts,bshd->bthd", a, v.astype(jnp.float32))
        return jnp.sum(out ** 2)

    def timed_ms_per_call(loss_fn, q, k, v):
        """One compiled scan of `reps` chained grad calls; subtract the
        1-rep program's wall time to cancel dispatch/launch overhead."""
        grad_fn = jax.grad(loss_fn, argnums=(0, 1, 2))

        def make(n):
            def run(q, k, v):
                def body(carry, _):
                    qc, acc = carry
                    dq, dk, dv = grad_fn(qc, k, v)
                    qc = qc + jnp.asarray(1e-6, qc.dtype) * dq.astype(qc.dtype)
                    acc = acc + jnp.sum(dk.astype(jnp.float32)) \
                              + jnp.sum(dv.astype(jnp.float32))
                    return (qc, acc), None
                (_, acc), _ = jax.lax.scan(
                    body, (q, jnp.float32(0)), None, length=n)
                return acc
            return jax.jit(run).lower(q, k, v).compile()

        prog_r, prog_1 = make(reps), make(1)
        best = {reps: float("inf"), 1: float("inf")}
        for n, prog in ((reps, prog_r), (1, prog_1)):
            for _ in range(timings + 1):  # first call discarded (warm caches)
                t0 = time.perf_counter()
                acc = prog(q, k, v)
                float(acc)  # host readback forces full execution
                best[n] = min(best[n], time.perf_counter() - t0)
            # the warmup call's time is included in min() — acceptable: min
            # over timings+1 calls is what we want anyway
        return 1e3 * (best[reps] - best[1]) / (reps - 1)

    results = {}
    for t in ts_list:
        rng = np.random.default_rng(0)
        mk = lambda: jnp.asarray(  # noqa: E731
            rng.standard_normal((b, t, h, dh)).astype(np.float32), jnp.bfloat16)
        q, k, v = mk(), mk(), mk()
        default_streaming = t * t > fa.BWD_DENSE_MAX_ELEMENTS
        variants = [("flash_fwd+streaming_bwd", loss_flash, 0),
                    ("flash_fwd+dense_bwd", loss_flash, 1 << 62),
                    ("xla_dense_autodiff", loss_dense_control, None)]
        saved = fa.BWD_DENSE_MAX_ELEMENTS
        for name, fn, forced in variants:
            try:
                if forced is not None:
                    fa.BWD_DENSE_MAX_ELEMENTS = forced
                ms = timed_ms_per_call(fn, q, k, v)
                results[f"T{t}/{name}"] = round(ms, 3)
            except Exception as e:  # OOM expected for dense at huge T
                results[f"T{t}/{name}"] = f"failed: {type(e).__name__}"
            finally:
                fa.BWD_DENSE_MAX_ELEMENTS = saved
        results[f"T{t}/default_path"] = (
            "streaming" if default_streaming else "dense")

    print(json.dumps({
        "metric": "flash_attention_bwd_ms",
        "unit": "ms/grad-call",
        "config": {"B": b, "H": h, "dh": dh, "reps": reps,
                   "switch_elements": fa.BWD_DENSE_MAX_ELEMENTS,
                   "device": str(jax.devices()[0])},
        **results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
