#!/usr/bin/env python
"""Time the flash-attention BACKWARD paths on TPU: streaming query-block
scan vs dense T x T (and XLA's dense-attention autodiff as the control).

The streaming backward (ops/flash_attention.py, `_bwd_streaming`) engages
above BWD_DENSE_MAX_ELEMENTS attention entries per (batch, head); it exists
so that large-T training (256x512 DINO at ds=8: T=2048) never materialises
the [B,H,T,T] tensor. This script records what that memory guarantee costs
(or saves) in wall-clock at the geometry that triggers it.

Usage: python scripts/bench_flash_bwd.py   # BENCH_T/BENCH_B/BENCH_H/BENCH_DH
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

    t = int(os.environ.get("BENCH_T", 2048))
    b = int(os.environ.get("BENCH_B", 16))
    h = int(os.environ.get("BENCH_H", 16))
    dh = int(os.environ.get("BENCH_DH", 32))
    reps = int(os.environ.get("BENCH_REPS", 20))

    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.standard_normal((b, t, h, dh)).astype(np.float32), jnp.bfloat16)
    q, k, v = mk(), mk(), mk()

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

    results = {}
    for name, fn in (("flash_fwd+streaming_bwd", loss_flash),
                     ("xla_dense_autodiff", loss_dense_control)):
        g = jax.jit(jax.grad(fn, argnums=(0, 1, 2)))
        try:
            out = g(q, k, v)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(reps):
                out = g(q, k, v)
            jax.block_until_ready(out)
            results[name] = round(1e3 * (time.perf_counter() - t0) / reps, 3)
        except Exception as e:  # OOM expected for dense at huge T
            results[name] = f"failed: {type(e).__name__}"

    print(json.dumps({
        "metric": "flash_attention_bwd_ms",
        "unit": "ms/grad-call",
        "config": {"B": b, "T": t, "H": h, "dh": dh, "reps": reps,
                   "streaming_engaged": t * t > fa.BWD_DENSE_MAX_ELEMENTS,
                   "device": str(jax.devices()[0])},
        **results,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
