"""Serving export: the compiled ancestral sampler as a StableHLO artifact.

No reference analog (the PyTorch reference deploys by shipping the repo and
a `.pt` checkpoint). TPU-natively, the deployable unit is the *compiled
program*: `jax.export` serializes the jitted sampler — weights baked in as
constants, the full T-step `lax.scan` inside — to a self-contained,
version-stable StableHLO artifact that a serving process can deserialize
and call without any ccdm_tpu (or flax) code on the serving side.

Artifact contract:
    serve(images [B,H,W,Ci] f32, seed uint32[2]) -> probs [B,S,H,W,C] f32

`seed` is a raw legacy PRNG key (`jax.random.PRNGKey(n)`), so callers don't
need typed-key plumbing. The batch size is static — export one artifact per
served batch shape (XLA compiles per shape anyway; serving stacks pick
shapes up front).

Platforms: by default the artifact targets the platform it was exported on
(export on the TPU host for TPU serving — the Pallas flash-attention path
then embeds its TPU custom calls). Pass `platforms=("cpu", "tpu")` for a
multi-platform artifact when the model's shapes stay on the dense-attention
path (Pallas custom calls are platform-specific and refuse cross-lowering).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jax_export


def export_sampler(
    model,
    params,
    image_shape: Tuple[int, int, int],
    *,
    num_samples: int,
    num_steps: Optional[int] = None,
    batch_size: int = 1,
    feature_fn=None,
    platforms: Optional[Sequence[str]] = None,
) -> bytes:
    """Serialize the ready-to-serve sampler (weights baked in) to bytes.

    `model`/`params`/`feature_fn` as for `make_prob_sampler` — including a
    quant-calibrated model (`quantized_inference: static` travels inside).
    """
    from ccdm_tpu.eval.lidc_uncertainty import make_prob_sampler

    sampler = make_prob_sampler(model, num_samples, num_steps,
                                feature_fn=feature_fn)

    def serve(images, seed):
        return sampler(params, images, seed)

    args = (
        jax.ShapeDtypeStruct((batch_size, *image_shape), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    exported = jax_export.export(
        jax.jit(serve),
        platforms=list(platforms) if platforms is not None else None,
    )(*args)
    return exported.serialize()


def save_sampler(path: str, *args, **kwargs) -> str:
    """`export_sampler` to a file; returns the path."""
    blob = export_sampler(*args, **kwargs)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_sampler(path_or_bytes):
    """Deserialize an artifact -> callable `serve(images, seed) -> probs`.

    Needs only jax on the serving side; the returned callable is the
    artifact's compiled program (jit-wrapped for dispatch caching).
    """
    blob = path_or_bytes
    if isinstance(blob, str):
        with open(blob, "rb") as f:
            blob = f.read()
    exported = jax_export.deserialize(blob)
    return jax.jit(exported.call)
