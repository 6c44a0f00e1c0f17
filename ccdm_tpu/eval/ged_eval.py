"""In-training / standalone GED + HM-IoU validation over a multi-annotator set.

Parity: `compute_ged` (`ddpm/trainer.py:137-189`) — for every validation
image, generate `num_samples` segmentations *in one batched device pass*
(the reference's `repeat_interleave` trick, `trainer.py:155-158`;
`evaluate_lidc_uncertainty.py:96-103`), then score GED / sample-diversity /
HM-IoU against the expert masks. The sampler is one compiled `lax.scan`; the
sample axis rides the batch dimension, so a single chip generates
B*num_samples maps per launch and a mesh shards them across chips.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ccdm_tpu.eval.metrics import generalised_energy_distance, hungarian_matched_iou
from ccdm_tpu.models.builder import DenoisingModel

LOGGER = logging.getLogger(__name__)


def make_batched_sampler(model: DenoisingModel, num_samples: int,
                         num_steps: Optional[int] = None, feature_fn=None):
    """Returns a jitted `(params, images [B,H,W,Ci], key, indices=None,
    feature_params=None) -> [B,S,H,W] int32`.

    Compiles once per (B, S, K) combination and is reused across batches —
    cache and reuse the returned function across validation events too (a
    fresh `make_batched_sampler` per event re-traces and re-compiles the
    whole K-step scan).

    `feature_fn` optionally computes the DINO feature condition from the
    images once per batch; it is repeated across the sample axis exactly
    like the condition itself (`trainer.py:151-155` parity). Weights that
    CHANGE across calls (the trainable-encoder EMA) must not be closed
    over — pass a 2-arg `feature_fn(feature_params, images)` and supply
    `feature_params` at each call instead.
    """
    # one shared core: the batch-composition-independent PRNG discipline
    # (global-id key folding, per-key prior, element-keyed chain) lives ONLY
    # in make_prob_sampler — this wrapper just takes the argmax class maps
    from ccdm_tpu.eval.lidc_uncertainty import make_prob_sampler

    prob_sampler = make_prob_sampler(model, num_samples, num_steps, feature_fn)

    def run(params, images, key, indices=None, feature_params=None):
        probs = prob_sampler(params, images, key, indices,
                             feature_params=feature_params)
        return jnp.argmax(probs, axis=-1).astype(jnp.int32)  # [B,S,H,W]

    return jax.jit(run)


def compute_ged(
    model: DenoisingModel,
    params,
    dataset,
    num_samples: int,
    batch_size: int,
    key: jax.Array,
    num_steps: Optional[int] = None,
    max_batches: Optional[int] = None,
    feature_fn=None,
    feature_params=None,
    sampler=None,
    process_index: int = 0,
    process_count: int = 1,
):
    """Mean (GED, sample diversity, HM-IoU) over the dataset.

    `dataset` yields eval-protocol samples `{'image','labels'[A,H,W,C],...}`.

    Multi-host: with `process_count > 1` each host scores only its strided
    slice `dataset[process_index::process_count]` on its OWN devices (no
    SPMD program), and the partial sums are combined once at the end with a
    single allgather — validation wall-time scales down with host count and
    every host returns the identical global means.
    """
    from ccdm_tpu.parallel.mesh import allgather_f64, host_slice, pad_chunk

    num_classes = model.diffusion.num_classes
    if sampler is None:
        sampler = make_batched_sampler(model, num_samples, num_steps, feature_fn)

    total_ged = total_div = total_hm = 0.0
    count = 0
    n = len(dataset)
    bs = max(1, min(batch_size, n))
    if max_batches is not None:
        # a GLOBAL image budget (max_batches single-host batches), then
        # host-sharded: the scored image set — and therefore the returned
        # means — is identical for every process_count
        n = min(n, max_batches * bs)
    my_indices = host_slice(n, process_index, process_count)
    for start in range(0, len(my_indices), bs):
        idx, real = pad_chunk(my_indices[start:start + bs], bs)
        samples = [dataset.get(i) for i in idx]
        images = np.stack([s["image"] for s in samples])
        labels = np.stack([s["labels"] for s in samples[:real]])  # [B,A,H,W,C]
        refs = np.argmax(labels, axis=-1).astype(np.int32)

        # per-image keys from the GLOBAL dataset positions: the same image
        # gets the same draws for any host count or batch composition
        preds = sampler(params, jnp.asarray(images), key,
                        jnp.asarray(idx, jnp.int32),
                        feature_params=feature_params)[:real]  # [B,S,H,W]

        ged, div_s, _ = generalised_energy_distance(preds, jnp.asarray(refs), num_classes)
        hm = hungarian_matched_iou(preds, jnp.asarray(refs), num_classes)
        total_ged += float(np.sum(ged))
        total_div += float(np.sum(div_s))
        total_hm += float(np.sum(hm))
        count += real

    if process_count > 1:
        parts = allgather_f64(
            np.asarray([total_ged, total_div, total_hm, float(count)]))
        total_ged, total_div, total_hm, count = [float(x) for x in parts.sum(axis=0)]

    if count == 0:
        raise ValueError("empty validation dataset")
    return total_ged / count, total_div / count, total_hm / count
