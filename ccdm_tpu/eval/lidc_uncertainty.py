"""LIDC uncertainty evaluation: GED / diversity / HM-IoU / Dice / mIoU.

Parity: `evaluation/evaluate_lidc_uncertainty.py` —

- per test image, generate `max(evaluations)` segmentation samples **in one
  batched device pass** (`:93-103`; here the sample axis rides the batch dim
  of a single compiled `lax.scan` sampler)
- GED + sample diversity + expert diversity + HM-IoU at every sample count in
  `evaluations` (`:108-123`)
- confusion-matrix Dice/IoU/mIoU on the mean log-probability prediction,
  replicated once per *non-empty* expert mask (`:125-136`) — empty expert
  masks are excluded, matching the reference exactly
- the EMA ("average_model") weights are evaluated (`:138-143`)

Scaling: single-process multi-chip runs shard the B*S generation batch over
a local device mesh; multi-process runs give each host a strided slice of
the test set and combine partial sums with one allgather. Every (image,
sample) pair's noise is keyed by its GLOBAL dataset position
(`make_prob_sampler` `indices`), so results are identical for any host
count, batch size, or sharding.

Returns a metrics dict; the CLI logs it in the reference's format.
"""

from __future__ import annotations

import logging
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ccdm_tpu.config import with_defaults
from ccdm_tpu.data.registry import resolve_dataset_module
from ccdm_tpu.diffusion.sampling import (
    SamplerConfig,
    ancestral_sampler,
    sample_prior_per_key,
)
from ccdm_tpu.eval.metrics import (
    ConfusionMatrix,
    generalised_energy_distance,
    hungarian_matched_iou,
)
from ccdm_tpu.models.builder import DenoisingModel, build_model
from ccdm_tpu.train.checkpoint import load_tree

LOGGER = logging.getLogger(__name__)


def make_prob_sampler(model: DenoisingModel, num_samples: int,
                      num_steps: Optional[int] = None, feature_fn=None,
                      mesh=None, encoder_reuse: int = 1):
    """Jitted `(params, images [B,H,W,Ci], key, indices=None) -> probs [B,S,H,W,C]`.

    Uses the model's `step_T_sample` mode for the final step; "confidence"
    yields probability maps (the eval default, `params_eval.yml:4`).

    PRNG discipline: every (image, sample) pair draws its prior and chain
    noise from a key folded on `index*num_samples + sample`, where `indices`
    [B] are GLOBAL dataset positions (default `arange(B)`). A given image's
    draws are therefore a pure function of (key, global index) — identical
    across batch sizes, batch compositions, host counts, and shardings.

    With `mesh`, the B*S generation batch is sharded over the 'data' axis and
    params follow the TP layout rule — multi-chip inference with the same
    call signature (collectives emitted by XLA).

    `feature_fn` is 2-arg `feature_fn(feature_params, images)` with the
    weights supplied at each call — for trainable encoders because the EMA
    changes across calls, and for frozen ones because closed-over weights
    become HLO constants (a ViT-B/8 exceeds remote-compile request limits).
    A legacy 1-arg closure still works when `feature_params` is None.
    """
    cfg = SamplerConfig(num_steps=num_steps or model.time_steps,
                        step_T_sample=model.step_T_sample,
                        encoder_reuse=int(encoder_reuse))
    c = model.diffusion.num_classes

    def run(params, images, key, indices=None, feature_params=None):
        b, h, w, _ = images.shape
        if indices is None:
            indices = jnp.arange(b, dtype=jnp.int32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            images = jax.lax.with_sharding_constraint(
                images, NamedSharding(mesh, P()))
        cond = jnp.repeat(images, num_samples, axis=0)
        fc = None
        if feature_fn is not None:
            feats = (feature_fn(feature_params, images)
                     if feature_params is not None else feature_fn(images))
            fc = jnp.repeat(feats, num_samples, axis=0)
        # one key per (image, sample), folded on the global flat id
        gid = (indices[:, None] * num_samples
               + jnp.arange(num_samples, dtype=jnp.int32)).reshape(-1)
        k_prior, k_chain = jax.random.split(key)
        prior_keys = jax.vmap(jax.random.fold_in, (None, 0))(k_prior, gid)
        chain_keys = jax.vmap(jax.random.fold_in, (None, 0))(k_chain, gid)
        xt = sample_prior_per_key(prior_keys, h, w, c)
        if mesh is not None:
            from ccdm_tpu.parallel.mesh import batch_sharding

            sh = batch_sharding(mesh)
            cond = jax.lax.with_sharding_constraint(cond, sh)
            xt = jax.lax.with_sharding_constraint(xt, sh)
            if fc is not None:
                fc = jax.lax.with_sharding_constraint(fc, sh)
        pair = (model.denoise_fns_cached(params, cond, fc)
                if cfg.encoder_reuse > 1 else None)
        out = ancestral_sampler(
            model.diffusion, model.denoise_fn(params, cond, fc), xt, k_chain,
            cfg, element_keys=chain_keys, denoise_pair=pair)
        return out.reshape(b, num_samples, h, w, c)

    return jax.jit(run)


def load_eval_params(params: Dict[str, Any], model: DenoisingModel, image_shape,
                     feature_shape=None):
    """EMA weights from `load_from`, or fresh init if absent (smoke paths)."""
    load_from = params.get("load_from")
    init = model.init(jax.random.PRNGKey(int(params.get("seed", 0))), image_shape,
                      feature_shape=feature_shape)
    if not load_from:
        LOGGER.warning("no load_from given — evaluating randomly initialised weights")
        return init
    tree = load_tree(load_from)
    restored = tree.get("average_model", tree.get("model"))
    if restored is None:
        raise KeyError(f"checkpoint at {load_from!r} has no average_model/model key")
    return jax.tree.map(lambda t, i: jnp.asarray(t, i.dtype), restored, init)


def build_eval_feature_fn(params: Dict[str, Any], image_shape):
    """Eval-time DINO conditioning: `(feature_fn, feature_shape, enc_params)`
    — all None when no encoder is configured.

    `feature_fn(enc_params, images)` is 2-arg: the weights thread through
    every jit as an ARGUMENT. Closing a ViT-B/8 (~340 MB fp32) over the
    sampler bakes it into the HLO as constants, which exceeds remote-compile
    request limits (observed HTTP 413 through the TPU tunnel) and bloats the
    persistent compile cache.

    Encoder weights resolve in the reference's fallback order
    (`eval_cdm.py:131-144`): checkpoint `average_feature_cond_encoder`, then
    `feature_cond_encoder`, then the converted-npz `weights:` file, else the
    random init (with a warning).
    """
    fce = params.get("feature_cond_encoder") or {"type": "none"}
    if fce.get("type") != "dino":
        return None, None, None
    from ccdm_tpu.models.dino import DinoFeatureEncoder

    encoder = DinoFeatureEncoder(fce)
    enc_params = encoder.init(jax.random.PRNGKey(7), image_shape)
    loaded = False
    load_from = params.get("load_from")
    if load_from:
        try:
            tree = load_tree(load_from)
            for key in ("average_feature_cond_encoder", "feature_cond_encoder"):
                if key in tree:
                    enc_params = jax.tree.map(
                        lambda t, i: jnp.asarray(t, i.dtype), tree[key], enc_params)
                    loaded = True
                    LOGGER.info("loaded encoder weights from checkpoint key %r", key)
                    break
        except FileNotFoundError:
            pass
    if not loaded and fce.get("weights"):
        enc_params = encoder.load_pretrained(fce["weights"], enc_params)
        loaded = True
    if not loaded:
        LOGGER.warning("DINO eval conditioning with RANDOM encoder weights")
    feature_shape = (image_shape[0] // encoder.stride,
                     image_shape[1] // encoder.stride, encoder.channels)
    return (lambda p, img: encoder(p, img)), feature_shape, enc_params


def eval_lidc_uncertainty(params: Dict[str, Any], num_steps: Optional[int] = None,
                          model_params=None) -> Dict[str, Any]:
    # with_defaults maps evaluation_vote_strategy -> step_T_sample
    # (reference: `trainer.py:599`), so "confidence" reaches the sampler's
    # final step here
    params = with_defaults(params)
    module = resolve_dataset_module(params["dataset_file"])
    dataset = module.test_dataset(params.get("dataset_val_max_size"))
    num_classes = module.get_num_classes()
    LOGGER.info("%d images in test dataset '%s'", len(dataset), params["dataset_file"])

    evaluations: List[int] = params.get("evaluations", 8)
    if isinstance(evaluations, int):
        evaluations = [evaluations]
    max_samples = max(evaluations)

    first = dataset.get(0)
    image_shape = first["image"].shape
    model = build_model(params, num_classes, image_channels=image_shape[-1],
                        image_size=min(image_shape[:2]))  # builder.py:36 parity
    feature_fn, feature_shape, enc_params = build_eval_feature_fn(params, image_shape)
    if model_params is None:
        model_params = load_eval_params(params, model, image_shape, feature_shape)

    if str(params.get("quantized_inference", "")).lower() == "static":
        # calibrated static activation scales: one short eager rollout on the
        # first test images; the scales travel with the model and enter the
        # compiled sampler as constants (ops/quant.py; measured +8% over
        # float vs -12% for the dynamic-scale mode — PERFNOTES.md)
        from ccdm_tpu.ops import quant

        n_cal = min(len(dataset), 2)
        model = quant.calibrate_static_scales(
            model, model_params,
            np.stack([dataset.get(i)["image"] for i in range(n_cal)]),
            feature_fn=feature_fn, feature_params=enc_params)

    from ccdm_tpu.parallel.mesh import mesh_for_eval

    pidx, pcnt = jax.process_index(), jax.process_count()
    batch_size = max(1, int(params.get("batch_size", 2)))
    n = len(dataset)
    batch_size = min(batch_size, max(n, 1))
    mesh = mesh_for_eval(batch_size * max_samples)
    if mesh is not None:
        LOGGER.info("sharding the %dx%d generation batch over %d chips",
                    batch_size, max_samples, len(jax.local_devices()))
    sampler = make_prob_sampler(model, max_samples, num_steps, feature_fn,
                                mesh=mesh,
                                encoder_reuse=int(params.get("encoder_reuse", 1)))
    key = jax.random.PRNGKey(int(params.get("seed", 0)))

    geds = np.zeros(len(evaluations))
    div_samples = np.zeros(len(evaluations))
    div_experts = np.zeros(len(evaluations))
    hm_ious = np.zeros(len(evaluations))
    cm = ConfusionMatrix(num_classes)
    num_annotators = first["labels"].shape[0]
    nonzero_total = 0
    count = 0
    batch_seconds: List[float] = []
    batch_real: List[int] = []

    # multi-host: strided slice per host, combined by a single allgather at
    # the end. Each image's draws are keyed by its GLOBAL dataset position
    # (make_prob_sampler's `indices`), so results are identical for every
    # host count, batch size, and batch composition.
    from ccdm_tpu.parallel.mesh import allgather_f64, host_slice, pad_chunk

    my_indices = host_slice(n)
    for start in range(0, len(my_indices), batch_size):
        idx, real = pad_chunk(my_indices[start:start + batch_size], batch_size)
        samples = [dataset.get(i) for i in idx]
        images = jnp.asarray(np.stack([s["image"] for s in samples]))
        labels = np.stack([s["labels"][...] for s in samples[:real]])  # [B,A,H,W,C]
        refs = np.argmax(labels, axis=-1).astype(np.int32)  # [B,A,H,W]

        t0 = time.perf_counter()
        probs = sampler(model_params, images, key,
                        jnp.asarray(idx, jnp.int32),
                        feature_params=enc_params)  # [B,S,H,W,C]
        probs.block_until_ready()
        batch_seconds.append(time.perf_counter() - t0)
        batch_real.append(real)
        probs = probs[:real]
        pred_idx = jnp.argmax(probs, axis=-1).astype(jnp.int32)  # [B,S,H,W]

        refs_j = jnp.asarray(refs)
        for i, s in enumerate(evaluations):
            ged, div_s, div_e = generalised_energy_distance(pred_idx[:, :s], refs_j, num_classes)
            geds[i] += ged.sum()
            div_samples[i] += div_s.sum()
            div_experts[i] += div_e.sum()
            hm_ious[i] += hungarian_matched_iou(pred_idx[:, :s], refs_j, num_classes).sum()

        # CM on mean log-prob predictions vs each non-empty expert mask
        # (evaluate_lidc_uncertainty.py:125-136)
        mean_log = np.asarray(jnp.mean(jnp.log(jnp.clip(probs, min=1e-30)), axis=1))
        mean_pred = np.argmax(mean_log, axis=-1)  # [B,H,W]
        nonzero = refs.sum(axis=(2, 3)) > 0  # [B,A]
        nonzero_total += int(nonzero.sum())
        for b in range(refs.shape[0]):
            for a in range(refs.shape[1]):
                if nonzero[b, a]:
                    cm.update(mean_pred[b], refs[b, a])
        count += real

    # steady-state throughput: the first batch pays the XLA compile, so
    # exclude it whenever a second batch exists; count only REAL samples
    # (the padded tail images are duplicated work, not generated output)
    gen_seconds = sum(batch_seconds)
    steady = list(zip(batch_seconds, batch_real))
    if len(steady) > 1:
        steady = steady[1:]
    steady_samples = sum(r for _, r in steady) * max_samples
    steady_seconds = sum(s for s, _ in steady)

    if pcnt > 1:
        # ONE allgather combines every host's partials: counts/sums reduce
        # by +, the wall-clock columns by max (hosts ran in parallel, so
        # aggregate throughput divides by the SLOWEST host)
        scalars = np.concatenate([
            geds, div_samples, div_experts, hm_ious,
            cm.matrix.reshape(-1).astype(np.float64),
            [float(count), float(nonzero_total), float(steady_samples),
             float(steady_seconds), float(gen_seconds)],
        ])
        parts = allgather_f64(scalars)
        summed = parts.sum(axis=0)
        e = len(evaluations)
        geds, div_samples = summed[:e], summed[e:2 * e]
        div_experts, hm_ious = summed[2 * e:3 * e], summed[3 * e:4 * e]
        cm.matrix = summed[4 * e:4 * e + num_classes ** 2].reshape(
            num_classes, num_classes).astype(cm.matrix.dtype)
        count = int(summed[-5])
        nonzero_total = float(summed[-4])
        steady_samples = float(summed[-3])
        steady_seconds = float(parts[:, -2].max())
        gen_seconds = float(parts[:, -1].max())

    if count == 0:
        raise ValueError(f"empty test dataset ({n} images)")
    steady_rate = float(steady_samples) / max(float(steady_seconds), 1e-9)
    results: Dict[str, Any] = {
        "count": count,
        "nonzero_fraction": nonzero_total / max(count * num_annotators, 1),
        "mIoU": cm.miou(),
        "IoU": cm.iou().tolist(),
        "Dice": cm.dice().tolist(),
        "diversity_experts": float(div_experts[0] / max(count, 1)),
        "samples_per_sec": steady_rate,
        "generation_seconds": gen_seconds,
    }
    for i, s in enumerate(evaluations):
        results[f"GED_{s}"] = float(geds[i] / max(count, 1))
        results[f"diversity_{s}"] = float(div_samples[i] / max(count, 1))
        results[f"HMIoU_{s}"] = float(hm_ious[i] / max(count, 1))

    LOGGER.info("Nonzero: %.4g", results["nonzero_fraction"])
    LOGGER.info("mIoU scores: %.4g", results["mIoU"])
    LOGGER.info("IoU scores: %s", results["IoU"])
    LOGGER.info("Dice scores: %s", results["Dice"])
    LOGGER.info("Diversity experts: %.4g", results["diversity_experts"])
    for s in evaluations:
        LOGGER.info("GED (%d): %.4g", s, results[f"GED_{s}"])
        LOGGER.info("Diversity samples (%d): %.4g", s, results[f"diversity_{s}"])
        LOGGER.info("HM IoU (%d): %.4g", s, results[f"HMIoU_{s}"])
    LOGGER.info("samples/sec: %.2f", results["samples_per_sec"])

    # persist results (parity: `evaluation_path`, params_eval.yml:2);
    # every host holds the identical combined results — process 0 writes
    out_dir = params.get("evaluation_path") or params.get("output_path")
    if out_dir and pidx == 0:
        import json
        import os

        from ccdm_tpu.config import expanduservars

        out_dir = expanduservars(out_dir)
        os.makedirs(out_dir, exist_ok=True)
        tag = f"steps{num_steps}" if num_steps else "full"
        path = os.path.join(out_dir, f"lidc_uncertainty_{tag}.json")
        with open(path, "w") as f:
            json.dump(results, f, indent=2)
        LOGGER.info("wrote results to %s", path)
    return results
