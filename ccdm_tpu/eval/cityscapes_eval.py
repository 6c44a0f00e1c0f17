"""Cityscapes full-image inference + official scoring.

Parity: `evaluation/eval_cdm.py` (`Evaluator`/`run_inference`) —

- `predict_single`: uniform-noise prior -> full compiled ancestral sampler
  (`eval_cdm.py:160-165`)
- `predict_multiple`: confidence vote — average of `evaluations` probability
  maps (`eval_cdm.py:177-193`). TPU-first: the vote runs ride the batch axis
  of ONE compiled sampler launch and the mean is taken on device, instead of
  the reference's sequential per-run loop
- ignore-class channel dropped before argmax (`eval_cdm.py:229`)
- optional bilinear upsample to original label resolution
  (`eval_resolution: "original"`, `eval_cdm.py:221-226`)
- streaming confusion-matrix mIoU plus PNG dumps: submission label-ids,
  color maps, raw train-ids (`eval_cdm.py:235-294`)
- final re-scoring of the saved PNGs with the official-protocol scorer +
  JSON export (`eval_cdm.py:424-432`)

Scaling (same discipline as eval/lidc_uncertainty.py): single-process
multi-chip runs shard the B*votes generation batch over a local mesh;
multi-process runs give each host a strided slice of the validation set
(PNGs named by GLOBAL dataset index, per-batch keys derived from global
positions) and combine confusion-matrix partial sums with one allgather.
The official PNG re-scoring runs on process 0 and assumes the output path
is on a filesystem all hosts share (true for single-node multi-process and
for pod slices with a common NFS scratch).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ccdm_tpu.config import expanduservars, with_defaults
from ccdm_tpu.data import cityscapes as cs_data
from ccdm_tpu.data.cityscapes_labels import decode_target_to_color, map_train_id_to_id
from ccdm_tpu.eval.cs_scoring import score_img_lists
from ccdm_tpu.eval.lidc_uncertainty import load_eval_params, make_prob_sampler
from ccdm_tpu.eval.metrics import ConfusionMatrix
from ccdm_tpu.models.builder import build_model

LOGGER = logging.getLogger(__name__)


class CityscapesEvaluator:
    def __init__(self, params: Dict[str, Any]):
        params = with_defaults(params)
        self.params = params
        self.num_classes = cs_data.get_num_classes()
        self.ignore = cs_data.get_ignore_class()
        assert self.ignore == self.num_classes - 1  # eval_cdm.py:107-109 convention

        eval_cfg = params.get("evaluation") or {}
        self.eval_resolution = eval_cfg.get("resolution", "dataloader")
        self.vote_strategy = eval_cfg.get("evaluation_vote_strategy", "confidence")
        self.num_evaluations = int(eval_cfg.get("evaluations", 1))
        assert self.eval_resolution in ("original", "dataloader")
        if self.num_evaluations > 1 and self.vote_strategy != "confidence":
            raise NotImplementedError("majority multi-vote (parity: eval_cdm.py:189)")

        self.output_path = expanduservars(params.get("output_path", "./logs/eval"))
        os.makedirs(self.output_path, exist_ok=True)
        self.cm = ConfusionMatrix(self.num_classes - 1)  # eval classes only
        self.pred_files: list = []
        self.gt_files: list = []

    def build(self, dataset, batch_size: int):
        """`batch_size` must be the CLAMPED per-host batch run() will use —
        the mesh divisibility decision is made against it here."""
        from ccdm_tpu.eval.lidc_uncertainty import build_eval_feature_fn
        from ccdm_tpu.parallel.mesh import mesh_for_eval

        first = dataset.get(0, np.random.default_rng(0))
        image_shape = first["image"].shape
        p = dict(self.params)
        p["step_T_sample"] = self.vote_strategy
        # image_size = min(H, W) selects the channel_mult table
        # (parity: `ddpm/models/builder.py:36`)
        self.model = build_model(p, self.num_classes,
                                 image_channels=image_shape[-1],
                                 image_size=min(image_shape[:2]))
        feature_fn, feature_shape, self.feature_params = build_eval_feature_fn(
            self.params, image_shape)
        self.model_params = load_eval_params(self.params, self.model, image_shape,
                                             feature_shape)
        if str(self.params.get("quantized_inference", "")).lower() == "static":
            # calibrated static activation scales (ops/quant.py; on the wide
            # Cityscapes config even DYNAMIC int8 wins 1.17x — static removes
            # the absmax passes on top of that)
            from ccdm_tpu.ops import quant

            self.model = quant.calibrate_static_scales(
                self.model, self.model_params,
                np.stack([dataset.get(i, np.random.default_rng(i))["image"]
                          for i in range(min(2, len(dataset)))]),
                feature_fn=feature_fn, feature_params=self.feature_params)
        # single-process multi-chip: shard the B*votes generation batch over
        # a local mesh (multi-process runs instead slice the dataset per
        # host, so the local computation stays unsharded)
        mesh = mesh_for_eval(batch_size * self.num_evaluations)
        if mesh is not None:
            LOGGER.info("sharding the %dx%d vote batch over %d chips",
                        batch_size, self.num_evaluations,
                        len(jax.local_devices()))
        self.sampler = make_prob_sampler(
            self.model, self.num_evaluations, feature_fn=feature_fn, mesh=mesh,
            encoder_reuse=int(self.params.get("encoder_reuse", 1)))

    def predict_batch(self, images: np.ndarray, key, indices) -> jnp.ndarray:
        """[B,H,W,3] -> averaged probability maps [B,H,W,C] (confidence vote).

        `indices` are global dataset positions — each image's votes are a
        pure function of (key, index), independent of batching/topology."""
        probs = self.sampler(self.model_params, jnp.asarray(images), key,
                             jnp.asarray(indices, jnp.int32),
                             feature_params=self.feature_params)
        return jnp.mean(probs, axis=1)  # mean over the vote axis

    def _dump_pngs(self, idx: int, pred_train_id: np.ndarray, label_train_id: np.ndarray):
        sub_dir = os.path.join(self.output_path, "submit")
        color_dir = os.path.join(self.output_path, "color")
        gt_dir = os.path.join(self.output_path, "gt")
        for d in (sub_dir, color_dir, gt_dir):
            os.makedirs(d, exist_ok=True)
        pred_ids = map_train_id_to_id(pred_train_id).astype(np.uint8)
        gt_ids = map_train_id_to_id(label_train_id).astype(np.uint8)
        pred_path = os.path.join(sub_dir, f"{idx:06d}_pred_labelIds.png")
        gt_path = os.path.join(gt_dir, f"{idx:06d}_gt_labelIds.png")
        Image.fromarray(pred_ids).save(pred_path)
        Image.fromarray(gt_ids).save(gt_path)
        Image.fromarray(decode_target_to_color(pred_train_id).astype(np.uint8)).save(
            os.path.join(color_dir, f"{idx:06d}_pred_color.png"))
        self.pred_files.append(pred_path)
        self.gt_files.append(gt_path)

    def run(self, dataset, batch_size: int, key, max_images: Optional[int] = None) -> Dict:
        n = len(dataset)
        if max_images:
            n = min(n, max_images)
        batch_size = min(batch_size, max(n, 1))
        rng = np.random.default_rng(0)
        pidx, pcnt = jax.process_index(), jax.process_count()
        img_cnt = 0
        # iIoU needs the real gtFine instanceIds PNGs, and is only geometrically
        # valid when predictions are scored at the original resolution
        # (cs_eval.py:684-691: instance path = labelIds path substitution)
        inst_files: Optional[list] = None
        if self.eval_resolution == "original" and hasattr(dataset, "label_files"):
            # dataset.get(k) reads label_files[indices[k]] (seeded-subset
            # support) — instance paths must follow the same mapping
            files = list(dataset.label_files)
            order = getattr(dataset, "indices", None)
            picked = [files[int(order[k]) if order is not None else k]
                      for k in range(n)]
            inst_files = [
                p.replace("labelIds", "instanceIds") if "labelIds" in p else None
                for p in picked
            ]
        # multi-host: strided slice per host; every image's votes are keyed
        # by its GLOBAL dataset position (identical draws for any host
        # count/batching), and PNGs are named by global index
        from ccdm_tpu.parallel.mesh import allgather_f64, host_slice, pad_chunk

        my_indices = host_slice(n)
        for start in range(0, len(my_indices), batch_size):
            idx, real = pad_chunk(my_indices[start:start + batch_size],
                                  batch_size)
            samples = [dataset.get(i, rng) for i in idx]
            images = np.stack([s["image"] for s in samples])
            labels = np.stack([s["label"] for s in samples])  # train ids [B,H,W]

            probs = self.predict_batch(images, key, idx)  # [B,H,W,C]
            probs, labels, samples = probs[:real], labels[:real], samples[:real]

            if self.eval_resolution == "original" and "original_labels" in samples[0]:
                labels = np.stack([s["original_labels"] for s in samples])
                oh, ow = labels.shape[1:3]
                probs = jax.image.resize(
                    probs, (probs.shape[0], oh, ow, probs.shape[-1]), method="bilinear")

            # drop ignore channel before argmax (eval_cdm.py:229)
            pred = np.asarray(jnp.argmax(probs[..., : self.num_classes - 1], axis=-1))

            valid = labels != self.ignore
            for b in range(pred.shape[0]):
                if valid[b].any():
                    self.cm.update(pred[b][valid[b]][None], labels[b][valid[b]][None])
                self._dump_pngs(idx[b], pred[b].astype(np.int64),
                                labels[b].astype(np.int64))
                img_cnt += 1
            LOGGER.info("evaluated %d/%d images, running mIoU=%.4f",
                        img_cnt, len(my_indices), self.cm.miou())

        if pcnt > 1:
            # one allgather combines every host's partial confusion matrix;
            # the gather also acts as the barrier guaranteeing all hosts
            # have finished writing their PNG slices before process 0
            # re-scores them
            parts = allgather_f64(self.cm.matrix.reshape(-1))
            k = self.cm.matrix.shape[0]
            self.cm.matrix = parts.sum(axis=0).reshape(k, k).astype(
                self.cm.matrix.dtype)
            img_cnt = n
            # file names are global-index-derived, so the full lists are
            # reconstructible without shipping strings between hosts
            self.pred_files = [os.path.join(self.output_path, "submit",
                                            f"{i:06d}_pred_labelIds.png")
                               for i in range(n)]
            self.gt_files = [os.path.join(self.output_path, "gt",
                                          f"{i:06d}_gt_labelIds.png")
                             for i in range(n)]

        results = {
            "mIoU": self.cm.miou(),
            "IoU": self.cm.iou().tolist(),
            "images": img_cnt,
        }
        # official re-scoring of the saved label-id PNGs (eval_cdm.py:424-432);
        # process 0 only — requires the output path on a shared filesystem
        if pidx == 0:
            official = score_img_lists(
                self.pred_files, self.gt_files,
                export_file=os.path.join(self.output_path, "resultPixelLevelSemanticLabeling.json"),
                inst_list=inst_files)
            results["official"] = official
            LOGGER.info("mIoU (train-id CM): %.4f | official class mIoU: %.4f",
                        results["mIoU"], official["averageScoreClasses"])
        else:
            results["official"] = None
        return results


def run_inference(params: Dict[str, Any]) -> Dict:
    """Parity: `run_inference` (`eval_cdm.py:373-432`)."""
    params = with_defaults(params)
    dataset = cs_data.validation_dataset(
        max_size=params.get("dataset_val_max_size"),
        params=params,
        return_metadata=(params.get("evaluation") or {}).get("resolution") == "original",
    )
    LOGGER.info("%d images in cityscapes validation set", len(dataset))
    ev = CityscapesEvaluator(params)
    # clamp the batch to the scored image count BEFORE build() decides
    # the mesh layout, so the compiled batch matches the divisibility
    # check (lidc_uncertainty.py does the same)
    max_images = params.get("max_images")
    n = min(len(dataset), max_images) if max_images else len(dataset)
    batch_size = min(int(params.get("batch_size", 2)), max(n, 1))
    ev.build(dataset, batch_size)
    return ev.run(dataset, batch_size=batch_size,
                  key=jax.random.PRNGKey(int(params.get("seed", 0))),
                  max_images=max_images)
