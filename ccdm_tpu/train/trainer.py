"""The training runtime: an explicit step-indexed loop around one jitted step.

Replaces the reference's ignite `Engine` + event handlers
(`ddpm/trainer.py:379-566,684-743`) with a plain loop whose entire state lives
in the (checkpointable) TrainState:

- `run_train(params)` is the public entry point — same role and config
  surface as `run_train` (`trainer.py:684-743`)
- data parallel x tensor parallel over a `Mesh`; gradient all-reduce and TP
  collectives are emitted by XLA from the shardings (no NCCL analog)
- event cadence parity: `display_freq` logging, `save_freq` periodic
  checkpoints, `validation_freq` GED/HM-IoU (LIDC) or mIoU (Cityscapes)
  validation + best-checkpoints + qualitative grids
- invalid-loss detection: the jitted step computes an `invalid` flag
  (NaN/Inf/negative KL, parity `_check_loss` `trainer.py:308-327`); metrics
  are drained in a small deque so the host never blocks the device pipeline,
  and an invalid flag triggers a debug-state dump + raise
- "rank 0 only" I/O = `jax.process_index() == 0`
"""

from __future__ import annotations

import collections
import itertools
import logging
import os
import pprint
import signal
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ccdm_tpu.config import expanduservars, with_defaults
from ccdm_tpu.data.loader import EpochLoader, device_prefetch
from ccdm_tpu.data.registry import resolve_dataset_module
from ccdm_tpu.eval.ged_eval import compute_ged, make_batched_sampler
from ccdm_tpu.eval.metrics import ConfusionMatrix
from ccdm_tpu.models.builder import DenoisingModel, build_model
from ccdm_tpu.parallel.mesh import (
    MeshConfig,
    batch_sharding,
    make_mesh,
    put_replicated_global,
    replicated,
    shard_train_state,
    state_shardings,
)
from ccdm_tpu.train.checkpoint import CheckpointManagers, load_checkpoint
from ccdm_tpu.train.optimizer import build_optimizer
from ccdm_tpu.train.state import TrainState, create_train_state
from ccdm_tpu.train.step import make_train_step
from ccdm_tpu.utils.archive import archive_code
from ccdm_tpu.utils.logging import setup_logger
from ccdm_tpu.utils.progress import ProgressLine
from ccdm_tpu.utils.metrics_log import MetricsLogger
from ccdm_tpu.utils.visualize import prediction_grid, save_grid

LOGGER = logging.getLogger(__name__)


def _device_memory_gb() -> float:
    """HBM bytes in use on device 0 (parity role: ignite `GpuInfo`,
    `trainer.py:390`). 0.0 when the backend exposes no stats."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return stats.get("bytes_in_use", 0) / 1e9
    except (NotImplementedError, AttributeError, IndexError, jax.errors.JaxRuntimeError):
        # backends without memory stats (CPU), or a device list the platform
        # can't serve — anything else (a real backend fault) propagates
        return 0.0


def _class_weights(params: Dict[str, Any], dataset_module, num_classes: int) -> jnp.ndarray:
    if hasattr(dataset_module, "get_weights"):
        w = np.asarray(dataset_module.get_weights(), dtype=np.float32)
    else:
        w = np.ones((num_classes,), dtype=np.float32)
    assert len(w) == num_classes, f"len(class_weights) != num_classes: {len(w)} != {num_classes}"
    return jnp.asarray(w)


def _accepts_param(fn, name: str) -> bool:
    """Whether `fn` takes a parameter called `name` (dataset-module protocol
    dispatch by signature — catching TypeError instead would also swallow
    genuine TypeErrors raised INSIDE the dataset constructor, silently
    retrying without the configured transform pipeline)."""
    import inspect

    try:
        return name in inspect.signature(fn).parameters
    except (TypeError, ValueError):  # builtins/extension fns: assume modern
        return True


def _build_datasets(params: Dict[str, Any]):
    """Dataset module resolution + loaders (parity: `trainer.py:613-677`)."""
    module = resolve_dataset_module(params["dataset_file"])
    if _accepts_param(module.training_dataset, "params"):
        train_ds = module.training_dataset(params)  # cityscapes signature
    else:
        train_ds = module.training_dataset()
    val_max = params.get("dataset_val_max_size", 100)
    if _accepts_param(module.validation_dataset, "params"):
        val_ds = module.validation_dataset(max_size=val_max, params=params)
    else:
        val_ds = module.validation_dataset(max_size=val_max)
    LOGGER.info("%d train / %d val images in %s", len(train_ds), len(val_ds),
                params["dataset_file"])
    return module, train_ds, val_ds


class TrainingRun:
    """Holds the live objects of a training session; drives the step loop."""

    def __init__(self, params: Dict[str, Any]):
        params = with_defaults(params)
        self.params = params
        self._sigterm = False  # set by the SIGTERM handler, read by the loop
        self.output_path = expanduservars(params.get("output_path", "./logs/run"))
        os.makedirs(self.output_path, exist_ok=True)
        if jax.process_index() == 0:  # rank-0 I/O (utils.py:40-43 parity)
            archive_code(self.output_path)
        LOGGER.info("experiment dir: %s", self.output_path)
        LOGGER.info("Training params:\n%s", pprint.pformat(params))

        self.module, self.train_ds, self.val_ds = _build_datasets(params)
        self.num_classes = self.module.get_num_classes()
        self.ignore_class = self.module.get_ignore_class()
        image_shape = self.train_ds.get(0, np.random.default_rng(0))["image"].shape

        # mesh: all visible devices; data x model from params['mesh'] if given
        mesh_cfg = params.get("mesh") or {}
        n_dev = len(jax.devices())
        model_par = int(mesh_cfg.get("model", 1))
        data_par = int(mesh_cfg.get("data", n_dev // model_par))
        batch = int(params["batch_size"])
        while data_par > 1 and batch % data_par:
            data_par -= 1  # largest data-parallel degree dividing the batch
        self.mesh = make_mesh(MeshConfig(data=data_par, model=model_par),
                              devices=jax.devices()[: data_par * model_par])
        LOGGER.info("mesh: data=%d model=%d (%d devices visible)",
                    data_par, model_par, n_dev)

        # DINO feature conditioning (parity: `_build_feature_cond_encoder`,
        # `condition_encoder.py:56-82`). Frozen (`train: no`): weights are
        # closed-over constants. Trainable (`train: yes`): encoder params join
        # the TrainState under {"unet","encoder"} — jointly optimised
        # (`optimizer.py:13-14`) with the tree-wide EMA acting as the encoder
        # Polyak pair (`trainer.py:712`).
        fce = params.get("feature_cond_encoder") or {"type": "none"}
        self.feature_fn = None
        self.encoder_apply = None
        enc_params = None
        feature_shape = None
        if fce.get("type") == "dino":
            from ccdm_tpu.models.dino import DinoFeatureEncoder

            encoder = DinoFeatureEncoder(fce)
            enc_params = encoder.init(jax.random.PRNGKey(7), image_shape)
            weights = fce.get("weights")
            if weights:
                enc_params = encoder.load_pretrained(expanduservars(weights), enc_params)
            else:
                LOGGER.warning("DINO conditioning with RANDOM weights — provide "
                               "feature_cond_encoder.weights (converted .npz)")
            if encoder.trainable:
                self.encoder_apply = lambda p, img: encoder(p, img)
            else:
                # 2-arg: frozen weights thread through every jit as an
                # ARGUMENT (a ViT-B/8 closed over as HLO constants exceeds
                # remote-compile request limits)
                self.feature_fn = lambda p, img: encoder(p, img)
            feature_shape = (image_shape[0] // encoder.stride,
                             image_shape[1] // encoder.stride, encoder.channels)
            LOGGER.info("DINO feature conditioning: %s stride=%d ch=%d train=%s",
                        encoder.name, encoder.stride, encoder.channels,
                        encoder.trainable)

        if params.get("quantized_inference"):
            # int8 convs are not differentiable (round has zero gradient
            # a.e.) — the mode is eval/sampling-only (ops/quant.py)
            raise ValueError(
                "quantized_inference is inference-only; remove it from the "
                "training config (training always runs the float path)")

        # image_size = min(H, W) selects the channel_mult table
        # (parity: `ddpm/models/builder.py:36`)
        self.model: DenoisingModel = build_model(
            params, self.num_classes, image_channels=image_shape[-1],
            image_size=min(image_shape[:2]))
        init_params = self.model.init(
            jax.random.PRNGKey(int(params.get("seed", 0))), image_shape,
            feature_shape=feature_shape)
        if self.encoder_apply is not None:
            init_params = {"unet": init_params, "encoder": enc_params}
        # frozen-encoder weights live OUTSIDE the train state (not optimised,
        # not checkpointed — reference parity: `condition_encoder.py:36-38`)
        # and are passed to every step/sampler launch as an argument
        self.frozen_enc_params = enc_params if self.feature_fn is not None else None
        n_params = sum(p.size for p in jax.tree.leaves(init_params))
        LOGGER.info("UNet parameters: %.3fM", n_params / 1e6)

        self.batch_size = int(params["batch_size"])
        self.loader = EpochLoader(
            self.train_ds, self.batch_size, seed=int(params.get("seed", 0)),
            process_index=jax.process_index(), process_count=jax.process_count(),
            num_workers=int(params.get("mp_loaders", 0)))
        steps_per_epoch = len(self.loader)
        if steps_per_epoch == 0:
            # an empty epoch would make the step loop spin forever under an
            # explicit max_steps budget (no batch ever advances `total`)
            raise ValueError(
                f"batch_size {self.batch_size} exceeds the training set "
                f"({len(self.train_ds)} images): zero steps per epoch")
        tx, self.lr_schedule = build_optimizer(params, steps_per_epoch)
        state = create_train_state(init_params, tx,
                                   polyak_alpha=float(params["polyak_alpha"]))
        self.state = shard_train_state(state, self.mesh)
        self.checkpoints = CheckpointManagers(self.output_path)
        self.metrics = MetricsLogger(self.output_path, params)

        load_from = params.get("load_from")
        if load_from:
            LOGGER.info("resuming from %s", load_from)
            self.state = shard_train_state(
                load_checkpoint(expanduservars(load_from), state), self.mesh)

        class_weights = _class_weights(params, self.module, self.num_classes)
        step_fn = make_train_step(self.model, class_weights, self.lr_schedule,
                                  feature_fn=self.feature_fn,
                                  encoder_apply=self.encoder_apply)
        sh = state_shardings(self.state, self.mesh)
        self.batch_sh = batch_sharding(self.mesh)
        self.rep = replicated(self.mesh)
        # one sharding for the whole batch subtree — covers every key the
        # step consumes (image, x0, optional feature_condition)
        self.jit_step = jax.jit(
            step_fn,
            in_shardings=(sh, self.batch_sh, self.rep, self.rep),
            out_shardings=(sh, self.rep),
            donate_argnums=0,
        )
        # multi-step launches: K train steps per dispatch (identical
        # trajectory to K single launches; amortises host/tunnel latency)
        self.steps_per_launch = max(1, int(params.get("steps_per_launch", 1)))
        if self.steps_per_launch > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ccdm_tpu.train.step import make_multi_step

            stacked_sh = NamedSharding(self.mesh, P(None, "data"))
            self.stacked_sh = stacked_sh
            self.jit_multi_step = jax.jit(
                make_multi_step(step_fn),
                in_shardings=(sh, stacked_sh, self.rep, self.rep),
                out_shardings=(sh, self.rep),
                donate_argnums=0,
            )
        self.rng = put_replicated_global(
            jax.random.PRNGKey(int(params.get("seed", 0)) + 1), self.rep)
        # mesh-staged copy of the frozen encoder weights for the train step
        # (multihost: host-local arrays cannot enter a global-mesh jit)
        self._enc_global = (
            jax.tree.map(lambda x: put_replicated_global(x, self.rep),
                         self.frozen_enc_params)
            if self.frozen_enc_params is not None else None)
        self.steps_per_epoch = steps_per_epoch
        self.is_main = jax.process_index() == 0
        self._samplers = {}  # (num_samples, num_steps) -> jitted sampler

    # ---- validation ------------------------------------------------------

    def _val_feature_params(self):
        """Feature-encoder params for eval sampling: the EMA (average)
        encoder when trainable (parity: `predict` uses
        average_feature_cond_encoder, `trainer.py:350-352`), else the frozen
        weights (threaded as a call argument, never baked into the HLO)."""
        if self.encoder_apply is not None:
            return self.ema_unwrap()["encoder"]
        return self.frozen_enc_params

    def _val_sampler(self, num_samples: int, num_steps: Optional[int] = None):
        """Cached jitted batched sampler for validation/qualitative passes.

        Built ONCE per (num_samples, num_steps) and reused across validation
        events — rebuilding re-traces and re-compiles the whole K-step scan
        every validation_freq steps. Safe to cache because the only thing the
        sampler closes over (the model definition) is constant for the run;
        EMA unet params and encoder weights (frozen or trainable-EMA) enter
        as call arguments (`feature_params`)."""
        key = (num_samples, num_steps)
        if key not in self._samplers:
            fn = self.encoder_apply if self.encoder_apply is not None else self.feature_fn
            self._samplers[key] = make_batched_sampler(
                self.model, num_samples, num_steps, feature_fn=fn)
        return self._samplers[key]

    def _local_rng(self):
        """Validation key usable in the process-LOCAL sampler jit: the
        training rng is a global mesh array, which must not mix with local
        arrays in one computation on multihost runs."""
        if jax.process_count() > 1:
            return jnp.asarray(np.asarray(self.rng))
        return self.rng

    def ema_unwrap(self):
        # multihost: validation/qualitative sampling run process-LOCALLY (on
        # each host's own devices, identical inputs -> identical results), so
        # the global train-state arrays are copied out of the mesh first;
        # the SPMD program is only the train step itself. One validate() pass
        # touches the EMA several times (GED sampler, feature fn, grids) —
        # the copy is cached per train step so each tree moves once.
        step = int(self.state.step)
        cached = getattr(self, "_ema_cache", None)
        if cached is not None and cached[0] == step:
            return cached[1]
        ema = self.state.ema_params
        if jax.process_count() > 1:
            from ccdm_tpu.parallel.mesh import host_local_copy

            ema = host_local_copy(ema)
        self._ema_cache = (step, ema)
        return ema

    def ema_unet(self):
        """EMA UNet params regardless of conditioning mode."""
        ema = self.ema_unwrap()
        return ema["unet"] if self.encoder_apply is not None else ema

    @staticmethod
    def _agree_across_hosts(*scores: float) -> tuple:
        """Broadcast metric values from process 0 so every host passes the
        SAME score to Orbax's best_fn — any cross-host numeric divergence in
        the metric computation would otherwise make hosts disagree on
        should_save and hang the multihost save barrier."""
        if jax.process_count() == 1:
            return scores
        from jax.experimental import multihost_utils

        agreed = multihost_utils.broadcast_one_to_all(
            np.asarray(scores, dtype=np.float64))
        return tuple(float(x) for x in agreed)

    def validate(self) -> Dict[str, float]:
        params = self.params
        metrics: Dict[str, float] = {}
        from ccdm_tpu.data.registry import is_multi_annotator

        if is_multi_annotator(self.module, params["dataset_file"]):
            num_samples = int(params.get("samples", 12))
            val_bs = max(1, self.batch_size // num_samples)
            ged, div, hmiou = compute_ged(
                self.model, self.ema_unet(), self.val_ds, num_samples,
                val_bs, jax.random.fold_in(self._local_rng(), int(self.state.step)),
                max_batches=int(params.get("validation_max_batches", 0)) or None,
                sampler=self._val_sampler(num_samples),
                feature_params=self._val_feature_params(),
                # each host scores its slice of the val set; combined means
                process_index=jax.process_index(),
                process_count=jax.process_count())
            ged, div, hmiou = self._agree_across_hosts(ged, div, hmiou)
            LOGGER.info("mean GED %.3f, mean diversity %.3f, HM-IoU %.3f", ged, div, hmiou)
            metrics.update(GED=ged, diversity=div, HMIoU=hmiou)
            if self.is_main:
                self.metrics.log(int(self.state.step), metrics, tag="val")
            # saves run on ALL processes (Orbax multihost coordination)
            self.checkpoints.save_best("ged", self.state, ged)
            self.checkpoints.save_best("hmiou", self.state, hmiou)
        else:
            # val mIoU drives best checkpoints; a second pass over 6 train
            # images is logged only (parity: the engine_train mIoU attach,
            # `trainer.py:404-407,553-563`)
            miou, train_miou = self._agree_across_hosts(
                self.validate_miou(),
                self.validate_miou(max_images=6, dataset=self.train_ds))
            LOGGER.info("val mIoU: %.4f (train-split mIoU: %.4f)", miou, train_miou)
            metrics.update(mIoU=miou, mIoU_train=train_miou)
            if self.is_main:
                self.metrics.log(int(self.state.step), metrics, tag="val")
            self.checkpoints.save_best("miou", self.state, miou)
        return metrics

    def validate_miou(self, max_images: Optional[int] = 16, dataset=None) -> float:
        """Full-sampler prediction -> confusion-matrix mIoU (parity:
        `test_step` + ignite CM, `trainer.py:329-342,398-407`). `dataset`
        defaults to the val split; passing `self.train_ds` reproduces the
        reference's train-split pass (its samples carry one-hot `x0` and
        augmentations, seeded per-index here for determinism)."""
        ds = self.val_ds if dataset is None else dataset
        sampler = self._val_sampler(1)
        cm = ConfusionMatrix(self.num_classes, self.ignore_class)
        n = min(len(ds), max_images or len(ds))
        if n == 0:
            return float("nan")
        bs = max(1, min(self.batch_size // 4, n))
        ema = self.ema_unet()
        key = jax.random.fold_in(self._local_rng(), int(self.state.step))
        from ccdm_tpu.parallel.mesh import allgather_f64, host_slice, pad_chunk

        # host-sharded like compute_ged: each host samples only its strided
        # slice (global-index keys keep the result topology-invariant), and
        # one allgather combines the partial confusion matrices
        my_indices = host_slice(n)
        for start in range(0, len(my_indices), bs):
            idx, real = pad_chunk(my_indices[start:start + bs], bs)
            samples = [ds.get(i, np.random.default_rng(1000 + i)) for i in idx]
            images = np.stack([s["image"] for s in samples])
            if "labels" in samples[0]:  # multi-annotator protocol
                true = np.argmax(np.stack([s["labels"][0] for s in samples]), -1)
            elif "label" in samples[0]:
                true = np.stack([s["label"] for s in samples])
            else:  # training-split sample: one-hot x0
                true = np.argmax(np.stack([s["x0"] for s in samples]), -1)
            preds = sampler(ema, jnp.asarray(images), key,
                            jnp.asarray(idx, jnp.int32),
                            feature_params=self._val_feature_params())
            # prediction argmax spans all channels incl. the ignore class —
            # matching the reference's in-training CM (ignite ignore_index
            # only masks the reported vector, `trainer.py:398-407`); the
            # official eval path drops the channel instead (eval_cdm.py:229)
            cm.update(np.asarray(preds)[:real, 0], true[:real])
        if jax.process_count() > 1:
            parts = allgather_f64(cm.matrix.reshape(-1))
            cm.matrix = parts.sum(axis=0).reshape(cm.matrix.shape).astype(
                cm.matrix.dtype)
        return cm.miou()

    def save_qualitative(self, num_images: Optional[int] = None,
                         num_predictions: Optional[int] = None) -> str:
        """Prediction grids (parity: `save_qualitative_results`,
        `trainer.py:500-518`)."""
        p = self.params
        num_images = num_images or int(p.get("n_validation_images", 3))
        num_predictions = num_predictions or int(p.get("n_validation_predictions", 3))
        n = min(num_images, len(self.val_ds))
        samples = [self.val_ds.get(i) for i in range(n)]
        images = np.stack([s["image"] for s in samples])
        if "labels" in samples[0]:
            labels = np.argmax(np.stack([s["labels"][0] for s in samples]), -1)
        else:
            labels = np.stack([s["label"] for s in samples])
        sampler = self._val_sampler(num_predictions)
        preds = np.asarray(sampler(self.ema_unet(), jnp.asarray(images),
                                   jax.random.fold_in(self._local_rng(), 123),
                                   feature_params=self._val_feature_params()))
        grid = prediction_grid(images, labels, preds, self.num_classes)
        path = os.path.join(self.output_path, f"images_{int(self.state.step):06d}.png")
        return save_grid(grid, path)

    # ---- the loop ----------------------------------------------------------

    def _on_sigterm(self, signum, frame):
        # Preemption notice (Cloud TPU sends SIGTERM before eviction). Only
        # set a flag here: saving from inside a signal handler would re-enter
        # Orbax/XLA at an arbitrary point. The step loop saves and exits.
        self._sigterm = True

    def run(self, max_steps: Optional[int] = None) -> TrainState:
        self._profiling = False
        # NOTE: _sigterm is NOT reset here — a TERM delivered between
        # construction and run() (or between two run() calls) still means
        # "the scheduler wants this process gone"; stop at the first step.
        prev_handler: Any = self  # sentinel: "handler not installed"
        try:
            prev_handler = signal.signal(signal.SIGTERM, self._on_sigterm)
        except ValueError:  # not the main thread — no graceful-preempt path
            pass
        try:
            return self._run_impl(max_steps)
        finally:
            if prev_handler is not self:
                signal.signal(signal.SIGTERM, prev_handler)
            # close out EVERY exit path (early max_steps return, invalid-loss
            # abort, normal completion): stop a still-open profiler trace and
            # drain async Orbax saves — otherwise the trace is left corrupt /
            # the metadata writer races interpreter shutdown
            if self._profiling:
                jax.profiler.stop_trace()
                self._profiling = False
            self.checkpoints.close()
            self.metrics.close()

    def _run_impl(self, max_steps: Optional[int] = None) -> TrainState:
        p = self.params
        max_epochs = int(p.get("max_epochs", 1))
        display_freq = int(p.get("display_freq", 500))
        save_freq = int(p.get("save_freq", 1000))
        validation_freq = int(p.get("validation_freq", 5000))

        profile_from = int(p.get("profile_steps", 0))  # trace N steps from step 10
        profiling = False

        pending = collections.deque()  # (step, metrics) futures
        # recent batches for the debug dump (parity: the reference saves the
        # offending batch tensors via WithStateDict, trainer.py:295-306)
        recent_batches = collections.deque(maxlen=4)
        window_items = 0
        window_t0 = time.perf_counter()
        # per-iteration progress line (parity: ignite ProgressBar,
        # `trainer.py:410`) — tty-gated, rate-limited, never syncs the device
        progress = ProgressLine(
            enable=self.is_main and bool(p.get("progress_bar", True)))
        last_drained_loss: Optional[float] = None

        def drain(block_all: bool = False):
            nonlocal window_items, window_t0, last_drained_loss
            while pending and (block_all or len(pending) > 2):
                s, m = pending.popleft()
                if bool(m["invalid"]):
                    progress.close()
                    LOGGER.error("invalid loss at step %d — saving debug state", s)
                    extras = dict(next((b for bs, b in recent_batches if bs == s), {}))
                    extras["loss"] = m["loss"]
                    self.checkpoints.save_debug(self.state, extras)
                    raise ValueError(f"Invalid loss (nan/inf/neg-KL) at step {s}")
                last_drained_loss = float(m["loss"])

        step0 = int(self.state.step)
        total = 0
        # Resume parity (`trainer.py:374,582-586` checkpoints/restores the
        # ignite engine's epoch+iteration position): the epoch position is
        # DERIVED from the restored step count, the shuffle sequence continues
        # from the interrupted epoch (skipping its already-consumed batches),
        # and `max_epochs` is the TOTAL training budget — a resumed run does
        # exactly the remaining work of an uninterrupted one.
        spe = self.steps_per_epoch
        start_epoch = step0 // spe if spe else 0
        skip0 = step0 % spe if spe else 0
        if step0:
            LOGGER.info("resume position: step %d = epoch %d, batch %d/%d",
                        step0, start_epoch, skip0, spe)
        epoch = start_epoch - 1
        while True:
            epoch += 1
            # epoch budget: max_epochs normally; unbounded when an explicit
            # max_steps drives the loop (smoke tests, benchmarks)
            if max_steps is None and epoch >= max_epochs:
                break
            resume_skip = skip0 if epoch == start_epoch else 0
            raw_it = self.loader.epoch(epoch, start_batch=resume_skip)
            # keep only the tensors the jitted step consumes (datasets may
            # attach extra eval-only keys like 'label'/'original_labels')
            step_keys = ("image", "x0", "feature_condition")
            filtered = ({k: b[k] for k in step_keys if k in b} for b in raw_it)
            k_launch = self.steps_per_launch
            if k_launch > 1:
                # whole groups of K go through the multi-step launch; the
                # epoch's tail (remaining % K batches) runs as single
                # launches so no data is dropped and the trajectory stays
                # identical to K=1. A mid-epoch resume groups the REMAINING
                # batches (grouping never affects the trajectory — see
                # make_multi_step — only dispatch amortisation).
                n_groups = (len(self.loader) - resume_skip) // k_launch
                src = iter(filtered)

                def grouped(it_src):
                    for _ in range(n_groups):
                        group = [next(it_src) for _ in range(k_launch)]
                        yield {key: np.stack([g[key] for g in group])
                               for key in group[0]}
                it = itertools.chain(
                    ((k_launch, b) for b in device_prefetch(grouped(src), self.stacked_sh)),
                    ((1, b) for b in device_prefetch(src, self.batch_sh)),
                )
            else:
                it = ((1, b) for b in device_prefetch(filtered, self.batch_sh))
            for k_step, batch in it:
                if profile_from and not profiling and total >= 10:
                    jax.profiler.start_trace(os.path.join(self.output_path, "profile"))
                    profiling = self._profiling = True
                if k_step > 1:
                    self.state, metrics = self.jit_multi_step(
                        self.state, batch, self.rng, self._enc_global)
                else:
                    self.state, metrics = self.jit_step(
                        self.state, batch, self.rng, self._enc_global)
                pending.append((step0 + total + k_step, metrics))
                recent_batches.append((step0 + total + k_step, batch))
                total += k_step
                if profiling and total >= 10 + profile_from:
                    jax.tree.leaves(metrics)[0].block_until_ready()
                    jax.profiler.stop_trace()
                    profiling = self._profiling = False
                    LOGGER.info("profiler trace written to %s/profile", self.output_path)
                window_items += self.batch_size * k_step
                step = step0 + total
                prev = step - k_step

                def crossed(freq):
                    return (prev // freq) != (step // freq)

                progress.update(epoch=epoch, step=step, steps_per_epoch=spe,
                                items_done=total * self.batch_size,
                                loss=last_drained_loss)
                if crossed(display_freq):
                    drain(block_all=True)
                    progress.close()
                    loss = float(metrics["loss"])
                    lr = float(metrics.get("lr", 0.0))
                    dt = time.perf_counter() - window_t0
                    speed = window_items / max(dt, 1e-9)
                    hbm_gb = _device_memory_gb()
                    LOGGER.info(
                        "epoch=%d, iter=%d, speed=%.2f img/s, loss=%.4g, lr=%.6g, hbm=%.2fGB",
                        epoch, step, speed, loss, lr, hbm_gb)
                    self.metrics.log(step, {"loss": loss, "lr": lr,
                                            "imgs_per_sec": speed,
                                            "hbm_gb": hbm_gb}, tag="train")
                    window_items, window_t0 = 0, time.perf_counter()
                else:
                    drain()

                if crossed(save_freq):
                    # ALL processes call save: Orbax coordinates the
                    # multihost write internally; gating on process 0 would
                    # deadlock its sync barrier for sharded arrays
                    drain(block_all=True)
                    self.checkpoints.save_periodic(self.state)
                if crossed(validation_freq):
                    drain(block_all=True)
                    progress.close()
                    self.validate()
                    progress.reset_rate_window(total * self.batch_size)
                    if self.is_main:
                        try:
                            png = self.save_qualitative()
                            self.metrics.log_image(step, png, f"iteration {step}")
                        except Exception as e:  # non-fatal
                            LOGGER.warning("qualitative grid failed: %s", e)
                # graceful preemption: multiprocess runs stop at the step the
                # coordination service agreed on (all hosts save together —
                # the Orbax barrier requires that); single-process runs act
                # on the local SIGTERM flag directly
                if self.checkpoints.reached_preemption(step) or (
                        self._sigterm and jax.process_count() == 1):
                    drain(block_all=True)
                    progress.close()
                    self.checkpoints.save_periodic(self.state)
                    self.checkpoints.wait()
                    LOGGER.warning(
                        "preemption notice — state saved at step %d under %s; "
                        "rerun with load_from to resume the remaining budget",
                        step, self.output_path)
                    return self.state
                if max_steps is not None and total >= max_steps:
                    drain(block_all=True)
                    progress.close()
                    # the early exit is still a run end: persist the final
                    # state (save_freq may never have fired) so a follow-up
                    # eval loads THESE weights, not a stale/absent step
                    self.checkpoints.save_periodic(self.state)
                    self.checkpoints.wait()
                    return self.state
            drain(block_all=True)
        progress.close()
        self.checkpoints.save_periodic(self.state)
        self.checkpoints.wait()
        return self.state


def run_train(params: Dict[str, Any], max_steps: Optional[int] = None) -> TrainState:
    """Public entry point (parity: `run_train`, `trainer.py:684-743`)."""
    setup_logger()
    run = TrainingRun(params)
    return run.run(max_steps=max_steps)
