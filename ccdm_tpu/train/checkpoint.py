"""Orbax checkpointing: periodic, best-by-score, debug dumps, resume.

Replaces ignite `ModelCheckpoint` (`ddpm/trainer.py:432-468,494-497,680-681`)
with Orbax managers over the TrainState pytree:

- periodic `model/` checkpoints, keep 3 (parity: n_saved=3, `trainer.py:435`)
- `best_hmiou/`, `best_ged/`, `best_miou/` best-by-score managers
  (parity: `trainer.py:441-468`; GED is minimised, the others maximised)
- `debug_state/` one-shot dump on invalid loss (parity: `trainer.py:680-681`)

The checkpoint schema keys mirror `Trainer.objects_to_save`
(`trainer.py:357-376`): `model` (UNet params), `average_model` (EMA params),
`opt_state`, `step`. Diffusion schedule buffers are reconstructed from config,
exactly as upstream.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

LOGGER = logging.getLogger(__name__)


def _is_composite(params) -> bool:
    """Trainable-encoder runs hold `{"unet", "encoder"}` param trees."""
    return isinstance(params, dict) and set(params.keys()) == {"unet", "encoder"}


def _tree_of(state) -> Dict[str, Any]:
    """Checkpoint schema (parity: `Trainer.objects_to_save`, `trainer.py:357-376`):
    `model`/`average_model` hold the UNet; a trainable feature encoder is
    stored under `feature_cond_encoder`/`average_feature_cond_encoder`."""
    tree: Dict[str, Any] = {"opt_state": state.opt_state, "step": state.step}
    if _is_composite(state.params):
        tree["model"] = state.params["unet"]
        tree["feature_cond_encoder"] = state.params["encoder"]
        tree["average_model"] = state.ema_params["unet"]
        tree["average_feature_cond_encoder"] = state.ema_params["encoder"]
    else:
        tree["model"] = state.params
        tree["average_model"] = state.ema_params
    return tree


class CheckpointManagers:
    def __init__(self, output_path: str, keep: int = 3):
        self.output_path = os.path.abspath(output_path)
        self.keep = keep
        self._closed = True
        self._preempt_unavailable = False
        self._open()

    def _open(self) -> None:
        # distinct barrier namespaces per manager: several managers can save
        # the SAME step in one validation pass (periodic + best_*), and
        # Orbax's default multihost barrier keys would collide
        # ("Barrier _async_write_complete.<step> is already ongoing")
        def mp_opts(prefix):
            return ocp.options.MultiprocessingOptions(
                barrier_sync_key_prefix=prefix)

        opts = ocp.CheckpointManagerOptions(
            max_to_keep=self.keep, multiprocessing_options=mp_opts("periodic"))
        self.periodic = ocp.CheckpointManager(os.path.join(self.output_path, "model"), options=opts)
        self.best: Dict[str, ocp.CheckpointManager] = {}
        for name, mode in [("hmiou", "max"), ("ged", "min"), ("miou", "max")]:
            self.best[name] = ocp.CheckpointManager(
                os.path.join(self.output_path, f"best_{name}"),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.keep,
                    best_fn=lambda m, k=name: m[k],
                    best_mode=mode,
                    multiprocessing_options=mp_opts(f"best_{name}"),
                ),
            )
        self._closed = False

    def _ensure_open(self) -> None:
        # Orbax managers cannot save after close(); run() closes on every
        # exit path, but standalone validate()/save calls after run() are a
        # documented use-case — reopen lazily (managers resume from the
        # on-disk checkpoint metadata, so best-score tracking survives).
        if self._closed:
            self._open()

    def save_periodic(self, state) -> None:
        self._ensure_open()
        self.periodic.save(int(state.step), args=ocp.args.StandardSave(_tree_of(state)))

    def save_best(self, name: str, state, score: float) -> None:
        self._ensure_open()
        self.best[name].save(
            int(state.step),
            args=ocp.args.StandardSave(_tree_of(state)),
            metrics={name: float(score)},
        )

    def reached_preemption(self, step: int) -> bool:
        """Cross-process preemption sync point.

        Cloud TPU sends SIGTERM ahead of eviction; `jax.distributed
        .initialize()` installs a PreemptionSyncManager that turns those
        per-process signals into ONE agreed stopping step, surfaced here via
        Orbax's `reached_preemption`. False when no distributed runtime is up
        or no notice arrived. No reference analog (SURVEY §5: the reference
        has no elasticity; recovery is manual `load_from`)."""
        if self._preempt_unavailable:
            return False
        self._ensure_open()
        try:
            return bool(self.periodic.reached_preemption(int(step)))
        except Exception:
            # older/newer jax may raise when the sync manager is absent —
            # treat as "no coordinated preemption support" and stop asking
            self._preempt_unavailable = True
            return False

    def save_debug(self, state, extras: Optional[Dict[str, Any]] = None) -> None:
        """Debug-state dump on invalid loss (parity: `trainer.py:295-327`)."""
        tree = _tree_of(state)
        if extras:
            tree["tensors"] = jax.tree.map(np.asarray, extras)
        mgr = ocp.CheckpointManager(os.path.join(self.output_path, "debug_state"))
        mgr.save(int(state.step), args=ocp.args.StandardSave(tree))
        mgr.wait_until_finished()
        mgr.close()
        LOGGER.error("debug state saved to %s/debug_state", self.output_path)

    def close(self):
        """Drain async saves and release manager resources. Skipping this can
        leave Orbax's metadata writer racing interpreter shutdown."""
        if self._closed:
            return
        self.wait()
        self.periodic.close()
        for m in self.best.values():
            m.close()
        self._closed = True

    def wait(self):
        if self._closed:
            return
        self.periodic.wait_until_finished()
        for m in self.best.values():
            m.wait_until_finished()


def _resolve_manager_dir(path: str) -> str:
    path = os.path.abspath(path)
    model_dir = os.path.join(path, "model")
    if os.path.isdir(model_dir) and any(s.isdigit() for s in os.listdir(model_dir)):
        return model_dir
    return path


def load_tree(path: str, step: Optional[int] = None) -> Dict[str, Any]:
    """Restore the raw checkpoint tree (no template). Used by eval harnesses
    that only need `average_model` (parity: eval-side loading,
    `evaluate_lidc_uncertainty.py:138-143,157-161`)."""
    mgr_dir = _resolve_manager_dir(path)
    if step is None:
        # the manager exists only to resolve the latest step — close it
        # (it owns background threads; eval paths call load_tree repeatedly)
        mgr = ocp.CheckpointManager(mgr_dir)
        try:
            step = mgr.latest_step()
        finally:
            mgr.close()
    if step is None:
        raise FileNotFoundError(f"no checkpoint steps under {path!r}")
    # restore to host numpy (not the saved shardings): a checkpoint written
    # by an N-process mesh must load on any later topology — the caller
    # re-shards onto its own devices
    ckptr = ocp.PyTreeCheckpointer()
    item_dir = os.path.join(str(mgr_dir), str(step), "default")
    meta_tree = ckptr.metadata(item_dir).item_metadata.tree
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree)
    return ckptr.restore(item_dir, args=ocp.args.PyTreeRestore(restore_args=restore_args))


def load_checkpoint(path: str, state, step: Optional[int] = None):
    """Restore a TrainState from an Orbax checkpoint directory.

    `path` may be an experiment dir (containing `model/`), a manager dir, or a
    concrete step dir. Parity with `load` (`trainer.py:582-586`) +
    eval-side average_model loading (`evaluate_lidc_uncertainty.py:138-143`).
    """
    path = os.path.abspath(path)
    if os.path.isdir(os.path.join(path, "model")) and not os.path.isdir(os.path.join(path, "_CHECKPOINT_METADATA")):
        candidate = os.path.join(path, "model")
        if any(s.isdigit() for s in os.listdir(candidate)):
            path = candidate
    # close the manager when done — it owns background threads (same
    # discipline as load_tree above)
    mgr = ocp.CheckpointManager(path)
    try:
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint steps under {path!r}")
        template = jax.tree.map(np.asarray, _tree_of(state))
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    finally:
        mgr.close()
    if _is_composite(state.params):
        params = {"unet": restored["model"],
                  "encoder": restored["feature_cond_encoder"]}
        ema = {"unet": restored["average_model"],
               "encoder": restored["average_feature_cond_encoder"]}
    else:
        params = restored["model"]
        ema = restored["average_model"]
    return state.replace(
        params=params,
        ema_params=ema,
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
