"""Import shims so the reference's OWN eval driver can run in this container.

The image ships torch (CPU) but not `ignite`/`wandb`/`torchvision`/`timm`,
which `/root/reference/evaluation/evaluate_lidc_uncertainty.py` (and the
`ddpm.trainer` module it imports `_build_model` from) import at module level.
`install()` registers minimal stand-ins in sys.modules:

- ignite.engine/handlers/metrics/utils/distributed: a FAITHFUL functional
  subset — Engine's run loop, dict-output metric feeding, ConfusionMatrix /
  IoU / mIoU / DiceCoefficient math (ignite 0.4 semantics: CM rows=target,
  cols=argmax(dim=1) prediction), ModelCheckpoint.load_objects.
- wandb / torchvision / timm: import-only placeholders (the LIDC eval path
  never calls them; `feature_cond_encoder: none`).

Only the harness PLUMBING is stubbed. Everything the certification measures
— `Tester.test_step`, the GED/Hungarian functions, `DenoisingModel`'s
sampler, the UNet — is the reference's real code executed from
/root/reference.
"""

import sys
import types

import numpy as np


def _module(name):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    return mod


def install():
    import torch

    if "ignite" in sys.modules:
        return

    # ---- ignite.engine ----------------------------------------------------
    class _State:
        def __init__(self):
            self.metrics = {}
            self.max_epochs = None
            self.output = None
            self.iteration = 0
            self.epoch = 0

    class Engine:
        def __init__(self, process_fn):
            self._process_fn = process_fn
            self._metrics = {}
            self.state = _State()

        def on(self, _event, *a, **kw):
            # event-handler registration decorator; the reference's handlers
            # on the certified eval paths only LOG (`eval_cdm.py:350-368`) —
            # the certification reads the driver's returned/written results,
            # so handlers are accepted and dropped
            def deco(fn):
                return fn
            return deco

        def run(self, loader, max_epochs=1):
            for m in self._metrics.values():
                m.reset()
            for _ in range(max_epochs or 1):
                self.state.epoch += 1
                for batch in loader:
                    self.state.iteration += 1
                    out = self._process_fn(self, batch)
                    self.state.output = out
                    if isinstance(out, dict) and "y_pred" in out and "y" in out:
                        pair = (out["y_pred"], out["y"])
                    else:
                        pair = out
                    for m in self._metrics.values():
                        m.update(pair)
            for name, m in self._metrics.items():
                self.state.metrics[name] = m.compute()
            return self.state

    engine_mod = _module("ignite.engine")
    engine_mod.Engine = Engine
    engine_mod.Events = types.SimpleNamespace(
        ITERATION_COMPLETED=lambda **kw: None, EPOCH_COMPLETED=None,
        STARTED=None, COMPLETED=None)

    # ---- ignite.metrics ----------------------------------------------------
    class ConfusionMatrix:
        """rows = target class, cols = argmax(dim=1) prediction."""

        def __init__(self, num_classes):
            self.num_classes = num_classes
            self.reset()

        def reset(self):
            self.matrix = torch.zeros(
                (self.num_classes, self.num_classes), dtype=torch.int64)

        def update(self, output):
            y_pred, y = output
            pred = torch.argmax(y_pred, dim=1).reshape(-1).long()
            true = y.reshape(-1).long()
            idx = true * self.num_classes + pred
            self.matrix += torch.bincount(
                idx, minlength=self.num_classes ** 2
            ).reshape(self.num_classes, self.num_classes)

        def compute(self):
            # `.cuda()` must be a no-op in this CUDA-less container:
            # `eval_cdm.py:420` calls `.cuda()` on the computed matrix for an
            # (unasserted, printed) cross-check against Evaluator.cm
            class _CpuOkTensor(torch.Tensor):
                def cuda(self, *a, **kw):
                    return self

            return self.matrix.as_subclass(_CpuOkTensor)

        def attach(self, engine, name):
            engine._metrics[name] = self

    class _CMDerived:
        def __init__(self, cm, fn, ignore_index=None):
            self.cm, self.fn, self.ignore_index = cm, fn, ignore_index

        def reset(self):
            self.cm.reset()

        def update(self, output):
            # the shared CM updates once per engine iteration; Engine calls
            # update on every attached metric, so make it idempotent by
            # letting only the FIRST attached derived metric drive it
            pass

        def compute(self):
            return self.fn(self.cm.matrix.double(), self.ignore_index)

        def attach(self, engine, name):
            if not any(m is self.cm for m in engine._metrics.values()):
                engine._metrics[f"_cm_{id(self.cm)}"] = self.cm
            engine._metrics[name] = self

    def _iou(matrix, ignore_index=None):
        diag = torch.diagonal(matrix)
        iou = diag / (matrix.sum(0) + matrix.sum(1) - diag + 1e-15)
        if ignore_index is not None:
            keep = [i for i in range(len(iou)) if i != ignore_index]
            iou = iou[keep]
        return iou

    def IoU(cm, ignore_index=None):
        return _CMDerived(cm, _iou, ignore_index)

    def mIoU(cm, ignore_index=None):
        return _CMDerived(cm, lambda m, ig: float(_iou(m, ig).mean()),
                          ignore_index)

    def DiceCoefficient(cm, ignore_index=None):
        def dice(matrix, ig):
            diag = torch.diagonal(matrix)
            d = 2 * diag / (matrix.sum(0) + matrix.sum(1) + 1e-15)
            if ig is not None:
                d = d[[i for i in range(len(d)) if i != ig]]
            return d

        return _CMDerived(cm, dice, ignore_index)

    class Frequency:
        def __init__(self, output_transform=None):
            pass

        def attach(self, engine, name):
            pass

    metrics_mod = _module("ignite.metrics")
    metrics_mod.ConfusionMatrix = ConfusionMatrix
    metrics_mod.IoU = IoU
    metrics_mod.mIoU = mIoU
    metrics_mod.DiceCoefficient = DiceCoefficient
    metrics_mod.Frequency = Frequency

    # ---- ignite.handlers ----------------------------------------------------
    class ModelCheckpoint:
        def __init__(self, *a, **kw):
            pass

        @staticmethod
        def load_objects(to_load, checkpoint):
            for key, obj in to_load.items():
                obj.load_state_dict(checkpoint[key])

    handlers_mod = _module("ignite.handlers")
    handlers_mod.ModelCheckpoint = ModelCheckpoint
    handlers_mod.global_step_from_engine = lambda e: None

    # ---- ignite.utils / distributed / contrib -------------------------------
    utils_mod = _module("ignite.utils")

    def setup_logger(name=None, **kw):
        import logging

        return logging.getLogger(name)

    utils_mod.setup_logger = setup_logger

    dist_mod = _module("ignite.distributed")
    dist_mod.device = lambda: torch.device("cpu")
    dist_mod.get_local_rank = lambda: 0
    dist_mod.get_rank = lambda: 0
    dist_mod.get_world_size = lambda: 1

    def auto_dataloader(dataset, **kw):
        from torch.utils.data import DataLoader

        return DataLoader(dataset, batch_size=kw.get("batch_size", 1),
                          shuffle=kw.get("shuffle", False),
                          num_workers=kw.get("num_workers", 0))

    dist_mod.auto_dataloader = auto_dataloader

    def one_rank_only(rank=0, with_barrier=False):
        return lambda fn: fn

    dist_mod.one_rank_only = one_rank_only

    class Parallel:  # never used on the eval path
        def __init__(self, *a, **kw):
            raise NotImplementedError

    dist_mod.Parallel = Parallel

    contrib = _module("ignite.contrib")
    ch = _module("ignite.contrib.handlers")
    ch.ProgressBar = lambda **kw: types.SimpleNamespace(attach=lambda *a, **k: None)
    ch.WandBLogger = None
    cm_mod = _module("ignite.contrib.metrics")

    class GpuInfo:
        def attach(self, *a, **kw):
            pass

    cm_mod.GpuInfo = GpuInfo
    contrib.handlers = ch
    contrib.metrics = cm_mod

    ignite = _module("ignite")
    ignite.engine = engine_mod
    ignite.metrics = metrics_mod
    ignite.handlers = handlers_mod
    ignite.utils = utils_mod
    ignite.distributed = dist_mod
    ignite.contrib = contrib

    # ---- import-only placeholders -------------------------------------------
    _module("wandb").init = lambda *a, **kw: None
    _module("timm")
    tv = _module("torchvision")
    tvt = _module("torchvision.transforms")
    for name in ("RandomCrop", "ToTensor", "ToPILImage", "ColorJitter",
                 "Normalize", "RandomApply", "Compose", "Resize"):
        setattr(tvt, name, type(name, (), {"__init__": lambda self, *a, **k: None}))
    tvf = _module("torchvision.transforms.functional")
    tvf.crop = lambda *a, **kw: None
    tvf.normalize = lambda *a, **kw: None
    tvu = _module("torchvision.utils")
    tvu.make_grid = lambda *a, **kw: None
    tvd = _module("torchvision.datasets")
    tvd.Cityscapes = None
    tv.transforms = tvt
    tv.utils = tvu
    tv.datasets = tvd


def install_cityscapesscripts():
    """Shim the external `cityscapesscripts` pip package for `cs_eval.py`.

    The reference's vendored official scorer imports three things from it
    (`cs_eval.py:19,43-44`): the optional Cython `addToConfusionMatrix`
    (guarded by try/except — leaving it missing engages the reference's own
    NumPy fallback), the label table (`labels`, `name2label`, ... — the
    reference VENDORS the identical official table at `evaluation/labels.py`,
    so the shim re-exports that), and `Annotation` (imported at `:43`, never
    used). Call AFTER /root/reference is on sys.path.
    """
    if "cityscapesscripts" in sys.modules:
        return
    import importlib

    vendored = importlib.import_module("evaluation.labels")

    root = _module("cityscapesscripts")
    helpers = _module("cityscapesscripts.helpers")
    ann = _module("cityscapesscripts.helpers.annotation")
    ann.Annotation = type("Annotation", (), {})  # imported, never used
    lbl = _module("cityscapesscripts.helpers.labels")
    for name in ("labels", "name2label", "id2label", "trainId2label",
                 "category2labels"):
        setattr(lbl, name, getattr(vendored, name))
    helpers.annotation = ann
    helpers.labels = lbl
    root.helpers = helpers
    # NOTE: no `cityscapesscripts.evaluation` submodule on purpose — the
    # Cython fast-path import fails and cs_eval.py's NumPy fallback runs
