"""Dataset-module resolution by config string.

The reference resolves `params['dataset_file']` via
`importlib.import_module` (`ddpm/trainer.py:614-615`), with modules exposing
the protocol `training_dataset / validation_dataset / test_dataset /
get_num_classes / get_ignore_class` (+ optional `get_weights`). We keep that
contract and additionally alias the reference's module names so existing
params.yml files work unchanged.
"""

from __future__ import annotations

import importlib

_ALIASES = {
    "datasets.lidc": "ccdm_tpu.data.lidc",
    # the reference encodes the speed benchmark in the dataset name
    # (`ddpm_eval.py:39-41`); the data module is plain LIDC
    "datasets.lidc_sampling_speed": "ccdm_tpu.data.lidc",
    "datasets.lidc_orig": "ccdm_tpu.data.lidc_orig",
    "datasets.cityscapes": "ccdm_tpu.data.cityscapes",
    "datasets.synthetic": "ccdm_tpu.data.synthetic",
    "ccdm_tpu.data.synthetic_sampling_speed": "ccdm_tpu.data.synthetic",
}


def resolve_dataset_module(dataset_file: str):
    name = _ALIASES.get(dataset_file, dataset_file)
    module = importlib.import_module(name)
    for attr in ("training_dataset", "get_num_classes", "get_ignore_class"):
        if not hasattr(module, attr):
            raise AttributeError(f"dataset module {name!r} lacks required {attr}()")
    return module


def is_multi_annotator(module, dataset_file: str = "") -> bool:
    """Whether the dataset carries multiple expert annotations per image
    (LIDC-style `labels`/`likelihoods` test samples) — which selects the
    GED/HM-IoU evaluation path over the confusion-matrix mIoU path.

    Protocol-first: a dataset module may declare `is_multi_annotator()`
    explicitly (the in-tree modules do). Fallback for user modules that
    predate the flag: the reference's name-substring dispatch
    (`ddpm_eval.py:39-47`), so any `datasets.lidc*` import keeps working.
    """
    fn = getattr(module, "is_multi_annotator", None)
    if fn is not None:
        return bool(fn())
    name = dataset_file or getattr(module, "__name__", "")
    return "lidc" in name or "synthetic" in name
