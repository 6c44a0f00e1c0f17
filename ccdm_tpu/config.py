"""Config loading: YAML `params` dict with env-var expansion.

Keeps the reference's public config surface (`params.yml` keys) verbatim so a
user of the reference can reuse their YAML files: `time_steps`,
`beta_schedule{,_params}`, `polyak_alpha`, `unet_openai.*`,
`feature_cond_encoder.*`, `optim.*`, `dataset_file`, ... (see
`/root/reference/params.yml`). Parity: `expanduservars` (`ddpm/utils.py:36-37`)
and the YAML load in `ddpm_train.py:22-23`.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import yaml


def expanduservars(path: str) -> str:
    """Expand `~` and `${ENV_VAR}` in a path (parity: `ddpm/utils.py:36-37`)."""
    return os.path.expanduser(os.path.expandvars(path))


def load_params(path: str) -> Dict[str, Any]:
    with open(path) as f:
        params = yaml.safe_load(f)
    return params


DEFAULTS: Dict[str, Any] = {
    "class_weights": "uniform",
    "beta_schedule": "cosine",
    "beta_schedule_params": None,
    "time_steps": 250,
    "polyak_alpha": 0.9999,
    "backbone": "unet_openai",
    "batch_size": 16,
    "samples": 12,
    "step_T_sample": "majority",
    "feature_cond_encoder": {"type": "none"},
    "compute_dtype": "bfloat16",
}


def with_defaults(params: Dict[str, Any]) -> Dict[str, Any]:
    merged = dict(DEFAULTS)
    merged.update(params or {})
    if merged.get("feature_cond_encoder") is None:
        merged["feature_cond_encoder"] = {"type": "none"}
    return merged
