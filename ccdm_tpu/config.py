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
    # the final-step sampling mode follows the config's vote strategy unless
    # step_T_sample was set explicitly — resolved HERE so the mapping is
    # order-independent and idempotent for every caller (parity:
    # `step_T_sample=params.get('evaluation_vote_strategy', None)` at model
    # build, `ddpm/trainer.py:599`, with None -> majority at
    # `diffusion_denoising.py:209`)
    if "step_T_sample" not in (params or {}) and "evaluation_vote_strategy" in merged:
        merged["step_T_sample"] = merged["evaluation_vote_strategy"]
    return merged
