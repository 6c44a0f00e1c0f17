#!/usr/bin/env python
"""Evaluation CLI: `python ccdm_eval.py params_eval.yml`.

Parity: `ddpm_eval.py` — seeds, then dispatches on `dataset_file`:
`lidc_sampling_speed` -> step-sweep benchmark, `lidc` -> uncertainty
evaluation, `cityscapes` -> full-image inference + official scoring
(`ddpm_eval.py:39-47`).
"""

import argparse
import os
import random
import time

import numpy as np

from ccdm_tpu.config import load_params, with_defaults
from ccdm_tpu.utils.logging import setup_logger


def set_seeds(seed: int = 0):
    """Parity: `ddpm_eval.py:15-25` (python/numpy; JAX keys are explicit)."""
    random.seed(seed)
    np.random.seed(seed)


def main():
    parser = argparse.ArgumentParser(description="Evaluate a CCDM on TPU")
    parser.add_argument("params_file", nargs="?", default="params_eval.yml")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (env vars are too late on "
                             "images whose sitecustomize pre-imports jax)")
    args = parser.parse_args()

    os.environ.setdefault("NOW", time.strftime("%Y%m%d_%H%M%S"))
    os.environ.setdefault("SLURM_JOB_ID", "local")
    setup_logger()
    set_seeds(0)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    params = with_defaults(load_params(args.params_file))
    from ccdm_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache(params)
    dataset_file = params["dataset_file"]

    if "_sampling_speed" in dataset_file:
        # benchmark mode is encoded in the name, as in `ddpm_eval.py:39-41`
        from ccdm_tpu.eval.lidc_sampling_speed import eval_lidc_sampling_speed

        params = dict(params, dataset_file=dataset_file.replace("_sampling_speed", ""))
        eval_lidc_sampling_speed(params)
    else:
        # evaluator choice is a dataset property, not a name property: the
        # module protocol's is_multi_annotator() selects GED/HM-IoU vs the
        # full-image inference + mIoU path (reference substring dispatch,
        # `ddpm_eval.py:39-47`, kept as the fallback for user modules)
        from ccdm_tpu.data.registry import is_multi_annotator, resolve_dataset_module

        module = resolve_dataset_module(dataset_file)
        if is_multi_annotator(module, dataset_file):
            from ccdm_tpu.eval.lidc_uncertainty import eval_lidc_uncertainty

            eval_lidc_uncertainty(params)
        else:
            from ccdm_tpu.eval.cityscapes_eval import run_inference

            run_inference(params)


if __name__ == "__main__":
    main()
