#!/usr/bin/env python
"""Training CLI: `python ccdm_train.py params.yml`.

Parity: `ddpm_train.py` — same invocation, same YAML config surface. The
NCCL `idist.Parallel` spawn (`ddpm_train.py:31-38`) has no TPU analog: JAX
SPMD uses one process per host (`jax.distributed.initialize` for multi-host
pods), and the trainer shards over the full device mesh automatically.
"""

import argparse
import os
import time

from ccdm_tpu.config import load_params, with_defaults
from ccdm_tpu.utils.logging import setup_logger


def main():
    parser = argparse.ArgumentParser(description="Train a CCDM on TPU")
    parser.add_argument("params_file", nargs="?", default="params.yml")
    parser.add_argument("--max-steps", type=int, default=None,
                        help="stop after N optimizer steps (smoke runs)")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() for multi-host pods")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (env vars are too late on "
                             "images whose sitecustomize pre-imports jax)")
    args = parser.parse_args()

    os.environ.setdefault("NOW", time.strftime("%Y%m%d_%H%M%S"))
    os.environ.setdefault("SLURM_JOB_ID", "local")

    setup_logger()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.multihost:
        import jax

        jax.distributed.initialize()

    params = with_defaults(load_params(args.params_file))
    from ccdm_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache(params)
    from ccdm_tpu.train.trainer import run_train

    run_train(params, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
