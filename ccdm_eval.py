#!/usr/bin/env python
"""Evaluation CLI shim: `python ccdm_eval.py params_eval.yml` (parity: `ddpm_eval.py`).

The implementation lives in `ccdm_tpu.cli.eval` so the installed package
exposes the same entry point as `ccdm-eval` (see pyproject.toml).
"""

from ccdm_tpu.cli.eval import main

if __name__ == "__main__":
    main()
