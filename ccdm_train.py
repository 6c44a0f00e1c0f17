#!/usr/bin/env python
"""Training CLI shim: `python ccdm_train.py params.yml` (parity: `ddpm_train.py`).

The implementation lives in `ccdm_tpu.cli.train` so the installed package
exposes the same entry point as `ccdm-train` (see pyproject.toml).
"""

from ccdm_tpu.cli.train import main

if __name__ == "__main__":
    main()
