"""Console entry points (`ccdm-train` / `ccdm-eval`).

Parity: the reference's top-level `ddpm_train.py` / `ddpm_eval.py` scripts;
here they are packaged modules so an installed `ccdm_tpu` provides the same
CLIs without a repo checkout.
"""
