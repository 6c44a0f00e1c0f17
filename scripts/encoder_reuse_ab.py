#!/usr/bin/env python
"""Encoder-reuse quality A/B (VERDICT r2 #1): evaluate ONE checkpoint with
the demo-gate protocol at encoder_reuse R in {1,2,3,...} and print a
GED/HM-IoU/Dice table per (R, inference mode).

The speed side comes from `BENCH_ENCODER_REUSE=R make bench`; this script is
the quality side. Ship rule: a reuse level may become an eval-config default
only if every demo-gate metric at that level passes the same pinned gates as
R=1 (scripts/demo_gate.py FULL_GATES) on the same checkpoint.

Usage:
    python scripts/encoder_reuse_ab.py              # R=1,2,3 float+int8
    ER_LEVELS=1,2,3,4 ER_CKPT=/tmp/ccdm_demo/run python scripts/encoder_reuse_ab.py

Reference hot loop being approximated: the full denoise fn per step,
/root/reference/ddpm/models/diffusion_denoising.py:189-212 (the reference
always runs the full UNet every step — R>1 is a TPU-side extension and must
prove quality-neutrality against the R=1 parity behaviour).
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import yaml

    from ccdm_tpu.eval.lidc_uncertainty import eval_lidc_uncertainty

    levels = [int(x) for x in os.environ.get("ER_LEVELS", "1,2,3").split(",")]
    with open(os.path.join(REPO, "configs", "params_demo_eval.yml")) as f:
        eval_params = yaml.safe_load(f)
    if os.environ.get("ER_CKPT"):
        eval_params["load_from"] = os.environ["ER_CKPT"]

    keys = ("GED_4", "GED_16", "HMIoU_4", "HMIoU_16", "mIoU")
    rows = []
    for mode, extra in (("float", {}),
                        ("int8-static", {"quantized_inference": "static"})):
        for r in levels:
            res = eval_lidc_uncertainty(
                dict(eval_params, encoder_reuse=r, **extra))
            row = {"mode": mode, "R": r,
                   **{k: float(res[k]) for k in keys},
                   "dice_nodule": float(res["Dice"][1])}
            rows.append(row)
            print(f"[er-ab] {mode:<11s} R={r} " +
                  " ".join(f"{k}={row[k]:.4f}" for k in
                           (*keys, "dice_nodule")), flush=True)

    out = os.environ.get("ER_OUT", "/tmp/encoder_reuse_ab.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(f"[er-ab] table -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
