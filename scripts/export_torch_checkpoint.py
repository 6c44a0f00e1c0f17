#!/usr/bin/env python
"""Export an Orbax training checkpoint to a reference-format torch .pt file.

The inverse of scripts/convert_torch_checkpoint.py: checkpoints trained with
this framework become loadable by the PyTorch reference's eval tooling
(`evaluation/evaluate_lidc_uncertainty.py:138-143` reads `average_model`,
`eval_cdm.py:124-144` falls back to `model`), completing the migration story
in both directions.

    python scripts/export_torch_checkpoint.py <orbax_run_dir> <out.pt> [--step N]

Writes `{"model": ..., "average_model": ...}` state dicts (the reference's
checkpoint schema, `ddpm/trainer.py:357-365`; optimizer/scheduler/engine
state is framework-specific and deliberately not exported). DINO-conditioned
checkpoints export only the UNet keys — the reference re-loads its encoder
from torch hub.
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", help="Orbax run dir (contains model/<step>/)")
    ap.add_argument("output", help="output .pt path")
    ap.add_argument("--step", type=int, default=None)
    args = ap.parse_args()

    import torch

    from ccdm_tpu.models.torch_convert import flax_unet_to_torch
    from ccdm_tpu.train.checkpoint import load_tree

    tree = load_tree(args.run_dir, step=args.step)
    out = {}
    for key in ("model", "average_model"):
        params = tree.get(key)
        if params is None:
            continue
        # joint trees (trainable encoder) keep the UNet under "unet"
        unet = params.get("unet", params) if isinstance(params, dict) else params
        out[key] = {k: torch.from_numpy(v)
                    for k, v in flax_unet_to_torch(unet).items()}
        print(f"exported {key}: {len(out[key])} tensors")
    if not out:
        raise SystemExit(f"no model/average_model in checkpoint at {args.run_dir!r}")
    torch.save(out, args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
