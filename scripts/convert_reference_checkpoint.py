#!/usr/bin/env python
"""Convert a reference PyTorch CCDM checkpoint to this package's Orbax format.

Usage:
  python scripts/convert_reference_checkpoint.py best_model.pt out_dir params.yml

Reads the torch checkpoint's `model` / `average_model` UNet state dicts
(schema: `ddpm/trainer.py:357-365`), maps them onto the Flax tree built from
the same params.yml, and writes an Orbax checkpoint directory that
`load_from:` / eval harnesses consume directly.
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("torch_ckpt")
    ap.add_argument("out_dir")
    ap.add_argument("params_yml")
    ap.add_argument("--num-classes", type=int, default=2)
    ap.add_argument("--image-channels", type=int, default=1)
    ap.add_argument("--image-size", type=int, default=128)
    args = ap.parse_args()

    import jax
    import numpy as np
    import orbax.checkpoint as ocp
    import torch

    from ccdm_tpu.config import load_params, with_defaults
    from ccdm_tpu.models.builder import build_model
    from ccdm_tpu.models.torch_convert import torch_unet_to_flax

    params = with_defaults(load_params(args.params_yml))
    model = build_model(params, args.num_classes,
                        image_channels=args.image_channels,
                        image_size=args.image_size)
    template = model.init(jax.random.PRNGKey(0),
                          (args.image_size, args.image_size, args.image_channels))

    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    def to_np(sd):
        return {k: v.numpy() for k, v in sd.items()}

    model_tree = torch_unet_to_flax(to_np(ckpt["model"]), template)
    avg_tree = torch_unet_to_flax(to_np(ckpt.get("average_model", ckpt["model"])), template)

    mgr = ocp.CheckpointManager(os.path.abspath(args.out_dir))
    step = 0
    mgr.save(step, args=ocp.args.StandardSave({
        "model": model_tree,
        "average_model": avg_tree,
        "opt_state": {},
        "step": np.asarray(step, np.int32),
    }))
    mgr.wait_until_finished()
    print(f"wrote Orbax checkpoint to {args.out_dir}/ (step {step})")


if __name__ == "__main__":
    main()
