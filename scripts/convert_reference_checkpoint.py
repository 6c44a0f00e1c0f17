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
    ap.add_argument("--image-size", type=int, default=128,
                    help="image height (and width unless --image-width)")
    ap.add_argument("--image-width", type=int, default=None,
                    help="image width for non-square configs (e.g. 512 for "
                         "the cdm_dino_256x512 checkpoint)")
    args = ap.parse_args()

    import jax
    import numpy as np
    import orbax.checkpoint as ocp
    import torch

    from ccdm_tpu.config import load_params, with_defaults
    from ccdm_tpu.models.builder import build_model
    from ccdm_tpu.models.torch_convert import torch_unet_to_flax

    params = with_defaults(load_params(args.params_yml))
    h = args.image_size
    w = args.image_width or args.image_size
    model = build_model(params, args.num_classes,
                        image_channels=args.image_channels,
                        image_size=min(h, w))  # builder.py:36 parity
    # DINO-conditioned configs widen the concat block: the template tree
    # must be built with the feature map present or conversion mismatches
    fce = params.get("feature_cond_encoder") or {}
    feature_shape = None
    if fce.get("type") == "dino":
        stride = int(fce.get("output_stride", 8))
        feature_shape = (h // stride, w // stride, int(fce.get("channels", 384)))
    template = model.init(jax.random.PRNGKey(0), (h, w, args.image_channels),
                          feature_shape=feature_shape)

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
