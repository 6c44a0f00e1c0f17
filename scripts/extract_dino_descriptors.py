#!/usr/bin/env python
"""Standalone DINO ViT descriptor extraction (parity with the reference's
`python -m ddpm.models.dino` CLI, `/root/reference/ddpm/models/dino.py:355-381`).

Loads an image, ImageNet-normalises it, extracts the requested facet's
feature map with the Flax extractor, and saves it as .npy (channels-last
[1, H/stride, W/stride, D]).

    python scripts/extract_dino_descriptors.py --image_path img.png \
        --output_path desc.npy --weights dino_vits8.npz \
        [--load_size 224] [--stride 4] [--model_type dino_vits8] \
        [--facet key] [--layer 11]

`--bin` applies REAL log-binned descriptors (`_log_bin`, reference
dino.py:231-277). Note the upstream CLI's `--bin` never reaches `_log_bin`:
the positional call at dino.py:378 lands on `include_cls` (signature
mismatch) — here the flag does what its help text promises. `--saliency`
writes the cls-attention saliency map (reference dino.py:326-340) instead
of descriptors.
"""

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_image(path: str, load_size: int) -> np.ndarray:
    """[1,H,W,3] float32, ImageNet-normalised; shorter side -> load_size
    (the reference's `transforms.Resize(load_size)` semantics)."""
    from PIL import Image

    from ccdm_tpu.models.dino import IMAGENET_MEAN, IMAGENET_STD

    pil = Image.open(path).convert("RGB")
    if load_size:
        w, h = pil.size
        scale = load_size / min(w, h)
        pil = pil.resize((round(w * scale), round(h * scale)), Image.LANCZOS)
    x = np.asarray(pil, dtype=np.float32) / 255.0
    x = (x - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    return x[None].astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser(description="ViT descriptor extraction")
    ap.add_argument("--image_path", required=True)
    ap.add_argument("--output_path", required=True)
    ap.add_argument("--weights", help=".npz from convert_dino_checkpoint.py "
                                      "(random init with a warning if absent)")
    ap.add_argument("--load_size", default=224, type=int)
    ap.add_argument("--stride", default=4, type=int)
    ap.add_argument("--model_type", default="dino_vits8",
                    choices=["dino_vits8", "dino_vits16", "dino_vitb8", "dino_vitb16"])
    ap.add_argument("--facet", default="key",
                    choices=["key", "query", "value", "token"])
    ap.add_argument("--layer", default=11, type=int)
    ap.add_argument("--bin", action="store_true",
                    help="log-binned descriptors (1+8*2 bins per location)")
    ap.add_argument("--saliency", action="store_true",
                    help="write the [1, tokens] cls-attention saliency map "
                         "instead of descriptors (dino_vits8 only)")
    args = ap.parse_args()

    import jax

    from ccdm_tpu.models.dino import DinoFeatureEncoder

    enc = DinoFeatureEncoder({
        "model": args.model_type,
        "output_stride": args.stride,
        "source_layer": args.layer,
        "facet": args.facet,
    })
    image = load_image(args.image_path, args.load_size)
    print(f"Image {args.image_path} is preprocessed to tensor of size {image.shape}.")
    params = enc.init(jax.random.PRNGKey(0), image.shape[1:])
    if args.weights:
        params = enc.load_pretrained(args.weights, params)
    else:
        print("WARNING: no --weights given — RANDOM extractor weights")
    if args.saliency:
        desc = np.asarray(enc.extract_saliency_maps(params, image))
        print(f"Saliency maps are of size: {desc.shape}")
    else:
        desc = np.asarray(enc.extract_descriptors(params, image,
                                                  log_bin=args.bin))
        print(f"Descriptors are of size: {desc.shape}")
    np.save(args.output_path, desc)
    print(f"Saved to: {args.output_path}")


if __name__ == "__main__":
    main()
