#!/usr/bin/env python
"""Export a configured sampler as a self-contained StableHLO serving artifact.

Usage:
    python scripts/export_serving.py params_eval.yml out.shlo \
        [--shape 128 128 1] [--classes 2] [--batch 1] [--samples 16] \
        [--steps K] [--platforms cpu tpu] [--cpu]

Reads the same eval YAML surface as `ccdm_eval.py`: `load_from` (EMA
checkpoint weights — baked into the artifact), `feature_cond_encoder`
(DINO conditioning exported inside), `quantized_inference: static`
(calibration runs on synthetic images before export; pass real ones in
production via --calib-npy), `evaluations`/`step_T_sample`. The artifact's
contract and platform semantics: `ccdm_tpu/utils/serving.py`.

No reference analog (the reference serves by shipping the repo + .pt file).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("params_file")
    ap.add_argument("output")
    ap.add_argument("--shape", nargs=3, type=int, default=[128, 128, 1],
                    metavar=("H", "W", "C"), help="served image shape")
    ap.add_argument("--classes", type=int, default=2)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--samples", type=int, default=None,
                    help="samples per image (default: params max_num_samples/evaluations or 16)")
    ap.add_argument("--steps", type=int, default=None,
                    help="reverse steps (default: full schedule)")
    ap.add_argument("--platforms", nargs="*", default=None,
                    help="lowering platforms (default: current backend)")
    ap.add_argument("--calib-npy", default=None,
                    help="npy of [N,H,W,C] images for int8-static calibration")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (e.g. TPU tunnel down)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from ccdm_tpu.config import load_params, with_defaults
    from ccdm_tpu.eval.lidc_uncertainty import (
        build_eval_feature_fn,
        load_eval_params,
    )
    from ccdm_tpu.models.builder import build_model
    from ccdm_tpu.utils.serving import save_sampler

    params = with_defaults(load_params(args.params_file))
    h, w, ci = args.shape
    default_samples = params.get("max_num_samples",
                                 params.get("evaluations", 16))
    if isinstance(default_samples, (list, tuple)):  # evaluations: [1, 16]
        default_samples = max(default_samples)
    num_samples = args.samples or int(default_samples)

    model = build_model(params, args.classes, image_channels=ci,
                        image_size=min(h, w))
    feature_fn, feature_shape, enc_params = build_eval_feature_fn(params, (h, w, ci))
    model_params = load_eval_params(params, model, (h, w, ci), feature_shape)
    if feature_fn is not None:
        # a serving artifact is self-contained by design: bake the frozen
        # encoder weights into the exported program (1-arg closure)
        two_arg, frozen = feature_fn, enc_params
        feature_fn = lambda img: two_arg(frozen, img)  # noqa: E731

    if str(params.get("quantized_inference", "")).lower() == "static":
        from ccdm_tpu.ops import quant

        calib = (np.load(args.calib_npy) if args.calib_npy
                 else np.random.default_rng(0).standard_normal(
                     (2, h, w, ci)).astype(np.float32))
        model = quant.calibrate_static_scales(model, model_params, calib,
                                              feature_fn=feature_fn)  # 1-arg here
        if not args.calib_npy:
            print("WARNING: int8-static calibrated on synthetic images; "
                  "pass --calib-npy with real data for production")

    path = save_sampler(args.output, model, model_params, (h, w, ci),
                        num_samples=num_samples, num_steps=args.steps,
                        batch_size=args.batch, feature_fn=feature_fn,
                        platforms=args.platforms)
    size_mb = os.path.getsize(path) / 1e6
    print(f"exported {path} ({size_mb:.1f} MB): "
          f"serve(images [{args.batch},{h},{w},{ci}] f32, seed uint32[2]) -> "
          f"probs [{args.batch},{num_samples},{h},{w},{args.classes}] f32")


if __name__ == "__main__":
    main()
