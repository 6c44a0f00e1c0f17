"""Model assembly from the `params.yml` config surface.

Parity: `ddpm/models/builder.py:14-51` — `in_channels = num_classes +
image_channels` (the UNet consumes `concat([x_t, condition])`),
`out_channels = num_classes`, `num_res_blocks = 2` hardcoded upstream
(`builder.py:40`).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ccdm_tpu.diffusion.categorical import CategoricalDiffusion
from ccdm_tpu.diffusion.sampling import SamplerConfig, ancestral_sampler
from ccdm_tpu.models.unet import UNetModel, create_unet

LOGGER = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class DenoisingModel:
    """Diffusion math + UNet module + sampler entry points.

    A functional analogue of the reference `DenoisingModel`
    (`diffusion_denoising.py:131-215`): `apply` is the training-mode single
    step (`forward_step`, `:161-162`), `sample` the eval-mode compiled
    ancestral sampler (`forward_denoising`, `:164-215`).
    """

    diffusion: CategoricalDiffusion
    unet: UNetModel
    step_T_sample: str = "majority"
    # calibrated int8 activation absmax tree, applied as the "quant_scales"
    # variable collection (ops/quant.py::calibrate_sampler); None = dynamic
    quant_scales: Optional[Any] = None

    @property
    def time_steps(self) -> int:
        return self.diffusion.time_steps

    def init(self, key: jax.Array, image_shape: Tuple[int, int, int], batch: int = 1,
             feature_shape: Optional[Tuple[int, int, int]] = None):
        h, w, img_ch = image_shape
        c = self.diffusion.num_classes
        xt = jnp.zeros((batch, h, w, c), jnp.float32)
        cond = jnp.zeros((batch, h, w, img_ch), jnp.float32)
        t = jnp.ones((batch,), jnp.int32)
        fc = None
        if feature_shape is not None:
            fh, fw, fc_ch = feature_shape
            fc = jnp.zeros((batch, fh, fw, fc_ch), jnp.float32)
        return self.unet.init({"params": key}, xt, cond, t, fc)["params"]

    def with_quant_scales(self, scales) -> "DenoisingModel":
        """Model whose QuantConvs use calibrated static activation scales.

        `scales` is the tree returned by `ops.quant.calibrate_sampler`; jit
        traces of this model bake the values in as constants."""
        return dataclasses.replace(self, quant_scales=scales)

    def _variables(self, params) -> dict:
        if self.quant_scales is not None:
            return {"params": params, "quant_scales": self.quant_scales}
        return {"params": params}

    def apply(self, params, xt, condition, t, feature_condition=None, *,
              deterministic: bool = True, rngs=None, mutable=None) -> dict:
        if mutable is not None:
            # returns (outputs, mutated_vars) — used by int8 scale
            # calibration to collect "quant_stats" (ops/quant.py)
            return self.unet.apply(self._variables(params), xt, condition, t,
                                   feature_condition,
                                   deterministic=deterministic, rngs=rngs,
                                   mutable=mutable)
        return self.unet.apply(self._variables(params), xt, condition, t,
                               feature_condition,
                               deterministic=deterministic, rngs=rngs)

    def denoise_fn(self, params, condition, feature_condition=None):
        """Close over conditioning -> `(xt, t) -> p0` for the sampler."""
        def fn(xt, t):
            return self.apply(params, xt, condition, t, feature_condition)["diffusion_out"]
        return fn

    def denoise_fns_cached(self, params, condition, feature_condition=None):
        """Closure pair for encoder-reuse sampling (sampling.py):

        `full(xt, t) -> (p0, skips)` runs the whole UNet and returns the
        encoder activations; `reuse(xt, t, skips) -> p0` replays them and
        runs only middle+decoder (with the CURRENT step's time embedding).
        """
        def full(xt, t):
            ret = self.unet.apply(self._variables(params), xt, condition, t,
                                  feature_condition, return_skips=True)
            return ret["diffusion_out"], ret["skips"]

        def reuse(xt, t, skips):
            return self.unet.apply(self._variables(params), xt, condition, t,
                                   cached_skips=skips)["diffusion_out"]

        return full, reuse

    def sample(self, params, xt, condition, key, num_steps: Optional[int] = None,
               feature_condition=None) -> jnp.ndarray:
        cfg = SamplerConfig(num_steps=num_steps or self.time_steps,
                            step_T_sample=self.step_T_sample)
        return ancestral_sampler(
            self.diffusion, self.denoise_fn(params, condition, feature_condition),
            xt, key, cfg)


def build_model(
    params: Dict[str, Any],
    num_classes: int,
    image_channels: int = 1,
    image_size: Optional[int] = None,
) -> DenoisingModel:
    """Assemble diffusion + UNet from a reference-format `params` dict.

    Parity: `build_model` (`ddpm/models/builder.py:14-51`).
    """
    backbone = params.get("backbone", "unet_openai")
    if backbone != "unet_openai":
        raise ValueError(f"unsupported backbone {backbone!r}")
    bb = dict(params.get("unet_openai") or {})
    fce = params.get("feature_cond_encoder") or {"type": "none"}

    diffusion = CategoricalDiffusion.create(
        params.get("beta_schedule", "cosine"),
        int(params.get("time_steps", 250)),
        num_classes,
        params.get("beta_schedule_params"),
    )

    dtype = jnp.bfloat16 if params.get("compute_dtype", "bfloat16") == "bfloat16" else jnp.float32
    feature_block_idx = -1
    feature_stride = 8
    feature_channels = 0
    if fce.get("type") == "dino":
        feature_block_idx = int(fce.get("target_layer", 10))
        feature_stride = int(fce.get("output_stride", 8))
        feature_channels = int(fce.get("channels", 384))

    unet = create_unet(
        image_size=image_size or int(bb.get("image_size", 128)),
        base_channels=int(bb.get("base_channels", 32)),
        out_channels=num_classes,
        num_res_blocks=int(bb.get("num_res_blocks", 2)),  # hardcoded 2 upstream (builder.py:40)
        channel_mult=bb.get("channel_mult"),
        attention_resolutions=tuple(bb.get("attention_resolutions", (32, 16, 8))),
        num_heads=int(bb.get("num_heads", 1)),
        num_head_channels=int(bb.get("num_head_channels", -1)),
        use_scale_shift_norm=bool(bb.get("use_scale_shift_norm", False)),
        dropout=float(bb.get("dropout", 0.0)),
        softmax_output=bool(bb.get("softmax_output", True)),
        ce_head=bool(bb.get("ce_head", False)),
        feature_cond_block_idx=feature_block_idx,
        feature_cond_stride=feature_stride,
        dtype=dtype,
        remat_resblocks=bool(bb.get("use_checkpoint", False)),
        # reference checkpoints attention unconditionally (`unet.py:303`);
        # here it is a measured knob (PERFNOTES train-step A/B)
        remat_attention=bool(bb.get("remat_attention", True)),
        norm_fp32=bool(bb.get("norm_fp32", True)),
        # TPU-native int8 inference mode (no reference analogue; ops/quant.py)
        quantize_convs=bool(params.get("quantized_inference", False)),
    )
    model = DenoisingModel(
        diffusion=diffusion,
        unet=unet,
        step_T_sample=params.get("step_T_sample", "majority"),
    )
    LOGGER.info(
        "built DenoisingModel: T=%d classes=%d in_ch=%d feature_ch=%d",
        diffusion.time_steps, num_classes, num_classes + image_channels, feature_channels,
    )
    return model
