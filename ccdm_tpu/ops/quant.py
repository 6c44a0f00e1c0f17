"""Int8 quantized convolution for inference — 2.4x MXU throughput on v5e.

The CCDM UNet's sampler is conv-throughput-bound at its narrow outer levels
(PERFNOTES.md: bf16 conv3x3 32->32 at the hot [128,128,128,32] shape runs
0.87 ms vs 0.35 ms in int8, requant included — the v5e MXU doubles its rate
on int8x int8 -> int32). This module provides a drop-in quantized conv:

- dynamic symmetric per-tensor activation scale `max|x| / 127`, computed
  in-graph (no calibration pass; XLA fuses the absmax reduce into the
  producer's epilogue),
- per-output-channel symmetric weight scales (weights are quantized from the
  SAME fp32 parameters at each call — tiny tensors, fused, and the param
  tree stays bit-identical to the float path so any checkpoint works),
- int32 accumulation, dequant + bias in the conv epilogue.

The reference has no quantized path (PyTorch 1.7, fp32/fp16 only,
`unet_openai/fp16_util.py`); this is a TPU-native extension, OFF by default
(`quantized_inference: yes` in params to enable). Training always runs the
float path; quantization noise is re-sampled away by the ancestral chain
(measured GED drift on the demo model is reported in PERFNOTES.md).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

LOGGER = logging.getLogger(__name__)


def quantize_symmetric(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Round-to-nearest symmetric int8 quantization with the given scale."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)


# Experiment knob (PERFNOTES.md "static vs dynamic activation scales"): when
# set, activation quantization uses this FIXED per-tensor scale instead of
# the in-graph absmax — the cost model of calibrated static scales with a
# single global value (the measured +8% led to the real per-site calibration
# below). Still honoured as a fallback for any site missing from the
# calibrated table.
STATIC_ACTIVATION_SCALE: Optional[float] = None

def calibrate_sampler(model, params, images: jnp.ndarray, key: jax.Array,
                      num_steps: int = 8, feature_fn=None, feature_params=None):
    """Per-conv-site activation absmax from a short ancestral rollout.

    Runs `num_steps` subsampled reverse steps (the real sampler recurrence,
    so conv inputs see their true per-step distributions) on the calibration
    `images`. Each forward is ONE jitted launch with a mutable "quant_stats"
    collection: QuantConv sows its input absmax (and runs the float conv so
    downstream statistics are exact). A handful of images and ~8 steps is
    plenty: the GN-normalised conv inputs are tightly concentrated.

    Returns the "quant_scales" collection tree (module-path-structured,
    leaf `act_absmax` per quantized conv) for
    `DenoisingModel.with_quant_scales`. Because the model closes over the
    tree, the scales enter each sampler trace as compile-time constants —
    the in-graph absmax reduce and its fusion-breaking HBM pass disappear
    (measured +8% end-to-end on the flagship sampler vs the float path;
    dynamic scales are -12%).
    """
    from ccdm_tpu.diffusion.categorical import sample_onehot, theta_post_prob
    from ccdm_tpu.diffusion.sampling import sample_prior, subsampled_t_values

    num_steps = min(num_steps, model.time_steps)
    b, h, w, _ = images.shape
    fc = None
    if feature_fn is not None:
        fc = (feature_fn(feature_params, images) if feature_params is not None
              else feature_fn(images))

    @jax.jit
    def cal_step(xt, t, step_key):
        ret, mutated = model.apply(params, xt, images, t, fc,
                                   mutable=["quant_stats"])
        p0 = ret["diffusion_out"].astype(jnp.float32)
        probs = jnp.clip(theta_post_prob(model.diffusion, xt, p0, t), min=1e-12)
        return sample_onehot(step_key, probs), mutated["quant_stats"]

    import numpy as np

    scales = None
    xt = sample_prior(key, b, h, w, model.diffusion.num_classes)
    for i, t_s in enumerate(subsampled_t_values(model.time_steps, num_steps)):
        t = jnp.full((b,), int(t_s), jnp.int32)
        xt, qs = cal_step(xt, t, jax.random.fold_in(key, i))
        qs = jax.tree.map(np.asarray, qs)  # host constants, not device refs
        scales = qs if scales is None else jax.tree.map(np.maximum, scales, qs)
    LOGGER.info("calibrated %d quantized conv sites over %d sampler steps",
                len(jax.tree.leaves(scales)), num_steps)
    return scales


def calibrate_static_scales(model, params, images, feature_fn=None,
                            feature_params=None):
    """Calibrated static scales on `images` -> a model that uses them.

    The shared `quantized_inference: static` entry point for the eval
    harnesses and bench: calibrate on the first test images, return
    `model.with_quant_scales(scales)` — build samplers from THAT model.
    The scales travel with the model instance (no process-global state),
    so concurrent or subsequent models cannot inherit a stale table.
    """
    scales = calibrate_sampler(model, params, jnp.asarray(images),
                               jax.random.PRNGKey(0), feature_fn=feature_fn,
                               feature_params=feature_params)
    return model.with_quant_scales(scales)


def quantized_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    strides: Tuple[int, int] = (1, 1),
    padding: Union[str, Sequence[Tuple[int, int]]] = ((1, 1), (1, 1)),
    act_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Int8 NHWC/HWIO convolution of float inputs, float output.

    `x`: [B,H,W,Cin] (any float dtype); `kernel`: [kh,kw,Cin,Cout] fp32.
    Activation scale: `act_scale` if given (calibrated static — a baked
    constant), else the global STATIC_ACTIVATION_SCALE knob, else per-tensor
    dynamic absmax. Weight scales are per output channel either way.
    """
    if act_scale is not None:
        s_x = jnp.float32(act_scale)
    elif STATIC_ACTIVATION_SCALE is not None:
        s_x = jnp.float32(STATIC_ACTIVATION_SCALE)
    else:
        s_x = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0, 1e-8)
    x_q = quantize_symmetric(x, s_x)
    s_w = jnp.maximum(jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0, 1e-12)
    w_q = quantize_symmetric(kernel, s_w)

    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=strides, padding=padding,
        dimension_numbers=dn, preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (s_x * s_w)
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


class QuantConv(nn.Module):
    """Drop-in `nn.Conv` replacement running the int8 path.

    Parameter names and shapes ("kernel" [kh,kw,Cin,Cout], "bias" [Cout])
    match `flax.linen.Conv`, so float-trained checkpoints load unchanged.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = ((1, 1), (1, 1))
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if self.is_mutable_collection("quant_stats"):
            # calibration pass (jit-safe): sow the input absmax, run the
            # FLOAT conv so downstream sites see exact statistics
            self.sow("quant_stats", "act_absmax",
                     jnp.max(jnp.abs(x.astype(jnp.float32))),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.asarray(0.0, jnp.float32))
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                x.astype(jnp.float32), kernel, self.strides, self.padding,
                dimension_numbers=dn)
            return (y + bias).astype(x.dtype)
        act_scale = None
        if self.has_variable("quant_scales", "act_absmax"):
            # calibrated static scale: provided as a "quant_scales" collection
            # (DenoisingModel.with_quant_scales) — a closure constant under
            # jit, so no in-graph absmax reduce
            absmax = self.get_variable("quant_scales", "act_absmax")
            act_scale = jnp.maximum(jnp.float32(absmax), 1e-8) / 127.0
        return quantized_conv(x, kernel, bias, self.strides, self.padding,
                              act_scale=act_scale)
