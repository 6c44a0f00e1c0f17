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

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


def quantize_symmetric(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Round-to-nearest symmetric int8 quantization with the given scale."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)


# Experiment knob (PERFNOTES.md "static vs dynamic activation scales"): when
# set, activation quantization uses this FIXED per-tensor scale instead of
# the in-graph absmax — the exact cost model of calibrated static scales
# (same op graph, no absmax reduce). Bench-only; calibration infrastructure
# is only worth building if this measures a material win.
STATIC_ACTIVATION_SCALE: Optional[float] = None


def quantized_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    strides: Tuple[int, int] = (1, 1),
    padding: Union[str, Sequence[Tuple[int, int]]] = ((1, 1), (1, 1)),
) -> jnp.ndarray:
    """Int8 NHWC/HWIO convolution of float inputs, float output.

    `x`: [B,H,W,Cin] (any float dtype); `kernel`: [kh,kw,Cin,Cout] fp32.
    Activation scale is per-tensor dynamic; weight scales per output channel.
    """
    if STATIC_ACTIVATION_SCALE is not None:
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
        return quantized_conv(x, kernel, bias, self.strides, self.padding)
