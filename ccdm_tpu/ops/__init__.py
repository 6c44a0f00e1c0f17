"""Pallas kernels + quantized ops for the hot paths.

Contents and their status (measurements in PERFNOTES.md):

- `flash_attention`: VMEM-resident-KV attention, used automatically by
  `AttentionBlock` at >= 2048 spatial tokens on TPU (Cityscapes 256x512 at
  ds=8); 2.2x the dense path at that scale and removes the [B,H,T,T] HBM
  tensor. Custom VJP for training.
- `quant`: int8 convolution path (`quantized_inference: yes`), inference
  only — 1.17x end-to-end on the wide Cityscapes config; measured no
  quality drift.
- `group_norm`: experimental fused GroupNorm+SiLU kernel, NOT wired in —
  XLA's fusions beat it inside the compiled sampler; kept as the basis for
  a future ResBlock mega-kernel.

The categorical posterior + sampling chain needs no kernel: it fuses into
the UNet epilogue inside the sampler scan at zero marginal cost.
"""
