"""ccdm_tpu — TPU-native conditional categorical diffusion for stochastic segmentation.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
`LarsDoorenbos/ccdm-stochastic-segmentation` (ICCV 2023):

- categorical diffusion over one-hot label maps, channels-last `[B, H, W, C]`
- image-conditioned UNet denoiser (Flax), bf16 torso / fp32 islands
- the full T-step ancestral sampler compiled as one `lax.scan`
- data parallelism + tensor parallelism over a `jax.sharding.Mesh`
- multi-annotator evaluation (GED, HM-IoU, Dice, mIoU)

The reference is PyTorch/NCCL; nothing here is a translation. Reference
citations in docstrings (`file:line`) point into the upstream repo purely to
document behavioural parity.
"""

__version__ = "0.1.0"
