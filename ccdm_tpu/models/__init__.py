from ccdm_tpu.models.unet import UNetModel, create_unet
from ccdm_tpu.models.builder import DenoisingModel, build_model

__all__ = ["UNetModel", "create_unet", "DenoisingModel", "build_model"]
