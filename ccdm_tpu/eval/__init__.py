from ccdm_tpu.eval.metrics import (
    pairwise_class_distance,
    generalised_energy_distance,
    hungarian_matched_iou,
    ConfusionMatrix,
)

__all__ = [
    "pairwise_class_distance",
    "generalised_energy_distance",
    "hungarian_matched_iou",
    "ConfusionMatrix",
]
