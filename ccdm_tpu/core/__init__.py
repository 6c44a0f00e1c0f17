from ccdm_tpu.core.schedules import (
    Schedule,
    linear_schedule,
    cosine_schedule,
    make_schedule,
)

__all__ = ["Schedule", "linear_schedule", "cosine_schedule", "make_schedule"]
