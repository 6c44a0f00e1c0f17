from ccdm_tpu.data.registry import resolve_dataset_module

__all__ = ["resolve_dataset_module"]
