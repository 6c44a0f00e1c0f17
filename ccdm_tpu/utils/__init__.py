from ccdm_tpu.utils.logging import setup_logger
from ccdm_tpu.utils.archive import archive_code

__all__ = ["setup_logger", "archive_code"]
