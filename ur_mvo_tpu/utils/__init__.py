from ur_mvo_tpu.utils.metrics import ate_rmse, umeyama_alignment
from ur_mvo_tpu.utils.timing import StageTimer
from ur_mvo_tpu.utils.tum_io import associate, read_tum, write_tum

__all__ = [
    "ate_rmse",
    "umeyama_alignment",
    "StageTimer",
    "read_tum",
    "write_tum",
    "associate",
]
