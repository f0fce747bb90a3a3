from gpmpc_tpu.parallel.batched import BatchedStudy, StudyResult
from gpmpc_tpu.parallel import online_gp

__all__ = ["BatchedStudy", "StudyResult", "online_gp"]
