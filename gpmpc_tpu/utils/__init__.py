from gpmpc_tpu.utils.config import GPConfig, SQPConfig, MPCOptions

__all__ = ["GPConfig", "SQPConfig", "MPCOptions"]
