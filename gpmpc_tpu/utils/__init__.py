from gpmpc_tpu.utils.config import GPConfig, SQPConfig, MPCOptions
from gpmpc_tpu.utils.calibration import chance_calibration, violation_rates

__all__ = ["GPConfig", "SQPConfig", "MPCOptions",
           "chance_calibration", "violation_rates"]
