from gpmpc_tpu.mpc.controller import MPC
from gpmpc_tpu.mpc.mhe import MHE
from gpmpc_tpu.mpc.output_feedback import (OutputFeedbackResult,
                                           simulate_output_feedback)

__all__ = ["MPC", "MHE", "simulate_output_feedback",
           "OutputFeedbackResult"]
