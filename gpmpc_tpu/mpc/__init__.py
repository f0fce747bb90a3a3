from gpmpc_tpu.mpc.controller import MPC
from gpmpc_tpu.mpc.mhe import MHE

__all__ = ["MPC", "MHE"]
