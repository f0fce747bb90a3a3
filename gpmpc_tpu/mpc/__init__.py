from gpmpc_tpu.mpc.controller import MPC

__all__ = ["MPC"]
