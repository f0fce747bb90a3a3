from gpmpc_tpu.models.dynamics import Model
from gpmpc_tpu.models.gp import GP

__all__ = ["Model", "GP"]
