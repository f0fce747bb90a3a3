"""MPC controller — placeholder, implemented after the SQP solver layer."""


class MPC:  # pragma: no cover - replaced by the real controller
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("MPC controller lands with the solver layer")
