"""ctypes bindings for the native host integrator (csrc/integrator.cpp).

The reference delegates adaptive-step ODE integration to SUNDIALS CVODES
through CasADi [SURVEY §2.2]; this first-party C++ Dormand-Prince RK5(4)
library plays that role on the host side — high-accuracy plant truth for
golden generation and validation of the fixed-step on-device integrators.

The shared library is built on demand with g++ (no pybind11 in this image;
plain C ABI + ctypes).  If no compiler is available the module raises a
clear error at first use; nothing else in the framework depends on it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Callable, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.normpath(os.path.join(_DIR, "..", "..", "csrc",
                                     "integrator.cpp"))
_SO = os.path.join(_DIR, "libgpmpc.so")

SYSTEMS = {"callback": 0, "four_tank": 1, "car": 2}

_ODE_CB = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_double),
                           ctypes.POINTER(ctypes.c_double),
                           ctypes.POINTER(ctypes.c_double), ctypes.c_void_p)

_lib = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-march=native", "-fPIC", "-std=c++17", "-shared",
         "-o", _SO, _SRC],
        check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.gpmpc_integrate.restype = ctypes.c_int
    lib.gpmpc_integrate.argtypes = [
        ctypes.c_int, dp, _ODE_CB, ctypes.c_void_p,
        dp, ctypes.c_int, dp, ctypes.c_int,
        ctypes.c_double, ctypes.c_double, ctypes.c_double, dp]
    lib.gpmpc_sim.restype = ctypes.c_int
    lib.gpmpc_sim.argtypes = [
        ctypes.c_int, dp, _ODE_CB, ctypes.c_void_p,
        dp, ctypes.c_int, dp, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_int, dp]
    _lib = lib
    return lib


_NULL_CB = _ODE_CB()


def _as_c(a):
    a = np.ascontiguousarray(np.asarray(a, dtype=np.float64))
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _make_cb(ode: Callable, nx: int, nu: int):
    def raw(x_ptr, u_ptr, dx_ptr, _ctx):
        x = np.ctypeslib.as_array(x_ptr, (nx,))
        u = np.ctypeslib.as_array(u_ptr, (nu,))
        dx = np.asarray(ode(x, u), dtype=np.float64)
        for i in range(nx):
            dx_ptr[i] = dx[i]
    return _ODE_CB(raw)


def integrate(x0, u, dt: float, *, system: str = "callback",
              params=None, ode: Optional[Callable] = None,
              rtol: float = 1e-10, atol: float = 1e-12) -> np.ndarray:
    """Adaptive one-step integration over ``dt`` with constant input.

    ``system`` in {'four_tank', 'car'} uses the native ODE with ``params``
    (flat float array, see csrc layouts); 'callback' integrates an arbitrary
    Python ``ode(x, u) -> dx`` through ctypes.
    """
    lib = _load()
    x0a, x0p = _as_c(x0)
    ua, up = _as_c(u)
    pa, pp = _as_c(params if params is not None else [0.0])
    out = np.empty_like(x0a)
    _, outp = _as_c(out)
    out = np.ascontiguousarray(out)
    cb = (_make_cb(ode, x0a.size, ua.size)
          if system == "callback" else _NULL_CB)
    rc = lib.gpmpc_integrate(
        SYSTEMS[system], pp, cb, None, x0p, x0a.size, up, ua.size,
        float(dt), float(rtol), float(atol),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc:
        raise RuntimeError(f"native integrator failed (rc={rc})")
    return out


def sim(x0, u_seq, dt: float, *, system: str = "callback", params=None,
        ode: Optional[Callable] = None, rtol: float = 1e-10,
        atol: float = 1e-12, clip_negative: bool = False) -> np.ndarray:
    """Adaptive multi-step simulation; returns (n_steps+1, nx) trajectory."""
    lib = _load()
    x0a, x0p = _as_c(x0)
    useq = np.ascontiguousarray(np.asarray(u_seq, dtype=np.float64))
    n_steps, nu = useq.shape
    pa, pp = _as_c(params if params is not None else [0.0])
    traj = np.ascontiguousarray(
        np.empty((n_steps + 1, x0a.size), dtype=np.float64))
    cb = (_make_cb(ode, x0a.size, nu) if system == "callback" else _NULL_CB)
    rc = lib.gpmpc_sim(
        SYSTEMS[system], pp, cb, None, x0p, x0a.size,
        useq.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), nu,
        n_steps, float(dt), float(rtol), float(atol), int(clip_negative),
        traj.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if rc:
        raise RuntimeError(f"native simulator failed (rc={rc})")
    return traj


def tank_params(p: Optional[dict] = None) -> np.ndarray:
    """Flatten TANK_PARAMS into the native layout."""
    from gpmpc_tpu.systems import TANK_PARAMS
    p = p or TANK_PARAMS
    return np.array([p["A1"], p["A2"], p["A3"], p["A4"],
                     p["a1"], p["a2"], p["a3"], p["a4"],
                     p["g"], p["k1"], p["k2"], p["gamma1"], p["gamma2"]])


def car_params(p: Optional[dict] = None) -> np.ndarray:
    from gpmpc_tpu.systems import CAR_PARAMS
    p = p or CAR_PARAMS
    return np.array([p["lf"], p["lr"]])
