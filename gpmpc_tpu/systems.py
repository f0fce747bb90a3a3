"""Benchmark plant models shipped with the framework.

Parity targets: the reference's two worked examples [SURVEY C7, C8] — the
Johansson quadruple-tank process and a kinematic car with obstacle
avoidance.  The ODEs live here (importable, unit-tested); the runnable
demo scripts live in ``examples/``.
"""

from __future__ import annotations

import jax.numpy as jnp


# --------------------------------------------------------------- four-tank

#: Quadruple-tank parameters (Johansson 2000 lab process): tank/outlet areas
#: in cm^2, gravity in cm/s^2, pump gains, three-way valve splits.
TANK_PARAMS = dict(
    A1=28.0, A2=32.0, A3=28.0, A4=32.0,
    a1=0.071, a2=0.057, a3=0.071, a4=0.057,
    g=981.0, k1=3.33, k2=3.35, gamma1=0.7, gamma2=0.6,
)


def four_tank_ode(x, u, p=None):
    """Quadruple-tank process: 4 levels, 2 pumps, nonlinear sqrt(h) outflow
    [SURVEY C7].  States h1..h4 [cm], inputs v1, v2 [V]."""
    p = p or TANK_PARAMS
    h = jnp.maximum(x, 1e-6)      # sqrt-safety; levels are physical (>= 0)
    q = jnp.sqrt(2.0 * p["g"] * h)
    h1 = (-p["a1"] / p["A1"] * q[0] + p["a3"] / p["A1"] * q[2]
          + p["gamma1"] * p["k1"] / p["A1"] * u[0])
    h2 = (-p["a2"] / p["A2"] * q[1] + p["a4"] / p["A2"] * q[3]
          + p["gamma2"] * p["k2"] / p["A2"] * u[1])
    h3 = (-p["a3"] / p["A3"] * q[2]
          + (1.0 - p["gamma2"]) * p["k2"] / p["A3"] * u[1])
    h4 = (-p["a4"] / p["A4"] * q[3]
          + (1.0 - p["gamma1"]) * p["k1"] / p["A4"] * u[0])
    return jnp.stack([h1, h2, h3, h4])


# --------------------------------------------------------------------- car

#: Kinematic bicycle parameters: front/rear axle distances [m].
CAR_PARAMS = dict(lf=1.2, lr=1.4)


def car_ode(x, u, p=None):
    """Kinematic bicycle car: states [px, py, psi (heading), v (speed)],
    inputs [a (acceleration), delta (steering angle)] [SURVEY C8]."""
    p = p or CAR_PARAMS
    px, py, psi, v = x[0], x[1], x[2], x[3]
    a, delta = u[0], u[1]
    beta = jnp.arctan(p["lr"] / (p["lf"] + p["lr"]) * jnp.tan(delta))
    return jnp.stack([
        v * jnp.cos(psi + beta),
        v * jnp.sin(psi + beta),
        v / p["lr"] * jnp.sin(beta),
        a,
    ])


def ellipse_obstacle_constraints(n_obstacles: int, scale: float = 1.0):
    """Build an ``inequality_constraints`` callback injecting ``n_obstacles``
    ellipse keep-out zones, parameterized at runtime by
    ``par = [cx, cy, rx, ry] * n`` — the reference car example's pattern
    (per-solve obstacle parameters through ``num_con_par``/``con_par_func``
    [SURVEY C6/C8]).

    Constraint per obstacle (g <= 0 convention):
        1 - ((px-cx)/(rx+m))^2 - ((py-cy)/(ry+m))^2 <= 0
    with m = scale * sqrt(max eigenvalue of the positional covariance) an
    uncertainty-padding margin from the propagated state covariance.
    """
    def cb(x, cov, u, par):
        px, py = x[0], x[1]
        pos_cov = cov[:2, :2]
        # conservative radius inflation from covariance (largest axis)
        tr = pos_cov[0, 0] + pos_cov[1, 1]
        det = pos_cov[0, 0] * pos_cov[1, 1] - pos_cov[0, 1] * pos_cov[1, 0]
        lam_max = 0.5 * tr + jnp.sqrt(jnp.maximum(0.25 * tr * tr - det, 0.0))
        m = scale * jnp.sqrt(jnp.maximum(lam_max, 0.0))
        g = []
        for i in range(n_obstacles):
            cx, cy, rx, ry = (par[4 * i], par[4 * i + 1],
                              par[4 * i + 2], par[4 * i + 3])
            g.append(1.0 - ((px - cx) / (rx + m)) ** 2
                     - ((py - cy) / (ry + m)) ** 2)
        return jnp.stack(g)

    return cb, 4 * n_obstacles


# --------------------------------------------------------- planar quadrotor

#: Planar quadrotor (PVTOL) parameters: mass [kg], arm length [m], inertia
#: [kg m^2], gravity [m/s^2].
QUAD_PARAMS = dict(m=1.0, l=0.25, J=0.02, g=9.81)


def planar_quadrotor_ode(x, u, p=None):
    """Planar quadrotor / PVTOL (beyond-reference third plant family):
    states [px, pz, theta, vx, vz, omega], inputs [T1, T2] (rotor thrusts).

        v̇x = -(T1+T2) sin(theta) / m
        v̇z =  (T1+T2) cos(theta) / m - g
        ω̇  =  l (T1 - T2) / J

    Smooth trig nonlinearity (contrast: the tank's sqrt, the car's tan) —
    a hover plant whose gravity feed-forward and attitude coupling exercise
    the hybrid GP residual path under deliberate mass mismatch
    (``examples/quadrotor.py``).
    """
    p = p or QUAD_PARAMS
    theta, vx, vz, omega = x[2], x[3], x[4], x[5]
    thrust = u[0] + u[1]
    return jnp.stack([
        vx,
        vz,
        omega,
        -thrust * jnp.sin(theta) / p["m"],
        thrust * jnp.cos(theta) / p["m"] - p["g"],
        p["l"] * (u[0] - u[1]) / p["J"],
    ])
