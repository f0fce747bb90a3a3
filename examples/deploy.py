"""AOT deployment walkthrough: export the controller, serve the artifact.

The reference cannot do this at all — its controller is a live
CasADi/IPOPT object rebuilt in every process [SURVEY §3.4].  Here the
complete solve step (zero-order covariance refresh + AL-SQP + Riccati
KKT sweep + GP posterior) serializes to ONE StableHLO artifact:

  build (this script, anywhere)  ->  solve_step.bin  ->  serving host
                                                         (no gpmpc_tpu,
                                                          no model code,
                                                          just jax)

The script is self-checking: the rehydrated artifact must reproduce the
live controller bit-for-bit on the first solve, then it drives a 15-step
receding-horizon loop against the plant simulator using ONLY the artifact
(warm solver state threaded through the deployed signature), and the loop
must regulate the tanks to the setpoint.

Usage: python examples/deploy.py [--quick] [--tpu]
  --tpu additionally lowers for ("cpu", "tpu") so the same artifact built
  on this CPU host serves on a TPU fleet (cross-platform lowering).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--quick", action="store_true", help="smaller sizes")
ap.add_argument("--tpu", action="store_true",
                help="cross-platform lowering for ('cpu', 'tpu')")
args = ap.parse_args()

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from gpmpc_tpu import GP, MPC, Model
from gpmpc_tpu.systems import four_tank_ode
from gpmpc_tpu.utils.export import (export_solve_step, load_solve_step,
                                    _example_args)

# ---------------------------------------------------------------- build side
dtype = jnp.float64
dt = 3.0
n_train = 30 if args.quick else 80
model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=dt,
              R=np.diag([1e-3] * 4), clip_negative=True, dtype=dtype,
              integrator_substeps=10)
X, Y = model.generate_training_data(
    n_train, uub=[6.0, 6.0], ulb=[0.0, 0.0],
    xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
    key=jax.random.PRNGKey(2))
gp = GP(X, Y, mean_func="zero", gp_method="TA", multistart=1,
        max_iters=80 if args.quick else 150, seed=1)
mpc = MPC(horizon=5 * dt, model=model, gp=gp, gp_method="TA",
          discrete_method="gp", Q=np.diag([20.0, 20.0, 0.1, 0.1]),
          R=0.05 * np.eye(2), ulb=[0.0, 0.0], uub=[8.0, 8.0],
          xlb=[0.5, 0.5, 0.1, 0.1], xub=[16.0, 16.0, 8.0, 8.0],
          percentile=0.95, feedback=True, cov_updates=1, dtype=dtype)

path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "solve_step.bin")
t0 = time.time()
platforms = ("cpu", "tpu") if args.tpu else None
blob = export_solve_step(mpc, path, platforms=platforms)
print(f"exported solve step: {len(blob)/1024:.0f} KiB in {time.time()-t0:.1f}s"
      f" (platforms={platforms or 'native'}) -> {path}")

# ---------------------------------------------------------------- serve side
# in production this half runs in another process with just `jax` and the
# artifact; here we rehydrate in-process and check against the live MPC
step = load_solve_step(path)

x0 = jnp.asarray([8.0, 10.0, 1.0, 1.5], dtype)
x_sp = jnp.asarray([12.4, 12.7, 1.8, 1.4], dtype)
argv = _example_args(mpc, x0=x0, x_sp=x_sp)
u0_art, warm_art, obj_art = step(*argv)

warm, _x0, xsp_w, u_prev, sigma0, con_par, consts = argv
_state, u0_live, _sig, _info = mpc._solve_step(
    warm, _x0, xsp_w, u_prev, sigma0, con_par, consts)
u0_live = jnp.clip(u0_live, consts.ulb, consts.uub)
dev = float(jnp.max(jnp.abs(u0_art - u0_live)))
print(f"artifact vs live first solve: max |du| = {dev:.2e}")
assert dev < 1e-10, "deployed artifact diverged from the live controller"

# receding-horizon serving loop: ONLY the artifact computes controls
n_steps = 8 if args.quick else 15
x, w = x0, warm_art
u_p = u0_art
xs = [np.asarray(x)]
for k in range(n_steps):
    u0, w, obj = step(w, x, xsp_w, u_p, sigma0, con_par, consts)
    x = model.integrate(x, u0)          # the PLANT (external world)
    u_p = u0
    xs.append(np.asarray(x))
xs = np.stack(xs)
err = np.abs(xs[-1, :2] - np.asarray(x_sp)[:2]).max()
print(f"deployed loop: {n_steps} steps, final level error {err:.3f} "
      f"(states finite: {np.isfinite(xs).all()})")
assert err < 1.0, "deployed loop failed to regulate"
print("deploy example OK")
