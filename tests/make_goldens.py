"""Regenerate the golden closed-loop trajectories (x64 CPU).

Run from the repo root:  python tests/make_goldens.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

import golden_configs as gc  # noqa: E402


def main(names=None):
    out_dir = os.path.join(os.path.dirname(__file__), "goldens")
    os.makedirs(out_dir, exist_ok=True)
    model = gc.tank_model()
    gp = gc.tank_gp(model)
    for name in names or sorted(gc.CONFIGS):
        xs, us = gc.run_config(name, model, gp)
        np.savez(os.path.join(out_dir, f"{name}.npz"), xs=xs, us=us)
        print(f"golden {name}: xs {xs.shape} us {us.shape} "
              f"final={np.round(xs[-1], 4)}")


if __name__ == "__main__":
    # optional config names as argv: regenerate only those (adding a new
    # golden must not silently rewrite the existing ones)
    main(sys.argv[1:] or None)
