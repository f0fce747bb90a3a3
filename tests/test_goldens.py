"""Golden closed-loop trajectory regression at the 1e-6 parity bar.

Regenerate with:  python tests/make_goldens.py
(Only regenerate when a behavior change is INTENDED and verified.)
"""

import os

import numpy as np
import pytest

import golden_configs as gc

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def setup():
    model = gc.tank_model()
    gp = gc.tank_gp(model)
    return model, gp


@pytest.mark.parametrize("name", sorted(gc.CONFIGS))
def test_golden_trajectory(name, setup):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"golden {name} not generated yet")
    model, gp = setup
    xs, us = gc.run_config(name, model, gp)
    ref = np.load(path)
    np.testing.assert_allclose(xs, ref["xs"], atol=1e-6,
                               err_msg=f"{name}: state trajectory diverged")
    np.testing.assert_allclose(us, ref["us"], atol=1e-6,
                               err_msg=f"{name}: input trajectory diverged")
