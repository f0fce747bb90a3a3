"""Shared timing helpers for the benchmark scripts.

The axon TPU tunnel has two measurement hazards, both encountered and
documented in RESULTS.md: (1) a large, drifting fixed per-call dispatch
cost (~25 ms), cancelled by taking the K-slope of total wall time between
two loop lengths; (2) ``block_until_ready`` can return before execution
finishes (one session recorded "49k solves in 1 ms"), so completion is
forced by a device-to-host fetch of an output element.
"""

import time

import jax


def sync(out):
    """Force completion via a D2H fetch (reliable, unlike
    ``block_until_ready`` on this tunnel)."""
    import numpy as np
    np.asarray(jax.tree.leaves(out)[0])
    return out


def slope(run, k1, k2, reps=5):
    """Per-unit seconds via the K-slope between two loop lengths."""
    def t(k):
        sync(run(k))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(run(k))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(k2) - t(k1)) / (k2 - k1)
