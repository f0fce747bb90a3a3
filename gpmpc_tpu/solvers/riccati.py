"""Riccati sweep over the block-banded KKT system of a trajectory QP.

This is the TPU-native replacement for the sparse KKT factorization
(MUMPS) inside the reference's IPOPT solves [SURVEY §3.4]: the multiple-
shooting QP's KKT matrix is block-banded in the stage index, and the LQR
(Riccati) backward recursion *is* its block factorization — O(Nt) stages of
small dense ops instead of a general sparse factor.  Expressed as two
``lax.scan``s (backward value recursion, forward rollout) it stays entirely
on device and vmaps cleanly over batched rollouts.

Solves:

    min  sum_t 0.5 dx'Q_t dx + dx'M_t du + 0.5 du'R_t du + q_t'dx + r_t'du
         + 0.5 dx_N'Q_N dx_N + q_N'dx_N
    s.t. dx_{t+1} = A_t dx_t + B_t du_t + c_t,   dx_0 given.

The affine defect terms ``c_t`` carry the multiple-shooting gap closure
(Gauss-Newton multiple shooting a la acados SQP; SURVEY §7 step 4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpmpc_tpu.ops.chol import chol_small, tri_solve_small


class StageQP(NamedTuple):
    """Stacked stage data; leading axis = time (Nt for stage terms)."""

    a: jnp.ndarray      # (Nt, Nx, Nx) dynamics dx jacobian
    b: jnp.ndarray      # (Nt, Nx, Nu) dynamics du jacobian
    c: jnp.ndarray      # (Nt, Nx)    defects f(x_t,u_t) - x_{t+1}
    q_xx: jnp.ndarray   # (Nt, Nx, Nx)
    q_uu: jnp.ndarray   # (Nt, Nu, Nu)
    q_xu: jnp.ndarray   # (Nt, Nx, Nu)
    q_x: jnp.ndarray    # (Nt, Nx)
    q_u: jnp.ndarray    # (Nt, Nu)
    qf_xx: jnp.ndarray  # (Nx, Nx) terminal
    qf_x: jnp.ndarray   # (Nx,)


class RiccatiSolution(NamedTuple):
    dx: jnp.ndarray       # (Nt+1, Nx)
    du: jnp.ndarray       # (Nt, Nu)
    gain_k: jnp.ndarray   # (Nt, Nu, Nx) feedback gains K_t
    ff_k: jnp.ndarray     # (Nt, Nu)     feedforward k_t
    ok: jnp.ndarray       # scalar bool: factorization stayed finite
    exp_dec: jnp.ndarray  # predicted objective decrease (>= 0 at optimum step)


def solve(qp: StageQP, dx0: jnp.ndarray, reg: jnp.ndarray | float
          ) -> RiccatiSolution:
    """Backward Riccati factorization + forward rollout.

    ``reg`` is a Levenberg term added to Q_uu (and to the value curvature)
    to keep the sweep positive definite far from the solution
    [SURVEY §7 hard part #1].
    """
    nu = qp.b.shape[2]
    eye_u = jnp.eye(nu, dtype=qp.b.dtype)

    def backward(carry, stage):
        v_xx, v_x = carry
        a, b, c, q_xx, q_uu, q_xu, q_x, q_u = stage
        av = a.T @ v_xx
        bv = b.T @ v_xx
        h_xx = q_xx + av @ a
        h_uu = q_uu + bv @ b + reg * eye_u
        h_xu = q_xu + av @ b
        vc = v_x + v_xx @ c
        h_x = q_x + a.T @ vc
        h_u = q_u + b.T @ vc
        # small Nu x Nu solve via the unrolled Cholesky: pure elementwise
        # ops, so the sweep stays fast when the whole solver is vmapped
        # over batched rollouts (batched LAPACK HLOs are pathological on
        # this backend; see ops.chol.chol_small)
        l = chol_small(h_uu, clamp=False)

        def pd_solve(rhs):
            return tri_solve_small(l, tri_solve_small(l, rhs), trans=True)

        k_gain = -pd_solve(h_xu.T)
        k_ff = -pd_solve(h_u)
        v_xx_n = h_xx + h_xu @ k_gain
        v_xx_n = 0.5 * (v_xx_n + v_xx_n.T)
        v_x_n = h_x + h_xu @ k_ff
        # predicted decrease contribution: -k'h_u - 0.5 k'H_uu k
        dec = -jnp.dot(k_ff, h_u) - 0.5 * k_ff @ h_uu @ k_ff
        return (v_xx_n, v_x_n), (k_gain, k_ff, dec)

    stages = (qp.a, qp.b, qp.c, qp.q_xx, qp.q_uu, qp.q_xu, qp.q_x, qp.q_u)
    (_, _), (gains, ffs, decs) = jax.lax.scan(
        backward, (qp.qf_xx, qp.qf_x), stages, reverse=True)

    def forward(dx, stage):
        a, b, c, k_gain, k_ff = stage
        du = k_ff + k_gain @ dx
        dx_n = a @ dx + b @ du + c
        return dx_n, (dx, du)

    dx_final, (dxs, dus) = jax.lax.scan(
        forward, dx0, (qp.a, qp.b, qp.c, gains, ffs))
    dx_all = jnp.concatenate([dxs, dx_final[None]], axis=0)

    finite = (jnp.all(jnp.isfinite(dx_all)) & jnp.all(jnp.isfinite(dus))
              & jnp.all(jnp.isfinite(gains)))
    return RiccatiSolution(dx=dx_all, du=dus, gain_k=gains, ff_k=ffs,
                           ok=finite, exp_dec=jnp.sum(decs))


def lqr_gain(a: jnp.ndarray, b: jnp.ndarray, q: jnp.ndarray, r: jnp.ndarray,
             iters: int = 200) -> jnp.ndarray:
    """Infinite-horizon discrete LQR gain via Riccati iteration.

    TPU-native replacement for the reference's DARE-based ``lqr(A,B,Q,R)``
    helper (``gp_mpc/mpc_class.py`` module level [SURVEY C6, conf. M]) —
    fixed-point iteration under ``lax.scan`` instead of ``scipy`` Schur
    decomposition.  Returns K with u = -K x stabilizing A - B K.
    """
    def body(p, _):
        bp = b.T @ p
        k = jnp.linalg.solve(r + bp @ b, bp @ a)
        p_n = q + a.T @ p @ (a - b @ k)
        p_n = 0.5 * (p_n + p_n.T)
        return p_n, None

    p_final, _ = jax.lax.scan(body, q, None, length=iters)
    bp = b.T @ p_final
    return jnp.linalg.solve(r + bp @ b, bp @ a)
