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

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpmpc_tpu.ops.chol import chol_small, tri_solve_small, ge_solve_small


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


def solve_parallel(qp: StageQP, dx0: jnp.ndarray, reg: jnp.ndarray | float
                   ) -> RiccatiSolution:
    """Parallel-in-time Riccati: O(log Nt) depth via ``associative_scan``.

    The sequential backward sweep composes per-stage value-function maps one
    at a time; those maps form a monoid under the LQT combination rule
    (Särkkä & García-Fernández, temporal parallelization of LQT), so the
    whole backward pass is an associative suffix-scan over elements
    e = (A, b, C, eta, J) representing conditional value functions

        V_e(x, z) = 1/2 x'Jx - eta'x + max_l [l'(z - Ax - b) - 1/2 l'Cl].

    The forward rollout is likewise a prefix-scan over affine maps.  This is
    the SP-analog named in SURVEY §2.3 ("horizon-parallel factorization ...
    associative_scan variant"): wall-clock depth 2*ceil(log2 Nt) instead of
    2*Nt, at ~2x the total flops.  Same interface/semantics as
    :func:`solve` (regularization enters through q_uu + reg).
    """
    nt, nx, nu = qp.b.shape
    dtype = qp.b.dtype
    eye_x = jnp.eye(nx, dtype=dtype)
    eye_u = jnp.eye(nu, dtype=dtype)

    # ---- per-stage elements (eliminate u analytically) -------------------
    def make_elem(a, b, c, q_xx, q_uu, q_xu, q_x, q_u):
        r_reg = q_uu + reg * eye_u
        lr = chol_small(r_reg, clamp=False)

        def rsolve(rhs):
            return tri_solve_small(lr, tri_solve_small(lr, rhs), trans=True)

        bri = rsolve(b.T)                 # R^-1 B'   (nu, nx)
        mri = rsolve(q_xu.T)              # R^-1 M'   (nu, nx)
        rri = rsolve(q_u)                 # R^-1 r    (nu,)
        a_e = a - b @ mri
        b_e = c - b @ rri
        c_e = b @ bri
        j_e = q_xx - q_xu @ mri
        eta_e = -q_x + q_xu @ rri
        return a_e, b_e, c_e, eta_e, j_e

    a_s, b_s, c_s, eta_s, j_s = jax.vmap(make_elem)(
        qp.a, qp.b, qp.c, qp.q_xx, qp.q_uu, qp.q_xu, qp.q_x, qp.q_u)
    # terminal element: (0, 0, 0, -qf_x, qf_xx)
    elems = (
        jnp.concatenate([a_s, jnp.zeros((1, nx, nx), dtype)], 0),
        jnp.concatenate([b_s, jnp.zeros((1, nx), dtype)], 0),
        jnp.concatenate([c_s, jnp.zeros((1, nx, nx), dtype)], 0),
        jnp.concatenate([eta_s, -qp.qf_x[None]], 0),
        jnp.concatenate([j_s, qp.qf_xx[None]], 0),
    )

    # ---- associative combine (e1 earlier, e2 later-aggregate) ------------
    def combine(e1, e2):
        a1, b1, c1, n1, j1 = e1
        a2, b2, c2, n2, j2 = e2
        def mv(m, v):
            return jnp.einsum("...ij,...j->...i", m, v)

        # (I + C1 J2)^-1 applied to [A1 | b1 + C1 n2 | C1] in one solve
        m_left = eye_x + c1 @ j2
        rhs = jnp.concatenate([a1, (b1 + mv(c1, n2))[..., None], c1],
                              axis=-1)
        sol = ge_solve_small(m_left, rhs)
        la, lb, lc = sol[..., :nx], sol[..., nx], sol[..., nx + 1:]
        a = a2 @ la
        b = mv(a2, lb) + b2
        c = a2 @ lc @ jnp.swapaxes(a2, -1, -2) + c2
        # (I + J2 C1)^-1 applied to [n2 - J2 b1 | J2 A1]
        m_right = eye_x + j2 @ c1
        rhs2 = jnp.concatenate([(n2 - mv(j2, b1))[..., None], j2 @ a1],
                               axis=-1)
        sol2 = ge_solve_small(m_right, rhs2)
        a1t = jnp.swapaxes(a1, -1, -2)
        eta = mv(a1t, sol2[..., 0]) + n1
        j = a1t @ sol2[..., 1:] + j1
        return a, b, c, eta, j

    # NOTE argument order: with reverse=True the scan's operator receives
    # (later-aggregate, earlier-element); combine() is written as
    # (earlier, later), hence the flip.
    scanned = jax.lax.associative_scan(lambda a, b: combine(b, a),
                                       elems, reverse=True)
    s_all = scanned[4]                       # (Nt+1, nx, nx) value Hessians
    l_all = -scanned[3]                      # (Nt+1, nx)     value gradients

    # ---- per-stage gains from V_{k+1} (fully parallel) -------------------
    def gains(a, b, c, q_uu, q_xu, q_u, s_next, l_next):
        h_uu = q_uu + reg * eye_u + b.T @ s_next @ b
        l = chol_small(h_uu, clamp=False)

        def pd_solve(rhs):
            return tri_solve_small(l, tri_solve_small(l, rhs), trans=True)

        h_xu = q_xu + a.T @ s_next @ b
        h_u = q_u + b.T @ (s_next @ c + l_next)
        k_gain = -pd_solve(h_xu.T)
        k_ff = -pd_solve(h_u)
        dec = -jnp.dot(k_ff, h_u) - 0.5 * k_ff @ h_uu @ k_ff
        return k_gain, k_ff, dec

    gains_k, ffs, decs = jax.vmap(gains)(
        qp.a, qp.b, qp.c, qp.q_uu, qp.q_xu, qp.q_u, s_all[1:], l_all[1:])

    # ---- forward rollout as an affine prefix-scan ------------------------
    m_s = qp.a + jnp.einsum("tij,tjk->tik", qp.b, gains_k)
    v_s = jnp.einsum("tij,tj->ti", qp.b, ffs) + qp.c

    def compose(p, q):
        # p earlier prefix, q later: (Mq Mp, Mq vp + vq)
        mp, vp = p
        mq, vq = q
        return mq @ mp, jnp.einsum("...ij,...j->...i", mq, vp) + vq

    mm, vv = jax.lax.associative_scan(compose, (m_s, v_s))
    dx_tail = jnp.einsum("tij,j->ti", mm, dx0) + vv      # dx_1..dx_Nt
    dx_all = jnp.concatenate([dx0[None], dx_tail], axis=0)
    dus = ffs + jnp.einsum("tij,tj->ti", gains_k, dx_all[:-1])

    finite = (jnp.all(jnp.isfinite(dx_all)) & jnp.all(jnp.isfinite(dus))
              & jnp.all(jnp.isfinite(gains_k)))
    return RiccatiSolution(dx=dx_all, du=dus, gain_k=gains_k, ff_k=ffs,
                           ok=finite, exp_dec=jnp.sum(decs))


def solve_fused(qp: StageQP, dx0: jnp.ndarray, reg: jnp.ndarray | float
                ) -> RiccatiSolution:
    """Single-kernel Pallas Riccati sweep — same math and interface as
    :func:`solve`, executed as ONE launch (the BASELINE north star's "Pallas
    Riccati/Cholesky KKT sweep").

    Measured motivation (v5e, Nt=20/nx=4/nu=2): the sweep is pure launch
    latency at MPC sizes — sequential scan ~350 us, associative-scan
    parallel ~100 us, this kernel ~10 us (see benchmarks/RESULTS.md).  The
    kernel runs in f32 (TPU production dtype); off-TPU backends execute it
    through the Pallas interpreter, so the function stays correct (if slow)
    everywhere and the x64 parity path should keep using :func:`solve`.
    """
    from gpmpc_tpu.ops.pallas_kernels import riccati_sweep_pallas

    if qp.b.dtype == jnp.float64:
        # dtype is static at trace time, so this is a hard error — a
        # trace-time warning was too easy to miss and the x64 parity result
        # silently degraded to f32 accuracy (ADVICE r2).  Mirrors the MPC
        # constructor's fused_kkt/float64 guard.
        raise ValueError(
            "solve_fused runs the KKT sweep in f32 (TPU production dtype) "
            "— it would silently degrade a float64 problem; use "
            "riccati.solve or solve_parallel for x64 parity work")
    interpret = jax.default_backend() != "tpu"
    dx, du, gains, ffs, dec = riccati_sweep_pallas(
        qp.a, qp.b, qp.c, qp.q_xx, qp.q_uu, qp.q_xu, qp.q_x, qp.q_u,
        qp.qf_xx, qp.qf_x, dx0, reg, interpret=interpret)
    finite = (jnp.all(jnp.isfinite(dx)) & jnp.all(jnp.isfinite(du))
              & jnp.all(jnp.isfinite(gains)))
    return RiccatiSolution(dx=dx, du=du, gain_k=gains, ff_k=ffs,
                           ok=finite, exp_dec=dec)


@dataclasses.dataclass(frozen=True)
class KKTPolicy:
    """Per-horizon dispatch thresholds for the KKT backends (the analog of
    :class:`gpmpc_tpu.ops.dispatch.PallasPolicy` for the Riccati sweep —
    VERDICT r3 #3 asked for the same measured-crossover discipline here).

    Measured on v5e f32, nx=4, nu=2 (``benchmarks/r4_kkt_crossover.py``;
    table in benchmarks/RESULTS.md "KKT backend crossover in Nt"): the
    fused single-launch kernel is fastest at every horizon measured
    (23.5 / 56 / 107 / 214 us at Nt=20/50/100/200, vs 110 / 160 / 207 /
    289 parallel and 343 / 856 / 1700 / 3399 sequential), but its latency
    is linear in Nt (~1.0 us/stage in-kernel) against the associative
    scan's log-depth (~+50 us per Nt-doubling), and its Python-unrolled
    stage loops make COMPILE time grow ~linearly with Nt (1.8 / 4.0 /
    9.1 / 19.8 s) — so ``fused_max_nt`` caps it a little past the last
    measured point, ahead of the extrapolated ~Nt=450 latency crossover
    and of minute-class compiles.  ``parallel_min_nt`` is where the
    associative scan overtakes the sequential sweep when the fused kernel
    is unavailable (measured: 3.1x faster already at Nt=20).
    """

    fused_max_nt: int = 256      # beyond: compile cost + linear-in-Nt kernel
    parallel_min_nt: int = 20    # sequential wins below (fewer total flops)


_KKT_POLICY = KKTPolicy()


def set_kkt_policy(policy: KKTPolicy) -> None:
    global _KKT_POLICY
    _KKT_POLICY = policy


def get_kkt_policy() -> KKTPolicy:
    return _KKT_POLICY


def select_backend(nt: int, dtype, fused: bool = False,
                   parallel: bool = False):
    """Pick the KKT solve for a horizon-``nt`` QP (static dispatch — ``nt``
    and ``dtype`` are trace-time constants).

    * ``fused=True`` requests the single-launch Pallas sweep; it is
      honored up to ``KKTPolicy.fused_max_nt``, beyond which the request
      degrades to the associative-scan backend instead of compiling an
      Nt-times-unrolled kernel.  f64 + fused raises (the kernel runs f32;
      same contract as :func:`solve_fused` — a silent precision downgrade
      of the parity path was an ADVICE r2 finding).
    * ``parallel=True`` requests the associative-scan backend outright.
    * Neither: sequential below ``parallel_min_nt``; for f32 long horizons
      the associative scan (measured 2.1x at Nt=60, horizon-flat) is
      selected automatically.  f64 always stays sequential — the x64
      parity/golden path wants one deterministic reduction order.
    """
    p = _KKT_POLICY
    is_f64 = jnp.dtype(dtype) == jnp.float64
    if fused:
        if is_f64:
            raise ValueError(
                "fused_kkt runs the KKT sweep in f32 (TPU production "
                "dtype) — it would silently degrade a float64 problem; "
                "use the default or parallel Riccati path for x64 parity")
        return solve_fused if nt <= p.fused_max_nt else solve_parallel
    if parallel:
        return solve_parallel
    if not is_f64 and nt >= p.parallel_min_nt:
        return solve_parallel
    return solve


def lqr_gain(a: jnp.ndarray, b: jnp.ndarray, q: jnp.ndarray, r: jnp.ndarray,
             max_iters: int = 1000, tol: float = 1e-9,
             return_converged: bool = False):
    """Infinite-horizon discrete LQR gain via Riccati iteration.

    TPU-native replacement for the reference's DARE-based ``lqr(A,B,Q,R)``
    helper (``gp_mpc/mpc_class.py`` module level [SURVEY C6, conf. M]) —
    fixed-point iteration under ``lax.while_loop`` with a relative
    ``||P_{k+1} - P_k||_inf`` stopping test and an iteration cap, instead of
    a ``scipy`` Schur decomposition.  Returns K with u = -K x stabilizing
    A - B K; with ``return_converged=True`` also returns a bool flag that is
    False when the cap was hit before the tolerance (e.g. for
    near-unstabilizable (A, B) pairs, where the silent fixed-count version
    of this routine produced an unreliable gain).
    """
    # dtype-aware tolerance floor: 1e-9 relative is below the f32 (TPU
    # production dtype) resolution; without the floor the loop always runs
    # to the cap and reports non-convergence on perfectly good pairs
    tol = max(tol, 50.0 * float(jnp.finfo(q.dtype).eps))

    def cond(carry):
        _, it, done = carry
        return (~done) & (it < max_iters)

    def body(carry):
        p, it, _ = carry
        bp = b.T @ p
        k = jnp.linalg.solve(r + bp @ b, bp @ a)
        p_n = q + a.T @ p @ (a - b @ k)
        p_n = 0.5 * (p_n + p_n.T)
        delta = jnp.max(jnp.abs(p_n - p)) / (1.0 + jnp.max(jnp.abs(p_n)))
        return p_n, it + 1, delta <= tol

    # MXU default matmul precision is bf16-multiply: its ~1e-3 relative
    # noise keeps the fixed point oscillating above the f32 tolerance
    # floor, so the loop hit the cap and reported spurious non-convergence
    # on perfectly stabilizable pairs (observed on v5e with the car
    # linearization).  These are Nx x Nx matmuls in a one-time constructor
    # path — full f32 precision is free here.
    with jax.default_matmul_precision("highest"):
        p_final, _, done = jax.lax.while_loop(
            cond, body, (q, jnp.zeros((), jnp.int32), jnp.asarray(False)))
        bp = b.T @ p_final
        k = jnp.linalg.solve(r + bp @ b, bp @ a)
    if return_converged:
        return k, done
    return k
