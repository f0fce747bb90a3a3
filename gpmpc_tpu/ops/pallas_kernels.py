"""Pallas TPU kernels for the GP compute path.

BASELINE north star: "the GP layer (SE/ARD Gram matrix construction,
Cholesky-factorized log-marginal-likelihood training, predictive
mean/variance) runs as Pallas kernels".  These are the fused building
blocks; the jnp reference semantics live in :mod:`gpmpc_tpu.ops.kernels`
and :mod:`gpmpc_tpu.ops.chol` (CPU path + correctness oracle — every kernel
here is tested against them in interpret mode and, on hardware, compiled).

Design notes (per the TPU kernel playbook):

* ``se_ard_gram``: one fused pass — the scaled cross products ride the MXU
  (``jnp.dot`` with f32 accumulation), the row-norm broadcast + exp ride the
  VPU, and the (sf2 + sn2) diagonal write happens in-register — no HBM
  round-trip between the matmul and the exponential (XLA usually fuses this
  too; the kernel guarantees it and controls the tiling).
* ``cholesky``: right-looking blocked factorization entirely in VMEM for
  N <= 1024 (a 1024^2 f32 matrix is 4 MB < 16 MB VMEM): factor a 128-panel
  diagonal block with an in-register unblocked loop, triangular-solve the
  panel below it, SYRK-update the trailing matrix on the MXU.
* batched GP predict (``gp_predict_batch``): for B query points and Ny
  output dims, fuse the cross-kernel k* computation with the alpha / invK
  contractions — the hot op of BASELINE config 1 ("GP mean/var predict,
  us-scale").

All wrappers pad to (8,128)-aligned shapes and slice back, so callers keep
natural sizes (N ~ 100 training points).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ------------------------------------------------------------------ gram

def _gram_kernel(xi_ref, xj_ref, diag_ref, out_ref):
    """One (TN, TN) tile of  sf2*exp(-0.5*d2(xs_i, xs_j)) (+ diag term).

    The SAME pre-scaled point array feeds two BlockSpecs — a row tile and a
    column tile — so no in-kernel dynamic slicing is needed (Mosaic does not
    lower ``dynamic_slice`` on values).  ``diag_ref`` holds (sf2, extra
    diagonal mass) in SMEM; the diagonal is overwritten on diagonal tiles.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    xi_t = xi_ref[...]                    # (TN, Dp) row tile
    xj_t = xj_ref[...]                    # (TN, Dp) col tile
    tn = out_ref.shape[0]
    cross = jnp.dot(xi_t, xj_t.T, preferred_element_type=jnp.float32)
    ni = jnp.sum(xi_t * xi_t, axis=1, keepdims=True)
    nj = jnp.sum(xj_t * xj_t, axis=1, keepdims=True)
    d2 = jnp.maximum(ni + nj.T - 2.0 * cross, 0.0)
    sf2 = diag_ref[0, 0]
    extra = diag_ref[0, 1]
    k = sf2 * jnp.exp(-0.5 * d2)

    @pl.when(i == j)
    def _():
        rows = jax.lax.broadcasted_iota(jnp.int32, (tn, tn), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tn, tn), 1)
        out_ref[...] = jnp.where(rows == cols, sf2 + extra, k)

    @pl.when(i != j)
    def _():
        out_ref[...] = k


def se_ard_gram_pallas(x: jnp.ndarray, ell: jnp.ndarray, sf2,
                       sn2=0.0, jitter: float = 0.0,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused SE-ARD Gram matrix K(X,X) + (sn2 + jitter*sf2) I on TPU.

    Semantics identical to :func:`gpmpc_tpu.ops.kernels.se_ard_gram`.
    """
    n, d = x.shape
    dtype = x.dtype
    tn = 128
    npad = _round_up(max(n, 8), tn)
    dpad = _round_up(max(d, 1), 128)
    # scale inputs once; pad points far away so their kernel values underflow
    xs = jnp.zeros((npad, dpad), jnp.float32)
    xs = xs.at[:n, :d].set((x / ell).astype(jnp.float32))
    xs = xs.at[n:, 0].set(1e6)
    sf2 = jnp.asarray(sf2, jnp.float32)
    extra = jnp.asarray(sn2, jnp.float32) + jitter * sf2
    diag = jnp.stack([sf2, extra]).reshape(1, 2)

    grid = (npad // tn, npad // tn)
    out = pl.pallas_call(
        _gram_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, dpad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, dpad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tn, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, npad), jnp.float32),
        interpret=interpret,
    )(xs, xs, diag)
    return out[:n, :n].astype(dtype)


# -------------------------------------------------------------- cholesky

def _chol_kernel(a_ref, out_ref, *, n_blocks: int, tb: int):
    """Right-looking blocked Cholesky, whole matrix resident in VMEM.

    Mosaic lowering constraints shape the implementation: dynamic slicing is
    only available through REF indexing (``ref[pl.ds(off, size)]``), and
    per-column access inside the unblocked factorization uses masked
    full-block ops (broadcasted-iota compare + reduce) instead of value
    dynamic-slices.  Panel work is O(tb^2) masked VPU ops per column; the
    trailing SYRK update is a full (N, tb) x (tb, N) MXU matmul per panel.
    """
    nb = out_ref.shape[0]
    out_ref[...] = a_ref[...]
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (tb, tb), 0)
    cols_t = jax.lax.broadcasted_iota(jnp.int32, (tb, tb), 1)
    hot_t = jax.lax.broadcasted_iota(jnp.int32, (1, tb), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)[:, 0]

    def panel_step(k, _):
        off = k * tb

        # --- factor the diagonal block (masked unblocked Cholesky) ---
        akk = out_ref[pl.ds(off, tb), pl.ds(off, tb)]

        def chol_col(i, l):
            # row/column i extracted via (1,tb) one-hot matmuls, all shapes
            # kept 2D and scalars as (1,1) — Mosaic rejects 1D contractions
            # and masked axis-reductions at these layouts
            oh = (hot_t == i).astype(jnp.float32)                 # (1, tb)
            row_i = jnp.dot(oh, l, preferred_element_type=jnp.float32)
            col_i = jnp.dot(l, oh.T, preferred_element_type=jnp.float32)
            li_masked = jnp.where(hot_t < i, row_i, 0.0)          # (1, tb)
            lii = jnp.dot(row_i, oh.T,
                          preferred_element_type=jnp.float32)     # (1, 1)
            sumsq = jnp.dot(li_masked, li_masked.T,
                            preferred_element_type=jnp.float32)
            dii = jnp.sqrt(jnp.maximum(lii - sumsq, 1e-30))       # (1, 1)
            lj_masked = jnp.where(cols_t < i, l, 0.0)
            acc = jnp.dot(lj_masked, li_masked.T,
                          preferred_element_type=jnp.float32)     # (tb, 1)
            new_col = (col_i - acc) / dii
            rowsel = rows_t[:, :1]                                # (tb, 1)
            new_col = jnp.where(rowsel > i, new_col,
                                jnp.where(rowsel == i,
                                          jnp.broadcast_to(dii, (tb, 1)),
                                          col_i))
            return jnp.where(cols_t == i, new_col, l)

        lkk = jax.lax.fori_loop(0, tb, chol_col, akk)
        lkk = jnp.where(rows_t >= cols_t, lkk, 0.0)
        out_ref[pl.ds(off, tb), pl.ds(off, tb)] = lkk

        # --- panel solve: stripe[r, :] <- stripe[r, :] L_kk^{-T}, r below ---
        stripe = out_ref[pl.ds(0, nb), pl.ds(off, tb)]       # (nb, tb)
        below_mask = row_ids >= off + tb
        cols_s = jax.lax.broadcasted_iota(jnp.int32, (nb, tb), 1)

        def solve_col(i, b):
            oh = (hot_t == i).astype(jnp.float32)                 # (1, tb)
            lrow = jnp.dot(oh, lkk, preferred_element_type=jnp.float32)
            lrow_masked = jnp.where(hot_t < i, lrow, 0.0)         # (1, tb)
            lii = jnp.dot(lrow, oh.T,
                          preferred_element_type=jnp.float32)     # (1, 1)
            b_col = jnp.dot(b, oh.T,
                            preferred_element_type=jnp.float32)   # (nb, 1)
            acc = jnp.dot(b, lrow_masked.T,
                          preferred_element_type=jnp.float32)     # (nb, 1)
            new = (b_col - acc) / lii
            return jnp.where(cols_s == i, new, b)

        panel = jax.lax.fori_loop(0, tb, solve_col, stripe)
        panel = jnp.where(below_mask[:, None], panel, stripe)
        out_ref[pl.ds(0, nb), pl.ds(off, tb)] = panel

        # --- trailing SYRK update on the MXU ---
        p_masked = jnp.where(below_mask[:, None], panel, 0.0)
        upd = jnp.dot(p_masked, p_masked.T,
                      preferred_element_type=jnp.float32)
        out_ref[...] = out_ref[...] - upd
        return 0

    jax.lax.fori_loop(0, n_blocks, panel_step, 0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    out_ref[...] = jnp.where(rows >= cols, out_ref[...], 0.0)


def cholesky_pallas(a: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Blocked in-VMEM Cholesky for SPD matrices up to ~1024x1024.

    Semantics match ``jnp.linalg.cholesky`` (lower factor).  Padded slots
    get an identity diagonal so the factorization stays well-posed.
    """
    n = a.shape[0]
    dtype = a.dtype
    tb = 128
    npad = _round_up(max(n, 8), tb)
    ap = jnp.eye(npad, dtype=jnp.float32)
    ap = ap.at[:n, :n].set(a.astype(jnp.float32))

    out = pl.pallas_call(
        functools.partial(_chol_kernel, n_blocks=npad // tb, tb=tb),
        in_specs=[pl.BlockSpec((npad, npad), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((npad, npad), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, npad), jnp.float32),
        interpret=interpret,
    )(ap)
    return out[:n, :n].astype(dtype)


# --------------------------------------------- fused RK4 substep chain

def rk4_substeps_pallas(ode, x, u, h: float, n_sub: int,
                        interpret: bool = False):
    """``n_sub`` RK4 substeps of ``ode(x, u)`` as ONE kernel launch.

    The plant-truth integrate (``Model.integrate``) is a sequential chain of
    4*n_sub tiny ODE evaluations; under ``lax.scan`` OR trace-time unrolling
    each evaluation is its own kernel launch (~100 us for n_sub=10 at Nx=4
    on v5e, measured — pure latency).  Here the user's pure-jnp ODE is
    traced INTO the kernel body and the whole chain runs in registers:
    one launch, ~10 us.  State/inputs ride as (1, n) rows; any jnp
    elementwise math in the ODE lowers to VPU ops.
    """
    nx = x.shape[0]
    nu = u.shape[0]
    dtype = x.dtype
    f32 = jnp.float32

    def kernel(x_ref, u_ref, out_ref):
        xv = x_ref[0, :]
        uv = u_ref[0, :]

        def f(z):
            return ode(z, uv)

        for _ in range(n_sub):
            k1 = f(xv)
            k2 = f(xv + (0.5 * h) * k1)
            k3 = f(xv + (0.5 * h) * k2)
            k4 = f(xv + h * k3)
            xv = xv + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        out_ref[0, :] = xv

    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, nx), f32),
        interpret=interpret,
    )(x.reshape(1, nx).astype(f32), u.reshape(1, nu).astype(f32))
    return out[0].astype(dtype)


# ------------------------------------------------- fused Riccati sweep

def _chol_cols_small(a, n):
    """Unrolled Cholesky of an (n, n) SPD value inside a kernel; returns the
    lower factor built from static column slices (Mosaic lowers static value
    slices; no ``.at[].set`` / dynamic_update_slice needed).  A non-PD pivot
    yields NaN (sqrt of a negative) that propagates to the caller's
    finiteness check — same failure semantics as ``ops.chol.chol_small``
    with ``clamp=False``."""
    rows2d = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    cols = []
    for j in range(n):
        s = a[:, j:j + 1]                               # (n, 1)
        for k in range(j):
            s = s - cols[k] * cols[k][j:j + 1, :]
        dsq = jnp.sqrt(s[j:j + 1, :])                   # (1, 1)
        cj = s / dsq
        cj = jnp.where(rows2d > j, cj, 0.0)
        cj = jnp.where(rows2d == j, jnp.broadcast_to(dsq, (n, 1)), cj)
        cols.append(cj)
    return jnp.concatenate(cols, axis=1)


def _chol_solve_small(l, b, n):
    """Solve (L L') X = B for small static n with unrolled row slices;
    B is (n, k)."""
    ys = []
    for i in range(n):                                   # L y = b
        acc = b[i:i + 1, :]
        for k in range(i):
            acc = acc - l[i:i + 1, k:k + 1] * ys[k]
        ys.append(acc / l[i:i + 1, i:i + 1])
    xs = [None] * n
    for i in range(n - 1, -1, -1):                       # L' x = y
        acc = ys[i]
        for k in range(i + 1, n):
            acc = acc - l[k:k + 1, i:i + 1] * xs[k]
        xs[i] = acc / l[i:i + 1, i:i + 1]
    return jnp.concatenate(xs, axis=0)


def _riccati_kernel(a_ref, b_ref, c_ref, qxx_ref, quu_ref, qxu_ref,
                    qx_ref, qu_ref, qfxx_ref, qfx_ref, dx0_ref, reg_ref,
                    dx_ref, du_ref, gain_ref, ff_ref, dec_ref,
                    *, nt: int, nx: int, nu: int):
    """The ENTIRE Riccati backward factorization + forward rollout as ONE
    kernel launch.

    Motivation (measured, v5e): at MPC sizes (Nt~20, nx~4, nu~2) the sweep
    is pure launch latency — `lax.scan` costs ~350 us, trace-time unrolling
    ~380 us (each tiny matmul is still its own kernel), the associative-scan
    parallel form ~100 us.  All state here lives in registers/VMEM and the
    stage loops are Python-unrolled (nt is static), so the same math runs in
    a single launch.  Time-flattened 2D refs (stage t at rows [t*n,(t+1)*n))
    keep every access a static 2D slice, which Mosaic lowers cleanly.
    """
    dec = jnp.zeros((1, 1), jnp.float32)
    reg_eye = reg_ref[0, 0] * jnp.eye(nu, dtype=jnp.float32)

    v_xx = qfxx_ref[...]                                 # (nx, nx)
    v_x = qfx_ref[...].T                                 # (nx, 1)

    gains = [None] * nt
    ffs = [None] * nt
    for t in range(nt - 1, -1, -1):
        a = a_ref[t * nx:(t + 1) * nx, :]                # (nx, nx)
        b = b_ref[t * nx:(t + 1) * nx, :]                # (nx, nu)
        c = c_ref[t:t + 1, :].T                          # (nx, 1)
        q_xx = qxx_ref[t * nx:(t + 1) * nx, :]
        q_uu = quu_ref[t * nu:(t + 1) * nu, :]
        q_xu = qxu_ref[t * nx:(t + 1) * nx, :]
        q_x = qx_ref[t:t + 1, :].T                       # (nx, 1)
        q_u = qu_ref[t:t + 1, :].T                       # (nu, 1)

        av = jnp.dot(a.T, v_xx, preferred_element_type=jnp.float32)
        bv = jnp.dot(b.T, v_xx, preferred_element_type=jnp.float32)
        h_xx = q_xx + jnp.dot(av, a, preferred_element_type=jnp.float32)
        h_uu = q_uu + jnp.dot(bv, b,
                              preferred_element_type=jnp.float32) + reg_eye
        h_xu = q_xu + jnp.dot(av, b, preferred_element_type=jnp.float32)
        vc = v_x + jnp.dot(v_xx, c, preferred_element_type=jnp.float32)
        h_x = q_x + jnp.dot(a.T, vc, preferred_element_type=jnp.float32)
        h_u = q_u + jnp.dot(b.T, vc, preferred_element_type=jnp.float32)

        l = _chol_cols_small(h_uu, nu)
        sol = _chol_solve_small(
            l, jnp.concatenate([h_xu.T, h_u], axis=1), nu)  # (nu, nx+1)
        k_gain = -sol[:, :nx]
        k_ff = -sol[:, nx:]                              # (nu, 1)
        gains[t] = k_gain
        ffs[t] = k_ff

        v_xx = h_xx + jnp.dot(h_xu, k_gain,
                              preferred_element_type=jnp.float32)
        v_xx = 0.5 * (v_xx + v_xx.T)
        v_x = h_x + jnp.dot(h_xu, k_ff, preferred_element_type=jnp.float32)
        hk = jnp.dot(h_uu, k_ff, preferred_element_type=jnp.float32)
        dec = dec - jnp.dot(k_ff.T, h_u + 0.5 * hk,
                            preferred_element_type=jnp.float32)

        gain_ref[t * nu:(t + 1) * nu, :] = k_gain
        ff_ref[t:t + 1, :] = k_ff.T

    dec_ref[0, 0] = dec[0, 0]

    dx = dx0_ref[...].T                                  # (nx, 1)
    for t in range(nt):
        a = a_ref[t * nx:(t + 1) * nx, :]
        b = b_ref[t * nx:(t + 1) * nx, :]
        c = c_ref[t:t + 1, :].T
        du = ffs[t] + jnp.dot(gains[t], dx,
                              preferred_element_type=jnp.float32)
        dx_ref[t:t + 1, :] = dx.T
        du_ref[t:t + 1, :] = du.T
        dx = (jnp.dot(a, dx, preferred_element_type=jnp.float32)
              + jnp.dot(b, du, preferred_element_type=jnp.float32) + c)
    dx_ref[nt:nt + 1, :] = dx.T


def riccati_sweep_pallas(a, b, c, q_xx, q_uu, q_xu, q_x, q_u, qf_xx, qf_x,
                         dx0, reg, interpret: bool = False):
    """Single-launch Riccati sweep.  Stage arrays shaped as in
    :class:`gpmpc_tpu.solvers.riccati.StageQP`; returns
    ``(dx (Nt+1,nx), du (Nt,nu), gains (Nt,nu,nx), ffs (Nt,nu), exp_dec)``.
    Semantics identical to ``riccati.solve`` (sequential sweep)."""
    nt, nx, nu = b.shape
    dtype = a.dtype
    f32 = jnp.float32
    args = (
        a.reshape(nt * nx, nx).astype(f32),
        b.reshape(nt * nx, nu).astype(f32),
        c.astype(f32),
        q_xx.reshape(nt * nx, nx).astype(f32),
        q_uu.reshape(nt * nu, nu).astype(f32),
        q_xu.reshape(nt * nx, nu).astype(f32),
        q_x.astype(f32),
        q_u.astype(f32),
        qf_xx.astype(f32),
        qf_x.reshape(1, nx).astype(f32),
        dx0.reshape(1, nx).astype(f32),
        jnp.asarray(reg, f32).reshape(1, 1),
    )
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    dx, du, gains, ffs, dec = pl.pallas_call(
        functools.partial(_riccati_kernel, nt=nt, nx=nx, nu=nu),
        in_specs=[vspec] * 11 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(vspec, vspec, vspec, vspec,
                   pl.BlockSpec(memory_space=pltpu.SMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((nt + 1, nx), f32),
            jax.ShapeDtypeStruct((nt, nu), f32),
            jax.ShapeDtypeStruct((nt * nu, nx), f32),
            jax.ShapeDtypeStruct((nt, nu), f32),
            jax.ShapeDtypeStruct((1, 1), f32),
        ),
        interpret=interpret,
    )(*args)
    return (dx.astype(dtype), du.astype(dtype),
            gains.reshape(nt, nu, nx).astype(dtype), ffs.astype(dtype),
            dec[0, 0].astype(dtype))


# ------------------------------------------------------- batched predict

def _predict_kernel(zs_ref, xs_ref, alpha_ref, hyp_ref, mu_ref, ks_ref):
    """Fused k* + mean for one output dim d over a tile of query points.

    zs/xs pre-scaled by 1/ell_d outside.  Writes mu (B,) and k* (B, N) so
    the variance path can run its triangular solves on k* afterward.
    """
    z = zs_ref[...]                       # (TB, Dp)
    x = xs_ref[...]                       # (Np, Dp)
    cross = jnp.dot(z, x.T, preferred_element_type=jnp.float32)
    nz = jnp.sum(z * z, axis=1, keepdims=True)
    nx = jnp.sum(x * x, axis=1, keepdims=True)
    d2 = jnp.maximum(nz + nx.T - 2.0 * cross, 0.0)
    sf2 = hyp_ref[0, 0]
    ks = sf2 * jnp.exp(-0.5 * d2)         # (TB, Np)
    ks_ref[...] = ks
    alpha = alpha_ref[...]                # (1, Np)
    mu_ref[...] = jnp.dot(ks, alpha.T,
                          preferred_element_type=jnp.float32)


def gp_predict_batch_pallas(z: jnp.ndarray, x: jnp.ndarray,
                            ell: jnp.ndarray, sf2, alpha: jnp.ndarray,
                            interpret: bool = False):
    """Batched single-dim GP k*/mean: z (B,D), x (N,D) -> (mu (B,), ks (B,N)).

    The caller completes the variance with ``tri_solve(L, ks.T)`` (XLA) —
    the O(B N D) kernel work is fused here, the O(B N^2) solve stays in the
    tuned XLA triangular-solve.
    """
    b, d = z.shape
    n = x.shape[0]
    dtype = z.dtype
    tb = 128
    bpad = _round_up(max(b, 8), tb)
    npad = _round_up(max(n, 8), 128)
    dpad = _round_up(max(d, 1), 128)

    zs = jnp.zeros((bpad, dpad), jnp.float32)
    zs = zs.at[:b, :d].set((z / ell).astype(jnp.float32))
    xs = jnp.zeros((npad, dpad), jnp.float32)
    xs = xs.at[:n, :d].set((x / ell).astype(jnp.float32))
    xs = xs.at[n:, 0].set(1e6)
    al = jnp.zeros((1, npad), jnp.float32).at[0, :n].set(
        alpha.astype(jnp.float32))
    hyp = jnp.asarray(sf2, jnp.float32).reshape(1, 1)

    mu, ks = pl.pallas_call(
        _predict_kernel,
        grid=(bpad // tb,),
        in_specs=[
            pl.BlockSpec((tb, dpad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npad, dpad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((tb, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, npad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bpad, 1), jnp.float32),
            jax.ShapeDtypeStruct((bpad, npad), jnp.float32),
        ),
        interpret=interpret,
    )(zs, xs, al, hyp)
    return mu[:b, 0].astype(dtype), ks[:b, :n].astype(dtype)
