"""Batched closed-loop study: parallel receding-horizon rollouts with
per-rollout online GP conditioning — BASELINE config 5.

The reference is single-process and runs one rollout at a time in a Python
loop [SURVEY §2.3 'DP: absent'].  Here the *entire* study is one compiled
program: ``vmap`` over initial states batches every stage of every rollout's
MPC solves into large fused array ops (the Ny-GP predictions, the stage
Hessians, the Riccati sweeps all gain a 1024-wide leading batch axis —
exactly the shape of work the TPU's MXU/VPU want), and the batch axis is
sharded over a ``jax.sharding.Mesh`` so multi-chip scaling is a sharding
annotation, not new code — XLA inserts the ICI collectives for the psum'd
aggregate metrics [SURVEY §2.3 'TPU-native plan'].

Each rollout carries its own :class:`OnlinePosterior` in the scan state and
conditions it on every observed transition (O(C^2) bordered Cholesky
updates), so the 1024 GP posteriors diverge as the rollouts explore.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpmpc_tpu.parallel import online_gp
from gpmpc_tpu.solvers import al_sqp
from gpmpc_tpu.utils.config import SQPConfig, resolve_solver_opts


class StudyConsts(NamedTuple):
    """Arrays the study NLP reads — passed as runtime arguments (captured
    array constants cost ~25 ms/call on this TPU backend)."""

    q: jnp.ndarray
    r: jnp.ndarray
    ulb: jnp.ndarray
    uub: jnp.ndarray
    u_scale: jnp.ndarray
    u_guard_lo: jnp.ndarray
    u_guard_hi: jnp.ndarray
    norm: object                     # Normalization pytree


class StudyParams(NamedTuple):
    x_sp: jnp.ndarray
    post: online_gp.OnlinePosterior
    consts: StudyConsts


class StudyResult(NamedTuple):
    x_traj: jnp.ndarray     # (B, n_steps+1, Nx)
    u_traj: jnp.ndarray     # (B, n_steps, Nu)
    cost: jnp.ndarray       # (B,) closed-loop quadratic cost per rollout
    obj: jnp.ndarray        # (B, n_steps) NLP objectives
    gp_points: jnp.ndarray  # (B,) final conditioning counts
    mean_cost: jnp.ndarray  # () batch-mean cost (cross-device psum)
    post: object            # batched OnlinePosterior (B-leading) for resume


def save_study(path: str, result: StudyResult) -> None:
    """Checkpoint a study (trajectories + per-rollout conditioned posteriors)
    to ``.npz`` [SURVEY §5 'checkpoint/resume']."""
    post_leaves, _ = jax.tree.flatten(result.post)
    np.savez(path,
             x_traj=np.asarray(result.x_traj),
             u_traj=np.asarray(result.u_traj),
             cost=np.asarray(result.cost),
             obj=np.asarray(result.obj),
             gp_points=np.asarray(result.gp_points),
             mean_cost=np.asarray(result.mean_cost),
             n_post_leaves=len(post_leaves),
             **{f"post_{i}": np.asarray(l)
                for i, l in enumerate(post_leaves)})


def load_study(path: str, template_post) -> StudyResult:
    """Load a study checkpoint; ``template_post`` (e.g. ``study.post0``)
    supplies the posterior pytree structure."""
    z = np.load(path)
    n = int(z["n_post_leaves"])
    tmpl_leaves, treedef = jax.tree.flatten(template_post)
    leaves = [np.asarray(z[f"post_{i}"]) for i in range(n)]
    if n == len(tmpl_leaves) - 1:
        # 0.3.x checkpoint: predates OnlinePosterior.mean_w (appended
        # trailing field).  Synthesize it from the template — zero-width
        # for mean_func='zero' (every 0.3.x study), otherwise the frozen
        # trained weights — batched to match the saved leaves.
        mw = np.asarray(tmpl_leaves[-1])
        if leaves and leaves[0].ndim == np.asarray(tmpl_leaves[0]).ndim + 1:
            mw = np.broadcast_to(mw, (leaves[0].shape[0],) + mw.shape)
        leaves.append(mw)
    post = jax.tree.unflatten(treedef, [jnp.asarray(l) for l in leaves])
    return StudyResult(
        x_traj=jnp.asarray(z["x_traj"]), u_traj=jnp.asarray(z["u_traj"]),
        cost=jnp.asarray(z["cost"]), obj=jnp.asarray(z["obj"]),
        gp_points=jnp.asarray(z["gp_points"]),
        mean_cost=jnp.asarray(z["mean_cost"]), post=post)


class BatchedStudy:
    """1024-rollout GP-MPC study harness.

    ``run(x0s, x_sp, n_steps, key)`` executes all rollouts; if a mesh is
    given the batch axis is sharded across ALL of its axes (1D ``("dp",)``
    or the multi-host 2D ``("dcn", "dp")`` from
    :func:`gpmpc_tpu.parallel.distributed.make_study_mesh`).
    """

    def __init__(self, model, gp, horizon: float,
                 Q=None, R=None, ulb=None, uub=None,
                 capacity: Optional[int] = None,
                 condition_online: bool = True,
                 online_policy: str = "saturate",
                 solver_opts: Optional[Union[str, dict]] = None,
                 solve_precision: Optional[str] = None,
                 mesh: Optional[Mesh] = None,
                 chunk: Optional[int] = None):
        self.model = model
        self.dt = model.dt
        self.Nt = int(round(horizon / model.dt))
        self.Nx, self.Nu = model.Nx, model.Nu
        dtype = model.dtype
        self.dtype = dtype
        self.condition_online = bool(condition_online)
        if online_policy not in ("saturate", "fifo"):
            raise ValueError("online_policy must be 'saturate' or 'fifo'; "
                             f"got {online_policy!r}")
        self.online_policy = online_policy

        self.Q = jnp.asarray(Q if Q is not None else np.eye(self.Nx), dtype)
        self.R = jnp.asarray(R if R is not None else 0.01 * np.eye(self.Nu),
                             dtype)
        big = 1e10
        self.ulb = jnp.asarray(ulb if ulb is not None
                               else [-big] * self.Nu, dtype)
        self.uub = jnp.asarray(uub if uub is not None
                               else [big] * self.Nu, dtype)
        # named presets resolve through the shared table; a falsy dict/None
        # keeps the study's own default budget (al3/mi15 — the historical
        # `solver_opts or {...}` semantics), while the 'converged' preset
        # explicitly selects SQPConfig()'s full-convergence defaults
        if isinstance(solver_opts, str):
            opts = resolve_solver_opts(solver_opts, dtype)
        else:
            opts = solver_opts or {"al_iters": 3, "max_iters": 15}
        self.sqp_cfg = SQPConfig(**opts)
        self.mesh = mesh
        # Single-chip batch chunking: past the measured single-chip knee
        # (~B=1024 on v5e for the bench tank study — see RESULTS "Round 5:
        # single-chip batched-study scaling curve") a wider vmap REGRESSES
        # ~18% in throughput (one-time tiling regime change at 2x the knee).
        # chunk=K runs a B>K batch as a lax.map over B/K vmapped groups, so
        # every group executes at the peak per-chunk rate and solver
        # intermediates for only one group are live at a time.  Per-rollout
        # math is identical; results match the unchunked run.  Ignored under
        # a mesh (shard the batch over devices instead — that is the lever
        # past the knee).
        if chunk is not None and (isinstance(chunk, bool)
                                  or not isinstance(chunk, (int, np.integer))
                                  or chunk < 1):
            raise ValueError(f"chunk must be a positive int; got {chunk!r}")
        self.chunk = None if chunk is None else int(chunk)

        # online conditioning is kernel-family agnostic (cross-kernel rows
        # + stationary diagonal only) — SE and Matérn both stream; a nonzero
        # trained prior mean rides along frozen (residual-based alpha)
        self.kernel = gp.cfg.kernel
        self.mean_func = gp.cfg.mean_func
        cap = capacity or (gp.N + 64)
        self.post0, self.norm = online_gp.from_gp(gp, cap)

        u_scale = jnp.where(self.uub - self.ulb < big,
                            jnp.maximum(self.uub - self.ulb, 1e-6), 1.0)
        pad = 0.5 * jnp.where(self.uub - self.ulb < big,
                              self.uub - self.ulb, big)
        self.consts = StudyConsts(
            q=self.Q, r=self.R, ulb=self.ulb, uub=self.uub,
            u_scale=u_scale, u_guard_lo=self.ulb - pad,
            u_guard_hi=self.uub + pad, norm=self.norm)

        kernel = self.kernel
        mean_func = self.mean_func

        def dynamics(x, u, t, params: StudyParams):
            z = jnp.concatenate([x, u])
            return online_gp.predict(params.post, params.consts.norm, z,
                                     kernel, mean_func)[0]

        def stage_cost(x, u, t, params: StudyParams):
            e = x - params.x_sp
            return e @ params.consts.q @ e + u @ params.consts.r @ u

        def terminal_cost(x, params: StudyParams):
            e = x - params.x_sp
            return 10.0 * (e @ params.consts.q @ e)

        def stage_ineq(x, u, t, params: StudyParams):
            c0 = params.consts
            return jnp.concatenate([(u - c0.uub) / c0.u_scale,
                                    (c0.ulb - u) / c0.u_scale])

        self.problem = al_sqp.TrajectoryProblem(
            nx=self.Nx, nu=self.Nu, horizon=self.Nt,
            dynamics=dynamics, stage_cost=stage_cost,
            terminal_cost=terminal_cost,
            stage_ineq=stage_ineq, n_ineq=2 * self.Nu,
            u_guard=lambda p: (p.consts.u_guard_lo, p.consts.u_guard_hi))

        # matmul-precision scope for the rollout program (same semantics as
        # MPC(solve_precision=...): None inherits the package-wide
        # full-fidelity default; the conditioning/variance forms carry
        # their own local HIGHEST pins either way)
        if solve_precision is not None and solve_precision not in (
                "default", "high", "highest"):
            raise ValueError(
                "solve_precision must be one of None, 'default', 'high', "
                f"'highest'; got {solve_precision!r}")
        self.solve_precision = solve_precision
        run = self._run
        if solve_precision is not None:
            import functools

            @functools.wraps(self._run)
            def run(*a, **k):
                with jax.default_matmul_precision(solve_precision):
                    return self._run(*a, **k)
        self._run_jit = jax.jit(run,
                                static_argnames=("n_steps", "batched_post"))

    # ----------------------------------------------------------- rollouts

    def _rollout(self, x0, x_sp, noise_w, post0, consts: StudyConsts):
        """One closed-loop rollout with online conditioning (lax.scan)."""
        params0 = StudyParams(x_sp=x_sp, post=post0, consts=consts)
        warm = al_sqp.init_state(self.problem, x0, params=params0)

        def step(carry, w):
            x, warm, post = carry
            params = StudyParams(x_sp=x_sp, post=post, consts=consts)
            state = al_sqp.shift_state(warm, x)
            res = al_sqp.solve(self.problem, params, state, self.sqp_cfg)
            u = jnp.clip(res.state.u[0], consts.ulb, consts.uub)
            x_next = self.model.integrate(x, u) + w
            if self.model.clip_negative:
                x_next = jnp.maximum(x_next, 0.0)
            if self.condition_online:
                z = jnp.concatenate([x, u])
                post = online_gp.condition(post, consts.norm, z, x_next,
                                           kernel=self.kernel,
                                           policy=self.online_policy,
                                           mean_func=self.mean_func)
            return (x_next, res.state, post), (x, u, res.obj)

        (x_last, _, post), (xs, us, objs) = jax.lax.scan(
            step, (x0, warm, post0), noise_w)
        xs = jnp.concatenate([xs, x_last[None]], axis=0)
        e = xs[:-1] - x_sp
        cost = jnp.sum(jnp.einsum("ti,ij,tj->t", e, consts.q, e)
                       + jnp.einsum("ti,ij,tj->t", us, consts.r, us))
        return xs, us, cost, objs, post

    def _run(self, x0s, x_sp, noise_ws, post0, consts, n_steps,
             batched_post):
        roll = (lambda x0, w, p0: self._rollout(x0, x_sp, w, p0, consts))
        b = x0s.shape[0]
        if batched_post:
            args = (x0s, noise_ws, post0)
            vroll = lambda t: jax.vmap(roll)(*t)
        else:
            args = (x0s, noise_ws)
            vroll = lambda t: jax.vmap(
                lambda x0, w: roll(x0, w, post0))(*t)
        chunk = self.chunk
        if chunk is not None and self.mesh is None and b > chunk:
            if b % chunk:
                raise ValueError(
                    f"batch size {b} is not divisible by chunk {chunk}")
            g = b // chunk
            args = jax.tree.map(
                lambda a: a.reshape((g, chunk) + a.shape[1:]), args)
            out = jax.lax.map(vroll, args)
            xs, us, cost, objs, post = jax.tree.map(
                lambda a: a.reshape((b,) + a.shape[2:]), out)
        else:
            xs, us, cost, objs, post = vroll(args)
        # batch-mean metric: under a dp-sharded batch this lowers to a psum
        # over the mesh (ICI collective)
        mean_cost = jnp.mean(cost)
        return StudyResult(x_traj=xs, u_traj=us, cost=cost, obj=objs,
                           gp_points=post.count, mean_cost=mean_cost,
                           post=post)

    def run(self, x0s, x_sp, n_steps: int,
            key: Optional[jax.Array] = None,
            noise: bool = True,
            init_post=None) -> StudyResult:
        """Run the study; ``init_post`` (a batched OnlinePosterior, e.g.
        ``previous_result.post`` or :func:`load_study`'s) resumes rollouts
        with their individually conditioned GPs [SURVEY §5 checkpoint]."""
        b = x0s.shape[0]
        x0s = jnp.asarray(x0s, self.dtype)
        x_sp = jnp.asarray(x_sp, self.dtype)
        if key is None:
            key = jax.random.PRNGKey(0)
        if noise:
            chol_r = jnp.linalg.cholesky(
                self.model.R + 1e-32 * jnp.eye(self.Nx, dtype=self.dtype))
            noise_ws = jax.random.normal(
                key, (b, n_steps, self.Nx), self.dtype) @ chol_r.T
        else:
            noise_ws = jnp.zeros((b, n_steps, self.Nx), self.dtype)

        post0 = self.post0 if init_post is None else init_post
        consts = self.consts
        if self.mesh is not None:
            # batch axis shards over ALL mesh axes — a 1D ("dp",) mesh and
            # a 2D multi-host ("dcn", "dp") mesh (parallel.distributed.
            # make_study_mesh) are the same annotation
            from gpmpc_tpu.parallel import distributed
            bspec = P(tuple(self.mesh.axis_names))
            if distributed.mesh_is_multiprocess(self.mesh):
                # Real multi-controller run: every process holds the same
                # full host copy of every input; batch-leading arrays shard
                # over the mesh, everything else replicates (P()).  Plain
                # device_put cannot write non-addressable shards.
                x0s = distributed.global_put(x0s, self.mesh, bspec)
                noise_ws = distributed.global_put(noise_ws, self.mesh, bspec)
                x_sp = distributed.global_put(x_sp, self.mesh, P())
                consts = distributed.tree_global_put(consts, self.mesh, P())
                post0 = distributed.tree_global_put(
                    post0, self.mesh,
                    bspec if init_post is not None else P())
            else:
                dp = NamedSharding(self.mesh, bspec)
                x0s = jax.device_put(x0s, dp)
                noise_ws = jax.device_put(noise_ws, dp)
                if init_post is not None:
                    post0 = jax.tree.map(
                        lambda a: jax.device_put(a, dp), post0)
        return self._run_jit(x0s, x_sp, noise_ws, post0, consts,
                             n_steps=n_steps,
                             batched_post=init_post is not None)
