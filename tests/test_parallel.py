"""Online GP conditioning + batched study tests (BASELINE config 5).

Device-parity strategy (SURVEY §4): vmap-of-1 == unbatched; sharded runs on
the 8-device virtual CPU mesh must match unsharded results."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gpmpc_tpu import GP, Model
from gpmpc_tpu.models import gp_core
from gpmpc_tpu.parallel import online_gp
from gpmpc_tpu.parallel.batched import BatchedStudy
from gpmpc_tpu.systems import four_tank_ode
from gpmpc_tpu.utils.config import GPConfig

RNG = np.random.default_rng(5)


def _small_gp(n=20, d=3, ny=2):
    x = RNG.uniform(-2, 2, size=(n, d))
    y = np.stack([np.sin(x @ np.ones(d)), np.cos(x @ np.ones(d))],
                 axis=1)[:, :ny]
    hyper = gp_core.GPHypers(
        log_ell=jnp.zeros((ny, d)), log_sf2=jnp.zeros(ny),
        log_sn2=jnp.full(ny, -4.0), mean_w=jnp.zeros((ny, 0)))
    return GP(x, y, hyper=hyper, normalize=True,
              optimizer_opts=dict(min_noise=0.0, jitter=0.0))


@pytest.mark.slow
def test_padded_posterior_matches_unpadded():
    gp = _small_gp()
    post, norm = online_gp.from_gp(gp, capacity=32)
    z = RNG.standard_normal(3)
    mu_ref, var_ref = gp.predict(z)
    mu, var = online_gp.predict(post, norm, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(mu), np.asarray(mu_ref), atol=1e-9)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref),
                               atol=1e-9)


@pytest.mark.slow
def test_condition_matches_batch_retrain():
    """Sequentially conditioning on k new points must equal building the
    posterior from scratch on the union data (same hypers)."""
    gp = _small_gp(n=15)
    post, norm = online_gp.from_gp(gp, capacity=32)

    new_z = RNG.uniform(-2, 2, size=(4, 3))
    new_y = np.stack([np.sin(new_z @ np.ones(3)),
                      np.cos(new_z @ np.ones(3))], axis=1)
    for z, y in zip(new_z, new_y):
        post = online_gp.condition(post, norm, jnp.asarray(z),
                                   jnp.asarray(y))
    assert int(post.count) == 19

    # reference: fresh GP on the union with identical hypers
    x_all = np.concatenate([np.asarray(gp.X_raw), new_z])
    y_all = np.concatenate([np.asarray(gp.Y_raw), new_y])
    xn_all = (x_all - np.asarray(norm.z_mean)) / np.asarray(norm.z_std)
    yn_all = (y_all - np.asarray(norm.y_mean)) / np.asarray(norm.y_std)
    cfg = GPConfig(min_noise=0.0, jitter=0.0)
    ref_post = gp_core.posterior(jnp.asarray(xn_all), jnp.asarray(yn_all),
                                 gp.hyper, cfg)

    zq = RNG.standard_normal(3)
    mu, var = online_gp.predict(post, norm, jnp.asarray(zq))
    zqn = (zq - np.asarray(norm.z_mean)) / np.asarray(norm.z_std)
    mu_n, var_n = gp_core.predict(ref_post, jnp.asarray(zqn), cfg)
    mu_ref = np.asarray(norm.y_mean) + np.asarray(norm.y_std) * np.asarray(mu_n)
    var_ref = np.asarray(norm.y_std) ** 2 * np.asarray(var_n)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=1e-8)
    np.testing.assert_allclose(np.asarray(var), var_ref, atol=1e-8)


def test_condition_saturates_at_capacity():
    gp = _small_gp(n=15)
    post, norm = online_gp.from_gp(gp, capacity=16)
    y = jnp.zeros(2)
    post = online_gp.condition(post, norm, jnp.full(3, 4.0), y)  # novel -> 16
    assert int(post.count) == 16
    post = online_gp.condition(post, norm, jnp.full(3, -4.0), y)  # full -> drop
    assert int(post.count) == 16
    assert np.all(np.isfinite(np.asarray(post.inv_k)))


def test_condition_novelty_gate_blocks_duplicates():
    """Near-duplicate observations must be rejected (they are numerically
    linearly dependent and would compound 1/s roundoff in the inverse
    form — observed 1e143 blow-ups without the gate)."""
    gp = _small_gp(n=15)
    post, norm = online_gp.from_gp(gp, capacity=32)
    z = jnp.full(3, 3.0)
    y = jnp.ones(2)
    post = online_gp.condition(post, norm, z, y)          # novel -> added
    assert int(post.count) == 16
    for _ in range(5):
        post = online_gp.condition(post, norm, z + 1e-8, y)  # duplicates
    assert int(post.count) == 16, "duplicates must be gated"
    assert float(jnp.abs(post.inv_k).max()) < 1e8


def _tank_study(mesh=None, condition_online=True, chunk=None):
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=3.0,
                  R=np.diag([1e-3] * 4), clip_negative=True,
                  dtype=jnp.float64, integrator_substeps=5)
    X, Y = model.generate_training_data(
        30, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(2))
    gp = GP(X, Y, multistart=1, max_iters=80, seed=1)
    return BatchedStudy(
        model, gp, horizon=3 * 3.0,
        Q=np.diag([10.0, 10.0, 0.1, 0.1]), R=0.01 * np.eye(2),
        ulb=[0.0, 0.0], uub=[8.0, 8.0], capacity=48,
        condition_online=condition_online, mesh=mesh, chunk=chunk)


@pytest.mark.slow
def test_vmap_of_one_equals_unbatched():
    study = _tank_study()
    x0 = np.array([[8.0, 9.0, 1.0, 1.0]])
    x_sp = np.array([12.4, 12.7, 1.8, 1.4])
    r1 = study.run(x0, x_sp, n_steps=3, noise=False)
    r2 = study.run(np.tile(x0, (4, 1)), x_sp, n_steps=3, noise=False)
    np.testing.assert_allclose(np.asarray(r1.x_traj[0]),
                               np.asarray(r2.x_traj[0]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(r2.x_traj[0]),
                               np.asarray(r2.x_traj[3]), atol=1e-12)


@pytest.mark.slow
def test_chunked_study_matches_unchunked():
    """chunk=K runs a B>K batch as lax.map over vmapped groups (the
    single-chip past-the-knee path — RESULTS round-5 scaling curve); the
    per-rollout math is identical, so results must match the plain vmap
    (reassociation-level tolerance) and resume must stay batched."""
    study_c = _tank_study(chunk=2)
    study_p = _tank_study()
    b = 6
    x0s = np.tile(np.array([8.0, 9.0, 1.0, 1.0]), (b, 1))
    x0s = np.clip(x0s + 0.2 * RNG.standard_normal((b, 4)), 1.0, None)
    x_sp = np.array([12.4, 12.7, 1.8, 1.4])
    r_c = study_c.run(x0s, x_sp, n_steps=3, noise=False)
    r_p = study_p.run(x0s, x_sp, n_steps=3, noise=False)
    np.testing.assert_allclose(np.asarray(r_c.x_traj),
                               np.asarray(r_p.x_traj), atol=1e-5)
    np.testing.assert_allclose(float(r_c.mean_cost), float(r_p.mean_cost),
                               rtol=1e-6)
    # chunked resume: the batched posterior reshapes through lax.map too
    r_c2 = study_c.run(x0s, x_sp, n_steps=2, noise=False, init_post=r_c.post)
    r_p2 = study_p.run(x0s, x_sp, n_steps=2, noise=False, init_post=r_p.post)
    np.testing.assert_allclose(np.asarray(r_c2.x_traj),
                               np.asarray(r_p2.x_traj), atol=1e-5)
    # indivisible batch fails loudly at trace time
    with pytest.raises(ValueError, match="divisible"):
        study_c.run(x0s[:5], x_sp, n_steps=2, noise=False)
    # B <= chunk short-circuits to the plain vmap
    r_small = study_c.run(x0s[:2], x_sp, n_steps=3, noise=False)
    np.testing.assert_allclose(np.asarray(r_small.x_traj),
                               np.asarray(r_p.x_traj[:2]), atol=1e-5)


@pytest.mark.slow
def test_sharded_study_matches_unsharded():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
    mesh = Mesh(np.array(devs[:8]), axis_names=("dp",))
    study_sharded = _tank_study(mesh=mesh)
    study_plain = _tank_study(mesh=None)
    b = 8
    x0s = np.tile(np.array([8.0, 9.0, 1.0, 1.0]), (b, 1))
    x0s = x0s + 0.2 * RNG.standard_normal((b, 4))
    x0s = np.clip(x0s, 1.0, None)
    x_sp = np.array([12.4, 12.7, 1.8, 1.4])
    r_sh = study_sharded.run(x0s, x_sp, n_steps=3, noise=False)
    r_pl = study_plain.run(x0s, x_sp, n_steps=3, noise=False)
    # sharded compilation reassociates the inverse-update matmuls; the
    # iterative solver amplifies last-bit differences, so trajectory-level
    # agreement is ~1e-6, not bitwise
    np.testing.assert_allclose(np.asarray(r_sh.x_traj),
                               np.asarray(r_pl.x_traj), atol=1e-5)
    np.testing.assert_allclose(float(r_sh.mean_cost), float(r_pl.mean_cost),
                               rtol=1e-6)
    # online conditioning accepted only novelty-gated points
    assert np.all(np.asarray(r_sh.gp_points) >= 30)
    assert np.all(np.asarray(r_sh.gp_points) <= 30 + 3)


@pytest.mark.slow
def test_study_checkpoint_resume(tmp_path):
    """Checkpoint/resume [SURVEY §5]: resuming from a saved study must
    continue with the individually conditioned per-rollout posteriors."""
    import os
    from gpmpc_tpu.parallel.batched import save_study, load_study

    study = _tank_study()
    x0s = np.tile(np.array([8.0, 9.0, 1.0, 1.0]), (2, 1))
    x_sp = np.array([12.4, 12.7, 1.8, 1.4])
    r1 = study.run(x0s, x_sp, n_steps=2, noise=False)
    path = os.path.join(tmp_path, "study.npz")
    save_study(path, r1)
    r1b = load_study(path, study.post0)
    np.testing.assert_allclose(np.asarray(r1.cost), np.asarray(r1b.cost))

    # resume continues from the checkpointed posteriors (novelty gating
    # means counts grow only on informative transitions)
    x_next = np.asarray(r1.x_traj[:, -1])
    r2 = study.run(x_next, x_sp, n_steps=2, noise=False, init_post=r1b.post)
    assert np.all(np.asarray(r2.gp_points) >= np.asarray(r1.gp_points))
    # the initial 30 stored points are identical to a continuous run's
    r_full = study.run(x0s, x_sp, n_steps=4, noise=False)
    np.testing.assert_allclose(np.asarray(r_full.post.x[:, :30]),
                               np.asarray(r2.post.x[:, :30]), atol=1e-9)

    # 0.3.x checkpoints predate OnlinePosterior.mean_w (8 post leaves, not
    # 9): load_study must synthesize the missing trailing leaf from the
    # template instead of failing the unflatten
    z = dict(np.load(path))
    assert int(z["n_post_leaves"]) == 9
    del z["post_8"]
    z["n_post_leaves"] = 8
    legacy = os.path.join(tmp_path, "study_legacy.npz")
    np.savez(legacy, **z)
    r_legacy = load_study(legacy, study.post0)
    np.testing.assert_allclose(np.asarray(r_legacy.cost),
                               np.asarray(r1.cost))
    b = np.asarray(r1.post.x).shape[0]
    assert np.asarray(r_legacy.post.mean_w).shape == (
        (b,) + np.asarray(study.post0.mean_w).shape)
    # and it resumes cleanly
    r2b = study.run(x_next, x_sp, n_steps=1, noise=False,
                    init_post=r_legacy.post)
    assert np.all(np.asarray(r2b.gp_points) >= np.asarray(r1.gp_points))


def test_study_solve_precision_validates():
    """BatchedStudy(solve_precision=...) rejects junk at construction."""
    model = Model(Nx=4, Nu=2, ode=lambda x, u: four_tank_ode(x, u), dt=3.0,
                  R=np.diag([1e-3] * 4), dtype=jnp.float64)
    X, Y = model.generate_training_data(
        12, uub=[6.0, 6.0], ulb=[0.0, 0.0],
        xub=[20.0, 20.0, 6.0, 6.0], xlb=[1.0, 1.0, 0.5, 0.5],
        key=jax.random.PRNGKey(2))
    gp = GP(X, Y, multistart=1, max_iters=10, seed=1)
    with pytest.raises(ValueError, match="solve_precision"):
        BatchedStudy(model, gp, horizon=9.0, solve_precision="bf16")
    s = BatchedStudy(model, gp, horizon=9.0, solve_precision="default")
    assert s.solve_precision == "default"


def test_condition_fifo_matches_batch_on_survivor_window():
    """policy='fifo' past capacity: oldest points are evicted by the exact
    Schur downdate; the resulting posterior must equal one built from
    scratch on exactly the surviving window (original tail + all inserts)."""
    gp = _small_gp(n=15)
    cap = 18
    post, norm = online_gp.from_gp(gp, capacity=cap)

    n_new = 7
    new_z = RNG.uniform(-2, 2, size=(n_new, 3))
    new_y = np.stack([np.sin(new_z @ np.ones(3)),
                      np.cos(new_z @ np.ones(3))], axis=1)
    for z, y in zip(new_z, new_y):
        post = online_gp.condition(post, norm, jnp.asarray(z),
                                   jnp.asarray(y), policy="fifo")
    # 3 inserts fill to capacity, 4 more wrap and evict originals 0..3
    assert int(post.count) == 15 + n_new

    n_evicted = 15 + n_new - cap
    x_surv = np.concatenate([np.asarray(gp.X_raw)[n_evicted:], new_z])
    y_surv = np.concatenate([np.asarray(gp.Y_raw)[n_evicted:], new_y])
    xn = (x_surv - np.asarray(norm.z_mean)) / np.asarray(norm.z_std)
    yn = (y_surv - np.asarray(norm.y_mean)) / np.asarray(norm.y_std)
    cfg = GPConfig(min_noise=0.0, jitter=0.0)
    ref_post = gp_core.posterior(jnp.asarray(xn), jnp.asarray(yn),
                                 gp.hyper, cfg)

    for _ in range(4):
        zq = RNG.standard_normal(3)
        mu, var = online_gp.predict(post, norm, jnp.asarray(zq))
        zqn = (zq - np.asarray(norm.z_mean)) / np.asarray(norm.z_std)
        mu_n, var_n = gp_core.predict(ref_post, jnp.asarray(zqn), cfg)
        mu_ref = (np.asarray(norm.y_mean)
                  + np.asarray(norm.y_std) * np.asarray(mu_n))
        var_ref = np.asarray(norm.y_std) ** 2 * np.asarray(var_n)
        np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=1e-7)
        np.testing.assert_allclose(np.asarray(var), var_ref, atol=1e-7)


def test_condition_fifo_rejected_insert_leaves_posterior_untouched():
    """A novelty-rejected point under fifo must NOT evict: the speculative
    downdate has to roll back to the pre-call posterior exactly."""
    gp = _small_gp(n=15)
    post, norm = online_gp.from_gp(gp, capacity=15)   # full from the start
    dup_z = np.asarray(gp.X_raw)[3]                   # exact duplicate
    dup_y = np.asarray(gp.Y_raw)[3]
    post2 = online_gp.condition(post, norm, jnp.asarray(dup_z),
                                jnp.asarray(dup_y), policy="fifo")
    assert int(post2.count) == int(post.count)
    for a, b in zip(post, post2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_condition_fifo_equals_saturate_during_fill():
    """Before the buffer is full the fifo downdate is a no-op on the virgin
    slot, so both policies must produce the same posterior (same update
    algebra, different alpha-refresh path is not used here)."""
    gp = _small_gp(n=12)
    post_a, norm = online_gp.from_gp(gp, capacity=20)
    post_b = post_a
    new_z = RNG.uniform(-2, 2, size=(5, 3))
    new_y = np.stack([np.sin(new_z @ np.ones(3)),
                      np.cos(new_z @ np.ones(3))], axis=1)
    for z, y in zip(new_z, new_y):
        post_a = online_gp.condition(post_a, norm, jnp.asarray(z),
                                     jnp.asarray(y), policy="saturate")
        post_b = online_gp.condition(post_b, norm, jnp.asarray(z),
                                     jnp.asarray(y), policy="fifo")
    for a, b in zip(post_a, post_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-12)
