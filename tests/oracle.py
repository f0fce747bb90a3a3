"""Semantics-faithful NumPy/SciPy oracle for the reference's math.

`/root/reference/` was empty at survey time (SURVEY.md Provenance Warning),
so golden values are produced by this oracle, written directly from the
behavioral spec in SURVEY.md §2 (SE-ARD kernel, Cholesky NLL, predictive
mean/variance, ME/TA/EM uncertainty propagation per Girard 2003 and
Candela/Girard/Rasmussen 2003 / PILCO closed forms).  It is deliberately
naive — plain loops and numpy.linalg — so it is independent of the JAX
implementation under test.
"""

from __future__ import annotations

import math

import numpy as np


# ---------------------------------------------------------------- kernel

def cov_se_ard(x, z, ell, sf2):
    """k(x,z) = sf2 * exp(-0.5 sum((x-z)^2/ell^2))  [SURVEY C3a]."""
    d = (np.asarray(x) - np.asarray(z)) / ell
    return sf2 * math.exp(-0.5 * float(np.dot(d, d)))


def gram(x, ell, sf2, sn2=0.0, jitter=0.0):
    n = x.shape[0]
    k = np.empty((n, n))
    for i in range(n):
        for j in range(n):
            k[i, j] = cov_se_ard(x[i], x[j], ell, sf2)
    return k + (sn2 + jitter * sf2) * np.eye(n)


# ---------------------------------------------------------------- NLL

def nll(x, y, ell, sf2, sn2, mean=None):
    """0.5 r^T K^-1 r + sum(log diag L) + n/2 log 2pi  [SURVEY C4]."""
    n = x.shape[0]
    k = gram(x, ell, sf2, sn2)
    l = np.linalg.cholesky(k)
    r = y - (mean(x) if mean is not None else 0.0)
    a = np.linalg.solve(k, r)
    return (0.5 * float(r @ a) + float(np.sum(np.log(np.diag(l))))
            + 0.5 * n * math.log(2 * math.pi))


# ---------------------------------------------------------------- predict

def predict(x, y, ell, sf2, sn2, z, mean=None, include_noise=False):
    """mu = k*^T K^-1 r + m(z); var = sf2 - k*^T K^-1 k*  [SURVEY C3b]."""
    n = x.shape[0]
    k = gram(x, ell, sf2, sn2)
    ks = np.array([cov_se_ard(x[i], z, ell, sf2) for i in range(n)])
    r = y - (mean(x) if mean is not None else 0.0)
    alpha = np.linalg.solve(k, r)
    mu = float(ks @ alpha) + (float(mean(z[None])[0]) if mean is not None else 0.0)
    var = sf2 - float(ks @ np.linalg.solve(k, ks))
    if include_noise:
        var += sn2
    return mu, var


# ------------------------------------------------- multi-output helpers

def predict_multi(x, y, ells, sf2s, sn2s, z, include_noise=False):
    """Stack per-dim predictions; y: (N, Ny)."""
    ny = y.shape[1]
    mus = np.empty(ny)
    vars_ = np.empty(ny)
    for d in range(ny):
        mus[d], vars_[d] = predict(x, y[:, d], ells[d], sf2s[d], sn2s[d], z,
                                   include_noise=include_noise)
    return mus, vars_


# ------------------------------------- exact moment matching (EM, PILCO)

def exact_moment_matching(x, y, ells, sf2s, sn2s, m, s):
    """Closed-form GP prediction under Gaussian input z ~ N(m, S).

    Candela/Girard/Rasmussen 2003 eqns; PILCO (Deisenroth & Rasmussen 2011)
    §2.3 forms.  Parity target: ``gp_mpc/gp_functions.py::gp_exact_moment``
    [SURVEY C3d].  Returns (mu (Ny,), Sigma (Ny,Ny), C (D,Ny)) where C is the
    input-output cross-covariance cov(z, f(z)).
    """
    n, d = x.shape
    ny = y.shape[1]
    mu = np.zeros(ny)
    sig = np.zeros((ny, ny))
    cross = np.zeros((d, ny))

    betas, lams, qs = [], [], []
    nu = x - m[None, :]                                   # (N, D)
    for a in range(ny):
        lam = np.diag(ells[a] ** 2)
        k = gram(x, ells[a], sf2s[a], sn2s[a])
        beta = np.linalg.solve(k, y[:, a])
        # q_i = sf2 |S Lam^-1 + I|^{-1/2} exp(-0.5 nu_i^T (S+Lam)^-1 nu_i)
        sl = s @ np.linalg.inv(lam) + np.eye(d)
        det = np.linalg.det(sl) ** -0.5
        spl_inv = np.linalg.inv(s + lam)
        q = np.array([sf2s[a] * det *
                      math.exp(-0.5 * float(nu[i] @ spl_inv @ nu[i]))
                      for i in range(n)])
        mu[a] = float(beta @ q)
        # cross-cov: sum_i beta_i q_i S (S+Lam)^-1 nu_i
        for i in range(n):
            cross[:, a] += beta[i] * q[i] * (s @ spl_inv @ nu[i])
        betas.append(beta)
        lams.append(lam)
        qs.append(q)

    for a in range(ny):
        inv_la = np.linalg.inv(lams[a])
        ka = gram(x, ells[a], sf2s[a], sn2s[a])
        inv_ka = np.linalg.inv(ka)
        for b in range(a, ny):
            inv_lb = np.linalg.inv(lams[b])
            r = s @ (inv_la + inv_lb) + np.eye(d)
            inv_r_s = np.linalg.inv(r) @ s
            det = np.linalg.det(r) ** -0.5
            q2 = np.empty((n, n))
            for i in range(n):
                for j in range(n):
                    ka_i = cov_se_ard(x[i], m, ells[a], sf2s[a])
                    kb_j = cov_se_ard(x[j], m, ells[b], sf2s[b])
                    zij = inv_la @ nu[i] + inv_lb @ nu[j]
                    q2[i, j] = (ka_i * kb_j * det *
                                math.exp(0.5 * float(zij @ inv_r_s @ zij)))
            val = float(betas[a] @ q2 @ betas[b]) - mu[a] * mu[b]
            if a == b:
                val += sf2s[a] - float(np.trace(inv_ka @ q2))
            sig[a, b] = val
            sig[b, a] = val
    return mu, sig, cross


# --------------------------------- first-order Taylor propagation (TA)

def taylor_propagation(x, y, ells, sf2s, sn2s, m, s, eps=1e-6):
    """Girard 2003 first-order Taylor moments via numerical Jacobian.

    mu_out = mu(m); Sig_out = diag(var(m)) + J S J^T with J = dmu/dz at m.
    Parity target: ``gp_mpc/gp_functions.py::gp_taylor_approx`` [SURVEY C3c].
    """
    ny = y.shape[1]
    d = x.shape[1]
    mu0, var0 = predict_multi(x, y, ells, sf2s, sn2s, m)
    jac = np.zeros((ny, d))
    for k in range(d):
        dm = m.copy()
        dm[k] += eps
        mu_p, _ = predict_multi(x, y, ells, sf2s, sn2s, dm)
        dm[k] -= 2 * eps
        mu_m, _ = predict_multi(x, y, ells, sf2s, sn2s, dm)
        jac[:, k] = (mu_p - mu_m) / (2 * eps)
    sig = np.diag(var0) + jac @ s @ jac.T
    return mu0, sig, jac
