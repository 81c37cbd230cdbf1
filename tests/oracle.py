"""NumPy oracle for the Harmony update equations.

Independent re-derivation of the algorithm's math (Korsunsky et al. 2019 /
the R package formulas) used to unit-test each TPU kernel. Written
numpy-first from the spec in SURVEY.md §2; where the engine takes a random
permutation, the oracle takes it as an explicit argument so both sides can be
driven with identical randomness.
"""

from __future__ import annotations

import numpy as np

CLAMP = 1e-8


def scale_dist(dist, sigma):
    s = np.exp(-dist / sigma[:, None])
    return s / s.sum(axis=0, keepdims=True)


def objective_terms(R, dist, O, E, Phi, theta, sigma, N):
    norm_const = 2000.0 / N
    kerr = float((R * dist).sum())
    with np.errstate(divide="ignore", invalid="ignore"):
        ent_mat = R * np.log(R)
    ent_mat[~np.isfinite(ent_mat)] = 0.0
    ent = float((ent_mat * sigma[:, None]).sum())
    Oc = np.maximum(O, CLAMP)
    Ec = np.maximum(E, CLAMP)
    tlog = theta[None, :] * np.log((Oc + Ec) / Ec)
    cross = float(((R * sigma[:, None]) * (tlog @ Phi)).sum())
    return kerr * norm_const, ent * norm_const, cross * norm_const


def update_r_blocks(R, dist, Phi, E, O, theta, sigma, Pr_b, perm=None,
                    block_size=None, blocks=None):
    """Sequential block E-step with an explicit partition: either a
    permutation + block_size (reference equal-split geometry) or an explicit
    list of per-block cell-index arrays."""
    K, N = R.shape
    R = R.copy(); E = E.copy(); O = O.copy()
    scale = scale_dist(dist, sigma)
    if blocks is None:
        n_blocks = int(np.ceil(1.0 / block_size))
        cpb = int(N * block_size)
        blocks = [perm[b * cpb: (N if b == n_blocks - 1 else (b + 1) * cpb)]
                  for b in range(n_blocks)]
    for cells in blocks:
        Rb, Pb, Sb = R[:, cells], Phi[:, cells], scale[:, cells]
        E -= np.outer(Rb.sum(axis=1), Pr_b)
        O -= Rb @ Pb.T
        ratio = np.clip(E / np.maximum(O + E, CLAMP), CLAMP, 1.0)
        powered = np.exp(theta[None, :] * np.log(ratio))
        R_new = Sb * (powered @ Pb)
        R_new = R_new / np.maximum(R_new.sum(axis=0), CLAMP)
        E += np.outer(R_new.sum(axis=1), Pr_b)
        O += R_new @ Pb.T
        R[:, cells] = R_new
    return R, E, O


def ridge_correct(Z_orig, Phi, R, E, lamb, alpha, lambda_estimation):
    """Per-cluster MoE ridge, straightforward dense solve."""
    K, N = R.shape
    B = Phi.shape[0]
    A = np.vstack([np.ones((1, N)), Phi])  # Phi_moe
    Z_corr = Z_orig.copy()
    for k in range(K):
        if lambda_estimation:
            lamb_vec = np.concatenate([[0.0], alpha * E[k]])
        else:
            lamb_vec = lamb
        Phi_Rk = A * R[k][None, :]
        cov = Phi_Rk @ A.T + np.diag(lamb_vec)
        W = np.linalg.solve(cov, Phi_Rk @ Z_orig.T)  # (B+1, d)
        W[0, :] = 0.0
        Z_corr -= W.T @ Phi_Rk
    return Z_corr
