"""On-device k-means initialization (greedy k-means++ + Lloyd iterations).

Replaces the reference's CPU sklearn.cluster.KMeans(init='k-means++',
n_init=1, max_iter=25) call (reference harmony.py:366-374) with a fully
TPU-resident, mesh-parallel implementation:

  - greedy k-means++ seeding: at each step sample T = 2 + floor(log K)
    candidates with probability proportional to the current D^2 potential
    (Gumbel-max trick, so the categorical sample works across shards with one
    all_gather of per-shard argmax scalars), then keep the candidate that
    minimizes the resulting global potential — the same "greedy" variant
    sklearn uses.
  - Lloyd: up to `kmeans_max_iter` assignment/update rounds, stopping when the
    squared centroid shift falls below sklearn's tolerance
    (tol * mean feature variance).

All cross-shard traffic is psum/all_gather of O(d*K) values per step.
Runs under shard_map with cells sharded on `axis_name`; the returned centers
(d, K) are replicated.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..config import EngineConfig


def _sq_norms(X: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(X * X, axis=0)


def _global_sample_columns(X, scores, axis_name):
    """Pick, for each row of `scores` (T, N_local), the globally argmax cell,
    and return those cells' columns of X as a replicated (d, T) matrix."""
    local_idx = jnp.argmax(scores, axis=1)                      # (T,)
    local_val = jnp.take_along_axis(scores, local_idx[:, None], axis=1)[:, 0]
    vals = lax.all_gather(local_val, axis_name)                 # (n_dev, T)
    winner = jnp.argmax(vals, axis=0)                           # (T,) replicated
    mine = winner == lax.axis_index(axis_name)                  # (T,) bool
    cols = X[:, local_idx]                                      # (d, T) local picks
    cols = jnp.where(mine[None, :], cols, 0.0)
    return lax.psum(cols, axis_name)                            # (d, T) replicated


def _kmeanspp_seed(key, X, mask, cfg: EngineConfig, axis_name):
    """Greedy k-means++ seeding. X: (d, N_local) sharded; returns (d, K)."""
    d, Nl = X.shape
    K, T = cfg.K, cfg.kmeanspp_trials
    xsq = _sq_norms(X)                                          # (Nl,)
    shard = lax.axis_index(axis_name)

    def gumbel(k, shape):
        return jax.random.gumbel(jax.random.fold_in(k, shard), shape, jnp.float32)

    # First center: uniform over valid cells.
    key, k0 = jax.random.split(key)
    logm = jnp.where(mask > 0.0, 0.0, -jnp.inf)
    c0 = _global_sample_columns(X, (logm + gumbel(k0, (Nl,)))[None, :], axis_name)
    centers0 = jnp.zeros((d, K), jnp.float32).at[:, 0].set(c0[:, 0])

    d2_0 = (xsq + jnp.sum(c0[:, 0] ** 2) - 2.0 * (c0[:, 0] @ X)) * mask
    d2_0 = jnp.maximum(d2_0, 0.0)

    def step(t, carry):
        centers, d2, key = carry
        key, k1 = jax.random.split(key)
        # T i.i.d. samples with P(i) ∝ d2_i via Gumbel-max.
        logd2 = jnp.where(d2 > 0.0, jnp.log(jnp.where(d2 > 0.0, d2, 1.0)), -jnp.inf)
        scores = logd2[None, :] + gumbel(k1, (T, Nl))
        C = _global_sample_columns(X, scores, axis_name)        # (d, T)
        cand_d2 = xsq[None, :] + _sq_norms(C)[:, None] - 2.0 * (C.T @ X)
        cand_d2 = jnp.maximum(cand_d2, 0.0) * mask[None, :]     # (T, Nl)
        new_d2 = jnp.minimum(d2[None, :], cand_d2)
        pots = lax.psum(jnp.sum(new_d2, axis=1), axis_name)     # (T,) replicated
        best = jnp.argmin(pots)
        centers = centers.at[:, t].set(C[:, best])
        return centers, new_d2[best], key

    centers, _, _ = lax.fori_loop(1, K, step, (centers0, d2_0, key))
    return centers


def _lloyd(centers, X, mask, cfg: EngineConfig, axis_name):
    """Lloyd iterations with sklearn-style tolerance; returns (d, K)."""
    K = cfg.K
    n_total = lax.psum(jnp.sum(mask), axis_name)
    # sklearn tolerance: tol * mean per-feature variance of the data.
    mean = lax.psum(jnp.sum(X * mask[None, :], axis=1), axis_name) / n_total
    var = lax.psum(
        jnp.sum(((X - mean[:, None]) * mask[None, :]) ** 2, axis=1), axis_name
    ) / n_total
    tol = jnp.float32(cfg.kmeans_tol) * jnp.mean(var)

    def assign(C):
        # argmin_k ||x - c_k||^2; the ||x||^2 term is constant per cell.
        scores = _sq_norms(C)[:, None] - 2.0 * (C.T @ X)        # (K, Nl)
        return jnp.argmin(scores, axis=0)                       # (Nl,)

    def body(carry):
        C, _, i, _ = carry
        labels = assign(C)
        onehot = (labels[None, :] == jnp.arange(K, dtype=labels.dtype)[:, None])
        w = onehot.astype(jnp.float32) * mask[None, :]          # (K, Nl)
        sums = lax.psum(X @ w.T, axis_name)                     # (d, K)
        counts = lax.psum(jnp.sum(w, axis=1), axis_name)        # (K,)
        C_new = jnp.where(counts[None, :] > 0.0, sums / jnp.maximum(counts, 1.0)[None, :], C)
        shift = jnp.sum((C_new - C) ** 2)
        return C_new, shift, i + 1, shift <= tol

    def cond(carry):
        _, _, i, done = carry
        return jnp.logical_and(i < cfg.kmeans_max_iter, jnp.logical_not(done))

    init = (centers, jnp.float32(jnp.inf), jnp.int32(0), jnp.zeros((), jnp.bool_))
    C, _, _, _ = lax.while_loop(cond, body, init)
    return C


def kmeans_init(key, Z_cos, mask, cfg: EngineConfig, axis_name):
    """Full k-means init on the unit-normalized embedding.

    Z_cos: (d, N_local) sharded; mask: (N_local,) float {0,1}.
    Returns centroids (d, K), replicated (NOT yet L2-normalized — the caller
    normalizes, mirroring reference harmony.py:377).

    Above cfg.kmeanspp_sample cells, BOTH the k-means++ seeding and the Lloyd
    refinement run on a uniform subsample (each shard contributes an equal
    share): the K sequential seeding steps are latency-bound and Lloyd's
    per-iteration cost is a K x N pass, while the consumer of these centroids
    — Harmony's own fuzzy k-means loop — immediately refines Y on ALL cells
    for up to max_iter_kmeans rounds (engine._cluster_*), so init centroid
    noise of order 1/sqrt(sample) washes out in the first round.
    """
    Nl = Z_cos.shape[1]
    Sl = -(-cfg.kmeanspp_sample // cfg.n_devices)  # per-shard share
    if Sl < Nl:
        key, k_sub = jax.random.split(key)
        shard = lax.axis_index(axis_name)
        sub = jax.random.permutation(
            jax.random.fold_in(k_sub, shard), Nl)[:Sl]
        X_seed, m_seed = Z_cos[:, sub], mask[sub]
    else:
        X_seed, m_seed = Z_cos, mask
    centers = _kmeanspp_seed(key, X_seed, m_seed, cfg, axis_name)
    return _lloyd(centers, X_seed, m_seed, cfg, axis_name)
