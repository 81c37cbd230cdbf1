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


def _safe_log(x: jnp.ndarray) -> jnp.ndarray:
    """log(x) for x > 0, -inf elsewhere (for Gumbel-max sampling weights)."""
    return jnp.where(x > 0.0, jnp.log(jnp.where(x > 0.0, x, 1.0)), -jnp.inf)


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
        scores = _safe_log(d2)[None, :] + gumbel(k1, (T, Nl))
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


def _kmeansbb_seed(key, X, mask, cfg: EngineConfig, axis_name):
    """k-means|| seeding (Bahmani et al., VLDB 2012), TPU-first.

    Replaces the K sequential D^2-sampling steps of k-means++ (each a
    latency-bound dependent step) with `kmeansbb_rounds` rounds that each
    draw M = oversample*K candidates at once — Gumbel top-M gives an
    M-sample-without-replacement proportional to the current D^2 potential,
    and the cross-shard merge is one all_gather of (M,) scores + (d, M)
    columns per round. The ~rounds*M candidates are then weighted by their
    nearest-neighbor counts and reduced to K centers with a greedy weighted
    k-means++ on the (tiny, replicated) candidate set.

    X: (d, S_local) sharded subsample; returns (d, K) replicated.
    """
    d, Sl = X.shape
    K = cfg.K
    M = cfg.kmeansbb_oversample * K
    R = cfg.kmeansbb_rounds
    xsq = _sq_norms(X)
    shard = lax.axis_index(axis_name)
    logm = jnp.where(mask > 0.0, 0.0, -jnp.inf)

    def gumbel(k, shape):
        return jax.random.gumbel(jax.random.fold_in(k, shard), shape,
                                 jnp.float32)

    def cand_d2(C, X):
        d2 = (_sq_norms(C)[:, None] + xsq[None, :] - 2.0 * (C.T @ X))
        return jnp.maximum(d2, 0.0)

    # First candidate: uniform over valid cells.
    key, k0 = jax.random.split(key)
    c0 = _global_sample_columns(X, (logm + gumbel(k0, (Sl,)))[None, :],
                                axis_name)                      # (d, 1)
    n_cand = 1 + R * M
    C = jnp.zeros((d, n_cand), jnp.float32).at[:, 0].set(c0[:, 0])
    d2 = cand_d2(c0, X)[0] * mask

    for r in range(R):
        key, kr = jax.random.split(key)
        # Gumbel top-M: M draws w/o replacement with P(i) proportional to d2.
        scores = _safe_log(d2) + logm + gumbel(kr, (Sl,))
        loc_val, loc_idx = lax.top_k(scores, M)
        loc_cols = X[:, loc_idx]                                # (d, M)
        vals = lax.all_gather(loc_val, axis_name)               # (ndev, M)
        cols = lax.all_gather(loc_cols, axis_name)              # (ndev, d, M)
        flat_v = vals.reshape(-1)
        flat_c = jnp.moveaxis(cols, 1, 0).reshape(d, -1)        # (d, ndev*M)
        _, sel = lax.top_k(flat_v, M)
        new_c = flat_c[:, sel]                                  # (d, M) repl
        C = lax.dynamic_update_slice(C, new_c, (0, 1 + r * M))
        d2 = jnp.minimum(d2, jnp.min(cand_d2(new_c, X), axis=0)) * mask

    # Candidate weights: nearest-candidate counts over the (masked) sample.
    BLK = 128
    n_pad = -(-n_cand // BLK) * BLK
    Cp = jnp.full((d, n_pad), jnp.inf, jnp.float32).at[:, :n_cand].set(C)
    best = jnp.full((Sl,), jnp.inf, jnp.float32)
    bidx = jnp.zeros((Sl,), jnp.int32)
    for blk in range(0, n_pad, BLK):
        Cb = lax.dynamic_slice(Cp, (0, blk), (d, BLK))
        Db = jnp.where(jnp.isfinite(_sq_norms(Cb))[:, None],
                       _sq_norms(Cb)[:, None] - 2.0 * (Cb.T @ X), jnp.inf)
        v = jnp.min(Db, axis=0)
        i = jnp.argmin(Db, axis=0).astype(jnp.int32) + blk
        upd = v < best
        best = jnp.where(upd, v, best)
        bidx = jnp.where(upd, i, bidx)
    w = lax.psum(jnp.zeros((n_cand,), jnp.float32)
                 .at[jnp.minimum(bidx, n_cand - 1)].add(mask), axis_name)

    # Weighted greedy k-means++ over the replicated candidate set (tiny).
    key = jax.random.fold_in(key, 0)  # same stream on every shard
    csq = _sq_norms(C)
    T = cfg.kmeanspp_trials

    key, kf = jax.random.split(key)
    first = jnp.argmax(_safe_log(w)
                       + jax.random.gumbel(kf, (n_cand,), jnp.float32))
    centers0 = jnp.zeros((d, K), jnp.float32).at[:, 0].set(C[:, first])
    cd2_0 = jnp.maximum(csq + csq[first] - 2.0 * (C[:, first] @ C), 0.0)

    def step(t, carry):
        centers, cd2, key = carry
        key, k1 = jax.random.split(key)
        sc = _safe_log(cd2 * w)[None, :] + jax.random.gumbel(
            k1, (T, n_cand), jnp.float32)
        picks = jnp.argmax(sc, axis=1)                          # (T,)
        Ct = C[:, picks]                                        # (d, T)
        nd2 = jnp.minimum(
            cd2[None, :],
            jnp.maximum(csq[None, :] + _sq_norms(Ct)[:, None]
                        - 2.0 * (Ct.T @ C), 0.0))               # (T, n_cand)
        pots = jnp.sum(nd2 * w[None, :], axis=1)
        bestt = jnp.argmin(pots)
        centers = centers.at[:, t].set(Ct[:, bestt])
        return centers, nd2[bestt], key

    centers, _, _ = lax.fori_loop(1, K, step, (centers0, cd2_0, key))
    # Values are already identical on every shard, but the varying-manual-axes
    # checker cannot prove invariance through all_gather-derived candidates;
    # a pmean over (29, K) floats re-establishes it explicitly.
    return lax.pmean(centers, axis_name)


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
        # Large problems: k-means|| seeding (a few wide passes) instead of
        # K sequential latency-bound D^2 draws. Requires the per-shard
        # subsample to cover one oversampling round (top-M needs M entries);
        # tiny shards (huge meshes / tiny caps) keep sequential seeding.
        if Sl >= cfg.kmeansbb_oversample * cfg.K:
            centers = _kmeansbb_seed(key, X_seed, m_seed, cfg, axis_name)
        else:
            centers = _kmeanspp_seed(key, X_seed, m_seed, cfg, axis_name)
    else:
        X_seed, m_seed = Z_cos, mask
        centers = _kmeanspp_seed(key, X_seed, m_seed, cfg, axis_name)
    return _lloyd(centers, X_seed, m_seed, cfg, axis_name)
