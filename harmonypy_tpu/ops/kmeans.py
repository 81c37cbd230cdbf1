"""On-device k-means initialization (greedy k-means++ + Lloyd iterations).

Replaces the reference's CPU sklearn.cluster.KMeans(init='k-means++',
n_init=1, max_iter=25) call (reference harmony.py:366-374) with a fully
TPU-resident implementation.

Device-count-invariance design: the reductions inside k-means++ / k-means||
/ Lloyd are many and sequential, so instead of threading every one through a
fixed-order frame, the whole initialization runs REPLICATED on an invariant
subsample:

  - the (at most `kmeanspp_sample`) sample cell ids come from a global
    jax.random.permutation of [0, N) — a function of (seed, N) only;
  - the sample matrix (d, S) is assembled with a disjoint owner-scatter +
    psum (each column is written by exactly one shard, the psum adds exact
    zeros — bitwise neutral; see ops/partition.py frame rationale);
  - seeding and Lloyd then run identically on every shard with ZERO
    collectives — the centroids are bitwise device-count-invariant by
    construction.

The redundant per-shard compute is bounded by the sample cap (<= 131k cells
x d) and runs once per fit; the consumer of these centroids — Harmony's own
fuzzy k-means loop — immediately refines Y on ALL cells for up to
max_iter_kmeans rounds, so init noise of order 1/sqrt(sample) washes out.

Seeding variants (selected by sample size, mirroring round-1 behavior):
  - greedy k-means++ (sklearn's variant): at each step draw
    T = 2 + floor(log K) candidates with P(i) proportional to the D^2
    potential via Gumbel-max, keep the candidate minimizing the potential;
  - k-means|| (Bahmani et al., VLDB 2012) above the subsample threshold:
    `kmeansbb_rounds` rounds of Gumbel-top-M D^2 oversampling, then weighted
    greedy k-means++ on the candidate set — replaces K sequential dependent
    steps with a handful of wide data passes.
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


def _gather_columns(X, ids, cfg: EngineConfig, axis_name):
    """(d, S) replicated columns of X at global cell ids (each < N).

    Disjoint owner-scatter + psum: each id is owned by exactly one shard, the
    psum adds exact zeros — the result is bitwise device-count-invariant."""
    q = cfg.N_shard_real
    lo = lax.axis_index(axis_name) * q
    loc = jnp.clip(ids - lo, 0, X.shape[1] - 1)
    owned = (ids >= lo) & (ids < lo + q)
    cols = jnp.where(owned[None, :], X[:, loc], 0.0)
    return lax.psum(cols, axis_name)


def _kmeanspp_seed(key, X, cfg: EngineConfig):
    """Greedy k-means++ seeding on a replicated (d, S) sample."""
    d, S = X.shape
    K, T = cfg.K, cfg.kmeanspp_trials
    xsq = _sq_norms(X)

    # First center: uniform.
    key, k0 = jax.random.split(key)
    i0 = jnp.argmax(jax.random.gumbel(k0, (S,), jnp.float32))
    c0 = X[:, i0]
    centers0 = jnp.zeros((d, K), jnp.float32).at[:, 0].set(c0)
    d2_0 = jnp.maximum(xsq + jnp.sum(c0 ** 2) - 2.0 * (c0 @ X), 0.0)

    def step(t, carry):
        centers, d2, key = carry
        key, k1 = jax.random.split(key)
        # T i.i.d. samples with P(i) proportional to d2 via Gumbel-max.
        scores = _safe_log(d2)[None, :] + jax.random.gumbel(
            k1, (T, S), jnp.float32)
        picks = jnp.argmax(scores, axis=1)                      # (T,)
        C = X[:, picks]                                         # (d, T)
        cand_d2 = xsq[None, :] + _sq_norms(C)[:, None] - 2.0 * (C.T @ X)
        new_d2 = jnp.minimum(d2[None, :], jnp.maximum(cand_d2, 0.0))
        pots = jnp.sum(new_d2, axis=1)                          # (T,)
        best = jnp.argmin(pots)
        centers = centers.at[:, t].set(C[:, best])
        return centers, new_d2[best], key

    centers, _, _ = lax.fori_loop(1, K, step, (centers0, d2_0, key))
    return centers


def _kmeansbb_seed(key, X, cfg: EngineConfig, exact_topk: bool = False):
    """k-means|| seeding (Bahmani et al., VLDB 2012) on a replicated sample.

    X: (d, S) replicated; returns (d, K).

    exact_topk: select oversampling candidates with the exact lax.top_k
    instead of the TPU's approximate operator — NOT used in production
    (the exact sort lowering costs ~12 s of XLA compile at S=131k); it
    exists so the bench accuracy gates can measure on hardware that the
    approximate selection does not degrade seeding quality (the CPU test
    suite can't see this: approx_max_k lowers to an exact sort there)."""
    d, S = X.shape
    K = cfg.K
    M = cfg.kmeansbb_oversample * K
    R = cfg.kmeansbb_rounds
    xsq = _sq_norms(X)

    def cand_d2(C):
        d2 = _sq_norms(C)[:, None] + xsq[None, :] - 2.0 * (C.T @ X)
        return jnp.maximum(d2, 0.0)

    # First candidate: uniform.
    key, k0 = jax.random.split(key)
    i0 = jnp.argmax(jax.random.gumbel(k0, (S,), jnp.float32))
    n_cand = 1 + R * M
    c0 = X[:, i0][:, None]                                      # (d, 1)
    C0 = jnp.zeros((d, n_cand), jnp.float32).at[:, 0].set(c0[:, 0])

    # Oversampling rounds as a scan (an unrolled Python loop here compiled
    # R copies of the top-k + GEMM machinery — measured ~24 s of client
    # XLA compile at S=131k, the single largest compile cost of the fit
    # program; the scanned body compiles once).
    def round_body(carry, r):
        C, d2, key = carry
        key, kr = jax.random.split(key)
        # Gumbel top-M: M draws w/o replacement, P(i) proportional to d2.
        # Selection uses the TPU's approximate top-k (PartialReduce): for a
        # randomized candidate draw, per-tile recall 0.95 is just another
        # source of sampling noise, and the exact lax.top_k lowering costs
        # ~12 s of XLA compile at S=131k vs 0.5 s for this (measured; sort
        # compile dominates the whole fit program's compile time otherwise).
        scores = _safe_log(d2) + jax.random.gumbel(kr, (S,), jnp.float32)
        if exact_topk:
            _, sel = lax.top_k(scores, M)
        else:
            _, sel = lax.approx_max_k(scores, M)
        new_c = X[:, sel]                                       # (d, M)
        C = lax.dynamic_update_slice(C, new_c, (jnp.int32(0), 1 + r * M))
        d2 = jnp.minimum(d2, jnp.min(cand_d2(new_c), axis=0))
        return (C, d2, key), None

    (C, d2, key), _ = lax.scan(
        round_body, (C0, cand_d2(c0)[0], key),
        jnp.arange(R, dtype=jnp.int32))

    # Candidate weights: nearest-candidate counts over the sample, scanned
    # over candidate blocks.
    BLK = 128
    n_pad = -(-n_cand // BLK) * BLK
    Cp = jnp.full((d, n_pad), jnp.inf, jnp.float32).at[:, :n_cand].set(C)

    def blk_body(carry, blk):
        best, bidx = carry
        Cb = lax.dynamic_slice(Cp, (jnp.int32(0), blk), (d, BLK))
        Db = jnp.where(jnp.isfinite(_sq_norms(Cb))[:, None],
                       _sq_norms(Cb)[:, None] - 2.0 * (Cb.T @ X), jnp.inf)
        v = jnp.min(Db, axis=0)
        i = jnp.argmin(Db, axis=0).astype(jnp.int32) + blk
        upd = v < best
        return (jnp.where(upd, v, best), jnp.where(upd, i, bidx)), None

    (best, bidx), _ = lax.scan(
        blk_body,
        (jnp.full((S,), jnp.inf, jnp.float32), jnp.zeros((S,), jnp.int32)),
        jnp.arange(0, n_pad, BLK, dtype=jnp.int32))
    w = (jnp.zeros((n_cand,), jnp.float32)
         .at[jnp.minimum(bidx, n_cand - 1)].add(1.0))

    # Weighted greedy k-means++ over the (tiny) candidate set.
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
    return centers


def _lloyd(centers, X, cfg: EngineConfig):
    """Lloyd iterations with sklearn-style tolerance on a replicated sample;
    returns (d, K)."""
    K = cfg.K
    S = X.shape[1]
    # sklearn tolerance: tol * mean per-feature variance of the data.
    mean = jnp.sum(X, axis=1) / S
    var = jnp.sum((X - mean[:, None]) ** 2, axis=1) / S
    tol = jnp.float32(cfg.kmeans_tol) * jnp.mean(var)

    def assign(C):
        # argmin_k ||x - c_k||^2; the ||x||^2 term is constant per cell.
        scores = _sq_norms(C)[:, None] - 2.0 * (C.T @ X)        # (K, S)
        return jnp.argmin(scores, axis=0)                       # (S,)

    def body(carry):
        C, _, i, _ = carry
        labels = assign(C)
        onehot = (labels[None, :] == jnp.arange(K, dtype=labels.dtype)[:, None])
        w = onehot.astype(jnp.float32)                          # (K, S)
        sums = X @ w.T                                          # (d, K)
        counts = jnp.sum(w, axis=1)                             # (K,)
        C_new = jnp.where(counts[None, :] > 0.0,
                          sums / jnp.maximum(counts, 1.0)[None, :], C)
        shift = jnp.sum((C_new - C) ** 2)
        return C_new, shift, i + 1, shift <= tol

    def cond(carry):
        _, _, i, done = carry
        return jnp.logical_and(i < cfg.kmeans_max_iter, jnp.logical_not(done))

    init = (centers, jnp.float32(jnp.inf), jnp.int32(0), jnp.zeros((), jnp.bool_))
    C, _, _, _ = lax.while_loop(cond, body, init)
    return C


def kmeans_init(key, Z_cos, cfg: EngineConfig, axis_name):
    """Full k-means init on the unit-normalized embedding.

    Z_cos: (d, N_local) sharded. Returns centroids (d, K), replicated and
    bitwise device-count-invariant (NOT yet L2-normalized — the caller
    normalizes, mirroring reference harmony.py:377).

    Above cfg.kmeanspp_sample cells, seeding and Lloyd run on an invariant
    uniform subsample (see module docstring); at or below the cap, on all
    cells — either way the computation is replicated and collective-free
    past the initial column gather.
    """
    S = min(cfg.kmeanspp_sample, cfg.N)
    if S < cfg.N:
        key, k_sub = jax.random.split(key)
        # iid uniform draw WITH replacement: at S=131k of N>=2S the
        # duplicate mass is <= S/(2N) ~ a few percent — pure sampling noise
        # for seeding. (A permutation-based draw without replacement needs
        # an N-length sort whose XLA:TPU lowering costs ~21 s of compile at
        # 858k — the single largest compile cost of the whole fit program.)
        ids = jax.random.randint(k_sub, (S,), 0, cfg.N)
    else:
        ids = jnp.arange(cfg.N)
    Xs = _gather_columns(Z_cos, ids, cfg, axis_name)
    # Large problems: k-means|| seeding (a few wide passes) instead of K
    # sequential latency-bound D^2 draws.
    if S < cfg.N and S >= cfg.kmeansbb_oversample * cfg.K:
        centers = _kmeansbb_seed(key, Xs, cfg)
    else:
        centers = _kmeanspp_seed(key, Xs, cfg)
    return _lloyd(centers, Xs, cfg)
