"""LISI — Local Inverse Simpson Index, on-device.

Same semantics as the reference (lisi.py:24-133): exact kNN with
3*perplexity neighbors (self dropped), Gaussian-kernel perplexity calibration
per cell via a 50-step bisection on beta (tol 1e-5), then the Simpson index
over label categories; LISI = 1/Simpson.

The reference's per-cell Python loop (lisi.py:81, noted "too slow" at
lisi.py:27) becomes a single vmapped bisection; the sklearn kd-tree becomes a
chunked brute-force top-k (exact, MXU-friendly — one (chunk, N) GEMM per
chunk instead of a pointer-chasing tree).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp
from jax import lax

from typing import Iterable


_KNN_TILE = 131_072  # reference-set tile (memory cap ~ chunk x tile floats)

# knn="exact" picks the pruned sub-quadratic search (ops/knn_pruned.py)
# above this N when querying every cell on one device; below it the tiled
# brute force is already fast and avoids the index build.
_PRUNED_MIN_N = 100_000


@jax.jit
def _drop_self_by_id(dist, idx, qid):
    """Id-based self-neighbor drop for (M, k) results: remove the entry
    whose index equals the query's own row id, or the worst candidate if
    self is absent (possible under approx top-k at recall < 1 — discarding
    column 0 there would throw away the true nearest neighbor). The single
    definition shared by the brute in-chunk path and the pruned path: the
    pruned-vs-brute exactness contract depends on both applying the same
    tie/absent-self rule."""
    k = dist.shape[1]
    match = idx == qid[:, None]
    pos = jnp.where(jnp.any(match, axis=1), jnp.argmax(match, axis=1), k - 1)
    keep = jnp.arange(k - 1, dtype=jnp.int32)[None, :]
    keep = keep + (keep >= pos[:, None])
    return (jnp.take_along_axis(dist, keep, axis=1),
            jnp.take_along_axis(idx, keep, axis=1))


def _knn_impl(Q: jnp.ndarray, X: jnp.ndarray, n_neighbors: int,
              chunk: int = 1024, approx: bool = False, qid=None):
    """Brute-force kNN of queries Q (M, d) against reference set X
    (N, d). Returns (distances, indices), each (M, n_neighbors), the
    self-neighbor dropped (reference lisi.py:53-57). Q must be a subset of X
    rows (each query's nearest hit is itself).

    qid: optional (M,) int32 global row id of each query in X. When given,
    the self-neighbor is dropped BY ID (the entry whose index equals the
    query's own row id; if absent — possible under approx top-k, which can
    miss the self point at recall < 1 — the worst candidate is dropped
    instead). Without qid the first column is dropped positionally, which is
    only sound for exact top-k.

    Two-stage at scale: when N exceeds _KNN_TILE, the reference set is
    scanned in tiles — top-k per (chunk, tile) slab, then top-k over the
    concatenated per-tile candidates — so peak memory is chunk x tile
    floats (~0.5 GB) instead of chunk x N (3.5 GB at 858k, which overflows
    a 16 GB chip once top-k workspace is added). Exact by default: a global
    top-k winner is a top-k winner within its own tile.

    approx truthy swaps the per-tile selection for lax.approx_max_k — the
    TPU's PartialReduce hardware operator (Chern et al., arXiv:2206.14286)
    — for atlas-scale runs where the exact VPU sort dominates; the
    cross-tile merge stays exact. `approx` may be a float in (0, 1]: the
    per-tile recall target (True means the 0.95 default)."""
    M, d = Q.shape
    N = X.shape[0]
    k = n_neighbors + 1  # top-k includes the point itself
    # Center on X's column means (Q is a subset of X's rows): distances are
    # translation-invariant, but the fp32 error of the GEMM expansion
    # ||q||^2 + ||x||^2 - 2 q.x scales with the squared row norms — on an
    # uncentered embedding (norms >> pairwise distances) neighbor ranks
    # would be fp32 noise. Centering makes the computed distances accurate
    # at the scale of the data spread, matching the reference kd-tree's
    # direct (x - q) arithmetic.
    mu = jnp.mean(X, axis=0, keepdims=True)
    X = X - mu
    Q = Q - mu
    sq = jnp.sum(X * X, axis=1)

    n_chunks = -(-M // chunk)
    M_pad = n_chunks * chunk
    Qp = jnp.zeros((M_pad, d), Q.dtype).at[:M].set(Q)
    qidp = (None if qid is None else
            jnp.full((M_pad,), -1, jnp.int32).at[:M].set(
                qid.astype(jnp.int32)))

    n_tiles = -(-N // _KNN_TILE)
    T = _KNN_TILE if n_tiles > 1 else N
    N_pad = n_tiles * T
    if N_pad != N:
        # Zero-pad the rows (inf rows would turn the GEMM into NaNs) and
        # force the padded squared norms to +inf so pad distances sort last.
        Xp = jnp.zeros((N_pad, d), X.dtype).at[:N].set(X)
        sqp = jnp.full((N_pad,), jnp.inf, sq.dtype).at[:N].set(sq)
    else:
        Xp, sqp = X, sq

    def one_chunk(start):
        Qc = lax.dynamic_slice(Qp, (start, jnp.zeros((), start.dtype)),
                               (chunk, d))
        qsq = jnp.sum(Qc * Qc, axis=1)

        def one_tile(t0):
            Xt = lax.dynamic_slice(Xp, (t0, jnp.zeros((), t0.dtype)), (T, d))
            st = lax.dynamic_slice(sqp, (t0,), (T,))
            # full fp32 GEMM: LISI is an evaluation metric with an exact
            # golden contract vs the R package, and bf16-input MXU distances
            # can flip near-tied neighbor ranks; top-k dominates the runtime
            # anyway.
            d2 = qsq[:, None] + st[None, :] - 2.0 * jnp.matmul(
                Qc, Xt.T, precision=lax.Precision.HIGHEST)     # (chunk, T)
            if approx:
                rt = 0.95 if approx is True else float(approx)
                neg, idx = lax.approx_max_k(-d2, k, recall_target=rt)
            else:
                neg, idx = lax.top_k(-d2, k)
            return neg, idx + t0

        if n_tiles == 1:
            neg, idx = one_tile(jnp.zeros((), jnp.int32))
        else:
            tstarts = jnp.arange(n_tiles, dtype=jnp.int32) * T
            negs, idxs = lax.map(one_tile, tstarts)   # (nt, chunk, k)
            negs = jnp.moveaxis(negs, 0, 1).reshape(chunk, n_tiles * k)
            idxs = jnp.moveaxis(idxs, 0, 1).reshape(chunk, n_tiles * k)
            neg, which = lax.top_k(negs, k)
            idx = jnp.take_along_axis(idxs, which, axis=1)
        dist = jnp.sqrt(jnp.maximum(-neg, 0.0))
        if qidp is None:
            return dist[:, 1:], idx[:, 1:]            # drop self positionally
        qc = lax.dynamic_slice(qidp, (start,), (chunk,))
        return _drop_self_by_id(dist, idx, qc)

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    dists, idxs = lax.map(one_chunk, starts)
    dists = dists.reshape(M_pad, n_neighbors)[:M]
    idxs = idxs.reshape(M_pad, n_neighbors)[:M]
    return dists, idxs


_knn = jax.jit(_knn_impl, static_argnums=(2, 3, 4))


def _knn_pruned(X, n_neighbors: int, qid, visit: int | None = None,
                mesh=None):
    """Exact full-N kNN via sub-quadratic pruned search (ops/knn_pruned.py)
    with a brute-force fallback for uncertified queries — exact for every
    row by construction. Returns (dist, idx) after the self-drop, or None
    when pruning cannot pay on this input: pathologically unbalanced
    clustering (per-step distance slab over the memory cap), k exceeding
    the candidate capacity, or a low certification rate on the probe batch
    (genuinely high-dimensional data — where every exact method, the
    reference's kd-tree included, degrades to linear scans). The caller
    then uses the tiled brute force."""
    import logging

    from .ops.knn_pruned import (_DEFAULT_VISIT, build_index,
                                 default_n_clusters, pruned_knn)

    visit = _DEFAULT_VISIT if visit is None else visit
    index = build_index(X, default_n_clusters(X.shape[0], n_neighbors + 1))
    V = min(visit, index.starts.shape[0])
    if (V * index.p_max * index.p_max * 4 > 600e6     # (P, V*P) slab cap
            or n_neighbors + 1 > V * index.p_max):
        return None
    res = pruned_knn(X, n_neighbors, visit=visit, index=index, mesh=mesh)
    if res is None:                                   # probe bail
        return None
    dist, idx, cert = res
    dist, idx = _drop_self_by_id(dist, idx, qid)
    fail = np.asarray(~np.asarray(cert)).nonzero()[0]
    logging.getLogger("harmonypy_tpu").debug(
        "pruned kNN: %d/%d queries certified exact (%d fallback)",
        X.shape[0] - fail.size, X.shape[0], fail.size)
    if fail.size:
        # Brute-force the uncertified remainder; pad to a power-of-two
        # bucket so repeated calls share executables.
        B = max(256, 1 << int(fail.size - 1).bit_length())
        sel = np.concatenate([fail, np.zeros(B - fail.size, fail.dtype)])
        fqid = jnp.asarray(np.concatenate(
            [fail, np.full(B - fail.size, -1)]), jnp.int32)
        fb_d, fb_i = _knn_batched(X[sel], X, n_neighbors, None, qid=fqid)
        at = jnp.asarray(fail, jnp.int32)
        dist = dist.at[at].set(fb_d[:fail.size])
        idx = idx.at[at].set(fb_i[:fail.size])
    return dist, idx


_KNN_BATCH = 65_536  # queries per dispatch (bounds single-program runtime)


def _knn_batched(Q, X, n_neighbors: int, mesh=None, chunk: int = 1024,
                 approx: bool = False, qid=None):
    """Host-level query batching around the jitted kNN: one dispatch per
    _KNN_BATCH queries (padded to a full batch, so exactly two executables:
    the batch shape and nothing else). Keeps any single device program's
    runtime bounded — a full 858k x 858k kNN in one program runs for
    minutes, which remote-tunnel workers do not reliably survive — and
    yields identical values to the one-shot computation (each query row is
    independent)."""
    M = Q.shape[0]
    if M <= _KNN_BATCH:
        return (_knn_sharded(Q, X, n_neighbors, mesh, chunk, approx, qid)
                if mesh is not None and int(mesh.devices.size) > 1
                else _knn(Q, X, n_neighbors, chunk, approx, qid))
    outs = []
    for lo in range(0, M, _KNN_BATCH):
        Qb = Q[lo: lo + _KNN_BATCH]
        qb = None if qid is None else qid[lo: lo + _KNN_BATCH]
        if Qb.shape[0] < _KNN_BATCH:  # pad: reuse the same executable
            pad = _KNN_BATCH - Qb.shape[0]
            Qb = jnp.concatenate(
                [Qb, jnp.zeros((pad, Q.shape[1]), Q.dtype)])
            if qb is not None:
                qb = jnp.concatenate([qb, jnp.full((pad,), -1, jnp.int32)])
        outs.append(_knn_batched(Qb, X, n_neighbors, mesh, chunk, approx, qb))
    dist = jnp.concatenate([o[0] for o in outs])[:M]
    idx = jnp.concatenate([o[1] for o in outs])[:M]
    return dist, idx


@functools.lru_cache(maxsize=16)
def _knn_sharded_fn(mesh, n_neighbors: int, chunk: int, approx: bool):
    """Cached jitted shard_map for the mesh kNN: building it per call would
    re-trace/compile an identical program for every 65k-query batch."""
    from .parallel.mesh import AXIS
    from jax.sharding import PartitionSpec as P

    return jax.jit(jax.shard_map(
        lambda q, x, i: _knn_impl(q, x, n_neighbors, chunk, approx, i),
        mesh=mesh, in_specs=(P(AXIS, None), P(), P(AXIS)),
        out_specs=(P(AXIS, None), P(AXIS, None))))


def _knn_sharded(Q, X, n_neighbors: int, mesh, chunk: int = 1024,
                 approx: bool = False, qid=None):
    """Mesh-parallel exact kNN: queries sharded over the cells axis, the
    reference set replicated (it is the d-dimensional input embedding —
    ~100 MB at 858k cells — not a K x N state array). Zero collectives: each
    shard's (M_local, N) distance tiles and top-k are independent, so the
    values are bitwise identical to the single-device computation."""
    D = int(mesh.devices.size)
    M = Q.shape[0]
    Mp = -(-M // D) * D
    Qp = jnp.zeros((Mp, Q.shape[1]), Q.dtype).at[:M].set(Q)
    if qid is None:
        # arange(M) is only the true self-id when Q IS the first M rows of
        # X; for sampled queries it would mislabel every self point and the
        # id-based drop would keep it as the nearest neighbor. Callers with
        # subset queries must pass real row ids.
        raise ValueError("_knn_sharded requires qid (global row ids of the "
                         "queries in X); compute_lisi always supplies it")
    qp = jnp.full((Mp,), -1, jnp.int32).at[:M].set(qid.astype(jnp.int32))
    dists, idxs = _knn_sharded_fn(mesh, n_neighbors, chunk, approx)(Qp, X, qp)
    return dists[:M], idxs[:M]


def _simpson_one_cell(dist, onehot_nbrs, logU, tol):
    """Perplexity bisection + Simpson index for one cell.

    dist: (k,) distances; onehot_nbrs: (k, C) one-hot neighbor labels.
    Mirrors reference compute_simpson (lisi.py:81-132) exactly, including the
    beta=1 start, the double/halve rule before a bracket exists, and the
    H == 0 -> simpson = -1 default.
    """

    def H_of(beta):
        P = jnp.exp(-dist * beta)
        s = jnp.sum(P)
        good = s > 0.0
        H = jnp.where(good, jnp.log(jnp.where(good, s, 1.0))
                      + beta * jnp.sum(dist * P) / jnp.where(good, s, 1.0), 0.0)
        return H, jnp.where(good, P / jnp.where(good, s, 1.0), 0.0)

    beta0 = jnp.asarray(1.0, dist.dtype)
    H0, _ = H_of(beta0)
    inf = jnp.asarray(jnp.inf, dist.dtype)

    def body(_, carry):
        beta, bmin, bmax, H, Hdiff = carry
        active = jnp.abs(Hdiff) >= tol
        up = Hdiff > 0.0
        new_bmin = jnp.where(up, beta, bmin)
        new_bmax = jnp.where(up, bmax, beta)
        beta_up = jnp.where(jnp.isfinite(bmax), (beta + bmax) / 2.0, beta * 2.0)
        beta_dn = jnp.where(jnp.isfinite(bmin), (beta + bmin) / 2.0, beta / 2.0)
        new_beta = jnp.where(up, beta_up, beta_dn)
        H_new, _ = H_of(new_beta)
        out = (new_beta, new_bmin, new_bmax, H_new, H_new - logU)
        return tuple(jnp.where(active, n, o) for n, o in zip(out, carry))

    beta, _, _, H, _ = lax.fori_loop(
        0, 50, body, (beta0, -inf, inf, H0, H0 - logU))
    _, P = H_of(beta)

    cat_sums = P @ onehot_nbrs                       # (C,)
    simpson = jnp.sum(cat_sums * cat_sums)
    return jnp.where(H == 0.0, simpson - 1.0, simpson)


def compute_simpson(distances, indices, labels, n_categories, perplexity,
                    tol: float = 1e-5):
    """Reference-compatible entry (lisi.py:68-75): distances/indices are
    (k, N) column-per-cell; labels is a pd.Categorical."""
    codes = np.asarray(labels.codes if hasattr(labels, "codes")
                       else labels, dtype=np.int32)
    dist = jnp.asarray(np.asarray(distances).T)      # (N, k)
    idx = np.asarray(indices).T                      # (N, k)
    onehot = jnp.asarray(
        (codes[idx][..., None] == np.arange(n_categories)[None, None, :])
        .astype(np.asarray(distances).dtype))        # (N, k, C)
    logU = jnp.asarray(np.log(perplexity), dist.dtype)
    tol = jnp.asarray(tol, dist.dtype)
    simpson = _simpson_all(dist, onehot, logU, tol)
    return np.asarray(simpson)


_simpson_all = jax.jit(jax.vmap(_simpson_one_cell, in_axes=(0, 0, None, None)))


def compute_lisi(
    X,
    metadata: pd.DataFrame,
    label_colnames: Iterable[str],
    perplexity: float = 30,
    sample: int | None = None,
    random_state: int = 0,
    mesh=None,
    knn: str = "exact",
    knn_recall_target: float = 0.95,
):
    """Compute LISI for each label column (reference lisi.py:24-65).

    LISI ~= the effective number of distinct categories among each cell's
    neighbors: 1 = unmixed, n_categories = fully mixed.

    sample: evaluate LISI only at `sample` uniformly-drawn query cells
    (neighbors still come from ALL cells, so each per-cell value is exact).
    The exact kNN is a dense (queries x N) distance computation — quadratic
    in N when querying every cell, which is the practical limit the
    reference's kd-tree also hits in high dimensions. Whenever `sample` is
    given, the return type is a stable (values, query_indices) pair — even
    if sample >= N, in which case indices are arange(N).

    mesh: optional jax.sharding.Mesh — parallelize the search over the
    mesh: the brute force shards the queries (no collectives), the pruned
    search shards the per-cluster scan (disjoint-row psum merge); either
    way the values are bitwise identical to the single-device computation.

    knn: "exact" (default — same neighbor sets as the reference) picks the
    fastest exact algorithm: the tiled brute force, or — when querying
    every cell of a large (>= 100k) problem single-process — the
    sub-quadratic cluster-pruned search (ops/knn_pruned.py), whose
    per-query certificate + brute-force fallback makes it exact for every
    row. "brute" / "pruned" force one algorithm (pruned still falls back
    to brute when the cluster geometry is unsuitable). "approx" — TPU
    hardware approximate top-k (lax.approx_max_k) for atlas-scale runs.
    knn_recall_target: per-reference-tile recall target of the approx
    operator (default 0.95; higher = more accurate, slower). Ignored for
    exact modes.
    """
    if knn not in ("exact", "brute", "pruned", "approx"):
        raise ValueError(f"knn must be 'exact', 'brute', 'pruned' or "
                         f"'approx', got {knn!r}")
    knn_recall_target = float(knn_recall_target)
    if not 0.0 < knn_recall_target <= 1.0:
        raise ValueError(f"knn_recall_target must be in (0, 1], "
                         f"got {knn_recall_target}")
    on_device = isinstance(X, jax.Array)
    if not on_device:
        X = np.asarray(X.values if hasattr(X, "values") else X)
    dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
    n_cells = metadata.shape[0]
    label_colnames = list(label_colnames)

    if sample is not None and sample < n_cells:
        rng = np.random.default_rng(random_state)
        query_idx = np.sort(rng.choice(n_cells, size=sample, replace=False))
        subset = True
    else:
        query_idx = np.arange(n_cells) if sample is not None else None
        subset = False

    # Everything stays on device between the kNN and the final LISI values:
    # the only host->device traffic is X and the (N,) label codes per column.
    # A jax.Array input (e.g. a device-resident Z_corr mid-pipeline) stays
    # on device — no host round trip.
    Xd = X.astype(dtype) if on_device else jnp.asarray(X, dtype)
    Qd = Xd[query_idx] if subset else Xd
    # Self-neighbor removal is by row id (robust to approx top-k missing the
    # self point, and to exact-distance ties among duplicate rows).
    qid = jnp.asarray(query_idx if subset else np.arange(n_cells), jnp.int32)
    n_neighbors = int(perplexity * 3) - 1
    multi = mesh is not None and int(mesh.devices.size) > 1
    dist = None
    # Single-process meshes shard the pruned per-cluster scan (bitwise equal
    # to the single-device scan — ops/knn_pruned._mesh_batch_fn); on a
    # multi-PROCESS run the index would need global arrays, so the sharded
    # brute force stays the mesh path there.
    mesh_prune = (mesh if multi and jax.process_count() == 1 else None)
    if knn == "pruned" and multi and mesh_prune is None:
        import logging
        logging.getLogger("harmonypy_tpu").warning(
            "knn='pruned' across %d processes: the pruned exact search "
            "runs per-process on one device; use knn='exact' for the "
            "mesh-sharded exact path.", jax.process_count())
    if knn == "pruned" or (knn == "exact" and not subset
                           and (not multi or mesh_prune is not None)
                           and n_cells >= _PRUNED_MIN_N):
        res = _knn_pruned(Xd, n_neighbors,
                          jnp.arange(n_cells, dtype=jnp.int32),
                          mesh=mesh_prune)
        if res is not None:
            dist, idx = res
            if subset:  # forced pruned mode: keep only the sampled rows
                dist, idx = dist[query_idx], idx[query_idx]
    if dist is None:
        dist, idx = _knn_batched(Qd, Xd, n_neighbors, mesh,
                                 approx=(knn_recall_target
                                         if knn == "approx" else False),
                                 qid=qid)
    logU = jnp.asarray(np.log(perplexity), dist.dtype)
    tol = jnp.asarray(1e-5, dist.dtype)

    lisi_df = np.zeros((dist.shape[0], len(label_colnames)))
    for i, label in enumerate(label_colnames):
        labels = pd.Categorical(metadata[label])
        codes = jnp.asarray(np.asarray(labels.codes, np.int32))
        simpson = _simpson_label(dist, idx, codes,
                                 len(labels.categories), logU, tol)
        lisi_df[:, i] = 1 / np.asarray(simpson)
    if query_idx is not None:
        return lisi_df, query_idx
    return lisi_df


@functools.partial(jax.jit, static_argnums=(3,))
def _simpson_label(dist, idx, codes, n_categories, logU, tol):
    """On-device Simpson for one label column: one-hot the neighbor codes and
    run the vmapped bisection without leaving the device."""
    onehot = (codes[idx][..., None]
              == jnp.arange(n_categories)[None, None, :]).astype(dist.dtype)
    return jax.vmap(_simpson_one_cell, in_axes=(0, 0, None, None))(
        dist, onehot, logU, tol)
