"""Sub-quadratic EXACT kNN: cluster pruning with a per-query certificate.

The reference gets exact kNN from a kd-tree (lisi.py:53, ~O(N log N) in low
dimensions). Pointer-chasing trees do not map to the TPU; this module gets
sub-quadratic *exact* search the MXU way:

  1. BUILD: coarse k-means over the points (C ~ sqrt(N) centroids, a few
     Lloyd rounds — quality only affects speed, never correctness), points
     laid out contiguously by cluster, per-cluster radius r_c = max member
     distance to the centroid.
  2. QUERY: each cluster's members are queried together against the V
     nearest clusters' members (one (P_max, V*P_max) distance GEMM per
     cluster) and the top-k is taken over those candidates.
  3. CERTIFICATE: by the triangle inequality every point x in an unvisited
     cluster c satisfies d(q, x) >= d(q, mu_c) - r_c. If that lower bound
     exceeds the candidate kth distance for every unvisited cluster, the
     candidate top-k IS the global top-k and the query is *certified*
     exact. The (typically tiny) uncertified remainder is re-answered by
     the brute-force path (lisi._knn_batched), so the result is exact for
     every query regardless of how well the clustering prunes.

Total work is O(N * (V * P_max + C) * d) instead of O(N^2 * d) — and, more
importantly on TPU, the per-query top-k sort shrinks from N entries to
V * P_max. Like the kd-tree, pruning weakens as dimensionality grows (the
certificate then routes more queries to the fallback — slower, never
wrong).

The per-cluster scan steps are independent, so values are invariant to how
the scan is batched across dispatches.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# Certificate slack: distances enter via two different fp32 GEMMs
# (query x candidate vs query x centroid), and the absolute error of a
# squared distance computed as ||q||^2 + ||x||^2 - 2 q.x scales with the
# squared DATA RADIUS (the norms), not with the distance itself. The
# margin is therefore scale-aware — _CERT_TOL * (R + d_k) with R the max
# row norm of the CENTERED point set (the index centers the data first;
# distances are translation-invariant, and centering minimizes R, i.e.
# the cancellation error). A falsely UNcertified query only costs a
# fallback recompute; mis-ranked neighbors within the margin are
# distance-indistinguishable at fp32 (the brute path's own rounding
# granularity).
_CERT_TOL = 1e-4

_LLOYD_ITERS = 12       # tighter cells -> smaller radii -> more certificates
_ASSIGN_TILE = 16_384   # rows per assignment tile (bounds the (tile, C) d2)
_CLUSTER_BATCH = 128    # clusters per dispatch (bounds program runtime)
_DEFAULT_VISIT = 32     # candidate clusters per query cluster
_PROBE_MIN_CERT = 0.5   # below this probe certification rate, bail to brute


class PrunedIndex(NamedTuple):
    """Device-resident cluster index over the (padded) sorted point set.
    Points are stored CENTERED (column means subtracted): distances are
    translation-invariant, and centering minimizes the row norms that set
    the fp32 cancellation error of every distance GEMM (see _CERT_TOL)."""
    Xs: jnp.ndarray        # (N + P_max, d) centered points sorted by cluster
    sqs: jnp.ndarray       # (N + P_max,) squared norms, +inf on the pad
    ids: jnp.ndarray       # (N + P_max,) original row id per sorted row (-1 pad)
    starts: jnp.ndarray    # (C,) first sorted row of each cluster
    counts: jnp.ndarray    # (C,) cluster sizes
    centroids: jnp.ndarray  # (C, d)
    radii: jnp.ndarray     # (C,) max member distance to centroid (inflated)
    p_max: int             # static max cluster size
    scale: jnp.ndarray = None  # () max centered row norm (certificate margin)


def default_n_clusters(n: int, k: int = 1) -> int:
    """Power-of-two C ~ min(sqrt(8N), N / 4k): sqrt(8N) balances the
    certificate GEMM (N x C) against the candidate GEMM (N x V*P_max with
    P_max ~ N/C); the N / 4k cap keeps the average cluster well above the
    neighbor count — when a cluster holds fewer points than k, a query's
    kNN ball inevitably straddles many clusters and the triangle-inequality
    certificate almost never fires."""
    c = 1
    while c * c < 8 * n:
        c *= 2
    while c > 1 and c * 4 * k > n:
        c //= 2
    return min(c, max(1, n // 2))


@functools.partial(jax.jit, static_argnums=(2, 3))
def _build_impl(X, key, C: int, iters: int):
    N, d = X.shape
    # Center: distances are translation-invariant and the fp32 error of
    # ||q||^2 + ||x||^2 - 2 q.x scales with the squared row norms, so an
    # uncentered embedding (norms >> pairwise distances) would make both
    # the candidate distances and the certificate bound lose the digits
    # the exactness proof compares.
    X = X - jnp.mean(X, axis=0, keepdims=True)
    sq = jnp.sum(X * X, axis=1)
    scale = jnp.sqrt(jnp.max(sq))

    def assign_pass(cent):
        """(N,) nearest-centroid id + (N,) squared distance, tiled so the
        (tile, C) distance slab stays small."""
        csq = jnp.sum(cent * cent, axis=1)
        nt = -(-N // _ASSIGN_TILE)
        Np = nt * _ASSIGN_TILE
        Xp = jnp.zeros((Np, d), X.dtype).at[:N].set(X)
        sp = jnp.zeros((Np,), sq.dtype).at[:N].set(sq)

        def one(t0):
            Xt = lax.dynamic_slice(Xp, (t0, jnp.zeros((), t0.dtype)),
                                   (_ASSIGN_TILE, d))
            st = lax.dynamic_slice(sp, (t0,), (_ASSIGN_TILE,))
            d2 = (st[:, None] + csq[None, :]
                  - 2.0 * jnp.matmul(Xt, cent.T,
                                     precision=lax.Precision.HIGHEST))
            return jnp.argmin(d2, axis=1).astype(jnp.int32), jnp.min(d2, axis=1)

        ts = jnp.arange(nt, dtype=jnp.int32) * _ASSIGN_TILE
        a, d2 = lax.map(one, ts)
        return a.reshape(Np)[:N], d2.reshape(Np)[:N]

    # Init from an iid draw (NOT a permutation sort — huge compile cost);
    # duplicate picks just leave some clusters empty, which is harmless.
    cent = X[jax.random.randint(key, (C,), 0, N)]

    def lloyd(_, cent):
        a, _ = assign_pass(cent)
        tot = jnp.zeros((C, d), X.dtype).at[a].add(X)
        cnt = jnp.zeros((C,), X.dtype).at[a].add(1.0)
        return jnp.where(cnt[:, None] > 0, tot / jnp.maximum(cnt[:, None], 1),
                         cent)

    cent = lax.fori_loop(0, iters, lloyd, cent)
    a, d2 = assign_pass(cent)
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    radii = jnp.zeros((C,), X.dtype).at[a].max(dist)
    radii = radii * (1.0 + 1e-6) + 1e-6          # absorb assignment rounding
    counts = jnp.zeros((C,), jnp.int32).at[a].add(1)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1]])
    # Stable cluster-major layout (two-operand sort == stable argsort).
    _, perm = lax.sort_key_val(a, jnp.arange(N, dtype=jnp.int32))
    return X[perm], sq[perm], perm, starts, counts, cent, radii, scale


def _balance_split_host(Xs, sqs, perm, counts, cent, radii, cap: int):
    """Split every cluster larger than `cap` by recursive median cut along
    its max-variance axis (host NumPy; the build already reads counts back,
    and the split only touches oversized clusters' members).

    Why: every per-cluster query step is shaped by the STATIC p_max — its
    top-k runs (p_max, V * p_max) regardless of true sizes, and the TopK
    kernel is ~94% of the search (traced on v5e: 44 ms/cluster at
    p_max=2090 where the mean cluster is 512 — the iid-init Lloyd build
    leaves 4x size outliers on clumpy data). Median cuts keep the halves
    spatially coherent, so sub-cluster radii shrink and the triangle-
    inequality certificate keeps firing; ANY partition is correct (the
    certificate never assumes how clusters were formed), balance only
    buys speed. Split clusters get host-f64 centroids/radii with the same
    validity inflation as the device build; untouched clusters keep their
    device-computed values bit-for-bit."""
    segs, cents, radiis = [], [], []
    pos = 0
    for c, cnt in enumerate(counts):
        rows = np.arange(pos, pos + int(cnt)); pos += int(cnt)
        if cnt <= cap:
            segs.append(rows)
            cents.append(cent[c]); radiis.append(radii[c])
            continue
        stack = [rows]
        while stack:
            rs = stack.pop()
            if len(rs) > cap:
                P = Xs[rs]
                ax = int(np.argmax(P.var(axis=0)))
                med = np.median(P[:, ax])
                left = P[:, ax] <= med
                if left.all() or not left.any():   # degenerate ties
                    order = np.argsort(P[:, ax], kind="stable")
                    half = len(rs) // 2
                    stack.append(rs[order[:half]])
                    stack.append(rs[order[half:]])
                else:
                    stack.append(rs[left])
                    stack.append(rs[~left])
            else:
                segs.append(rs)
                P = Xs[rs].astype(np.float64)
                mu = P.mean(axis=0)
                r = float(np.sqrt(((P - mu) ** 2).sum(axis=1)).max())
                cents.append(mu.astype(Xs.dtype))
                radiis.append(np.asarray(r * (1.0 + 1e-6) + 1e-6, Xs.dtype))
    order = np.concatenate(segs)
    new_counts = np.asarray([len(s) for s in segs], np.int32)
    new_starts = np.concatenate(
        [np.zeros((1,), np.int32),
         np.cumsum(new_counts)[:-1].astype(np.int32)])
    return (Xs[order], sqs[order], perm[order], new_starts, new_counts,
            np.stack(cents).astype(Xs.dtype),
            np.asarray(radiis, Xs.dtype))


# p_max cap as a multiple of the mean cluster size (the floor keeps the
# per-cluster GEMM/top-k windows MXU-shaped for tiny problems).
_BALANCE_FACTOR = 1.3
_BALANCE_MIN_CAP = 128


def build_index(X: jnp.ndarray, n_clusters: int | None = None,
                seed: int = 0, balance: bool = True) -> PrunedIndex:
    """Cluster X (N, d) and lay it out (centered) for pruned search. One
    host readback (the (C,) counts) fixes the static per-cluster capacity
    P_max. n_clusters defaults to default_n_clusters(N) — callers that
    know their k should pass default_n_clusters(N, k) so clusters stay
    comfortably larger than the neighbor count. balance=True splits
    oversized clusters so p_max stays within ~1.3x the mean size (see
    _balance_split_host)."""
    N, d = X.shape
    C = n_clusters or default_n_clusters(N)
    Xs, sqs, perm, starts, counts, cent, radii, scale = _build_impl(
        X, jax.random.PRNGKey(seed), C, _LLOYD_ITERS)
    counts_h = np.asarray(counts)
    cap = max(_BALANCE_MIN_CAP, int(np.ceil(_BALANCE_FACTOR * N / C)))
    if balance and int(counts_h.max()) > cap:
        parts = _balance_split_host(
            np.asarray(Xs), np.asarray(sqs), np.asarray(perm), counts_h,
            np.asarray(cent), np.asarray(radii), cap)
        Xs, sqs, perm, starts, counts, cent, radii = map(jnp.asarray, parts)
    p_max = int(np.max(np.asarray(counts)))
    # Pad P_max rows so every dynamic_slice window [start, start + P_max)
    # is in bounds without clamping (clamping would misalign the
    # slot-vs-member masking).
    Xs = jnp.concatenate([Xs, jnp.zeros((p_max, d), Xs.dtype)])
    sqs = jnp.concatenate([sqs, jnp.full((p_max,), jnp.inf, sqs.dtype)])
    ids = jnp.concatenate([perm, jnp.full((p_max,), -1, jnp.int32)])
    return PrunedIndex(Xs, sqs, ids, starts, counts, cent, radii, p_max,
                       scale)


@functools.partial(jax.jit, static_argnums=(1,))
def _cluster_neighbors(cent, V: int):
    """(C, V) ids of the V nearest clusters of each cluster, by centroid
    distance (self first). Depends only on (index, V) — computed once per
    search, shared by every query batch."""
    csq = jnp.sum(cent * cent, axis=1)
    cc = csq[:, None] + csq[None, :] - 2.0 * jnp.matmul(
        cent, cent.T, precision=lax.Precision.HIGHEST)
    _, nbrs = lax.top_k(-cc, V)
    return nbrs


def _scan_clusters(index: PrunedIndex, cids, nbrs, k: int, V: int,
                   p_max: int, out):
    """Answer all queries owned by the clusters in `cids` (one scan step per
    cluster), merging rows into the carried output arrays.

    out = (dist (N + P_max, k), idx (N + P_max, k), cert (N + P_max,)).
    Rows of distinct clusters are disjoint, so batching order is
    irrelevant to the values. Sentinel cluster ids (< 0) are skipped —
    the mesh path pads its per-shard id slices with them.
    """
    Xs, sqs, ids, starts, counts, cent, radii = index[:7]
    C, d = cent.shape
    csq = jnp.sum(cent * cent, axis=1)
    slot = jnp.arange(p_max, dtype=jnp.int32)

    def one_cluster(out, ci_raw):
        dist_o, idx_o, cert_o = out
        live = ci_raw >= 0
        ci = jnp.maximum(ci_raw, 0)
        start, cnt = starts[ci], counts[ci]
        z = jnp.zeros((), start.dtype)
        Q = lax.dynamic_slice(Xs, (start, z), (p_max, d))
        qsq = lax.dynamic_slice(sqs, (start,), (p_max,))
        qid = lax.dynamic_slice(ids, (start,), (p_max,))
        row_valid = (slot < cnt) & live

        nb = nbrs[ci]                                          # (V,)
        g = lambda arr, s: lax.dynamic_slice(arr, (s, z), (p_max, d))
        cand = jax.vmap(g, in_axes=(None, 0))(Xs, starts[nb])  # (V, P, d)
        candsq = jax.vmap(
            lambda s: lax.dynamic_slice(sqs, (s,), (p_max,)))(starts[nb])
        candid = jax.vmap(
            lambda s: lax.dynamic_slice(ids, (s,), (p_max,)))(starts[nb])
        cvalid = slot[None, :] < counts[nb][:, None]           # (V, P)
        candsq = jnp.where(cvalid, candsq, jnp.inf)

        W = V * p_max
        d2 = (qsq[:, None] + candsq.reshape(W)[None, :]
              - 2.0 * jnp.matmul(Q, cand.reshape(W, d).T,
                                 precision=lax.Precision.HIGHEST))
        neg, pos = lax.top_k(-d2, k)                           # (P, k)
        kdist = jnp.sqrt(jnp.maximum(-neg, 0.0))
        kidx = jnp.take(candid.reshape(W), pos)                # original ids
        d_k = kdist[:, -1]

        # Certificate: lower bound to every unvisited cluster vs d_k.
        qc = (qsq[:, None] + csq[None, :]
              - 2.0 * jnp.matmul(Q, cent.T,
                                 precision=lax.Precision.HIGHEST))
        lb = jnp.sqrt(jnp.maximum(qc, 0.0)) - radii[None, :]   # (P, C)
        visited = jnp.any(jnp.arange(C, dtype=jnp.int32)[None, :]
                          == nb[:, None], axis=0)              # (C,)
        lb_min = jnp.min(jnp.where(visited[None, :], jnp.inf, lb), axis=1)
        enough = jnp.sum(cvalid) >= k
        cert = row_valid & enough & (
            lb_min > d_k + _CERT_TOL * (index.scale + d_k))

        def merge(buf, rows, valid):
            cur = lax.dynamic_slice(
                buf, (start,) + (z,) * (buf.ndim - 1),
                (p_max,) + buf.shape[1:])
            m = valid.reshape((p_max,) + (1,) * (buf.ndim - 1))
            return lax.dynamic_update_slice(
                buf, jnp.where(m, rows, cur),
                (start,) + (z,) * (buf.ndim - 1))

        return (merge(dist_o, kdist, row_valid),
                merge(idx_o, kidx, row_valid),
                merge(cert_o, cert, row_valid)), None

    out, _ = lax.scan(one_cluster, out, cids)
    return out


_query_batch = functools.partial(jax.jit, static_argnums=(3, 4, 5),
                                 donate_argnums=(6,))(_scan_clusters)


@functools.lru_cache(maxsize=8)
def _mesh_batch_fn(mesh, k: int, V: int, p_max: int):
    """Jitted shard_map for the mesh-parallel cluster scan: the index is
    replicated (it is the d-dimensional input embedding plus O(C) tables,
    never a K x N state array), the cluster-id slice is sharded over the
    mesh axis, and each shard scans only its clusters into zero-initialized
    buffers. Rows of distinct clusters are disjoint, so the psum merging
    the shards adds exact zeros everywhere — the merged values are BITWISE
    identical to the single-device scan (the same frame argument as
    ops/partition.py)."""
    from jax.sharding import PartitionSpec as P
    axis = mesh.axis_names[0]

    def shard_fn(Xs, sqs, ids, starts, counts, cent, radii, scale,
                 cids_local, nbrs):
        index = PrunedIndex(Xs, sqs, ids, starts, counts, cent, radii,
                            p_max, scale)
        Np = Xs.shape[0]
        out0 = (jnp.zeros((Np, k), Xs.dtype),
                jnp.zeros((Np, k), jnp.int32),
                jnp.zeros((Np,), bool))
        # The scan body's writes depend on the shard-varying cluster ids,
        # so the (replicated-zero) init carry must be cast to varying for
        # shard_map's manual-axes type check.
        out0 = jax.tree.map(
            lambda a: lax.pcast(a, (axis,), to="varying"), out0)
        d_, i_, c_ = _scan_clusters(index, cids_local, nbrs, k, V, p_max,
                                    out0)
        return (lax.psum(d_, axis), lax.psum(i_, axis),
                lax.psum(c_.astype(jnp.int32), axis))

    return jax.jit(jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(),) * 8 + (P(axis), P()),
        out_specs=(P(), P(), P())))


def pruned_knn(X: jnp.ndarray, n_neighbors: int, visit: int = _DEFAULT_VISIT,
               n_clusters: int | None = None, seed: int = 0,
               index: PrunedIndex | None = None,
               probe_min_cert: float | None = _PROBE_MIN_CERT,
               mesh=None):
    """kNN of every row of X against X, via the pruned index.

    Returns (dist (N, k), idx (N, k), cert (N,) bool) with k = n_neighbors
    + 1 (the self point included, exactly like the brute path before its
    self-drop). `cert[i]` True means row i's top-k is PROVEN equal to the
    global top-k; callers must re-answer uncertified rows with the brute
    path to guarantee exactness.

    probe_min_cert: before the full pass, a spread-out sample of clusters
    is answered and its certification rate measured; below this threshold
    the search RETRIES ONCE with 4x the visit count (the usual reason the
    probe fails on clusterable data is that C has grown past `visit` — at
    858k cells C=2048 puts ~85 sub-clusters inside each natural clump,
    more than visit=32 can cover, so same-clump clusters stay unvisited
    and the triangle-inequality bound cannot fire). If the escalated probe
    also fails, returns None — pruning is not going to pay on this
    geometry (e.g. genuinely high-dimensional inputs, where EVERY exact
    method including the reference's kd-tree degrades to linear scans) and
    the caller should use the brute path directly. None disables probing
    (and with it the escalation: the requested `visit` is used as-is).

    mesh: optional jax.sharding.Mesh (single-process) — the per-cluster
    scan is sharded over the mesh's first axis (the index stays
    replicated); values are BITWISE identical to the single-device scan
    (disjoint rows, psum adds exact zeros — see _mesh_batch_fn).
    """
    N, d = X.shape
    k = n_neighbors + 1
    if index is None:
        index = build_index(X, n_clusters or default_n_clusters(N, k), seed)
    C = index.starts.shape[0]
    V = min(visit, C)
    if k > V * index.p_max:  # cannot even hold k candidates
        raise ValueError(f"k={k} exceeds candidate capacity "
                         f"{V}*{index.p_max}")
    n_dev = 0 if mesh is None else int(mesh.devices.size)
    use_mesh = n_dev > 1 and jax.process_count() == 1
    Np = N + index.p_max
    cb = min(_CLUSTER_BATCH, C)

    def scan_all(V_try: int):
        """Full pass at one visit count; None if the probe batch fails."""
        nbrs = _cluster_neighbors(index.centroids, V_try)
        if use_mesh:
            # Accumulate psum-merged per-dispatch deltas: every cluster is
            # scanned exactly once (sentinel-padded ids), so rows are
            # written exactly once across all dispatches and the adds merge
            # exact zeros elsewhere.
            fn = _mesh_batch_fn(mesh, k, V_try, index.p_max)
            out = (jnp.zeros((Np, k), X.dtype),
                   jnp.zeros((Np, k), jnp.int32),
                   jnp.zeros((Np,), jnp.int32))
            step = cb * n_dev

            def batch(cids_np, out):
                cids = jnp.asarray(np.where(cids_np < C, cids_np, -1),
                                   jnp.int32)
                delta = fn(*index[:7], index.scale, cids, nbrs)
                return tuple(a + b for a, b in zip(out, delta))
        else:
            out = (jnp.zeros((Np, k), X.dtype),
                   jnp.full((Np, k), -1, jnp.int32),
                   jnp.zeros((Np,), bool))
            step = cb

            def batch(cids_np, out):
                cids = jnp.asarray(np.minimum(cids_np, C - 1), jnp.int32)
                return _query_batch(index, cids, nbrs, k, V_try,
                                    index.p_max, out)

        for lo in range(0, C, step):
            out = batch(np.arange(lo, lo + step), out)
            if lo == 0 and probe_min_cert is not None and C > step:
                # The first batch doubles as a certification probe: cluster
                # ids come from iid random centroid init, so the first
                # batch is a random spatial sample. Bailing here skips
                # ~ (C - step) / C of the work on geometries where pruning
                # cannot pay.
                n_cert = float(jnp.sum(out[2]))
                n_probe = float(jnp.sum(index.counts[:step]))
                if n_probe > 0 and n_cert / n_probe < probe_min_cert:
                    return None
        return out

    out = scan_all(V)
    if out is None and 4 * V < C:
        # Escalate once: candidate work is ~4x but still ~4V*p_max/N of the
        # brute force; the wasted probe batch cost ~ cb/C of a base pass.
        # Only when 4V still prunes meaningfully (4V >= C would visit
        # everything — the brute path does that with less overhead, which
        # is exactly what the bail hands back to the caller).
        out = scan_all(4 * V)
    if out is None:
        return None
    dist_s, idx_s, cert_s = out
    if use_mesh:
        cert_s = cert_s.astype(bool)
    # Back to original row order: sorted row j holds query ids[j].
    inv = jnp.zeros((N,), jnp.int32).at[index.ids[:N]].set(
        jnp.arange(N, dtype=jnp.int32))
    return dist_s[inv], idx_s[inv], cert_s[inv]
