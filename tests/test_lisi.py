"""LISI golden test (reference tests/test_lisi.py:5-17): exact match against
the R LISI package's output on the bundled 400-cell fixture."""

import numpy as np
import pandas as pd

import harmonypy_tpu as hm


def test_lisi_golden(ref_data_dir):
    X = pd.read_csv(f"{ref_data_dir}/lisi_x.tsv.gz", sep="\t")
    metadata = pd.read_csv(f"{ref_data_dir}/lisi_metadata.tsv.gz", sep="\t")
    lisi = hm.compute_lisi(X, metadata, metadata.columns, 30)

    lisi_ref = pd.read_csv(f"{ref_data_dir}/lisi_lisi.tsv.gz", sep="\t")
    lisi_ref = lisi_ref.iloc[:, -2:].to_numpy()
    assert np.allclose(lisi, lisi_ref), (
        np.abs(lisi - lisi_ref).max())


def test_lisi_bounds():
    """LISI is within [1, n_categories] for well-defined inputs."""
    rng = np.random.default_rng(0)
    X = rng.normal(size=(300, 4))
    meta = pd.DataFrame({"b": rng.choice(["x", "y", "z"], size=300)})
    lisi = hm.compute_lisi(X, meta, ["b"], perplexity=20)
    assert lisi.shape == (300, 1)
    assert np.all(lisi >= 1.0 - 1e-6)
    assert np.all(lisi <= 3.0 + 1e-6)


def test_lisi_separated_batches():
    """Perfectly separated batches -> LISI ~= 1; mixed -> ~= 2."""
    rng = np.random.default_rng(1)
    n = 200
    X_sep = np.concatenate([rng.normal(size=(n, 2)),
                            rng.normal(size=(n, 2)) + 100.0])
    X_mix = rng.normal(size=(2 * n, 2))
    meta = pd.DataFrame({"b": ["a"] * n + ["b"] * n})
    lisi_sep = hm.compute_lisi(X_sep, meta, ["b"])
    assert np.all(lisi_sep < 1.1)
    rng.shuffle(X_mix)
    lisi_mix = hm.compute_lisi(X_mix, meta, ["b"])
    assert lisi_mix.mean() > 1.8


def test_lisi_sampled_matches_full():
    """Sampled-query LISI values equal the corresponding rows of the full
    computation (neighbors always come from all cells)."""
    rng = np.random.default_rng(2)
    X = rng.normal(size=(500, 5))
    meta = pd.DataFrame({"b": rng.choice(["x", "y"], size=500)})
    full = hm.compute_lisi(X, meta, ["b"], perplexity=15)
    sampled, idx = hm.compute_lisi(X, meta, ["b"], perplexity=15,
                                   sample=120, random_state=7)
    assert sampled.shape == (120, 1) and idx.shape == (120,)
    np.testing.assert_allclose(sampled, full[idx], rtol=1e-6, atol=1e-8)
    # sample >= N still returns the stable (values, indices) pair
    out, idx_all = hm.compute_lisi(X, meta, ["b"], perplexity=15, sample=500)
    np.testing.assert_allclose(out, full)
    np.testing.assert_array_equal(idx_all, np.arange(500))


def test_lisi_sharded_matches_single_device():
    """mesh-sharded LISI (queries sharded, reference set replicated — zero
    collectives) is bitwise identical to the single-device computation,
    including at an N not divisible by the device count."""
    from harmonypy_tpu.parallel.mesh import make_mesh
    rng = np.random.default_rng(2)
    X = rng.normal(size=(403, 6)).astype(np.float32)
    meta = pd.DataFrame({"b": rng.choice(["x", "y", "z"], size=403),
                         "c": rng.choice(["u", "v"], size=403)})
    l1 = hm.compute_lisi(X, meta, ["b", "c"])
    l8 = hm.compute_lisi(X, meta, ["b", "c"], mesh=make_mesh(n_devices=8))
    np.testing.assert_array_equal(l1, l8)

    # sample= composes with mesh=
    v8, idx8 = hm.compute_lisi(X, meta, ["b"], sample=101,
                               mesh=make_mesh(n_devices=8))
    v1, idx1 = hm.compute_lisi(X, meta, ["b"], sample=101)
    np.testing.assert_array_equal(idx1, idx8)
    np.testing.assert_array_equal(v1, v8)

    # knn="approx" composes with mesh= (same flag threading, sharded)
    a8 = hm.compute_lisi(X, meta, ["b"], mesh=make_mesh(n_devices=8),
                         knn="approx")
    a1 = hm.compute_lisi(X, meta, ["b"], knn="approx")
    np.testing.assert_array_equal(a1, a8)


def test_lisi_tiled_knn_matches_single_tile(monkeypatch):
    """The two-stage tiled kNN (reference set scanned in tiles, per-tile
    top-k then a merge top-k) is exact: same values as the one-slab path,
    including with a partial final tile."""
    import harmonypy_tpu.lisi as lisi_mod
    rng = np.random.default_rng(3)
    X = rng.normal(size=(530, 5)).astype(np.float32)
    meta = pd.DataFrame({"b": rng.choice(["x", "y", "z"], size=530)})
    full = hm.compute_lisi(X, meta, ["b"])
    monkeypatch.setattr(lisi_mod, "_KNN_TILE", 128)  # forces 5 tiles (last partial)
    lisi_mod._knn.clear_cache()
    tiled = hm.compute_lisi(X, meta, ["b"])
    lisi_mod._knn.clear_cache()
    np.testing.assert_allclose(tiled, full, rtol=1e-5, atol=1e-6)


def test_lisi_query_batching_matches_one_shot(monkeypatch):
    """Host-level query batching (bounded per-dispatch runtime at scale)
    returns exactly the one-shot values, including the padded last batch."""
    import harmonypy_tpu.lisi as lisi_mod
    rng = np.random.default_rng(4)
    X = rng.normal(size=(333, 4)).astype(np.float32)
    meta = pd.DataFrame({"b": rng.choice(["x", "y"], size=333)})
    full = hm.compute_lisi(X, meta, ["b"])
    monkeypatch.setattr(lisi_mod, "_KNN_BATCH", 100)
    batched = hm.compute_lisi(X, meta, ["b"])
    np.testing.assert_array_equal(batched, full)


def _blobby(rng, n, d, n_clumps=10, spread=6.0):
    centers = rng.normal(size=(n_clumps, d)) * spread
    return (centers[rng.integers(0, n_clumps, n)]
            + rng.normal(size=(n, d))).astype(np.float32)


def _assert_same_distances(pd_, bd_, X):
    """Pruned and brute kNN distances agree up to each path's own fp32
    rounding: the GEMM expansion's absolute error lives on the SQUARED
    distances at the scale of eps times the squared data radius (both
    paths center first), so that's the comparison that is meaningful —
    relative agreement of tiny distances is not achievable in fp32 by
    either path (nor by the reference's float64 kd-tree read back as
    float32)."""
    R2 = float(np.max(np.sum((X - X.mean(0)) ** 2, axis=1)))
    tol = 1e-4 * R2
    np.testing.assert_allclose(np.asarray(pd_) ** 2, np.asarray(bd_) ** 2,
                               rtol=0, atol=tol)


def test_pruned_knn_exact_vs_brute():
    """The cluster-pruned sub-quadratic kNN returns the same neighbor sets
    as the brute force — certified rows by the triangle-inequality proof,
    the rest via the brute fallback — so LISI values agree to fp32
    rounding."""
    import jax.numpy as jnp
    from harmonypy_tpu.lisi import _knn_batched, _knn_pruned
    rng = np.random.default_rng(6)
    X = _blobby(rng, 4000, 2)
    meta = pd.DataFrame({"b": rng.choice(["x", "y"], size=4000)})

    lb = hm.compute_lisi(X, meta, ["b"], knn="brute")
    lp = hm.compute_lisi(X, meta, ["b"], knn="pruned")
    np.testing.assert_allclose(lp, lb, rtol=1e-4, atol=1e-4)

    # Internals: a healthy certification rate on clumpy low-d data, and
    # bitwise-equal neighbor ids wherever distances are not near-tied.
    from harmonypy_tpu.ops.knn_pruned import (build_index,
                                              default_n_clusters, pruned_knn)
    Xd = jnp.asarray(X)
    qid = jnp.arange(4000, dtype=jnp.int32)
    index = build_index(Xd, default_n_clusters(4000, 90))
    dist, idx, cert = pruned_knn(Xd, 89, index=index, probe_min_cert=None)
    assert float(np.mean(np.asarray(cert))) > 0.8
    pd_, pi_ = _knn_pruned(Xd, 89, qid)
    bd_, bi_ = _knn_batched(Xd, Xd, 89, None, qid=qid)
    _assert_same_distances(pd_, bd_, X)
    same = np.mean(np.asarray(pi_) == np.asarray(bi_))
    assert same > 0.999, same  # only near-tied boundary entries may differ


def test_knn_uncentered_data_stays_exact():
    """Regression: both kNN paths center internally, so an embedding far
    from the origin (where the fp32 error of the ||q||^2+||x||^2-2qx GEMM
    expansion, which scales with the squared norms, would otherwise drown
    the neighbor ranks) still returns float64-true neighbor sets."""
    import jax.numpy as jnp
    from harmonypy_tpu.lisi import _knn_batched, _knn_pruned
    rng = np.random.default_rng(12)
    X = _blobby(rng, 2000, 8) + 1024.0
    Xd = jnp.asarray(X)
    qid = jnp.arange(2000, dtype=jnp.int32)
    pd_, pi_ = _knn_pruned(Xd, 29, qid)
    bd_, bi_ = _knn_batched(Xd, Xd, 29, None, qid=qid)

    m = 200  # float64 truth on a slice
    X64 = X.astype(np.float64)
    d2 = ((X64[:m, None, :] - X64[None, :, :]) ** 2).sum(-1)
    d2[np.arange(m), np.arange(m)] = np.inf
    order = np.argsort(d2, axis=1)[:, :29]
    for name, ids in (("pruned", pi_), ("brute", bi_)):
        match = np.mean(np.asarray(ids)[:m] == order)
        assert match > 0.995, (name, match)  # only fp32 ties may differ


def test_pruned_knn_fallback_covers_uncertified():
    """Rows the certificate cannot prove exact are re-answered brute-force:
    with a mid-certification geometry the combined result still equals the
    brute values everywhere."""
    import jax.numpy as jnp
    from harmonypy_tpu.lisi import _knn_batched, _knn_pruned
    from harmonypy_tpu.ops.knn_pruned import (build_index,
                                              default_n_clusters, pruned_knn)
    rng = np.random.default_rng(7)
    X = _blobby(rng, 3000, 6, n_clumps=8, spread=3.0)
    Xd = jnp.asarray(X)
    # visit=2 starves the candidate set so some queries cannot be certified.
    index = build_index(Xd, default_n_clusters(3000, 46))
    _, _, cert = pruned_knn(Xd, 45, visit=2, index=index,
                            probe_min_cert=None)
    frac = float(np.mean(np.asarray(cert)))
    assert frac < 1.0, "geometry certified fully; fallback not exercised"
    qid = jnp.arange(3000, dtype=jnp.int32)
    pd_, _ = _knn_pruned(Xd, 45, qid, visit=2)
    bd_, _ = _knn_batched(Xd, Xd, 45, None, qid=qid)
    _assert_same_distances(pd_, bd_, X)


def test_pruned_probe_bails_on_high_dim(monkeypatch):
    """On genuinely high-dimensional data the probe batch certifies almost
    nothing and the pruned path bows out (None) — compute_lisi silently
    uses the brute force (exact either way)."""
    import harmonypy_tpu.ops.knn_pruned as kp
    import jax.numpy as jnp
    from harmonypy_tpu.lisi import _knn_pruned
    rng = np.random.default_rng(8)
    X = rng.uniform(size=(4000, 32)).astype(np.float32)
    monkeypatch.setattr(kp, "_CLUSTER_BATCH", 8)  # C > batch => probe runs
    res = _knn_pruned(jnp.asarray(X), 14, jnp.arange(4000, dtype=jnp.int32))
    assert res is None
    meta = pd.DataFrame({"b": rng.choice(["x", "y"], size=4000)})
    lb = hm.compute_lisi(X, meta, ["b"], perplexity=5, knn="brute")
    lp = hm.compute_lisi(X, meta, ["b"], perplexity=5, knn="pruned")
    np.testing.assert_allclose(lp, lb, rtol=1e-5, atol=1e-5)


def test_pruned_auto_dispatch_and_sample(monkeypatch):
    """knn='exact' auto-selects pruning above _PRUNED_MIN_N for full-N
    single-device queries (same values as brute), and forced pruned mode
    composes with sample= (rows subset after the full-N search)."""
    import harmonypy_tpu.lisi as lisi_mod
    rng = np.random.default_rng(9)
    X = _blobby(rng, 2500, 2)
    meta = pd.DataFrame({"b": rng.choice(["x", "y", "z"], size=2500)})
    brute = hm.compute_lisi(X, meta, ["b"], knn="brute")
    monkeypatch.setattr(lisi_mod, "_PRUNED_MIN_N", 1000)
    auto = hm.compute_lisi(X, meta, ["b"])           # default knn="exact"
    np.testing.assert_allclose(auto, brute, rtol=1e-4, atol=1e-4)

    sampled, idx = hm.compute_lisi(X, meta, ["b"], knn="pruned",
                                   sample=300, random_state=3)
    np.testing.assert_allclose(sampled, brute[idx], rtol=1e-4, atol=1e-4)


def test_lisi_approx_close_to_exact():
    """knn='approx' (TPU hardware approximate top-k; exact fallback sort on
    CPU) stays within a small tolerance of the exact values, and rejects
    unknown modes."""
    import pytest
    rng = np.random.default_rng(5)
    X = rng.normal(size=(500, 6)).astype(np.float32)
    meta = pd.DataFrame({"b": rng.choice(["x", "y", "z"], size=500)})
    exact = hm.compute_lisi(X, meta, ["b"])
    approx = hm.compute_lisi(X, meta, ["b"], knn="approx")
    # per-cell LISI in [1, 3]; a 95%-recall neighbor set moves it only a little
    assert np.mean(np.abs(exact - approx)) < 0.05
    assert np.max(np.abs(exact - approx)) < 0.5
    with pytest.raises(ValueError, match="approx"):
        hm.compute_lisi(X, meta, ["b"], knn="fancy")
    # recall-target knob: 1.0 must reproduce the exact values on the CPU
    # fallback (exact sort), and out-of-range targets are rejected.
    full = hm.compute_lisi(X, meta, ["b"], knn="approx",
                           knn_recall_target=1.0)
    assert np.mean(np.abs(exact - full)) < 0.05
    with pytest.raises(ValueError, match="knn_recall_target"):
        hm.compute_lisi(X, meta, ["b"], knn="approx", knn_recall_target=0.0)


def test_pruned_knn_mesh_sharded_bitwise():
    """The mesh-parallel pruned scan (clusters sharded over the mesh,
    disjoint-row psum merge) returns BITWISE the same (dist, idx, cert) as
    the single-device scan — the sharding only changes which device answers
    which cluster, never the per-cluster math (ops/knn_pruned
    ._mesh_batch_fn)."""
    import jax.numpy as jnp
    from harmonypy_tpu.parallel.mesh import make_mesh
    from harmonypy_tpu.ops.knn_pruned import (build_index,
                                              default_n_clusters, pruned_knn)
    rng = np.random.default_rng(7)
    X = _blobby(rng, 4000, 2)
    Xd = jnp.asarray(X)
    index = build_index(Xd, default_n_clusters(4000, 30))
    d1, i1, c1 = pruned_knn(Xd, 29, index=index, probe_min_cert=None)
    d8, i8, c8 = pruned_knn(Xd, 29, index=index, probe_min_cert=None,
                            mesh=make_mesh(n_devices=8))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d8))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i8))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c8))


def test_pruned_index_balance_split():
    """Oversized clusters are split at build time (the static p_max shapes
    every per-cluster query step; the TopK kernel over (p_max, V*p_max) is
    ~94% of the search — docs/hardware_r5). One dominant clump forces the
    device Lloyd build into a size outlier; the balanced index must cap
    p_max near the mean and stay EXACT vs brute."""
    import jax.numpy as jnp
    from harmonypy_tpu.lisi import _knn_batched, _knn_pruned
    from harmonypy_tpu.ops.knn_pruned import (_BALANCE_FACTOR,
                                              _BALANCE_MIN_CAP, build_index,
                                              default_n_clusters)
    rng = np.random.default_rng(9)
    n = 6000
    # 70% of points in ONE tight clump: iid centroid init + Lloyd leaves a
    # big cluster there unless the build splits it.
    clump = rng.standard_normal((int(n * 0.7), 4)) * 0.3
    rest = _blobby(rng, n - clump.shape[0], 4, n_clumps=6)
    X = np.concatenate([clump, rest]).astype(np.float32)
    Xd = jnp.asarray(X)

    C = default_n_clusters(n, 31)
    raw = build_index(Xd, C, balance=False)
    cap = max(_BALANCE_MIN_CAP, int(np.ceil(_BALANCE_FACTOR * n / C)))
    assert raw.p_max > cap, "geometry did not produce an oversized cluster"
    bal = build_index(Xd, C)
    assert bal.p_max <= cap
    counts = np.asarray(bal.counts)
    assert int(counts.sum()) == n                 # a partition, nothing lost
    assert np.array_equal(np.sort(np.asarray(bal.ids[:n])), np.arange(n))

    qid = jnp.arange(n, dtype=jnp.int32)
    pd_, _ = _knn_pruned(Xd, 30, qid)
    bd_, _ = _knn_batched(Xd, Xd, 30, None, qid=qid)
    _assert_same_distances(pd_, bd_, X)
