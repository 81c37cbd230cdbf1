"""Per-kernel unit tests against the NumPy oracle (SURVEY.md §4 item 5:
the reference has no such tests; the TPU build adds them)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from harmonypy_tpu.config import EngineConfig
from harmonypy_tpu.state import HarmonyParams
from harmonypy_tpu.parallel.mesh import make_mesh, AXIS
from harmonypy_tpu.ops.normalize import l2_normalize_cols, safe_entropy
from harmonypy_tpu.ops.update_r import update_r, compute_scale_dist
from harmonypy_tpu.ops.ridge import moe_correct_ridge
from harmonypy_tpu.ops.objective import compute_objective_terms
from harmonypy_tpu.ops.kmeans import kmeans_init

import oracle


def _problem(N=160, d=6, K=7, B=3, seed=1):
    rng = np.random.default_rng(seed)
    Z = rng.normal(size=(d, N)).astype(np.float32)
    batch = rng.integers(0, B, size=N)
    Phi = (batch[None, :] == np.arange(B)[:, None]).astype(np.float32)
    Pr_b = Phi.sum(axis=1) / N
    dist = (2.0 * rng.random(size=(K, N))).astype(np.float32)
    R = rng.random(size=(K, N)).astype(np.float32)
    R /= R.sum(axis=0, keepdims=True)
    E = np.outer(R.sum(axis=1), Pr_b).astype(np.float32)
    O = (R @ Phi.T).astype(np.float32)
    theta = np.full(B, 2.0, np.float32)
    sigma = np.full(K, 0.1, np.float32)
    lamb = np.concatenate([[0.0], np.ones(B)]).astype(np.float32)
    return dict(Z=Z, Phi=Phi, Pr_b=Pr_b, dist=dist, R=R, E=E, O=O,
                theta=theta, sigma=sigma, lamb=lamb, N=N, d=d, K=K, B=B)


def _cfg(p, n_devices=1, **kw):
    return EngineConfig(N=p["N"], d=p["d"], K=p["K"], B=p["B"],
                        n_devices=n_devices, **kw)


def _params(p):
    return HarmonyParams(theta=jnp.asarray(p["theta"]),
                         sigma=jnp.asarray(p["sigma"]),
                         lamb=jnp.asarray(p["lamb"]),
                         Pr_b=jnp.asarray(p["Pr_b"], jnp.float32))


def _run_sharded(fn, mesh, in_specs, out_specs, *args):
    return jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs))(*args)


def test_l2_normalize_cols_matches_numpy_and_handles_zero():
    X = np.random.default_rng(0).normal(size=(5, 9)).astype(np.float32)
    X[:, 3] = 0.0
    out = np.asarray(l2_normalize_cols(jnp.asarray(X)))
    ref = X / np.where(np.linalg.norm(X, axis=0) > 0,
                       np.linalg.norm(X, axis=0), 1.0)
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    assert np.all(out[:, 3] == 0.0)


def test_safe_entropy():
    x = jnp.asarray([0.0, 0.5, 1.0, 2.0], jnp.float32)
    out = np.asarray(safe_entropy(x))
    np.testing.assert_allclose(out, [0.0, 0.5 * np.log(0.5), 0.0,
                                     2.0 * np.log(2.0)], rtol=1e-6)


def test_objective_matches_oracle():
    p = _problem()
    mesh = make_mesh(n_devices=1)
    cfg = _cfg(p)
    params = _params(p)

    def f(R, dist, O, E, Phi, params):
        return compute_objective_terms(R, dist, O, E, Phi, params, cfg, AXIS)

    s2 = P(None, AXIS)
    ke, ent, cross = _run_sharded(
        f, mesh, (s2, s2, P(), P(), s2, P()), (P(), P(), P()),
        jnp.asarray(p["R"]), jnp.asarray(p["dist"]), jnp.asarray(p["O"]),
        jnp.asarray(p["E"]), jnp.asarray(p["Phi"]), params)
    ref = oracle.objective_terms(p["R"], p["dist"], p["O"], p["E"], p["Phi"],
                                 p["theta"], p["sigma"], p["N"])
    np.testing.assert_allclose([float(ke), float(ent), float(cross)], ref,
                               rtol=2e-5)


@pytest.mark.parametrize("block_size", [0.05, 0.3, 0.45])
def test_update_r_matches_oracle_single_device(block_size):
    p = _problem(N=173)  # deliberately not divisible by blocks
    mesh = make_mesh(n_devices=1)
    cfg = _cfg(p, block_size=block_size)
    params = _params(p)
    key = jax.random.PRNGKey(7)
    mask = jnp.ones((p["N"],), jnp.float32)

    def f(key, R, dist, Phi, E, O, params, mask):
        return update_r(key, R, dist, Phi, E, O, params, cfg, mask, AXIS)

    s2 = P(None, AXIS)
    R2, E2, O2 = _run_sharded(
        f, mesh,
        (P(), s2, s2, s2, P(), P(), P(), P(AXIS)), (s2, P(), P()),
        key, jnp.asarray(p["R"]), jnp.asarray(p["dist"]),
        jnp.asarray(p["Phi"]), jnp.asarray(p["E"]), jnp.asarray(p["O"]),
        params, mask)

    # Same global iid partition the kernel derives internally (sentinel-
    # blocked cells are in no list and keep their R, matching the kernel).
    from harmonypy_tpu.ops.partition import iid_blocks
    from harmonypy_tpu.ops.update_r import cell_partition_len
    nb = cfg.n_blocks
    ba = np.asarray(iid_blocks(key, p["N"], cell_partition_len(cfg), nb))
    block_lists = [np.where(ba[: p["N"]] == b)[0] for b in range(nb)]
    R_ref, E_ref, O_ref = oracle.update_r_blocks(
        p["R"], p["dist"], p["Phi"], p["E"], p["O"],
        p["theta"], p["sigma"], p["Pr_b"], blocks=block_lists)

    np.testing.assert_allclose(np.asarray(R2), R_ref, rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(E2), E_ref, rtol=5e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(O2), O_ref, rtol=5e-4, atol=1e-4)


@pytest.mark.parametrize("lambda_estimation", [False, True])
def test_ridge_matches_oracle(lambda_estimation):
    p = _problem()
    mesh = make_mesh(n_devices=1)
    cfg = _cfg(p, lambda_estimation=lambda_estimation)
    params = _params(p)
    mask = jnp.ones((p["N"],), jnp.float32)

    def f(Z, Phi, R, E, params, mask):
        return moe_correct_ridge(Z, Phi, R, E, params, cfg, mask, AXIS)

    s2 = P(None, AXIS)
    Z2 = _run_sharded(
        f, mesh, (s2, s2, s2, P(), P(), P(AXIS)), s2,
        jnp.asarray(p["Z"]), jnp.asarray(p["Phi"]), jnp.asarray(p["R"]),
        jnp.asarray(p["E"]), params, mask)
    ref = oracle.ridge_correct(p["Z"], p["Phi"], p["R"], p["E"],
                               p["lamb"], 0.2, lambda_estimation)
    np.testing.assert_allclose(np.asarray(Z2), ref, rtol=2e-4, atol=2e-4)


def test_update_r_multidevice_consistent_stats():
    """On 8 devices: O/E stay consistent with R and Phi after the update."""
    p = _problem(N=320)
    mesh = make_mesh(n_devices=8)
    cfg = _cfg(p, n_devices=8)
    params = _params(p)
    key = jax.random.PRNGKey(3)
    mask = jnp.ones((p["N"],), jnp.float32)

    def f(key, R, dist, Phi, E, O, params, mask):
        return update_r(key, R, dist, Phi, E, O, params, cfg, mask, AXIS)

    s2 = P(None, AXIS)
    R2, E2, O2 = _run_sharded(
        f, mesh, (P(), s2, s2, s2, P(), P(), P(), P(AXIS)), (s2, P(), P()),
        key, jnp.asarray(p["R"]), jnp.asarray(p["dist"]),
        jnp.asarray(p["Phi"]), jnp.asarray(p["E"]), jnp.asarray(p["O"]),
        params, mask)
    R2, E2, O2 = map(np.asarray, (R2, E2, O2))
    # Invariants: columns sum to 1; O == R Phi^T; E == outer(R1, Pr_b).
    np.testing.assert_allclose(R2.sum(axis=0), 1.0, rtol=1e-4)
    np.testing.assert_allclose(O2, R2 @ p["Phi"].T, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(E2, np.outer(R2.sum(axis=1), p["Pr_b"]),
                               rtol=1e-3, atol=1e-3)


def test_kmeans_init_quality():
    """k-means++ + Lloyd should achieve inertia comparable to sklearn."""
    pytest.importorskip("sklearn")
    from sklearn.cluster import KMeans
    rng = np.random.default_rng(0)
    X = rng.normal(size=(400, 5)).astype(np.float32)
    X[:100] += 4.0
    X[100:200] -= 4.0
    Xn = (X / np.linalg.norm(X, axis=1, keepdims=True)).astype(np.float32)
    K = 8
    mesh = make_mesh(n_devices=8)
    cfg = EngineConfig(N=400, d=5, K=K, B=2, n_devices=8)

    def f(key, Z):
        return kmeans_init(key, Z, cfg, AXIS)

    C = _run_sharded(
        f, mesh, (P(), P(None, AXIS)), P(),
        jax.random.PRNGKey(0), jnp.asarray(Xn.T))
    C = np.asarray(C)
    d2 = ((Xn[:, None, :] - C.T[None, :, :]) ** 2).sum(-1)
    ours = d2.min(axis=1).sum()

    sk = KMeans(n_clusters=K, init="k-means++", n_init=1, max_iter=25,
                random_state=0).fit(Xn)
    theirs = sk.inertia_
    assert ours <= theirs * 1.15, (ours, theirs)


def test_kmeansbb_seeding_quality():
    """k-means|| seeding (large-N path) reaches the same correction quality
    as sequential greedy k-means++ on the same problem."""
    import pandas as pd
    import harmonypy_tpu as hm
    import harmonypy_tpu.api as api
    from harmonypy_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    N, d, B = 6000, 10, 3
    centers = rng.normal(size=(6, d)) * 4
    g = rng.integers(0, 6, N)
    b = rng.integers(0, B, N)
    shifts = rng.normal(size=(B, d)) * 2
    X = (centers[g] + shifts[b] + rng.normal(size=(N, d))).astype(np.float32)
    meta = pd.DataFrame({"batch": [f"b{i}" for i in b]})
    mesh = make_mesh(n_devices=4)

    def run(sample_cap):
        orig = api.EngineConfig
        api.EngineConfig = lambda **kw: orig(**kw, kmeanspp_sample=sample_cap)
        try:
            return hm.run_harmony(X, meta, ["batch"], mesh=mesh,
                                  verbose=False, nclust=20)
        finally:
            api.EngineConfig = orig

    ho_seq = run(10**9)     # sequential k-means++ on all cells
    ho_bb = run(2048)       # k-means|| on a 2048-cell subsample
    l_seq = hm.compute_lisi(ho_seq.Z_corr, meta, ["batch"]).mean()
    l_bb = hm.compute_lisi(ho_bb.Z_corr, meta, ["batch"]).mean()
    assert abs(l_seq - l_bb) < 0.15, (l_seq, l_bb)
    assert ho_bb.objective_harmony[-1] < ho_bb.objective_harmony[0]
    corr = np.corrcoef(ho_seq.Z_corr.ravel(), ho_bb.Z_corr.ravel())[0, 1]
    assert corr > 0.98, corr


@pytest.mark.slow
def test_kmeansbb_quality_at_production_scale_ratio():
    """Init quality at the REAL subsample ratio production uses
    (858k cells / 131k cap ~ 6.5x, VERDICT r2 #7): k-means|| on the capped
    invariant subsample must reach the same objective as sequential greedy
    k-means++ on all cells, both at init and after one harmony iteration."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    from harmonypy_tpu.config import EngineConfig
    from harmonypy_tpu.engine import get_engine
    from harmonypy_tpu.state import HarmonyData, HarmonyParams
    from harmonypy_tpu.parallel.mesh import make_mesh

    N, d, B, K = 851_968, 8, 3, 100
    mesh = make_mesh(n_devices=1)
    base = EngineConfig(N=N, d=d, K=K, B=B, n_devices=1, use_fused_xla=True,
                        max_iter_harmony=1, max_iter_kmeans=8)

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(24, d)).astype(np.float32) * 5.0
    g = rng.integers(0, 24, size=base.N_pad)
    b = rng.integers(0, B, size=base.N_pad)
    shifts = rng.normal(size=(B, d)).astype(np.float32) * 1.5
    mask_np = (np.arange(base.N_pad) < N).astype(np.float32)
    Z = ((centers[g] + shifts[b]
          + rng.normal(size=(base.N_pad, d)).astype(np.float32)).T
         * mask_np[None, :])
    Phi = ((b[None, :] == np.arange(B)[:, None]).astype(np.float32)
           * mask_np[None, :])
    data = HarmonyData(Z_orig=jnp.asarray(Z), Phi=jnp.asarray(Phi),
                       mask=jnp.asarray(mask_np))
    params = HarmonyParams(
        theta=jnp.full((B,), 2.0, jnp.float32),
        sigma=jnp.full((K,), 0.1, jnp.float32),
        lamb=jnp.asarray([0.0] + [1.0] * B, jnp.float32),
        Pr_b=jnp.asarray(Phi.sum(axis=1) / N, jnp.float32))

    def objectives(sample_cap):
        cfg = dataclasses.replace(base, kmeanspp_sample=sample_cap)
        eng = get_engine(cfg, mesh)
        st = eng.init_fn(data, params, jax.random.PRNGKey(0))
        obj0 = float(st.obj_kmeans[0])
        st = eng.iter_fn(st, data, params)
        n = int(st.n_kmeans)
        return obj0, float(st.obj_kmeans[n - 1])

    o0_full, o1_full = objectives(10 ** 9)   # greedy k-means++ on ALL cells
    o0_sub, o1_sub = objectives(131_072)     # production subsample ratio
    # Init objective within 2% of the all-cells seeding, and after one
    # harmony iteration the gap must be within 1%.
    assert o0_sub < o0_full * 1.02, (o0_sub, o0_full)
    assert o1_sub < o1_full * 1.01, (o1_sub, o1_full)


def test_kmeansbb_exact_topk_variant_matches():
    """The exact-top-k seeding variant (bench.py seeding-quality gate,
    ADVICE r3) is wired correctly: on CPU lax.approx_max_k lowers to an
    exact sort, so both selections pick the same candidates and the
    post-Lloyd potentials must agree to float noise. (The gate's real
    content — the PartialReduce operator's effect — is measured on TPU by
    bench._seeding_gate.)"""
    import jax
    import jax.numpy as jnp
    from harmonypy_tpu.config import EngineConfig
    from harmonypy_tpu.ops.kmeans import _kmeansbb_seed, _lloyd, _sq_norms

    S, d, K = 4096, 8, 16
    cfg = EngineConfig(N=S, d=d, K=K, B=3, n_devices=1)
    rng = np.random.default_rng(0)
    centers = (rng.standard_normal((d, K)) * 2.0).astype(np.float32)
    X = jnp.asarray(centers[:, rng.integers(0, K, S)]
                    + rng.standard_normal((d, S)).astype(np.float32))

    def potential(exact):
        C = _lloyd(_kmeansbb_seed(jax.random.PRNGKey(0), X, cfg,
                                  exact_topk=exact), X, cfg)
        sc = _sq_norms(C)[:, None] - 2.0 * (C.T @ X)
        return float(jnp.mean(jnp.min(sc, axis=0) + _sq_norms(X)))

    p_a, p_e = potential(False), potential(True)
    assert abs(p_a - p_e) <= 0.01 * p_e, (p_a, p_e)


def test_factorized_entropy_matches_elementwise():
    """The fused paths' log-free entropy partials
    (ops/objective.chunk_objective_partials_fast, single-covariate designs)
    equal the generic elementwise sigma * r * log(r) form up to fp32
    reassociation — on r produced by the REAL _block_core, including dummy
    chunks / padded cells (all-zero columns contribute exactly zero)."""
    import jax
    import jax.numpy as jnp
    from harmonypy_tpu.config import EngineConfig
    from harmonypy_tpu.ops.normalize import safe_entropy
    from harmonypy_tpu.ops.objective import (
        chunk_objective_partials, chunk_objective_partials_fast)
    from harmonypy_tpu.ops.update_r_fused_xla import (_block_core,
                                                      _block_stats)

    rng = np.random.default_rng(5)
    Js, CH, d, K, B = 3, 128, 6, 11, 3
    cfg = EngineConfig(N=Js * CH, d=d, K=K, B=B, n_devices=1,
                       use_fused_xla=True, chunk_size=CH)
    mask = np.ones((Js, CH), np.float32)
    mask[-1] = 0.0                       # one all-dummy chunk
    mask[0, 100:] = 0.0                  # padded tail inside a real chunk
    Z = rng.normal(size=(Js, d, CH)).astype(np.float32) * mask[:, None, :]
    Z /= np.maximum(np.linalg.norm(Z, axis=1, keepdims=True), 1e-6)
    codes = rng.integers(0, B, size=(Js, CH))
    Phi = ((codes[:, None, :] == np.arange(B)[None, :, None])
           .astype(np.float32) * mask[:, None, :])
    ZP3 = jnp.asarray(np.concatenate([mask[:, None, :], Phi, Z], axis=1))
    Y = rng.normal(size=(d, K)).astype(np.float32)
    Y /= np.linalg.norm(Y, axis=0)
    sigma = jnp.full((K,), 0.1, jnp.float32)
    theta = jnp.full((B,), 2.0, jnp.float32)
    Pr_b = jnp.full((B,), 1.0 / B, jnp.float32)
    O = jnp.asarray(np.abs(rng.normal(size=(K, B))).astype(np.float32) + 0.1)
    E = jnp.asarray(np.abs(rng.normal(size=(K, B))).astype(np.float32) + 0.1)
    rem = jnp.zeros((K, B + 1), jnp.float32)
    slots = jnp.arange(Js, dtype=jnp.int32)

    _, _, r, g, pb, dist, logratio, logdd = _block_core(
        O, E, rem, slots, ZP3, Y, sigma, theta, Pr_b)
    stats, _ = _block_stats(r, g, B + 1)
    kerr_f, ent_f = chunk_objective_partials_fast(
        r, dist, stats[:, :, 1:], sigma, theta, logratio, logdd)
    kerr_g, ent_g = chunk_objective_partials(r, dist, sigma, k_axis=1,
                                             chunk_axis=0)
    np.testing.assert_allclose(np.asarray(kerr_f), np.asarray(kerr_g))
    np.testing.assert_allclose(np.asarray(ent_f), np.asarray(ent_g),
                               rtol=2e-4, atol=2e-4)
    # dummy chunk contributes exactly zero in both forms
    assert float(ent_f[-1]) == 0.0 and float(ent_g[-1]) == 0.0
