"""Fused XLA E-step (ops/update_r_fused_xla.py): equivalence with the Pallas
kernel on one device, global-stat exactness on an 8-device mesh, and the
end-to-end multi-device engine path."""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

import harmonypy_tpu as hm
from harmonypy_tpu.config import EngineConfig, fused_geometry_ok
from harmonypy_tpu.engine import get_engine, AXIS
from harmonypy_tpu.ops.pallas.update_r_fused import (
    chunk_stats, fused_update_r, pallas_geometry)
from harmonypy_tpu.ops.partition import (
    partition_geometry, removal_from_cache, single_device_tables)
from harmonypy_tpu.ops.update_r_fused_xla import fused_update_r_xla
from harmonypy_tpu.parallel.mesh import make_mesh
from harmonypy_tpu.parallel.sharding import shard_inputs
from harmonypy_tpu.state import HarmonyParams

from test_pallas import _chunk_problem


def test_fused_xla_matches_pallas_kernel():
    """Identical inputs + slot table => identical semantics (up to GEMM
    reduction order) between the two fused implementations."""
    cfg, p = _chunk_problem(block_size=0.25)
    cfg = EngineConfig(**{**cfg.__dict__, "use_pallas": False,
                          "use_fused_xla": True})
    pgeom = partition_geometry(cfg)
    slots, granks, gtbl = single_device_tables(jax.random.PRNGKey(3), cfg)
    cache = chunk_stats(jnp.asarray(p["R"]), jnp.asarray(p["Phi"]), cfg)
    removal = removal_from_cache(cache[: pgeom.nc_cap], gtbl, pgeom)
    args = (jnp.asarray(p["Zc"]), jnp.asarray(p["Phi"]), jnp.asarray(p["Y"]),
            jnp.asarray(p["sigma"]), jnp.asarray(p["theta"]),
            jnp.asarray(p["Pr_b"]), jnp.asarray(p["O"]), jnp.asarray(p["E"]))

    R_p, O_p, E_p, c_p, yb_p, kb_p = fused_update_r(
        slots.reshape(-1), removal, args[0], args[1], None, *args[2:], cfg,
        interpret=True)
    Ys_p = np.asarray(yb_p)[: pgeom.nc_cap].sum(0).T
    ke_p, en_p = np.asarray(kb_p)[: pgeom.nc_cap].sum(0)

    mesh = make_mesh(n_devices=1)
    fx = jax.jit(jax.shard_map(
        lambda *a: fused_update_r_xla(*a, cfg, AXIS),
        mesh=mesh,
        in_specs=(P(),) * 3 + (P(None, AXIS), P(None, AXIS)) + (P(),) * 6,
        out_specs=(P(None, AXIS), P(), P(), P(), P(AXIS), P(), P()),
        check_vma=False))
    R_x, O_x, E_x, Ys_x, c_x, ke_x, en_x = fx(slots, granks, removal, *args)

    np.testing.assert_allclose(np.asarray(R_x), np.asarray(R_p), atol=2e-5)
    np.testing.assert_allclose(np.asarray(O_x), np.asarray(O_p),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(E_x), np.asarray(E_p),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(Ys_x), np.asarray(Ys_p),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(c_x), np.asarray(c_p),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(float(ke_x), float(ke_p), rtol=1e-4)
    np.testing.assert_allclose(float(en_x), float(en_p), rtol=1e-4)


def _synthetic(N, d=8, B=3, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(6, d)) * 4
    g = rng.integers(0, 6, N)
    b = rng.integers(0, B, N)
    shifts = rng.normal(size=(B, d)) * 2
    X = (centers[g] + shifts[b] + rng.normal(size=(N, d))).astype(np.float32)
    meta = pd.DataFrame({"batch": [f"b{i}" for i in b]})
    return X, meta


@pytest.fixture(scope="module")
def fused21k_fit8():
    """One 21k-cell, 8-device fused-XLA fit (nclust=12, chunk 128, 2 harmony
    iters) shared by the assertion-only tests below (suite wall-clock)."""
    X, meta = _synthetic(21_000, 8, 3)
    assert fused_geometry_ok(21_000, 8, 0.05, 128)
    ho = hm.run_harmony(X, meta, ["batch"], mesh=make_mesh(n_devices=8),
                        verbose=False, nclust=12, chunk_size=128,
                        max_iter_harmony=2)
    return X, meta, ho


def test_fused_xla_multidevice_global_stats_exact(fused21k_fit8):
    """On an 8-device mesh the replicated O/E must track R exactly through
    the sequential per-block psums: O == R Phi^T and E == outer(sum R, Pr_b)
    recomputed from the final sharded R."""
    _, _, ho = fused21k_fit8
    assert ho.cfg.use_fused_xla and not ho.cfg.use_pallas
    R = ho.R.T                                   # (K, N)
    Phi = ho.Phi.T                               # (B, N)
    np.testing.assert_allclose(ho.O, R @ Phi.T, rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(
        ho.E, np.outer(R.sum(axis=1), ho.Pr_b), rtol=2e-3, atol=2e-2)
    obj = ho.objective_harmony
    assert obj[-1] < obj[0]


def test_fused_xla_device_count_invariance_bitwise():
    """THE north-star contract (BASELINE.json; reference same-seed contract at
    tests/test_harmony.py:50-57 extended across mesh sizes): the fused XLA
    path produces BIT-IDENTICAL results on 1, 2, 4 and 8 devices — the block
    partition is a function of (seed, N) only and every cross-cell reduction
    goes through the fixed global frame (ops/partition.py)."""
    N = 21_000
    X, meta = _synthetic(N)
    out, hist = {}, {}
    # 3 harmony iters: bitwise equality is a per-step property (the same
    # program loops), so a truncated run covers init, >window k-means
    # rounds, ridge, and both convergence checks at a quarter of the cost
    # (the reference's own seed test truncates the same way,
    # tests/test_harmony.py:44-45).
    for nd in (1, 2, 4, 8):
        ho = hm.run_harmony(X, meta, ["batch"], mesh=make_mesh(n_devices=nd),
                            verbose=False, nclust=12, chunk_size=128,
                            max_iter_harmony=3, use_pallas=False)
        assert ho.cfg.use_fused_xla
        out[nd] = ho.Z_corr
        hist[nd] = (ho.objective_harmony, ho.objective_kmeans,
                    ho.kmeans_rounds)
    for nd in (2, 4, 8):
        np.testing.assert_array_equal(out[1], out[nd])
        assert hist[1] == hist[nd], (hist[1], hist[nd])


def test_per_cell_path_device_count_invariant_partition():
    """The per-cell fallback's iid block partition is global (a function of
    (seed, N) only — ops/partition.py iid_blocks), so across mesh sizes it
    differs only by float32 psum reduction order (its per-block O/E deltas
    reduce shard partials) — tight tolerance, not bitwise."""
    N = 3_001
    X, meta = _synthetic(N)
    out = {}
    for nd in (1, 8):
        ho = hm.run_harmony(X, meta, ["batch"], mesh=make_mesh(n_devices=nd),
                            verbose=False, nclust=12, max_iter_harmony=3,
                            chunk_size=4096)     # geometry off -> per-cell
        assert not ho.cfg.fused_estep
        out[nd] = ho.Z_corr
    scale = float(np.max(np.abs(out[1])))
    np.testing.assert_allclose(out[1], out[8], atol=5e-4 * scale)


def test_fused_xla_seed_reproducible():
    N = 21_000
    X, meta = _synthetic(N, seed=5)
    mesh = make_mesh(n_devices=8)

    def run(seed):
        return hm.run_harmony(X, meta, ["batch"], mesh=mesh, verbose=False,
                              nclust=12, chunk_size=128, max_iter_harmony=2,
                              random_state=seed).Z_corr

    np.testing.assert_array_equal(run(11), run(11))
    assert np.abs(run(11) - run(12)).sum() > 1.0


def test_low_memory_fused(fused21k_fit8):
    """bfloat16 R through the fused (chunked) E-step path; the shared
    module fixture provides the fp32 run on the same data/config."""
    X, meta, ho32 = fused21k_fit8
    mesh = make_mesh(n_devices=8)
    ho = hm.run_harmony(X, meta, ["batch"], mesh=mesh, verbose=False,
                        nclust=12, chunk_size=128, max_iter_harmony=2,
                        low_memory=True)
    assert ho.cfg.use_fused_xla and ho.cfg.r_dtype == "bfloat16"
    assert np.all(np.isfinite(ho.Z_corr))
    R, Phi = ho.R.T, ho.Phi.T
    # O/E accumulate in fp32 from pre-cast values; vs the bf16-stored R the
    # match is bf16-rounding tight.
    np.testing.assert_allclose(ho.O, R @ Phi.T, rtol=2e-2, atol=0.5)
    corr = np.corrcoef(ho.Z_corr.ravel(), ho32.Z_corr.ravel())[0, 1]
    assert corr > 0.995, corr


def test_fast_objective_opt_in(fused21k_fit8):
    """fast_objective=True (log-free factorized objective partials) fits the
    same problem with near-identical objective values; trajectories may
    legitimately differ near the convergence plateau (~1e-6 rel objective
    perturbation — EngineConfig.fast_objective), so the gate compares the
    start objective (deterministic given the init) and the result quality,
    not round counts."""
    X, meta, ho = fused21k_fit8
    hf = hm.run_harmony(X, meta, ["batch"], mesh=make_mesh(n_devices=8),
                        verbose=False, nclust=12, chunk_size=128,
                        max_iter_harmony=2, fast_objective=True)
    assert hf.cfg.fast_objective
    np.testing.assert_allclose(hf.objective_harmony[0],
                               ho.objective_harmony[0], rtol=1e-5)
    corr = np.corrcoef(hf.Z_corr.ravel(), ho.Z_corr.ravel())[0, 1]
    assert corr > 0.995, corr
    # bitwise device-count invariance holds with the flag on, too
    h1 = hm.run_harmony(X, meta, ["batch"], mesh=make_mesh(n_devices=1),
                        verbose=False, nclust=12, chunk_size=128,
                        max_iter_harmony=2, fast_objective=True)
    np.testing.assert_array_equal(hf.Z_corr, h1.Z_corr)
