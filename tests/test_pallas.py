"""Tests for the fused Pallas E-step (interpret mode on CPU).

The kernel is compared against a chunk-level NumPy oracle driven with the
exact same shuffled chunk partition, and the full pallas engine path is
compared against the XLA path end-to-end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import harmonypy_tpu as hm
from harmonypy_tpu.config import EngineConfig, pallas_supported
from harmonypy_tpu.ops.pallas.update_r_fused import (
    chunk_stats, fused_update_r, pallas_geometry)
from harmonypy_tpu.ops.partition import (
    partition_geometry, removal_from_cache, single_device_tables)
from harmonypy_tpu.parallel.mesh import make_mesh


def _tables(key, cfg):
    """Engine-equivalent slot tables + removal builder for one device."""
    pgeom = partition_geometry(cfg)
    slots, granks, gtbl = single_device_tables(key, cfg)
    return pgeom, slots, granks, gtbl


def _chunk_problem(seed=0, K=7, d=5, B=3, CH=128, n_chunks=32,
                   block_size=0.25, n_masked=10):
    rng = np.random.default_rng(seed)
    N_alloc = (n_chunks + 1) * CH          # + dummy chunk
    n_real = n_chunks * CH - n_masked
    cfg = EngineConfig(N=n_real, d=d, K=K, B=B, n_devices=1, use_pallas=True,
                       chunk_size=CH, block_size=block_size)
    assert cfg.N_local == N_alloc
    Zr = rng.normal(size=(d, n_real)).astype(np.float32)
    Zc = np.zeros((d, N_alloc), np.float32)
    Zc[:, :n_real] = Zr / np.linalg.norm(Zr, axis=0)
    batch = rng.integers(0, B, size=n_real)
    Phi = np.zeros((B, N_alloc), np.float32)
    Phi[:, :n_real] = batch[None, :] == np.arange(B)[:, None]
    Pr_b = (Phi.sum(1) / n_real).astype(np.float32)
    Y = rng.normal(size=(d, K)).astype(np.float32)
    Y /= np.linalg.norm(Y, axis=0)
    dist = 2 * (1 - Y.T @ Zc)
    sigma = np.full(K, 0.1, np.float32)
    theta = np.full(B, 2.0, np.float32)
    S = np.exp(-dist / sigma[:, None])
    S /= S.sum(0)
    R = (S * (Phi.sum(0) > 0)).astype(np.float32)
    E = np.outer(R.sum(1), Pr_b).astype(np.float32)
    O = (R @ Phi.T).astype(np.float32)
    return cfg, dict(Zc=Zc, Phi=Phi, Pr_b=Pr_b, Y=Y, dist=dist, sigma=sigma,
                     theta=theta, R=R, E=E, O=O)


def _oracle_chunked(p, slots_np, geom):
    """Sequential chunk-block E-step oracle (reference harmony.py:464-513
    semantics at chunk granularity)."""
    CH = geom.chunk_size
    R, E, O = p["R"].copy(), p["E"].copy(), p["O"].copy()
    Phi, Pr_b = p["Phi"], p["Pr_b"]
    scale = np.exp(-p["dist"] / p["sigma"][:, None])
    scale /= scale.sum(0)
    for b in range(geom.n_blocks):
        cs = [c for c in slots_np[b] if c < geom.n_chunks]
        cells = (np.concatenate([np.arange(c * CH, (c + 1) * CH) for c in cs])
                 if cs else np.array([], int))
        Rb, Pb, Sb = R[:, cells], Phi[:, cells], scale[:, cells]
        E -= np.outer(Rb.sum(1), Pr_b)
        O -= Rb @ Pb.T
        ratio = np.clip(E / np.maximum(O + E, 1e-8), 1e-8, 1.0)
        Rn = Sb * (np.exp(p["theta"][None, :] * np.log(ratio)) @ Pb)
        Rn = Rn / np.maximum(Rn.sum(0), 1e-8)
        Rn = Rn * (Pb.sum(0) > 0)
        E += np.outer(Rn.sum(1), Pr_b)
        O += Rn @ Pb.T
        R[:, cells] = Rn
    return R, E, O


@pytest.mark.parametrize("block_size", [0.25, 0.3])
def test_fused_kernel_matches_chunk_oracle(block_size):
    cfg, p = _chunk_problem(block_size=block_size)
    geom = pallas_geometry(cfg)
    pgeom, slots, granks, gtbl = _tables(jax.random.PRNGKey(3), cfg)
    cache = chunk_stats(jnp.asarray(p["R"]), jnp.asarray(p["Phi"]), cfg)
    removal = removal_from_cache(cache[: pgeom.nc_cap], gtbl, pgeom)
    R2, O2, E2, cache2, ybuf, kbuf = fused_update_r(
        np.asarray(slots).reshape(-1), removal, jnp.asarray(p["Zc"]),
        jnp.asarray(p["Phi"]), None, jnp.asarray(p["Y"]), jnp.asarray(p["sigma"]),
        jnp.asarray(p["theta"]), jnp.asarray(p["Pr_b"]), jnp.asarray(p["O"]),
        jnp.asarray(p["E"]), cfg, interpret=True)
    # Engine-equivalent reductions of the per-chunk buffers (1 device).
    Ysum = np.asarray(ybuf)[: geom.n_chunks].sum(0).T
    kerr, ent = np.asarray(kbuf)[: geom.n_chunks].sum(0)

    slots_np = np.asarray(slots)                 # (n_blocks, J)
    R_ref, E_ref, O_ref = _oracle_chunked(p, slots_np, geom)
    np.testing.assert_allclose(np.asarray(R2), R_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(O2), O_ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(E2), E_ref, rtol=1e-4, atol=1e-3)
    # Fused centroid numerator and refreshed cache match recomputation.
    np.testing.assert_allclose(np.asarray(Ysum), p["Zc"] @ R_ref.T,
                               rtol=1e-3, atol=1e-4)
    cache_ref = chunk_stats(jnp.asarray(R_ref), jnp.asarray(p["Phi"]), cfg)
    np.testing.assert_allclose(np.asarray(cache2)[:geom.n_chunks],
                               np.asarray(cache_ref)[:geom.n_chunks],
                               rtol=1e-4, atol=1e-3)

    kerr_ref = (R_ref * p["dist"]).sum()
    ent_mat = np.where(R_ref > 0, R_ref * np.log(np.where(R_ref > 0, R_ref, 1)), 0)
    ent_ref = (ent_mat * p["sigma"][:, None]).sum()
    np.testing.assert_allclose(float(kerr), kerr_ref, rtol=1e-4)
    np.testing.assert_allclose(float(ent), ent_ref, rtol=1e-4)


def test_pallas_engine_path_matches_xla_path():
    rng = np.random.default_rng(0)
    import pandas as pd
    N, d = 5000, 10
    centers = rng.normal(size=(6, d)) * 4
    g = rng.integers(0, 6, N)
    b = rng.integers(0, 3, N)
    shifts = rng.normal(size=(3, d)) * 2
    X = (centers[g] + shifts[b] + rng.normal(size=(N, d))).astype(np.float32)
    meta = pd.DataFrame({"batch": [f"b{i}" for i in b]})
    mesh = make_mesh(n_devices=1)

    ho_x = hm.run_harmony(X, meta, ["batch"], mesh=mesh, verbose=False,
                          use_pallas=False, defer_r=False, chunk_size=128)
    ho_p = hm.run_harmony(X, meta, ["batch"], mesh=mesh, verbose=False,
                          use_pallas=True, chunk_size=128)
    # Same chunk partition, same per-chunk statistics GEMM, same fixed-frame
    # reduction orders: the two fused paths run identical arithmetic. On TPU
    # hardware the compiled Mosaic kernel and compiled XLA produce BITWISE
    # identical results (verified by tools/bitwise_xpath.py; VERDICT r2 #3).
    # On CPU the kernel runs in interpret mode, where the backend's dot
    # implementation differs by batching shape — ulp-level only.
    if jax.devices()[0].platform == "tpu":  # pragma: no cover
        np.testing.assert_array_equal(ho_x.Z_corr, ho_p.Z_corr)
        np.testing.assert_array_equal(ho_x.R, ho_p.R)
        assert ho_x.objective_kmeans == ho_p.objective_kmeans
    else:
        np.testing.assert_allclose(ho_x.Z_corr, ho_p.Z_corr,
                                   rtol=1e-4, atol=2e-4)
        np.testing.assert_allclose(ho_x.R, ho_p.R, rtol=1e-3, atol=2e-5)
        np.testing.assert_allclose(ho_x.objective_kmeans,
                                   ho_p.objective_kmeans, rtol=1e-5)
        assert ho_x.kmeans_rounds == ho_p.kmeans_rounds
    assert ho_p.objective_harmony[-1] < ho_p.objective_harmony[0]


def test_pallas_supported_gating():
    assert pallas_supported(858_000, 1)
    assert not pallas_supported(858_000, 8)       # multi-device: XLA path
    assert not pallas_supported(3_500, 1)         # too few chunks for blocks
    assert pallas_supported(3_500, 1, chunk_size=128)


def test_pallas_seed_reproducible():
    import pandas as pd
    rng = np.random.default_rng(1)
    N, d = 3000, 6
    X = rng.normal(size=(N, d)).astype(np.float32)
    meta = pd.DataFrame({"batch": rng.choice(["a", "b"], N)})
    mesh = make_mesh(n_devices=1)

    def run(seed):
        return hm.run_harmony(X, meta, ["batch"], mesh=mesh, verbose=False,
                              use_pallas=True, chunk_size=128,
                              max_iter_harmony=2, random_state=seed).Z_corr

    np.testing.assert_array_equal(run(7), run(7))
    assert np.abs(run(7) - run(8)).sum() > 1.0
