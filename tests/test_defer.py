"""Deferred-R (out-of-core) mode: the K x N soft-assignment matrix is never
materialized; ridge, the next iteration's centroid update, and the .R
property replay the final E-step round chunk-resident
(VERDICT r2 #2 full answer + #6 ridge-R-reads elimination).

Contracts tested here:
  1. bitwise device-count invariance (the framework's core numerics promise)
  2. equivalence with the stored-R fused-XLA path (same algorithm; tiny
     reduction-shape rounding differences only)
  3. checkpoint/resume round-trips bitwise
  4. auto-enable when the stored-R envelope exceeds device capacity
"""

import numpy as np
import pandas as pd
import pytest

import harmonypy_tpu as hm
from harmonypy_tpu.parallel.mesh import make_mesh


def _problem(n=50_000, d=8, B=3, seed=0):
    rng = np.random.default_rng(seed)
    X = (rng.normal(size=(n, d)) + rng.normal(size=(n, 1)) * 0.5
         ).astype(np.float32)
    batches = rng.integers(0, B, size=n)
    X += batches[:, None] * 0.8
    meta = pd.DataFrame({"donor": [f"d{b}" for b in batches]})
    return X, meta


def _run(X, meta, nd, **kw):
    kw.setdefault("max_iter_harmony", 2)
    kw.setdefault("chunk_size", 1024)
    return hm.run_harmony(X, meta, ["donor"], mesh=make_mesh(n_devices=nd),
                          verbose=False, **kw)


@pytest.fixture(scope="module")
def defer_fits_50k():
    """Deferred-R fits of the same 50k problem at 1/2/8 devices, shared by
    the invariance and stored-path-equivalence tests (suite wall-clock:
    each 50k fit is among the most expensive in the suite)."""
    X, meta = _problem()
    # defer_r left unset: the fused-path DEFAULT must resolve to deferred-R
    # (asserted below), so these fits double as default-config coverage.
    fits = {nd: _run(X, meta, nd) for nd in (1, 2, 8)}
    return X, meta, fits


def test_defer_device_count_invariance_bitwise(defer_fits_50k):
    _, _, fits = defer_fits_50k
    assert all(f.cfg.defer_r for f in fits.values())
    ref = fits[1]
    for nd in (2, 8):
        ho = fits[nd]
        np.testing.assert_array_equal(ref.Z_corr, ho.Z_corr)
        np.testing.assert_array_equal(ref.R, ho.R)
        assert ref.objective_kmeans == ho.objective_kmeans


def test_defer_matches_stored_path(defer_fits_50k):
    """Same algorithm, same partition, same update equations — results agree
    to float32 reduction tolerance (init statistics and ridge accumulate in
    chunk-shaped rather than array-shaped reductions)."""
    X, meta, fits = defer_fits_50k
    stored = _run(X, meta, 2, defer_r=False)
    assert stored.cfg.use_fused_xla and not stored.cfg.defer_r
    defer = fits[2]
    assert defer.cfg.defer_r  # deferred-R is the fused-path default
    np.testing.assert_allclose(stored.Z_corr, defer.Z_corr,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(stored.R, defer.R, rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(stored.objective_kmeans,
                               defer.objective_kmeans, rtol=1e-5)
    assert stored.kmeans_rounds == defer.kmeans_rounds


def test_defer_r_property_consistency(defer_fits_50k):
    """The materialized R is a valid soft assignment consistent with the
    state's O: columns sum to 1 and R Phi^T reproduces O. (Runs on the
    shared 2-device 50k fit — no extra fit; suite wall-clock.)"""
    _, _, fits = defer_fits_50k
    ho = fits[2]
    assert ho.cfg.defer_r
    R = ho.R                                  # (N, K)
    np.testing.assert_allclose(R.sum(axis=1), 1.0, atol=1e-4)
    O = R.T @ ho.Phi                          # (K, B)
    np.testing.assert_allclose(O, ho.O, rtol=1e-4, atol=5e-3)


@pytest.fixture(scope="module")
def mid30k():
    return _problem(n=30_000)


@pytest.fixture(scope="module")
def mid30k_fit_1dev(mid30k):
    """All-defaults single-device fit of the 30k problem (auto chunk ->
    1024, fused geometry -> deferred-R). Shared by the auto-chunk,
    Pallas-backend, and capacity-auto-enable tests: they all need exactly
    this config, so one fit (and one compiled executable) serves three
    tests (suite wall-clock)."""
    X, meta = mid30k
    ho = hm.run_harmony(X, meta, ["donor"], mesh=make_mesh(n_devices=1),
                        verbose=False, max_iter_harmony=2)
    return ho


def test_mid30k_default_config_resolution(mid30k_fit_1dev):
    """Default config resolution at N=30k: fused geometry, deferred-R,
    auto chunk 1024, no Pallas. Kept OUT of the fixture so a resolution
    regression fails this one test instead of erroring every fixture
    consumer."""
    ho = mid30k_fit_1dev
    assert ho.cfg.fused_estep and ho.cfg.defer_r
    assert ho.cfg.chunk_size == 1024 and not ho.cfg.use_pallas


def test_defer_checkpoint_resume(tmp_path):
    X, meta = _problem(n=30_000)
    ckpt = str(tmp_path)
    full = _run(X, meta, 2, defer_r=True, max_iter_harmony=3,
                random_state=3, checkpoint_dir=ckpt)
    resumed = _run(X, meta, 2, defer_r=True, max_iter_harmony=3,
                   random_state=3,
                   resume_from=f"{ckpt}/harmony_iter_1.npz")
    np.testing.assert_array_equal(full.Z_corr, resumed.Z_corr)
    np.testing.assert_array_equal(full.R, resumed.R)
    np.testing.assert_allclose(full.objective_harmony,
                               resumed.objective_harmony)


def _mid_budget(cfg_stored):
    """A byte budget between the stored-R and deferred-R envelopes."""
    import dataclasses
    from harmonypy_tpu.utils.memory import _HEADROOM, memory_envelope
    stored = memory_envelope(cfg_stored)["total"]
    defer = memory_envelope(dataclasses.replace(
        cfg_stored, defer_r=True, use_pallas=False,
        use_fused_xla=True))["total"]
    assert defer < stored
    return int((stored + defer) / 2 / _HEADROOM)


def test_defer_auto_enables_over_capacity(monkeypatch, mid30k,
                                          mid30k_fit_1dev):
    """When the stored-R envelope exceeds the device budget but the
    deferred-R envelope fits, run_harmony auto-selects defer_r and
    completes. Uses the exact config of the shared mid30k fit so the
    executable is already compiled — this test only exercises the
    capacity-driven selection, not a new program."""
    from harmonypy_tpu.config import EngineConfig, default_nclust
    X, meta = mid30k
    cfg_stored = EngineConfig(N=30_000, d=8, K=default_nclust(30_000), B=3,
                              n_devices=1, use_fused_xla=True,
                              chunk_size=1024)
    monkeypatch.setenv("HARMONYPY_DEVICE_MEM_BYTES",
                       str(_mid_budget(cfg_stored)))
    ho = hm.run_harmony(X, meta, ["donor"], mesh=make_mesh(n_devices=1),
                        verbose=False, max_iter_harmony=2)
    assert ho.cfg.defer_r
    assert np.all(np.isfinite(ho.Z_corr))
    # The budget only influenced path selection: same config => same bits.
    np.testing.assert_array_equal(ho.Z_corr, mid30k_fit_1dev.Z_corr)


def test_defer_capacity_error_names_defer(monkeypatch):
    from harmonypy_tpu.utils.memory import CapacityError, check_capacity
    from harmonypy_tpu.config import EngineConfig
    cfg = EngineConfig(N=5_000_000, d=29, K=200, B=3, n_devices=1,
                       use_fused_xla=True)
    monkeypatch.setenv("HARMONYPY_DEVICE_MEM_BYTES", str(_mid_budget(cfg)))
    with pytest.raises(CapacityError, match="defer_r"):
        check_capacity(cfg, make_mesh(n_devices=1))


def test_defer_zero_iteration_configs():
    """The deferred .R/ridge replay reproduces the LAST COMPLETED k-means
    round; a zero-iteration fit never runs one. Explicit defer_r=True must
    refuse loudly, and the defer_r=None default must fall back to the
    stored path (whose .R is the materialized initial assignment)."""
    X, meta = _problem(n=4_000, d=4)
    # chunk_size=128 -> 32 chunks >= 20 blocks: the fused geometry is VALID,
    # so the errors below must come from the zero-iteration gate itself (at
    # _run's default chunk 1024 the geometry error would fire first and
    # this test would pass with the gate deleted).
    kw = dict(chunk_size=128)
    ok = _run(X, meta, 1, defer_r=True, max_iter_harmony=1, **kw)
    assert ok.cfg.defer_r                      # geometry really is fused-ok
    with pytest.raises(ValueError, match="max_iter_harmony >= 1"):
        _run(X, meta, 1, defer_r=True, max_iter_harmony=0, **kw)
    with pytest.raises(ValueError, match="max_iter_harmony >= 1"):
        _run(X, meta, 1, defer_r=True, max_iter_harmony=2, max_iter_kmeans=0,
             **kw)
    ho = _run(X, meta, 1, max_iter_harmony=0, **kw)  # default: auto-fallback
    assert not ho.cfg.defer_r and ho.cfg.fused_estep
    R = ho.R                                       # (N, K)
    assert R.shape[0] == 4_000
    np.testing.assert_allclose(R.sum(axis=1), 1.0, atol=1e-4)


def test_pallas_defer_backend_matches_xla_defer(mid30k, mid30k_fit_1dev):
    """Deferred-R rounds can run through the Pallas kernel's no-R variant
    (single chip). On TPU hardware the two backends are bitwise identical
    (tools/bitwise_xpath.py); in CPU interpret mode the backend's dot
    implementations differ by batching shape — ulp-level only."""
    import jax

    X, meta = mid30k
    hx = mid30k_fit_1dev            # XLA deferred fit, same config
    hp = hm.run_harmony(X, meta, ["donor"], mesh=make_mesh(n_devices=1),
                        verbose=False, max_iter_harmony=2,
                        defer_r=True, use_pallas=True)
    assert hp.cfg.use_pallas and hp.cfg.defer_r
    if jax.devices()[0].platform == "tpu":  # pragma: no cover
        np.testing.assert_array_equal(hx.Z_corr, hp.Z_corr)
        np.testing.assert_array_equal(hx.R, hp.R)
    else:
        np.testing.assert_allclose(hx.Z_corr, hp.Z_corr, rtol=1e-4,
                                   atol=2e-4)
        np.testing.assert_allclose(hx.R, hp.R, rtol=1e-3, atol=2e-5)
        assert hx.kmeans_rounds == hp.kmeans_rounds


def test_auto_chunk_size_mid_n(mid30k, mid30k_fit_1dev):
    """chunk_size=None auto-selects a smaller chunk at mid N (20.5k..41k)
    so the fused E-step (and the deferred-R default) applies instead of the
    several-times-slower per-cell path — and the choice is a function of
    (N, block_size) only, so the fit stays bitwise device-count-invariant.
    (The 1-device run is the shared mid30k fit; only the 8-device run is
    fitted here.)"""
    from harmonypy_tpu.config import auto_chunk_size
    assert auto_chunk_size(858_000) == 2048
    assert auto_chunk_size(10_000) == 2048       # per-cell stays per-cell
    assert auto_chunk_size(30_000) == 1024
    assert auto_chunk_size(30_000, requested=512) == 512
    X, meta = mid30k
    run1 = mid30k_fit_1dev
    run8 = hm.run_harmony(X, meta, ["donor"], mesh=make_mesh(n_devices=8),
                          max_iter_harmony=2, verbose=False)
    assert run1.cfg.fused_estep and run1.cfg.defer_r
    assert run1.cfg.chunk_size == 1024
    np.testing.assert_array_equal(run1.Z_corr, run8.Z_corr)
