"""Operational robustness: capacity preflight, resume validation, degenerate
loop-bound configs, and id-based kNN self-removal (round-3 VERDICT items 2/8
and ADVICE item 1)."""

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

import harmonypy_tpu as hm
from harmonypy_tpu.config import EngineConfig
from harmonypy_tpu.parallel.mesh import make_mesh
from harmonypy_tpu.utils.memory import (CapacityError, check_capacity,
                                        memory_envelope)

from conftest import synthetic_batched


def _problem(n=500, d=8):
    X, batches, _ = synthetic_batched(n_cells=n, d=d)
    meta = pd.DataFrame({"donor": [f"d{b}" for b in batches]})
    return X, meta


# ---- capacity preflight -------------------------------------------------

def _cfg(n_devices=1, **kw):
    kw.setdefault("N", 1_000_000)
    kw.setdefault("d", 29)
    kw.setdefault("K", 100)
    kw.setdefault("B", 3)
    kw.setdefault("use_fused_xla", True)
    return EngineConfig(n_devices=n_devices, **kw)


def test_memory_envelope_scales():
    one = memory_envelope(_cfg(1))["total"]
    four = memory_envelope(_cfg(4))["total"]
    assert four < one / 2  # N-scale arrays shard 4x; replicated parts small
    lm = memory_envelope(_cfg(1, r_dtype="bfloat16"))["total"]
    assert lm < one  # R halves


def test_capacity_preflight_raises_with_remedies(monkeypatch):
    # A 1 GB device cannot hold the 858k-cell default workload.
    monkeypatch.setenv("HARMONYPY_DEVICE_MEM_BYTES", str(1 * 1024 ** 3))
    mesh = make_mesh(n_devices=1)
    with pytest.raises(CapacityError) as ei:
        check_capacity(_cfg(1), mesh)
    msg = str(ei.value)
    assert "devices" in msg and "GB" in msg
    assert "low_memory" in msg or "reduce" in msg


def test_capacity_preflight_passes_when_fits(monkeypatch):
    monkeypatch.setenv("HARMONYPY_DEVICE_MEM_BYTES", str(64 * 1024 ** 3))
    check_capacity(_cfg(1), make_mesh(n_devices=1))  # no raise


def test_run_harmony_capacity_error_before_compile(monkeypatch):
    # An end-to-end guard: the error must fire in the driver, fast, with the
    # device-count remedy — not as an XLA OOM mid-compile.
    monkeypatch.setenv("HARMONYPY_DEVICE_MEM_BYTES", str(1024 ** 2))
    X, meta = _problem(n=2000)
    with pytest.raises(CapacityError):
        hm.run_harmony(X, meta, ["donor"], mesh=make_mesh(n_devices=1),
                       verbose=False)


def test_skip_capacity_check_escape_hatch(monkeypatch):
    """The error message names HARMONYPY_SKIP_CAPACITY_CHECK=1; setting it
    must actually bypass the preflight (the model is deliberately a slight
    over-estimate, so a user near the boundary needs the override)."""
    monkeypatch.setenv("HARMONYPY_DEVICE_MEM_BYTES", str(1024 ** 2))
    X, meta = _problem(n=2000)
    with pytest.raises(CapacityError):
        hm.run_harmony(X, meta, ["donor"], mesh=make_mesh(n_devices=1),
                       verbose=False)
    monkeypatch.setenv("HARMONYPY_SKIP_CAPACITY_CHECK", "1")
    ho = hm.run_harmony(X, meta, ["donor"], mesh=make_mesh(n_devices=1),
                        max_iter_harmony=1, verbose=False)
    assert np.all(np.isfinite(ho.Z_corr))


# ---- resume validation --------------------------------------------------

def test_resume_mismatched_config_fails_clearly(tmp_path):
    X, meta = _problem()
    mesh = make_mesh(n_devices=4)
    ckpt = str(tmp_path)
    hm.run_harmony(X, meta, ["donor"], mesh=mesh, verbose=True,
                   max_iter_harmony=4, random_state=3, checkpoint_dir=ckpt)
    # Different history geometry (max_iter_harmony) must be rejected with a
    # field-level message, not a device_put shape error.
    with pytest.raises(ValueError, match="incompatible"):
        hm.run_harmony(X, meta, ["donor"], mesh=mesh, verbose=True,
                       max_iter_harmony=7, random_state=3,
                       resume_from=f"{ckpt}/harmony_iter_2.npz")
    # Different R dtype (low_memory) is named explicitly.
    with pytest.raises(ValueError, match="low_memory"):
        hm.run_harmony(X, meta, ["donor"], mesh=mesh, verbose=True,
                       max_iter_harmony=4, random_state=3, low_memory=True,
                       resume_from=f"{ckpt}/harmony_iter_2.npz")


# ---- degenerate loop bounds --------------------------------------------

@pytest.mark.parametrize("mik", [1, 2])
def test_tiny_max_iter_kmeans(mik):
    """max_iter_kmeans below the convergence window must run, converge on
    the harmony criterion, and keep history lengths consistent."""
    X, meta = _problem()
    ho = hm.run_harmony(X, meta, ["donor"], mesh=make_mesh(n_devices=2),
                        verbose=False, max_iter_harmony=3,
                        max_iter_kmeans=mik)
    rounds = ho.kmeans_rounds
    assert all(1 <= r <= mik for r in rounds)
    assert len(ho.objective_kmeans) == 1 + sum(rounds)
    assert len(ho.objective_harmony) == 1 + len(rounds)
    assert np.all(np.isfinite(ho.Z_corr))


# ---- id-based self-neighbor removal ------------------------------------

def test_knn_self_removal_by_id_handles_duplicates():
    """With duplicate rows, exact top-k ties put the LOWER index first, so a
    positional drop removes the true nearest neighbor of the higher-index
    duplicate; the id-based drop removes the self point."""
    from harmonypy_tpu.lisi import _knn_impl

    rng = np.random.default_rng(0)
    X = rng.normal(size=(40, 4))
    X[9] = X[5]  # exact duplicate pair
    Xd = jnp.asarray(X, jnp.float32)
    qid = jnp.arange(40, dtype=jnp.int32)
    dist, idx = _knn_impl(Xd, Xd, 5, chunk=8, qid=qid)
    idx = np.asarray(idx)
    assert idx[9, 0] == 5 and 9 not in idx[9]
    assert idx[5, 0] == 9 and 5 not in idx[5]
    # Non-duplicate rows: identical to the positional drop.
    d0, i0 = _knn_impl(Xd, Xd, 5, chunk=8)
    keep = [i for i in range(40) if i not in (5, 9)]
    np.testing.assert_array_equal(np.asarray(i0)[keep], idx[keep])
    np.testing.assert_allclose(np.asarray(d0)[keep],
                               np.asarray(dist)[keep])


def test_knn_self_removal_drops_worst_when_self_missing():
    """If the candidate list lacks the self point (approx top-k at
    recall < 1), the worst candidate is dropped, never column 0."""
    from harmonypy_tpu.lisi import _knn_impl

    rng = np.random.default_rng(1)
    X = rng.normal(size=(30, 3)).astype(np.float32)
    Q = X[:10]
    # Query ids that match no reference row: every query keeps its k best.
    qid = jnp.full((10,), -7, jnp.int32)
    dist, idx = _knn_impl(jnp.asarray(Q), jnp.asarray(X), 4, chunk=8,
                          qid=qid)
    # Against ground truth: the 4 nearest INCLUDING self-row (ids differ so
    # nothing is removed from the top of the list).
    d2 = ((Q[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    truth = np.argsort(d2, axis=1)[:, :4]
    np.testing.assert_array_equal(np.asarray(idx), truth)
