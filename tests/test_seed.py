"""Determinism tests (reference tests/test_harmony.py:33-66)."""

import numpy as np

import harmonypy_tpu as hm
from harmonypy_tpu.parallel.mesh import make_mesh


def _run(pcs, meta, random_state, n_devices=8):
    ho = hm.run_harmony(
        pcs, meta, ["donor"],
        max_iter_harmony=2, max_iter_kmeans=2, verbose=False,
        random_state=random_state, mesh=make_mesh(n_devices=n_devices))
    return ho.Z_corr


def test_same_seed_reproducible(pbmc):
    meta, pcs, _ = pbmc
    r1 = _run(pcs, meta, 42)
    r2 = _run(pcs, meta, 42)
    # JAX compiled execution is deterministic: exact equality on same mesh.
    np.testing.assert_array_equal(r1, r2)


def test_different_seeds_differ(pbmc):
    meta, pcs, _ = pbmc
    r3 = _run(pcs, meta, 123)
    r4 = _run(pcs, meta, 456)
    assert np.abs(r3 - r4).sum() > 1000
