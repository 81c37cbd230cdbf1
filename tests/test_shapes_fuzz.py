"""Shape fuzz: the engine must work across odd N/d/K/B/mesh/path
combinations (padding remainders, tiny clusters, single PCs, every E-step
implementation). One truncated fit each; asserts finiteness and the state
invariants that hold for every path."""

import numpy as np
import pandas as pd
import pytest

import harmonypy_tpu as hm
import harmonypy_tpu.api as api
from harmonypy_tpu.parallel.mesh import make_mesh

CASES = [
    # (N, d, B, nclust, n_devices, chunk_size or None for per-cell path,
    #  defer: None = library default (deferred on fused geometry))
    (173, 2, 2, 3, 1, None, None),      # tiny, prime N
    (515, 7, 4, 12, 8, None, None),     # N % n_devices != 0
    (1301, 3, 2, 5, 4, 8, None),        # fused deferred, tiny chunks, odd N
    (4000, 16, 5, 40, 2, 64, None),     # fused deferred, many clusters
    (1301, 3, 2, 5, 4, 8, False),       # stored-R fused XLA, odd N
    (4000, 16, 5, 40, 2, 64, False),    # stored-R fused XLA, many clusters
    (999, 1, 2, 4, 4, None, None),      # single PC
    (300, 6, 6, 2, 8, None, None),      # B > K
]


@pytest.mark.parametrize("N,d,B,nclust,ndev,chunk,defer", CASES)
def test_engine_shape_fuzz(N, d, B, nclust, ndev, chunk, defer):
    rng = np.random.default_rng(N + d)
    X = rng.normal(size=(N, d)).astype(np.float32)
    meta = pd.DataFrame({"b": rng.integers(0, B, N)})
    mesh = make_mesh(n_devices=ndev)

    kwargs = dict(mesh=mesh, verbose=False, nclust=nclust,
                  max_iter_harmony=2, max_iter_kmeans=4)
    if chunk is not None:
        from harmonypy_tpu.config import fused_geometry_ok
        assert fused_geometry_ok(N, ndev, 0.05, chunk), (N, ndev, chunk)
        kwargs.update(chunk_size=chunk, defer_r=defer)
    else:
        kwargs.update(use_pallas=False)

    ho = hm.run_harmony(X, meta, ["b"], **kwargs)
    if chunk is not None:
        assert ho.cfg.fused_estep
        assert ho.cfg.defer_r == (defer is None or defer)
    Z = ho.Z_corr
    assert Z.shape == (N, d)
    assert np.all(np.isfinite(Z))
    R = ho.R
    assert R.shape == (N, nclust)
    np.testing.assert_allclose(R.sum(axis=1), 1.0, rtol=1e-3)
    np.testing.assert_allclose(ho.O.sum(), N, rtol=1e-3)
    np.testing.assert_allclose(ho.O, R.T @ ho.Phi, rtol=5e-3, atol=5e-2)
    assert len(ho.objective_harmony) >= 2
    assert np.all(np.isfinite(ho.objective_harmony))
