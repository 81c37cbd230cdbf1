"""Property/invariant tests of the algorithm (SURVEY.md §4 notes the
reference has none; these pin behaviors the golden tests only cover
indirectly)."""

import numpy as np
import pandas as pd
import pytest

import harmonypy_tpu as hm
from harmonypy_tpu.parallel.mesh import make_mesh

from conftest import synthetic_batched


def _run(X, meta, **kw):
    return hm.run_harmony(X, meta, ["donor"], mesh=make_mesh(n_devices=4),
                          verbose=False, **kw)


@pytest.fixture(scope="module")
def problem():
    X, batches, _ = synthetic_batched(n_cells=700, d=9)
    meta = pd.DataFrame({"donor": [f"d{b}" for b in batches]})
    return X, meta


def test_state_invariants(problem):
    """O/E track R exactly; R columns are distributions; E row masses equal
    O row masses (both are the cluster sizes)."""
    X, meta = problem
    ho = _run(X, meta, max_iter_harmony=3)
    R, Phi = ho.R.T, ho.Phi.T
    np.testing.assert_allclose(ho.O, R @ Phi.T, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        ho.E, np.outer(R.sum(axis=1), ho.Pr_b), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(R.sum(axis=0), 1.0, rtol=1e-4)
    np.testing.assert_allclose(ho.O.sum(axis=1), ho.E.sum(axis=1),
                               rtol=1e-3, atol=1e-3)


def test_theta_zero_disables_diversity():
    """theta=0 turns the E-step into plain entropy-regularized soft k-means:
    the updated R must equal softmax(-dist/sigma) regardless of O/E state and
    block order (reference update_R with (E/(O+E))^0 == 1,
    harmony.py:495-499). Exercised at the op level because the end-to-end
    state only exposes the post-correction Z_cos."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from harmonypy_tpu.config import EngineConfig
    from harmonypy_tpu.engine import AXIS
    from harmonypy_tpu.ops.update_r import update_r
    from harmonypy_tpu.state import HarmonyParams

    rng = np.random.default_rng(0)
    N, d, K, B = 512, 6, 9, 3
    cfg = EngineConfig(N=N, d=d, K=K, B=B, n_devices=4, block_size=0.2)
    Z = rng.normal(size=(d, N)).astype(np.float32)
    Z /= np.linalg.norm(Z, axis=0)
    Y = rng.normal(size=(d, K)).astype(np.float32)
    Y /= np.linalg.norm(Y, axis=0)
    dist = 2.0 * (1.0 - Y.T @ Z)
    batch = rng.integers(0, B, N)
    Phi = (batch[None, :] == np.arange(B)[:, None]).astype(np.float32)
    s = np.exp(-dist / 0.1)
    R0 = (s / s.sum(0)).astype(np.float32)
    E = np.outer(R0.sum(1), Phi.sum(1) / N).astype(np.float32)
    O = (R0 @ Phi.T).astype(np.float32)
    params = HarmonyParams(
        theta=jnp.zeros((B,), jnp.float32),
        sigma=jnp.full((K,), 0.1, jnp.float32),
        lamb=jnp.zeros((B + 1,), jnp.float32),
        Pr_b=jnp.asarray(Phi.sum(1) / N, jnp.float32))
    mesh = make_mesh(n_devices=4)
    f = jax.jit(jax.shard_map(
        lambda k, R, D, P_, E_, O_, m: update_r(
            k, R, D, P_, E_, O_, params, cfg, m, AXIS),
        mesh=mesh,
        in_specs=(P(), P(None, AXIS), P(None, AXIS), P(None, AXIS),
                  P(), P(), P(AXIS)),
        out_specs=(P(None, AXIS), P(), P())))
    # Start R far from the fixed point: uniform assignments.
    R_in = jnp.full((K, N), 1.0 / K, jnp.float32)
    R2, _, _ = f(jax.random.PRNGKey(0), R_in, jnp.asarray(dist),
                 jnp.asarray(Phi), jnp.asarray(E), jnp.asarray(O),
                 jnp.ones((N,), jnp.float32))
    np.testing.assert_allclose(np.asarray(R2), s / s.sum(0), atol=2e-5)


def test_single_batch_noop_mixing(problem):
    """With one batch level, O == E identically (observed == expected batch
    composition — there is nothing to diversify)."""
    X, _ = problem
    meta = pd.DataFrame({"donor": ["a"] * X.shape[0]})
    ho = _run(X, meta, max_iter_harmony=2)
    np.testing.assert_allclose(ho.O, ho.E, rtol=1e-3, atol=1e-3)


def test_orientation_autotranspose(problem):
    """(N, d) and (d, N) inputs give identical results
    (reference harmony.py:117-121)."""
    X, meta = problem
    a = _run(X, meta, max_iter_harmony=2).Z_corr
    b = _run(X.T, meta, max_iter_harmony=2).Z_corr
    np.testing.assert_array_equal(a, b)


def test_shape_mismatch_raises(problem):
    X, meta = problem
    with pytest.raises(AssertionError, match="same number of cells"):
        hm.run_harmony(X[:-5], meta, ["donor"])


def test_unused_categorical_levels(problem):
    """A pre-existing pd.Categorical with unused levels (the normal state
    after subsetting an AnnData frame) keeps theta/Phi shapes consistent."""
    X, meta = problem
    meta = meta.copy()
    meta["donor"] = pd.Categorical(
        meta["donor"], categories=sorted(meta["donor"].unique()) + ["ghost"])
    ho = _run(X, meta, max_iter_harmony=2)
    B = len(meta["donor"].cat.categories)           # includes the unused one
    assert ho.Phi.shape[1] == B
    assert ho.theta.shape == (B,)
    assert np.all(np.isfinite(ho.Z_corr))


def test_malformed_lamb_raises(problem):
    X, meta = problem
    with pytest.raises(ValueError, match="lamb"):
        _run(X, meta, lamb=[1.0, 1.0])              # 3 levels, 2 entries
    with pytest.raises(ValueError, match="positive"):
        _run(X, meta, lamb=0)                       # singular ridge


def test_tau_discounts_theta(problem):
    """tau > 0 applies the theta discount 1 - exp(-(N_b/(K*tau))^2)
    (reference harmony.py:172-173)."""
    X, meta = problem
    ho0 = _run(X, meta, max_iter_harmony=1)
    ho_tau = _run(X, meta, max_iter_harmony=1, tau=50)
    N_b = ho_tau.Phi.sum(axis=0)
    expected = ho0.theta * (1 - np.exp(-(N_b / (ho_tau.K * 50)) ** 2))
    np.testing.assert_allclose(ho_tau.theta, expected, rtol=1e-5)
    assert np.all(ho_tau.theta < ho0.theta)


def test_numeric_batch_column(problem):
    """Integer-typed batch columns work (categorical conversion in the
    driver); results match the equivalent string labels."""
    X, meta = problem
    codes = pd.Categorical(meta["donor"]).codes
    meta_num = pd.DataFrame({"donor": codes.astype(np.int64)})
    a = _run(X, meta, max_iter_harmony=2).Z_corr
    b = _run(X, meta_num, max_iter_harmony=2).Z_corr
    np.testing.assert_array_equal(a, b)


def test_unused_levels_with_dynamic_lambda(problem):
    """lamb=-1 with an unused categorical level: the dynamic ridge floor
    keeps the per-cluster systems regular (alpha*E == 0 for a level with no
    cells would otherwise make them exactly singular -> silent NaN)."""
    X, meta = problem
    meta = meta.copy()
    meta["donor"] = pd.Categorical(
        meta["donor"], categories=sorted(meta["donor"].unique()) + ["ghost"])
    ho = _run(X, meta, max_iter_harmony=2, lamb=-1)
    assert np.all(np.isfinite(ho.Z_corr))
    assert np.all(np.isfinite(ho.objective_harmony))


def test_malformed_sigma_raises(problem):
    X, meta = problem
    with pytest.raises(ValueError, match="sigma"):
        _run(X, meta, sigma=[0.1, 0.2])             # neither scalar nor K


def test_low_memory_mode(problem):
    """bfloat16-stored R: same correction quality, fp32-accumulated stats."""
    X, meta = problem
    a = _run(X, meta, max_iter_harmony=3)
    b = _run(X, meta, max_iter_harmony=3, low_memory=True)
    assert b.cfg.r_dtype == "bfloat16"
    assert np.all(np.isfinite(b.Z_corr))
    assert b.R.dtype == np.float32        # public view is float32
    np.testing.assert_allclose(b.R.sum(axis=1), 1.0, atol=5e-3)
    corr = np.corrcoef(a.Z_corr.ravel(), b.Z_corr.ravel())[0, 1]
    assert corr > 0.995, corr
    l_a = hm.compute_lisi(a.Z_corr, meta, ["donor"]).mean()
    l_b = hm.compute_lisi(b.Z_corr, meta, ["donor"]).mean()
    assert abs(l_a - l_b) < 0.1, (l_a, l_b)
