"""profile_fit smoke: the phase profiler runs the real engine programs on a
tiny problem and returns a sane breakdown (SURVEY §5 tracing/profiling)."""

import numpy as np

import jax

from harmonypy_tpu.config import EngineConfig
from harmonypy_tpu.parallel.mesh import make_mesh
from harmonypy_tpu.parallel.sharding import shard_inputs
from harmonypy_tpu.state import HarmonyParams
from harmonypy_tpu.utils.profiling import estep_traffic_model_gb, profile_fit


def test_profile_fit_smoke():
    N, d, K, B = 512, 8, 6, 3
    mesh = make_mesh(n_devices=1)
    # defer_r=True: the library-default storage strategy, which also adds
    # the VPU-floor fields (the meaningful roofline for deferred rounds).
    cfg = EngineConfig(N=N, d=d, K=K, B=B, n_devices=1, use_fused_xla=True,
                       chunk_size=64, block_size=0.25, defer_r=True)
    rng = np.random.default_rng(0)
    Z = rng.normal(size=(d, N)).astype(np.float32)
    batch = rng.integers(0, B, size=N)
    Phi = (batch[None, :] == np.arange(B)[:, None]).astype(np.float32)
    params = HarmonyParams(
        theta=jax.numpy.full((B,), 2.0, jax.numpy.float32),
        sigma=jax.numpy.full((K,), 0.1, jax.numpy.float32),
        lamb=jax.numpy.asarray([0.0] + [1.0] * B, jax.numpy.float32),
        Pr_b=jax.numpy.asarray(Phi.sum(axis=1) / N, jax.numpy.float32))
    data = shard_inputs(Z, Phi, cfg, mesh)

    res = profile_fit(cfg, mesh, data, params, reps=3)
    for k in ("dispatch_s", "phase_init_s", "phase_kmeans_round_s",
              "phase_ridge_s"):
        assert k in res, (k, res)
        assert res[k] >= 0.0
    assert ("estep_hbm_gbps" in res) != ("estep_round_noisy" in res)
    assert "fused_xla_round_s" not in res  # only added for Pallas configs
    assert estep_traffic_model_gb(cfg) > 0.0
    # VPU-floor fields: deferred configs only, floor consistent with the
    # measured round.
    assert res["estep_vpu_floor_s"] > 0.0
    assert abs(res["estep_vpu_floor_frac"]
               - res["estep_vpu_floor_s"] / res["phase_kmeans_round_s"]) < 0.1

    # budget exceeded -> partial result, no exception
    res2 = profile_fit(cfg, mesh, data, params, reps=3, budget_s=0.0)
    assert "phases_truncated" in res2


def test_profile_fit_split_init():
    N, d, K, B = 512, 8, 6, 3
    mesh = make_mesh(n_devices=1)
    cfg = EngineConfig(N=N, d=d, K=K, B=B, n_devices=1, use_fused_xla=True,
                       chunk_size=64, block_size=0.25)
    rng = np.random.default_rng(0)
    Z = rng.normal(size=(d, N)).astype(np.float32)
    batch = rng.integers(0, B, size=N)
    Phi = (batch[None, :] == np.arange(B)[:, None]).astype(np.float32)
    params = HarmonyParams(
        theta=jax.numpy.full((B,), 2.0, jax.numpy.float32),
        sigma=jax.numpy.full((K,), 0.1, jax.numpy.float32),
        lamb=jax.numpy.asarray([0.0] + [1.0] * B, jax.numpy.float32),
        Pr_b=jax.numpy.asarray(Phi.sum(axis=1) / N, jax.numpy.float32))
    data = shard_inputs(Z, Phi, cfg, mesh)

    res = profile_fit(cfg, mesh, data, params, reps=3, split_init=True)
    assert res["phase_init_seeding_s"] >= 0.0
    # stats = clamp(init - seeding, 0): the sub-phases are independent
    # wall-clock measurements, so on tiny problems dispatch noise can make
    # seeding alone measure past the whole init phase.
    assert abs(res["phase_init_stats_s"]
               - max(res["phase_init_s"]
                     - res["phase_init_seeding_s"], 0.0)) < 1e-3
