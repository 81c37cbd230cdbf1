"""Benchmark harness: the reference's headline "large" workload
(858k cells x 29 PCs, README.md:54 — 21.75 s on an M1 Ultra via PyTorch MPS),
reproduced synthetically and run through the full Harmony pipeline
(k-means++ init + fuzzy k-means + ridge correction until convergence).

Prints the headline JSON line
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
immediately after measurement, then (best-effort) one enriched line with the
same headline fields plus the per-phase breakdown from
harmonypy_tpu.utils.profiling.profile_fit. Consumers taking either the
first or the last JSON line get a valid record.

vs_baseline > 1 means faster than the reference's published wall-clock.

Methodology notes:
  - The input embedding lives on device (as it would mid-pipeline in a real
    workflow, and as it effectively does for the reference's unified-memory
    M1 baseline). This box reaches the TPU through a development tunnel whose
    host->device bandwidth is ~10-250 MB/s — one to two orders of magnitude
    below a production TPU host NIC/DMA — so including that transfer would
    benchmark the tunnel, not the framework.
  - Compile time is excluded via a warm-up run; executables are persisted to
    .jax_cache for subsequent processes.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_LARGE_S = 21.75  # reference README.md:54 (Apple M1 Ultra, MPS)

N_CELLS = 858_000
N_PCS = 29
N_BATCHES = 3
N_GROUPS = 24
K = 100  # reference default: min(round(N/30), 100) (harmony.py:123-124)


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(__file__), ".jax_cache"))
    import jax
    import jax.numpy as jnp
    from harmonypy_tpu.config import EngineConfig
    from harmonypy_tpu.engine import get_engine
    from harmonypy_tpu.state import HarmonyData, HarmonyParams
    from harmonypy_tpu.parallel.mesh import make_mesh, AXIS
    from jax.sharding import NamedSharding, PartitionSpec as P

    from harmonypy_tpu.config import fused_geometry_ok, pallas_supported

    mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    use_pallas = (mesh.devices.flat[0].platform == "tpu"
                  and pallas_supported(N_CELLS, n_dev))
    use_fused_xla = (not use_pallas) and fused_geometry_ok(N_CELLS, n_dev)
    cfg = EngineConfig(N=N_CELLS, d=N_PCS, K=K, B=N_BATCHES, n_devices=n_dev,
                       use_pallas=use_pallas, use_fused_xla=use_fused_xla)
    engine = get_engine(cfg, mesh)

    # Synthetic clustered embedding with additive batch offsets, generated
    # directly on device: centers[g] + shift[b] + noise.
    @jax.jit
    def gen(key):
        kc, kg, kb, ks, kn = jax.random.split(key, 5)
        centers = jax.random.normal(kc, (N_GROUPS, N_PCS), jnp.float32) * 5.0
        groups = jax.random.randint(kg, (cfg.N_pad,), 0, N_GROUPS)
        batches = jax.random.randint(kb, (cfg.N_pad,), 0, N_BATCHES)
        shifts = jax.random.normal(ks, (N_BATCHES, N_PCS), jnp.float32) * 1.5
        noise = jax.random.normal(kn, (cfg.N_pad, N_PCS), jnp.float32)
        # Per-shard padding layout (parallel/sharding.shard_mask): real cells
        # first on every shard, zero padding at each shard's end.
        off = jnp.arange(cfg.N_pad) % cfg.N_local
        gid = (jnp.arange(cfg.N_pad) // cfg.N_local) * cfg.N_shard_real + off
        mask = ((off < cfg.N_shard_real) & (gid < cfg.N)).astype(jnp.float32)
        Z = (centers[groups] + shifts[batches] + noise).T * mask[None, :]
        Phi = (batches[None, :] == jnp.arange(N_BATCHES)[:, None]
               ).astype(jnp.float32) * mask[None, :]
        return Z, Phi, mask

    sh2 = NamedSharding(mesh, P(None, AXIS))
    sh1 = NamedSharding(mesh, P(AXIS))
    Z, Phi, mask = jax.jit(gen, out_shardings=(sh2, sh2, sh1))(
        jax.random.PRNGKey(0))
    data = HarmonyData(Z_orig=Z, Phi=Phi, mask=mask)
    Pr_b = jnp.sum(Phi, axis=1) / N_CELLS
    params = HarmonyParams(
        theta=jnp.full((N_BATCHES,), 2.0, jnp.float32),
        sigma=jnp.full((K,), 0.1, jnp.float32),
        lamb=jnp.asarray([0.0] + [1.0] * N_BATCHES, jnp.float32),
        Pr_b=Pr_b.astype(jnp.float32),
    )

    def run():
        # Whole pipeline (k-means++ init + all harmony iterations) is ONE
        # compiled program; reading a scalar back forces a real device sync.
        state = engine.fit_fn(data, params, jax.random.PRNGKey(0))
        iters = int(state.n_rounds)
        return state, iters

    t0 = time.time()
    state, iters = run()  # warm-up: compile + execute
    warm = time.time() - t0

    t0 = time.time()
    state, iters = run()
    elapsed = time.time() - t0

    rounds = [int(x) for x in np.asarray(state.kmeans_rounds[:iters])]
    headline = {
        "metric": "harmony_858k_cells_wall_clock",
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_LARGE_S / elapsed, 3),
        "warmup_s": round(warm, 2),
    }
    # Emit the headline immediately: the phase probes below may pay
    # server-side compiles (minutes on remote-tunnel backends) and the
    # harness running this script may time out first. A second, enriched
    # line follows; consumers taking either the first or the last JSON line
    # get a valid record.
    print(json.dumps(headline), flush=True)
    try:
        # Best-effort: first cold run compiles several phase-probe programs
        # (persisted to .jax_cache); never let that block the headline line.
        phases = _profile_phases(cfg, mesh, data, params, elapsed, iters,
                                 sum(rounds))
    except Exception as e:  # pragma: no cover
        print(f"# phase profiling skipped: {e!r}", file=sys.stderr)
        phases = {}
    if phases:
        print(json.dumps({**headline, **phases}), flush=True)
    print(f"# devices: {n_dev} | warm-up (incl. compile): {warm:.2f}s "
          f"| measured: {elapsed:.2f}s | harmony iters: {iters} "
          f"| kmeans rounds: {rounds} "
          f"| corrected cells/s: {N_CELLS / elapsed:,.0f}",
          file=sys.stderr)


def _profile_phases(cfg, mesh, data, params, elapsed, iters, total_rounds):
    """Package profiler (harmonypy_tpu.utils.profiling.profile_fit) plus the
    bench-side accounting: how much of the measured wall-clock the phase
    model explains."""
    from harmonypy_tpu.utils.profiling import profile_fit

    res = profile_fit(cfg, mesh, data, params)
    if "phase_ridge_s" in res:
        accounted = (res["phase_init_s"]
                     + total_rounds * res["phase_kmeans_round_s"]
                     + iters * res["phase_ridge_s"])
        res["accounted_s"] = round(accounted, 4)
        res["accounted_frac"] = round(
            accounted / max(elapsed - res.get("dispatch_s", 0.0), 1e-9), 3)
    return res


if __name__ == "__main__":
    main()
