"""Profiling / tracing helpers.

The reference has no profiling support beyond ad-hoc time() calls in its test
harness (SURVEY.md §5). Here:

  trace(dir)        context manager around jax.profiler.trace — captures a
                    TensorBoard-viewable device trace of everything inside.
  phase_timer()     host-side wall-clock accumulator with true device sync
                    (scalar readback — plain block_until_ready can return
                    early through remote-device tunnels).
  profile_fit(...)  per-phase device-time breakdown of a Harmony fit (init /
                    k-means round / ridge) measured through the real engine
                    programs, plus an effective-HBM estimate for the E-step.
"""

from __future__ import annotations

import contextlib
import os
import time

import numpy as np

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(x) -> None:
    """Force a real device sync by reading one scalar back to the host."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


class phase_timer:
    """Accumulate wall-clock per named phase with device-synced boundaries.

    >>> pt = phase_timer()
    >>> with pt("cluster"):   # doctest: +SKIP
    ...     state = engine.iter_fn(state, data, params)
    >>> pt.timings            # doctest: +SKIP
    {'cluster': 0.0123}
    """

    def __init__(self):
        self.timings: dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, name: str, sync=None):
        t0 = time.time()
        try:
            yield
        finally:
            if sync is not None:
                device_sync(sync)
            self.timings[name] = self.timings.get(name, 0.0) + time.time() - t0


def estep_traffic_model_gb(cfg) -> float:
    """Minimum per-kmeans-round HBM traffic of the fused E-step
    (docs/design.md §2): read Z_cos + Phi once, write R once — except in
    deferred-R mode, where R is never written (the round is then
    VPU/compute-bound, not bandwidth-bound, so the frac-of-peak number is a
    lower bound on efficiency rather than a roofline position)."""
    r_bytes = 0 if cfg.defer_r else (2 if cfg.r_dtype == "bfloat16" else 4)
    return cfg.N * (4 * cfg.d + 4 * cfg.B + r_bytes * cfg.K) / 1e9


def estep_vpu_floor_s(cfg, elementwise_ops_per_s: float = 3.8e12,
                      ops_per_transcendental: float = 7.0) -> float:
    """Transcendental-bound floor of one k-means round: the E-step evaluates
    K·N `exp` (the softmax IS the algorithm) and, with the reference-form
    objective, K·N `log` (the R·log R entropy term). This is the binding
    resource of the deferred-R round (docs/deferred_roofline.md: HBM floor
    73 µs, MXU floor 27 µs, VPU floor ~0.4 ms at 858k×100) — report the
    round's position against it so the bench artifact certifies the
    "near-floor" claim rather than the misleading HBM fraction."""
    transcendentals = 2.0 * cfg.K * cfg.N
    return transcendentals * ops_per_transcendental / elementwise_ops_per_s


def profile_fit(cfg, mesh, data, params, key=None, reps: int = 16,
                budget_s: float | None = None,
                hbm_peak_gbps: float | None = None,
                split_init: bool = False) -> dict:
    """Per-phase device time through the REAL engine code paths:

      dispatch_s            host<->runtime round-trip floor (min of 5 noops)
      phase_init_s          init_fn (k-means++/|| seeding + initial stats)
      phase_init_seeding_s  (split_init=True only) the k-means++/|| seeding
                            + Lloyd portion of init alone; init minus this
                            is the initial-statistics cost. Opt-in: the
                            probe is one extra compiled program, which
                            remote-tunnel backends charge a server-side
                            compile for (docs/warmup.md)
      phase_kmeans_round_s  one fuzzy-k-means round, by differencing an
                            iteration pinned to 1+reps rounds against one
                            pinned to 1 round (dispatch cancels; epsilon=0
                            makes the trip counts exact)
      phase_ridge_s         ridge correction, amortized in-graph over a fit
                            pinned to `reps` harmony iterations of 1 round
      estep_hbm_gbps[_frac] effective bandwidth vs estep_traffic_model_gb
      fused_xla_round_s     (Pallas configs only) the same round through the
                            fused-XLA E-step — the per-chip cost a >1-chip
                            mesh would see

    The E-step, the Y/dist update, and the objective are ONE fused program
    by design (the kernel emits the next round's centroid numerator and the
    objective partials with no extra pass over R), so "kmeans_round" is
    their joint cost.

    Budgeted and best-effort: each probe program's FIRST execution may pay a
    server-side compile on remote-tunnel backends (minutes, uncached
    locally). When accumulated time exceeds `budget_s` (default
    $BENCH_PHASE_BUDGET_S or 360), remaining probes are skipped and whatever
    was measured is returned with a "phases_truncated" note.
    """
    import dataclasses

    import jax.numpy as jnp

    from ..engine import get_engine

    if budget_s is None:
        budget_s = float(os.environ.get("BENCH_PHASE_BUDGET_S", 360))
    if hbm_peak_gbps is None:
        hbm_peak_gbps = float(os.environ.get("BENCH_HBM_PEAK_GBPS", 819))
    if key is None:
        key = jax.random.PRNGKey(0)
    t_start = time.time()

    class OverBudget(Exception):
        pass

    def check_budget():
        if time.time() - t_start > budget_s:
            raise OverBudget(f"phase-probe budget {budget_s}s exceeded")

    def sync(out):
        int(np.asarray(jax.tree.leaves(out)[0].ravel()[0]))

    def timed(fn, *a, reps_min: int = 2):
        """Min-of-reps timing after a warm-up execution. Dispatch jitter
        through a tunnel is one-sided (delays only), so the min is the
        estimator for every probe — single-shot probe timings previously
        inflated the bench accounting by ~9% (ADVICE r4)."""
        sync(fn(*a))                                  # warm-up / compile
        best = float("inf")
        for _ in range(reps_min):
            t0 = time.time()
            sync(fn(*a))
            best = min(best, time.time() - t0)
        return best

    def iter_time(cfg_v):
        """Time iter_fn (fresh state per call: iter_fn donates). Dispatch
        jitter through a tunnel is one-sided (delays only), so take the min
        of two measurements."""
        eng = get_engine(cfg_v, mesh)
        st = eng.init_fn(data, params, key)
        t_init_meas = timed(eng.init_fn, data, params, key)
        sync(eng.iter_fn(st, data, params))           # warm-up / compile
        best = float("inf")
        for _ in range(3):
            st2 = eng.init_fn(data, params, key)
            sync(st2)
            t0 = time.time()
            sync(eng.iter_fn(st2, data, params))
            best = min(best, time.time() - t0)
        return best, t_init_meas

    def round_time(base_cfg):
        t = {}
        for n_rounds in (reps + 1, 1):
            check_budget()
            cfg_v = dataclasses.replace(
                base_cfg, max_iter_kmeans=n_rounds, epsilon_kmeans=0.0,
                max_iter_harmony=1)
            t[n_rounds], t_init_meas = iter_time(cfg_v)
        # Guard against dispatch noise exceeding the differenced signal.
        return max((t[reps + 1] - t[1]) / reps, 1e-6), t_init_meas

    res = {}
    try:
        # Dispatch floor: every host-timed call through the (tunneled)
        # runtime pays this; subtract it so phases sum to device time.
        noop = jax.jit(lambda x: x + 1)
        sync(noop(jnp.zeros(())))
        d0 = min(timed(noop, jnp.zeros(())) for _ in range(5))
        res["dispatch_s"] = round(d0, 4)

        t_round, t_init_meas = round_time(cfg)
        t_init = max(t_init_meas - d0, 0.0)
        round_gb = estep_traffic_model_gb(cfg)
        res["phase_init_s"] = round(t_init, 4)
        # round_time floors at 1e-6, but 5-decimal rounding would flush a
        # sub-5us CPU round back to exactly 0.0 — keep the floor visible so
        # ratios against this field (e.g. the VPU-floor fraction) stay
        # finite on any backend.
        res["phase_kmeans_round_s"] = max(round(t_round, 5), 1e-6)
        frac = round_gb / t_round / hbm_peak_gbps
        if frac <= 1.0:
            res["estep_hbm_gbps"] = round(round_gb / t_round, 1)
            res["estep_hbm_frac_of_peak"] = round(frac, 3)
        else:
            # A differenced round implying more than peak HBM bandwidth is
            # dispatch jitter, not physics — flag instead of reporting it.
            res["estep_round_noisy"] = True
        if cfg.defer_r:
            # Deferred rounds are VPU-bound, not bandwidth-bound: report
            # the round's position against the transcendental floor (the
            # meaningful roofline for this path; the HBM fraction above is
            # a lower bound on efficiency only).
            vf = estep_vpu_floor_s(cfg)
            res["estep_vpu_floor_s"] = float(f"{vf:.3g}")
            res["estep_vpu_floor_frac"] = float(f"{vf / t_round:.3g}")

        if split_init:
            # Seeding-only program mirroring _init_impl's front half
            # (engine.py:204-213): normalize + k-means++/|| + Lloyd.
            check_budget()
            from jax.sharding import PartitionSpec as P

            from ..ops.kmeans import kmeans_init
            from ..ops.normalize import l2_normalize_cols
            from ..parallel.mesh import AXIS

            eng = get_engine(cfg, mesh)

            def seed_only(data_v, key_v):
                with jax.default_matmul_precision(cfg.matmul_precision):
                    Z_cos = l2_normalize_cols(data_v.Z_orig)
                    return kmeans_init(jax.random.split(key_v)[1], Z_cos,
                                       cfg, AXIS)

            seed_fn = jax.jit(jax.shard_map(
                seed_only, mesh=mesh, in_specs=(eng.data_specs, P()),
                out_specs=P(), check_vma=False))
            t_seed = max(timed(seed_fn, data, key) - d0, 0.0)
            res["phase_init_seeding_s"] = round(t_seed, 4)
            res["phase_init_stats_s"] = round(max(t_init - t_seed, 0.0), 4)

        # Ridge, amortized in-graph: fit = init + reps*(round + ridge).
        check_budget()
        cfg_r = dataclasses.replace(
            cfg, max_iter_kmeans=1, epsilon_kmeans=0.0,
            max_iter_harmony=reps, epsilon_harmony=-1e30)
        t_fit_r = timed(get_engine(cfg_r, mesh).fit_fn, data, params, key)
        t_ridge = max((t_fit_r - d0 - t_init) / reps - t_round, 0.0)
        res["phase_ridge_s"] = round(t_ridge, 5)

        if cfg.use_pallas:
            # The multi-chip (fused-XLA) E-step's per-chip round cost —
            # ~2x the Pallas kernel (its stats reductions re-read r from
            # HBM, which the kernel keeps in VMEM).
            cfg_x = dataclasses.replace(cfg, use_pallas=False,
                                        use_fused_xla=True)
            tx, _ = round_time(cfg_x)
            res["fused_xla_round_s"] = round(tx, 5)
        elif cfg.defer_r and jax.devices()[0].platform == "tpu":
            # A/B vs the stored-R Pallas kernel (the former default).
            from ..config import pallas_supported
            if pallas_supported(cfg.N, cfg.n_devices, cfg.block_size,
                                cfg.chunk_size):
                check_budget()
                cfg_p = dataclasses.replace(cfg, defer_r=False,
                                            use_fused_xla=False,
                                            use_pallas=True)
                tp, _ = round_time(cfg_p)
                res["pallas_stored_round_s"] = round(tp, 5)
    except OverBudget as e:
        res["phases_truncated"] = str(e)
    return res
