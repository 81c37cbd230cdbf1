"""Per-device memory envelope + capacity preflight.

The CPU reference holds all state in host RAM (reference harmony.py:35-46) —
any workload that fits in RAM runs. An accelerator chip has a hard HBM
ceiling instead, and XLA's out-of-memory error surfaces as a raw allocator
failure long after the user could have acted. This module models the
per-device footprint of a Harmony fit up front (docs/design.md memory
envelope) so `run_harmony` can fail fast with an actionable message — or
auto-select a lower-footprint configuration — before any compilation starts.

The model is intentionally a slight over-estimate (a fixed head-room factor
covers XLA temporaries whose exact size depends on fusion decisions).
"""

from __future__ import annotations

import os

from ..config import EngineConfig

# Fraction of the device's reported capacity the plan may use: leaves room
# for XLA scratch, collectives buffers, and allocator fragmentation.
_HEADROOM = 0.92
# Multiplier on the modeled array bytes for fusion-dependent temporaries.
_SLACK = 1.12


def _fused_chunk_rows(cfg: EngineConfig) -> int:
    return cfg.N_local // cfg.chunk_size  # nc_cap + 1 (incl. dummy chunk)


def _kmeans_init_bytes(cfg: EngineConfig) -> int:
    """Replicated k-means init working set: the (d, S) sample, the (T, S)
    candidate-distance slabs, and Lloyd's (K, S) score/assignment arrays."""
    S = min(cfg.kmeanspp_sample, cfg.N)
    T = max(cfg.kmeanspp_trials, 2)
    return S * (cfg.d + T + 3 * cfg.K) * 4


def memory_envelope(cfg: EngineConfig) -> dict:
    """Modeled peak per-device bytes of a fit under `cfg`, by component.

    Returns a dict of component -> bytes plus "total" (with slack applied).
    """
    Nl, K, d, B = cfg.N_local, cfg.K, cfg.d, cfg.B
    r_bytes = 2 if cfg.r_dtype == "bfloat16" else 4
    f = 4  # float32

    if cfg.defer_r:
        # Deferred-R: no K x N array ever exists. N-scale arrays are
        # d/B-wide (Z_orig + Z_corr + Z_cos + rep_Zcos + Phi + mask + the
        # replay passes' chunk-major views of two of them); K-scale memory
        # is the per-chunk caches and the ridge replay's stacked
        # normal-equation buffer.
        from ..ops.partition import partition_geometry
        geom = partition_geometry(cfg)
        nc1 = geom.nc_cap + 1
        B1 = cfg.B1
        env = {
            "Z (orig+corr+cos+replay)": (4 + 2) * d * Nl * f,
            "Phi+mask": (B + 1) * Nl * f,
            "chunk caches (x2)": 2 * nc1 * K * (B + 1) * f,
            "ridge normal-eq buffer": nc1 * B1 * (B1 + d) * K * f,
            "E-step slabs": geom.J_shard * cfg.chunk_size
            * (4 * K + 2 * (d + B) + B1 * d) * f,
            "centroid buffers": nc1 * K * (d + 2) * f,
        }
        env["kmeans init"] = _kmeans_init_bytes(cfg)
        total = sum(env.values())
        env["total"] = int(total * _SLACK)
        return env

    env = {
        "R": K * Nl * r_bytes,
        # The fit/iter while_loop carries R, which XLA double-buffers.
        # This is the recorded cause of the K=200 x 5M bf16 stored-R OOM.
        "R loop double-buffer": K * Nl * r_bytes,
        "Z (orig+corr+cos)": 3 * d * Nl * f,
        "Phi+mask": (B + 1) * Nl * f,
    }
    if cfg.fused_estep:
        nc1 = _fused_chunk_rows(cfg)
        # Per-chunk stats cache + the fused-XLA path's per-chunk centroid /
        # objective buffers (ops/update_r_fused_xla.py scan carries).
        env["chunk caches"] = nc1 * K * (2 * (B + 1) + d + 2) * f
        # Stored-path init materializes K x N temporaries (engine.py
        # _init_impl): dist_mat, the fp32 pre-cast R, and the physically
        # retiled (K, nc, CH) reshapes for the objective partials — not all
        # live at once after XLA fusion. Modeled as 2 fp32 K x N arrays at
        # peak, calibrated between the two recorded data points: K=100 x 5M
        # x d=50 fp32 stored RAN on a 16 GB chip (models 12.9 GB); K=200 x
        # 5M x d=29 bf16 stored OOMed it (models 16.1 GB).
        env["init dist/R temporaries"] = 2 * K * Nl * f
        if not cfg.use_pallas:
            # Per-block working slabs: (J_shard, {d,B,K}, CH) gathers plus
            # the dist/scale/r intermediates at (J_shard, K, CH).
            from ..ops.partition import partition_geometry
            geom = partition_geometry(cfg)
            env["E-step slabs"] = geom.J_shard * cfg.chunk_size * (
                4 * K + d + 2 * B + 1 + d) * f
    else:
        # Per-cell path: dist_mat + scale_dist materialize at (K, N_local),
        # and the block scatter pays one extra full copy of R. Init's
        # dist_mat + fp32 R peak is within the same bound.
        env["dist+scale"] = 2 * K * Nl * f
        env["R copy (block scatter)"] = K * Nl * r_bytes
    env["kmeans init"] = _kmeans_init_bytes(cfg)

    total = sum(env.values())
    env["total"] = int(total * _SLACK)
    return env


def device_capacity_bytes(device) -> int | None:
    """Usable bytes on `device`, or None when unknown (e.g. CPU backends).

    Honors $HARMONYPY_DEVICE_MEM_BYTES as an override (testing / CPU caps).
    """
    override = os.environ.get("HARMONYPY_DEVICE_MEM_BYTES")
    if override:
        return int(override)
    try:
        stats = device.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    return int(limit) if limit else None


class CapacityError(RuntimeError):
    """The configured fit cannot fit in device memory; the message names the
    concrete remedies (more devices / low_memory / smaller problem)."""


def _fmt(b: float) -> str:
    return f"{b / 1e9:.2f} GB"


def check_capacity(cfg: EngineConfig, mesh) -> None:
    """Raise CapacityError when the modeled envelope exceeds the per-device
    capacity. No-op when the capacity is unknown (CPU without override)."""
    cap = device_capacity_bytes(mesh.devices.flat[0])
    if cap is None:
        return
    budget = int(cap * _HEADROOM)
    env = memory_envelope(cfg)
    if env["total"] <= budget:
        return

    # Build remedies: deferred-R, low_memory, then the minimum device count
    # that fits.
    remedies = []
    import dataclasses
    if not cfg.defer_r:
        from ..config import fused_geometry_ok
        if fused_geometry_ok(cfg.N, cfg.n_devices, cfg.block_size,
                             cfg.chunk_size):
            cfg_d = dataclasses.replace(cfg, defer_r=True, use_pallas=False,
                                        use_fused_xla=True)
            d_total = memory_envelope(cfg_d)["total"]
            if d_total <= budget:
                remedies.append(
                    f"pass defer_r=True (out-of-core R): modeled "
                    f"{_fmt(d_total)}/device fits")
    if cfg.r_dtype != "bfloat16" and not cfg.defer_r:
        cfg_lm = dataclasses.replace(cfg, r_dtype="bfloat16")
        lm_total = memory_envelope(cfg_lm)["total"]
        if lm_total <= budget:
            remedies.append(
                f"pass low_memory=True (bfloat16 R): modeled "
                f"{_fmt(lm_total)}/device fits")
        else:
            remedies.append(
                f"low_memory=True shrinks the model to {_fmt(lm_total)}"
                f"/device (still over budget)")
    for n in (2, 4, 8, 16, 32, 64, 128, 256):
        if n <= cfg.n_devices:
            continue
        cfg_n = dataclasses.replace(cfg, n_devices=n)
        if cfg_n.use_pallas:
            # The Pallas kernel is single-device-only; on n devices the
            # engine would run the fused-XLA E-step (or the per-cell path
            # if the chunk geometry no longer holds), so model THAT config
            # — its XLA slabs included — rather than an envelope the
            # engine cannot actually execute.
            from ..config import fused_geometry_ok as _fok
            fok = _fok(cfg.N, n, cfg.block_size, cfg.chunk_size)
            if cfg.defer_r and not fok:
                continue  # deferred-R needs the fused path; n can't run it
            cfg_n = dataclasses.replace(cfg_n, use_pallas=False,
                                        use_fused_xla=fok)
        if memory_envelope(cfg_n)["total"] <= budget:
            remedies.append(
                f"run on >= {n} devices (pass a {n}-device mesh): modeled "
                f"{_fmt(memory_envelope(cfg_n)['total'])}/device fits")
            break

    parts = ", ".join(f"{k} {_fmt(v)}" for k, v in env.items()
                      if k != "total")
    raise CapacityError(
        f"Modeled per-device memory for N={cfg.N}, K={cfg.K}, d={cfg.d}, "
        f"B={cfg.B} on {cfg.n_devices} device(s) is {_fmt(env['total'])} "
        f"({parts}), exceeding the usable capacity "
        f"{_fmt(budget)} (of {_fmt(cap)}). Remedies: "
        + ("; ".join(remedies) if remedies else
           "reduce N/K or use more devices")
        + ". Set HARMONYPY_SKIP_CAPACITY_CHECK=1 to attempt the run anyway.")
