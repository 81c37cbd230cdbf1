"""Capture a jax.profiler device trace of the hot k-means rounds and print
the top device ops by total time.

Backs the E-step efficiency claims with a real artifact (round-2 VERDICT
weak #4 asked for profiler evidence behind "VPU-bound, not HBM-bound"):
the summary attributes device time to named ops (fusions, custom-calls,
convert/exp/reduce etc.), so "the non-GEMM share of a round is X%" is a
measured number rather than an inference from one negative experiment.

Usage:
  python tools/trace_summary.py [--n 858000] [--rounds 20] [--top 25]
                                [--json out.json] [--keep-trace DIR]

Prints one line per op: total_ms, calls, name; then a GEMM/non-GEMM split.
The trace is written to a temp dir (or --keep-trace DIR for TensorBoard)
and the .trace.json.gz events are aggregated here (memory: aggregate "X"
events by name; the Pallas kernel shows up as `body.N` custom-calls).
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import tempfile

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))


def _build(n, mesh):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from harmonypy_tpu.config import EngineConfig, auto_chunk_size
    from harmonypy_tpu.engine import get_engine
    from harmonypy_tpu.state import HarmonyData, HarmonyParams

    d, B, K = 29, 3, 100
    n_dev = int(mesh.devices.size)
    cfg = EngineConfig(N=n, d=d, K=K, B=B, n_devices=n_dev,
                      use_fused_xla=True, defer_r=True,
                      chunk_size=auto_chunk_size(n))
    engine = get_engine(cfg, mesh)
    rng = np.random.default_rng(0)
    off = np.arange(cfg.N_pad) % cfg.N_local
    gid = (np.arange(cfg.N_pad) // cfg.N_local) * cfg.N_shard_real + off
    mask_h = ((off < cfg.N_shard_real) & (gid < n)).astype(np.float32)
    Z = rng.standard_normal((d, cfg.N_pad)).astype(np.float32) * mask_h
    batches = rng.integers(0, B, size=cfg.N_pad)
    Phi = ((batches[None, :] == np.arange(B)[:, None]).astype(np.float32)
           * mask_h[None, :])
    sh2 = NamedSharding(mesh, P(None, "cells"))
    sh1 = NamedSharding(mesh, P("cells"))
    data = HarmonyData(Z_orig=jax.device_put(Z, sh2),
                       Phi=jax.device_put(Phi, sh2),
                       mask=jax.device_put(mask_h, sh1))
    params = HarmonyParams(
        theta=jnp.full((B,), 2.0, jnp.float32),
        sigma=jnp.full((K,), 0.1, jnp.float32),
        lamb=jnp.asarray([0.0] + [1.0] * B, jnp.float32),
        Pr_b=(jnp.sum(data.Phi, axis=1) / n).astype(jnp.float32))
    return cfg, engine, data, params


def aggregate_trace(trace_dir: str) -> dict[str, tuple[float, int]]:
    """Sum 'X' (complete) event durations by name across every
    .trace.json.gz under trace_dir. Returns {name: (total_us, calls)}."""
    out: dict[str, tuple[float, int]] = {}
    for path in glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                          recursive=True):
        with gzip.open(path, "rt") as f:
            events = json.load(f).get("traceEvents", [])
        for ev in events:
            if ev.get("ph") != "X":
                continue
            name = ev.get("name", "?")
            dur = float(ev.get("dur", 0.0))
            t, c = out.get(name, (0.0, 0))
            out[name] = (t + dur, c + 1)
    return out


_GEMM_MARKERS = ("dot", "gemm", "matmul", "convolution", "cublas", "mxu")

# Host-side bookkeeping events (python frames, executor scheduling, the
# readback) — excluded from the op ranking so device work dominates it.
_HOST_MARKERS = ("$", "thunkexecutor", "np.asarray", "copy-done",
                 "infeed", "outfeed", "program_interpreter")


def _is_host(name: str) -> bool:
    n = name.lower()
    return name.startswith("$") or any(m in n for m in _HOST_MARKERS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=858_000)
    ap.add_argument("--rounds", type=int, default=20)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--json", default=None,
                    help="also write the aggregate as JSON")
    ap.add_argument("--keep-trace", default=None,
                    help="trace dir to keep (TensorBoard-viewable)")
    args = ap.parse_args()

    import dataclasses

    import jax

    from harmonypy_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    cfg, engine, data, params = _build(args.n, mesh)
    # Pin the iteration to exactly `rounds` k-means rounds so the trace is
    # dominated by the steady-state E-step (epsilon 0 disables early exit).
    from harmonypy_tpu.engine import get_engine
    cfg_r = dataclasses.replace(cfg, max_iter_kmeans=args.rounds,
                                epsilon_kmeans=0.0, max_iter_harmony=1)
    eng = get_engine(cfg_r, mesh)
    key = jax.random.PRNGKey(0)
    state = eng.init_fn(data, params, key)
    # Warm (compile + first server-side exec) OUTSIDE the trace.
    int(np.asarray(eng.iter_fn(state, data, params).n_rounds))

    tdir = args.keep_trace or tempfile.mkdtemp(prefix="harmony_trace_")
    state = eng.init_fn(data, params, key)
    int(np.asarray(state.n_kmeans))
    jax.profiler.start_trace(tdir)
    st = eng.iter_fn(state, data, params)
    int(np.asarray(st.n_rounds))                     # real sync via readback
    jax.profiler.stop_trace()

    agg = {k: v for k, v in aggregate_trace(tdir).items()
           if not _is_host(k)}
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    total_us = sum(t for t, _ in agg.values())
    gemm_us = sum(t for nm, (t, _) in agg.items()
                  if any(m in nm.lower() for m in _GEMM_MARKERS))
    print(f"# trace dir: {tdir} | N={args.n} rounds={args.rounds} "
          f"chunk={cfg.chunk_size} devices={int(mesh.devices.size)}")
    print(f"# total traced op time {total_us / 1e3:.1f} ms | "
          f"GEMM-named {gemm_us / 1e3:.1f} ms "
          f"({100 * gemm_us / max(total_us, 1):.0f}%) | "
          f"other {100 * (1 - gemm_us / max(total_us, 1)):.0f}%")
    for name, (t, c) in rows[: args.top]:
        print(f"{t / 1e3:10.2f} ms {c:6d}x  {name[:110]}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"n": args.n, "rounds": args.rounds,
                       "total_us": total_us, "gemm_us": gemm_us,
                       "ops": {k: {"us": v[0], "calls": v[1]}
                               for k, v in rows}}, f, indent=1)


if __name__ == "__main__":
    main()
