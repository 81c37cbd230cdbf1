"""Per-program compile-cost accounting for the bench workload.

VERDICT r2 #1: the 545 s warm-up needs a breakdown before it can shrink.
For each engine program (data gen / init_fn / iter_fn / fit_fn) this times

  lower_s        client-side tracing + StableHLO lowering
  compile_s      jax .compile() — client-side XLA work (or a local-cache load)
  first_exec_s   first execution — on remote-tunnel backends (axon) this pays
                 the SERVER-side compile of the program
  exec_s         steady-state execution

Usage:  python tools/compile_probe.py [--n N] [--fresh] [--programs a,b,c]
  --fresh   perturb N by +1 chunk so every program is new to both caches
            (measures true cold-compile cost).

Prints one JSON line per program plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import numpy as np


def sync(out):
    import jax
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))


def probe(name, jitted, *args):
    t0 = time.time()
    lowered = jitted.lower(*args)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    t0 = time.time()
    out = compiled(*args)
    sync(out)
    t_first = time.time() - t0
    t0 = time.time()
    out = compiled(*args)
    sync(out)
    t_exec = time.time() - t0
    rec = {"program": name, "lower_s": round(t_lower, 2),
           "compile_s": round(t_compile, 2),
           "first_exec_s": round(t_first, 2), "exec_s": round(t_exec, 3)}
    print(json.dumps(rec), flush=True)
    return rec, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=858_000)
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--programs", default="gen,init,iter,fit")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from harmonypy_tpu.config import (EngineConfig, fused_geometry_ok,
                                      pallas_supported)
    from harmonypy_tpu.engine import get_engine
    from harmonypy_tpu.state import HarmonyData, HarmonyParams
    from harmonypy_tpu.parallel.mesh import make_mesh, AXIS

    N = args.n + (2048 if args.fresh else 0)
    d, B, K = 29, 3, 100
    mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    use_pallas = (mesh.devices.flat[0].platform == "tpu"
                  and pallas_supported(N, n_dev))
    cfg = EngineConfig(N=N, d=d, K=K, B=B, n_devices=n_dev,
                       use_pallas=use_pallas,
                       use_fused_xla=(not use_pallas)
                       and fused_geometry_ok(N, n_dev))
    engine = get_engine(cfg, mesh)
    want = set(args.programs.split(","))

    def gen(key):
        kc, kg, kb, ks, kn = jax.random.split(key, 5)
        centers = jax.random.normal(kc, (24, d), jnp.float32) * 5.0
        groups = jax.random.randint(kg, (cfg.N_pad,), 0, 24)
        batches = jax.random.randint(kb, (cfg.N_pad,), 0, B)
        shifts = jax.random.normal(ks, (B, d), jnp.float32) * 1.5
        noise = jax.random.normal(kn, (cfg.N_pad, d), jnp.float32)
        off = jnp.arange(cfg.N_pad) % cfg.N_local
        gid = (jnp.arange(cfg.N_pad) // cfg.N_local) * cfg.N_shard_real + off
        mask = ((off < cfg.N_shard_real) & (gid < cfg.N)).astype(jnp.float32)
        Z = (centers[groups] + shifts[batches] + noise).T * mask[None, :]
        Phi = (batches[None, :] == jnp.arange(B)[:, None]
               ).astype(jnp.float32) * mask[None, :]
        return Z, Phi, mask

    sh2 = NamedSharding(mesh, P(None, AXIS))
    sh1 = NamedSharding(mesh, P(AXIS))
    gen_j = jax.jit(gen, out_shardings=(sh2, sh2, sh1))
    key = jax.random.PRNGKey(0)
    total0 = time.time()
    if "gen" in want:
        _, (Z, Phi, mask) = probe("gen", gen_j, key)
    else:
        Z, Phi, mask = gen_j(key)
        sync(mask)
    data = HarmonyData(Z_orig=Z, Phi=Phi, mask=mask)
    params = HarmonyParams(
        theta=jnp.full((B,), 2.0, jnp.float32),
        sigma=jnp.full((K,), 0.1, jnp.float32),
        lamb=jnp.asarray([0.0] + [1.0] * B, jnp.float32),
        Pr_b=jnp.sum(Phi, axis=1).astype(jnp.float32) / N,
    )

    state = None
    if "init" in want:
        _, state = probe("init_fn", engine.init_fn, data, params, key)
    if "iter" in want and state is not None:
        # iter_fn donates its first arg; re-init for the two executions.
        t0 = time.time()
        lowered = engine.iter_fn.lower(state, data, params)
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        t0 = time.time()
        out = compiled(state, data, params)
        sync(out)
        t_first = time.time() - t0
        state2 = engine.init_fn(data, params, key)
        sync(state2)
        t0 = time.time()
        out = compiled(state2, data, params)
        sync(out)
        t_exec = time.time() - t0
        print(json.dumps({"program": "iter_fn", "lower_s": round(t_lower, 2),
                          "compile_s": round(t_compile, 2),
                          "first_exec_s": round(t_first, 2),
                          "exec_s": round(t_exec, 3)}), flush=True)
    if "fit" in want:
        probe("fit_fn", engine.fit_fn, data, params, key)
    print(json.dumps({"total_s": round(time.time() - total0, 1),
                      "n": N, "use_pallas": use_pallas,
                      "platform": mesh.devices.flat[0].platform}), flush=True)


if __name__ == "__main__":
    main()
