"""Single-chip K=200 x 5M cells via deferred-R (VERDICT r2 #2).

The stored-R footprint of this workload (4 GB for R alone, ~8.4 GB modeled
total) exceeds a single 16 GB chip once XLA working memory is added — the
round-2 finding was that it OOMs even with bfloat16 R. In deferred-R mode
the K x N array never exists, the modeled footprint is ~5.9 GB, and the fit
runs on one chip.

Prints one JSON line:
  {"metric": "harmony_5M_K200_one_chip_defer", "value": <fit seconds>, ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import numpy as np

N_CELLS = 5_000_000
N_PCS = 29
N_BATCHES = 3
K = 200


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from harmonypy_tpu.config import EngineConfig
    from harmonypy_tpu.engine import get_engine
    from harmonypy_tpu.state import HarmonyData, HarmonyParams
    from harmonypy_tpu.parallel.mesh import make_mesh, AXIS
    from harmonypy_tpu.utils.memory import memory_envelope

    iters = int(os.environ.get("XLARGE_ITERS", 2))
    mesh = make_mesh(n_devices=1)
    cfg = EngineConfig(N=N_CELLS, d=N_PCS, K=K, B=N_BATCHES, n_devices=1,
                       use_fused_xla=True, defer_r=True,
                       max_iter_harmony=iters)
    env = memory_envelope(cfg)
    print(f"# modeled envelope: "
          + ", ".join(f"{k} {v/1e9:.2f}GB" for k, v in env.items()),
          file=sys.stderr)
    engine = get_engine(cfg, mesh)

    rng = np.random.default_rng(0)
    t0 = time.time()
    centers = rng.normal(size=(24, N_PCS)).astype(np.float32) * 5.0
    shifts = rng.normal(size=(N_BATCHES, N_PCS)).astype(np.float32) * 1.5
    g = rng.integers(0, 24, size=cfg.N_pad)
    b = rng.integers(0, N_BATCHES, size=cfg.N_pad)
    mask = (np.arange(cfg.N_pad) < N_CELLS).astype(np.float32)
    Z = ((centers[g] + shifts[b]
          + rng.normal(size=(cfg.N_pad, N_PCS)).astype(np.float32)).T
         * mask[None, :])
    Phi = ((b[None, :] == np.arange(N_BATCHES)[:, None]).astype(np.float32)
           * mask[None, :])
    t_gen = time.time() - t0

    sh2 = NamedSharding(mesh, P(None, AXIS))
    sh1 = NamedSharding(mesh, P(AXIS))
    t0 = time.time()
    data = HarmonyData(Z_orig=jax.device_put(Z, sh2),
                       Phi=jax.device_put(Phi, sh2),
                       mask=jax.device_put(mask, sh1))
    jax.block_until_ready(data)
    t_up = time.time() - t0
    params = HarmonyParams(
        theta=jnp.full((N_BATCHES,), 2.0, jnp.float32),
        sigma=jnp.full((K,), 0.1, jnp.float32),
        lamb=jnp.asarray([0.0] + [1.0] * N_BATCHES, jnp.float32),
        Pr_b=jnp.asarray(Phi.sum(axis=1) / N_CELLS, jnp.float32))

    def run():
        st = engine.fit_fn(data, params, jax.random.PRNGKey(0))
        return st, int(np.asarray(st.n_rounds))

    t0 = time.time()
    state, it = run()
    warm = time.time() - t0
    t0 = time.time()
    state, it = run()
    elapsed = time.time() - t0
    rounds = [int(x) for x in np.asarray(state.kmeans_rounds[:it])]
    print(json.dumps({
        "metric": "harmony_5M_K200_one_chip_defer", "value": round(elapsed, 3),
        "unit": "s", "iters": it, "rounds": rounds,
        "warmup_s": round(warm, 1), "gen_s": round(t_gen, 1),
        "upload_s": round(t_up, 1),
        "cells_per_s": round(N_CELLS / elapsed),
        "modeled_gb": round(env["total"] / 1e9, 2)}), flush=True)


if __name__ == "__main__":
    main()
