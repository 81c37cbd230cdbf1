"""A/B: stored-R (Pallas) vs deferred-R (fused-XLA) at the headline 858k
workload on one chip (VERDICT r2 #6 evidence).

Stored-path ridge reads the K x N array twice (normal equations + apply);
deferred mode never materializes it and instead replays the final E-step
round twice. This measures both full fits back-to-back on the same chip
(only back-to-back numbers are comparable on the time-shared tunnel).

Prints one JSON line per variant.
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    from harmonypy_tpu.config import EngineConfig
    from harmonypy_tpu.engine import get_engine
    from harmonypy_tpu.state import HarmonyData, HarmonyParams
    from harmonypy_tpu.parallel.mesh import make_mesh, AXIS
    from bench import N_CELLS, N_PCS, N_BATCHES, K, _gen_host

    mesh = make_mesh(n_devices=1)

    def run_variant(name, **cfg_kw):
        cfg = EngineConfig(N=N_CELLS, d=N_PCS, K=K, B=N_BATCHES,
                           n_devices=1, **cfg_kw)
        engine = get_engine(cfg, mesh)
        Zh, Ph, mh = _gen_host(cfg)
        sh2 = NamedSharding(mesh, P(None, AXIS))
        sh1 = NamedSharding(mesh, P(AXIS))
        data = HarmonyData(Z_orig=jax.device_put(Zh, sh2),
                           Phi=jax.device_put(Ph, sh2),
                           mask=jax.device_put(mh, sh1))
        params = HarmonyParams(
            theta=jnp.full((N_BATCHES,), 2.0, jnp.float32),
            sigma=jnp.full((K,), 0.1, jnp.float32),
            lamb=jnp.asarray([0.0] + [1.0] * N_BATCHES, jnp.float32),
            Pr_b=jnp.asarray(Ph.sum(axis=1) / N_CELLS, jnp.float32))

        def run():
            st = engine.fit_fn(data, params, jax.random.PRNGKey(0))
            return st, int(np.asarray(st.n_rounds))

        t0 = time.time()
        st, it = run()
        warm = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            st, it = run()
            best = min(best, time.time() - t0)
        rounds = [int(x) for x in np.asarray(st.kmeans_rounds[:it])]
        print(json.dumps({"variant": name, "fit_s": round(best, 4),
                          "warmup_s": round(warm, 1), "iters": it,
                          "rounds": rounds}), flush=True)
        return best

    a = run_variant("stored_pallas", use_pallas=True)
    b = run_variant("defer_xla", use_fused_xla=True, defer_r=True)
    c = run_variant("stored_xla", use_fused_xla=True)
    d = run_variant("defer_pallas", use_pallas=True, defer_r=True)
    print(json.dumps({"defer_vs_stored_xla": round(b / c, 3),
                      "defer_vs_pallas": round(b / a, 3),
                      "defer_pallas_vs_defer_xla": round(d / b, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
