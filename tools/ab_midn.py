"""A/B: per-cell vs fused(deferred-R) E-step at mid-size N, on one chip.

Validates the `_PER_CELL_MAX_N` crossover (config.py): auto_chunk_size
keeps N < 20,480 on the per-cell path and shrinks the fused chunk size for
20,480 <= N < ~41k so those problems stay on the fused E-step. That
threshold came from a ~20k crossover measured in round 2; this tool
re-measures both paths back-to-back at several mid-size N (only
back-to-back numbers are comparable on the time-shared tunnel) so the
constant is backed by a current artifact rather than a remembered number.

For each N it runs a full fit on the per-cell path and on the fused path
with the auto chunk size, reporting best-of-3 fit seconds, harmony iters,
and total k-means rounds (paths converge at slightly different rates, so
`s_per_round` — fit time over total rounds — is the fairer kernel-speed
comparison; fit_s is what a user experiences).

Prints one JSON line per (N, variant) plus a summary line.
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

N_LIST = (16_384, 20_480, 28_672, 40_960)


def main():
    global N_LIST
    if os.environ.get("AB_MIDN_NS"):  # CPU smoke: e.g. AB_MIDN_NS=2048,4096
        N_LIST = tuple(int(x) for x in os.environ["AB_MIDN_NS"].split(","))
    import jax
    if os.environ.get("AB_PLATFORM"):  # e.g. cpu for a smoke run
        jax.config.update("jax_platforms", os.environ["AB_PLATFORM"])
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    from harmonypy_tpu.config import EngineConfig, default_nclust
    from harmonypy_tpu.engine import get_engine
    from harmonypy_tpu.parallel.mesh import AXIS, make_mesh
    from harmonypy_tpu.state import HarmonyData, HarmonyParams
    import bench
    from bench import N_BATCHES, _gen_host

    mesh = make_mesh(n_devices=1)
    rows = []

    def run_variant(n, name, **cfg_kw):
        k = default_nclust(n)
        cfg = EngineConfig(N=n, d=bench.N_PCS, K=k, B=N_BATCHES,
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
            sigma=jnp.full((k,), 0.1, jnp.float32),
            lamb=jnp.asarray([0.0] + [1.0] * N_BATCHES, jnp.float32),
            Pr_b=jnp.asarray(Ph.sum(axis=1) / n, jnp.float32))

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
        total_rounds = int(np.asarray(
            jnp.sum(st.kmeans_rounds[:st.n_harmony])))
        row = {"N": n, "variant": name, "K": k,
               "chunk_size": cfg.chunk_size if cfg.fused_estep else None,
               "fit_s": round(best, 4), "warmup_s": round(warm, 1),
               "iters": int(np.asarray(st.n_harmony)),
               "total_rounds": total_rounds,
               "s_per_round": round(best / max(total_rounds, 1), 5)}
        print(json.dumps(row), flush=True)
        rows.append(row)
        return best

    import math

    from harmonypy_tpu.config import fused_geometry_ok

    def forced_fused_chunk(n, block_size=0.05):
        """Largest lane-aligned power-of-two chunk with one real chunk per
        block — what auto_chunk_size would pick if it did NOT prefer the
        per-cell path below _PER_CELL_MAX_N (forcing fused is the whole
        point of this A/B, so the auto heuristic can't be used here)."""
        nb = int(math.ceil(1.0 / block_size))
        c = min(2048, 1 << int(math.floor(math.log2(max(n // nb, 1)))))
        return c if c >= 128 and fused_geometry_ok(n, 1, block_size, c) \
            else None

    for n in N_LIST:
        a = run_variant(n, "per_cell")
        c = forced_fused_chunk(n)
        if c is None:
            print(json.dumps({"N": n, "fused_defer": "no valid geometry"}),
                  flush=True)
            continue
        b = run_variant(n, "fused_defer", use_fused_xla=True, defer_r=True,
                        chunk_size=c)
        print(json.dumps({"N": n, "fused_over_percell_fit": round(b / a, 3)}),
              flush=True)

    per = {r["N"]: r for r in rows if r["variant"] == "per_cell"}
    fus = {r["N"]: r for r in rows if r["variant"] == "fused_defer"}
    both = [n for n in N_LIST if n in per and n in fus]
    crossover = [n for n in both if fus[n]["fit_s"] < per[n]["fit_s"]]
    print(json.dumps({
        "summary": "mid-N per-cell vs fused(defer)",
        "fused_faster_at": crossover,
        "per_cell_max_n_consistent": all(
            (n < 20_480) == (per[n]["fit_s"] <= fus[n]["fit_s"])
            for n in both)}), flush=True)


if __name__ == "__main__":
    main()
