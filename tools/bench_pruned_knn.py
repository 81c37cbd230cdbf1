"""At-scale exact-kNN A/B on the real chip: pruned vs brute vs approx.

The round-2 verdict (missing #3) asked for a sub-quadratic exact kNN to
replace the 241 s full-N brute force at 858k cells (the reference gets
this from a kd-tree, lisi.py:53). `ops/knn_pruned.py` is that answer;
this tool measures it at the bench large-tier shape (858k x 29, clumpy)
on the actual backend and reports:

  pruned_knn_s        end-to-end full-N exact LISI via knn="pruned"
                      (index build + certified search + brute fallback)
  pruned_cert_rate    fraction of queries certified exact (the remainder
                      was re-answered brute — result exact either way)
  brute_est_s         full-N brute-force estimate: measured time of a
                      16k-query slice, scaled by N / 16k (running the
                      real thing takes ~4 minutes of chip time)
  approx_knn_s        knn="approx" hardware top-k for context
  pruned_vs_brute_mad mean |LISI_pruned - LISI_brute| over the slice rows

Usage: python tools/bench_pruned_knn.py [--n 858000]
Prints one JSON line. Only back-to-back numbers are comparable on the
time-shared tunnel.
"""

from __future__ import annotations

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))  # repo root, for harmonypy_tpu

import numpy as np


def make_data(n: int, d: int = 29, seed: int = 0):
    """Same clumpy construction as benchmarks/knn_recall.py."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(24, d)).astype(np.float32) * 5.0
    g = rng.integers(0, 24, size=n)
    b = rng.integers(0, 3, size=n)
    shifts = rng.normal(size=(3, d)).astype(np.float32) * 1.5
    X = (centers[g] + shifts[b]
         + rng.normal(size=(n, d)).astype(np.float32))
    return X, b


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=858_000)
    ap.add_argument("--slice", type=int, default=16_384)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu for a smoke run)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import pandas as pd

    import harmonypy_tpu as hm
    from harmonypy_tpu.lisi import _knn_batched
    from harmonypy_tpu.ops.knn_pruned import (build_index,
                                              default_n_clusters, pruned_knn)

    n, d = args.n, 29
    X, b = make_data(n, d)
    meta = pd.DataFrame({"batch": pd.Categorical([f"b{i}" for i in b])})
    Xd = jax.device_put(jnp.asarray(X))
    Xd.block_until_ready()
    k = 89  # perplexity 30 -> 3*30 - 1

    out = {"platform": jax.devices()[0].platform, "n": n, "d": d}

    # -- pruned exact, end-to-end (index build included) ------------------
    t0 = time.time()
    index = build_index(Xd, default_n_clusters(n, k + 1))
    res = pruned_knn(Xd, k, index=index)
    if res is None:  # probe bailed — pruning cannot pay on this geometry
        out["pruned_probe_bailed"] = True
        print(json.dumps(out), flush=True)
        return
    cert = np.asarray(res[2])  # forces completion (host readback)
    t_search = time.time() - t0
    out["pruned_cert_rate"] = round(float(np.mean(cert)), 4)
    out["pruned_p_max"] = int(index.p_max)
    out["pruned_n_clusters"] = int(index.starts.shape[0])

    t0 = time.time()
    lisi_pruned = hm.compute_lisi(Xd, meta, ["batch"], knn="pruned")
    out["pruned_knn_s"] = round(time.time() - t0, 2)
    out["pruned_search_only_s"] = round(t_search, 2)

    # -- brute slice -> full-N estimate ------------------------------------
    m = args.slice
    qid = jnp.arange(m, dtype=jnp.int32)
    # Warm with the EXACT measured shape: _knn is shape-specialized, so a
    # smaller warm-up would leave the first (m, d) execution's server-side
    # compile inside the timed region (and brute_est_s scales it by n/m).
    np.asarray(_knn_batched(Xd[:m], Xd, k, qid=qid)[0])
    t0 = time.time()
    bd, bi = _knn_batched(Xd[:m], Xd, k, qid=qid)
    bd_np = np.asarray(bd)
    t_slice = time.time() - t0
    out["brute_slice_s"] = round(t_slice, 2)
    out["brute_est_s"] = round(t_slice * n / m, 1)

    # exactness on the slice: distances must agree to fp32 rounding.
    # pruned_knn returns k+1 columns with the self point included;
    # _knn_batched has already dropped self — apply the same id-drop.
    from harmonypy_tpu.lisi import _drop_self_by_id
    pd_slice, _ = _drop_self_by_id(res[0][:m], res[1][:m], qid)
    out["pruned_vs_brute_dist_max"] = float(
        f"{np.max(np.abs(np.asarray(pd_slice) - bd_np)):.3g}")

    # -- approx for context -------------------------------------------------
    t0 = time.time()
    hm.compute_lisi(Xd, meta, ["batch"], knn="approx")
    out["approx_knn_s"] = round(time.time() - t0, 2)

    # LISI agreement on the slice rows (brute slice vs pruned full-N rows)
    from harmonypy_tpu.lisi import _simpson_label
    # codes over ALL cells: neighbor ids are global row ids
    codes = jnp.asarray(np.asarray(meta["batch"].cat.codes, np.int32))
    logU = jnp.asarray(np.log(30.0), bd.dtype)
    tol = jnp.asarray(1e-5, bd.dtype)
    lisi_brute = 1.0 / np.asarray(
        _simpson_label(bd, bi, codes, 3, logU, tol))
    out["pruned_vs_brute_mad"] = float(
        f"{np.mean(np.abs(np.asarray(lisi_pruned)[:m, 0] - lisi_brute)):.3g}")
    out["speedup_vs_brute_est"] = round(
        out["brute_est_s"] / out["pruned_knn_s"], 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
