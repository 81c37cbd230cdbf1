"""Approx-kNN recall vs exact, on-chip (VERDICT r2 #5).

The LISI `knn="approx"` mode uses the TPU's PartialReduce operator
(lax.approx_max_k, recall_target=0.95 per reference tile). The CPU test
suite cannot measure the real operator (the CPU lowering falls back to an
exact sort), so this harness runs BOTH modes on the actual backend at
>= 100k cells and reports:

  approx_knn_recall        mean fraction of exact neighbor ids recovered
  approx_knn_lisi_mad      mean |LISI_approx - LISI_exact| per cell

Usage: python benchmarks/knn_recall.py [--n 131072] [--queries 16384]
Prints one JSON line; also importable (bench.py calls measure()).
"""

from __future__ import annotations

import argparse
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import numpy as np


def measure(n: int = 131_072, n_queries: int = 16_384, d: int = 29,
            perplexity: float = 30, seed: int = 0,
            pruned: bool = True) -> dict:
    import time

    import jax.numpy as jnp
    import pandas as pd

    from harmonypy_tpu.lisi import _drop_self_by_id, _knn_batched, \
        _simpson_label

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(24, d)).astype(np.float32) * 5.0
    g = rng.integers(0, 24, size=n)
    b = rng.integers(0, 3, size=n)
    shifts = rng.normal(size=(3, d)).astype(np.float32) * 1.5
    X = (centers[g] + shifts[b]
         + rng.normal(size=(n, d)).astype(np.float32))

    k = int(perplexity * 3) - 1
    Xd = jnp.asarray(X)
    qid = jnp.arange(n_queries, dtype=jnp.int32)
    Qd = Xd[:n_queries]
    d_ex, i_ex = _knn_batched(Qd, Xd, k, qid=qid)
    d_ap, i_ap = _knn_batched(Qd, Xd, k, approx=True, qid=qid)
    i_ex = np.asarray(i_ex)
    i_ap = np.asarray(i_ap)

    recall = np.mean([
        len(set(i_ex[q]) & set(i_ap[q])) / k for q in range(n_queries)])

    labels = pd.Categorical([f"b{i}" for i in b])
    codes = jnp.asarray(np.asarray(labels.codes, np.int32))
    logU = jnp.asarray(np.log(perplexity), d_ex.dtype)
    tol = jnp.asarray(1e-5, d_ex.dtype)
    lisi_ex = 1.0 / np.asarray(_simpson_label(
        d_ex, i_ex, codes, len(labels.categories), logU, tol))
    lisi_ap = 1.0 / np.asarray(_simpson_label(
        d_ap, jnp.asarray(i_ap), codes, len(labels.categories), logU, tol))
    mad = float(np.mean(np.abs(lisi_ex - lisi_ap)))

    res = {"approx_knn_recall": round(float(recall), 4),
           "approx_knn_lisi_mad": float(f"{mad:.3g}"),
           "approx_knn_n": n, "approx_knn_queries": n_queries,
           # gate: the per-tile recall target is 0.95; end-to-end recall
           # below 0.9 or LISI drifting past the 0.05 test tolerance means
           # the hardware operator is not delivering its contract
           "approx_knn_ok": bool(recall >= 0.9 and mad < 0.05)}

    if pruned:
        # Sub-quadratic EXACT path (ops/knn_pruned.py) certified against
        # the exact slice just computed: distances must agree to fp32
        # rounding (the certificate + brute fallback guarantee exactness;
        # this measures that on the real backend, plus the timing that
        # motivates the path — full-N exact instead of O(N^2)).
        from harmonypy_tpu.ops.knn_pruned import (build_index,
                                                  default_n_clusters,
                                                  pruned_knn)
        t0 = time.time()
        index = build_index(Xd, default_n_clusters(n, k + 1))
        pres = pruned_knn(Xd, k, index=index)
        if pres is None:  # probe bailed (should not happen on this data)
            # Emit the gate fields explicitly: a consumer reading booleans
            # must see an anomaly, not a missing-field false pass.
            res["pruned_knn_s"] = -1.0
            res["pruned_bailed"] = True
            res["pruned_exact_ok"] = False
            return res
        cert = np.asarray(pres[2])
        # First-call timing includes the pruned programs' compile; through
        # a tunneled backend the server-side compile varies 30-130+ s for
        # the same program (docs/warmup.md), which made this field swing
        # 36-167 s across same-day runs (BENCH_r04 vs bench_postslab).
        res["pruned_knn_s"] = round(time.time() - t0, 2)
        t0 = time.time()
        pres2 = pruned_knn(Xd, k, index=index)
        # Warm timing (programs compiled): the number that reflects the
        # search itself and is comparable across rounds.
        res["pruned_knn_warm_s"] = round(time.time() - t0, 2)
        assert pres2 is not None
        res["pruned_cert_rate"] = round(float(np.mean(cert)), 4)
        pd_, _ = _drop_self_by_id(pres[0][:n_queries], pres[1][:n_queries],
                                  qid)
        # uncertified slice rows differ until the brute fallback patches
        # them (lisi._knn_pruned does); compare certified rows only here
        ok = cert[:n_queries]
        dmax = float(np.max(np.abs(np.asarray(pd_)[ok] ** 2
                                   - np.asarray(d_ex)[ok] ** 2)))
        # gate on SQUARED distances: the GEMM expansion's fp32 error is
        # absolute at the eps * R^2 scale (R = max centered row norm)
        r2 = float(np.max(np.sum((np.asarray(Xd)
                                  - np.asarray(Xd).mean(0)) ** 2, axis=1)))
        res["pruned_vs_exact_d2_max"] = float(f"{dmax:.3g}")
        res["pruned_exact_ok"] = bool(dmax <= 1e-4 * r2)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=131_072)
    ap.add_argument("--queries", type=int, default=16_384)
    args = ap.parse_args()
    import jax
    res = measure(args.n, args.queries)
    res["platform"] = jax.devices()[0].platform
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
