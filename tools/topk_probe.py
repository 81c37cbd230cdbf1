"""Micro-probe: exact top-k strategies over the pruned-kNN candidate slab.

The pruned search's per-cluster step answers (p_max, V*p_max) distance rows
with lax.top_k (ops/knn_pruned.py). At the 131k LISI tier that is
(~900, ~29k) x k=91 per cluster x 256 clusters, and the committed
pruned_knn_warm_s (5.18 s, docs/hardware_r5/bench.out) is dominated by the
top-k, not the distance GEMM (~0.2 ms/cluster). This probe times, on the
real backend:

  one_shot    lax.top_k over the full (P, W) slab              (current)
  two_stage   per-visited-cluster top_k (P, V, p) -> (P, V*k) merge top_k
              — exact: the global top-k is contained in the union of the
              per-segment top-ks
  sort_slice  full sort + slice (lower-bound sanity reference)

Usage: python tools/topk_probe.py [--p 896] [--v 32] [--k 91] [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=896)   # p_max
    ap.add_argument("--v", type=int, default=32)    # visited clusters
    ap.add_argument("--k", type=int, default=91)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    P, V, k = args.p, args.v, args.k
    W = V * P
    rng = np.random.default_rng(0)
    d2 = jnp.asarray(rng.standard_normal((P, W)).astype(np.float32))

    @jax.jit
    def one_shot(d2):
        neg, pos = lax.top_k(-d2, k)
        return -neg, pos

    @jax.jit
    def two_stage(d2):
        seg = d2.reshape(P, V, P)
        negs, poss = lax.top_k(-seg, k)                  # (P, V, k)
        base = (jnp.arange(V, dtype=jnp.int32) * P)[None, :, None]
        gidx = (poss + base).reshape(P, V * k)
        neg2, pos2 = lax.top_k(negs.reshape(P, V * k), k)
        return -neg2, jnp.take_along_axis(gidx, pos2, axis=1)

    @jax.jit
    def sort_slice(d2):
        s = jnp.sort(d2, axis=1)
        return s[:, :k], None

    def sync(out):
        # block_until_ready returns early through remote-device tunnels;
        # a scalar readback is the only real sync (see utils/profiling.py).
        np.asarray(out[0].ravel()[0])

    def timeit(name, fn):
        out = fn(d2)
        sync(out)
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.time()
            sync(fn(d2))
            best = min(best, time.time() - t0)
        print(f"{name:10s} {best*1e3:8.2f} ms  (x256 clusters -> "
              f"{best*256:6.2f} s)")
        return out

    a = timeit("one_shot", one_shot)
    b = timeit("two_stage", two_stage)
    timeit("sort_slice", sort_slice)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    # ids may differ on exact ties; values above are the equality gate
    print("two_stage values == one_shot values: OK")


if __name__ == "__main__":
    main()


def width_scaling(p=896, k=91, reps=5):
    """Per-width lax.top_k cost: validates the early-exit design's merge
    cost model (top_k over (P, k + p) per processed segment)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    rng = np.random.default_rng(0)
    for w in (k + p, 2 * p, 4 * p, 8 * p, 16 * p, 32 * p):
        d2 = jnp.asarray(rng.standard_normal((p, w)).astype(np.float32))
        f = jax.jit(lambda x: lax.top_k(-x, k))
        out = f(d2); np.asarray(out[0].ravel()[0])
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            o = f(d2); np.asarray(o[0].ravel()[0])
            best = min(best, time.time() - t0)
        print(f"top_k ({p}, {w:6d}) k={k}: {best*1e3:7.2f} ms")
