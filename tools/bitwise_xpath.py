"""Cross-path bitwise experiment (VERDICT r2 #3 groundwork).

Runs ONE fused E-step through the Pallas kernel and through the fused-XLA
implementation with identical inputs on the real TPU, then reports, per
output, whether the results are bitwise identical and (if not) the max
absolute difference. This measures whether the within-chunk math (MXU dist,
exp/softmax, reweight) lowers to bitwise-identical arithmetic under Mosaic
vs XLA — the precondition for making the default single-chip path (Pallas)
bitwise consistent with the any-mesh fused-XLA path by aligning the
reduction orders.

Usage: python tools/bitwise_xpath.py [--n 43000] [--k 40]
"""

from __future__ import annotations

import argparse
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))  # repo root, for harmonypy_tpu

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=43_000)
    ap.add_argument("--k", type=int, default=40)
    ap.add_argument("--d", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, PartitionSpec as P

    from harmonypy_tpu.config import EngineConfig
    from harmonypy_tpu.ops.normalize import l2_normalize_cols
    from harmonypy_tpu.ops.partition import (partition_geometry,
                                             removal_from_cache,
                                             single_device_tables)
    from harmonypy_tpu.ops.pallas.update_r_fused import (chunk_stats,
                                                         fused_update_r)
    from harmonypy_tpu.ops.update_r_fused_xla import fused_update_r_xla

    N, K, d, B = args.n, args.k, args.d, 3
    cfg = EngineConfig(N=N, d=d, K=K, B=B, n_devices=1, use_pallas=True)
    geom = partition_geometry(cfg)
    print(f"geom: {geom}")

    rng = np.random.default_rng(0)
    Nl = cfg.N_local
    mask = (np.arange(Nl) < N).astype(np.float32)
    Z = rng.normal(size=(d, Nl)).astype(np.float32) * mask
    batches = rng.integers(0, B, size=Nl)
    Phi = ((batches[None, :] == np.arange(B)[:, None]).astype(np.float32)
           * mask)
    Pr_b = Phi.sum(axis=1) / N

    with jax.default_matmul_precision("default"):
        Z_cos = l2_normalize_cols(jnp.asarray(Z))
        Y = l2_normalize_cols(jnp.asarray(
            rng.normal(size=(d, K)).astype(np.float32)))
        sigma = jnp.full((K,), 0.1, jnp.float32)
        theta = jnp.full((B,), 2.0, jnp.float32)
        prb = jnp.asarray(Pr_b, jnp.float32)
        dist = 2.0 * (1.0 - Y.T @ Z_cos)
        s = jnp.exp(-dist / sigma[:, None])
        R0 = (s / jnp.sum(s, axis=0, keepdims=True)) * mask[None, :]
        E = jnp.outer(jnp.sum(R0, axis=1), prb)
        O = R0 @ jnp.asarray(Phi).T

        key = jax.random.PRNGKey(7)
        slots, granks, gtbl = single_device_tables(key, cfg)
        cache = chunk_stats(R0, jnp.asarray(Phi), cfg)
        removal = removal_from_cache(cache[: geom.nc_cap], gtbl, geom)

        Rp, Op, Ep, cache_p, ybuf_p, kbuf_p = fused_update_r(
            slots.reshape(-1), removal, Z_cos, jnp.asarray(Phi), None, Y,
            sigma, theta, prb, O, E, cfg, interpret=False)
        ys_p = jnp.sum(ybuf_p[: geom.nc_cap], axis=0).T
        ko_p = jnp.sum(kbuf_p[: geom.nc_cap], axis=0)
        outs_p = (Rp, Op, Ep, ys_p, cache_p, ko_p[0], ko_p[1])

        mesh = Mesh(np.array(jax.devices()[:1]), ("cells",))
        xla = jax.jit(jax.shard_map(
            lambda *a: fused_update_r_xla(*a, cfg=cfg, axis_name="cells"),
            mesh=mesh,
            in_specs=(P(), P(), P(), P(None, "cells"),
                      P(None, "cells"), P(), P(), P(), P(), P(), P()),
            out_specs=(P(None, "cells"), P(), P(), P(), P("cells"), P(),
                       P()),
            check_vma=False))
        outs_x = xla(slots, granks, removal, Z_cos, jnp.asarray(Phi), Y,
                     sigma, theta, prb, O, E)

    names = ["R", "O", "E", "Ysum", "cache", "kerr", "ent"]
    for name, a, b in zip(names, outs_p, outs_x):
        a = np.asarray(a)
        b = np.asarray(b)
        same = a.shape == b.shape and np.array_equal(a, b)
        md = float(np.max(np.abs(a - b))) if a.shape == b.shape else float(
            "nan")
        rel = md / max(float(np.max(np.abs(a))), 1e-30)
        print(f"{name:6s} bitwise={same}  max_abs_diff={md:.3e}  "
              f"rel={rel:.3e}")

    # Per-block breakdown of the R difference: if the within-chunk math is
    # bitwise-parity, early blocks match and divergence grows with the
    # O/E accumulation-order feedback.
    Rp = np.asarray(outs_p[0])
    Rx = np.asarray(outs_x[0])
    slots_np = np.asarray(slots)
    CH = geom.CH
    for b in range(geom.nb):
        cols = []
        for j in range(geom.J_shard):
            c0 = int(slots_np[b, j])
            if c0 >= geom.nc_cap:
                continue
            cols.append(np.abs(Rp[:, c0 * CH:(c0 + 1) * CH]
                               - Rx[:, c0 * CH:(c0 + 1) * CH]).max())
        n_mismatch = sum(1 for c in cols if c > 0)
        print(f"block {b:2d}: chunk max diffs "
              f"{['%.1e' % c for c in cols]} ({n_mismatch} differ)")


if __name__ == "__main__":
    main()
