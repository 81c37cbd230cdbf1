"""Client-side compile-time attribution: which engine component costs what.

Compiles (without executing) jitted programs for: the full fit, init alone,
one harmony iteration, the k-means init subroutine alone, and ridge alone —
at a fresh N so neither the local nor the server cache can hit. Client-side
XLA compile time is the controllable part of the warm-up (the server-side
share on tunnel backends is measured by tools/compile_probe.py).

Usage: python tools/compile_attr.py [--n N]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=858_000 + 2 * 2048)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from harmonypy_tpu.config import (EngineConfig, fused_geometry_ok,
                                      pallas_supported)
    from harmonypy_tpu.engine import get_engine, AXIS
    from harmonypy_tpu.ops.kmeans import kmeans_init
    from harmonypy_tpu.ops.ridge import moe_correct_ridge
    from harmonypy_tpu.state import HarmonyData, HarmonyParams
    from harmonypy_tpu.parallel.mesh import make_mesh

    N, d, B, K = args.n, 29, 3, 100
    mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    use_pallas = (mesh.devices.flat[0].platform == "tpu"
                  and pallas_supported(N, n_dev))
    cfg = EngineConfig(N=N, d=d, K=K, B=B, n_devices=n_dev,
                       use_pallas=use_pallas,
                       use_fused_xla=(not use_pallas)
                       and fused_geometry_ok(N, n_dev))
    engine = get_engine(cfg, mesh)

    s2 = P(None, AXIS)
    s1 = P(AXIS)
    zshape = jax.ShapeDtypeStruct((d, cfg.N_local), jnp.float32)
    pshape = jax.ShapeDtypeStruct((B, cfg.N_local), jnp.float32)
    mshape = jax.ShapeDtypeStruct((cfg.N_local,), jnp.float32)
    # Host-side abstract global shapes for lowering.
    def glob(shape_local, spec):
        shape = list(shape_local.shape)
        if spec == s2:
            shape[1] *= n_dev
        elif spec == s1:
            shape[0] *= n_dev
        return jax.ShapeDtypeStruct(tuple(shape), shape_local.dtype)

    data = HarmonyData(Z_orig=glob(zshape, s2), Phi=glob(pshape, s2),
                       mask=glob(mshape, s1))
    params = HarmonyParams(
        theta=jax.ShapeDtypeStruct((B,), jnp.float32),
        sigma=jax.ShapeDtypeStruct((K,), jnp.float32),
        lamb=jax.ShapeDtypeStruct((B + 1,), jnp.float32),
        Pr_b=jax.ShapeDtypeStruct((B,), jnp.float32))
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)

    def timed_compile(name, jitted, *abstract_args):
        t0 = time.time()
        lowered = jitted.lower(*abstract_args)
        t_lower = time.time() - t0
        t0 = time.time()
        lowered.compile()
        t_compile = time.time() - t0
        print(json.dumps({"program": name, "lower_s": round(t_lower, 2),
                          "client_compile_s": round(t_compile, 2)}),
              flush=True)

    # Sub-programs.
    km = jax.jit(jax.shard_map(
        lambda k, z: kmeans_init(k, z, cfg, AXIS), mesh=mesh,
        in_specs=(P(), s2), out_specs=P(), check_vma=False))
    ridge = jax.jit(jax.shard_map(
        lambda z, p, r, e, prm, m: moe_correct_ridge(
            z, p, r, e, prm, cfg, m, AXIS),
        mesh=mesh, in_specs=(s2, s2, s2, P(), P(), s1), out_specs=s2,
        check_vma=False))
    rshape = glob(jax.ShapeDtypeStruct((K, cfg.N_local), cfg.r_jnp_dtype), s2)
    eshape = jax.ShapeDtypeStruct((K, B), jnp.float32)

    timed_compile("kmeans_init", km, key, data.Z_orig)
    timed_compile("ridge", ridge, data.Z_orig, data.Phi, rshape, eshape,
                  params, data.mask)
    # init / iter / fit through the engine.
    timed_compile("init_fn", engine.init_fn, data, params, key)
    state = jax.eval_shape(engine.init_fn, data, params, key)
    timed_compile("iter_fn", engine.iter_fn, state, data, params)
    timed_compile("fit_fn", engine.fit_fn, data, params, key)


if __name__ == "__main__":
    main()
