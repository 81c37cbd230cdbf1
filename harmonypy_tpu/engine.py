"""The Harmony algorithm engine: jitted, shard_map'd step functions.

Control-flow mapping from the reference (harmony.py:419-462):

  reference harmonize()  ->  host-side loop over HarmonyEngine.iter_fn
                             (max 10 calls; enables per-iteration logging and
                             checkpointing at negligible dispatch cost)
  reference cluster()    ->  in-graph lax.while_loop (up to max_iter_kmeans
                             fuzzy k-means rounds, windowed convergence)
  reference update_R()   ->  lax.scan over sequential blocks (ops/update_r.py)
  reference moe_correct_ridge() -> K-batched Cholesky solve (ops/ridge.py)
  reference init_cluster() + sklearn KMeans -> on-device k-means++ + Lloyd
                             (ops/kmeans.py)

Every function here executes under jax.shard_map over a 1-D device mesh with
axis "cells": Z/R/Phi are sharded along cells, Y/O/E and all convergence
scalars are replicated, and the only cross-device traffic is psum/all_gather
of O(d*K + K*B) floats per step (SURVEY.md C19).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .config import EngineConfig
from .state import (HarmonyData, HarmonyParams, HarmonyState, append,
                    defer_placeholders, empty_histories)
from .ops.normalize import l2_normalize_cols
from .ops.kmeans import kmeans_init
from .ops.update_r import compute_scale_dist, update_r
from .ops.ridge import moe_correct_ridge, solve_w
from .ops.objective import (chunk_objective_partials, compute_objective_terms,
                            cross_entropy_from_stats)
from .ops.pallas.update_r_fused import chunk_stats, fused_update_r
from .ops.partition import (frame_sum, partition_geometry, round_tables,
                            shard_chunk_gids)
from .ops.update_r_fused_xla import (fused_update_nor_xla3,
                                     fused_update_r_xla3, make_zp3,
                                     replay_apply, replay_normal_eq,
                                     replay_r)

AXIS = "cells"


def _check_conv_kmeans(obj_buf, n, cfg: EngineConfig):
    """Windowed k-means convergence (reference check_convergence type 0,
    harmony.py:516-523). `n` is the count after the latest append."""
    w = cfg.window_size
    enough = n >= w + 2
    lo = jnp.maximum(n - w - 1, 0)
    obj_old = jnp.sum(lax.dynamic_slice(obj_buf, (lo,), (w,)))
    obj_new = jnp.sum(lax.dynamic_slice(obj_buf, (jnp.maximum(n - w, 0),), (w,)))
    rel = jnp.abs(obj_old - obj_new) / jnp.abs(obj_old)
    return jnp.logical_and(enough, rel < cfg.epsilon_kmeans)


def _check_conv_harmony(obj_h, n, cfg: EngineConfig):
    """Signed harmony convergence (reference type 1, harmony.py:525-531):
    an objective *increase* also counts as converged."""
    enough = n >= 2
    obj_old = obj_h[jnp.maximum(n - 2, 0)]
    obj_new = obj_h[jnp.maximum(n - 1, 0)]
    rel = (obj_old - obj_new) / jnp.abs(obj_old)
    return jnp.logical_and(enough, rel < cfg.epsilon_harmony)


class _KmeansCarry(NamedTuple):
    R: jax.Array
    Y: jax.Array
    O: jax.Array
    E: jax.Array
    cache: jax.Array
    key: jax.Array
    obj_kmeans: jax.Array
    obj_dist: jax.Array
    obj_entropy: jax.Array
    obj_cross: jax.Array
    n_kmeans: jax.Array
    i: jax.Array
    converged: jax.Array


class HarmonyEngine:
    """Compiles and caches the init / per-iteration step functions for one
    (config, mesh) pair."""

    def __init__(self, cfg: EngineConfig, mesh: Mesh):
        cfg.validate()
        assert mesh.devices.size == cfg.n_devices, (mesh, cfg.n_devices)
        self.cfg = cfg
        self.mesh = mesh
        # Pallas kernels run compiled on TPU, interpreted elsewhere (tests).
        self._pallas_interpret = mesh.devices.flat[0].platform != "tpu"

        s2 = P(None, AXIS)   # (x, N) sharded on cells
        s1 = P(AXIS)         # (N,) sharded
        rep = P()            # replicated

        self.data_specs = HarmonyData(Z_orig=s2, Phi=s2, mask=s1)
        self.params_specs = HarmonyParams(theta=rep, sigma=rep, lamb=rep, Pr_b=rep)
        self.state_specs = HarmonyState(
            Z_corr=s2, Z_cos=s2, R=s2,
            Y=rep, O=rep, E=rep, key=rep,
            obj_kmeans=rep, obj_dist=rep, obj_entropy=rep, obj_cross=rep,
            n_kmeans=rep, obj_harmony=rep, n_harmony=rep,
            kmeans_rounds=rep, n_rounds=rep, converged=rep,
            cache=P(AXIS),
            Ysum0=rep, rep_Y=rep, rep_O=rep, rep_E=rep, rep_key=rep,
            rep_cache=P(AXIS), rep_Zcos=s2,
        )

        # check_vma (replication typing) trips on pallas_call index_map
        # internals; the pallas path is single-device and every psum here is a
        # partial-sum reduction, so disabling the checker is semantics-free.
        check_vma = not cfg.fused_estep
        init = jax.shard_map(
            self._init_impl, mesh=mesh,
            in_specs=(self.data_specs, self.params_specs, rep),
            out_specs=self.state_specs, check_vma=check_vma,
        )
        step = jax.shard_map(
            self._iter_impl, mesh=mesh,
            in_specs=(self.state_specs, self.data_specs, self.params_specs),
            out_specs=self.state_specs, check_vma=check_vma,
        )
        fit = jax.shard_map(
            self._fit_impl, mesh=mesh,
            in_specs=(self.data_specs, self.params_specs, rep),
            out_specs=self.state_specs, check_vma=check_vma,
        )
        self.init_fn = jax.jit(init)
        self.iter_fn = jax.jit(step, donate_argnums=0)
        # Rebuild the chunk-stats cache from R/Phi (resume from checkpoints
        # written before the cache field existed).
        self.cache_fn = jax.jit(jax.shard_map(
            lambda R, Phi: (chunk_stats(R, Phi, cfg) if cfg.fused_estep
                            else jnp.zeros((1, 1, 1), jnp.float32)),
            mesh=mesh, in_specs=(s2, s2), out_specs=P(AXIS),
            check_vma=check_vma))
        # Whole fit in one compiled program (init + all harmony iterations):
        # a single dispatch and a single host sync — the fastest path when
        # per-iteration logging/checkpointing isn't needed.
        self.fit_fn = jax.jit(fit)
        self._rwin_cache: dict = {}

    # ---- deferred-R materializer (host-paged) ---------------------------
    def r_window_fn(self, width: int):
        """Jitted shard_map producing the stored-form R for the local chunk
        window [lo, lo + width) of every shard ((n_devices * width, K, CH)
        global). Deferred-R mode only; callers page `lo` to stream R out
        without ever holding K x N on device."""
        assert self.cfg.defer_r, self.cfg
        fn = self._rwin_cache.get(width)
        if fn is None:
            rep = P()
            fn = jax.jit(jax.shard_map(
                functools.partial(self._r_window_impl, width=width),
                mesh=self.mesh,
                in_specs=(self.state_specs, self.data_specs,
                          self.params_specs, rep),
                out_specs=P(AXIS), check_vma=False))
            self._rwin_cache[width] = fn
        return fn

    def _r_window_impl(self, state: HarmonyState, data: HarmonyData,
                       params: HarmonyParams, lo, *, width: int):
        cfg = self.cfg
        geom = partition_geometry(cfg)
        with jax.default_matmul_precision(cfg.matmul_precision):
            ZP3 = make_zp3(state.rep_Zcos, data.Phi, data.mask, cfg)
            slots, granks, removal = round_tables(
                state.rep_key, state.rep_cache, geom, AXIS)
            return replay_r(
                slots, granks, removal, ZP3, state.rep_Y,
                params.sigma, params.theta, params.Pr_b,
                state.rep_O, state.rep_E, cfg, AXIS, lo, width)

    # ---- sharding helpers (host side) -----------------------------------
    def data_shardings(self) -> HarmonyData:
        return jax.tree.map(
            lambda spec: NamedSharding(self.mesh, spec), self.data_specs,
            is_leaf=lambda x: isinstance(x, P),
        )

    # ---- implementations (run under shard_map) --------------------------
    def _objective_append(self, hist, terms):
        """hist = (obj_kmeans, obj_dist, obj_entropy, obj_cross, n);
        terms = (kmeans_error, entropy, cross), already 2000/N-normalized."""
        obj_kmeans, obj_dist, obj_entropy, obj_cross, n = hist
        ke, ent, cross = terms
        obj_kmeans, _ = append(obj_kmeans, n, ke + ent + cross)
        obj_dist, _ = append(obj_dist, n, ke)
        obj_entropy, _ = append(obj_entropy, n, ent)
        obj_cross, n = append(obj_cross, n, cross)
        return (obj_kmeans, obj_dist, obj_entropy, obj_cross, n)

    def _init_impl(self, data: HarmonyData, params: HarmonyParams, key):
        cfg = self.cfg
        with jax.default_matmul_precision(cfg.matmul_precision):
            Z_orig, Phi, mask = data
            Z_cos = l2_normalize_cols(Z_orig)        # reference harmony.py:238

            key, k_init = jax.random.split(key)
            # k-means++ + Lloyd centroids (replaces sklearn, harmony.py:366-374)
            Y = kmeans_init(k_init, Z_cos, cfg, AXIS)
            Y = l2_normalize_cols(Y)                 # harmony.py:377

            if cfg.defer_r:
                # Chunk-resident initial statistics: the initial R (softmax
                # of -dist/sigma, harmony.py:383-385) is computed per chunk
                # and reduced away — nothing K x N ever exists.
                return self._init_defer(Z_orig, Z_cos, Phi, mask, Y, key,
                                        params)

            dist_mat = 2.0 * (1.0 - Y.T @ Z_cos)     # harmony.py:380
            R = compute_scale_dist(dist_mat, params.sigma)  # harmony.py:383-385
            R = R * mask[None, :]                    # padding carries no mass
            if not cfg.fused_estep:
                # The per-cell E-step's block removal re-reads the STORED R,
                # so O/E must be computed from the storage-rounded values
                # (round-trip cast; a no-op at float32). The fused paths keep
                # an fp32 pre-cast cache instead and use the pre-cast values.
                R = R.astype(cfg.r_jnp_dtype).astype(jnp.float32)

            # Batch diversity statistics (harmony.py:388-389) and the first
            # objective. On the fused paths every cross-cell reduction goes
            # through the fixed global chunk frame so the values are bitwise
            # device-count-invariant (ops/partition.py).
            if cfg.fused_estep:
                geom = partition_geometry(cfg)
                gids = shard_chunk_gids(geom, AXIS)
                cache = chunk_stats(R, Phi, cfg)     # fp32, pre-cast values
                tot = frame_sum(cache[: geom.nc_cap], gids, geom.NC_fixed,
                                AXIS)                # (K, B+1)
                E = tot[:, 0:1] * params.Pr_b[None, :]
                O = tot[:, 1:]
                CH, nc1 = geom.CH, geom.nc_cap + 1
                R3 = R.reshape(cfg.K, nc1, CH)
                D3 = dist_mat.reshape(cfg.K, nc1, CH)
                kerr_c, ent_c = chunk_objective_partials(
                    R3, D3, params.sigma, k_axis=0, chunk_axis=1)
                nc = jnp.float32(2000.0 / cfg.N)
                terms = (
                    frame_sum(kerr_c[: geom.nc_cap], gids, geom.NC_fixed,
                              AXIS) * nc,
                    frame_sum(ent_c[: geom.nc_cap], gids, geom.NC_fixed,
                              AXIS) * nc,
                    cross_entropy_from_stats(O, E, params, cfg))
            else:
                E = jnp.outer(lax.psum(jnp.sum(R, axis=1), AXIS), params.Pr_b)
                O = lax.psum(R @ Phi.T, AXIS)
                cache = jnp.zeros((1, 1, 1), jnp.float32)
                terms = compute_objective_terms(R, dist_mat, O, E, Phi,
                                                params, cfg, AXIS)

            hist = empty_histories(cfg)
            kh = self._objective_append(
                (hist["obj_kmeans"], hist["obj_dist"], hist["obj_entropy"],
                 hist["obj_cross"], hist["n_kmeans"]), terms)
            obj_kmeans, obj_dist, obj_entropy, obj_cross, n_kmeans = kh
            # harmony.py:392 — first harmony objective = first kmeans objective
            obj_harmony, n_harmony = append(
                hist["obj_harmony"], hist["n_harmony"], obj_kmeans[n_kmeans - 1])

            # The fused E-step's per-chunk cache was seeded above; the
            # kernels keep it current from here on (R never changes outside
            # the E-step).
            R = R.astype(cfg.r_jnp_dtype)

            return HarmonyState(
                Z_corr=Z_orig, Z_cos=Z_cos, R=R, Y=Y, O=O, E=E, key=key,
                obj_kmeans=obj_kmeans, obj_dist=obj_dist,
                obj_entropy=obj_entropy, obj_cross=obj_cross, n_kmeans=n_kmeans,
                obj_harmony=obj_harmony, n_harmony=n_harmony,
                kmeans_rounds=hist["kmeans_rounds"], n_rounds=hist["n_rounds"],
                converged=hist["converged"], cache=cache,
                **defer_placeholders(cfg),
            )

    def _init_defer(self, Z_orig, Z_cos, Phi, mask, Y, key,
                    params: HarmonyParams) -> HarmonyState:
        """Deferred-R tail of _init_impl: per-chunk scan computes the cache,
        the initial O/E, the first objective, and the first cluster loop's
        centroid numerator — the (K, N) initial soft assignments are reduced
        away chunk by chunk (each is a pure softmax of the chunk's
        distances; any later consumer recomputes them identically)."""
        cfg = self.cfg
        geom = partition_geometry(cfg)
        gids = shard_chunk_gids(geom, AXIS)
        CH, nc1 = geom.CH, geom.nc_cap + 1
        z0 = jnp.int32(0)

        def chunk(_, j):
            z = lax.dynamic_slice(Z_cos, (z0, j * CH), (cfg.d, CH))
            p = lax.dynamic_slice(Phi, (z0, j * CH), (cfg.B, CH))
            m = lax.dynamic_slice(mask, (j * CH,), (CH,))
            dist = 2.0 * (1.0 - Y.T @ z)             # harmony.py:380
            r = compute_scale_dist(dist, params.sigma) * m[None, :]
            # Same formulas as pallas.update_r_fused.chunk_stats.
            parts = [jnp.sum(r, axis=1)]
            parts += [jnp.sum(r * p[b][None, :], axis=1)
                      for b in range(cfg.B)]
            cache_j = jnp.stack(parts, axis=1)       # (K, B+1)
            y_j = z @ r.T                            # (d, K)
            kerr_j = jnp.sum(r * dist)
            from .ops.normalize import safe_entropy
            ent_j = jnp.sum(safe_entropy(r) * params.sigma[:, None])
            return None, (cache_j, y_j, kerr_j, ent_j)

        _, (cache, ybuf, kerr_c, ent_c) = lax.scan(
            chunk, None, jnp.arange(nc1, dtype=jnp.int32))

        tot = frame_sum(cache[: geom.nc_cap], gids, geom.NC_fixed, AXIS)
        E = tot[:, 0:1] * params.Pr_b[None, :]
        O = tot[:, 1:]
        Ysum0 = frame_sum(ybuf[: geom.nc_cap], gids, geom.NC_fixed, AXIS)
        nc = jnp.float32(2000.0 / cfg.N)
        terms = (
            frame_sum(kerr_c[: geom.nc_cap], gids, geom.NC_fixed, AXIS) * nc,
            frame_sum(ent_c[: geom.nc_cap], gids, geom.NC_fixed, AXIS) * nc,
            cross_entropy_from_stats(O, E, params, cfg))

        hist = empty_histories(cfg)
        kh = self._objective_append(
            (hist["obj_kmeans"], hist["obj_dist"], hist["obj_entropy"],
             hist["obj_cross"], hist["n_kmeans"]), terms)
        obj_kmeans, obj_dist, obj_entropy, obj_cross, n_kmeans = kh
        obj_harmony, n_harmony = append(
            hist["obj_harmony"], hist["n_harmony"], obj_kmeans[n_kmeans - 1])

        ph = defer_placeholders(cfg)
        ph["Ysum0"] = Ysum0
        ph["rep_Zcos"] = Z_cos
        return HarmonyState(
            Z_corr=Z_orig, Z_cos=Z_cos,
            R=jnp.zeros((1, 1), cfg.r_jnp_dtype),
            Y=Y, O=O, E=E, key=key,
            obj_kmeans=obj_kmeans, obj_dist=obj_dist,
            obj_entropy=obj_entropy, obj_cross=obj_cross, n_kmeans=n_kmeans,
            obj_harmony=obj_harmony, n_harmony=n_harmony,
            kmeans_rounds=hist["kmeans_rounds"], n_rounds=hist["n_rounds"],
            converged=hist["converged"], cache=cache, **ph,
        )

    def _cluster_xla(self, state: HarmonyState, Phi, mask,
                     params: HarmonyParams) -> _KmeansCarry:
        """Reference-shaped k-means loop: per-cell block shuffling via the
        shard_map XLA E-step (ops/update_r.py). Used on multi-device meshes
        and small problems."""
        cfg = self.cfg

        def body(c: _KmeansCarry) -> _KmeansCarry:
            Y = l2_normalize_cols(
                lax.psum(state.Z_cos @ c.R.T, AXIS))     # harmony.py:443-444
            key, k_r = jax.random.split(c.key)
            dist_mat = 2.0 * (1.0 - Y.T @ state.Z_cos)   # harmony.py:447
            R, E, O = update_r(k_r, c.R, dist_mat, Phi, c.E, c.O,
                               params, cfg, mask, AXIS)  # harmony.py:450
            terms = compute_objective_terms(
                R, dist_mat, O, E, Phi, params, cfg, AXIS)
            hist = self._objective_append(
                (c.obj_kmeans, c.obj_dist, c.obj_entropy, c.obj_cross,
                 c.n_kmeans), terms)                     # harmony.py:453
            obj_kmeans, obj_dist, obj_entropy, obj_cross, n_kmeans = hist
            conv = jnp.logical_and(
                c.i > cfg.window_size,
                _check_conv_kmeans(obj_kmeans, n_kmeans, cfg))
            return _KmeansCarry(R, Y, O, E, c.cache, key, obj_kmeans,
                                obj_dist, obj_entropy, obj_cross, n_kmeans,
                                c.i + 1, conv)

        def cond(c: _KmeansCarry):
            return jnp.logical_and(c.i < cfg.max_iter_kmeans,
                                   jnp.logical_not(c.converged))

        carry = _KmeansCarry(
            R=state.R, Y=state.Y, O=state.O, E=state.E, cache=state.cache,
            key=state.key,
            obj_kmeans=state.obj_kmeans, obj_dist=state.obj_dist,
            obj_entropy=state.obj_entropy, obj_cross=state.obj_cross,
            n_kmeans=state.n_kmeans, i=jnp.int32(0),
            converged=jnp.zeros((), jnp.bool_))
        return lax.while_loop(cond, body, carry)

    def _cluster_fused(self, state: HarmonyState, Phi, mask,
                       params: HarmonyParams) -> _KmeansCarry:
        """Fused-kernel k-means loop (Pallas single chip, or the XLA
        equivalent on any mesh). The kernel returns, besides the new R/O/E,
        the NEXT round's centroid numerator (Z_cos R^T) and the per-chunk
        stats cache that replaces the removal pass, so each round reads
        Z_cos once and writes R once — nothing else at K x N scale."""
        cfg = self.cfg
        geom = partition_geometry(cfg)
        gids = shard_chunk_gids(geom, AXIS)
        CH, nc1 = geom.CH, geom.nc_cap + 1

        class C(NamedTuple):
            R: jax.Array         # Pallas: (K, N_local); XLA: (nc1, K, CH)
            Ysum: jax.Array      # (d, K) un-normalized centroid numerator
            Y: jax.Array         # (d, K) last round's normalized centroids
            cache: jax.Array     # (n_chunks+1, K, B+1) per-chunk stats
            O: jax.Array
            E: jax.Array
            key: jax.Array
            obj_kmeans: jax.Array
            obj_dist: jax.Array
            obj_entropy: jax.Array
            obj_cross: jax.Array
            n_kmeans: jax.Array
            i: jax.Array
            converged: jax.Array

        if not cfg.use_pallas:
            # Combined chunk-major [mask; Phi; Z_cos] slab, built ONCE per
            # harmony iteration; the loop carries R chunk-major so no
            # (K, N) <-> (nc, CH) re-tiling happens per round (measured
            # ~3.7 ms/round of pure data formatting at 858k otherwise).
            ZP3 = make_zp3(state.Z_cos, Phi, mask, cfg)

        def body(c: C) -> C:
            Ysum = c.Ysum
            Y = l2_normalize_cols(Ysum)                # harmony.py:443-444
            key, k_r = jax.random.split(c.key)
            # GLOBAL stripe partition of chunks into blocks — a function of
            # (key, N) only, so results are device-count-invariant — plus
            # per-block removal stats from the previous round's cache,
            # reduced through the fixed global frame (ops/partition.py).
            slots, granks, removal = round_tables(k_r, c.cache, geom, AXIS)
            if cfg.use_pallas:
                # Single chip: O/E come back globally exact from the kernel
                # (whose per-chunk stats and accumulation order mirror the
                # XLA path bitwise); the per-chunk centroid/objective
                # buffers reduce through the same fixed frame as the XLA
                # path.
                R, O, E, cache, ybuf, kbuf = fused_update_r(
                    slots.reshape(-1), removal, state.Z_cos, Phi, mask, Y,
                    params.sigma, params.theta, params.Pr_b, c.O, c.E, cfg,
                    interpret=self._pallas_interpret)
                Ysum = frame_sum(ybuf[: geom.nc_cap], gids, geom.NC_fixed,
                                 AXIS).T
                ko = frame_sum(kbuf[: geom.nc_cap], gids, geom.NC_fixed,
                               AXIS)
                kerr, ent = ko[0], ko[1]
            else:
                # Any mesh: fixed-frame reductions keep O/E/Ysum and the
                # objective bitwise device-count-invariant.
                R, O, E, Ysum, cache, kerr, ent = fused_update_r_xla3(
                    slots, granks, removal, ZP3, c.R, Y,
                    params.sigma, params.theta, params.Pr_b, c.O, c.E, cfg,
                    AXIS)
            nc = jnp.float32(2000.0 / cfg.N)
            terms = (kerr * nc, ent * nc,
                     cross_entropy_from_stats(O, E, params, cfg))
            hist = self._objective_append(
                (c.obj_kmeans, c.obj_dist, c.obj_entropy, c.obj_cross,
                 c.n_kmeans), terms)                     # harmony.py:453
            obj_kmeans, obj_dist, obj_entropy, obj_cross, n_kmeans = hist
            conv = jnp.logical_and(
                c.i > cfg.window_size,
                _check_conv_kmeans(obj_kmeans, n_kmeans, cfg))
            return C(R, Ysum, Y, cache, O, E, key, obj_kmeans, obj_dist,
                     obj_entropy, obj_cross, n_kmeans, c.i + 1, conv)

        def cond(c: C):
            return jnp.logical_and(c.i < cfg.max_iter_kmeans,
                                   jnp.logical_not(c.converged))

        if cfg.use_pallas:
            # Same per-chunk einsum + fixed-frame reduction as the XLA
            # branch below (reshapes are views; XLA canonicalizes the
            # contraction to the identical per-chunk GEMM).
            R0 = state.R
            Zv = state.Z_cos.reshape(cfg.d, nc1, CH)
            Rv = R0.reshape(cfg.K, nc1, CH).astype(jnp.float32)
            y_c = jnp.einsum("djc,kjc->jdk", Zv, Rv)
            ysum0 = frame_sum(y_c[: geom.nc_cap], gids, geom.NC_fixed, AXIS)
        else:
            # Chunk-major R carry + fixed-frame global Ysum reduction,
            # matching every subsequent round (bitwise device-count-
            # invariant).
            R0 = state.R.reshape(cfg.K, nc1, CH).transpose(1, 0, 2)
            y_c = jnp.einsum("jdc,jkc->jdk", ZP3[:, cfg.B + 1:, :],
                             R0.astype(jnp.float32))
            ysum0 = frame_sum(y_c[: geom.nc_cap], gids, geom.NC_fixed, AXIS)
        carry = C(
            R=R0,
            Ysum=ysum0,
            Y=state.Y,
            # Per-chunk stats carried in the state: seeded once at init and
            # kept current by the kernels (recomputing here would re-tile the
            # whole R array — measured 4.6 ms per harmony iteration).
            cache=state.cache,
            O=state.O, E=state.E, key=state.key,
            obj_kmeans=state.obj_kmeans, obj_dist=state.obj_dist,
            obj_entropy=state.obj_entropy, obj_cross=state.obj_cross,
            n_kmeans=state.n_kmeans, i=jnp.int32(0),
            converged=jnp.zeros((), jnp.bool_))
        out = lax.while_loop(cond, body, carry)
        R_out = (out.R if cfg.use_pallas
                 else out.R.transpose(1, 0, 2).reshape(cfg.K, nc1 * CH))
        return _KmeansCarry(
            R=R_out, Y=out.Y, O=out.O, E=out.E, cache=out.cache, key=out.key,
            obj_kmeans=out.obj_kmeans, obj_dist=out.obj_dist,
            obj_entropy=out.obj_entropy, obj_cross=out.obj_cross,
            n_kmeans=out.n_kmeans, i=out.i, converged=out.converged)

    class _DeferCarry(NamedTuple):
        Ysum: jax.Array      # (d, K) fixed-frame global centroid numerator
        Y: jax.Array         # (d, K) last round's normalized centroids
        cache: jax.Array     # (n_chunks+1, K, B+1) per-chunk stats
        O: jax.Array
        E: jax.Array
        key: jax.Array
        rep_Y: jax.Array     # final round's START-of-round inputs (replay)
        rep_O: jax.Array
        rep_E: jax.Array
        rep_cache: jax.Array
        rep_key: jax.Array
        obj_kmeans: jax.Array
        obj_dist: jax.Array
        obj_entropy: jax.Array
        obj_cross: jax.Array
        n_kmeans: jax.Array
        i: jax.Array
        converged: jax.Array

    def _cluster_defer(self, state: HarmonyState, ZP3, Z_cos, Phi, mask,
                       params: HarmonyParams) -> "_DeferCarry":
        """Deferred-R k-means loop: every round runs a no-R fused E-step
        (nothing K x N read or written) and saves its start-of-round inputs
        so the final round can be replayed bitwise by the ridge correction
        and the .R materializer. Rounds run the fused-XLA implementation on
        any mesh, or the Pallas kernel's no-R variant on a single TPU chip
        (bitwise interchangeable — tools/bitwise_xpath.py)."""
        cfg = self.cfg
        geom = partition_geometry(cfg)
        gids = shard_chunk_gids(geom, AXIS)
        C = HarmonyEngine._DeferCarry

        def body(c: C) -> C:
            Y = l2_normalize_cols(c.Ysum)              # harmony.py:443-444
            key, k_r = jax.random.split(c.key)
            slots, granks, removal = round_tables(k_r, c.cache, geom, AXIS)
            if cfg.use_pallas:
                _, O, E, cache, ybuf, kbuf = fused_update_r(
                    slots.reshape(-1), removal, Z_cos, Phi, mask, Y,
                    params.sigma, params.theta, params.Pr_b, c.O, c.E, cfg,
                    interpret=self._pallas_interpret, write_r=False)
                Ysum = frame_sum(ybuf[: geom.nc_cap], gids, geom.NC_fixed,
                                 AXIS).T
                ko = frame_sum(kbuf[: geom.nc_cap], gids, geom.NC_fixed,
                               AXIS)
                kerr, ent = ko[0], ko[1]
            else:
                O, E, Ysum, cache, kerr, ent = fused_update_nor_xla3(
                    slots, granks, removal, ZP3, Y,
                    params.sigma, params.theta, params.Pr_b, c.O, c.E, cfg,
                    AXIS)
            nc = jnp.float32(2000.0 / cfg.N)
            terms = (kerr * nc, ent * nc,
                     cross_entropy_from_stats(O, E, params, cfg))
            hist = self._objective_append(
                (c.obj_kmeans, c.obj_dist, c.obj_entropy, c.obj_cross,
                 c.n_kmeans), terms)                   # harmony.py:453
            obj_kmeans, obj_dist, obj_entropy, obj_cross, n_kmeans = hist
            conv = jnp.logical_and(
                c.i > cfg.window_size,
                _check_conv_kmeans(obj_kmeans, n_kmeans, cfg))
            return C(Ysum=Ysum, Y=Y, cache=cache, O=O, E=E, key=key,
                     rep_Y=Y, rep_O=c.O, rep_E=c.E, rep_cache=c.cache,
                     rep_key=k_r,
                     obj_kmeans=obj_kmeans, obj_dist=obj_dist,
                     obj_entropy=obj_entropy, obj_cross=obj_cross,
                     n_kmeans=n_kmeans, i=c.i + 1, converged=conv)

        def cond(c: C):
            return jnp.logical_and(c.i < cfg.max_iter_kmeans,
                                   jnp.logical_not(c.converged))

        carry = C(
            Ysum=state.Ysum0, Y=state.Y, cache=state.cache,
            O=state.O, E=state.E, key=state.key,
            rep_Y=state.rep_Y, rep_O=state.rep_O, rep_E=state.rep_E,
            rep_cache=state.rep_cache, rep_key=state.rep_key,
            obj_kmeans=state.obj_kmeans, obj_dist=state.obj_dist,
            obj_entropy=state.obj_entropy, obj_cross=state.obj_cross,
            n_kmeans=state.n_kmeans, i=jnp.int32(0),
            converged=jnp.zeros((), jnp.bool_))
        return lax.while_loop(cond, body, carry)

    def _iter_defer(self, state: HarmonyState, data: HarmonyData,
                    params: HarmonyParams, ZO3=None) -> HarmonyState:
        """Deferred-R harmony iteration: cluster (no-R rounds) + ridge by
        replaying the final round twice (normal equations; apply), all
        chunk-resident (reference harmonize() body, harmony.py:421-428).

        ZO3: optional chunk-major Z_orig slab. Z_orig never changes, so
        _fit_impl builds the slab once and threads it through every
        iteration of the harmony while_loop (the reshape+transpose is a
        ~2 ms copy at 858k that XLA does not hoist out of the loop body);
        the per-iteration public entry point builds it locally."""
        cfg = self.cfg
        geom = partition_geometry(cfg)
        CH, nc1 = geom.CH, geom.nc_cap + 1
        with jax.default_matmul_precision(cfg.matmul_precision):
            Z_orig, Phi, mask = data
            ZP3 = make_zp3(state.Z_cos, Phi, mask, cfg)

            carry = self._cluster_defer(state, ZP3, state.Z_cos, Phi, mask,
                                        params)

            kmeans_rounds, n_rounds = append(
                state.kmeans_rounds, state.n_rounds, carry.i)
            obj_harmony, n_harmony = append(
                state.obj_harmony, state.n_harmony,
                carry.obj_kmeans[carry.n_kmeans - 1])

            # ---- ridge correction by replay (harmony.py:535-569) --------
            if ZO3 is None:
                ZO3 = Z_orig.reshape(cfg.d, nc1, CH).transpose(1, 0, 2)
            slots, granks, removal = round_tables(
                carry.rep_key, carry.rep_cache, geom, AXIS)
            S = replay_normal_eq(
                slots, granks, removal, ZP3, ZO3, carry.rep_Y,
                params.sigma, params.theta, params.Pr_b,
                carry.rep_O, carry.rep_E, cfg, AXIS)
            W = solve_w(S, carry.E, params, cfg)
            Zc3, Zs3, Ysum0 = replay_apply(
                slots, granks, removal, ZP3, ZO3, W, carry.rep_Y,
                params.sigma, params.theta, params.Pr_b,
                carry.rep_O, carry.rep_E, cfg, AXIS)
            Z_corr = Zc3.transpose(1, 0, 2).reshape(cfg.d, nc1 * CH)
            Z_cos = Zs3.transpose(1, 0, 2).reshape(cfg.d, nc1 * CH)

            converged = _check_conv_harmony(obj_harmony, n_harmony, cfg)

            return HarmonyState(
                Z_corr=Z_corr, Z_cos=Z_cos, R=state.R, Y=carry.Y,
                O=carry.O, E=carry.E, key=carry.key,
                obj_kmeans=carry.obj_kmeans, obj_dist=carry.obj_dist,
                obj_entropy=carry.obj_entropy, obj_cross=carry.obj_cross,
                n_kmeans=carry.n_kmeans,
                obj_harmony=obj_harmony, n_harmony=n_harmony,
                kmeans_rounds=kmeans_rounds, n_rounds=n_rounds,
                converged=converged, cache=carry.cache,
                Ysum0=Ysum0, rep_Y=carry.rep_Y, rep_O=carry.rep_O,
                rep_E=carry.rep_E, rep_key=carry.rep_key,
                rep_cache=carry.rep_cache, rep_Zcos=state.Z_cos,
            )

    def _fit_impl(self, data: HarmonyData, params: HarmonyParams,
                  key) -> HarmonyState:
        """init_cluster + full harmonize loop in-graph (harmony.py:280-282,
        419-435): convergence-checked lax.while_loop over harmony iterations."""
        state = self._init_impl(data, params, key)

        ZO3 = None
        if self.cfg.defer_r:
            # Loop-invariant chunk-major Z_orig slab, built once per fit
            # (see _iter_defer).
            geom = partition_geometry(self.cfg)
            ZO3 = data.Z_orig.reshape(
                self.cfg.d, geom.nc_cap + 1, geom.CH).transpose(1, 0, 2)

        def cond(s: HarmonyState):
            return jnp.logical_and(s.n_rounds < self.cfg.max_iter_harmony,
                                   jnp.logical_not(s.converged))

        return lax.while_loop(
            cond, lambda s: self._iter_impl(s, data, params, ZO3), state)

    def _iter_impl(self, state: HarmonyState, data: HarmonyData,
                   params: HarmonyParams, ZO3=None) -> HarmonyState:
        """One harmony iteration: cluster() + moe_correct_ridge() + type-1
        convergence check (reference harmonize() body, harmony.py:421-428)."""
        cfg = self.cfg
        if cfg.defer_r:
            return self._iter_defer(state, data, params, ZO3)
        with jax.default_matmul_precision(cfg.matmul_precision):
            Z_orig, Phi, mask = data

            # ---- cluster(): fuzzy k-means loop (harmony.py:437-462) -----
            if cfg.fused_estep:
                carry = self._cluster_fused(state, Phi, mask, params)
            else:
                carry = self._cluster_xla(state, Phi, mask, params)

            kmeans_rounds, n_rounds = append(
                state.kmeans_rounds, state.n_rounds, carry.i)  # harmony.py:461
            obj_harmony, n_harmony = append(
                state.obj_harmony, state.n_harmony,
                carry.obj_kmeans[carry.n_kmeans - 1])          # harmony.py:462

            # ---- moe_correct_ridge() (harmony.py:535-569) ---------------
            Z_corr = moe_correct_ridge(Z_orig, Phi, carry.R, carry.E,
                                       params, cfg, mask, AXIS)
            Z_cos = l2_normalize_cols(Z_corr)                  # harmony.py:569

            converged = _check_conv_harmony(obj_harmony, n_harmony, cfg)

            return HarmonyState(
                Z_corr=Z_corr, Z_cos=Z_cos, R=carry.R, Y=carry.Y,
                O=carry.O, E=carry.E, key=carry.key,
                obj_kmeans=carry.obj_kmeans, obj_dist=carry.obj_dist,
                obj_entropy=carry.obj_entropy, obj_cross=carry.obj_cross,
                n_kmeans=carry.n_kmeans,
                obj_harmony=obj_harmony, n_harmony=n_harmony,
                kmeans_rounds=kmeans_rounds, n_rounds=n_rounds,
                converged=converged, cache=carry.cache,
                Ysum0=state.Ysum0, rep_Y=state.rep_Y, rep_O=state.rep_O,
                rep_E=state.rep_E, rep_key=state.rep_key,
                rep_cache=state.rep_cache, rep_Zcos=state.rep_Zcos,
            )


@functools.lru_cache(maxsize=32)
def get_engine(cfg: EngineConfig, mesh: Mesh) -> HarmonyEngine:
    return HarmonyEngine(cfg, mesh)
