"""Fused chunk-granular E-step in pure XLA — the multi-device counterpart of
the single-chip Pallas kernel (ops/pallas/update_r_fused.py).

Same design, same global chunk partition (ops/partition.py):

  - cells grouped into contiguous chunks; the random block partition shuffles
    chunk ids, so gathers/scatters move whole (K, CH) slabs (contiguous DMA)
    instead of per-cell lanes;
  - the per-chunk statistics cache makes R write-only (each real chunk is
    rewritten exactly once per round);
  - the next round's centroid numerator Z_cos R^T and the kmeans-error /
    entropy objective terms accumulate on the fly.

What the Pallas kernel cannot do and this one adds: cross-device execution
with DEVICE-COUNT-INVARIANT numerics. The block partition comes from the
global stripe construction, and every cross-cell statistic (the per-block
O/E re-adds inside the scan, the centroid numerator, the objective terms) is
accumulated per chunk and reduced through the fixed global frame
(partition.frame_sum): each frame row is owned by exactly one shard, so the
psum adds exact zeros, and the final reduction shape never depends on the
mesh — results are bit-identical on 1, 2, or N devices. Per-round collective
volume: n_blocks * J_fix * K * (B + 1) floats for the block stats plus one
(NC_fixed, d, K) frame — tiny next to the compute.

Semantics match the reference E-step (harmony.py:464-513) at chunk
granularity, which the reference's reproducibility contract allows (the
block partition is random; see SURVEY.md §2).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..config import EngineConfig
from .objective import chunk_objective_partials
from .partition import frame_sum, partition_geometry, shard_chunk_gids

CLAMP = 1e-8


def fused_update_r_xla3(slots, granks, removal, Z3, P3, R3, Y, sigma, theta,
                        Pr_b, O, E, cfg: EngineConfig, axis_name):
    """One full E-step over all blocks, CHUNK-MAJOR. Runs under shard_map.

    All N-scale buffers are (nc1, x, CH) — chunk id leading — and keep that
    layout across the whole k-means loop (the engine converts once per
    harmony iteration). This matters: carrying R as (K, N) across rounds
    made XLA re-tile the full 345 MB array ~4x per round (zeros-broadcast,
    two layout copies, a sublane pad — ~3.7 ms/round of pure data
    formatting at 858k, traced); chunk-major carries with leading-dim
    gathers/scatters keep every round at the compute cost.

    slots/granks: (nb, J_shard) per-shard tables from
    partition.shard_slot_tables (slots: local chunk ids, sentinel = dummy
    chunk; granks: global within-block ranks, sentinel = J_fix). removal:
    (nb, K, B+1) replicated per-block stats to remove, already reduced
    through the global frame. Z3/P3: (nc1, d|B, CH) shard-local with the
    trailing dummy chunk. R3: (nc1, K, CH) previous R — write-only (every
    real chunk is rewritten each round; the dummy chunk must arrive zero and
    stays zero). O/E: (K, B) replicated.

    Returns (R3, O, E, Ysum, cache, kerr, ent) with R3/cache shard-local and
    O/E/Ysum/kerr/ent REPLICATED (already globally reduced, bitwise
    device-count-invariant).
    """
    geom = partition_geometry(cfg)
    K, d, B = cfg.K, cfg.d, cfg.B
    Js, CH = geom.J_shard, geom.CH

    def body(carry, inp):
        O, E, R3, cache, ybuf, kbuf = carry
        slots_b, granks_b, rem_b = inp        # (Js,), (Js,), (K, B+1)

        # Remove the block from the global stats (harmony.py:491-492) and fix
        # its diversity weights (harmony.py:495-499).
        E = E - rem_b[:, 0:1] * Pr_b[None, :]
        O = O - rem_b[:, 1:]
        oe = jnp.maximum(O + E, CLAMP)
        ratio = jnp.clip(E / oe, CLAMP, 1.0)
        wdiv = jnp.exp(theta[None, :] * jnp.log(ratio))        # (K, B)

        zb = Z3[slots_b]                                       # (Js, d, CH)
        pb = P3[slots_b]                                       # (Js, B, CH)
        dist = 2.0 * (1.0 - jnp.einsum("dk,jdc->jkc", Y, zb))  # (Js, K, CH)
        s = jnp.exp(-dist / sigma[None, :, None])
        scale = s / jnp.sum(s, axis=1, keepdims=True)
        r = scale * jnp.einsum("kb,jbc->jkc", wdiv, pb)        # dummy cols -> 0
        r = r / jnp.maximum(jnp.sum(r, axis=1, keepdims=True), CLAMP)

        # Per-chunk statistics — fixed (.., CH) shapes on every mesh. One
        # batched MXU contraction produces ALL linear statistics of r (block
        # mass, O contribution, centroid numerator) in a single pass over r
        # instead of three: G = [1; Phi; Z] stacked on the feature axis.
        G = jnp.concatenate(
            [jnp.ones((Js, 1, CH), jnp.float32), pb,
             zb.astype(jnp.float32)], axis=1)                  # (Js, 1+B+d, CH)
        S = jnp.einsum("jkc,jxc->jkx", r, G)                   # (Js, K, 1+B+d)
        stats = S[:, :, : B + 1]                               # (Js, K, B+1)
        yk_c = S[:, :, B + 1:]                                 # (Js, K, d)

        # Re-add the block globally (harmony.py:506-507) through the fixed
        # rank frame: bitwise identical at any device count.
        add = frame_sum(stats, granks_b, geom.J_fix, axis_name)  # (K, B+1)
        E = E + add[:, 0:1] * Pr_b[None, :]
        O = O + add[:, 1:]

        # Per-chunk objective partials.
        kerr_c, ent_c = chunk_objective_partials(
            r, dist, sigma, k_axis=1, chunk_axis=0)            # (Js,) each

        # Write-back: every real chunk is written exactly once per round;
        # sentinel (dummy) slots all carry zeros, so duplicates are harmless.
        # Storage cast only — all statistics above used the fp32 values.
        R3 = R3.at[slots_b].set(r.astype(R3.dtype))
        cache = cache.at[slots_b].set(stats)
        ybuf = ybuf.at[slots_b].set(yk_c)
        kbuf = kbuf.at[slots_b].set(jnp.stack([kerr_c, ent_c], axis=1))
        return (O, E, R3, cache, ybuf, kbuf), None

    nc1 = geom.nc_cap + 1
    init = (O, E, R3,
            jnp.zeros((nc1, K, B + 1), jnp.float32),
            jnp.zeros((nc1, K, d), jnp.float32),
            jnp.zeros((nc1, 2), jnp.float32))
    (O, E, R3, cache, ybuf, kbuf), _ = lax.scan(
        body, init, (slots, granks, removal))

    # Global fixed-frame reductions of the per-chunk buffers.
    gids = shard_chunk_gids(geom, axis_name)
    Ysum = frame_sum(ybuf[: geom.nc_cap], gids, geom.NC_fixed,
                     axis_name).T                              # -> (d, K)
    ko = frame_sum(kbuf[: geom.nc_cap], gids, geom.NC_fixed, axis_name)
    return (R3, O, E, Ysum, cache, ko[0], ko[1])


def fused_update_r_xla(slots, granks, removal, Z_cos, Phi, Y, sigma, theta,
                       Pr_b, O, E, cfg: EngineConfig, axis_name):
    """Cell-major convenience wrapper around fused_update_r_xla3 (tests and
    direct drives): Z_cos/Phi (d|B, N_local) in, R (K, N_local) out. The
    engine calls the chunk-major core directly to avoid the per-round
    re-tiles."""
    geom = partition_geometry(cfg)
    K, d, B, CH = cfg.K, cfg.d, cfg.B, geom.CH
    nc1 = geom.nc_cap + 1
    Z3 = Z_cos.reshape(d, nc1, CH).transpose(1, 0, 2)
    P3 = Phi.reshape(B, nc1, CH).transpose(1, 0, 2)
    R3 = jnp.zeros((nc1, K, CH), cfg.r_jnp_dtype)
    R3, O, E, Ysum, cache, kerr, ent = fused_update_r_xla3(
        slots, granks, removal, Z3, P3, R3, Y, sigma, theta, Pr_b, O, E,
        cfg, axis_name)
    return (R3.transpose(1, 0, 2).reshape(K, nc1 * CH), O, E, Ysum, cache,
            kerr, ent)
