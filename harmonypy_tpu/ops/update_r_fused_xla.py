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
from .objective import chunk_objective_partials, chunk_objective_partials_fast
from .partition import (frame_rows, frame_sum, partition_geometry,
                        shard_chunk_gids)

CLAMP = 1e-8


def make_zp3(Z_cos, Phi, mask, cfg: EngineConfig):
    """Chunk-major combined feature slab (nc1, 1+B+d, CH) = [mask; Phi; Z].

    One slab replaces the separate Z3/P3/M3 inputs of every fused body:
    the per-block gather moves ONE well-tiled (1+B+d, CH) block instead of
    a separate (B, CH) one-hot slab — traced on v5e, the standalone bf16
    (3, 2048) Phi gather tiled T(4,128)(2,1) and cost 10.6 us/call
    (~0.21 ms/round, 2nd-largest op of the deferred round) while the
    10x-larger Z gather took 2.25 us (docs/deferred_roofline.md). The slab
    IS the G feature matrix `_block_stats` previously concatenated per
    block, so that copy disappears too.

    Row 0 is the real cell MASK, not ones: the stats contraction is
    bitwise indifferent (r is exactly zero wherever mask is — 0*1 == 0*0)
    and the ridge replay needs the mask row so corrected/normalized pad
    cells stay exactly zero (replay_apply)."""
    geom = partition_geometry(cfg)
    nc1, CH = geom.nc_cap + 1, geom.CH
    ZP = jnp.concatenate([mask[None, :], Phi, Z_cos], axis=0)
    return ZP.reshape(1 + cfg.B + cfg.d, nc1, CH).transpose(1, 0, 2)


def _block_core(O, E, rem_b, slots_b, ZP3, Y, sigma, theta, Pr_b):
    """Shared per-block math (reference harmony.py:491-503): remove the
    block's stats, diversity-reweight, recompute the block's soft
    assignments. Returns (O_removed, E_removed, r, g, pb, dist, logratio,
    logdd) with g the gathered (Js, 1+B+d, CH) feature slab and logdd the
    per-cell log of the two softmax denominators (consumed by the fast
    entropy partials; dead code the replay passes' XLA lowering drops).
    Single source for the round body AND the deferred-R replay passes —
    the replay must reproduce r bitwise."""
    E = E - rem_b[:, 0:1] * Pr_b[None, :]
    O = O - rem_b[:, 1:]
    oe = jnp.maximum(O + E, CLAMP)
    ratio = jnp.clip(E / oe, CLAMP, 1.0)
    logratio = jnp.log(ratio)                                  # (K, B)
    wdiv = jnp.exp(theta[None, :] * logratio)                  # (K, B)

    B1 = 1 + theta.shape[0]
    g = ZP3[slots_b]                                           # (Js, 1+B+d, CH)
    pb = g[:, 1:B1, :]                                         # (Js, B, CH)
    zb = g[:, B1:, :]                                          # (Js, d, CH)
    dist = 2.0 * (1.0 - jnp.einsum("dk,jdc->jkc", Y, zb))      # (Js, K, CH)
    s = jnp.exp(-dist / sigma[None, :, None])
    den = jnp.sum(s, axis=1, keepdims=True)
    scale = s / den
    r = scale * jnp.einsum("kb,jbc->jkc", wdiv, pb)            # dummy cols -> 0
    den_r = jnp.maximum(jnp.sum(r, axis=1, keepdims=True), CLAMP)
    r = r / den_r
    logdd = (jnp.log(den) + jnp.log(den_r))[:, 0, :]           # (Js, CH)
    return O, E, r, g, pb, dist, logratio, logdd


def _block_stats(r, g, B1: int):
    """All linear statistics of r in one batched MXU contraction over the
    gathered feature slab g = [mask; Phi; Z]: block mass + O contribution
    (stats, (Js, K, B+1)) and the centroid numerator (yk_c, (Js, K, d))."""
    S = jnp.einsum("jkc,jxc->jkx", r, g.astype(jnp.float32))   # (Js,K,1+B+d)
    return S[:, :, :B1], S[:, :, B1:]


def _block_readd(O, E, stats, granks_b, Pr_b, geom, axis_name):
    """Re-add the block globally (harmony.py:506-507) through the fixed
    rank frame: bitwise identical at any device count. The frame rows are
    accumulated SEQUENTIALLY in ascending global-rank order — the same
    order the Pallas kernel's in-grid accumulator uses — so the two fused
    paths produce bitwise-identical O/E trajectories."""
    rows = frame_rows(stats, granks_b, geom.J_fix, axis_name)  # (J_fix,K,B+1)
    add = lax.fori_loop(
        0, geom.J_fix, lambda i, a: a + rows[i],
        jnp.zeros(rows.shape[1:], rows.dtype))                 # (K, B+1)
    return O + add[:, 1:], E + add[:, 0:1] * Pr_b[None, :]


def _chunk_partials(r, dist, stats, sigma, theta, logratio, logdd,
                    cfg: EngineConfig):
    """Per-chunk (kerr, ent): the log-free factorized form when opted in
    AND each cell carries one covariate level, the generic elementwise
    form otherwise (multi-covariate Phi columns hold several ones, so
    log w is a log of a sum and does not factorize; and the factorized
    values differ at ~1e-6 rel, enough to reorder near-plateau round
    counts — see EngineConfig.fast_objective)."""
    if cfg.fast_objective and cfg.n_covariates == 1:
        return chunk_objective_partials_fast(
            r, dist, stats[:, :, 1:], sigma, theta, logratio, logdd)
    return chunk_objective_partials(r, dist, sigma, k_axis=1, chunk_axis=0)


def fused_update_r_xla3(slots, granks, removal, ZP3, R3, Y, sigma, theta,
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
    through the global frame. ZP3: (nc1, 1+B+d, CH) shard-local combined
    [mask; Phi; Z_cos] slab (make_zp3) with the trailing dummy chunk. R3:
    (nc1, K, CH) previous R — write-only (every real chunk is rewritten
    each round; the dummy chunk must arrive zero and stays zero). O/E:
    (K, B) replicated.

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

        O, E, r, g, pb, dist, logratio, logdd = _block_core(
            O, E, rem_b, slots_b, ZP3, Y, sigma, theta, Pr_b)
        # Per-chunk statistics — fixed (.., CH) shapes on every mesh.
        stats, yk_c = _block_stats(r, g, B + 1)
        O, E = _block_readd(O, E, stats, granks_b, Pr_b, geom, axis_name)

        # Per-chunk objective partials.
        kerr_c, ent_c = _chunk_partials(
            r, dist, stats, sigma, theta, logratio, logdd, cfg)  # (Js,) each

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


def fused_update_nor_xla3(slots, granks, removal, ZP3, Y, sigma, theta,
                          Pr_b, O, E, cfg: EngineConfig, axis_name):
    """Deferred-R round: identical to fused_update_r_xla3 minus the R3
    write-back — nothing K x N is read or written. Every statistic (O, E,
    Ysum, cache, objective) is computed from the in-flight r values, which
    a later replay pass reproduces bitwise from (round key, pre-round O/E/
    cache, Y). Returns (O, E, Ysum, cache, kerr, ent)."""
    geom = partition_geometry(cfg)
    K, d, B = cfg.K, cfg.d, cfg.B

    def body(carry, inp):
        O, E, cache, ybuf, kbuf = carry
        slots_b, granks_b, rem_b = inp

        O, E, r, g, pb, dist, logratio, logdd = _block_core(
            O, E, rem_b, slots_b, ZP3, Y, sigma, theta, Pr_b)
        stats, yk_c = _block_stats(r, g, B + 1)
        O, E = _block_readd(O, E, stats, granks_b, Pr_b, geom, axis_name)
        kerr_c, ent_c = _chunk_partials(
            r, dist, stats, sigma, theta, logratio, logdd, cfg)

        cache = cache.at[slots_b].set(stats)
        ybuf = ybuf.at[slots_b].set(yk_c)
        kbuf = kbuf.at[slots_b].set(jnp.stack([kerr_c, ent_c], axis=1))
        return (O, E, cache, ybuf, kbuf), None

    nc1 = geom.nc_cap + 1
    init = (O, E,
            jnp.zeros((nc1, K, B + 1), jnp.float32),
            jnp.zeros((nc1, K, d), jnp.float32),
            jnp.zeros((nc1, 2), jnp.float32))
    (O, E, cache, ybuf, kbuf), _ = lax.scan(
        body, init, (slots, granks, removal))

    gids = shard_chunk_gids(geom, axis_name)
    Ysum = frame_sum(ybuf[: geom.nc_cap], gids, geom.NC_fixed,
                     axis_name).T
    ko = frame_sum(kbuf[: geom.nc_cap], gids, geom.NC_fixed, axis_name)
    return (O, E, Ysum, cache, ko[0], ko[1])


def replay_normal_eq(slots, granks, removal, ZP3, ZO3, Y, sigma,
                     theta, Pr_b, O, E, cfg: EngineConfig, axis_name):
    """Deferred-R ridge pass 1: replay the final k-means round's E-step
    (bitwise — same _block_core, same tables, same pre-round O/E/cache) and
    accumulate the ridge normal equations from the in-flight r, chunk-
    resident (VERDICT r2 #6: the stored-R path read the K x N array twice
    for ridge; here it is never materialized at all).

    The Phi_moe design rows a = [mask; Phi] are the leading B1 rows of the
    gathered ZP3 slab (mask IS the intercept row: pads carry zero). ZO3:
    (nc1, d, CH) chunk-major Z_orig. Returns S (B1*(B1+d), K) replicated —
    the same stacked normal-equation layout as ridge._normal_eq_framed,
    reduced through the same fixed frame (bitwise device-count-invariant).
    """
    geom = partition_geometry(cfg)
    K, d, B, B1 = cfg.K, cfg.d, cfg.B, cfg.B1

    def body(carry, inp):
        O, E, Sbuf = carry
        slots_b, granks_b, rem_b = inp
        O, E, r, g, pb, _, _, _ = _block_core(
            O, E, rem_b, slots_b, ZP3, Y, sigma, theta, Pr_b)
        stats, _ = _block_stats(r, g, B1)
        O, E = _block_readd(O, E, stats, granks_b, Pr_b, geom, axis_name)

        a = g[:, :B1, :]
        zo = ZO3[slots_b]                                      # (Js, d, CH)
        # cov block: the (B1*B1, CH) design-product features are tiny.
        Fa = (a[:, :, None, :] * a[:, None, :, :]).reshape(
            a.shape[0], B1 * B1, -1)
        Sa = jnp.einsum("jfc,jkc->jfk", Fa, r)                 # (Js, B1², K)
        # rhs block: per design row b, the features a_b ⊙ Z_orig stay in
        # the natural (d, CH) layout — the previous single stacked
        # (B1*(B1+d), CH) feature slab forced a layout copy of ~1 MB/chunk
        # around its GEMM (traced: copy.268, ~0.6 ms/pass at 858k).
        Sz = [jnp.einsum("jdc,jkc->jdk", a[:, b, None, :] * zo, r)
              for b in range(B1)]                              # B1×(Js, d, K)
        S_c = jnp.concatenate([Sa] + Sz, axis=1)               # (Js, F, K)
        Sbuf = Sbuf.at[slots_b].set(S_c)
        return (O, E, Sbuf), None

    nc1 = geom.nc_cap + 1
    init = (O, E, jnp.zeros((nc1, B1 * (B1 + d), K), jnp.float32))
    (_, _, Sbuf), _ = lax.scan(body, init, (slots, granks, removal))
    gids = shard_chunk_gids(geom, axis_name)
    return frame_sum(Sbuf[: geom.nc_cap], gids, geom.NC_fixed, axis_name)


def replay_apply(slots, granks, removal, ZP3, ZO3, W, Y, sigma,
                 theta, Pr_b, O, E, cfg: EngineConfig, axis_name):
    """Deferred-R ridge pass 2: replay the final round's E-step again and
    apply the ridge correction chunk-resident (reference harmony.py:559-569),
    producing the corrected embedding, its L2-normalization, and the NEXT
    harmony iteration's initial centroid numerator Z_cos_new r^T — all
    without materializing R.

    W: (K, B1, d) solved ridge coefficients (intercept row already zeroed).
    Returns (Zc3 (nc1, d, CH), Zs3 (nc1, d, CH), Ysum0 (d, K) replicated).
    """
    geom = partition_geometry(cfg)
    K, d, B1 = cfg.K, cfg.d, cfg.B1

    def body(carry, inp):
        O, E, Zc3, Zs3, ybuf = carry
        slots_b, granks_b, rem_b = inp
        O, E, r, g, pb, _, _, _ = _block_core(
            O, E, rem_b, slots_b, ZP3, Y, sigma, theta, Pr_b)
        stats, _ = _block_stats(r, g, B1)
        O, E = _block_readd(O, E, stats, granks_b, Pr_b, geom, axis_name)

        a = g[:, :B1, :]   # [mask; Phi] — pads stay exactly zero below
        # correction[d, c] = sum_b a[b, c] * (sum_k W[k, b, d] r[k, c]):
        # one (d, K) x (K, CH) GEMM per design row, accumulated in
        # ascending-b order. Same FLOPs as the previous single
        # (CH, K) x (K, B1*d) GEMM but each partial lands in the natural
        # (d, CH) output layout — the stacked form forced a ~1 MB/chunk
        # layout copy of its (CH, B1*d) result (traced: copy.269,
        # ~0.7 ms/pass at 858k) before the design-row contraction.
        corr = a[:, 0, None, :] * jnp.einsum("kd,jkc->jdc", W[:, 0, :], r)
        for b in range(1, B1):
            corr = corr + (a[:, b, None, :]
                           * jnp.einsum("kd,jkc->jdc", W[:, b, :], r))
        zc = ZO3[slots_b] - corr                               # (Js, d, CH)
        # Same formula as normalize.l2_normalize_cols (bitwise-matching the
        # stored-R path's full-array normalization, harmony.py:569).
        norm = jnp.sqrt(jnp.sum(zc * zc, axis=1, keepdims=True))
        zs = zc / jnp.where(norm > 0.0, norm, 1.0)
        y_c = jnp.einsum("jdc,jkc->jdk", zs, r)                # (Js, d, K)

        Zc3 = Zc3.at[slots_b].set(zc)
        Zs3 = Zs3.at[slots_b].set(zs)
        ybuf = ybuf.at[slots_b].set(y_c)
        return (O, E, Zc3, Zs3, ybuf), None

    nc1 = geom.nc_cap + 1
    zeros3 = jnp.zeros((nc1, d, geom.CH), jnp.float32)
    init = (O, E, zeros3, zeros3,
            jnp.zeros((nc1, d, K), jnp.float32))
    (_, _, Zc3, Zs3, ybuf), _ = lax.scan(body, init, (slots, granks, removal))
    gids = shard_chunk_gids(geom, axis_name)
    Ysum0 = frame_sum(ybuf[: geom.nc_cap], gids, geom.NC_fixed, axis_name)
    return Zc3, Zs3, Ysum0


def replay_r(slots, granks, removal, ZP3, Y, sigma, theta, Pr_b, O, E,
             cfg: EngineConfig, axis_name, lo: int, width: int):
    """Deferred-R materializer: replay the final round and return the
    stored-form R for the local chunk window [lo, lo + width) only
    ((width, K, CH) per shard). The full replay runs regardless (the O/E
    evolution is sequential over blocks) but only the window is kept, so
    peak memory stays K x (width * CH) per shard — callers page through
    windows to stream R out without ever materializing K x N."""
    geom = partition_geometry(cfg)
    K = cfg.K

    def body(carry, inp):
        O, E, Rw = carry
        slots_b, granks_b, rem_b = inp
        O, E, r, g, pb, _, _, _ = _block_core(
            O, E, rem_b, slots_b, ZP3, Y, sigma, theta, Pr_b)
        stats, _ = _block_stats(r, g, cfg.B1)
        O, E = _block_readd(O, E, stats, granks_b, Pr_b, geom, axis_name)
        # Scatter the window's chunks; out-of-window slots hit the trash row.
        w_idx = slots_b - lo
        w_idx = jnp.where((w_idx >= 0) & (w_idx < width), w_idx, width)
        Rw = Rw.at[w_idx].set(r.astype(Rw.dtype), mode="drop")
        return (O, E, Rw), None

    init = (O, E, jnp.zeros((width + 1, K, geom.CH), cfg.r_jnp_dtype))
    (_, _, Rw), _ = lax.scan(body, init, (slots, granks, removal))
    return Rw[:width]


def fused_update_r_xla(slots, granks, removal, Z_cos, Phi, Y, sigma, theta,
                       Pr_b, O, E, cfg: EngineConfig, axis_name, mask=None):
    """Cell-major convenience wrapper around fused_update_r_xla3 (tests and
    direct drives): Z_cos/Phi (d|B, N_local) in, R (K, N_local) out. The
    engine calls the chunk-major core directly to avoid the per-round
    re-tiles. mask defaults to ones — the slab's mask row only affects
    outputs through cells whose r is zero (see make_zp3)."""
    geom = partition_geometry(cfg)
    K, CH = cfg.K, geom.CH
    nc1 = geom.nc_cap + 1
    if mask is None:
        mask = jnp.ones((Z_cos.shape[1],), jnp.float32)
    ZP3 = make_zp3(Z_cos, Phi, mask, cfg)
    R3 = jnp.zeros((nc1, K, CH), cfg.r_jnp_dtype)
    R3, O, E, Ysum, cache, kerr, ent = fused_update_r_xla3(
        slots, granks, removal, ZP3, R3, Y, sigma, theta, Pr_b, O, E,
        cfg, axis_name)
    return (R3.transpose(1, 0, 2).reshape(K, nc1 * CH), O, E, Ysum, cache,
            kerr, ent)
