"""Fused Pallas TPU kernel for the block-wise E-step (+ objective + Y-update).

Motivation (measured on TPU v5e, 858k cells x K=100): the XLA lowering of the
reference-shaped update (gather block columns -> update -> scatter back,
ops/update_r.py) pays a full 343 MB copy of R on EVERY block scatter plus
lane-wise gathers at ~1/8 peak bandwidth — ~60 ms per k-means round. This
kernel gets the same round to ~1 ms by restructuring TPU-first:

  - Cells are grouped into contiguous CHUNKS of `chunk_size` columns; the
    random update order shuffles chunks instead of individual cells (the
    reference's random cell partition at harmony.py:471-484 becomes a random
    chunk partition — same expectation, coarser granularity, and every memory
    access becomes a large contiguous DMA).
  - The new soft assignments do not depend on the old R values at all — only
    the block's O/E contributions do (harmony.py:491-507). The kernel
    maintains a per-chunk statistics CACHE (sum_k R[k,n] over the chunk and
    the chunk's R Phi^T), so the "remove block from stats" pass never touches
    R: the engine turns the cache into per-block removal tensors with a tiny
    gather. R becomes WRITE-ONLY — 2 of the 3 full K x N passes disappear.
  - One pallas_call per E-step. Grid = (n_blocks, J chunks/block), sequential
    on the core. Scalar-prefetched `slots` (the shuffled chunk ids) drive the
    BlockSpec index_maps, so the automatic pipeline DMAs exactly the right
    chunk each step — no materialized permutation, no scatter.
  - dist = 2(1 - Y^T Z_cos) is computed on the MXU inside the kernel from the
    chunk of Z_cos — the K x N distance matrix never exists in HBM — then
    softmax, diversity reweighting and clamps all happen in VMEM
    (harmony.py:447, 466-503).
  - The NEXT round's centroid numerator sum_n Z_cos R_new^T (harmony.py:443)
    is accumulated on the fly, so the engine's per-round Y-update GEMM (a
    456 MB read) disappears too.
  - The k-means-error and entropy objective terms (harmony.py:399-402) are
    accumulated per chunk; the cross term needs no cell pass because
    sum(R_sigma * (theta_log @ Phi)) == sum_kb sigma_k theta_log[k,b] O[k,b]
    (O = R Phi^T by definition), computed by the engine from O directly.

Net per-round HBM traffic: read Z_cos (d x N) + write R (K x N) + small.

Padding contract: the caller allocates arrays with one extra all-zero DUMMY
chunk at the end (chunk id == n_chunks). `slots` entries equal to n_chunks
point at it; its Phi columns are zero, so its new R is zero, its cache row is
zero, and it contributes nothing anywhere. Cells beyond N inside real chunks
also have zero Phi columns and are equally inert.

Single-device only for now (the sequential O/E dependency would need a
per-block cross-chip all-reduce); the engine keeps the shard_map XLA path for
multi-device meshes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import EngineConfig

CLAMP = 1e-8


class PallasGeometry(NamedTuple):
    n_chunks: int        # real (shuffled) chunks, excluding the dummy
    J: int               # grid chunk-steps per block (static slot width)
    n_blocks: int
    chunk_size: int


def pallas_geometry(cfg: EngineConfig) -> PallasGeometry:
    """Kernel grid geometry, derived from the GLOBAL stripe partition
    (ops/partition.py) so the Pallas path shares the same device-count-
    invariant block assignment as the fused XLA path. At the kernel's only
    mesh size (1 device) J = J_fix + 1: every block's slot list ends with at
    least one dummy sentinel, so the dummy chunk of the write-only R output
    and its cache row are initialized by the kernel itself each round (the
    alternative — pinning them afterwards with a dynamic_update_slice —
    lowers to a full copy of R; measured 1.7 ms per k-means round at 858k
    cells)."""
    from ..partition import partition_geometry
    CH = cfg.chunk_size
    assert cfg.N_local % CH == 0, (cfg.N_local, CH)
    g = partition_geometry(cfg)
    return PallasGeometry(g.nc_cap, g.J_shard, g.nb, CH)


def chunk_stats(R, Phi, cfg: EngineConfig) -> jnp.ndarray:
    """Per-chunk cache (n_chunks+1, K, B+1): [:, :, 0] = chunk sums of R,
    [:, :, 1:] = chunk R Phi^T. Used to seed the kernel's cache at k-means
    loop entry; afterwards the kernel keeps it current itself.

    Computed as B+1 masked row-sums in R's native (K, N) layout — an
    "nkb"-output einsum would physically transpose the 100s-of-MB R array
    (measured 4.6 ms per call at 858k cells); the transposes here touch only
    the tiny (K, n_chunks) outputs. (A reduce_window formulation was tried
    and rejected: its TPU lowering materializes a 45 GB padded copy.)"""
    CH = cfg.chunk_size
    nc1 = R.shape[1] // CH
    # fp32 accumulation regardless of R's storage dtype.
    R3 = R.astype(jnp.float32).reshape(cfg.K, nc1, CH)
    P3 = Phi.reshape(cfg.B, nc1, CH)
    parts = [jnp.sum(R3, axis=2)]                              # (K, nc1)
    parts += [jnp.sum(R3 * P3[b][None, :, :], axis=2) for b in range(cfg.B)]
    return jnp.stack(parts, axis=2).transpose(1, 0, 2)         # (nc1, K, B+1)


def _kernel(slots_ref, ZP, Y, sigma, theta, prb, O_in, E_in, rem,
            R_out, O_out, E_out, cache_out, ybuf_out, kbuf_out,
            acc, *, J: int, fast_ent: bool):
    _kernel_impl(slots_ref, ZP, Y, sigma, theta, prb, O_in, E_in, rem,
                 O_out, E_out, cache_out, ybuf_out, kbuf_out, acc,
                 R_out=R_out, J=J, fast_ent=fast_ent)


def _kernel_nor(slots_ref, ZP, Y, sigma, theta, prb, O_in, E_in, rem,
                O_out, E_out, cache_out, ybuf_out, kbuf_out,
                acc, *, J: int, fast_ent: bool):
    """Deferred-R variant: identical arithmetic, no R output (the round's
    only K x N HBM traffic disappears; a later XLA replay — bitwise
    interchangeable with this kernel — reproduces r on demand)."""
    _kernel_impl(slots_ref, ZP, Y, sigma, theta, prb, O_in, E_in, rem,
                 O_out, E_out, cache_out, ybuf_out, kbuf_out, acc,
                 R_out=None, J=J, fast_ent=fast_ent)


def _kernel_impl(slots_ref, ZP, Y, sigma, theta, prb, O_in, E_in, rem,
                 O_out, E_out, cache_out, ybuf_out, kbuf_out,
                 acc, *, R_out, J: int, fast_ent: bool):
    b = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((b == 0) & (j == 0))
    def _():
        O_out[:] = O_in[:]
        E_out[:] = E_in[:]

    @pl.when(j == 0)
    def _():
        # Remove the whole block from the global stats using the cached
        # per-chunk statistics (harmony.py:491-492).
        E_out[:] = E_out[:] - rem[0, :, 0][:, None] * prb[:]
        O_out[:] = O_out[:] - rem[0, :, 1:]
        acc[:] = jnp.zeros_like(acc)

    # Diversity weights from the current (block-removed) stats
    # (harmony.py:495-499). Recomputed per grid step from O/E — cheap, and
    # it keeps every arithmetic expression identical to the XLA path
    # (ops/update_r_fused_xla._block_core), which is what makes the Pallas
    # and fused-XLA paths bitwise-interchangeable.
    oe = jnp.maximum(O_out[:] + E_out[:], CLAMP)
    ratio = jnp.clip(E_out[:] / oe, CLAMP, 1.0)
    logratio = jnp.log(ratio)                                   # (K, B)
    wdiv = jnp.exp(theta[:] * logratio)                         # (K, B)

    # dist + softmax + reweight, entirely in VMEM (harmony.py:447, 466-503).
    # The chunk arrives as ONE [mask; Phi; Z] feature slab (see
    # update_r_fused_xla.make_zp3 — the standalone (B, CH) one-hot block
    # gather was the traced round's 2nd-largest op).
    slab = ZP[:]                                                # (1+B+d, CH)
    B = theta.shape[1]
    B1 = B + 1
    pb = slab[1:B1, :]                                          # (B, CH)
    zb = slab[B1:, :]                                           # (d, CH)
    dist = 2.0 * (1.0 - jax.lax.dot_general(
        Y[:], zb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32))                    # (K, CH)
    s = jnp.exp(-dist / sigma[:])
    den = jnp.sum(s, axis=0, keepdims=True)                     # (1, CH)
    scale = s / den
    r_new = scale * jax.lax.dot_general(
        wdiv, pb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    den_r = jnp.maximum(jnp.sum(r_new, axis=0, keepdims=True), CLAMP)
    r_new = r_new / den_r
    if R_out is not None:
        # Storage cast only; every statistic below uses the fp32 r_new.
        R_out[:] = r_new.astype(R_out.dtype)

    # ALL linear statistics of r in one MXU contraction against the slab
    # G = [mask; Phi; Z] — the same single GEMM the XLA path runs
    # (_block_stats), so the per-chunk values match it bitwise (the VPU
    # jnp.sum this replaces rounds differently from the MXU ones-dot; the
    # mask row equals the ones row wherever r is nonzero).
    S = jax.lax.dot_general(
        r_new, slab, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                     # (K, 1+B+d)
    stats = S[:, :B1]                                           # (K, B+1)
    acc[:] = acc[:] + stats
    cache_out[0] = stats
    ybuf_out[0] = S[:, B1:]                                     # (K, d)

    # Per-chunk objective partials (harmony.py:399-402): each cell is
    # updated exactly once per round, so per-chunk sums are exact. The
    # engine reduces them through the same fixed chunk frame as the XLA
    # path. fast_ent states the log-free factorized entropy (single-
    # covariate designs; ops/objective.chunk_objective_partials_fast) in
    # the same expression order as the XLA path — bitwise interchange.
    kerr = jnp.sum(r_new * dist, keepdims=True)                # (1, 1)
    if fast_ent:
        st = jnp.sum((sigma[:] * theta[:] * logratio) * stats[:, 1:],
                     keepdims=True)                            # (1, 1)
        sr = jnp.sum(r_new * sigma[:], axis=0, keepdims=True)  # (1, CH)
        logdd = jnp.log(den) + jnp.log(den_r)                  # (1, CH)
        ent = -kerr + st - jnp.sum(sr * logdd, keepdims=True)
    else:
        ent = jnp.sum(jnp.where(
            r_new > 0.0,
            r_new * jnp.log(jnp.where(r_new > 0.0, r_new, 1.0)),
            0.0) * sigma[:], keepdims=True)                    # (1, 1)
    kbuf_out[0, :, 0:1] = kerr
    kbuf_out[0, :, 1:2] = ent

    @pl.when(j == J - 1)
    def _():
        # Put the block back into the global stats (harmony.py:506-507).
        # `acc` accumulated sequentially in ascending within-block rank
        # order — the same order the XLA path's _block_readd uses.
        E_out[:] = E_out[:] + acc[:, 0:1] * prb[:]
        O_out[:] = O_out[:] + acc[:, 1:]


def fused_update_r(slots, removal, Z_cos, Phi, mask, Y, sigma, theta, Pr_b,
                   O, E, cfg: EngineConfig, interpret: bool = False,
                   write_r: bool = True):
    """One full E-step. Returns (R, O, E, cache, ybuf, kbuf): the per-chunk
    centroid-numerator buffer ybuf (n_chunks+1, K, d) and objective-partial
    buffer kbuf (n_chunks+1, 2) are reduced by the engine through the same
    fixed chunk frame as the fused-XLA path (partition.frame_sum), so both
    paths produce bitwise-identical global statistics.

    Z_cos: (d, N_alloc), Phi: (B, N_alloc), mask: (N_alloc,) where N_alloc
    = cfg.N_local includes the trailing dummy chunk; they are stacked into
    the combined [mask; Phi; Z] slab the kernel streams (make_zp3's
    cell-major equivalent — XLA hoists the loop-invariant concat out of
    the k-means while loop). mask=None uses ones (tests; the mask row only
    affects outputs through cells whose r is zero). Y: (d, K). sigma:
    (K,), theta/Pr_b: (B,). O/E: (K, B). slots: the flattened (nb * J,)
    per-shard slot table from partition.shard_slot_tables (sentinel ==
    dummy chunk id). removal: (nb, K, B+1) per-block stats from the
    engine's global cache frame.
    """
    geom = pallas_geometry(cfg)
    K, d, B, CH = cfg.K, cfg.d, cfg.B, geom.chunk_size
    nb, J = geom.n_blocks, geom.J
    nc1 = geom.n_chunks + 1
    N_alloc = Z_cos.shape[1]
    if mask is None:
        mask = jnp.ones((N_alloc,), jnp.float32)
    ZP = jnp.concatenate([mask[None, :], Phi, Z_cos], axis=0)  # (1+B+d, NA)

    def chunk_map(b, j, slots_ref):
        return (0, slots_ref[b * J + j])

    def cache_map(b, j, slots_ref):
        return (slots_ref[b * J + j], 0, 0)

    def const_map(b, j, slots_ref):
        return (0, 0)

    def block_map(b, j, slots_ref):
        return (b, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, J),
        in_specs=[
            pl.BlockSpec((1 + B + d, CH), chunk_map),  # [mask; Phi; Z] slab
            pl.BlockSpec((d, K), const_map),     # Y
            pl.BlockSpec((K, 1), const_map),     # sigma
            pl.BlockSpec((1, B), const_map),     # theta
            pl.BlockSpec((1, B), const_map),     # Pr_b
            pl.BlockSpec((K, B), const_map),     # O
            pl.BlockSpec((K, B), const_map),     # E
            pl.BlockSpec((1, K, B + 1), block_map),   # removal
        ],
        out_specs=([pl.BlockSpec((K, CH), chunk_map)] if write_r else [])
        + [
            pl.BlockSpec((K, B), const_map),     # O
            pl.BlockSpec((K, B), const_map),     # E
            pl.BlockSpec((1, K, B + 1), cache_map),   # per-chunk cache
            pl.BlockSpec((1, K, d), cache_map),  # per-chunk Z r^T
            pl.BlockSpec((1, 1, 2), cache_map),  # per-chunk [kerr, entropy]
        ],
        scratch_shapes=[
            pltpu.VMEM((K, B + 1), jnp.float32),  # block stats accumulator
        ],
    )

    out_shape = ([jax.ShapeDtypeStruct((K, N_alloc), cfg.r_jnp_dtype)]
                 if write_r else []) + [
        jax.ShapeDtypeStruct((K, B), jnp.float32),
        jax.ShapeDtypeStruct((K, B), jnp.float32),
        jax.ShapeDtypeStruct((nc1, K, B + 1), jnp.float32),
        jax.ShapeDtypeStruct((nc1, K, d), jnp.float32),
        jax.ShapeDtypeStruct((nc1, 1, 2), jnp.float32),
    ]

    outs = pl.pallas_call(
        functools.partial(_kernel if write_r else _kernel_nor, J=J,
                          fast_ent=(cfg.fast_objective
                                    and cfg.n_covariates == 1)),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(slots, ZP, Y,
      sigma.reshape(K, 1), theta.reshape(1, B), Pr_b.reshape(1, B), O, E,
      removal)

    # The dummy chunk of R and its cache/ybuf/kbuf rows are written (with
    # zeros) by every block's trailing always-dummy grid step
    # (pallas_geometry), so the write-only outputs are fully initialized by
    # the kernel itself.
    R2 = outs[0] if write_r else None
    O2, E2, cache, ybuf, kbuf = outs[-5:]
    return R2, O2, E2, cache, ybuf, kbuf[:, 0, :]
