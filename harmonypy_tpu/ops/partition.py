"""Device-count-invariant block partition + fixed-order reduction frames.

The reference's E-step partitions cells into ceil(1/block_size) random blocks
(harmony.py:471-484) and its reproducibility contract is "same seed => same
result" (reference tests/test_harmony.py:50-57). For the TPU engine that
contract must hold ACROSS MESH SIZES: run_harmony(seed) on 1 device and on N
devices must produce the same Z_corr. Two mechanisms deliver it:

1. GLOBAL STRIPE PARTITION. Chunks (contiguous groups of `chunk_size` cells,
   the fused E-step granularity) are assigned to blocks through fixed stripes
   of `n_blocks` consecutive chunks; stripe s gets an independent random
   bijection sigma_s = permutation(fold_in(key, s)) of the block ids. The
   assignment of chunk g is therefore a function of (key, g) ONLY — never of
   the device count — and any contiguous shard owns at most
   ceil(own_chunks / n_blocks) + 1 chunks of any one block, which gives the
   static per-shard slot shapes shard_map needs. (Stratification by stripe is
   itself a uniform random equal-size partition — the same family the
   reference draws from, just constrained to be balanced.)

2. DISJOINT-SCATTER REDUCTION FRAMES. Every cross-cell reduction (block O/E
   deltas, the centroid numerator, objective terms, ridge normal equations)
   is computed per chunk — fixed (.., chunk_size) shapes identical on every
   mesh — then scattered into a global (NC_fixed, ...) frame indexed by
   global chunk id. Each frame row is written by exactly one shard, so the
   cross-device psum only ever adds exact zeros (bitwise-neutral in IEEE
   float), and the final reduction runs over a fixed, device-count-
   independent shape. Result: bit-identical statistics on any mesh.

The same stripe construction at CELL granularity drives the per-cell E-step
fallback (ops/update_r.py): its partition is equally device-count-invariant,
but its per-block psums reduce shard partials (not per-cell frames), so that
path is reduction-order-tight (~1e-5) rather than bitwise across meshes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..config import EngineConfig, cdiv, round_up


class PartitionGeometry(NamedTuple):
    """Static global-partition geometry for the fused (chunked) E-step."""

    NC_real: int    # ceil(N / CH): chunks containing real cells
    NC_fixed: int   # round_up(NC_real, nb): partition/reduction frame rows
    nc_cap: int     # per-shard chunk capacity (excluding the dummy chunk)
    L: int          # assignment-table length: max(NC_fixed, D * nc_cap)
    J_fix: int      # NC_fixed // nb: global chunk slots per block
    J_shard: int    # static per-shard chunk slots per block
    nb: int         # number of blocks
    CH: int         # chunk size (cells)
    n_devices: int


def partition_geometry(cfg: EngineConfig) -> PartitionGeometry:
    CH, nb, D = cfg.chunk_size, cfg.n_blocks, cfg.n_devices
    NC_real = cdiv(cfg.N, CH)
    NC_fixed = round_up(NC_real, nb)
    nc_cap = cfg.N_local // CH - 1  # last per-shard chunk is the dummy
    L = max(NC_fixed, D * nc_cap)
    return PartitionGeometry(
        NC_real=NC_real, NC_fixed=NC_fixed, nc_cap=nc_cap, L=L,
        J_fix=NC_fixed // nb, J_shard=cdiv(nc_cap, nb) + 1,
        nb=nb, CH=CH, n_devices=D)


def stripe_blocks(key, n_real: int, L: int, nb: int) -> jnp.ndarray:
    """(L,) int32 block assignment: item g < n_real gets block
    sigma_{g // nb}(g % nb); items >= n_real get the sentinel block `nb`.
    Depends only on (key, g, nb) — never on the mesh."""
    n_stripes = cdiv(max(L, n_real), nb)

    def one(s):
        return jax.random.permutation(jax.random.fold_in(key, s), nb)

    sigma = jax.vmap(one)(jnp.arange(n_stripes, dtype=jnp.uint32))
    blocks = sigma.reshape(-1)[:L].astype(jnp.int32)
    return jnp.where(jnp.arange(L) < n_real, blocks, jnp.int32(nb))


def iid_blocks(key, n_real: int, L: int, nb: int) -> jnp.ndarray:
    """(L,) int32 block assignment with iid-uniform blocks per cell — the
    multinomial composition noise of the reference's random blocks
    (harmony.py:471-484), preserved even when the input is sorted by batch
    (a stripe/balanced partition would be batch-STRATIFIED there, which
    measurably changes the algorithm's dynamics). Items >= n_real get the
    sentinel block `nb`.

    Static-shape rule: within each fixed tile of G = nb * CELL_TILE_M
    consecutive cells, at most `cap` cells of any one block participate;
    overflow cells (>=4-sigma tail, ~2e-5 of tile-blocks) are sentineled and
    simply skip that round's update. The rule is a function of (key, g)
    only, so the assignment — including the skips — is identical on every
    mesh size."""
    from ..config import cell_tile_geom

    G, cap = cell_tile_geom(nb)
    # The draw covers exactly the real ids (rounded up to whole tiles), so
    # its shape is a function of (n_real, nb) alone — L (which can depend on
    # the mesh via the per-shard padded length) only ever appends sentinel
    # entries and never changes the random stream.
    n_tiles = cdiv(max(n_real, 1), G)
    raw = jax.random.randint(key, (n_tiles * G,), 0, nb, jnp.int32)
    occ = raw.reshape(n_tiles, G)[:, :, None] == jnp.arange(nb)[None, None, :]
    ranks = jnp.cumsum(occ.astype(jnp.int32), axis=1) - 1     # (T, G, nb)
    rank = jnp.take_along_axis(
        ranks, raw.reshape(n_tiles, G, 1), axis=2).reshape(-1)
    blocks = jnp.where(rank < cap, raw, jnp.int32(nb))
    if blocks.shape[0] < L:
        blocks = jnp.concatenate(
            [blocks, jnp.full((L - blocks.shape[0],), nb, jnp.int32)])
    blocks = blocks[:L]
    return jnp.where(jnp.arange(L) < n_real, blocks, jnp.int32(nb))


def block_ranks(blocks: jnp.ndarray, nb: int, sentinel: int) -> jnp.ndarray:
    """(L,) int32 rank of each item within its block (0-based, ascending by
    global id); sentinel-block items get `sentinel`."""
    occ = (blocks[:, None] == jnp.arange(nb, dtype=blocks.dtype)[None, :])
    ranks_all = jnp.cumsum(occ.astype(jnp.int32), axis=0) - 1
    r = jnp.take_along_axis(
        ranks_all, jnp.clip(blocks, 0, nb - 1)[:, None], axis=1)[:, 0]
    return jnp.where(blocks < nb, r, jnp.int32(sentinel))


def global_slot_table(blocks, ranks, geom: PartitionGeometry) -> jnp.ndarray:
    """(nb, J_fix) int32 global chunk id per (block, rank). Every slot is
    filled: each stripe contributes exactly one chunk to every block over the
    first NC_fixed ids."""
    g = jnp.arange(geom.NC_fixed, dtype=jnp.int32)
    return (jnp.zeros((geom.nb, geom.J_fix), jnp.int32)
            .at[blocks[: geom.NC_fixed], ranks[: geom.NC_fixed]].set(g))


def group_by_block(my_blocks, nb: int, width: int, fill: int,
                   extra=None, extra_fill: int = 0):
    """Group local item ids by block: (n_items,) block ids (sentinel == nb)
    -> (nb, width) int32 local ids ascending within each block; unfilled
    slots hold `fill`. If `extra` is given, the matching per-item values are
    co-scattered (unfilled -> `extra_fill`)."""
    n = my_blocks.shape[0]
    # Stable grouping by block id: a stable sort preserves ascending local-id
    # order within each block. (A composite int32 key my_blocks*(n+1)+id
    # would overflow 2^31 for large N_local x n_blocks.)
    order = jnp.argsort(my_blocks, stable=True).astype(jnp.int32)
    sb = my_blocks[order]
    cnt = jnp.sum(my_blocks[:, None] == jnp.arange(nb + 1)[None, :], axis=0)
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt.astype(jnp.int32))])[:-1]
    pos = jnp.arange(n, dtype=jnp.int32) - offs[jnp.clip(sb, 0, nb)]
    slots = (jnp.full((nb, width), fill, jnp.int32)
             .at[sb, pos].set(order.astype(jnp.int32), mode="drop"))
    if extra is None:
        return slots
    ex = (jnp.full((nb, width), extra_fill, jnp.int32)
          .at[sb, pos].set(extra[order], mode="drop"))
    return slots, ex


def shard_slot_tables(blocks, ranks, geom: PartitionGeometry, axis_name):
    """Per-shard slot tables, built from the GLOBAL assignment.

    Returns (slots, granks):
      slots  (nb, J_shard) int32 — local chunk ids of this shard's chunks of
             each block, ascending by global id; unfilled slots hold the
             dummy-chunk sentinel `nc_cap`.
      granks (nb, J_shard) int32 — the matching global within-block ranks;
             unfilled slots hold the trash-row sentinel `J_fix`.
    """
    nc = geom.nc_cap
    lo = lax.axis_index(axis_name) * nc
    myb = lax.dynamic_slice(blocks, (lo,), (nc,))
    myr = lax.dynamic_slice(ranks, (lo,), (nc,))
    return group_by_block(myb, geom.nb, geom.J_shard, fill=nc,
                          extra=myr, extra_fill=geom.J_fix)


def single_device_tables(key, cfg: EngineConfig):
    """Mesh-free slot/removal-table builders for one device (tests and
    direct kernel drives): returns (slots, granks, gtbl) exactly as the
    engine would derive them on a 1-device mesh."""
    geom = partition_geometry(cfg)
    assert geom.n_devices == 1, geom
    blocks = stripe_blocks(key, geom.NC_fixed, geom.L, geom.nb)
    ranks = block_ranks(blocks, geom.nb, geom.J_fix)
    slots, granks = group_by_block(
        blocks[: geom.nc_cap], geom.nb, geom.J_shard, fill=geom.nc_cap,
        extra=ranks[: geom.nc_cap], extra_fill=geom.J_fix)
    gtbl = global_slot_table(blocks, ranks, geom)
    return slots, granks, gtbl


def removal_from_cache(cache, gtbl, geom: PartitionGeometry) -> jnp.ndarray:
    """(nb, K, B+1) per-block removal stats from a GLOBAL-frame cache
    (NC_fixed rows, ascending chunk id). Mesh-free helper mirroring the
    engine's fixed-frame removal computation."""
    pad = geom.NC_fixed - cache.shape[0]
    if pad > 0:
        cache = jnp.concatenate(
            [cache, jnp.zeros((pad,) + cache.shape[1:], cache.dtype)])
    return jnp.sum(cache[: geom.NC_fixed][gtbl], axis=1)


def round_tables(k_r, cache, geom: PartitionGeometry, axis_name):
    """Everything one fused E-step round derives from (round key, cache):
    the per-shard slot/rank tables and the per-block removal stats. Single
    source shared by the k-means round body and the deferred-R replay
    passes, so a replay reproduces the round's partition and O/E evolution
    bitwise. Runs under shard_map.

    Returns (slots (nb, J_shard), granks (nb, J_shard),
    removal (nb, K, B+1) replicated)."""
    blocks = stripe_blocks(k_r, geom.NC_fixed, geom.L, geom.nb)
    ranks = block_ranks(blocks, geom.nb, geom.J_fix)
    slots, granks = shard_slot_tables(blocks, ranks, geom, axis_name)
    gids = shard_chunk_gids(geom, axis_name)
    cache_glob = frame_rows(cache[: geom.nc_cap], gids, geom.NC_fixed,
                            axis_name)
    gtbl = global_slot_table(blocks, ranks, geom)
    removal = jnp.sum(cache_glob[gtbl], axis=1)          # (nb, K, B+1)
    return slots, granks, removal


def shard_chunk_gids(geom: PartitionGeometry, axis_name) -> jnp.ndarray:
    """(nc_cap,) global chunk ids owned by this shard; ids beyond the fixed
    frame (empty excess-capacity chunks) get the drop sentinel NC_fixed."""
    lo = lax.axis_index(axis_name) * geom.nc_cap
    ids = lo + jnp.arange(geom.nc_cap, dtype=jnp.int32)
    return jnp.where(ids < geom.NC_fixed, ids, jnp.int32(geom.NC_fixed))


def frame_rows(vals, gids, n_rows: int, axis_name):
    """Scatter shard-local per-item rows into the global (n_rows, ...) frame
    and replicate it. Each row is owned by exactly one shard (gids disjoint
    across shards; sentinel >= n_rows drops), so the psum adds exact zeros —
    the replicated result is bitwise device-count-independent."""
    buf = jnp.zeros((n_rows,) + vals.shape[1:], vals.dtype)
    buf = buf.at[gids].set(vals, mode="drop")
    return lax.psum(buf, axis_name)


def frame_sum(vals, gids, n_rows: int, axis_name):
    """Fixed-order global reduction: frame_rows then a sum over the fixed,
    device-count-independent leading axis. Bitwise-identical on any mesh."""
    return jnp.sum(frame_rows(vals, gids, n_rows, axis_name), axis=0)
