"""Fused Pallas TPU kernel for the block-wise E-step (+ objective).

Motivation (measured on TPU v5e, 858k cells x K=100): the XLA lowering of the
reference-shaped update (gather block columns -> update -> scatter back,
ops/update_r.py) pays a full 343 MB copy of R on EVERY block scatter plus
lane-wise gathers at ~1/8 peak bandwidth — ~60 ms per k-means round for a
computation whose irreducible HBM traffic is ~1 GB (~1.5 ms).

This kernel restructures the E-step TPU-first:

  - Cells are grouped into contiguous CHUNKS of `chunk_size` columns; the
    random update order shuffles chunks instead of individual cells (the
    reference's random cell partition at harmony.py:471-484 becomes a random
    chunk partition — same expectation, slightly coarser randomization, and
    every memory access becomes a large contiguous DMA).
  - One pallas_call per E-step. Grid = (n_blocks, 2 phases, J chunks/block),
    sequential on the core. Scalar-prefetched `slots` (the shuffled chunk ids)
    drive the BlockSpec index_maps, so the automatic pipeline DMAs exactly the
    right chunk each step — no materialized permutation, no scatter.
  - R is updated IN PLACE via input_output_aliases (phase 0 writes each chunk
    back unchanged; phase 1 writes the new values).
  - dist = 2(1 - Y^T Z_cos) is computed on the MXU inside the kernel from the
    chunk of Z_cos — the K x N distance matrix is never materialized in HBM.
  - The O/E batch-composition statistics live in the (VMEM-resident) output
    refs across all grid steps; removal/re-add happen at phase boundaries
    exactly as in the reference (harmony.py:491-507), clamp chain included.
  - The k-means-error and entropy objective terms (reference
    harmony.py:399-402) are accumulated on the fly from the freshly updated
    chunks; the cross term needs no cell pass at all because
    sum(R_sigma * (theta_log @ Phi)) == sum_kb sigma_k theta_log[k,b] O[k,b]
    (O = R Phi^T by definition), so the engine computes it from O directly.

Padding contract: the caller allocates arrays with one extra all-zero DUMMY
chunk at the end (chunk id == n_chunks). `slots` entries equal to n_chunks
point at it; its Phi columns are zero so it contributes nothing and R stays
zero there. Cells beyond N inside real chunks also have zero Phi columns and
are equally inert.

Single-device only for now (the sequential O/E dependency would need a
per-block cross-chip all-reduce); the engine keeps the shard_map XLA path for
multi-device meshes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import EngineConfig

CLAMP = 1e-8


class PallasGeometry(NamedTuple):
    n_chunks: int        # real (shuffled) chunks, excluding the dummy
    chunks_per_block: int
    last_block_chunks: int
    J: int               # grid chunk-steps per block (max, padded with dummy)
    n_blocks: int
    chunk_size: int


def pallas_geometry(cfg: EngineConfig) -> PallasGeometry:
    CH = cfg.chunk_size
    assert cfg.N_local % CH == 0, (cfg.N_local, CH)
    n_chunks = cfg.N_local // CH - 1  # last chunk is the dummy
    nb = cfg.n_blocks
    cpb = int(n_chunks * cfg.block_size)
    last = n_chunks - (nb - 1) * cpb
    return PallasGeometry(n_chunks, cpb, last, max(cpb, last), nb, CH)


def build_slots(key, geom: PallasGeometry) -> jnp.ndarray:
    """Shuffled chunk->grid-slot table, (n_blocks * J,) int32.

    Block b's real chunks occupy slots [b*J, b*J + size_b); remaining slots
    point at the dummy chunk (id == n_chunks). Mirrors the reference's
    "equal blocks, last takes the remainder" geometry (harmony.py:474-484)
    at chunk granularity."""
    perm = jax.random.permutation(key, geom.n_chunks).astype(jnp.int32)
    nb, J, cpb = geom.n_blocks, geom.J, geom.chunks_per_block
    slots = jnp.full((nb, J), geom.n_chunks, jnp.int32)
    i = jnp.arange(geom.n_chunks, dtype=jnp.int32)
    b_ids = jnp.minimum(i // cpb, nb - 1)
    j_ids = i - b_ids * cpb
    slots = slots.at[b_ids, j_ids].set(perm)
    return slots.reshape(-1)


def _kernel(slots_ref, R_in, Zc, Phi, Y, sigma, theta, prb, O_in, E_in,
            R_out, O_out, E_out, obj_out,
            accSum, accO, *, J: int):
    b = pl.program_id(0)
    p = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when((b == 0) & (p == 0) & (j == 0))
    def _():
        O_out[:] = O_in[:]
        E_out[:] = E_in[:]
        obj_out[0, 0] = 0.0
        obj_out[0, 1] = 0.0

    @pl.when(p == 0)
    def _():
        # Phase 0: accumulate the block's removal statistics; write the chunk
        # back unchanged (R_out aliases R_in, so this is a same-value write).
        @pl.when(j == 0)
        def _():
            accSum[:] = jnp.zeros_like(accSum)
            accO[:] = jnp.zeros_like(accO)
        rb = R_in[:]                                    # (K, CH)
        pb = Phi[:]                                     # (B, CH)
        accSum[:] = accSum[:] + jnp.sum(rb, axis=1, keepdims=True)
        accO[:] = accO[:] + jax.lax.dot_general(
            rb, pb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        R_out[:] = rb

    @pl.when(p == 1)
    def _():
        @pl.when(j == 0)
        def _():
            # Remove the block from the global stats (harmony.py:491-492).
            E_out[:] = E_out[:] - accSum[:] * prb[:]
            O_out[:] = O_out[:] - accO[:]
            accSum[:] = jnp.zeros_like(accSum)
            accO[:] = jnp.zeros_like(accO)

        # Diversity weights from the updated stats (harmony.py:495-499).
        oe = jnp.maximum(O_out[:] + E_out[:], CLAMP)
        ratio = jnp.clip(E_out[:] / oe, CLAMP, 1.0)
        wdiv = jnp.exp(theta[:] * jnp.log(ratio))        # (K, B)

        # dist + softmax + reweight, entirely in VMEM (harmony.py:447,466-503)
        zb = Zc[:]                                       # (d, CH)
        pb = Phi[:]                                      # (B, CH)
        dist = 2.0 * (1.0 - jax.lax.dot_general(
            Y[:], zb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))         # (K, CH)
        s = jnp.exp(-dist / sigma[:])
        scale = s / jnp.sum(s, axis=0, keepdims=True)
        r_new = scale * jax.lax.dot_general(
            wdiv, pb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        r_new = r_new / jnp.maximum(jnp.sum(r_new, axis=0, keepdims=True),
                                    CLAMP)
        R_out[:] = r_new

        # Re-add statistics (harmony.py:506-507).
        accSum[:] = accSum[:] + jnp.sum(r_new, axis=1, keepdims=True)
        accO[:] = accO[:] + jax.lax.dot_general(
            r_new, pb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        # Objective terms on the final values (harmony.py:399-402): each cell
        # is updated exactly once per round, so per-chunk sums are exact.
        kerr = jnp.sum(r_new * dist)
        ent = jnp.sum(jnp.where(
            r_new > 0.0,
            r_new * jnp.log(jnp.where(r_new > 0.0, r_new, 1.0)),
            0.0) * sigma[:])
        obj_out[0, 0] = obj_out[0, 0] + kerr
        obj_out[0, 1] = obj_out[0, 1] + ent

        @pl.when(j == J - 1)
        def _():
            E_out[:] = E_out[:] + accSum[:] * prb[:]
            O_out[:] = O_out[:] + accO[:]


def fused_update_r(slots, R, Z_cos, Phi, Y, sigma, theta, Pr_b, O, E,
                   cfg: EngineConfig, interpret: bool = False,
                   axis_name: str | None = None):
    """One full E-step. Returns (R, O, E, kmeans_error, entropy), the last two
    un-normalized (the engine applies the 2000/N constant).

    R: (K, N_alloc), Z_cos: (d, N_alloc), Phi: (B, N_alloc) where N_alloc =
    cfg.N_local includes the trailing dummy chunk. Y: (d, K). sigma: (K,),
    theta/Pr_b: (B,). O/E: (K, B). slots: from build_slots.
    """
    geom = pallas_geometry(cfg)
    K, d, B, CH = cfg.K, cfg.d, cfg.B, geom.chunk_size
    nb, J = geom.n_blocks, geom.J

    def chunk_map(b, p, j, slots_ref):
        return (0, slots_ref[b * J + j])

    def const_map(b, p, j, slots_ref):
        return (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, 2, J),
        in_specs=[
            pl.BlockSpec((K, CH), chunk_map),    # R
            pl.BlockSpec((d, CH), chunk_map),    # Z_cos
            pl.BlockSpec((B, CH), chunk_map),    # Phi
            pl.BlockSpec((d, K), const_map),     # Y
            pl.BlockSpec((K, 1), const_map),     # sigma
            pl.BlockSpec((1, B), const_map),     # theta
            pl.BlockSpec((1, B), const_map),     # Pr_b
            pl.BlockSpec((K, B), const_map),     # O
            pl.BlockSpec((K, B), const_map),     # E
        ],
        out_specs=[
            pl.BlockSpec((K, CH), chunk_map),    # R (aliased, in-place)
            pl.BlockSpec((K, B), const_map),     # O
            pl.BlockSpec((K, B), const_map),     # E
            pl.BlockSpec((1, 2), const_map,
                         memory_space=pltpu.SMEM),  # [kmeans_error, entropy]
        ],
        scratch_shapes=[
            pltpu.VMEM((K, 1), jnp.float32),     # accSum
            pltpu.VMEM((K, B), jnp.float32),     # accO
        ],
    )

    # Under shard_map every output is "varying" over the mesh axis; the
    # caller psums the small stats back to replicated (identity at 1 device).
    vma = frozenset({axis_name}) if axis_name is not None else frozenset()
    out_shape = [
        jax.ShapeDtypeStruct(R.shape, jnp.float32, vma=vma),
        jax.ShapeDtypeStruct((K, B), jnp.float32, vma=vma),
        jax.ShapeDtypeStruct((K, B), jnp.float32, vma=vma),
        jax.ShapeDtypeStruct((1, 2), jnp.float32, vma=vma),
    ]
    if axis_name is not None:
        cast = lambda x: jax.lax.pcast(x, axis_name, to="varying")
        slots, Y, sigma, theta, Pr_b, O, E = map(
            cast, (slots, Y, sigma, theta, Pr_b, O, E))

    R2, O2, E2, obj = pl.pallas_call(
        functools.partial(_kernel, J=J),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={1: 0},  # R input (after slots) -> R output
        interpret=interpret,
    )(slots, R, Z_cos, Phi, Y,
      sigma.reshape(K, 1), theta.reshape(1, B), Pr_b.reshape(1, B), O, E)

    return R2, O2, E2, obj[0, 0], obj[0, 1]
