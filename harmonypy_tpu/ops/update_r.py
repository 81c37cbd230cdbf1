"""Block-wise E-step: the diversity-penalized soft-assignment update.

Mirrors reference update_R (harmony.py:464-513):

  1. scale_dist = softmax over clusters of (-dist / sigma)  (:466-468)
  2. random partition of cells into ceil(1/block_size) blocks (:471-484)
  3. per block, sequentially: remove block cells from the global E/O stats,
     recompute the block's R with the diversity reweighting
     (E/(O+E))^theta, clamp chain at 1e-8, re-add the block (:491-507)

TPU-first design decisions:
  - The partition is the GLOBAL iid construction of ops/partition.py
    (iid_blocks): cell g's block is an iid-uniform draw — a function of
    (seed, g) only, so the partition is identical on any mesh size, and the
    per-block batch-composition noise is the reference's multinomial even
    when the input is sorted by batch (a balanced/striped partition would be
    batch-stratified there, which measurably deepens convergence). Each
    shard applies the global assignment to the cells it owns; a per-tile
    capacity rule (config.cell_tile_geom) bounds the static work width.
  - Blocks are a lax.scan over the per-shard (nb, W) slot table; sentinel
    entries (== N_local) mark unfilled slots and are masked/dropped.
    Gathers/scatters stay shard-local; the only cross-device traffic per
    block is the psum of the (K, B) O/E deltas — the C19 reduction points
    from SURVEY.md. (Those psums reduce per-SHARD partials, so this path is
    reduction-order-tight across meshes, ~1e-5, not bitwise; the fused paths
    add fixed-frame reductions for full bitwise invariance.)
  - Padded cells (N not divisible by device count) carry R == 0 and Phi == 0
    and are masked out of every reduction.

With a single device this reproduces the reference semantics exactly (same
number of near-equal blocks, same update equations; the permutation stream
differs, which the reference's own contract allows — see SURVEY.md §2).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..config import EngineConfig, round_up
from ..state import HarmonyParams
from .partition import group_by_block, iid_blocks

CLAMP = 1e-8


def compute_scale_dist(dist_mat: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """softmax_k(-dist/sigma) without max-subtraction (reference :466-468).

    dist in [0, 4] and sigma ~= 0.1 keep exp(-dist/sigma) within fp32 range.
    """
    s = jnp.exp(-dist_mat / sigma[:, None])
    return s / jnp.sum(s, axis=0, keepdims=True)


def _diversity_weights(O, E, theta):
    """(E / (O + E))^theta with the reference's clamp chain (:495-499)."""
    oe = jnp.maximum(O + E, CLAMP)
    ratio = jnp.clip(E / oe, CLAMP, 1.0)
    # pow with per-batch-level exponent: exp(theta * log(ratio)); ratio >= 1e-8
    # keeps the log finite (reference harmony_pow_torch, :579-584).
    return jnp.exp(theta[None, :] * jnp.log(ratio))


def cell_partition_len(cfg: EngineConfig) -> int:
    """Assignment-table length for the per-cell partition: covers every
    (padded) global cell id. Only sentinel entries live beyond N, so the
    random stream is unaffected by the mesh (iid_blocks draws over N)."""
    return max(round_up(cfg.N, cfg.n_blocks), cfg.n_devices * cfg.N_local)


def cell_slot_table(key, cfg: EngineConfig, axis_name):
    """(nb, W) per-shard table of local cell ids per block (sentinel ==
    N_local), from the global iid assignment. Device-count-invariant."""
    Nl, nb = cfg.N_local, cfg.n_blocks
    L = cell_partition_len(cfg)
    blocks = iid_blocks(key, cfg.N, L, nb)           # cells >= N -> sentinel
    lo = lax.axis_index(axis_name) * Nl
    myb = lax.dynamic_slice(blocks, (lo,), (Nl,))
    return group_by_block(myb, nb, cfg.cell_block_width, fill=Nl)


def update_r(key, R, dist_mat, Phi, E, O, params: HarmonyParams,
             cfg: EngineConfig, mask, axis_name):
    """One full E-step. Returns (R, E, O) updated.

    R: (K, N_local) sharded; dist_mat: (K, N_local); Phi: (B, N_local);
    E, O: (K, B) replicated; mask: (N_local,) float {0,1}.
    """
    Nl = cfg.N_local
    scale = compute_scale_dist(dist_mat, params.sigma)
    slot_table = cell_slot_table(key, cfg, axis_name)          # (nb, W)

    def block_step(carry, idx):
        R, E, O = carry
        idx_c = jnp.minimum(idx, Nl - 1)
        valid = idx < Nl
        live = valid.astype(jnp.float32) * mask[idx_c]           # (W,)

        Rb = R[:, idx_c].astype(jnp.float32) * live[None, :]     # (K, W)
        Phib = Phi[:, idx_c] * live[None, :]                     # (B, W)
        scaleb = scale[:, idx_c]                                 # (K, W)

        # Remove block cells from global stats (reference :491-492).
        E = E - jnp.outer(lax.psum(jnp.sum(Rb, axis=1), axis_name), params.Pr_b)
        O = O - lax.psum(Rb @ Phib.T, axis_name)

        # Recompute the block's soft assignments (reference :494-503).
        w_div = _diversity_weights(O, E, params.theta)            # (K, B)
        R_new = scaleb * (w_div @ Phib)                           # (K, W)
        colsum = jnp.maximum(jnp.sum(R_new, axis=0), CLAMP)
        R_new = (R_new / colsum[None, :]) * live[None, :]

        # Put block cells back (reference :506-507). Accumulate from the
        # STORED (possibly bf16-rounded) values: this path's removal above
        # re-reads the stored R, so O/E must stay exactly consistent with it
        # or a rounding residual would accrue every round. (The fused paths
        # instead keep an fp32 pre-cast stats cache — see
        # ops/pallas/update_r_fused.chunk_stats.)
        R_store = R_new.astype(R.dtype)
        R_acc = R_store.astype(jnp.float32)
        E = E + jnp.outer(lax.psum(jnp.sum(R_acc, axis=1), axis_name), params.Pr_b)
        O = O + lax.psum(R_acc @ Phib.T, axis_name)

        # Scatter the block back; invalid lanes target index Nl => dropped.
        scatter_idx = jnp.where(valid, idx, Nl)
        R = R.at[:, scatter_idx].set(R_store, mode="drop")
        return (R, E, O), None

    (R, E, O), _ = lax.scan(block_step, (R, E, O), slot_table)
    return R, E, O
