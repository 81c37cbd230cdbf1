"""Block-wise E-step: the diversity-penalized soft-assignment update.

Mirrors reference update_R (harmony.py:464-513):

  1. scale_dist = softmax over clusters of (-dist / sigma)  (:466-468)
  2. random permutation of cells, split into ceil(1/block_size) blocks of
     floor(N * block_size) cells, last block takes the remainder (:471-484)
  3. per block, sequentially: remove block cells from the global E/O stats,
     recompute the block's R with the diversity reweighting
     (E/(O+E))^theta, clamp chain at 1e-8, re-add the block (:491-507)

TPU-first design decisions:
  - The permutation is generated PER SHARD (each device partitions its own
    cells into n_blocks local blocks); global block b is the union of the
    per-shard blocks b. A random equal-split partition has the same
    distribution as the reference's global permutation split, and it keeps
    every block's work spread evenly across the mesh. The only cross-device
    traffic per block is the psum of the (K, B) O/E deltas — the C19
    reduction points from SURVEY.md.
  - Blocks are a lax.scan over a STATIC block width (max block size), with a
    validity mask reproducing the exact first-(n_blocks-1)-blocks-equal /
    last-block-remainder geometry. Gathers/scatters stay shard-local.
  - Padded cells (N not divisible by device count) carry R == 0 and Phi == 0
    and are masked out of every reduction.

With a single device this reproduces the reference semantics exactly (same
block geometry, same update equations; the permutation stream differs, which
the reference's own contract allows — see SURVEY.md §2 numerics notes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..config import EngineConfig
from ..state import HarmonyParams

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


def update_r(key, R, dist_mat, Phi, E, O, params: HarmonyParams,
             cfg: EngineConfig, mask, axis_name):
    """One full E-step. Returns (R, E, O) updated.

    R: (K, N_local) sharded; dist_mat: (K, N_local); Phi: (B, N_local);
    E, O: (K, B) replicated; mask: (N_local,) float {0,1}.
    """
    Nl = cfg.N_local
    cpb, nb, W = cfg.cells_per_block, cfg.n_blocks, cfg.block_width
    scale = compute_scale_dist(dist_mat, params.sigma)

    # Per-shard random partition of local cells into blocks.
    shard_key = jax.random.fold_in(key, lax.axis_index(axis_name))
    perm = jax.random.permutation(shard_key, Nl)
    # Pad the index stream so every block slice has static width W; sentinel Nl
    # marks "no cell" and is dropped by the masks / scatter mode below.
    pad = (nb - 1) * cpb + W - Nl
    perm_pad = jnp.concatenate([perm, jnp.full((pad,), Nl, perm.dtype)])

    offsets = jnp.arange(W, dtype=jnp.int32)
    last_size = jnp.int32(cfg.last_block)

    def block_step(carry, b):
        R, E, O = carry
        idx = lax.dynamic_slice(perm_pad, (b * cpb,), (W,))
        size_b = jnp.where(b == nb - 1, last_size, jnp.int32(cpb))
        idx_c = jnp.minimum(idx, Nl - 1)
        valid = (offsets < size_b) & (idx < Nl)
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

    (R, E, O), _ = lax.scan(
        block_step, (R, E, O), jnp.arange(nb, dtype=jnp.int32)
    )
    return R, E, O
