"""Fused chunk-granular E-step in pure XLA — the multi-device counterpart of
the single-chip Pallas kernel (ops/pallas/update_r_fused.py).

Same design, same geometry (pallas_geometry / build_slots / chunk_stats /
block_removal are shared):

  - cells grouped into contiguous chunks; the random block partition shuffles
    chunk ids, so gathers/scatters move whole (K, CH) slabs (contiguous DMA)
    instead of per-cell lanes;
  - the per-chunk statistics cache makes R write-only (each real chunk is
    rewritten exactly once per round);
  - the next round's centroid numerator Z_cos R^T and the kmeans-error /
    entropy objective terms accumulate on the fly.

What the Pallas kernel cannot do and this one adds: cross-device execution.
Every shard holds its own chunks; global block b is the union of the shards'
slot-b chunks, and the two (K,)/(K, B) psums per block keep the replicated
O/E statistics globally exact through the sequential block dependency
(reference harmony.py:491-507). Per-round collective volume:
n_blocks * K * (B + 1) floats — tiny next to the compute.

Semantics match the reference E-step (harmony.py:464-513) at chunk
granularity, which the reference's reproducibility contract allows (the block
partition is random; see SURVEY.md §2).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..config import EngineConfig
from .pallas.update_r_fused import PallasGeometry, pallas_geometry

CLAMP = 1e-8


def fused_update_r_xla(slots, removal, Z_cos, Phi, Y, sigma, theta, Pr_b,
                       O, E, cfg: EngineConfig, axis_name):
    """One full E-step over all blocks. Runs under shard_map.

    slots: (nb * J,) shuffled chunk->slot table (identical on every shard;
    each shard applies it to its own local chunks). removal: (nb, K, B+1)
    per-block stats to remove, already psum'd across shards. Z_cos/Phi:
    (d|B, N_alloc) shard-local with the trailing dummy chunk. O/E: (K, B)
    replicated. Returns (R, O, E, Ysum, cache, kerr, ent) with R/Ysum/cache/
    kerr/ent shard-local and O/E globally consistent.
    """
    geom: PallasGeometry = pallas_geometry(cfg)
    K, d, B, CH = cfg.K, cfg.d, cfg.B, geom.chunk_size
    nb, nc1 = geom.n_blocks, geom.n_chunks + 1
    # geom.J includes a trailing ALWAYS-dummy slot that only the Pallas
    # kernel needs (to initialize its write-only outputs); here R3/cache
    # start as zeros, so the dummy visit would be pure waste — drop it.
    J = geom.J - 1

    Z3 = Z_cos.reshape(d, nc1, CH)
    P3 = Phi.reshape(B, nc1, CH)
    slots2 = slots.reshape(nb, geom.J)[:, :J]

    def body(carry, inp):
        O, E, Ysum, kerr, ent, R3, cache = carry
        slots_b, rem_b = inp                                   # (J,), (K, B+1)

        # Remove the block from the global stats (harmony.py:491-492) and fix
        # its diversity weights (harmony.py:495-499).
        E = E - rem_b[:, 0:1] * Pr_b[None, :]
        O = O - rem_b[:, 1:]
        oe = jnp.maximum(O + E, CLAMP)
        ratio = jnp.clip(E / oe, CLAMP, 1.0)
        wdiv = jnp.exp(theta[None, :] * jnp.log(ratio))        # (K, B)

        zb = Z3[:, slots_b, :].reshape(d, J * CH)
        pb = P3[:, slots_b, :].reshape(B, J * CH)
        dist = 2.0 * (1.0 - Y.T @ zb)                          # (K, J*CH)
        s = jnp.exp(-dist / sigma[:, None])
        scale = s / jnp.sum(s, axis=0, keepdims=True)
        r = scale * (wdiv @ pb)                                # dummy cols -> 0
        r = r / jnp.maximum(jnp.sum(r, axis=0, keepdims=True), CLAMP)

        # Per-chunk stats; re-add the block globally (harmony.py:506-507).
        r3 = r.reshape(K, J, CH)
        p3 = pb.reshape(B, J, CH)
        sum_c = jnp.sum(r3, axis=2)                            # (K, J)
        o_c = jnp.einsum("kjc,bjc->jkb", r3, p3)               # (J, K, B)
        sum_r = lax.psum(jnp.sum(sum_c, axis=1), axis_name)    # (K,)
        o_r = lax.psum(jnp.sum(o_c, axis=0), axis_name)        # (K, B)
        E = E + sum_r[:, None] * Pr_b[None, :]
        O = O + o_r

        Ysum = Ysum + zb @ r.T                                 # (d, K)
        kerr = kerr + jnp.sum(r * dist)
        ent = ent + jnp.sum(
            jnp.where(r > 0.0, r * jnp.log(jnp.where(r > 0.0, r, 1.0)), 0.0)
            * sigma[:, None])

        # Write-back: every real chunk is written exactly once per round;
        # dummy-slot writes all carry zeros, so duplicates are harmless.
        # Storage cast only — all statistics above used the fp32 values.
        R3 = R3.at[:, slots_b, :].set(r3.astype(R3.dtype))
        stats = jnp.concatenate([sum_c.T[:, :, None],
                                 o_c], axis=2)                 # (J, K, B+1)
        cache = cache.at[slots_b].set(stats)
        return (O, E, Ysum, kerr, ent, R3, cache), None

    init = (O, E,
            jnp.zeros((d, K), jnp.float32),
            jnp.float32(0.0), jnp.float32(0.0),
            jnp.zeros((K, nc1, CH), cfg.r_jnp_dtype),
            jnp.zeros((nc1, K, B + 1), jnp.float32))
    (O, E, Ysum, kerr, ent, R3, cache), _ = lax.scan(
        body, init, (slots2, removal))
    return R3.reshape(K, nc1 * CH), O, E, Ysum, cache, kerr, ent
