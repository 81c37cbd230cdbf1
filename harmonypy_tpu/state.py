"""State and parameter pytrees for the Harmony TPU engine.

The reference keeps all algorithm state as mutable tensors on a ``Harmony``
object (reference harmony.py:234-278, 357-364). Here the same quantities are
an immutable pytree threaded through jitted step functions — the idiomatic
JAX replacement for shared mutable buffers.

Layout convention (matches the reference's internal math): cells are COLUMNS.
  Z_corr, Z_cos : (d, N_local)   sharded over the "cells" mesh axis
  R             : (K, N_local)   sharded
  Phi           : (B, N_local)   sharded (one-hot batch design)
  Y             : (d, K)         replicated
  O, E          : (K, B)         replicated (global batch-composition stats)

History ring buffers mirror the five observability lists the reference
exposes (harmony.py:273-278): objective_kmeans (+ dist/entropy/cross
decomposition), objective_harmony, kmeans_rounds.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import EngineConfig


class HarmonyParams(NamedTuple):
    """Replicated hyper-parameter arrays (runtime inputs, not compile keys)."""

    theta: jax.Array    # (B,)  diversity penalty per batch level
    sigma: jax.Array    # (K,)  soft k-means bandwidth per cluster
    lamb: jax.Array     # (B+1,) ridge penalty (intercept first, = 0)
    Pr_b: jax.Array     # (B,)  batch proportions


class HarmonyData(NamedTuple):
    """Constant per-run inputs (sharded on the cells axis)."""

    Z_orig: jax.Array   # (d, N_local) original embedding (zero on padding)
    Phi: jax.Array      # (B, N_local) one-hot design (zero on padding)
    mask: jax.Array     # (N_local,)  1.0 for real cells, 0.0 for padding


class HarmonyState(NamedTuple):
    """Full algorithm state. Sharded leaves noted; all else replicated."""

    # Embeddings / assignments (sharded on cells axis).
    Z_corr: jax.Array       # (d, N_local)
    Z_cos: jax.Array        # (d, N_local)
    R: jax.Array            # (K, N_local)

    # Cluster-side state (replicated).
    Y: jax.Array            # (d, K)
    O: jax.Array            # (K, B)
    E: jax.Array            # (K, B)

    # RNG key (replicated; shards fold in their axis index where needed).
    key: jax.Array

    # Objective histories (replicated ring buffers + counters).
    obj_kmeans: jax.Array   # (kmeans_hist_len,)
    obj_dist: jax.Array     # (kmeans_hist_len,)
    obj_entropy: jax.Array  # (kmeans_hist_len,)
    obj_cross: jax.Array    # (kmeans_hist_len,)
    n_kmeans: jax.Array     # () int32 — number of valid entries

    obj_harmony: jax.Array  # (harmony_hist_len,)
    n_harmony: jax.Array    # () int32

    kmeans_rounds: jax.Array  # (rounds_hist_len,) int32
    n_rounds: jax.Array       # () int32

    converged: jax.Array      # () bool — harmony-level convergence flag

    # Fused E-step per-chunk statistics cache (sharded on the cells axis):
    # (n_chunks+1, K, B+1) per shard, kept current by the kernel so the next
    # iteration never recomputes it from R (a (K, N)-retiling pass).
    # Placeholder (1, 1, 1) zeros per shard on the non-fused path. Defaults
    # to None so checkpoints written before this field existed still load;
    # the resume path rebuilds it from R/Phi (api.py).
    cache: jax.Array = None

    # Deferred-R mode (cfg.defer_r) only; tiny placeholders otherwise.
    # R is never materialized (the R field above holds a (1, 1)-per-shard
    # placeholder); instead these allow REPLAYING the final k-means round
    # bitwise: Ysum0 is the next cluster loop's initial centroid numerator
    # Z_cos r^T (d, K), and rep_{Y,O,E,cache,key} are the final round's
    # START-of-round inputs (ops/update_r_fused_xla.replay_*).
    Ysum0: jax.Array = None     # (d, K) replicated
    rep_Y: jax.Array = None     # (d, K) replicated
    rep_O: jax.Array = None     # (K, B) replicated
    rep_E: jax.Array = None     # (K, B) replicated
    rep_key: jax.Array = None   # (2,) uint32 — the round key k_r
    rep_cache: jax.Array = None  # (n_chunks+1, K, B+1) sharded
    rep_Zcos: jax.Array = None  # (d, N_local) sharded — the Z_cos the final
    #                             round read (pre-ridge); replay input


def defer_placeholders(cfg: EngineConfig) -> dict:
    """Per-shard values for the deferred-R state fields: real shapes in
    defer mode, (1, 1)-scale placeholders otherwise (a NamedTuple pytree
    needs concrete leaves for shard_map out_specs and checkpointing)."""
    f32 = jnp.float32
    if cfg.defer_r:
        nc1 = cfg.N_local // cfg.chunk_size
        return dict(
            Ysum0=jnp.zeros((cfg.d, cfg.K), f32),
            rep_Y=jnp.zeros((cfg.d, cfg.K), f32),
            rep_O=jnp.zeros((cfg.K, cfg.B), f32),
            rep_E=jnp.zeros((cfg.K, cfg.B), f32),
            rep_key=jnp.zeros((2,), jnp.uint32),
            rep_cache=jnp.zeros((nc1, cfg.K, cfg.B + 1), f32),
            rep_Zcos=jnp.zeros((cfg.d, cfg.N_local), f32),
        )
    return dict(
        Ysum0=jnp.zeros((1, 1), f32),
        rep_Y=jnp.zeros((1, 1), f32),
        rep_O=jnp.zeros((1, 1), f32),
        rep_E=jnp.zeros((1, 1), f32),
        rep_key=jnp.zeros((2,), jnp.uint32),
        rep_cache=jnp.zeros((1, 1, 1), f32),
        rep_Zcos=jnp.zeros((1, 1), f32),
    )


def empty_histories(cfg: EngineConfig) -> dict:
    f32 = jnp.float32
    return dict(
        obj_kmeans=jnp.zeros((cfg.kmeans_hist_len,), f32),
        obj_dist=jnp.zeros((cfg.kmeans_hist_len,), f32),
        obj_entropy=jnp.zeros((cfg.kmeans_hist_len,), f32),
        obj_cross=jnp.zeros((cfg.kmeans_hist_len,), f32),
        n_kmeans=jnp.zeros((), jnp.int32),
        obj_harmony=jnp.zeros((cfg.harmony_hist_len,), f32),
        n_harmony=jnp.zeros((), jnp.int32),
        kmeans_rounds=jnp.zeros((cfg.rounds_hist_len,), jnp.int32),
        n_rounds=jnp.zeros((), jnp.int32),
        converged=jnp.zeros((), jnp.bool_),
    )


def append(buf: jax.Array, n: jax.Array, value) -> tuple[jax.Array, jax.Array]:
    """Ring-buffer append: buf[n] = value; returns (buf, n + 1)."""
    return buf.at[n].set(value), n + 1
