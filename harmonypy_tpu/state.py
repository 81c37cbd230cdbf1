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

    kmeans_rounds: jax.Array  # (max_iter_harmony,) int32
    n_rounds: jax.Array       # () int32

    converged: jax.Array      # () bool — harmony-level convergence flag

    # Fused E-step per-chunk statistics cache (sharded on the cells axis):
    # (n_chunks+1, K, B+1) per shard, kept current by the kernel so the next
    # iteration never recomputes it from R (a (K, N)-retiling pass).
    # Placeholder (1, 1, 1) zeros per shard on the non-fused path. Defaults
    # to None so checkpoints written before this field existed still load;
    # the resume path rebuilds it from R/Phi (api.py).
    cache: jax.Array = None


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
        kmeans_rounds=jnp.zeros((cfg.max_iter_harmony,), jnp.int32),
        n_rounds=jnp.zeros((), jnp.int32),
        converged=jnp.zeros((), jnp.bool_),
    )


def append(buf: jax.Array, n: jax.Array, value) -> tuple[jax.Array, jax.Array]:
    """Ring-buffer append: buf[n] = value; returns (buf, n + 1)."""
    return buf.at[n].set(value), n + 1
