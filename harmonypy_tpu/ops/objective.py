"""Harmony objective (reference compute_objective, harmony.py:394-417).

    J = [ sum(R * dist)                              (k-means error)
        + sum(sigma * R * log R)                     (entropy)
        + sum(sigma * R * (theta * log((O+E)/E)) Phi)  (diversity cross term)
        ] * 2000 / N

O and E are clamped at 1e-8 before the ratio (reference :407-409). The three
terms are returned separately because the reference exposes them as separate
history lists (harmony.py:414-417).

Cell-axis sums are shard-local followed by a scalar psum (C19).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..config import EngineConfig
from ..state import HarmonyParams
from .normalize import safe_entropy

CLAMP = 1e-8


def chunk_objective_partials(r, dist, sigma, k_axis: int, chunk_axis: int):
    """Per-chunk kmeans-error and sigma-weighted entropy partials, reduced
    over every axis except `chunk_axis` (fp32 inputs expected). Single
    source of the clamped r*log(r) formula shared by the engine's init pass
    (K-major layout) and the fused-XLA E-step (chunk-major layout); the
    Pallas kernel necessarily re-states it in-kernel."""
    shape = [1] * r.ndim
    shape[k_axis] = -1
    axes = tuple(a for a in range(r.ndim) if a != chunk_axis)
    kerr = jnp.sum(r * dist, axis=axes)
    ent = jnp.sum(safe_entropy(r) * sigma.reshape(shape), axis=axes)
    return kerr, ent


def chunk_objective_partials_fast(r, dist, statsO, sigma, theta, logratio,
                                  logdd):
    """Per-chunk (kerr, ent) partials WITHOUT a per-element log.

    Valid when every cell carries exactly one covariate level
    (cfg.n_covariates == 1, the common case): then the E-step's diversity
    weight is a single table entry per (k, cell), w_kc = wdiv[k, b(c)],
    and with r = (s / D) * w / Dr, s = exp(-dist / sigma):

        sum_k sigma_k r log r
          = -sum_k r * dist                        (sigma_k cancels)
          + sum_kb sigma_k theta_b logratio_kb * O_chunk[k, b]
          - sum_c (log D_c + log Dr_c) * (sigma^T r)_c

    The first term is the k-means-error partial (already needed); the
    second contracts the chunk's O stats — which the E-step computes
    anyway — against a K x B table; only the third touches per-cell
    values, with ONE log per cell (logdd, from _block_core) instead of one
    per (k, cell). Exact up to fp32 reassociation, and safe_entropy's
    nonfinite->0 guard is inherited: every term carries a factor of r, so
    zero columns (padding / dummy chunks) contribute exactly zero — no log
    of zero is ever evaluated (logdd's denominators are clamped positive).
    Traced on v5e the elementwise K x N log was ~20% of the deferred
    round (docs/deferred_roofline.md).

    All contractions are explicit elementwise-multiply + VPU reduces (NOT
    einsum/dot): under matmul_precision="default" a dot would run its fp32
    operands through bf16 MXU passes, and these are user-visible objective
    values. The Pallas kernel states the same expressions in-kernel, in
    the same order, for bitwise interchangeability.

    r/dist: (J, K, CH); statsO: (J, K, B); logratio: (K, B);
    logdd: (J, CH). Returns ((J,), (J,)).
    """
    kerr = jnp.sum(r * dist, axis=(1, 2))
    st = jnp.sum((sigma[:, None] * theta[None, :] * logratio)[None]
                 * statsO, axis=(1, 2))
    sr = jnp.sum(r * sigma[None, :, None], axis=1)             # (J, CH)
    ent = -kerr + st - jnp.sum(sr * logdd, axis=1)
    return kerr, ent


def cross_entropy_from_stats(O, E, params: HarmonyParams, cfg: EngineConfig):
    """Diversity cross term computed from O/E alone, no cell pass:

      sum(R_sigma * (theta_log @ Phi)) == sum_kb sigma_k * theta_log[k,b] * O[k,b]

    because O = R Phi^T by definition (reference harmony.py:389). Used by the
    fused Pallas E-step, which returns the other two terms directly."""
    norm_const = jnp.float32(2000.0 / cfg.N)
    ratio = (jnp.maximum(O, CLAMP) + jnp.maximum(E, CLAMP)) / jnp.maximum(E, CLAMP)
    theta_log = params.theta[None, :] * jnp.log(ratio)          # (K, B)
    return jnp.sum(params.sigma[:, None] * theta_log * O) * norm_const


def compute_objective_terms(R, dist_mat, O, E, Phi, params: HarmonyParams,
                            cfg: EngineConfig, axis_name):
    """Returns (kmeans_error, entropy, cross_entropy), each * 2000/N."""
    norm_const = jnp.float32(2000.0 / cfg.N)
    sigma_col = params.sigma[:, None]
    R = R.astype(jnp.float32)  # fp32 sums regardless of R's storage dtype

    kmeans_error = lax.psum(jnp.sum(R * dist_mat), axis_name)
    entropy = lax.psum(jnp.sum(safe_entropy(R) * sigma_col), axis_name)

    ratio = (jnp.maximum(O, CLAMP) + jnp.maximum(E, CLAMP)) / jnp.maximum(E, CLAMP)
    theta_log = params.theta[None, :] * jnp.log(ratio)          # (K, B)
    cross = lax.psum(jnp.sum((R * sigma_col) * (theta_log @ Phi)), axis_name)

    return kmeans_error * norm_const, entropy * norm_const, cross * norm_const
