"""Mixture-of-experts ridge correction, K-batched.

Mirrors reference moe_correct_ridge (harmony.py:535-569): for every cluster k

    W_k = (Phi_moe diag(R_k) Phi_moe^T + diag(lambda_k))^{-1}
          Phi_moe diag(R_k) Z_orig^T
    W_k[0, :] = 0                      (keep the intercept)
    Z_corr -= W_k^T (Phi_moe * R_k)

The reference runs a Python loop over K clusters with torch.linalg.inv
(harmony.py:539-566). Here all K systems are built with batched GEMMs and
solved with one batched Cholesky — the K loop disappears and everything runs
on the MXU:

  - normal equations  cov[k] (B1, B1) and rhs[k] (B1, d) are accumulated
    shard-locally as B1 skinny GEMMs over the cell axis, then psum'd
    (the C19 reduction points; O(K * B1 * (B1 + d)) floats per iteration).
  - lambda: static vector, or the dynamic per-cluster alpha * E[k] rule when
    lambda estimation is on (reference find_lambda_torch, :587-591).
  - the correction sum_k W_k^T (Phi_moe * R_k) is applied shard-locally as B1
    GEMMs, avoiding any (K, B1, N) intermediate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..config import EngineConfig
from ..state import HarmonyParams
from .partition import frame_sum, partition_geometry, shard_chunk_gids

# Cap per-chunk stacked-feature temporaries at ~256 MB of float32.
_CHUNK_BUDGET_ELEMS = 64 * 1024 * 1024


def _col_chunk(B1: int, d: int) -> int:
    rows = B1 * (B1 + d)
    return max(65536, (_CHUNK_BUDGET_ELEMS // rows) // 8192 * 8192)


def _normal_eq_framed(A, Z_orig, R, cfg: EngineConfig, axis_name):
    """Normal equations accumulated per chunk and reduced through the fixed
    global frame (ops/partition.py): bitwise device-count-invariant. Used on
    the fused (chunk-padded) layout; FLOPs match the stacked-feature GEMM
    build, executed as one (B1*(B1+d), CH) x (CH, K) GEMM per chunk."""
    geom = partition_geometry(cfg)
    K, B1, d, CH = cfg.K, cfg.B1, cfg.d, geom.CH
    nc1 = geom.nc_cap + 1

    def body(carry, j):
        z0 = jnp.int32(0)
        a = lax.dynamic_slice(A, (z0, j * CH), (B1, CH))
        z = lax.dynamic_slice(Z_orig, (z0, j * CH), (d, CH))
        r = lax.dynamic_slice(R, (z0, j * CH), (K, CH)).astype(jnp.float32)
        F = jnp.concatenate(
            [(a[:, None, :] * a[None, :, :]).reshape(B1 * B1, CH),
             (a[:, None, :] * z[None, :, :]).reshape(B1 * d, CH)], axis=0)
        return carry, F @ r.T                                   # (B1(B1+d), K)

    _, S_c = lax.scan(body, None, jnp.arange(nc1, dtype=jnp.int32))
    gids = shard_chunk_gids(geom, axis_name)
    return frame_sum(S_c[: geom.nc_cap], gids, geom.NC_fixed, axis_name)


def solve_w(S, E, params: HarmonyParams, cfg: EngineConfig):
    """Solve all K ridge systems from the stacked normal equations S
    (B1*(B1+d), K): returns W (K, B1, d) with the intercept row zeroed
    (reference harmony.py:541-565). Shared by the stored-R path below and
    the deferred-R replay (ops/update_r_fused_xla.replay_normal_eq)."""
    import jax

    K, B1, d = cfg.K, cfg.B1, cfg.d
    cov = jnp.transpose(S[: B1 * B1].reshape(B1, B1, K), (2, 0, 1))
    rhs = jnp.transpose(S[B1 * B1:].reshape(B1, d, K), (2, 0, 1))

    # Ridge penalty per cluster (dynamic lambda: reference :541-544, 587-591).
    if cfg.lambda_estimation:
        # Floor at a tiny positive value: a batch level with E[k,b] == 0
        # (e.g. an unused categorical level, Pr_b == 0) has an all-zero
        # Phi_moe row, and alpha*E == 0 would make cov[k] exactly singular —
        # the floor keeps the solve regular and yields W == 0 for that level
        # (its rhs row is zero), i.e. no correction, which is the right
        # answer for a level with no cells.
        lamb_k = jnp.concatenate(
            [jnp.zeros((K, 1), jnp.float32),
             jnp.maximum(jnp.float32(cfg.alpha) * E, 1e-6)], axis=1
        )                                                       # (K, B1)
    else:
        lamb_k = jnp.broadcast_to(params.lamb[None, :], (K, B1))
    cov = cov + jax.vmap(jnp.diag)(lamb_k)

    # Batched SPD solve (reference uses torch.linalg.inv; Cholesky is the
    # numerically preferable equivalent for these tiny SPD systems).
    L = jnp.linalg.cholesky(cov)                                # (K, B1, B1)
    W = jax.scipy.linalg.cho_solve((L, True), rhs)              # (K, B1, d)
    return W.at[:, 0, :].set(0.0)                               # keep intercept


def moe_correct_ridge(Z_orig, Phi, R, E, params: HarmonyParams,
                      cfg: EngineConfig, mask, axis_name):
    """Returns Z_corr = Z_orig - correction (shard-local columns).

    Z_orig: (d, N_local), Phi: (B, N_local), R: (K, N_local) — sharded.
    E: (K, B) replicated. mask: (N_local,) zeroes padded cells out of the
    intercept row.
    """
    K, B1, d = cfg.K, cfg.B1, cfg.d
    Nl = Z_orig.shape[1]
    A = jnp.concatenate([mask[None, :], Phi], axis=0)          # (B1, Nl) Phi_moe

    # Normal equations for ALL K systems as stacked-feature GEMMs against R:
    #   cov[k,b,c] = sum_n A[b,n] A[c,n] R[k,n]
    #   rhs[k,b,:] = sum_n A[b,n] Z[:,n] R[k,n]
    # The B1*(B1+d) "feature products" hit R^T in one GEMM per cell chunk —
    # R (the K x N giant) is read exactly once overall, and the stacked
    # feature matrix is materialized only one chunk at a time (it would be
    # B1*(B1+d) x N — gigabytes at millions of cells).
    CC = _col_chunk(B1, d)
    if cfg.fused_estep:
        # Chunk-padded layout: per-chunk partials + fixed-frame reduction,
        # bitwise identical on any mesh (the invariance contract).
        S = _normal_eq_framed(A, Z_orig, R, cfg, axis_name)
    else:
        S = jnp.zeros((B1 * (B1 + d), K), jnp.float32)
        for lo in range(0, Nl, CC):
            hi = min(lo + CC, Nl)
            Ac, Zc, Rc = A[:, lo:hi], Z_orig[:, lo:hi], R[:, lo:hi]
            A2 = (Ac[:, None, :] * Ac[None, :, :]).reshape(B1 * B1, hi - lo)
            ZA = (Ac[:, None, :] * Zc[None, :, :]).reshape(B1 * d, hi - lo)
            S = S + jnp.concatenate([A2, ZA], axis=0) @ Rc.T
        S = lax.psum(S, axis_name)                              # (B1(B1+d), K)
    W = solve_w(S, E, params, cfg)

    # correction[d, n] = sum_k sum_b W[k,b,d] A[b,n] R[k,n]: one shard-local
    # GEMM T = R^T W per cell chunk (again reading R once overall), then a
    # contraction over b; the (Nl, B1, d) intermediate never fully exists.
    Wf = W.reshape(K, B1 * d)
    pieces = []
    for lo in range(0, Nl, CC):
        hi = min(lo + CC, Nl)
        T = (R[:, lo:hi].T @ Wf).reshape(hi - lo, B1, d)
        pieces.append(Z_orig[:, lo:hi]
                      - jnp.einsum("bn,nbd->dn", A[:, lo:hi], T))
    return jnp.concatenate(pieces, axis=1)
