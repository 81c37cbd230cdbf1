"""LISI — Local Inverse Simpson Index, on-device.

Same semantics as the reference (lisi.py:24-133): exact kNN with
3*perplexity neighbors (self dropped), Gaussian-kernel perplexity calibration
per cell via a 50-step bisection on beta (tol 1e-5), then the Simpson index
over label categories; LISI = 1/Simpson.

The reference's per-cell Python loop (lisi.py:81, noted "too slow" at
lisi.py:27) becomes a single vmapped bisection; the sklearn kd-tree becomes a
chunked brute-force top-k (exact, MXU-friendly — one (chunk, N) GEMM per
chunk instead of a pointer-chasing tree).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd

import jax
import jax.numpy as jnp
from jax import lax

from typing import Iterable


@functools.partial(jax.jit, static_argnums=(1, 2))
def _knn(X: jnp.ndarray, n_neighbors: int, chunk: int = 1024):
    """Exact brute-force kNN. X: (N, d). Returns (distances, indices), each
    (N, n_neighbors), self-neighbor dropped (reference lisi.py:53-57)."""
    N, d = X.shape
    k = n_neighbors + 1  # top-k includes the point itself
    sq = jnp.sum(X * X, axis=1)

    n_chunks = -(-N // chunk)
    N_pad = n_chunks * chunk
    Xp = jnp.zeros((N_pad, d), X.dtype).at[:N].set(X)

    def one_chunk(start):
        Q = lax.dynamic_slice(Xp, (start, jnp.zeros((), start.dtype)),
                              (chunk, d))
        qsq = jnp.sum(Q * Q, axis=1)
        d2 = qsq[:, None] + sq[None, :] - 2.0 * (Q @ X.T)  # (chunk, N)
        neg, idx = lax.top_k(-d2, k)
        return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    dists, idxs = lax.map(one_chunk, starts)
    dists = dists.reshape(N_pad, k)[:N]
    idxs = idxs.reshape(N_pad, k)[:N]
    return dists[:, 1:], idxs[:, 1:]  # drop self


def _simpson_one_cell(dist, onehot_nbrs, logU, tol):
    """Perplexity bisection + Simpson index for one cell.

    dist: (k,) distances; onehot_nbrs: (k, C) one-hot neighbor labels.
    Mirrors reference compute_simpson (lisi.py:81-132) exactly, including the
    beta=1 start, the double/halve rule before a bracket exists, and the
    H == 0 -> simpson = -1 default.
    """

    def H_of(beta):
        P = jnp.exp(-dist * beta)
        s = jnp.sum(P)
        good = s > 0.0
        H = jnp.where(good, jnp.log(jnp.where(good, s, 1.0))
                      + beta * jnp.sum(dist * P) / jnp.where(good, s, 1.0), 0.0)
        return H, jnp.where(good, P / jnp.where(good, s, 1.0), 0.0)

    beta0 = jnp.asarray(1.0, dist.dtype)
    H0, _ = H_of(beta0)
    inf = jnp.asarray(jnp.inf, dist.dtype)

    def body(_, carry):
        beta, bmin, bmax, H, Hdiff = carry
        active = jnp.abs(Hdiff) >= tol
        up = Hdiff > 0.0
        new_bmin = jnp.where(up, beta, bmin)
        new_bmax = jnp.where(up, bmax, beta)
        beta_up = jnp.where(jnp.isfinite(bmax), (beta + bmax) / 2.0, beta * 2.0)
        beta_dn = jnp.where(jnp.isfinite(bmin), (beta + bmin) / 2.0, beta / 2.0)
        new_beta = jnp.where(up, beta_up, beta_dn)
        H_new, _ = H_of(new_beta)
        out = (new_beta, new_bmin, new_bmax, H_new, H_new - logU)
        return tuple(jnp.where(active, n, o) for n, o in zip(out, carry))

    beta, _, _, H, _ = lax.fori_loop(
        0, 50, body, (beta0, -inf, inf, H0, H0 - logU))
    _, P = H_of(beta)

    cat_sums = P @ onehot_nbrs                       # (C,)
    simpson = jnp.sum(cat_sums * cat_sums)
    return jnp.where(H == 0.0, simpson - 1.0, simpson)


def compute_simpson(distances, indices, labels, n_categories, perplexity,
                    tol: float = 1e-5):
    """Reference-compatible entry (lisi.py:68-75): distances/indices are
    (k, N) column-per-cell; labels is a pd.Categorical."""
    codes = np.asarray(labels.codes if hasattr(labels, "codes")
                       else labels, dtype=np.int32)
    dist = jnp.asarray(np.asarray(distances).T)      # (N, k)
    idx = np.asarray(indices).T                      # (N, k)
    onehot = jnp.asarray(
        (codes[idx][..., None] == np.arange(n_categories)[None, None, :])
        .astype(np.asarray(distances).dtype))        # (N, k, C)
    logU = jnp.asarray(np.log(perplexity), dist.dtype)
    tol = jnp.asarray(tol, dist.dtype)
    simpson = _simpson_all(dist, onehot, logU, tol)
    return np.asarray(simpson)


_simpson_all = jax.jit(jax.vmap(_simpson_one_cell, in_axes=(0, 0, None, None)))


def compute_lisi(
    X,
    metadata: pd.DataFrame,
    label_colnames: Iterable[str],
    perplexity: float = 30,
):
    """Compute LISI for each label column (reference lisi.py:24-65).

    LISI ~= the effective number of distinct categories among each cell's
    neighbors: 1 = unmixed, n_categories = fully mixed.
    """
    X = np.asarray(X.values if hasattr(X, "values") else X)
    dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
    n_cells = metadata.shape[0]
    label_colnames = list(label_colnames)

    # Everything stays on device between the kNN and the final LISI values:
    # the only host->device traffic is X and the (N,) label codes per column.
    dist, idx = _knn(jnp.asarray(X, dtype), int(perplexity * 3) - 1)
    logU = jnp.asarray(np.log(perplexity), dist.dtype)
    tol = jnp.asarray(1e-5, dist.dtype)

    lisi_df = np.zeros((n_cells, len(label_colnames)))
    for i, label in enumerate(label_colnames):
        labels = pd.Categorical(metadata[label])
        codes = jnp.asarray(np.asarray(labels.codes, np.int32))
        simpson = _simpson_label(dist, idx, codes,
                                 len(labels.categories), logU, tol)
        lisi_df[:, i] = 1 / np.asarray(simpson)
    return lisi_df


@functools.partial(jax.jit, static_argnums=(3,))
def _simpson_label(dist, idx, codes, n_categories, logU, tol):
    """On-device Simpson for one label column: one-hot the neighbor codes and
    run the vmapped bisection without leaving the device."""
    onehot = (codes[idx][..., None]
              == jnp.arange(n_categories)[None, None, :]).astype(dist.dtype)
    return jax.vmap(_simpson_one_cell, in_axes=(0, 0, None, None))(
        dist, onehot, logU, tol)
