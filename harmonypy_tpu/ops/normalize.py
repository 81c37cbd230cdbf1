"""Small numeric helpers shared across kernels.

Mirrors reference semantics:
  - column L2 normalization (reference harmony.py:238, 377, 444, 569) with a
    zero-norm guard so padded (all-zero) cell columns stay zero instead of
    producing NaNs.
  - safe entropy x*log(x) with non-finite -> 0 (reference harmony.py:572-576).
"""

from __future__ import annotations

import jax.numpy as jnp


def l2_normalize_cols(X: jnp.ndarray) -> jnp.ndarray:
    """Normalize each column of X to unit L2 norm; zero columns stay zero."""
    norm = jnp.sqrt(jnp.sum(X * X, axis=0, keepdims=True))
    return X / jnp.where(norm > 0.0, norm, 1.0)


def safe_entropy(x: jnp.ndarray) -> jnp.ndarray:
    """x * log(x), with 0 where x <= 0 (reference harmony.py:572-576)."""
    return jnp.where(x > 0.0, x * jnp.log(jnp.where(x > 0.0, x, 1.0)), 0.0)
