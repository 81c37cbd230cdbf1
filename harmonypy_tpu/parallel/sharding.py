"""Host->device upload with cell-axis padding and sharding.

N is padded up to a multiple of the mesh size; padded cells carry zero
columns in Z and Phi and mask == 0, and are excluded from every reduction by
construction (see ops/*). Public outputs strip the padding again (api.py).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import EngineConfig
from ..state import HarmonyData
from .mesh import AXIS


def pad_cells(arr: np.ndarray, n_pad: int) -> np.ndarray:
    """Zero-pad the trailing (cell) axis of a (x, N) array to n_pad."""
    if arr.shape[-1] == n_pad:
        return np.ascontiguousarray(arr, dtype=np.float32)
    out = np.zeros(arr.shape[:-1] + (n_pad,), dtype=np.float32)
    out[..., : arr.shape[-1]] = arr
    return out


def shard_inputs(Z: np.ndarray, Phi: np.ndarray, cfg: EngineConfig,
                 mesh: Mesh) -> HarmonyData:
    """Upload (d, N) Z and (B, N) Phi as sharded HarmonyData."""
    n_pad = cfg.N_pad
    mask = np.zeros((n_pad,), dtype=np.float32)
    mask[: cfg.N] = 1.0
    host = HarmonyData(
        Z_orig=pad_cells(np.asarray(Z, np.float32), n_pad),
        Phi=pad_cells(np.asarray(Phi, np.float32), n_pad),
        mask=mask,
    )
    shardings = HarmonyData(
        Z_orig=NamedSharding(mesh, P(None, AXIS)),
        Phi=NamedSharding(mesh, P(None, AXIS)),
        mask=NamedSharding(mesh, P(AXIS)),
    )
    return jax.tree.map(jax.device_put, host, shardings)
