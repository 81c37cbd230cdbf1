"""Checkpoint / resume for the Harmony state pytree.

The reference has no checkpointing (SURVEY.md §5) — runs either finish or
restart. For long multi-host runs we snapshot the full HarmonyState between
harmony iterations; every leaf is dense and small relative to the input, so a
plain npz round-trip is sufficient and dependency-free.

Multi-host: cross-process (non-addressable) leaves are assembled with
process_allgather on EVERY process (it is a collective), and only process 0
writes the file. bfloat16 leaves (low_memory mode) are stored as uint16 with
a dtype sidecar — np.savez would otherwise serialize them as opaque void
bytes that cannot round-trip.
"""

from __future__ import annotations

import numpy as np

import jax

from ..state import HarmonyState


def _to_host(x) -> np.ndarray:
    if getattr(x, "is_fully_addressable", True) is False:
        from jax.experimental import multihost_utils
        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


def save_state(path: str, state: HarmonyState) -> None:
    arrays = {}
    dtypes = []
    for i, x in enumerate(state):
        x = _to_host(x)
        dtypes.append(str(x.dtype))
        if str(x.dtype) == "bfloat16":
            x = x.view(np.uint16)
        arrays[f"f{i}"] = x
    arrays["dtypes"] = np.asarray(dtypes)
    if jax.process_index() == 0:
        np.savez(path, **arrays)


def load_state(path: str) -> HarmonyState:
    """Load a snapshot. Checkpoints from before optional trailing fields
    existed load with those fields as their defaults (e.g. cache=None, which
    the resume path rebuilds); checkpoints from before the dtype sidecar
    existed contain no bfloat16 leaves and load as-is."""
    with np.load(path) as data:
        n = sum(1 for f in data.files if f.startswith("f"))
        dtypes = data["dtypes"] if "dtypes" in data.files else None
        leaves = []
        for i in range(n):
            x = data[f"f{i}"]
            if dtypes is not None and str(dtypes[i]) == "bfloat16":
                import ml_dtypes
                x = x.view(ml_dtypes.bfloat16)
            leaves.append(x)
    return HarmonyState(*[jax.numpy.asarray(x) for x in leaves])
