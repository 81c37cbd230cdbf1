"""Checkpoint / resume for the Harmony state pytree.

The reference has no checkpointing (SURVEY.md §5) — runs either finish or
restart. For long multi-host runs we snapshot the full HarmonyState between
harmony iterations; every leaf is dense and small relative to the input, so a
plain npz round-trip is sufficient and dependency-free.
"""

from __future__ import annotations

import numpy as np

import jax

from ..state import HarmonyState


def save_state(path: str, state: HarmonyState) -> None:
    arrays = {f"f{i}": np.asarray(x) for i, x in enumerate(state)}
    np.savez(path, **arrays)


def load_state(path: str) -> HarmonyState:
    """Load a snapshot. Checkpoints from before optional trailing fields
    existed load with those fields as their defaults (e.g. cache=None, which
    the resume path rebuilds)."""
    with np.load(path) as data:
        leaves = [data[f"f{i}"] for i in range(len(data.files))]
    return HarmonyState(*[jax.numpy.asarray(x) for x in leaves])
