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


def expected_leaf_shapes(cfg) -> dict:
    """Global (cross-shard) shape of every HarmonyState leaf under `cfg`.

    Checkpoint leaves are saved as GLOBAL arrays, so their shapes encode the
    engine geometry they were written under: N_pad (device count + chunk
    padding), history lengths (max_iter_*), R dtype (low_memory), cache rows
    (chunk_size x mesh). Used to validate resume compatibility up front."""
    nc1 = (cfg.N_local // cfg.chunk_size) if cfg.fused_estep else 1
    cache_rows = cfg.n_devices * nc1
    D = cfg.n_devices
    if cfg.defer_r:
        defer = {
            "Ysum0": (cfg.d, cfg.K), "rep_Y": (cfg.d, cfg.K),
            "rep_O": (cfg.K, cfg.B), "rep_E": (cfg.K, cfg.B),
            "rep_key": (2,), "rep_cache": (cache_rows, cfg.K, cfg.B + 1),
            "rep_Zcos": (cfg.d, cfg.N_pad),
        }
    else:
        defer = {
            "Ysum0": (1, 1), "rep_Y": (1, 1), "rep_O": (1, 1),
            "rep_E": (1, 1), "rep_key": (2,), "rep_cache": (D, 1, 1),
            "rep_Zcos": (1, D),
        }
    return {
        "Z_corr": (cfg.d, cfg.N_pad),
        "Z_cos": (cfg.d, cfg.N_pad),
        "R": (1, D) if cfg.defer_r else (cfg.K, cfg.N_pad),
        **defer,
        "Y": (cfg.d, cfg.K),
        "O": (cfg.K, cfg.B),
        "E": (cfg.K, cfg.B),
        "obj_kmeans": (cfg.kmeans_hist_len,),
        "obj_dist": (cfg.kmeans_hist_len,),
        "obj_entropy": (cfg.kmeans_hist_len,),
        "obj_cross": (cfg.kmeans_hist_len,),
        "n_kmeans": (),
        "obj_harmony": (cfg.harmony_hist_len,),
        "n_harmony": (),
        "kmeans_rounds": (cfg.rounds_hist_len,),
        "n_rounds": (),
        "converged": (),
        "cache": ((cache_rows, cfg.K, cfg.B + 1) if cfg.fused_estep
                  else (cfg.n_devices, 1, 1)),
    }


def validate_state(state: HarmonyState, cfg, path: str = "<checkpoint>"):
    """Raise ValueError (with every mismatch listed) when a loaded checkpoint
    is incompatible with the current engine geometry. Without this, a resume
    under different max_iter/chunk_size/mesh/low_memory settings dies inside
    jax.device_put with an opaque shape error."""
    expected = expected_leaf_shapes(cfg)
    problems = []
    for name in state._fields:
        leaf = getattr(state, name)
        if leaf is None:
            continue  # optional trailing field (rebuilt by the resume path)
        want = expected.get(name)
        got = tuple(leaf.shape)
        if want is not None and got != want:
            problems.append(f"{name}: shape {got}, expected {want}")
    r = state.R
    if r is not None and str(r.dtype) != cfg.r_dtype:
        problems.append(
            f"R: dtype {r.dtype}, expected {cfg.r_dtype} "
            f"(low_memory={'True' if cfg.r_dtype == 'bfloat16' else 'False'})")
    if problems:
        raise ValueError(
            f"Checkpoint {path} is incompatible with the current "
            f"configuration — it was written under different engine "
            f"geometry (max_iter_harmony/max_iter_kmeans, chunk_size, "
            f"device count, or low_memory). Mismatches: "
            + "; ".join(problems)
            + ". Resume with the settings the checkpoint was written "
            "under, or re-run from scratch.")


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
