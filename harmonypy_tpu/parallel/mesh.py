"""Device-mesh construction for the cell-parallel Harmony engine.

The reference is single-device (torch cpu/cuda/mps auto-detect at
harmony.py:35-46). The TPU-native equivalent of that "L1 device runtime" is a
1-D jax.sharding.Mesh over all addressable devices with a single "cells"
axis: cells are the only scaling dimension of this workload (SURVEY.md §5,
"Long-context" note), so data parallelism over cells is the entire
parallelism story — there are no layers/sequences/experts for TP/PP/EP.

Multi-host: call initialize_distributed() once per process before building a
mesh; jax.distributed wires the hosts together and the same code runs SPMD
across all of them with collectives riding ICI within a slice / DCN across.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

AXIS = "cells"


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Bootstrap multi-host execution (no-op on a single process).

    Thin wrapper over jax.distributed.initialize — the TPU-native replacement
    for the NCCL/MPI process-group bootstrap the reference never had
    (SURVEY.md C19).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(devices=None, n_devices: int | None = None) -> Mesh:
    """Build a 1-D mesh with axis "cells".

    devices: explicit device list; default all of jax.devices().
    n_devices: truncate to the first n devices (mainly for tests comparing
    1-device vs N-device runs on a virtual CPU mesh).
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    if n_devices is not None:
        assert n_devices <= len(devices), (n_devices, len(devices))
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


# Torch device names accepted for drop-in compatibility with the reference
# (harmony.py:35-46 accepts "cuda" / "mps" / "cpu"). "cuda" maps to JAX's
# "gpu" platform; "mps" has no JAX backend.
_TORCH_PLATFORM_MAP = {"cuda": "gpu", "mps": None}


def default_mesh(device: str | None = None) -> Mesh:
    """Mesh over all devices of the requested platform (None = default).

    Accepts JAX platform strings ("tpu", "cpu", "gpu") and, for drop-in
    compatibility, the reference's torch device strings ("cuda", "cuda:0",
    "mps").
    """
    if device is None:
        return make_mesh()
    platform = device.split(":")[0].lower()
    platform = _TORCH_PLATFORM_MAP.get(platform, platform)
    if platform is None:
        raise ValueError(
            f"device={device!r}: JAX has no Apple-MPS backend; "
            f"use device='tpu' or device='cpu'")
    try:
        devices = jax.devices(platform)
    except RuntimeError as e:
        present = {d.platform for d in jax.devices()}
        raise ValueError(
            f"device={device!r}: no JAX {platform!r} backend is available "
            f"(present platforms: {sorted(present)}); use one of those or "
            f"leave device=None") from e
    return make_mesh(devices)
