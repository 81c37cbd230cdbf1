"""harmonypy_tpu — a TPU-native Harmony batch-correction engine in JAX.

Same capabilities and public API as harmonypy v0.2.0 (reference
/root/reference/harmonypy/__init__.py:1-4), rebuilt TPU-first: cells are
sharded data-parallel over a jax.sharding.Mesh, the fuzzy k-means / ridge
correction loop runs as jitted shard_map programs with psum collectives, and
the LISI evaluation metric is a vmapped on-device kernel.
"""

from .api import Harmony, run_harmony
from .lisi import compute_lisi

__version__ = "0.3.1"

__all__ = ["Harmony", "run_harmony", "compute_lisi", "__version__"]
