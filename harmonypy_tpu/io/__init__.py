"""Data ingest for harmonypy_tpu: native fast-TSV parsing + sharded loading.

The reference loads matrices with pandas.read_csv on a single host
(reference tests/test_harmony.py:81-90). Here each host process of a TPU pod
reads only its own contiguous cell range, parsed by the native C++ fasttsv
extension when built (io/native/), and the shards are assembled into a
mesh-sharded jax.Array without ever materializing the full matrix per host.
"""

from .loader import (load_matrix, load_matrix_tsv, load_sharded_data,
                     native_available)

__all__ = ["load_matrix", "load_matrix_tsv", "load_sharded_data",
           "native_available"]
