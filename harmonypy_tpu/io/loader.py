"""Matrix loading: native fast path + per-host sharded ingest.

Three tiers:

  load_matrix_tsv(path)       (gzip-)TSV of floats -> float32 ndarray, via
                              the C++ fasttsv extension (io/native/) when
                              built, else pandas. Handles header rows and a
                              leading row-name column (the layout of the
                              reference's bundled data, e.g.
                              data/pbmc_3500_pcs.tsv.gz).
  load_matrix(path)           dispatch on extension: .npy / .npz / .parquet /
                              .tsv[.gz] / .csv[.gz].
  load_sharded_data(...)      build a cells-sharded HarmonyData directly: in a
                              multi-host (jax.distributed) run each process
                              parses only its own cell range and the global
                              array is assembled from process-local shards —
                              the streaming-loader role from SURVEY.md §7
                              step 5.
"""

from __future__ import annotations

import ctypes
import gzip
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "_fasttsv.so")
_lock = threading.Lock()
_lib = None
_lib_tried = False


def _load_native():
    """dlopen the fasttsv extension, building it once if a toolchain exists.
    Best-effort: any failure degrades to the pandas path."""
    global _lib, _lib_tried
    with _lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        if not os.path.exists(_SO_PATH):
            # Build in a private temp dir and atomically rename into place:
            # several processes on one host (pod workers, pytest-xdist) may
            # race here, and dlopen of a half-written .so would crash.
            try:
                import shutil
                import tempfile
                with tempfile.TemporaryDirectory(dir=_NATIVE_DIR) as td:
                    for f in ("fasttsv.cpp", "Makefile"):
                        shutil.copy(os.path.join(_NATIVE_DIR, f), td)
                    subprocess.run(["make", "-C", td, "-s"],
                                   check=True, capture_output=True, timeout=120)
                    os.replace(os.path.join(td, "_fasttsv.so"), _SO_PATH)
            except Exception:
                if not os.path.exists(_SO_PATH):
                    return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.fasttsv_load.restype = ctypes.c_void_p
        lib.fasttsv_load.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                     ctypes.c_char_p, ctypes.c_int]
        lib.fasttsv_rows.restype = ctypes.c_long
        lib.fasttsv_rows.argtypes = [ctypes.c_void_p]
        lib.fasttsv_cols.restype = ctypes.c_long
        lib.fasttsv_cols.argtypes = [ctypes.c_void_p]
        lib.fasttsv_has_header.restype = ctypes.c_int
        lib.fasttsv_has_header.argtypes = [ctypes.c_void_p]
        lib.fasttsv_copy.restype = None
        lib.fasttsv_copy.argtypes = [ctypes.c_void_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_long, ctypes.c_long]
        lib.fasttsv_free.restype = None
        lib.fasttsv_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load_native() is not None


def load_matrix_tsv(path: str, rows: tuple[int, int] | None = None,
                    n_threads: int = 0, sep: str = "\t") -> np.ndarray:
    """Parse a (gzip-)delimited float matrix to float32, rows [start, end) if
    given. The native parser handles tab-separated files; other separators
    (and exotic layouts) go through pandas."""
    lib = _load_native() if sep == "\t" else None
    if lib is not None:
        err = ctypes.create_string_buffer(256)
        h = lib.fasttsv_load(path.encode(), n_threads, err, len(err))
        if h:
            try:
                n_rows = lib.fasttsv_rows(h)
                n_cols = lib.fasttsv_cols(h)
                lo, hi = rows if rows is not None else (0, n_rows)
                lo, hi = max(lo, 0), min(hi, n_rows)
                out = np.empty((max(hi - lo, 0), n_cols), dtype=np.float32)
                if hi > lo:
                    lib.fasttsv_copy(
                        h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        lo, hi)
                return out
            finally:
                lib.fasttsv_free(h)
        # fall through to pandas on parse failure (e.g. exotic layout)

    import pandas as pd
    # Header detection (pd.read_csv defaults to header=0, which would
    # silently eat the first data row of a headerless file): a header is a
    # first line whose first field does not parse as a float.
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        first = f.readline()
    try:
        float(first.split(sep, 1)[0])
        header = None
    except ValueError:
        header = 0
    df = pd.read_csv(path, sep=sep, header=header)
    # Drop a leading row-name (string) column if present.
    if df.shape[1] and df.dtypes.iloc[0] == object:
        df = df.iloc[:, 1:]
    arr = df.to_numpy(dtype=np.float32)
    if rows is not None:
        arr = arr[rows[0]: rows[1]]
    return np.ascontiguousarray(arr)


def load_matrix(path: str, rows: tuple[int, int] | None = None) -> np.ndarray:
    """Extension-dispatched matrix load -> float32 (cells, d)."""
    base = path[:-3] if path.endswith(".gz") else path
    ext = os.path.splitext(base)[1].lower()
    if ext == ".npy":
        arr = np.load(path, mmap_mode="r")
        arr = arr[rows[0]: rows[1]] if rows is not None else arr[:]
        return np.asarray(arr, dtype=np.float32)
    if ext == ".npz":
        with np.load(path) as z:
            arr = z[z.files[0]]
        if rows is not None:
            arr = arr[rows[0]: rows[1]]
        return np.asarray(arr, dtype=np.float32)
    if ext == ".parquet":
        import pandas as pd
        arr = pd.read_parquet(path).to_numpy(dtype=np.float32)
        if rows is not None:
            arr = arr[rows[0]: rows[1]]
        return np.ascontiguousarray(arr)
    if ext in (".tsv", ".txt", ""):
        return load_matrix_tsv(path, rows=rows)
    if ext == ".csv":
        return load_matrix_tsv(path, rows=rows, sep=",")
    raise ValueError(f"unsupported matrix format: {path}")


def load_sharded_data(pcs_path: str, meta_data, vars_use, mesh,
                      cfg=None):
    """Per-host sharded ingest: build a cells-sharded HarmonyData. Each
    process parses the embedding file ONCE and uploads only its own devices'
    cell ranges — on a multi-host pod no host ships other hosts' cells over
    the wire, and device HBM holds only the local shard.

    meta_data: pandas DataFrame (small — replicated per host, as in any
    pd.get_dummies design-matrix build). Returns (data, cfg, N, Phi_info)
    where Phi_info = (Pr_b, phi_n) for hyper-parameter broadcasting.
    """
    import jax
    import pandas as pd
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..config import EngineConfig
    from ..parallel.mesh import AXIS
    from ..state import HarmonyData

    N = len(meta_data)
    if isinstance(vars_use, str):
        vars_use = [vars_use]
    cats = meta_data[vars_use].astype("category")
    phi = pd.get_dummies(cats).to_numpy().T.astype(np.float32)  # (B, N)
    # Count DECLARED categories (get_dummies emits a column per category,
    # including unused levels of a pre-existing pd.Categorical) — must stay
    # in sync with api.run_harmony's design-matrix build.
    phi_n = np.asarray([len(cats[c].cat.categories) for c in cats.columns],
                       dtype=int)
    B = phi.shape[0]

    # One parse per host (the TSV formats are not row-seekable anyway), then
    # slice per-device ranges out of the host copy.
    X_host = load_matrix(pcs_path)
    d = X_host.shape[1]
    if cfg is None:
        # Mirror api.Harmony's engine selection so sharded ingest defaults to
        # the same E-step path and padding layout run_harmony would pick.
        from ..config import default_nclust, fused_geometry_ok, pallas_supported
        K = default_nclust(N)
        n_devices = int(mesh.devices.size)
        use_pallas = (mesh.devices.flat[0].platform == "tpu"
                      and pallas_supported(N, n_devices))
        use_fused_xla = (not use_pallas) and fused_geometry_ok(N, n_devices)
        cfg = EngineConfig(N=N, d=d, K=K, B=B, n_devices=n_devices,
                           use_pallas=use_pallas, use_fused_xla=use_fused_xla)

    n_pad = cfg.N_pad
    per_dev = cfg.N_local
    q = cfg.N_shard_real  # per-shard real-cell capacity (padding at shard end)
    sh2 = NamedSharding(mesh, P(None, AXIS))
    sh1 = NamedSharding(mesh, P(AXIS))

    def per_device_range(dev_idx):
        lo = dev_idx * q
        return lo, max(min(lo + q, N), lo)

    # Each process materializes only its addressable devices' shards.
    local_idx = {d_.id: i for i, d_ in enumerate(mesh.devices.flat)}
    z_shards, phi_shards, mask_shards = [], [], []
    devs = []
    for dev in mesh.devices.flat:
        if dev.process_index != jax.process_index():
            continue
        i = local_idx[dev.id]
        lo, hi = per_device_range(i)
        rows = X_host[lo:hi] if hi > lo else np.zeros((0, d), np.float32)
        zi = np.zeros((d, per_dev), np.float32)
        zi[:, : rows.shape[0]] = rows.T
        pi = np.zeros((B, per_dev), np.float32)
        pi[:, : max(hi - lo, 0)] = phi[:, lo:hi]
        mi = np.zeros((per_dev,), np.float32)
        mi[: max(hi - lo, 0)] = 1.0
        z_shards.append(zi)
        phi_shards.append(pi)
        mask_shards.append(mi)
        devs.append(dev)

    def assemble(shards, sharding, shape):
        arrays = [jax.device_put(s, dv) for s, dv in zip(shards, devs)]
        return jax.make_array_from_single_device_arrays(
            shape, sharding, arrays)

    data = HarmonyData(
        Z_orig=assemble(z_shards, sh2, (d, n_pad)),
        Phi=assemble(phi_shards, sh2, (B, n_pad)),
        mask=assemble([m for m in mask_shards], sh1, (n_pad,)),
    )
    N_b = phi.sum(axis=1)
    Pr_b = (N_b / N).astype(np.float32)
    return data, cfg, N, (Pr_b, phi_n)
