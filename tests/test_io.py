"""Data-ingest tests: native fasttsv parser vs pandas oracle, format
dispatch, and the per-host sharded loader (SURVEY.md §7 step 5)."""

import gzip
import os

import numpy as np
import pytest

from harmonypy_tpu.io import (load_matrix, load_matrix_tsv,
                              load_sharded_data, native_available)
from harmonypy_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def tsv_file(tmp_path_factory):
    rng = np.random.default_rng(42)
    X = rng.normal(size=(533, 7)).astype(np.float32) * 10
    path = tmp_path_factory.mktemp("io") / "m.tsv.gz"
    hdr = "\t".join(f"PC{i}" for i in range(7))
    rows = "\n".join("\t".join(f"{v:.6f}" for v in r) for r in X)
    with gzip.open(path, "wt") as f:
        f.write(hdr + "\n" + rows + "\n")
    return str(path), X


def test_tsv_roundtrip(tsv_file):
    path, X = tsv_file
    out = load_matrix_tsv(path)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, X, rtol=1e-6, atol=1e-6)


def test_tsv_row_range(tsv_file):
    path, X = tsv_file
    out = load_matrix_tsv(path, rows=(100, 250))
    np.testing.assert_allclose(out, X[100:250], rtol=1e-6, atol=1e-6)
    assert load_matrix_tsv(path, rows=(530, 999)).shape == (3, 7)


def test_tsv_rownames_and_plain(tmp_path):
    """Leading string column is detected and dropped; plain (non-gz) files
    and scientific notation parse too."""
    X = np.array([[1.5e-3, -2.0], [3e4, 0.25], [-1.0, 7.0]], np.float32)
    path = tmp_path / "named.tsv"
    with open(path, "w") as f:
        f.write("cell\ta\tb\n")
        for i, r in enumerate(X):
            f.write(f"cell{i}\t{r[0]:e}\t{r[1]}\n")
    out = load_matrix_tsv(str(path))
    np.testing.assert_allclose(out, X, rtol=1e-6)


def test_native_matches_pandas_on_reference_data(ref_data_dir):
    if not native_available():
        pytest.skip("native parser not built")
    import pandas as pd
    path = os.path.join(ref_data_dir, "pbmc_3500_pcs.tsv.gz")
    a = load_matrix_tsv(path)
    b = pd.read_csv(path, sep="\t").to_numpy(np.float32)
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_npy_dispatch(tmp_path):
    X = np.arange(12, dtype=np.float32).reshape(4, 3)
    path = tmp_path / "m.npy"
    np.save(path, X)
    np.testing.assert_array_equal(load_matrix(str(path)), X)
    np.testing.assert_array_equal(load_matrix(str(path), rows=(1, 3)), X[1:3])


def test_sharded_loader_matches_full(tsv_file):
    """8-device sharded ingest reproduces the single-host upload exactly."""
    import jax
    import pandas as pd
    from harmonypy_tpu.config import EngineConfig
    from harmonypy_tpu.parallel.sharding import shard_inputs

    path, X = tsv_file
    N = X.shape[0]
    rng = np.random.default_rng(0)
    meta = pd.DataFrame({"donor": rng.choice(["a", "b", "c"], size=N)})
    mesh = make_mesh(n_devices=8)

    data, cfg, n, (Pr_b, phi_n) = load_sharded_data(path, meta, "donor", mesh)
    assert n == N and cfg.N == N and cfg.d == 7

    cats = meta[["donor"]].astype("category")
    phi = pd.get_dummies(cats).to_numpy().T.astype(np.float32)
    # Same parser for the oracle so equality is bit-exact and the comparison
    # isolates the shard-assembly logic.
    ref = shard_inputs(load_matrix_tsv(path).T, phi, cfg, mesh)

    np.testing.assert_array_equal(np.asarray(data.Z_orig),
                                  np.asarray(ref.Z_orig))
    np.testing.assert_array_equal(np.asarray(data.Phi), np.asarray(ref.Phi))
    np.testing.assert_array_equal(np.asarray(data.mask), np.asarray(ref.mask))
    # shards actually live on distinct devices
    assert len({s.device for s in data.Z_orig.addressable_shards}) == 8


def test_csv_dispatch(tmp_path):
    """.csv routes through a comma parser (regression: was parsed as TSV)."""
    X = np.array([[1.0, 2.0], [3.5, -4.0]], np.float32)
    path = tmp_path / "m.csv"
    with open(path, "w") as f:
        f.write("a,b\n1.0,2.0\n3.5,-4.0\n")
    np.testing.assert_allclose(load_matrix(str(path)), X)


def test_headerless_tsv_keeps_first_row(tmp_path):
    """Headerless files keep row 1 on both the native and pandas paths
    (regression: pd.read_csv default consumed it as a header)."""
    from harmonypy_tpu.io import loader
    X = np.array([[1.5, 2.5], [3.0, 4.0], [5.0, 6.0]], np.float32)
    path = tmp_path / "nohdr.tsv"
    with open(path, "w") as f:
        for r in X:
            f.write(f"{r[0]}\t{r[1]}\n")
    np.testing.assert_allclose(load_matrix_tsv(str(path)), X)
    # Force the pandas fallback regardless of native availability.
    lib, tried = loader._lib, loader._lib_tried
    loader._lib, loader._lib_tried = None, True
    try:
        np.testing.assert_allclose(load_matrix_tsv(str(path)), X)
    finally:
        loader._lib, loader._lib_tried = lib, tried


def test_ragged_row_rejected_by_native(tmp_path):
    """Rows with extra fields must not silently truncate: the native parser
    rejects them (and the pandas fallback raises on the NaN column)."""
    if not native_available():
        pytest.skip("native parser not built")
    import ctypes
    from harmonypy_tpu.io import loader
    path = tmp_path / "ragged.tsv"
    with open(path, "w") as f:
        f.write("a\tb\n1.0\t2.0\n3.0\t4.0\t5.0\n")
    lib = loader._load_native()
    err = ctypes.create_string_buffer(256)
    h = lib.fasttsv_load(str(path).encode(), 0, err, len(err))
    assert not h, "ragged row should fail native parse"
    assert b"row" in err.value
