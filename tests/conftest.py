"""Test environment: CPU backend with 8 virtual devices, so multi-device
sharding is exercised without TPU hardware (SURVEY.md §4 test strategy).

Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container pins JAX_PLATFORMS=axon (TPU) early; override explicitly so
# the test suite always runs on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Float64 for the LISI golden test (the reference computes LISI in float64);
# all harmony-engine code pins float32 explicitly, so this is safe.
jax.config.update("jax_enable_x64", True)

# Opt-in persistent compile cache for local dev loops: the suite is
# compile-bound on CPU (a 30k fused fit is ~45 s compile + ~15 s execute),
# so re-runs with HARMONYPY_TEST_COMPILE_CACHE=<dir> skip recompilation of
# unchanged programs entirely. Off by default: XLA:CPU serializes
# machine-feature-specific code (its loader warns across heterogeneous
# machines, e.g. CI runner pools), and correctness gates should compile
# fresh at least in CI. Cache hits return the byte-identical executable, so
# bitwise assertions are unaffected.
_cache_dir = os.environ.get("HARMONYPY_TEST_COMPILE_CACHE")
if _cache_dir:
    from jax.experimental.compilation_cache import compilation_cache as _cc
    _cc.set_cache_dir(_cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Fixture resolution: explicit env var first, else the fixtures bundled in
# the package (harmonypy_tpu/data — a fresh clone passes the golden tier
# with no env vars), else the reference checkout on the dev box.
from harmonypy_tpu import data as _pkg_data  # noqa: E402

REF_DATA = (os.environ.get("HARMONYPY_REF_DATA")
            or (_pkg_data.DIR if os.path.isdir(_pkg_data.DIR)
                else "/root/reference/data"))


@pytest.fixture(scope="session")
def ref_data_dir():
    if not os.path.isdir(REF_DATA):
        pytest.skip("reference data directory not available")
    return REF_DATA


@pytest.fixture(scope="session")
def pbmc(ref_data_dir):
    import pandas as pd
    meta = pd.read_csv(f"{ref_data_dir}/pbmc_3500_meta.tsv.gz", sep="\t")
    pcs = pd.read_csv(f"{ref_data_dir}/pbmc_3500_pcs.tsv.gz", sep="\t")
    harmonized = pd.read_csv(
        f"{ref_data_dir}/pbmc_3500_pcs_harmonized.tsv.gz", sep="\t")
    return meta, pcs, harmonized


def synthetic_batched(n_cells=600, d=10, n_batches=3, n_groups=5, seed=0,
                      batch_shift=2.0):
    """Clustered data with per-batch offsets — a batch effect to remove."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_groups, d)) * 4.0
    groups = rng.integers(0, n_groups, size=n_cells)
    batches = rng.integers(0, n_batches, size=n_cells)
    shifts = rng.normal(size=(n_batches, d)) * batch_shift
    X = centers[groups] + shifts[batches] + rng.normal(size=(n_cells, d))
    return X.astype(np.float32), batches, groups
