"""Property tests for the device-count-invariant partition machinery
(harmonypy_tpu/ops/partition.py) — the foundation of the bitwise 1<->N-device
contract. All pure-host checks over many random geometries."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from harmonypy_tpu.config import EngineConfig, cell_tile_geom
from harmonypy_tpu.ops.partition import (
    block_ranks, global_slot_table, iid_blocks, partition_geometry,
    single_device_tables, stripe_blocks)
from harmonypy_tpu.ops.update_r import cell_partition_len


@pytest.mark.parametrize("N,nb", [(1280, 20), (1200, 20), (4096, 20),
                                  (331, 7), (64, 1), (100, 2)])
def test_iid_blocks_mesh_invariant_assignment(N, nb):
    """The random assignment of REAL ids is a function of (key, N, nb) only:
    the per-mesh table length L (which varies with the device count through
    per-shard padding) must never change the draw — only append sentinels."""
    key = jax.random.PRNGKey(7)
    tables = {}
    for n_devices in (1, 2, 3, 6, 8):
        cfg = EngineConfig(N=N, d=4, K=5, B=2, n_devices=n_devices)
        L = cell_partition_len(cfg)
        tables[n_devices] = np.asarray(iid_blocks(key, N, L, nb))
    base = tables[1]
    assert np.all(base[N:] == nb)  # ids beyond N are sentinel
    for D, t in tables.items():
        np.testing.assert_array_equal(t[:N], base[:N], err_msg=f"D={D}")
        assert np.all(t[N:] == nb)


@pytest.mark.parametrize("seed", range(8))
def test_iid_blocks_static_width_bound_and_skips(seed):
    """Per-(shard, block) occupancy never exceeds cell_block_width, and the
    capacity rule skips only a tiny fraction of cells."""
    rng = np.random.default_rng(seed)
    N = int(rng.integers(500, 60_000))
    nb = int(rng.choice([1, 2, 10, 20, 40]))
    D = int(rng.choice([1, 2, 4, 8]))
    cfg = EngineConfig(N=N, d=4, K=5, B=2, n_devices=D,
                       block_size=1.0 / nb)
    blocks = np.asarray(iid_blocks(jax.random.PRNGKey(seed), N,
                                   cell_partition_len(cfg), nb))
    W = cfg.cell_block_width
    Nl = cfg.N_local
    for s in range(D):
        mine = blocks[s * Nl: (s + 1) * Nl]
        counts = np.bincount(mine[mine < nb], minlength=nb)
        assert counts.max(initial=0) <= W, (N, nb, D, counts.max(), W)
    skipped = int(np.sum(blocks[:N] == nb))
    assert skipped <= max(2, int(0.001 * N)), (skipped, N)


def test_expected_skip_fraction_exact_and_small():
    """The runtime-reported expected skip fraction (config.
    expected_skip_fraction, an exact binomial tail) matches a large measured
    iid_blocks draw and stays within the designed ~4-sigma bound."""
    from harmonypy_tpu.config import expected_skip_fraction

    assert expected_skip_fraction(1) == 0.0
    for nb in (2, 7, 20, 40):
        assert expected_skip_fraction(nb) < 5e-5, nb
    # Measured vs exact on a 2.56M-cell draw (nb=20 -> ~2e-5 expected, so
    # ~51 skips expected; Poisson-ish sd ~ sqrt(51)).
    nb, N = 20, 2_560_000
    blocks = np.asarray(iid_blocks(jax.random.PRNGKey(11), N, N, nb))
    measured = np.sum(blocks == nb) / N
    exact = expected_skip_fraction(nb)
    assert abs(measured - exact) < 5 * np.sqrt(exact / N) + 1e-7, (
        measured, exact)


def test_iid_blocks_uniformity():
    """Block sizes are multinomial around N/nb (not stratified-exact)."""
    N, nb = 40_000, 20
    blocks = np.asarray(iid_blocks(jax.random.PRNGKey(0), N, N, nb))
    counts = np.bincount(blocks[blocks < nb], minlength=nb)
    assert abs(counts.mean() - N / nb) < 10
    # multinomial sd ~ sqrt(N/nb) ~ 44.7; stratified would give sd ~ 0
    assert 15 < counts.std() < 150, counts.std()


@pytest.mark.parametrize("N,CH,bs", [(8000, 128, 0.05), (70_000, 2048, 0.05),
                                     (5000, 128, 0.25)])
def test_chunk_partition_shard_tables_consistent(N, CH, bs):
    """Per-shard slot tables are a partition of the global table: every real
    chunk appears on exactly one shard with the global within-block rank."""
    for D in (1, 2, 4):
        cfg = EngineConfig(N=N, d=4, K=5, B=2, n_devices=D, use_fused_xla=True,
                           chunk_size=CH, block_size=bs)
        geom = partition_geometry(cfg)
        key = jax.random.PRNGKey(3)
        blocks = np.asarray(stripe_blocks(key, geom.NC_fixed, geom.L, geom.nb))
        ranks = np.asarray(block_ranks(jnp.asarray(blocks), geom.nb,
                                       geom.J_fix))
        gtbl = np.asarray(global_slot_table(jnp.asarray(blocks),
                                            jnp.asarray(ranks), geom))
        # Global table covers the first NC_fixed chunk ids exactly once.
        assert sorted(gtbl.reshape(-1).tolist()) == list(range(geom.NC_fixed))
        # The global partition never depends on D (stripe over NC_fixed) and
        # the per-(block, rank) cell is owned by exactly one shard.
        seen = {}
        for s in range(D):
            lo = s * geom.nc_cap
            myb = blocks[lo: lo + geom.nc_cap]
            myr = ranks[lo: lo + geom.nc_cap]
            for j, (b, r) in enumerate(zip(myb, myr)):
                g = lo + j
                if g >= geom.NC_fixed:
                    continue
                assert (b, r) not in seen, (b, r)
                seen[(b, r)] = g
                assert gtbl[b, r] == g
        # shards own [0, D * nc_cap); frame rows beyond that (when NC_fixed
        # rounds past the owned chunks) are zero-stat padding no shard
        # writes — their psum contribution is exactly zero.
        assert len(seen) == min(D * geom.nc_cap, geom.NC_fixed)


def test_single_device_tables_match_engine_shapes():
    cfg = EngineConfig(N=9000, d=4, K=5, B=2, n_devices=1, use_fused_xla=True,
                       chunk_size=128)
    geom = partition_geometry(cfg)
    slots, granks, gtbl = single_device_tables(jax.random.PRNGKey(0), cfg)
    assert slots.shape == (geom.nb, geom.J_shard)
    assert granks.shape == slots.shape
    assert gtbl.shape == (geom.nb, geom.J_fix)
    s = np.asarray(slots)
    # every real chunk appears exactly once; the rest are dummy sentinels
    real = s[s < geom.nc_cap]
    assert sorted(real.tolist()) == list(range(min(geom.nc_cap,
                                                   geom.NC_fixed)))


def test_cell_tile_geom_cap_covers_mean():
    for nb in (1, 2, 5, 20, 100):
        G, cap = cell_tile_geom(nb)
        assert G % nb == 0
        assert cap > G // nb  # cap strictly above the mean occupancy
