"""Static configuration for the Harmony TPU engine.

Everything in :class:`EngineConfig` is a *static* (hashable) quantity: array
shapes, loop bounds, convergence thresholds and padding geometry. It is part
of the jit cache key, so two runs with the same config reuse the compiled
executable.

The hyper-parameter *arrays* (theta, sigma, lamb, Pr_b) are runtime inputs and
live in :class:`harmonypy_tpu.state.HarmonyParams` instead.

Reference behavior being mirrored (see /root/reference/harmonypy/harmony.py):
  - block geometry: ``n_blocks = ceil(1/block_size)``,
    ``cells_per_block = int(N * block_size)``, last block takes the remainder
    (harmony.py:474-484).
  - defaults: sigma=0.1, block_size=0.05, max_iter_harmony=10,
    max_iter_kmeans=20, epsilon_cluster=1e-5, epsilon_harmony=1e-4, alpha=0.2,
    window_size=3 (harmony.py:49-67, 258).
"""

from __future__ import annotations

import dataclasses
import math


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def default_nclust(N: int) -> int:
    """Reference default cluster count (harmony.py:123-124):
    min(round(N / 30), 100). Single source of truth for api, loader, and
    tools."""
    return int(min(round(N / 30.0), 100))


CELL_TILE_M = 64  # mean cells per (capacity tile, block) in the iid partition


def cell_tile_geom(nb: int) -> tuple[int, int]:
    """(tile size G, per-(tile, block) capacity cap) for the per-cell iid
    block partition (ops/partition.py iid_blocks). Mean occupancy of a
    (tile, block) cell group is m = G/nb = CELL_TILE_M with sigma
    sqrt(m(1-1/nb)) <= 8; cap = m + ceil(4 sqrt(m)) is a >=4-sigma bound, so
    overflow (a skipped update for the overflowing cells that round) has
    probability ~2e-5 per tile-block."""
    m = CELL_TILE_M
    return nb * m, m + int(math.ceil(4.0 * math.sqrt(m)))


def expected_skip_fraction(nb: int) -> float:
    """Exact expected fraction of cells the per-cell capacity rule skips per
    round: E[(X - cap)^+] / m with X ~ Binomial(G, 1/nb) the occupancy of one
    (tile, block) group. Makes the ~4-sigma design assumption of
    cell_tile_geom observable at runtime instead of hard-coded prose."""
    G, cap = cell_tile_geom(nb)
    if cap >= G:
        return 0.0
    p = 1.0 / nb
    lp, l1p = math.log(p), math.log1p(-p)
    lgG = math.lgamma(G + 1)
    acc = 0.0
    for x in range(cap + 1, G + 1):
        lpmf = (lgG - math.lgamma(x + 1) - math.lgamma(G - x + 1)
                + x * lp + (G - x) * l1p)
        acc += (x - cap) * math.exp(lpmf)
    return acc / CELL_TILE_M


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Hashable static geometry + loop bounds for one Harmony problem."""

    # Problem shape.
    N: int            # true number of cells
    d: int            # number of PCs
    K: int            # number of clusters
    B: int            # number of batch levels (rows of Phi, without intercept)
    n_devices: int    # size of the "cells" mesh axis

    # Algorithm loop bounds / thresholds (static: part of compile key).
    max_iter_harmony: int = 10
    max_iter_kmeans: int = 20
    epsilon_kmeans: float = 1e-5
    epsilon_harmony: float = 1e-4
    window_size: int = 3
    block_size: float = 0.05
    alpha: float = 0.2
    lambda_estimation: bool = False

    # KMeans init (mirrors sklearn.KMeans(init='k-means++', n_init=1,
    # max_iter=25) used at reference harmony.py:370-372).
    kmeans_max_iter: int = 25
    kmeans_tol: float = 1e-4
    # Seeding + Lloyd refinement run on a uniform subsample of at most this
    # many cells above the cap (both are K x N-scale work whose noise washes
    # out in Harmony's own full-data fuzzy k-means loop; see
    # ops/kmeans.kmeans_init). Problems with N <= the cap see the exact
    # full-data behavior.
    kmeanspp_sample: int = 131072
    # Above the subsample threshold, seeding uses k-means|| (Bahmani et al.,
    # VLDB 2012): `kmeansbb_rounds` rounds of D^2-oversampling, drawing
    # `kmeansbb_oversample x K` candidates per round, then weighted greedy
    # k-means++ over the candidate set. Replaces K sequential dependent
    # steps with a handful of wide data passes.
    kmeansbb_rounds: int = 5
    kmeansbb_oversample: int = 2

    # Storage dtype for the soft-assignment matrix R — the dominant state
    # array (K x N). "bfloat16" halves its HBM footprint and write
    # bandwidth: R is WRITE-ONLY in the fused E-step design (all O/E/Y/
    # objective statistics accumulate in fp32 from the pre-cast values), so
    # the cast touches only the stored copy that the ridge later reads.
    # Enables e.g. K=200 x 5M cells on a single 16 GB chip.
    r_dtype: str = "float32"

    # MXU matmul precision. "default" runs single-pass bf16-input matmuls
    # with fp32 accumulation — measured min per-PC Pearson r vs the R golden
    # output: 0.9980 (vs 0.9985 at "float32", which costs ~3x the MXU passes
    # in every hot GEMM; the reference's own CI gate is 0.9). Pass
    # matmul_precision="float32" through run_harmony for strict mode.
    matmul_precision: str = "default"

    # Fused chunk-granular E-step. use_pallas selects the single-chip Pallas
    # kernel (ops/pallas/update_r_fused.py); use_fused_xla selects the pure
    # XLA equivalent that runs on any mesh (ops/update_r_fused_xla.py). With
    # either, cells are block-shuffled at CHUNK granularity and every shard
    # is padded to a chunk multiple plus one trailing all-zero dummy chunk.
    use_pallas: bool = False
    use_fused_xla: bool = False
    chunk_size: int = 2048

    # Number of covariates whose one-hot blocks Phi concatenates (reference
    # harmony.py:133). With ONE covariate every Phi column holds a single 1,
    # so the fused E-step's entropy objective term factorizes log-free
    # (ops/objective.chunk_objective_partials_fast); with several it falls
    # back to the generic elementwise form. Value changes only which exact
    # expression computes the same quantity — never the E-step itself.
    n_covariates: int = 1

    # Opt-in log-free objective partials (requires n_covariates == 1).
    # Measured on v5e at 858k: deferred round 1.05 ms vs ~1.10 ms — but the
    # factorized entropy differs from the elementwise form at ~1e-6
    # relative, which REORDERS near-plateau k-means round counts (a fixed
    # seed measured [16,19,11] vs [18,7,5] rounds — neither is more
    # correct, but trajectories stop being comparable run-to-run across
    # versions). Default off: strict elementwise reference-form objective;
    # flip on when throughput matters more than trajectory continuity.
    fast_objective: bool = False

    # Deferred-R (out-of-core) mode — the DEFAULT on the fused path: the
    # K x N soft-assignment matrix is NEVER materialized. R is write-only in
    # the fused E-step design (all statistics accumulate from in-flight
    # values), so k-means rounds skip the write entirely and every later
    # consumer — the ridge correction, the next iteration's centroid
    # numerator, the user-facing .R property — REPLAYS the final round's
    # E-step from a saved (Y, O, E, cache, key) bundle, chunk-resident.
    # Faster than the stored paths (no K x N writes; replay-fused ridge)
    # AND device memory becomes independent of K at N scale: K=200 x 5M
    # cells fits one 16 GB chip. Rounds run the fused-XLA E-step on any
    # mesh, or the Pallas kernel's no-R variant on a single TPU chip
    # (bitwise interchangeable; the replay passes are always XLA).
    defer_r: bool = False

    @property
    def fused_estep(self) -> bool:
        return self.use_pallas or self.use_fused_xla

    @property
    def r_jnp_dtype(self):
        import jax.numpy as jnp
        return jnp.bfloat16 if self.r_dtype == "bfloat16" else jnp.float32

    # ---- derived geometry ------------------------------------------------
    @property
    def N_pad(self) -> int:
        """Cells padded so every device holds the same count; the fused
        E-step paths additionally pad each shard to a chunk multiple + 1
        dummy chunk."""
        if self.fused_estep:
            per_dev = round_up(cdiv(self.N, self.n_devices),
                               self.chunk_size) + self.chunk_size
            return per_dev * self.n_devices
        return round_up(self.N, self.n_devices)

    @property
    def N_local(self) -> int:
        return self.N_pad // self.n_devices

    @property
    def N_shard_real(self) -> int:
        """Per-shard REAL-cell capacity. Padding lives at the end of every
        shard (not just globally at the end): the fused E-step paths require
        each shard's final chunk to be the all-zero dummy. Real cell g lives
        on shard g // N_shard_real at local offset g % N_shard_real."""
        if self.fused_estep:
            return self.N_local - self.chunk_size
        return self.N_local

    @property
    def B1(self) -> int:
        """Rows of Phi_moe (intercept + batch levels)."""
        return self.B + 1

    # Block geometry. The PARTITION of cells (or chunks) into blocks depends
    # only on (seed, N) — see ops/partition.py — so results are device-count-
    # invariant. The per-cell path assigns blocks iid per cell (multinomial
    # composition noise, matching the reference's random blocks even when the
    # input is sorted by batch) with a per-tile capacity rule that gives the
    # static per-shard width below; the fused paths stripe CHUNKS.
    @property
    def n_blocks(self) -> int:
        return int(math.ceil(1.0 / self.block_size))

    @property
    def cell_block_width(self) -> int:
        """Static per-shard width of the per-cell E-step's block work arrays
        (sentinel-masked to the actual per-block count): a contiguous shard
        intersects at most cdiv(N_local, G) + 1 capacity tiles, each holding
        at most `cap` cells of one block."""
        G, cap = cell_tile_geom(self.n_blocks)
        return min(self.N_local, (cdiv(self.N_local, G) + 1) * cap)

    # History buffer sizes (ring buffers carried in the state pytree).
    @property
    def kmeans_hist_len(self) -> int:
        # one objective at init + up to max_iter_kmeans per harmony
        # iteration; never smaller than the windowed-convergence slice
        # (window_size + 2) so tiny max_iter_kmeans configs stay valid.
        return max(1 + self.max_iter_harmony * self.max_iter_kmeans,
                   self.window_size + 2)

    @property
    def harmony_hist_len(self) -> int:
        return 1 + self.max_iter_harmony

    @property
    def rounds_hist_len(self) -> int:
        # >= 1 even for max_iter_harmony=0 (reference harmonize() with
        # iter_harmony=0 is a legal no-op fit): the while_loop body still
        # TRACES an append into this buffer, and a zero-length axis is a
        # trace-time IndexError even though the append never executes.
        return max(1, self.max_iter_harmony)

    @property
    def kmeanspp_trials(self) -> int:
        """Greedy k-means++ candidate count (sklearn: 2 + floor(log(K)))."""
        return 2 + int(math.log(self.K)) if self.K > 1 else 1

    def validate(self) -> None:
        assert self.N >= 1 and self.d >= 1 and self.K >= 1 and self.B >= 1
        assert self.n_devices >= 1
        assert 0.0 < self.block_size <= 1.0
        assert not (self.use_pallas and self.use_fused_xla), self
        assert not (self.defer_r and not self.fused_estep), \
            "defer_r requires a fused E-step (XLA any mesh, or the Pallas " \
            "kernel's no-R variant on one chip)"
        if self.use_pallas:
            assert pallas_supported(self.N, self.n_devices, self.block_size,
                                    self.chunk_size), self
        if self.use_fused_xla:
            assert fused_geometry_ok(self.N, self.n_devices, self.block_size,
                                     self.chunk_size), self


def auto_chunk_size(N: int, block_size: float = 0.05,
                    requested: int | None = None) -> int:
    """Default chunk size for a problem. A function of (N, block_size) ONLY
    — never of the mesh — so the resulting block partition, and therefore
    the fit, stays bitwise device-count-invariant (ops/partition.py).

    2048 whenever the fused geometry allows it. Below that (N < n_blocks
    chunks of 2048, i.e. < ~41k cells at the default 5% blocks), shrink to
    the largest power of two that still yields one real chunk per block so
    mid-size problems keep the fused E-step (and its deferred-R default)
    instead of falling to the several-times-slower per-cell path. Under
    _PER_CELL_MAX_N the per-cell path measures faster than the fused one
    (small-chunk grids waste the MXU) — keep 2048 there, which selects it.
    """
    if requested is not None:
        return int(requested)
    if fused_geometry_ok(N, 1, block_size, 2048) or N < _PER_CELL_MAX_N:
        return 2048
    nb = int(math.ceil(1.0 / block_size))
    # Largest power of two with one real chunk per block (c <= N/nb implies
    # cdiv(N, c) >= nb). Chunks must stay lane-aligned (multiples of 128);
    # below that there are too few cells per block for a sound fused
    # geometry — return the default, which selects the per-cell path.
    c = min(2048, 1 << int(math.floor(math.log2(max(N // nb, 1)))))
    if c < 128 or not fused_geometry_ok(N, 1, block_size, c):
        return 2048
    return c


# Below this N the per-cell E-step measures faster than a small-chunk fused
# grid (memory: ~20k crossover on the tunnel chip); auto_chunk_size keeps
# the per-cell path there.
_PER_CELL_MAX_N = 20_480


def fused_geometry_ok(N: int, n_devices: int = 1, block_size: float = 0.05,
                      chunk_size: int = 2048) -> bool:
    """Whether chunk-granular blocks are a sound approximation for a problem:
    there must be at least one real chunk per update block GLOBALLY (fewer
    would collapse several 5%-blocks into one giant update). Deliberately
    independent of the device count — the fused-path decision is part of the
    algorithm, and a mesh-dependent decision would break the device-count-
    invariance contract (ops/partition.py)."""
    del n_devices  # kept in the signature for call-site compatibility
    n_blocks = int(math.ceil(1.0 / block_size))
    return cdiv(N, chunk_size) >= n_blocks


def pallas_supported(N: int, n_devices: int, block_size: float = 0.05,
                     chunk_size: int = 2048) -> bool:
    """Whether the fused Pallas E-step applies: single device (the in-kernel
    sequential O/E update cannot psum mid-grid; multi-device meshes use the
    XLA fused path) and workable chunk geometry."""
    if n_devices != 1:
        return False
    return fused_geometry_ok(N, n_devices, block_size, chunk_size)
