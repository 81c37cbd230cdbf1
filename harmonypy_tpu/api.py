"""Public API: run_harmony() driver + Harmony result object.

Drop-in compatible with the reference surface (harmony.py:49-215, 218-355):
same signature, same hyper-parameter broadcasting rules, same defaults, same
NumPy-returning properties and objective histories. The `device` argument
accepts a JAX platform string ("tpu", "cpu") instead of torch device names;
a `mesh` kwarg additionally allows running over an explicit device mesh.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

import jax

from .config import (EngineConfig, auto_chunk_size, default_nclust,
                     fused_geometry_ok)
from .engine import get_engine
from .state import HarmonyParams, HarmonyState
from .parallel.mesh import default_mesh, make_mesh
from .parallel.sharding import shard_inputs
from .utils.logging import logger
from .utils.checkpoint import save_state

# Warn when a problem this large misses the fused E-step (the per-cell
# fallback's block scatter pays a full copy of R per block — see
# ops/pallas/update_r_fused.py module docstring for the measurement).
_SLOW_PATH_WARN_N = 65536


def run_harmony(
    data_mat,
    meta_data: pd.DataFrame,
    vars_use,
    theta=None,
    lamb=None,
    sigma=0.1,
    nclust=None,
    tau=0,
    block_size=0.05,
    max_iter_harmony=10,
    max_iter_kmeans=20,
    epsilon_cluster=1e-5,
    epsilon_harmony=1e-4,
    alpha=0.2,
    verbose=True,
    random_state=0,
    device=None,
    mesh=None,
    checkpoint_dir=None,
    resume_from=None,
    use_pallas=None,
    chunk_size=None,
    matmul_precision="default",
    low_memory=False,
    defer_r=None,
    fast_objective=False,
):
    """Run Harmony batch-effect correction on TPU (or any JAX backend).

    Mirrors the reference driver (harmony.py:49-215): input orientation
    fix-up, one-hot design-matrix construction, theta/lambda/sigma
    broadcasting, tau discounting, seeding, logging, then the full eager fit.

    Extra (TPU-native) parameters:
      mesh            explicit jax.sharding.Mesh with a "cells" axis; default
                      is all devices of `device`'s platform.
      checkpoint_dir  if set, snapshot the state pytree after every harmony
                      iteration (resume support the reference lacks).
      resume_from     path of a checkpoint written by checkpoint_dir; the fit
                      continues from that iteration (bitwise-identical to an
                      uninterrupted run: the RNG key lives in the state).
      matmul_precision  "default" (single-pass bf16-input MXU matmuls, fp32
                      accumulation — golden r 0.998 vs the R output) or
                      "float32" (strict multi-pass fp32, ~3x the matmul cost).
      low_memory      store the K x N soft-assignment matrix R in bfloat16
                      (half the dominant state array). On the fused E-step
                      paths every statistic still accumulates in fp32 from
                      the pre-cast values; the per-cell fallback instead
                      keeps O/E exactly consistent with the stored (rounded)
                      values. Enables e.g. K=200 x 5M cells on one 16 GB chip.
      chunk_size      cells per chunk of the fused E-step (None = auto:
                      2048, shrunk as a function of (N, block_size) only —
                      never the mesh — so mid-size problems keep the fused
                      path; config.auto_chunk_size).
      defer_r         deferred-R mode — THE DEFAULT whenever the fused
                      chunk geometry applies: the K x N soft assignments
                      are NEVER materialized on device; ridge, the next
                      iteration's centroid update, and the .R property
                      replay the final E-step round chunk-resident instead.
                      Measured faster than both stored-R variants at 858k
                      cells AND K-independent device memory at N scale
                      (K=200 x 5M on one 16 GB chip). Pass defer_r=False
                      (or use_pallas=True) for the stored-R paths.
      fast_objective  opt-in log-free objective partials on the fused paths
                      (single-covariate designs): ~5% faster k-means round,
                      but the entropy term differs at ~1e-6 relative, which
                      reorders near-plateau round counts — objective
                      trajectories stop being comparable with the default
                      form (EngineConfig.fast_objective).
    """
    N = meta_data.shape[0]
    data_mat = np.asarray(data_mat.values if hasattr(data_mat, "values") else data_mat)
    if data_mat.shape[1] != N:
        data_mat = data_mat.T
    assert data_mat.shape[1] == N, \
        "data_mat and meta_data do not have the same number of cells"

    if nclust is None:
        nclust = default_nclust(N)

    sigma = np.asarray(sigma, dtype=np.float32).reshape(-1)
    if sigma.size == 1 and nclust > 1:
        sigma = np.repeat(sigma, nclust)
    if sigma.size != nclust:
        raise ValueError(f"sigma must be a scalar or have nclust={nclust} "
                         f"entries, got {sigma.size}")

    if isinstance(vars_use, str):
        vars_use = [vars_use]

    # One-hot design matrix (reference harmony.py:133-134). Categorical
    # conversion makes numeric batch columns work too; for string columns the
    # level order (sorted) matches pd.get_dummies on the raw frame.
    # phi_n counts DECLARED categories, not observed uniques: pd.get_dummies
    # emits a column per category, including unused levels of a pre-existing
    # pd.Categorical (the normal state after subsetting an AnnData frame).
    cats = meta_data[vars_use].astype("category")
    phi = pd.get_dummies(cats).to_numpy().T.astype(np.float32)
    phi_n = np.asarray([len(cats[c].cat.categories) for c in cats.columns],
                       dtype=int)

    # Theta broadcasting (reference harmony.py:136-147).
    if theta is None:
        theta = np.repeat([2] * len(phi_n), phi_n).astype(np.float32)
    elif isinstance(theta, (float, int)):
        theta = np.repeat([theta] * len(phi_n), phi_n).astype(np.float32)
    elif len(theta) == len(phi_n):
        theta = np.repeat([theta], phi_n).astype(np.float32)
    else:
        theta = np.asarray(theta, dtype=np.float32)
    assert len(theta) == np.sum(phi_n), "each batch variable must have a theta"

    # Lambda broadcasting (reference harmony.py:149-166).
    lambda_estimation = False
    if lamb is None:
        lamb = np.repeat([1] * len(phi_n), phi_n).astype(np.float32)
        lamb = np.insert(lamb, 0, 0).astype(np.float32)
    elif np.isscalar(lamb) and lamb == -1:
        lambda_estimation = True
        lamb = np.zeros(1, dtype=np.float32)
    elif isinstance(lamb, (float, int)):
        lamb = np.repeat([lamb] * len(phi_n), phi_n).astype(np.float32)
        lamb = np.insert(lamb, 0, 0).astype(np.float32)
    elif len(lamb) == len(phi_n):
        lamb = np.repeat([lamb], phi_n).astype(np.float32)
        lamb = np.insert(lamb, 0, 0).astype(np.float32)
    else:
        lamb = np.asarray(lamb, dtype=np.float32)
        if len(lamb) == np.sum(phi_n):
            lamb = np.insert(lamb, 0, 0).astype(np.float32)
        else:
            raise ValueError(
                f"lamb has length {len(lamb)}; expected one entry per batch "
                f"variable ({len(phi_n)}) or per batch level "
                f"({int(np.sum(phi_n))})")
    if not lambda_estimation:
        if np.any(np.asarray(lamb)[1:] <= 0):
            # A zero ridge makes the normal equations exactly singular
            # (the intercept row of Phi_moe is the sum of the batch rows);
            # the reference's torch.linalg.inv raises on the same input.
            raise ValueError(
                "lamb entries must be positive (use lamb=-1 for dynamic "
                "estimation); a zero ridge penalty makes the per-cluster "
                "system singular")

    # Batch proportions + tau discount (reference harmony.py:169-173).
    N_b = phi.sum(axis=1)
    Pr_b = (N_b / N).astype(np.float32)
    if tau > 0:
        theta = theta * (1 - np.exp(-(N_b / (nclust * tau)) ** 2))
        theta = theta.astype(np.float32)

    if mesh is None:
        mesh = default_mesh(device)

    if verbose:
        logger.info(f"Running Harmony (JAX on {mesh.devices.size} "
                    f"{mesh.devices.flat[0].platform} device(s))")
        logger.info("  Parameters:")
        logger.info(f"    max_iter_harmony: {max_iter_harmony}")
        logger.info(f"    max_iter_kmeans: {max_iter_kmeans}")
        logger.info(f"    epsilon_cluster: {epsilon_cluster}")
        logger.info(f"    epsilon_harmony: {epsilon_harmony}")
        logger.info(f"    nclust: {nclust}")
        logger.info(f"    block_size: {block_size}")
        if lambda_estimation:
            logger.info(f"    lamb: dynamic (alpha={alpha})")
        else:
            logger.info(f"    lamb: {lamb[1:]}")
        logger.info(f"    theta: {theta}")
        logger.info(f"    sigma: {sigma[:5]}..." if len(sigma) > 5 else f"    sigma: {sigma}")
        logger.info(f"    random_state: {random_state}")
        logger.info(f"  Data: {data_mat.shape[0]} PCs × {N} cells")
        logger.info(f"  Batch variables: {vars_use}")

    data_mat = np.asarray(data_mat, dtype=np.float32)

    return Harmony(
        data_mat, phi, Pr_b, sigma.astype(np.float32),
        theta, lamb, alpha, lambda_estimation,
        max_iter_harmony, max_iter_kmeans,
        epsilon_cluster, epsilon_harmony, nclust, block_size, verbose,
        random_state, device, mesh=mesh, checkpoint_dir=checkpoint_dir,
        resume_from=resume_from, use_pallas=use_pallas, chunk_size=chunk_size,
        matmul_precision=matmul_precision, low_memory=low_memory,
        defer_r=defer_r, fast_objective=fast_objective,
    )


class Harmony:
    """Eagerly-fitted Harmony result (reference class Harmony,
    harmony.py:218-355): the constructor runs the full pipeline; results are
    read through NumPy-returning, cells-first properties."""

    def __init__(self, Z, Phi, Pr_b, sigma, theta, lamb, alpha,
                 lambda_estimation, max_iter_harmony, max_iter_kmeans,
                 epsilon_kmeans, epsilon_harmony, K, block_size, verbose,
                 random_state, device=None, *, mesh=None, checkpoint_dir=None,
                 resume_from=None, use_pallas=None, chunk_size=None,
                 matmul_precision="default", low_memory=False, defer_r=None,
                 fast_objective=False):
        Z = np.asarray(Z, dtype=np.float32)
        Phi = np.asarray(Phi, dtype=np.float32)
        if mesh is None:
            mesh = make_mesh() if device is None else default_mesh(device)
        self.mesh = mesh

        self.N = Z.shape[1]
        self.d = Z.shape[0]
        self.B = Phi.shape[0]
        # Exactly-one-hot columns (single covariate) let the fused E-step
        # compute the entropy objective term log-free
        # (ops/objective.chunk_objective_partials_fast); anything else
        # (multi-covariate concatenated blocks, exotic direct-ctor designs)
        # uses the generic elementwise form. Same quantity either way.
        single_onehot = bool(
            Phi.size and np.all(Phi.sum(axis=0) == 1.0)
            and np.all((Phi != 0).sum(axis=0) == 1))
        self.n_covariates = 1 if single_onehot else 2
        self.K = K
        self.window_size = 3
        self.epsilon_kmeans = epsilon_kmeans
        self.epsilon_harmony = epsilon_harmony
        self.block_size = block_size
        self.alpha = alpha
        self.lambda_estimation = lambda_estimation
        self.max_iter_harmony = max_iter_harmony
        self.max_iter_kmeans = max_iter_kmeans
        self.verbose = verbose

        n_devices = int(mesh.devices.size)
        # Auto chunk size (a function of N and block_size only — mesh
        # independence is part of the bitwise invariance contract): keeps
        # mid-size problems on the fused E-step instead of silently falling
        # to the per-cell path when N has too few default-size chunks.
        chunk_size = auto_chunk_size(self.N, float(block_size), chunk_size)
        fused_ok = fused_geometry_ok(self.N, n_devices, float(block_size),
                                     int(chunk_size))
        if defer_r and not fused_ok:
            raise ValueError(
                f"defer_r requires the fused chunk geometry "
                f"(>= {int(np.ceil(1 / block_size))} chunks of "
                f"{chunk_size} cells; N={self.N} has too few). Use a "
                f"smaller chunk_size.")
        # The deferred .R / ridge replay reproduces the LAST COMPLETED
        # k-means round; a zero-iteration fit never runs one, so its replay
        # bundle would hold init placeholders and .R would be garbage.
        zero_iters = min(int(max_iter_harmony), int(max_iter_kmeans)) < 1
        if defer_r and zero_iters:
            raise ValueError(
                "defer_r requires max_iter_harmony >= 1 and "
                "max_iter_kmeans >= 1: the deferred .R/ridge replay "
                "reproduces the last completed k-means round, which a "
                "zero-iteration fit never runs. Pass defer_r=False to keep "
                "the initial assignments materialized.")
        if defer_r is None:
            # Deferred-R is the DEFAULT on the fused path: measured FASTER
            # than both stored variants at 858k on one chip (0.109 s vs
            # 0.123 s stored-Pallas / 0.245 s stored-XLA — no R writes, no
            # scan carry scatters, ridge fused into the replay) and its
            # device memory is K-independent at N scale. An explicit
            # use_pallas=True keeps the stored-R kernel path
            # (bitwise-interchangeable rounds; tools/bitwise_xpath.py).
            defer_r = fused_ok and use_pallas is not True and not zero_iters
        if use_pallas is None:
            # The Pallas kernel is opt-in: with deferred-R as the default,
            # the measured A/B between kernel rounds and fused-XLA rounds is
            # within noise (the stored-R write the kernel used to save is
            # gone), and one uniform program per mesh size is simpler. The
            # kernel remains available (use_pallas=True, with or without
            # defer_r) and is bitwise-interchangeable on TPU.
            use_pallas = False
        # Small problems (too few chunks for the fused geometry) fall back
        # to the per-cell path (ops/update_r.py).
        use_fused_xla = (not use_pallas) and fused_ok

        cfg = EngineConfig(
            N=self.N, d=self.d, K=K, B=self.B,
            n_devices=n_devices,
            use_pallas=bool(use_pallas),
            use_fused_xla=bool(use_fused_xla),
            defer_r=bool(defer_r),
            chunk_size=int(chunk_size),
            max_iter_harmony=max_iter_harmony,
            max_iter_kmeans=max_iter_kmeans,
            epsilon_kmeans=float(epsilon_kmeans),
            epsilon_harmony=float(epsilon_harmony),
            window_size=self.window_size,
            block_size=float(block_size),
            alpha=float(alpha),
            lambda_estimation=bool(lambda_estimation),
            matmul_precision=str(matmul_precision),
            r_dtype="bfloat16" if low_memory else "float32",
            n_covariates=self.n_covariates,
            fast_objective=bool(fast_objective),
        )
        if not cfg.fused_estep:
            from .config import cell_tile_geom, expected_skip_fraction
            G, cap = cell_tile_geom(cfg.n_blocks)
            frac = expected_skip_fraction(cfg.n_blocks)
            # Exact binomial expectation for THIS geometry (not prose): the
            # 4-sigma capacity-rule assumption is checked every run, and a
            # geometry that ever pushes it above 1e-4 turns user-visible.
            emit = logger.warning if frac > 1e-4 else logger.debug
            emit(
                f"per-cell E-step: the iid block partition's tile-capacity "
                f"rule (tile={G} cells, cap={cap} per block) skips an "
                f"expected {frac:.2e} of cells per round — those cells keep "
                f"their previous assignment for one round (bound tested in "
                f"tests/test_partition.py; see README 'Per-cell path "
                f"capacity rule').")
            # Surface the weaker invariance contract (the fused paths are
            # bitwise device-count-invariant; this one is reduction-order
            # tight only — ops/update_r.py docstring).
            logger.info(
                f"per-cell E-step: results are mesh-invariant to "
                f"reduction-order tolerance (~1e-5 across device counts), "
                f"not bitwise; a smaller chunk_size (e.g. chunk_size=128) "
                f"restores the fused path's bitwise device-count-"
                f"invariance contract.")
        if not cfg.fused_estep and self.N > _SLOW_PATH_WARN_N:
            logger.warning(
                f"N={self.N}: chunk geometry (chunk_size={chunk_size}, "
                f"{n_devices} device(s)) disables the fused E-step; falling "
                f"back to the per-cell update, which is several times slower "
                f"at this scale. A smaller chunk_size usually restores the "
                f"fused path.")
        # Capacity preflight (the CPU reference has host-RAM capacity,
        # harmony.py:35-46; an accelerator has a hard HBM ceiling): fail
        # fast with remedies instead of a raw XLA OOM mid-compile.
        # Deferred-R (the default fused path) is K-independent at N scale;
        # an explicitly stored-R config that is over budget gets an error
        # naming defer_r among the remedies.
        if not os.environ.get("HARMONYPY_SKIP_CAPACITY_CHECK"):
            from .utils.memory import check_capacity
            check_capacity(cfg, mesh)
        self.cfg = cfg
        engine = get_engine(cfg, mesh)
        self._engine = engine

        lamb_arr = np.atleast_1d(np.asarray(lamb, dtype=np.float32))
        if not lambda_estimation and len(lamb_arr) != self.B + 1:
            raise ValueError(
                f"lamb must have {self.B + 1} entries (intercept + one per "
                f"batch level), got {len(lamb_arr)}")
        params = HarmonyParams(
            theta=jax.numpy.asarray(theta, jax.numpy.float32),
            sigma=jax.numpy.asarray(sigma, jax.numpy.float32),
            # Ignored under lambda estimation (ridge derives alpha*E per
            # cluster); the length check above guarantees B+1 otherwise.
            lamb=jax.numpy.asarray(
                np.zeros(self.B + 1) if lambda_estimation else lamb_arr,
                jax.numpy.float32),
            Pr_b=jax.numpy.asarray(Pr_b, jax.numpy.float32),
        )
        self._params = params
        self._data = shard_inputs(Z, Phi, cfg, mesh)
        self._lamb_raw = np.asarray(lamb, dtype=np.float32)

        key = jax.random.PRNGKey(random_state)
        if resume_from is not None:
            from .utils.checkpoint import load_state, validate_state
            state = load_state(resume_from)
            validate_state(state, cfg, resume_from)
            if state.Ysum0 is None:
                # Checkpoint written before the deferred-R fields existed:
                # only resumable in non-defer mode (validate_state rejects
                # the R-placeholder mismatch otherwise); fill the
                # placeholder fields at their GLOBAL shapes.
                D = cfg.n_devices
                one = np.zeros((1, 1), np.float32)
                state = state._replace(
                    Ysum0=one, rep_Y=one, rep_O=one, rep_E=one,
                    rep_key=np.zeros((2,), np.uint32),
                    rep_cache=np.zeros((D, 1, 1), np.float32),
                    rep_Zcos=np.zeros((1, D), np.float32))
            shardings = jax.tree.map(
                lambda spec: jax.sharding.NamedSharding(mesh, spec),
                engine.state_specs,
                is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec))
            if state.cache is None:
                # Pre-cache-field checkpoint: upload everything else, then
                # rebuild the chunk-stats cache from the sharded R and Phi.
                fields = state._asdict()
                fields.pop("cache")
                fields = {k: jax.device_put(v, getattr(shardings, k))
                          for k, v in fields.items()}
                state = HarmonyState(
                    **fields,
                    cache=engine.cache_fn(fields["R"], self._data.Phi))
            else:
                state = jax.device_put(state, shardings)
            start_iter = int(state.n_rounds) + 1
            for i in range(start_iter, max_iter_harmony + 1):
                if bool(state.converged):
                    break
                if verbose:
                    logger.info(f"Iteration {i} of {max_iter_harmony} "
                                f"(resumed)")
                state = engine.iter_fn(state, self._data, params)
                if checkpoint_dir is not None:
                    save_state(f"{checkpoint_dir}/harmony_iter_{i}.npz", state)
        elif not verbose and checkpoint_dir is None:
            # Single compiled program: init + all harmony iterations in-graph.
            state = engine.fit_fn(self._data, params, key)
        else:
            state = engine.init_fn(self._data, params, key)
            for i in range(1, max_iter_harmony + 1):
                if verbose:
                    logger.info(f"Iteration {i} of {max_iter_harmony}")
                state = engine.iter_fn(state, self._data, params)
                if checkpoint_dir is not None:
                    save_state(f"{checkpoint_dir}/harmony_iter_{i}.npz", state)
                if bool(state.converged):
                    if verbose:
                        logger.info(f"Converged after {i} iteration"
                                    f"{'s' if i > 1 else ''}")
                    break
            else:
                if verbose:
                    logger.info("Stopped before convergence")

        self.state: HarmonyState = jax.block_until_ready(state)

    # ---- observability histories (reference harmony.py:273-278) ---------
    @property
    def objective_harmony(self):
        n = int(self.state.n_harmony)
        return list(np.asarray(self.state.obj_harmony[:n], dtype=np.float64))

    @property
    def objective_kmeans(self):
        n = int(self.state.n_kmeans)
        return list(np.asarray(self.state.obj_kmeans[:n], dtype=np.float64))

    @property
    def objective_kmeans_dist(self):
        n = int(self.state.n_kmeans)
        return list(np.asarray(self.state.obj_dist[:n], dtype=np.float64))

    @property
    def objective_kmeans_entropy(self):
        n = int(self.state.n_kmeans)
        return list(np.asarray(self.state.obj_entropy[:n], dtype=np.float64))

    @property
    def objective_kmeans_cross(self):
        n = int(self.state.n_kmeans)
        return list(np.asarray(self.state.obj_cross[:n], dtype=np.float64))

    @property
    def kmeans_rounds(self):
        n = int(self.state.n_rounds)
        return [int(x) for x in np.asarray(self.state.kmeans_rounds[:n])]

    # ---- NumPy-view properties (reference harmony.py:288-355) -----------
    def _cells(self, arr) -> np.ndarray:
        """Strip per-shard cell padding and transpose to cells-first."""
        from .parallel.sharding import unpad_cells
        if getattr(arr, "is_fully_addressable", True) is False:
            # Multi-host run: assemble the global array across processes
            # before converting (np.asarray on a cross-process jax.Array
            # raises "spans non-addressable devices").
            from jax.experimental import multihost_utils
            arr = multihost_utils.process_allgather(arr, tiled=True)
        return unpad_cells(np.asarray(arr), self.cfg).T

    @property
    def Z_corr(self):
        """Corrected embedding (N x d)."""
        return self._cells(self.state.Z_corr)

    @property
    def Z_orig(self):
        """Original embedding (N x d)."""
        return self._cells(self._data.Z_orig)

    @property
    def Z_cos(self):
        """L2-normalized embedding (N x d)."""
        return self._cells(self.state.Z_cos)

    @property
    def R(self):
        """Soft cluster assignments (N x K), float32 regardless of the
        storage dtype (numpy has no native bfloat16). In deferred-R mode the
        values are materialized on demand by replaying the final E-step
        round in bounded chunk windows (never K x N on device)."""
        if self.cfg.defer_r:
            return self._materialize_r()
        return self._cells(self.state.R.astype(jax.numpy.float32))

    def _materialize_r(self) -> np.ndarray:
        return materialize_r(self._engine, self.cfg, self.state,
                             self._data, self._params)

    @property
    def Y(self):
        """Cluster centroids (d x K)."""
        return np.asarray(self.state.Y)

    @property
    def O(self):
        """Observed batch-cluster counts (K x B)."""
        return np.asarray(self.state.O)

    @property
    def E(self):
        """Expected batch-cluster counts (K x B)."""
        return np.asarray(self.state.E)

    @property
    def Phi(self):
        """Batch indicator matrix (N x B)."""
        return self._cells(self._data.Phi)

    @property
    def Phi_moe(self):
        """Batch indicator with intercept column (N x (B+1))."""
        return np.concatenate(
            [np.ones((self.N, 1), np.float32), self.Phi], axis=1)

    @property
    def Pr_b(self):
        return np.asarray(self._params.Pr_b)

    @property
    def theta(self):
        return np.asarray(self._params.theta)

    @property
    def sigma(self):
        return np.asarray(self._params.sigma)

    @property
    def lamb(self):
        return self._lamb_raw

    def result(self):
        """Corrected data as a NumPy array (N x d)."""
        return self.Z_corr


def materialize_r(engine, cfg, state, data, params) -> np.ndarray:
    """Page a deferred-R fit's soft assignments to the host: replay the
    final E-step round in bounded chunk windows (never K x N on device),
    one dispatch per window; device peak ~ width * chunk_size * K floats
    per shard. Works on any mesh — non-addressable windows (multi-process
    runs) are gathered collectively, so every process must call this
    together (Harmony.R does). Module-level so the multi-host smoke drives
    the exact code path the Harmony.R property uses."""
    from .ops.partition import partition_geometry
    geom = partition_geometry(cfg)
    D, CH, K = cfg.n_devices, geom.CH, cfg.K
    width = max(1, min(geom.nc_cap,
                       int(64 * 1024 * 1024 // max(CH * K, 1))))
    fn = engine.r_window_fn(width)
    out = np.zeros((K, cfg.N_pad), np.float32)
    for lo in range(0, geom.nc_cap, width):
        Rw = fn(state, data, params, jax.numpy.int32(lo))
        if getattr(Rw, "is_fully_addressable", True) is False:
            from jax.experimental import multihost_utils
            Rw = multihost_utils.process_allgather(Rw, tiled=True)
        Rw = np.asarray(Rw).astype(np.float32)
        # Global rows: shard s's window chunks live at s*width + w.
        for s in range(D):
            for w in range(min(width, geom.nc_cap - lo)):
                c = lo + w
                cell0 = s * cfg.N_local + c * CH
                out[:, cell0: cell0 + CH] = Rw[s * width + w]
    from .parallel.sharding import unpad_cells
    return unpad_cells(out, cfg).T
