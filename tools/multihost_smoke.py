"""Two-process multi-host smoke test (no TPU pod needed).

Launches two OS processes that form a real jax.distributed cluster over
localhost (CPU backend, 4 virtual devices each => an 8-device global mesh
spanning 2 "hosts"), then runs the full user workflow exactly as a pod
would:

  - per-host sharded ingest (io.load_sharded_data: each process parses the
    embedding file once and uploads only its devices' cell ranges),
  - the sharded Harmony fit through the engine,
  - cross-process result readback (Harmony properties allgather),

and checks on process 0 that the corrected embedding is BITWISE equal to a
single-process 8-device run of the same problem (same algorithm, different
process topology — the fused path's fixed-frame reductions are order-free,
see ops/partition.py).

Usage:  python tools/multihost_smoke.py            # parent: spawns workers
        (exit 0 = pass)
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# The parent process imports harmonypy_tpu too (_check); running this file
# as a script puts tools/ on sys.path, not the repo root, so add it
# explicitly (workers get it via PYTHONPATH below).
if REPO not in sys.path:
    sys.path.insert(0, REPO)
N, D, B = 4000, 8, 3
# Per-run port so a killed/failed previous run can't poison this one with a
# stale coordinator; workers inherit it via the environment.
PORT = int(os.environ.get("MULTIHOST_SMOKE_PORT",
                          str(20000 + os.getpid() % 10000)))


def make_data(tmp):
    import gzip
    import numpy as np
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(5, D)) * 4
    g = rng.integers(0, 5, N)
    b = rng.integers(0, B, N)
    shifts = rng.normal(size=(B, D)) * 2
    X = (centers[g] + shifts[b] + rng.normal(size=(N, D))).astype("float32")
    pcs = os.path.join(tmp, "pcs.tsv.gz")
    with gzip.open(pcs, "wt") as f:
        f.write("\t".join(f"PC{i}" for i in range(D)) + "\n")
        for row in X:
            f.write("\t".join(f"{v:.6f}" for v in row) + "\n")
    meta = os.path.join(tmp, "meta.tsv")
    with open(meta, "w") as f:
        f.write("donor\n")
        for bi in b:
            f.write(f"d{bi}\n")
    return pcs, meta


def _enable_compile_cache(tmp: str, phase: str):
    """Per-PHASE persistent compile cache: processes within one topology
    phase (e.g. the two 2-proc workers) share a cache, but the 2-proc,
    4-proc and single-process phases each get their own subdirectory, so
    every topology compiles its executables fresh — the cross-topology
    bitwise assertions verify independent compilations, not a cache replay
    of the same executable bytes (the same reason conftest.py makes its
    cache opt-in). The caches live inside the run's tmp dir and die with
    it."""
    import jax
    from jax.experimental.compilation_cache import compilation_cache as cc
    cc.set_cache_dir(os.path.join(tmp, f"jax_cache_{phase}"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def worker(pid: int, tmp: str, nproc: int = 2):
    # 8 global devices split across nproc processes (2-proc full suite;
    # 4-proc deferred-only topology check — VERDICT r3 #9).
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={8 // nproc}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache(tmp, f"{nproc}proc")
    jax.distributed.initialize(f"localhost:{PORT}", num_processes=nproc,
                               process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())

    import numpy as np
    import pandas as pd
    import harmonypy_tpu as hm
    from harmonypy_tpu.config import EngineConfig, default_nclust
    from harmonypy_tpu.engine import get_engine
    from harmonypy_tpu.io import load_sharded_data
    from harmonypy_tpu.parallel.mesh import make_mesh
    from harmonypy_tpu.parallel.sharding import unpad_cells
    from harmonypy_tpu.state import HarmonyParams

    pcs, meta_p = os.path.join(tmp, "pcs.tsv.gz"), os.path.join(tmp, "meta.tsv")
    meta = pd.read_csv(meta_p, sep="\t")
    mesh = make_mesh()                     # all 8 devices across 2 processes

    # chunk_size=128 puts N=4000 on the fused-XLA path (32 chunks >= 20
    # blocks) — the production path, whose fixed-frame reductions make the
    # result BITWISE identical across process topologies (ops/partition.py).
    # defer_r=True matches the library's default storage strategy
    # (api.run_harmony defers R on fused geometry); the stored-R variant is
    # exercised separately below.
    cfg = EngineConfig(N=N, d=D, K=default_nclust(N), B=B, n_devices=8,
                       use_fused_xla=True, chunk_size=128, max_iter_harmony=3,
                       defer_r=True)
    data, cfg, n, (Pr_b, phi_n) = load_sharded_data(pcs, meta, "donor", mesh,
                                                    cfg=cfg)
    assert n == N and cfg.n_devices == 8 and cfg.use_fused_xla
    engine = get_engine(cfg, mesh)
    params = HarmonyParams(
        theta=jax.numpy.full((B,), 2.0, jax.numpy.float32),
        sigma=jax.numpy.full((cfg.K,), 0.1, jax.numpy.float32),
        lamb=jax.numpy.asarray([0.0] + [1.0] * B, jax.numpy.float32),
        Pr_b=jax.numpy.asarray(Pr_b, jax.numpy.float32))
    state = engine.fit_fn(data, params, jax.random.PRNGKey(0))

    # Cross-process readback (the path Harmony properties use).
    from jax.experimental import multihost_utils
    Z_corr = unpad_cells(
        np.asarray(multihost_utils.process_allgather(state.Z_corr,
                                                     tiled=True)), cfg).T

    # Deferred .R materialization ACROSS the cluster (VERDICT r3 #9): the
    # paged replay windows are non-addressable here, so materialize_r's
    # collective allgather path runs for real — the exact code the
    # Harmony.R property uses. Every process participates.
    from harmonypy_tpu.api import materialize_r
    R_multi = materialize_r(engine, cfg, state, data, params)
    suffix = "" if nproc == 2 else str(nproc)
    if pid == 0:
        np.save(os.path.join(tmp, f"multi{suffix}_R.npy"), R_multi)

    if nproc != 2:
        # Minimal topology variant: deferred fit + replay only.
        if pid == 0:
            np.save(os.path.join(tmp, f"multi{suffix}.npy"), Z_corr)
        jax.distributed.shutdown()
        return

    # Checkpoint + resume ACROSS the 2-process cluster: save_state gathers
    # non-addressable leaves collectively and writes from process 0 only;
    # resume re-uploads the global snapshot onto the same mesh. The resumed
    # continuation must be bitwise-identical to the uninterrupted one.
    from jax.sharding import NamedSharding, PartitionSpec
    from harmonypy_tpu.utils.checkpoint import load_state, save_state
    s = engine.init_fn(data, params, jax.random.PRNGKey(0))
    for i in range(1, 4):
        s = engine.iter_fn(s, data, params)
        save_state(os.path.join(tmp, f"ckpt_{i}.npz"), s)
    multihost_utils.sync_global_devices("checkpoints written")
    Z_cont = np.asarray(multihost_utils.process_allgather(s.Z_corr,
                                                          tiled=True))
    loaded = load_state(os.path.join(tmp, "ckpt_1.npz"))
    shardings = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), engine.state_specs,
        is_leaf=lambda x: isinstance(x, PartitionSpec))
    rs = jax.device_put(loaded, shardings)
    assert int(rs.n_rounds) == 1
    for i in range(2, 4):
        rs = engine.iter_fn(rs, data, params)
    Z_res = np.asarray(multihost_utils.process_allgather(rs.Z_corr,
                                                         tiled=True))
    np.testing.assert_array_equal(Z_cont, Z_res)
    if pid == 0:
        print("checkpoint+resume across 2 processes: bitwise OK")
    if pid == 0:
        np.save(os.path.join(tmp, "multi.npy"), Z_corr)
        obj = np.asarray(state.obj_harmony[: int(state.n_harmony)])
        print(f"worker0: N={n} iters={int(state.n_rounds)} "
              f"objective {obj[0]:.2f} -> {obj[-1]:.2f}")

    # STORED-R fused path across processes (defer_r=False): same fixed-frame
    # reductions, R materialized — must also be bitwise across topologies.
    cfg_st = EngineConfig(N=N, d=D, K=default_nclust(N), B=B, n_devices=8,
                          use_fused_xla=True, chunk_size=128,
                          max_iter_harmony=2)
    data_st, cfg_st, _, _ = load_sharded_data(pcs, meta, "donor", mesh,
                                              cfg=cfg_st)
    st_st = get_engine(cfg_st, mesh).fit_fn(data_st, params,
                                            jax.random.PRNGKey(0))
    Zst = unpad_cells(
        np.asarray(multihost_utils.process_allgather(st_st.Z_corr,
                                                     tiled=True)),
        cfg_st).T
    if pid == 0:
        np.save(os.path.join(tmp, "multi_stored.npy"), Zst)

    # PER-CELL path across processes (default chunk geometry at N=4000):
    # its per-block psums reduce shard partials, so cross-process Gloo
    # reduction order makes this reduction-order tight, not bitwise.
    cfg_pc = EngineConfig(N=N, d=D, K=default_nclust(N), B=B, n_devices=8,
                          max_iter_harmony=2)
    assert not cfg_pc.fused_estep
    data_pc, cfg_pc, _, _ = load_sharded_data(pcs, meta, "donor", mesh,
                                              cfg=cfg_pc)
    st_pc = get_engine(cfg_pc, mesh).fit_fn(data_pc, params,
                                            jax.random.PRNGKey(0))
    # process_allgather is a collective: every process participates.
    Zpc = unpad_cells(
        np.asarray(multihost_utils.process_allgather(st_pc.Z_corr,
                                                     tiled=True)),
        cfg_pc).T
    if pid == 0:
        np.save(os.path.join(tmp, "multi_percell.npy"), Zpc)
    jax.distributed.shutdown()


def single(tmp: str):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache(tmp, "single")
    import numpy as np
    import pandas as pd
    import harmonypy_tpu as hm
    from harmonypy_tpu.io import load_matrix_tsv
    from harmonypy_tpu.parallel.mesh import make_mesh

    meta = pd.read_csv(os.path.join(tmp, "meta.tsv"), sep="\t")
    X = load_matrix_tsv(os.path.join(tmp, "pcs.tsv.gz"))
    ho = hm.run_harmony(X, meta, ["donor"], mesh=make_mesh(n_devices=8),
                        verbose=False, max_iter_harmony=3, chunk_size=128)
    assert ho.cfg.use_fused_xla and ho.cfg.defer_r  # the library default
    np.save(os.path.join(tmp, "single.npy"), ho.Z_corr)
    # Deferred .R via the property (paged replay, single process).
    np.save(os.path.join(tmp, "single_R.npy"), ho.R)

    hs = hm.run_harmony(X, meta, ["donor"], mesh=make_mesh(n_devices=8),
                        verbose=False, max_iter_harmony=2, chunk_size=128,
                        defer_r=False)
    assert hs.cfg.use_fused_xla and not hs.cfg.defer_r
    np.save(os.path.join(tmp, "single_stored.npy"), hs.Z_corr)

    hp = hm.run_harmony(X, meta, ["donor"], mesh=make_mesh(n_devices=8),
                        verbose=False, max_iter_harmony=2)
    assert not hp.cfg.fused_estep
    np.save(os.path.join(tmp, "single_percell.npy"), hp.Z_corr)


def main():
    import shutil
    tmp = tempfile.mkdtemp(prefix="mh_smoke_")
    make_data(tmp)
    env = {**os.environ, "PYTHONPATH": REPO,
           "MULTIHOST_SMOKE_PORT": str(PORT)}
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--worker", str(pid), tmp], env=env)
        for pid in range(2)]
    try:
        codes = [p.wait(timeout=400) for p in procs]
        assert codes == [0, 0], codes
        # 4-process topology (2 devices each): deferred fit + .R replay
        # only — same 8-device global mesh, different process boundaries.
        env4 = {**env, "MULTIHOST_SMOKE_PORT": str(PORT + 1)}
        procs4 = [subprocess.Popen(
            [sys.executable, __file__, "--worker", str(pid), tmp, "4"],
            env=env4) for pid in range(4)]
        try:
            codes4 = [p.wait(timeout=400) for p in procs4]
        finally:
            for p in procs4:
                if p.poll() is None:
                    p.kill()
        assert codes4 == [0, 0, 0, 0], codes4
        subprocess.run([sys.executable, __file__, "--single", tmp],
                       env=env, check=True, timeout=240)
        _check(tmp)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        shutil.rmtree(tmp, ignore_errors=True)

def _check(tmp: str):
    import numpy as np
    multi = np.load(os.path.join(tmp, "multi.npy"))
    single_ = np.load(os.path.join(tmp, "single.npy"))
    assert multi.shape == single_.shape == (N, D)
    assert np.all(np.isfinite(multi))
    # Fused-XLA path: every cross-device reduction goes through the fixed
    # global chunk frame (each row written by exactly one shard, psum adds
    # exact zeros — order-free), so the 2-process Gloo topology must produce
    # the EXACT bits of the single-process run.
    np.testing.assert_array_equal(multi, single_)
    print("multi-host vs single-process (fused, deferred-R): bitwise equal")

    # Deferred .R replay: cross-process paged materialization must be
    # bitwise equal to the single-process Harmony.R property (fixed-frame
    # replay reductions; allgather only moves bits).
    m_r = np.load(os.path.join(tmp, "multi_R.npy"))
    s_r = np.load(os.path.join(tmp, "single_R.npy"))
    from harmonypy_tpu.config import default_nclust
    assert m_r.shape == s_r.shape == (N, default_nclust(N))
    np.testing.assert_array_equal(m_r, s_r)
    print("deferred .R replay 2-proc vs single: bitwise equal")

    # 4-process topology: same global mesh, different process boundaries.
    m4 = np.load(os.path.join(tmp, "multi4.npy"))
    np.testing.assert_array_equal(m4, single_)
    m4_r = np.load(os.path.join(tmp, "multi4_R.npy"))
    np.testing.assert_array_equal(m4_r, s_r)
    print("deferred fit + .R replay 4-proc vs single: bitwise equal")

    mst = np.load(os.path.join(tmp, "multi_stored.npy"))
    sst = np.load(os.path.join(tmp, "single_stored.npy"))
    np.testing.assert_array_equal(mst, sst)
    print("multi-host vs single-process (fused, stored-R): bitwise equal")

    # Per-cell path: same global partition, but its per-block O/E psums
    # reduce shard partials, so cross-process Gloo ordering makes this
    # float32-reduction-order tight rather than bitwise.
    mpc = np.load(os.path.join(tmp, "multi_percell.npy"))
    spc = np.load(os.path.join(tmp, "single_percell.npy"))
    scale = float(np.max(np.abs(spc)))
    np.testing.assert_allclose(mpc, spc, atol=5e-4 * scale)
    print("multi-host vs single-process (per-cell): reduction-order tight")
    print("MULTIHOST SMOKE OK")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), sys.argv[3],
               int(sys.argv[4]) if len(sys.argv) > 4 else 2)
    elif len(sys.argv) > 1 and sys.argv[1] == "--single":
        single(sys.argv[2])
    else:
        main()
