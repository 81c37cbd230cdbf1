"""Checkpoint / resume: interrupted fits continue bitwise-identically
(the RNG key is part of the state pytree, so the continuation replays the
exact block permutations the uninterrupted run would have used)."""

import numpy as np
import pandas as pd

import harmonypy_tpu as hm
from harmonypy_tpu.parallel.mesh import make_mesh
from harmonypy_tpu.utils.checkpoint import load_state, save_state

from conftest import synthetic_batched


def _problem():
    X, batches, _ = synthetic_batched(n_cells=500, d=8)
    meta = pd.DataFrame({"donor": [f"d{b}" for b in batches]})
    return X, meta


def test_state_roundtrip(tmp_path):
    X, meta = _problem()
    mesh = make_mesh(n_devices=4)
    ho = hm.run_harmony(X, meta, ["donor"], mesh=mesh, verbose=False,
                        max_iter_harmony=2)
    path = str(tmp_path / "s.npz")
    save_state(path, ho.state)
    loaded = load_state(path)
    for a, b in zip(ho.state, loaded):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_matches_uninterrupted(tmp_path):
    X, meta = _problem()
    mesh = make_mesh(n_devices=4)

    # The checkpointing run is also the uninterrupted oracle: it snapshots
    # after every iteration (history buffer shapes are part of the engine
    # geometry, so the resumed run uses the same max_iter_harmony).
    ckpt = str(tmp_path)
    full = hm.run_harmony(X, meta, ["donor"], mesh=mesh, verbose=True,
                          max_iter_harmony=4, random_state=3,
                          checkpoint_dir=ckpt)
    resumed = hm.run_harmony(X, meta, ["donor"], mesh=mesh, verbose=True,
                             max_iter_harmony=4, random_state=3,
                             resume_from=f"{ckpt}/harmony_iter_2.npz")

    np.testing.assert_array_equal(full.Z_corr, resumed.Z_corr)
    np.testing.assert_allclose(full.objective_harmony,
                               resumed.objective_harmony)


def test_checkpoint_low_memory_roundtrip(tmp_path):
    """low_memory (bfloat16-stored R) checkpoints survive save/load/resume —
    np.savez alone would serialize bfloat16 as opaque void bytes."""
    X, meta = _problem()
    mesh = make_mesh(n_devices=4)
    ckpt = str(tmp_path)
    full = hm.run_harmony(X, meta, ["donor"], mesh=mesh, verbose=True,
                          max_iter_harmony=4, random_state=3,
                          low_memory=True, checkpoint_dir=ckpt)
    loaded = load_state(f"{ckpt}/harmony_iter_2.npz")
    assert str(np.asarray(loaded.R).dtype) == "bfloat16"
    resumed = hm.run_harmony(X, meta, ["donor"], mesh=mesh, verbose=True,
                             max_iter_harmony=4, random_state=3,
                             low_memory=True,
                             resume_from=f"{ckpt}/harmony_iter_2.npz")
    np.testing.assert_array_equal(full.Z_corr, resumed.Z_corr)


def test_resume_from_pre_cache_checkpoint(tmp_path):
    """Checkpoints written before HarmonyState gained the cache field still
    resume (the cache is rebuilt from R/Phi)."""
    X, meta = _problem()
    mesh = make_mesh(n_devices=4)
    ckpt = str(tmp_path)
    full = hm.run_harmony(X, meta, ["donor"], mesh=mesh, verbose=True,
                          max_iter_harmony=4, random_state=3,
                          checkpoint_dir=ckpt)
    # Strip the trailing cache field AND the dtype sidecar to simulate the
    # old format.
    with np.load(f"{ckpt}/harmony_iter_2.npz") as z:
        fkeys = sorted((f for f in z.files if f.startswith("f")),
                       key=lambda s: int(s[1:]))
        arrays = {f: z[f] for f in fkeys[:-1]}
    np.savez(f"{ckpt}/legacy.npz", **arrays)

    resumed = hm.run_harmony(X, meta, ["donor"], mesh=mesh, verbose=True,
                             max_iter_harmony=4, random_state=3,
                             resume_from=f"{ckpt}/legacy.npz")
    np.testing.assert_array_equal(full.Z_corr, resumed.Z_corr)
