"""CLI smoke tests: correct + lisi subcommands, file in / file out."""

import numpy as np
import pandas as pd
import pytest

from harmonypy_tpu.__main__ import main as cli_main

from conftest import synthetic_batched


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    X, batches, groups = synthetic_batched(n_cells=400, d=8)
    pcs = d / "pcs.npy"
    np.save(pcs, X)
    meta = d / "meta.tsv"
    pd.DataFrame({"donor": [f"d{b}" for b in batches],
                  "group": [f"g{g}" for g in groups]}).to_csv(
        meta, sep="\t", index=False)
    return d, str(pcs), str(meta), X


def test_cli_correct(files, capsys):
    d, pcs, meta, X = files
    out = str(d / "corrected.npy")
    cli_main(["correct", "--pcs", pcs, "--meta", meta, "--vars", "donor",
              "--out", out, "--max-iter-harmony", "2", "--quiet"])
    Z = np.load(out)
    assert Z.shape == X.shape
    assert np.all(np.isfinite(Z))
    assert "wrote" in capsys.readouterr().out


def test_cli_lisi(files, capsys):
    d, pcs, meta, X = files
    out = str(d / "lisi.tsv")
    cli_main(["lisi", "--x", pcs, "--meta", meta, "--labels", "donor,group",
              "--out", out])
    lisi = pd.read_csv(out, sep="\t")
    assert list(lisi.columns) == ["donor", "group"]
    assert lisi.shape == (X.shape[0], 2)
    # LISI range sanity: 1 <= lisi <= #categories
    assert (lisi["donor"] >= 1 - 1e-6).all()
    assert (lisi["donor"] <= 3 + 1e-6).all()

    # the other --knn modes run and match the exact values
    for mode, exact in (("approx", False), ("brute", True),
                        ("pruned", True)):
        out2 = str(d / f"lisi_{mode}.tsv")
        cli_main(["lisi", "--x", pcs, "--meta", meta, "--labels", "donor",
                  "--knn", mode, "--out", out2])
        la = pd.read_csv(out2, sep="\t")
        assert (la["donor"] >= 1 - 1e-6).all()
        if exact:
            np.testing.assert_allclose(la["donor"], lisi["donor"],
                                       rtol=1e-4, atol=1e-4)


def test_harmony_integrate_helper():
    """scanpy-style entry point works on any AnnData-like object."""
    import types
    from harmonypy_tpu.integrate import harmony_integrate
    from harmonypy_tpu.parallel.mesh import make_mesh

    X, batches, _ = synthetic_batched(n_cells=300, d=6)
    adata = types.SimpleNamespace(
        obsm={"X_pca": X},
        obs=pd.DataFrame({"donor": [f"d{b}" for b in batches]}))
    ho = harmony_integrate(adata, "donor", mesh=make_mesh(n_devices=2),
                           verbose=False, max_iter_harmony=2)
    assert adata.obsm["X_pca_harmony"].shape == X.shape
    np.testing.assert_array_equal(adata.obsm["X_pca_harmony"], ho.Z_corr)


def test_cli_device_flag(files):
    """--device selects the platform on both subcommands (round-4 addition:
    run_harmony always had device=; the CLI now exposes it)."""
    d, pcs, meta, X = files
    out = str(d / "corrected_dev.npy")
    cli_main(["correct", "--pcs", pcs, "--meta", meta, "--vars", "donor",
              "--out", out, "--max-iter-harmony", "1", "--quiet",
              "--device", "cpu"])
    assert np.load(out).shape == X.shape
    out2 = str(d / "lisi_dev.tsv")
    cli_main(["lisi", "--x", out, "--meta", meta, "--labels", "donor",
              "--device", "cpu", "--out", out2])
    la = pd.read_csv(out2, sep="\t")
    assert la.shape[0] == X.shape[0]
