"""scanpy-style integration helper.

The reference is consumed by scanpy through
`sc.external.pp.harmony_integrate(adata, key)`, which imports harmonypy and
calls run_harmony on `adata.obsm[basis]` + `adata.obs` (scanpy
external/pp/_harmony_integrate.py). This module provides the same entry
point natively so AnnData workflows can switch without scanpy's wrapper:

    from harmonypy_tpu.integrate import harmony_integrate
    harmony_integrate(adata, "donor")
    adata.obsm["X_pca_harmony"]   # corrected embedding

Works with any AnnData-like object exposing `.obsm` (mapping of arrays) and
`.obs` (DataFrame) — anndata itself is not required.
"""

from __future__ import annotations

from .api import run_harmony


def harmony_integrate(adata, key, *, basis: str = "X_pca",
                      adjusted_basis: str = "X_pca_harmony", **kwargs):
    """Run Harmony on `adata.obsm[basis]` against the `key` column(s) of
    `adata.obs`, storing the corrected embedding in
    `adata.obsm[adjusted_basis]`. Returns the fitted Harmony object (the
    scanpy wrapper discards it; keeping it exposes the objective histories).
    """
    vars_use = [key] if isinstance(key, str) else list(key)
    ho = run_harmony(adata.obsm[basis], adata.obs, vars_use, **kwargs)
    adata.obsm[adjusted_basis] = ho.Z_corr
    return ho
