"""Bundled validation fixtures (GPL-3.0, same license as this package).

Provenance: the upstream harmonypy distribution ships these exact files
in-package (reference MANIFEST.in:1-4, data/*.tsv.gz) so its golden tests
run offline; this package does the same so a fresh clone's golden tier
passes without $HARMONYPY_REF_DATA:

  pbmc_3500_{meta,pcs,pcs_harmonized}.tsv.gz — 3.5k-cell PBMC PCs, metadata,
    and the R Harmony implementation's corrected output (the golden gate:
    per-PC Pearson r >= 0.99 in tests/test_harmony_golden.py).
  lisi_{x,metadata,lisi}.tsv.gz — 400-cell LISI fixture with the R LISI
    package's values (exact-match gate in tests/test_lisi.py).

These are DATA fixtures, not code: they define the cross-implementation
accuracy contract this framework is validated against.
"""

import os

DIR = os.path.dirname(os.path.abspath(__file__))


def path(name: str) -> str:
    """Absolute path of a bundled fixture file (e.g. 'pbmc_3500_pcs.tsv.gz')."""
    return os.path.join(DIR, name)
