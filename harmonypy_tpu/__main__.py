"""Command-line interface: run Harmony correction / LISI evaluation on files.

The reference is library-only (its closest analog is the benchmark __main__
path of tests/test_harmony.py:152-200). For production TPU use a file-in /
file-out entry point matters: each pod host launches the same command (every
host parses the input once; io/loader.load_sharded_data is the lower-level
API when you want per-host shard assembly), and results are written once
from process 0.

Usage:
  python -m harmonypy_tpu correct --pcs pcs.tsv.gz --meta meta.tsv.gz \
      --vars donor [--out corrected.npy] [--theta 2.0] [--sigma 0.1] ...
  python -m harmonypy_tpu lisi --x corrected.npy --meta meta.tsv.gz \
      --labels donor,cell_type [--out lisi.tsv]
  python -m harmonypy_tpu bench [small medium lisi large]
"""

from __future__ import annotations

import argparse
import sys
import time


def _add_correct(sub):
    p = sub.add_parser("correct", help="run Harmony batch correction")
    p.add_argument("--pcs", required=True,
                   help="embedding matrix (.tsv[.gz]/.csv/.npy/.npz/.parquet),"
                        " cells x PCs")
    p.add_argument("--meta", required=True, help="metadata table (.tsv[.gz])")
    p.add_argument("--vars", required=True,
                   help="comma-separated batch variable column names")
    p.add_argument("--out", default="harmony_corrected.npy")
    p.add_argument("--theta", type=float, default=None)
    p.add_argument("--lamb", type=float, default=None)
    p.add_argument("--sigma", type=float, default=0.1)
    p.add_argument("--nclust", type=int, default=None)
    p.add_argument("--tau", type=float, default=0)
    p.add_argument("--block-size", type=float, default=0.05)
    p.add_argument("--max-iter-harmony", type=int, default=10)
    p.add_argument("--max-iter-kmeans", type=int, default=20)
    p.add_argument("--random-state", type=int, default=0)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--device", default=None,
                   help="JAX platform string (e.g. tpu, cpu, tpu:0); "
                        "default = the default JAX backend's devices")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address for "
                        "jax.distributed.initialize")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)


def _add_lisi(sub):
    p = sub.add_parser("lisi", help="compute LISI mixing metric")
    p.add_argument("--x", required=True, help="embedding (cells x dims)")
    p.add_argument("--meta", required=True)
    p.add_argument("--labels", required=True,
                   help="comma-separated label column names")
    p.add_argument("--perplexity", type=float, default=30)
    p.add_argument("--sample", type=int, default=None,
                   help="evaluate LISI at this many sampled query cells "
                        "(exact values; neighbors come from all cells) — "
                        "use for atlas-scale inputs where all-pairs kNN is "
                        "quadratic")
    p.add_argument("--knn", choices=["exact", "brute", "pruned", "approx"],
                   default="exact",
                   help="neighbor search: exact (reference semantics; "
                        "auto-picks brute force or the sub-quadratic "
                        "cluster-pruned search above 100k cells), brute/"
                        "pruned to force one exact algorithm, or approx — "
                        "the TPU's hardware approximate top-k "
                        "(recall ~0.95)")
    p.add_argument("--knn-recall", type=float, default=0.95,
                   help="per-tile recall target for --knn approx "
                        "(0 < r <= 1; higher = more accurate, slower)")
    p.add_argument("--device", default=None,
                   help="JAX platform string (e.g. tpu, cpu); the search "
                        "is parallelized over all devices of the platform")
    p.add_argument("--out", default=None, help="output TSV (default: stdout)")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="harmonypy_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)
    _add_correct(sub)
    _add_lisi(sub)
    sub.add_parser("bench", help="run the tiered benchmark harness"
                   ).add_argument("tiers", nargs="*")
    args = parser.parse_args(argv)

    import numpy as np
    import pandas as pd

    if args.cmd == "bench":
        try:
            from benchmarks.run_benchmarks import main as bench_main
        except ImportError:
            sys.exit("the bench subcommand needs a repository checkout "
                     "(benchmarks/ is not part of the installed package)")
        bench_main(args.tiers or ["small", "medium", "lisi", "large"])
        return

    if args.cmd == "lisi":
        from .io import load_matrix
        from .lisi import compute_lisi
        X = load_matrix(args.x)
        meta = pd.read_csv(args.meta, sep="\t")
        labels = args.labels.split(",")
        mesh = None
        if args.device is not None:
            from .parallel.mesh import default_mesh
            mesh = default_mesh(args.device)
        t0 = time.time()
        out = compute_lisi(X, meta, labels, perplexity=args.perplexity,
                           sample=args.sample, knn=args.knn,
                           knn_recall_target=args.knn_recall, mesh=mesh)
        if isinstance(out, tuple):
            lisi, qidx = out
            df = pd.DataFrame(lisi, columns=labels)
            df.insert(0, "cell_index", qidx)
        else:
            df = pd.DataFrame(out, columns=labels)
        if args.out:
            df.to_csv(args.out, sep="\t", index=False)
            print(f"wrote {args.out} ({time.time() - t0:.2f}s)")
        else:
            df.to_csv(sys.stdout, sep="\t", index=False)
        return

    # correct
    if args.coordinator is not None:
        from .parallel.mesh import initialize_distributed
        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)
    import jax
    from . import run_harmony
    from .io import load_matrix

    meta = pd.read_csv(args.meta, sep="\t")
    X = load_matrix(args.pcs)
    t0 = time.time()
    ho = run_harmony(
        X, meta, args.vars.split(","),
        theta=args.theta, lamb=args.lamb, sigma=args.sigma,
        nclust=args.nclust, tau=args.tau, block_size=args.block_size,
        max_iter_harmony=args.max_iter_harmony,
        max_iter_kmeans=args.max_iter_kmeans,
        random_state=args.random_state,
        checkpoint_dir=args.checkpoint_dir,
        device=args.device,
        verbose=not args.quiet,
    )
    if jax.process_index() == 0:
        out = args.out
        if out.endswith(".npy"):
            np.save(out, ho.Z_corr)
        else:
            pd.DataFrame(ho.Z_corr).to_csv(out, sep="\t", index=False)
        print(f"wrote {out}: {ho.Z_corr.shape[0]} cells x "
              f"{ho.Z_corr.shape[1]} PCs in {time.time() - t0:.2f}s "
              f"({len(ho.objective_harmony) - 1} harmony iterations)")


if __name__ == "__main__":
    main()
