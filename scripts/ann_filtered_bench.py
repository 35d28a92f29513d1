"""Filtered-ANN recall at 1M scale: filter-before-ANN under selective
predicates (the reference's filtered ann_accuracy invariant,
`chromadb/test/property/invariants.py`, over the SIFT1M-scale corpus).

Reuses the `.ann_scale/` corpus + IVF layout from ann_scale_bench.py. For
each selectivity (fraction of ids passing the filter, `id % 100 < r`), the
exact ground truth is recomputed over the FILTERED corpus and
`ivf_search(allowed_ids=...)` recall is swept over nprobe — the classic
filtered-ANN effect (a selective filter thins every probed list, so
matching unfiltered recall needs more probes) measured, not guessed.

Usage: python scripts/ann_filtered_bench.py [--n 1000000]
Writes `.ann_scale/results_filtered_n{N}.json` + a markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".ann_scale")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--grid-nq", type=int, default=200)
    ap.add_argument("--selectivities", default="50,10,1",
                    help="comma r values for id %% 100 < r")
    ap.add_argument("--nprobes", default="8,16,32,64")
    args = ap.parse_args()

    from chroma_spark.ann.benchdata import ground_truth, recall_against_gt
    from chroma_spark.ann.ivf import ivf_search, read_ivf
    from chroma_spark.session import get_spark

    tag = f"n{args.n}"
    corpus_dir = os.path.join(BASE, f"corpus_{tag}")
    queries_dir = os.path.join(BASE, f"queries_{tag}")
    index_dir = os.path.join(BASE, f"ivf_{tag}")
    for d in (corpus_dir, queries_dir, index_dir):
        if not os.path.isdir(d):
            raise SystemExit(f"missing {d}; run scripts/ann_scale_bench.py first")

    spark = get_spark("ann-filtered-bench")
    centroids, postings = read_ivf(spark, index_dir)
    postings = postings.persist()
    queries = (
        spark.read.parquet(os.path.join(queries_dir, "queries.parquet"))
        .limit(args.grid_nq)
        .cache()
    )
    qids = {int(r["query_id"]) for r in queries.select("query_id").collect()}
    corpus_ids = spark.read.parquet(corpus_dir).select("id")

    results = {"n": args.n, "k": args.k, "nq": args.grid_nq, "rows": []}
    for r in [int(x) for x in args.selectivities.split(",")]:
        gt = ground_truth(corpus_dir, queries_dir, args.k, id_mod=(100, r))
        allowed = corpus_ids.filter((F.col("id") % 100) < r)
        for nprobe in [int(x) for x in args.nprobes.split(",")]:
            t0 = time.time()
            rows = ivf_search(
                centroids, postings, queries, k=args.k, nprobe=nprobe,
                allowed_ids=allowed,
            ).collect()
            dt = time.time() - t0
            rec = recall_against_gt(
                [{"query_id": x["query_id"], "id": x["id"], "rank": x["rank"]} for x in rows],
                gt, args.k, query_ids=qids,
            )
            row = {"selectivity_pct": r, "nprobe": nprobe,
                   "recall": round(rec, 4), "batch_seconds": round(dt, 2)}
            results["rows"].append(row)
            print(f"# sel={r}% nprobe={nprobe}: recall@{args.k}={rec:.4f} ({dt:.1f}s)")

    out = os.path.join(BASE, f"results_filtered_{tag}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    print(f"\n| selectivity | nprobe | recall@{args.k} | batch s ({args.grid_nq}q) |")
    print("|---|---|---|---|")
    for row in results["rows"]:
        print(f"| {row['selectivity_pct']}% | {row['nprobe']} | {row['recall']} | {row['batch_seconds']} |")
    spark.stop()


if __name__ == "__main__":
    main()
