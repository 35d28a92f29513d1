"""1M-doc sparse/BM25 retrieval validation: exactness + throughput.

Mirrors the dense ANN scale harness (`scripts/ann_scale_bench.py`) for the
sparse path, against the reference's Wikipedia-SPLADE / MS-MARCO bench
shape (`rust/benchmark/src/datasets/wikipedia_splade.rs`,
`ms_marco_queries.rs`): a seeded ~1M-doc learned-sparse corpus
(sparse_benchdata.py), the persisted term-bucket index built over it, and
the bucket-pruned top-k checked for EXACT equality against the inline
exact dot-product scorer — with and without IDF scaling — plus build time
and batch/single-query latencies.

Usage:
    python scripts/sparse_scale_bench.py               # full 1M run
    python scripts/sparse_scale_bench.py --n 100000    # smoke run

Outputs `.sparse_scale/results_n{N}.json` and prints a markdown table for
BASELINE.md. Everything lands in the gitignored `.sparse_scale/` dir.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sparse_scale"
)


def _collect(df):
    return sorted((int(r["query_id"]), r["id"], float(r["score"])) for r in df.collect())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--nq", type=int, default=200)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-buckets", type=int, default=256)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()

    from chroma_spark.operators.sparse import (
        _dot_topk,
        read_sparse_index,
        sparse_index_topk,
        write_sparse_index,
    )
    from chroma_spark.session import get_spark
    from chroma_spark.sparse_benchdata import gen_sparse_postings, gen_sparse_queries

    tag = f"n{args.n}"
    corpus_dir = os.path.join(BASE, f"postings_{tag}")
    queries_dir = os.path.join(BASE, f"queries_{tag}")
    index_dir = os.path.join(BASE, f"index_{tag}_b{args.n_buckets}")

    t0 = time.time()
    gen_sparse_postings(corpus_dir, args.n, args.seed)
    gen_sparse_queries(queries_dir, args.nq, args.seed)
    t_gen = time.time() - t0

    spark = get_spark("sparse-scale-bench")
    postings = spark.read.parquet(corpus_dir)
    n_postings = postings.count()
    n_docs = float(args.n)

    # index build (the sparse-segment write of a compaction)
    marker = os.path.join(index_dir, "_BUILT.json")
    if not os.path.exists(marker):
        t0 = time.time()
        write_sparse_index(postings, index_dir, n_buckets=args.n_buckets)
        t_build = time.time() - t0
        with open(marker, "w") as f:
            json.dump({"seconds": t_build}, f)
    else:
        with open(marker) as f:
            t_build = json.load(f)["seconds"]
    indexed = read_sparse_index(spark, index_dir)

    queries = spark.read.parquet(os.path.join(queries_dir, "queries.parquet"))
    q_indices = [
        int(i) for r in queries.select("sparse.indices").collect() for i in r[0]
    ]
    qpost = queries.select(
        "query_id",
        F.explode(F.arrays_zip(F.col("sparse.indices").alias("idx"),
                               F.col("sparse.values").alias("val"))).alias("p"),
    ).select("query_id", F.col("p.idx").alias("idx"), F.col("p.val").alias("q_w"))

    results = {"n_docs": args.n, "n_postings": int(n_postings), "nq": args.nq,
               "k": args.k, "n_buckets": args.n_buckets, "gen_seconds": round(t_gen, 1),
               "build_seconds": round(t_build, 1), "modes": {}}

    for idf in (False, True):
        mode = "bm25_idf" if idf else "dot"
        exact = _collect(
            _dot_topk(postings, qpost, args.k, 6,
                      idf_from=postings if idf else None, n_docs=n_docs if idf else None)
        )
        # warm + measure the indexed (bucket-pruned) path
        times = []
        for _ in range(3):
            t0 = time.time()
            got = _collect(
                sparse_index_topk(indexed, queries, k=args.k, n_buckets=args.n_buckets,
                                  idf=idf, n_docs=n_docs if idf else None,
                                  query_indices=q_indices)
            )
            times.append(time.time() - t0)
        match = got == exact
        # single-query latency: term-count-proportional bucket reads
        one = queries.limit(1)
        one_idx = [int(i) for i in one.select("sparse.indices").first()[0]]
        t_one = []
        for _ in range(3):
            t0 = time.time()
            sparse_index_topk(indexed, one, k=args.k, n_buckets=args.n_buckets,
                              idf=idf, n_docs=n_docs if idf else None,
                              query_indices=one_idx).collect()
            t_one.append(time.time() - t0)
        results["modes"][mode] = {
            "exact_match": bool(match),
            "result_rows": len(got),
            "batch_seconds": round(sorted(times)[1], 2),
            "s_per_query": round(sorted(times)[1] / args.nq, 4),
            "single_query_seconds": round(sorted(t_one)[1], 2),
        }
        print(f"[{mode}] exact_match={match} rows={len(got)} "
              f"batch={sorted(times)[1]:.2f}s single={sorted(t_one)[1]:.2f}s")
        if not match:
            diff = [(a, b) for a, b in zip(got, exact) if a != b][:5]
            print("  first diffs:", diff)

    out = os.path.join(BASE, f"results_{tag}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    print(f"\n| n_docs | postings | build s | mode | exact | batch s ({args.nq}q) | s/query | single q s |")
    print("|---|---|---|---|---|---|---|---|")
    for mode, m in results["modes"].items():
        print(f"| {args.n:,} | {n_postings:,} | {results['build_seconds']} | {mode} | "
              f"{'yes' if m['exact_match'] else 'NO'} | {m['batch_seconds']} | "
              f"{m['s_per_query']} | {m['single_query_seconds']} |")
    spark.stop()


if __name__ == "__main__":
    main()
