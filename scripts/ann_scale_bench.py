"""SIFT1M-scale ANN validation: recall/latency grid for IVF, sign-bit, SQ4.

The reference's ANN bar is SIFT1M (1M x 128-d, k=100, recall >= 0.95 —
`rust/benchmark/src/datasets/sift.rs:104-119`,
`rust/worker/benches/query.rs:144-264`,
`chromadb/test/property/invariants.py:281`). This script builds the IVF
layout at that scale (n_lists ~ sqrt(N)), then sweeps nprobe x rerank_factor
for each quantization tier and records recall@10 / recall@100 against an
exact numpy ground truth, plus build and search wall-times.

Usage:
    python scripts/ann_scale_bench.py                # full 1M run
    python scripts/ann_scale_bench.py --n 100000     # smaller smoke run

Outputs `.ann_scale/results_n{N}.json` and prints a markdown table for
BASELINE.md. Everything lands in the gitignored `.ann_scale/` dir.
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
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--nq", type=int, default=1000, help="queries generated / in ground truth")
    ap.add_argument("--grid-nq", type=int, default=200, help="queries per grid search")
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--tiers", default="ivf,signbit,sq4,pq",
                    help="comma list of tiers to sweep")
    args = ap.parse_args()
    tiers = set(args.tiers.split(","))

    from chroma_spark.ann.benchdata import gen_corpus, gen_queries, ground_truth, recall_against_gt
    from chroma_spark.session import get_spark

    tag = f"n{args.n}"
    corpus_dir = os.path.join(BASE, f"corpus_{tag}")
    queries_dir = os.path.join(BASE, f"queries_{tag}")
    index_dir = os.path.join(BASE, f"ivf_{tag}")

    t0 = time.time()
    gen_corpus(corpus_dir, args.n, args.dim, args.seed)
    gen_queries(queries_dir, args.nq, args.dim, args.seed)
    t_gen = time.time() - t0
    t0 = time.time()
    gt = ground_truth(corpus_dir, queries_dir, args.k)
    t_gt = time.time() - t0
    print(f"corpus+queries {t_gen:.1f}s, ground truth {t_gt:.1f}s", flush=True)

    spark = get_spark("ann-scale-bench")
    records = spark.read.parquet(corpus_dir)
    queries_all = spark.read.parquet(os.path.join(queries_dir, "queries.parquet"))
    grid_q = queries_all.filter(F.col("query_id") < args.grid_nq).cache()
    grid_q.count()
    grid_qids = set(range(args.grid_nq))

    import math

    n_lists = 2 ** round(math.log2(math.sqrt(args.n)))  # ~sqrt(N), power of 2
    results: dict = {
        "n": args.n, "dim": args.dim, "nq_grid": args.grid_nq, "k": args.k,
        "n_lists": n_lists, "replicas": 2, "timings": {}, "grid": [],
    }

    # ---- build ---------------------------------------------------------
    from chroma_spark.ann.ivf import build_ivf, ivf_search, read_ivf
    from chroma_spark.ann.pq import encode_pq, train_pq
    from chroma_spark.ann.quantize import build_codes, build_codes4, dim_means, dim_ranges

    pq_m = args.dim // 8  # 8-dim subspaces -> m bytes/vector at k_codes=256

    layout_marker = os.path.join(index_dir, "_DONE")
    if not os.path.exists(layout_marker):
        t0 = time.time()
        centroids, postings = build_ivf(
            records, n_lists=n_lists, seed=args.seed,
            max_train_sample=131_072, restarts=2, max_iter=15,
            assign_method="arrow",
        )
        results["timings"]["build_train_assign_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        means = dim_means(records)
        ranges = dim_ranges(records)
        books = train_pq(records, m=pq_m, k_codes=256, seed=args.seed)
        coded, _ = build_codes(postings, means)
        coded, _ = build_codes4(coded, ranges)
        coded = encode_pq(coded, books)
        coded.write.mode("overwrite").partitionBy("centroid_id").parquet(
            os.path.join(index_dir, "postings")
        )
        centroids.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(index_dir, "centroids")
        )
        with open(os.path.join(index_dir, "quant.json"), "w") as f:
            json.dump({"means": means, "lo": ranges[0], "step": ranges[1], "pq": books}, f)
        results["timings"]["build_encode_write_s"] = round(time.time() - t0, 1)
        with open(layout_marker, "w") as f:
            f.write("ok")
        print(f"built: train+assign {results['timings']['build_train_assign_s']}s, "
              f"encode+write {results['timings']['build_encode_write_s']}s", flush=True)

    centroids, coded_postings = read_ivf(spark, index_dir)
    with open(os.path.join(index_dir, "quant.json")) as f:
        quant = json.load(f)
    if "pq" not in quant:  # migrate a layout built before the PQ tier
        quant["pq"] = train_pq(records, m=pq_m, k_codes=256, seed=args.seed)
        t0 = time.time()
        tmp = os.path.join(index_dir, "postings_pq")
        encode_pq(coded_postings, quant["pq"]).write.mode("overwrite").partitionBy(
            "centroid_id"
        ).parquet(tmp)
        import shutil

        shutil.rmtree(os.path.join(index_dir, "postings"))
        os.rename(tmp, os.path.join(index_dir, "postings"))
        with open(os.path.join(index_dir, "quant.json"), "w") as f:
            json.dump(quant, f)
        results["timings"]["pq_encode_migrate_s"] = round(time.time() - t0, 1)
        centroids, coded_postings = read_ivf(spark, index_dir)
    centroids = centroids.cache()
    centroids.count()
    means, ranges, books = quant["means"], (quant["lo"], quant["step"]), quant["pq"]

    def run(label: str, fn) -> dict:
        t0 = time.time()
        rows = fn().collect()
        dt = time.time() - t0
        r10 = recall_against_gt(rows, gt, 10, grid_qids)
        r100 = recall_against_gt(rows, gt, args.k, grid_qids)
        rec = {"tier": label.split()[0], "config": label, "sec": round(dt, 2),
               "recall@10": round(r10, 4), "recall@100": round(r100, 4)}
        results["grid"].append(rec)
        print(f"{label:40s} {dt:7.2f}s  r@10={r10:.3f}  r@100={r100:.3f}", flush=True)
        return rec

    # ---- exact Spark baseline (small query batch, extrapolated) --------
    if not args.skip_exact:
        from chroma_spark.operators.knn import exact_knn

        nq_exact = 32
        qx = queries_all.filter(F.col("query_id") < nq_exact)
        t0 = time.time()
        rows = exact_knn(records, qx, k=args.k).collect()
        dt = time.time() - t0
        r100 = recall_against_gt(rows, gt, args.k, set(range(nq_exact)))
        results["timings"]["exact_spark_s_per_query"] = round(dt / nq_exact, 3)
        results["timings"]["exact_spark_recall@100"] = round(r100, 4)
        print(f"exact spark: {dt:.1f}s / {nq_exact} queries "
              f"({dt/nq_exact:.2f}s/q), r@100={r100:.3f}", flush=True)

    # ---- grid ----------------------------------------------------------
    from chroma_spark.ann.quantize import ivf_quantized_search, ivf_sq4_search

    if "ivf" in tiers:
        for nprobe in (4, 8, 16, 32, 64):
            run(f"ivf nprobe={nprobe}",
                lambda np_=nprobe: ivf_search(centroids, coded_postings, grid_q,
                                              k=args.k, nprobe=np_))
    if "signbit" in tiers:
        for nprobe, rf in ((16, 16), (32, 8), (32, 16), (32, 32), (64, 16), (64, 32)):
            run(f"signbit nprobe={nprobe} rerank={rf}",
                lambda np_=nprobe, rf_=rf: ivf_quantized_search(
                    centroids, coded_postings, grid_q, means,
                    k=args.k, nprobe=np_, rerank_factor=rf_))
    if "sq4" in tiers:
        for nprobe, rf in ((16, 2), (16, 4), (32, 2), (32, 4), (64, 4)):
            run(f"sq4 nprobe={nprobe} rerank={rf}",
                lambda np_=nprobe, rf_=rf: ivf_sq4_search(
                    centroids, coded_postings, grid_q, ranges,
                    k=args.k, nprobe=np_, rerank_factor=rf_))
    if "pq" in tiers:
        from chroma_spark.ann.pq import ivf_pq_search

        for nprobe, rf in ((8, 4), (8, 8), (16, 4), (16, 8), (32, 8)):
            run(f"pq nprobe={nprobe} rerank={rf}",
                lambda np_=nprobe, rf_=rf: ivf_pq_search(
                    centroids, coded_postings, grid_q, books,
                    k=args.k, nprobe=np_, rerank_factor=rf_))

    # ---- single-query latency at a standard operating point ------------
    one_q = queries_all.filter(F.col("query_id") == 0)
    for _ in range(2):  # warm + measured
        t0 = time.time()
        ivf_search(centroids, coded_postings, one_q, k=args.k, nprobe=32).collect()
        t_one = time.time() - t0
    results["timings"]["single_query_ivf_nprobe32_s"] = round(t_one, 2)
    print(f"single-query ivf nprobe=32: {t_one:.2f}s", flush=True)

    out = os.path.join(BASE, f"results_{tag}.json")
    if os.path.exists(out):  # merge with a prior partial sweep
        with open(out) as f:
            prior = json.load(f)
        seen = {r["config"] for r in results["grid"]}
        results["grid"] = [r for r in prior.get("grid", []) if r["config"] not in seen] + results["grid"]
        results["timings"] = {**prior.get("timings", {}), **results["timings"]}
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwrote {out}\n")

    print("| tier | config | batch sec (%d q) | recall@10 | recall@100 |" % args.grid_nq)
    print("|---|---|---|---|---|")
    for r in results["grid"]:
        print(f"| {r['tier']} | {r['config']} | {r['sec']} | {r['recall@10']} | {r['recall@100']} |")
    spark.stop()


if __name__ == "__main__":
    main()
