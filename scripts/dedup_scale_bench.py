"""1M-doc MinHash-LSH dedup validation: recall vs planted near-dups +
throughput.

Mirrors the dense (`ann_scale_bench.py`) and sparse (`sparse_scale_bench.py`)
scale harnesses for the headline 100-TB pipeline op. A seeded corpus is
generated FULLY DISTRIBUTED (every token is a pure function of
(doc, position) — no driver-side text): 10% of docs are planted mutations
of their predecessor (each token resampled with ~4% probability), giving a
spread of true Jaccard similarities around the detection threshold. The
bench measures, per LSH config:

  - band-table build time over the corpus (``write_minhash_index``)
  - full-corpus near-dup pair detection time (``minhash_dedup_pairs``)
  - RECALL against the planted pairs whose TRUE 3-gram Jaccard >= the
    threshold (every emitted pair is exact-verified, so precision is 1 by
    construction), alongside the theoretical banding-curve expectation
    ``E[1 - (1 - s^r)^b]`` over the same true-pair similarities
  - background pairs found beyond the planted ones
  - incremental-batch matching time against the persisted band table

Usage:
    python scripts/dedup_scale_bench.py                # full 1M run
    python scripts/dedup_scale_bench.py --n 100000     # smoke run

Outputs `.dedup_scale/results_n{N}.json` and prints a markdown table for
BASELINE.md. Everything lands in the gitignored `.dedup_scale/` dir.
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
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".dedup_scale"
)

VOCAB = 30_000
MUT_PCT = 4  # per-token resample probability for planted near-dups (%)
PLANT_MOD = 10  # doc i is a mutation of doc i-1 iff i % PLANT_MOD == 1


def gen_corpus(spark, n: int, seed: int):
    """``(id, document)``: deterministic token streams, 40-140 tokens/doc.

    Doc i draws token j from stream ``base = i - (i % PLANT_MOD == 1)``;
    planted docs resample ~MUT_PCT% of positions from their own stream, so
    (i-1, i) pairs have true Jaccard spread around 0.6-0.95. All column
    expressions — generation itself is a 100-TB-shaped map."""
    df = spark.range(n).select(F.col("id"))
    planted = (F.col("id") % PLANT_MOD == 1) & (F.col("id") > 0)
    base = F.when(planted, F.col("id") - 1).otherwise(F.col("id")).cast("string")
    # doc length follows the BASE stream so planted pairs align positionally
    h_len = F.conv(F.substring(F.md5(F.concat(F.lit(f"len{seed}_"), base)), 1, 15), 16, 10)
    n_tok = (h_len % 101 + 40).cast("int")

    def tok(src, j):
        h = F.conv(F.substring(F.md5(F.concat(F.lit(f"tok{seed}_"), src, F.lit("_"), j.cast("string"))), 1, 15), 16, 10)
        return F.concat(F.lit("w"), (h % VOCAB).cast("string"))

    mut_h = lambda j: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(F.lit(f"mut{seed}_"), F.col("id").cast("string"), F.lit("_"), j.cast("string"))), 1, 15), 16, 10
    )
    word = lambda j: F.when(  # noqa: E731
        planted & (mut_h(j) % 100 < MUT_PCT), tok(F.concat(base, F.lit("m")), j)
    ).otherwise(tok(base, j))
    doc = F.concat_ws(" ", F.transform(F.sequence(F.lit(1), n_tok), word))
    return df.select("id", doc.alias("document"), planted.alias("planted"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=10_000)
    ap.add_argument("--threshold", type=float, default=0.7)
    ap.add_argument("--seed", type=int, default=13)
    args = ap.parse_args()

    from chroma_spark.operators.dedup import (
        jaccard_pairs,
        minhash_dedup_pairs,
        minhash_incremental_pairs,
        write_minhash_index,
    )
    from chroma_spark.session import get_spark

    tag = f"n{args.n}"
    corpus_dir = os.path.join(BASE, f"docs_{tag}")
    spark = get_spark("dedup-scale-bench")

    if not os.path.exists(corpus_dir):
        t0 = time.time()
        gen_corpus(spark, args.n, args.seed).write.mode("overwrite").parquet(corpus_dir)
        print(f"corpus gen: {time.time() - t0:.1f}s -> {corpus_dir}")
    docs = spark.read.parquet(corpus_dir)

    # ground truth: TRUE Jaccard of every planted (i-1, i) pair — candidates
    # are handed over explicitly, so this is |planted| verifications, not LSH
    truth_path = os.path.join(BASE, f"truth_{tag}")
    if not os.path.exists(truth_path):
        planted_pairs = (
            docs.filter("planted")
            .select((F.col("id") - 1).alias("id_a"), F.col("id").alias("id_b"))
        )
        t0 = time.time()
        jaccard_pairs(docs, threshold=0.0, n=3, candidates=planted_pairs).write.mode(
            "overwrite"
        ).parquet(truth_path)
        print(f"truth jaccard: {time.time() - t0:.1f}s")
    truth = spark.read.parquet(truth_path).cache()
    n_truth = truth.filter(F.col("jac") >= args.threshold).count()
    jac_hist = {
        str(r["b"]): r["c"]
        for r in truth.groupBy(F.floor(F.col("jac") * 10).alias("b"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    print(f"planted pairs: {truth.count()}, true-jac>= {args.threshold}: {n_truth}")
    print(f"jaccard decile histogram: {json.dumps(jac_hist, sort_keys=True)}")

    results = {
        "n_docs": args.n, "threshold": args.threshold, "n_true_pairs": n_truth,
        "jac_hist": jac_hist, "configs": {},
    }
    for num_perm, bands in ((16, 4), (64, 16)):
        rows = num_perm // bands
        cfg = f"p{num_perm}b{bands}"
        idx_dir = os.path.join(BASE, f"bands_{tag}_{cfg}")

        t0 = time.time()
        write_minhash_index(docs, idx_dir, num_perm=num_perm, bands=bands, n=3)
        build_s = time.time() - t0

        t0 = time.time()
        found = (
            minhash_dedup_pairs(docs, args.threshold, num_perm=num_perm, bands=bands, n=3)
            .cache()
        )
        n_found = found.count()
        detect_s = time.time() - t0

        hit = found.join(
            truth.filter(F.col("jac") >= args.threshold).select("id_a", "id_b"),
            ["id_a", "id_b"],
            "semi",
        ).count()
        recall = hit / n_truth if n_truth else 1.0
        # theoretical banding curve over the true similarity distribution
        expect = truth.filter(F.col("jac") >= args.threshold).agg(
            F.avg(1 - F.pow(1 - F.pow(F.col("jac"), rows), bands))
        ).collect()[0][0]

        # incremental: a fresh batch (ids beyond the corpus, ~10% mutations
        # of corpus tails) against the persisted band table
        batch = gen_corpus(spark, args.n + args.batch, args.seed).filter(
            F.col("id") >= args.n
        )
        corpus_bands = spark.read.parquet(idx_dir)
        t0 = time.time()
        n_incr = minhash_incremental_pairs(
            batch, docs, corpus_bands, args.threshold, num_perm=num_perm, bands=bands, n=3
        ).count()
        incr_s = time.time() - t0
        found.unpersist()

        results["configs"][cfg] = {
            "num_perm": num_perm, "bands": bands, "rows": rows,
            "build_s": round(build_s, 1), "detect_s": round(detect_s, 1),
            "pairs_found": n_found, "planted_hit": hit,
            "recall": round(recall, 4),
            "banding_expectation": round(float(expect), 4),
            "incr_batch": args.batch, "incr_s": round(incr_s, 1),
            "incr_pairs": n_incr,
        }
        print(f"{cfg}: build {build_s:.1f}s detect {detect_s:.1f}s "
              f"pairs {n_found} recall {recall:.4f} (expect {expect:.4f}) "
              f"incr {incr_s:.1f}s/{args.batch}")

    os.makedirs(BASE, exist_ok=True)
    out = os.path.join(BASE, f"results_{tag}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)
    print(f"\nwrote {out}\n")
    print("| n_docs | config | build s | detect s | pairs | recall | banding E | incr s (batch) |")
    print("|---|---|---|---|---|---|---|---|")
    for cfg, r in results["configs"].items():
        print(f"| {args.n} | {cfg} (r={r['rows']}) | {r['build_s']} | {r['detect_s']} "
              f"| {r['pairs_found']} | {r['recall']} | {r['banding_expectation']} "
              f"| {r['incr_s']} ({r['incr_batch']}) |")


if __name__ == "__main__":
    main()
