"""Bloom-tier decontamination at 1M train docs: build/probe throughput and
measured false-positive overhead vs the exact broadcast semi-join.

The exact tier (`ngram_contamination`) broadcasts the eval set's raw
n-gram STRINGS — linear in eval size; the Bloom tier
(`bloom_contamination`) broadcasts an m-bit filter packed into 32-bit
words — constant in eval size. This harness measures both on the same
seeded corpus so the trade is data:

  - train corpus: N docs, 40-140 tokens each, fully distributed generation
    (every token a pure function of (stream, position) — no driver rows);
  - eval set: E docs, a fraction of which are EXACT copies of train doc
    streams (planted contamination, so exact-tier hits are known-correct);
  - measured per m: filter build time, word-table rows/bytes (the actual
    broadcast), probe time, flagged docs, and FP overhead = flagged docs
    beyond the exact tier's (Bloom never misses — superset by
    construction, asserted).

Usage:
    python scripts/bloom_scale_bench.py                  # 1M train / 20k eval
    python scripts/bloom_scale_bench.py --n 100000       # smoke

Outputs `.bloom_scale/results_n{N}.json` + a markdown table for
BASELINE.md. Everything lands in the gitignored `.bloom_scale/` dir.
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
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bloom_scale"
)

VOCAB = 30_000


def _stream_doc(stream, seed: int):
    """(n_tok, document) for a stream-key column: deterministic 40-140
    token text, all column expressions."""
    h_len = F.conv(F.substring(F.md5(F.concat(F.lit(f"len{seed}_"), stream)), 1, 15), 16, 10)
    n_tok = (h_len % 101 + 40).cast("int")

    def tok(j):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"tok{seed}_"), stream, F.lit("_"), j.cast("string"))),
                1, 15,
            ),
            16, 10,
        )
        return F.concat(F.lit("w"), (h % VOCAB).cast("string"))

    return F.concat_ws(" ", F.transform(F.sequence(F.lit(1), n_tok), tok))


def gen_train(spark, n: int, seed: int):
    # NB: intermediate names must not collide with output names — a column
    # captured inside a transform() lambda re-resolves by NAME against the
    # projection's own output in Spark 4
    df = spark.range(n).select(F.col("id").alias("__i"))
    df = df.withColumn("__stream", F.col("__i").cast("string"))
    return df.select(
        F.col("__stream").alias("id"),
        _stream_doc(F.col("__stream"), seed).alias("document"),
    )


def gen_eval(spark, n_eval: int, n_train: int, contam_frac: float, seed: int):
    """Eval doc j < contam_frac*n_eval copies train stream (j*53 % n_train)
    exactly; the rest draw from a disjoint 'ev' stream space."""
    df = spark.range(n_eval).select(F.col("id").alias("__i"))
    contaminated = F.col("__i") < int(n_eval * contam_frac)
    df = df.withColumn(
        "__stream",
        F.when(
            contaminated, ((F.col("__i") * 53) % n_train).cast("string")
        ).otherwise(F.concat(F.lit("ev"), F.col("__i").cast("string"))),
    )
    return df.select(
        F.concat(F.lit("e"), F.col("__i").cast("string")).alias("id"),
        _stream_doc(F.col("__stream"), seed).alias("document"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--n-eval", type=int, default=20_000)
    ap.add_argument("--contam", type=float, default=0.2)
    ap.add_argument("--ngram", type=int, default=13)
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--m-bits", type=int, nargs="*", default=[1 << 24, 1 << 27])
    ap.add_argument("--n-hashes", type=int, default=4)
    args = ap.parse_args()

    from chroma_spark.operators.decontam import (
        bloom_build,
        bloom_contamination,
        ngram_contamination,
    )
    from chroma_spark.session import get_spark

    spark = get_spark("bloom-scale-bench")
    os.makedirs(BASE, exist_ok=True)
    train_dir = os.path.join(BASE, f"train_n{args.n}_s{args.seed}")
    eval_dir = os.path.join(BASE, f"eval_e{args.n_eval}_n{args.n}_s{args.seed}")
    if not os.path.exists(train_dir):
        gen_train(spark, args.n, args.seed).repartition(64).write.parquet(train_dir)
    if not os.path.exists(eval_dir):
        gen_eval(spark, args.n_eval, args.n, args.contam, args.seed).repartition(
            8
        ).write.parquet(eval_dir)
    train = spark.read.parquet(train_dir)
    eval_set = spark.read.parquet(eval_dir)

    results = {
        "n": args.n, "n_eval": args.n_eval, "contam": args.contam,
        "ngram": args.ngram, "n_hashes": args.n_hashes, "tiers": [],
    }

    t0 = time.time()
    exact = ngram_contamination(train, eval_set, n=args.ngram)
    exact_ids = {r["id"] for r in exact.select("id").collect()}
    results["exact_s"] = round(time.time() - t0, 1)
    results["exact_docs"] = len(exact_ids)
    # planted streams are (j*53 % n) for j in the contaminated prefix
    planted = {str((j * 53) % args.n) for j in range(int(args.n_eval * args.contam))}
    results["planted_train_docs"] = len(planted)
    assert planted <= exact_ids, "exact tier must flag every planted copy"
    print(f"exact: {results['exact_docs']} docs "
          f"({results['planted_train_docs']} planted) in {results['exact_s']}s")

    for m in args.m_bits:
        tier = {"m_bits": m, "broadcast_mb": round(m / 8 / 1e6, 2)}
        t0 = time.time()
        words = bloom_build(
            eval_set, n=args.ngram, m_bits=m, n_hashes=args.n_hashes
        ).cache()
        tier["filter_words"] = words.count()
        tier["build_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        flagged = bloom_contamination(
            train, None, n=args.ngram, m_bits=m, n_hashes=args.n_hashes,
            filter_words=words,
        )
        bloom_ids = {r["id"] for r in flagged.select("id").collect()}
        tier["probe_s"] = round(time.time() - t0, 1)
        tier["flagged_docs"] = len(bloom_ids)
        assert exact_ids <= bloom_ids, "Bloom must never miss an exact hit"
        tier["fp_docs"] = len(bloom_ids - exact_ids)
        words.unpersist()
        results["tiers"].append(tier)
        print(f"m=2^{m.bit_length()-1}: build {tier['build_s']}s "
              f"({tier['filter_words']} words, {tier['broadcast_mb']} MB), "
              f"probe {tier['probe_s']}s, flagged {tier['flagged_docs']} "
              f"(+{tier['fp_docs']} FP)")

    out = os.path.join(BASE, f"results_n{args.n}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)
    print(f"\nwrote {out}\n")
    print("| tier | broadcast | build s | probe s | flagged docs | FP docs |")
    print("|---|---|---|---|---|---|")
    print(f"| exact semi-join | ~{args.n_eval // 1000}k-doc gram set "
          f"| — | {results['exact_s']} | {results['exact_docs']} | 0 |")
    for t in results["tiers"]:
        print(f"| bloom m=2^{t['m_bits'].bit_length()-1} | {t['broadcast_mb']} MB "
              f"| {t['build_s']} | {t['probe_s']} | {t['flagged_docs']} "
              f"| {t['fp_docs']} |")


if __name__ == "__main__":
    main()
