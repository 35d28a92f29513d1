"""BPE tokenizer at corpus scale over the .dedup_scale seeded corpora.

Measures the three costs that matter at 100 TB, separately:

1. **word count** — the only corpus-sized pass (explode + map-side
   combined groupBy + top-``max_words`` collect);
2. **merge training** — driver-local over the collected word types
   (vocabulary-bounded by design: pair statistics live on word TYPES
   weighted by frequency, never token instances);
3. **apply** — distinct-word segmentation (vocab-sized frame evaluates
   the replace chain) joined back + per-doc reassembly, reported as
   end-to-end `bpe_token_counts` aggregation over the full corpus.

Usage: python scripts/bpe_scale_bench.py [--n 1000000] [--merges 256]
Results merge into .dedup_scale/bpe_n{n}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from chroma_spark.operators import bpe as B  # noqa: E402
from chroma_spark.session import get_spark  # noqa: E402

BASE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".dedup_scale")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--merges", type=int, default=256)
    ap.add_argument("--max-words", type=int, default=50_000)
    ap.add_argument("--pack", action="store_true", help="also measure pack_materialize")
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--kmv", action="store_true", help="also measure the KMV distinct sketch vs exact")
    args = ap.parse_args()

    spark = get_spark("bpe-scale")
    docs = spark.read.parquet(os.path.join(BASE, f"docs_n{args.n}")).select("id", "document")

    t0 = time.time()
    wf = B.word_frequencies(docs, max_words=args.max_words)
    t_count = time.time() - t0
    total_words = sum(c for _, c in wf)
    print(f"word count: {len(wf)} types / {total_words} tokens in {t_count:.1f}s", flush=True)

    t0 = time.time()
    merges, _ = B.train_local(wf, args.merges)
    t_train = time.time() - t0
    print(f"trained {len(merges)} merges in {t_train:.1f}s (first 8: {merges[:8]})", flush=True)

    t0 = time.time()
    agg = (
        B.bpe_token_counts(docs, merges)
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_words").alias("words"),
            F.sum("n_bpe").alias("bpe"),
        )
        .collect()[0]
    )
    t_apply = time.time() - t0
    print(
        f"apply: {agg.docs} docs, {agg.words} words -> {agg.bpe} bpe tokens "
        f"({agg.bpe / max(1, agg.words):.2f} sym/word) in {t_apply:.1f}s",
        flush=True,
    )

    pack_row = None
    if args.pack:
        from chroma_spark.operators.textstats import pack_materialize

        t0 = time.time()
        p = (
            pack_materialize(docs, budget=args.budget)
            .agg(
                F.count("*").alias("seqs"),
                F.sum("seq_len").alias("toks"),
                F.sum((F.col("seq_len") == args.budget).cast("long")).alias("full"),
            )
            .collect()[0]
        )
        t_pack = time.time() - t0
        conserved = int(p.toks) == int(agg.words)
        pack_row = {
            "budget": args.budget,
            "sequences": int(p.seqs),
            "full_sequences": int(p.full),
            "tokens": int(p.toks),
            "conserved": conserved,
            "pack_s": round(t_pack, 1),
        }
        print(
            f"pack: {p.seqs} sequences x {args.budget} ({p.full} full), "
            f"{p.toks} tokens (conserved={conserved}) in {t_pack:.1f}s",
            flush=True,
        )

    kmv_row = None
    if args.kmv:
        from chroma_spark.functions.text import tokens, word_ngrams
        from chroma_spark.operators.sketch import (
            kmv_distinct,
            kmv_distinct_arrow,
            kmv_distinct_filtered,
        )

        grams = docs.select(
            F.explode(word_ngrams(tokens(F.col("document")), 3)).alias("g")
        )
        t0 = time.time()
        skf = kmv_distinct_filtered(grams, F.col("g"), k=1024).collect()[0]
        t_skf = time.time() - t0
        t0 = time.time()
        ska = kmv_distinct_arrow(grams, F.col("g"), k=1024).collect()[0]
        t_ska = time.time() - t0
        t0 = time.time()
        sk = kmv_distinct(grams, F.col("g"), k=1024).collect()[0]
        t_sk = time.time() - t0
        t0 = time.time()
        exact = grams.distinct().count()
        t_exact = time.time() - t0
        assert tuple(ska) == tuple(sk), (tuple(ska), tuple(sk))
        assert tuple(skf) == tuple(sk), (tuple(skf), tuple(sk))
        rel = abs(sk.est_distinct - exact) / exact
        kmv_row = {
            "k": 1024,
            "est": sk.est_distinct,
            "exact": exact,
            "rel_err": round(rel, 4),
            "sketch_filtered_s": round(t_skf, 1),
            "sketch_arrow_s": round(t_ska, 1),
            "sketch_expr_s": round(t_sk, 1),
            "exact_s": round(t_exact, 1),
        }
        print(
            f"kmv: est {sk.est_distinct:.0f} vs exact {exact} (rel {rel:.4f}) — "
            f"filtered {t_skf:.1f}s vs arrow {t_ska:.1f}s vs expr {t_sk:.1f}s vs exact-distinct {t_exact:.1f}s",
            flush=True,
        )

    out_path = os.path.join(BASE, f"bpe_n{args.n}.json")
    results = json.load(open(out_path)) if os.path.exists(out_path) else {}
    results[str(args.merges)] = {
        "n_docs": int(agg.docs),
        "word_types": len(wf),
        "total_words": int(agg.words),
        "bpe_tokens": int(agg.bpe),
        "syms_per_word": round(agg.bpe / max(1, agg.words), 3),
        "count_s": round(t_count, 1),
        "train_s": round(t_train, 1),
        "apply_s": round(t_apply, 1),
    }
    if pack_row is not None:
        results[str(args.merges)]["pack"] = pack_row
    if kmv_row is not None:
        results[str(args.merges)]["kmv"] = kmv_row
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
