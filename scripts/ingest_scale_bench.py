"""Write-path throughput at scale: bulk ingest -> compaction -> incremental
index maintenance, measured end to end through the public Client API.

Completes the scale-evidence set (dense ANN, sparse retrieval, FTS, span
dedup, MinHash dedup all have 1M-scale measurements) for the WRITE path:
`add_records` (the distributed DataFrame ingest), `compact` (WAL fold +
MERGE + catalog CAS), and the incremental maintenance of a built vector
index across a follow-up batch. Record shape mirrors a training-data
collection: 64-d float embedding, ~30-token document, two metadata
columns.

Usage:
    python scripts/ingest_scale_bench.py                 # 500k + 50k incr
    python scripts/ingest_scale_bench.py --n 50000       # smoke

Outputs `.ingest_scale/results_n{N}.json` and prints a markdown table for
BASELINE.md. Everything lands in the gitignored `.ingest_scale/` dir.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".ingest_scale"
)


def gen_records(spark, lo: int, hi: int, dim: int = 64):
    """Deterministic records (id, embedding, document, src, score): all
    column expressions, no driver-side rows."""
    df = spark.range(lo, hi).select(F.col("id").cast("string").alias("id"))
    h = lambda salt, j: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(F.lit(salt), F.col("id"), F.lit("_"), j.cast("string"))), 1, 15),
        16, 10,
    )
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: ((h("e", j) % 2001).cast("double") / 1000.0 - 1.0).cast("float"),
    )
    doc = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(30)),
            lambda j: F.concat(F.lit("w"), (h("d", j) % 5000).cast("string")),
        ),
    )
    return df.select(
        "id",
        emb.alias("embedding"),
        doc.alias("document"),
        F.concat(F.lit("src"), (h("s", F.lit(0)) % 20).cast("string")).alias("src"),
        ((h("q", F.lit(0)) % 1000).cast("double") / 1000.0).alias("score"),
    )


def bench_files(spark, client, args, results) -> None:
    """File-ingest path: export the same records as sharded JSONL.gz, then
    ingest through ``Collection.add_files`` — measures the full
    read->canonicalize->WAL path of sources/files.py at scale."""
    from chroma_spark.sources.files import write_documents_jsonl

    corpus = os.path.join(BASE, f"jsonl_n{args.n}")
    shutil.rmtree(corpus, ignore_errors=True)
    t0 = time.time()
    write_documents_jsonl(
        gen_records(spark, 0, args.n, args.dim).repartition(32), corpus
    )
    results["jsonl_export_s"] = round(time.time() - t0, 1)

    col = client.create_collection("ingest_files", dimension=args.dim, space="cosine")
    schema = (
        "id STRING, embedding ARRAY<FLOAT>, document STRING, "
        "src STRING, score DOUBLE"
    )
    t0 = time.time()
    n2 = col.add_files(
        corpus, format="jsonl", schema=schema, id_col="id",
        document_col="document", embedding_col="embedding",
    )
    results["files_ingest_s"] = round(time.time() - t0, 1)
    results["files_ingest_rps"] = int(args.n / results["files_ingest_s"])
    assert n2 == args.n
    assert col.count() == args.n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--incr", type=int, default=50_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--files", action="store_true",
                    help="also measure the JSONL add_files ingest path")
    ap.add_argument("--files-only", action="store_true",
                    help="measure ONLY the JSONL add_files ingest path")
    args = ap.parse_args()

    from chroma_spark.api import Client
    from chroma_spark.session import get_spark

    spark = get_spark("ingest-scale-bench")
    root = os.path.join(BASE, f"store_n{args.n}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    client = Client(spark, root)
    col = client.create_collection("ingest_bench", dimension=args.dim, space="cosine")

    results = {"n": args.n, "incr": args.incr, "dim": args.dim}

    if args.files_only:
        bench_files(spark, client, args, results)
        out = os.path.join(BASE, f"results_files_n{args.n}.json")
        with open(out, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)
        print(f"\nwrote {out}\n")
        print("| n | jsonl export s | add_files ingest s (rec/s) |")
        print("|---|---|---|")
        print(f"| {args.n} | {results['jsonl_export_s']} "
              f"| {results['files_ingest_s']} ({results['files_ingest_rps']}/s) |")
        return

    t0 = time.time()
    n_written = col.add_records(gen_records(spark, 0, args.n, args.dim))
    results["append_s"] = round(time.time() - t0, 1)
    results["append_rps"] = int(args.n / results["append_s"])
    assert n_written == args.n

    t0 = time.time()
    col.compact()
    results["compact_s"] = round(time.time() - t0, 1)
    assert col.count(read_level="index_only") == args.n

    t0 = time.time()
    col.build_vector_index(n_lists=128)
    results["vindex_build_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    col.add_records(gen_records(spark, args.n, args.n + args.incr, args.dim))
    results["incr_append_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    col.compact()  # incremental: WAL fold + epoch-append index maintenance
    results["incr_compact_s"] = round(time.time() - t0, 1)
    assert col.count(read_level="index_only") == args.n + args.incr

    # serving sanity after maintenance: one KNN through the maintained index
    t0 = time.time()
    res = col.query(query_embeddings=[[0.1] * args.dim], n_results=10)
    results["post_maintenance_query_s"] = round(time.time() - t0, 2)
    assert len(res["ids"][0]) == 10

    if args.files:
        bench_files(spark, client, args, results)

    os.makedirs(BASE, exist_ok=True)
    out = os.path.join(BASE, f"results_n{args.n}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)
    print(f"\nwrote {out}\n")
    print("| n | append s (rec/s) | compact s | vindex build s | +incr append s | incr compact s | post-maint query s |")
    print("|---|---|---|---|---|---|---|")
    print(f"| {args.n} | {results['append_s']} ({results['append_rps']}/s) "
          f"| {results['compact_s']} | {results['vindex_build_s']} "
          f"| {results['incr_append_s']} ({args.incr}) | {results['incr_compact_s']} "
          f"| {results['post_maintenance_query_s']} |")


if __name__ == "__main__":
    main()
