"""Opt-in sparse scale validation slice (set SPARSE_SCALE=1 to run).

A small (50k-doc) rerun of the SPLADE-style sparse retrieval harness in
`scripts/sparse_scale_bench.py` — same seeded heavy-tailed corpus
generator, same exactness bar: the bucket-pruned persisted-index top-k
must EQUAL the inline exact dot-product scorer, with and without IDF
(reference bench shape: `rust/benchmark/src/datasets/wikipedia_splade.rs`
+ `ms_marco_queries.rs`). The full 1M-doc numbers are recorded in
BASELINE.md; this slice keeps the harness itself under test without
minutes of wall-clock per pytest run.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARSE_SCALE"), reason="set SPARSE_SCALE=1 for the scale slice"
)

BASE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".sparse_scale"
)
N, NQ, K, N_BUCKETS = 50_000, 50, 10, 256


@pytest.fixture(scope="module")
def sparse_scale_data(spark):
    from chroma_spark.operators.sparse import read_sparse_index, write_sparse_index
    from chroma_spark.sparse_benchdata import gen_sparse_postings, gen_sparse_queries

    corpus_dir = os.path.join(BASE, f"postings_n{N}")
    queries_dir = os.path.join(BASE, f"queries_n{N}")
    index_dir = os.path.join(BASE, f"index_n{N}_b{N_BUCKETS}")
    gen_sparse_postings(corpus_dir, N)
    gen_sparse_queries(queries_dir, NQ)
    postings = spark.read.parquet(corpus_dir)
    if not os.path.isdir(index_dir) or not os.listdir(index_dir):
        write_sparse_index(postings, index_dir, n_buckets=N_BUCKETS)
    queries = spark.read.parquet(os.path.join(queries_dir, "queries.parquet"))
    return postings, read_sparse_index(spark, index_dir), queries


def _norm(df):
    return sorted((int(r["query_id"]), r["id"], float(r["score"])) for r in df.collect())


@pytest.mark.parametrize("idf", [False, True])
def test_indexed_topk_equals_inline_exact(sparse_scale_data, idf):
    from chroma_spark.operators.sparse import _dot_topk, sparse_index_topk

    postings, indexed, queries = sparse_scale_data
    q_indices = [int(i) for r in queries.select("sparse.indices").collect() for i in r[0]]
    qpost = queries.select(
        "query_id",
        F.explode(
            F.arrays_zip(F.col("sparse.indices").alias("idx"),
                         F.col("sparse.values").alias("val"))
        ).alias("p"),
    ).select("query_id", F.col("p.idx").alias("idx"), F.col("p.val").alias("q_w"))
    exact = _norm(
        _dot_topk(postings, qpost, K, 6,
                  idf_from=postings if idf else None, n_docs=float(N) if idf else None)
    )
    got = _norm(
        sparse_index_topk(indexed, queries, k=K, n_buckets=N_BUCKETS, idf=idf,
                          n_docs=float(N) if idf else None, query_indices=q_indices)
    )
    assert got == exact
    assert len(got) == NQ * K
