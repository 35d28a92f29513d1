"""IVF ANN: recall >= 0.95 vs exact brute force (the reference's own
invariant, chromadb/test/property/invariants.py:281), and full-probe
equivalence (nprobe == n_lists must equal exact search).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chroma_spark.ann.ivf import build_ivf, ivf_search, recall_at_k
from chroma_spark.operators.knn import exact_knn
from tests.conftest import SF_MEDIUM


def _records(spark):
    return (
        spark.read.parquet(f"{SF_MEDIUM}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), "embedding")
    )


def _queries(spark, n=20):
    return (
        spark.read.parquet(f"{SF_MEDIUM}/embeddings.parquet")
        .filter(F.col("vec_id") < n)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def test_ivf_recall_l2(spark):
    records, queries = _records(spark), _queries(spark)
    centroids, postings = build_ivf(records, n_lists=16)
    exact = exact_knn(records, queries, k=10, space="l2")
    approx = ivf_search(centroids, postings, queries, k=10, nprobe=8, space="l2")
    r = recall_at_k(approx, exact)
    assert r >= 0.95, f"recall@10 = {r}"


def test_ivf_full_probe_equals_exact_cosine(spark):
    records, queries = _records(spark), _queries(spark, n=5)
    centroids, postings = build_ivf(records, n_lists=8)
    exact = exact_knn(records, queries, k=10, space="cosine")
    approx = ivf_search(centroids, postings, queries, k=10, nprobe=8, space="cosine")
    e = {(r["query_id"], r["id"]) for r in exact.collect()}
    a = {(r["query_id"], r["id"]) for r in approx.collect()}
    assert e == a
