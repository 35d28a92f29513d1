"""KMV distinct sketch: exact below k, accurate above k, and exactly
mergeable (bottom-k of per-part bottom-ks == bottom-k of the union)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from chroma_spark.operators import sketch as S


def test_kmv_exact_below_k(spark):
    df = spark.range(100).select((F.col("id") % 37).cast("string").alias("v"))
    row = S.kmv_distinct(df, F.col("v"), k=256).collect()[0]
    assert row.n_kept == 37 and row.est_distinct == 37.0


def test_kmv_estimate_accuracy_above_k(spark):
    n, k = 50_000, 512
    df = spark.range(n * 3).select((F.col("id") % n).cast("string").alias("v"))
    row = S.kmv_distinct(df, F.col("v"), k=k).collect()[0]
    assert row.n_kept == k
    rel = abs(row.est_distinct - n) / n
    assert rel < 3.0 / math.sqrt(k), f"rel err {rel} (est {row.est_distinct})"


def test_kmv_grouped_and_mergeable(spark):
    """Per-part sketches merged == sketch of the union, exactly — the
    property that makes KMV a partial aggregate on a cluster."""
    df = spark.range(30_000).select(
        "id",
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 7919).cast("string").alias("v"),
    )
    whole = {
        r.g: (r.n_kept, r.est_distinct)
        for r in S.kmv_distinct(df, F.col("v"), k=128, group_cols=["g"]).collect()
    }
    parts = [df.filter(F.col("id") % 5 == i) for i in range(5)]
    shipped = None
    for p in parts:
        h = S.kmv_hashes(p, F.col("v"), k=128, group_cols=["g"])
        shipped = h if shipped is None else shipped.unionByName(h)
    merged = {
        r.g: (r.n_kept, r.est_distinct)
        for r in S.kmv_merge(shipped, k=128, group_cols=["g"]).collect()
    }
    assert merged == whole and len(whole) == 3
