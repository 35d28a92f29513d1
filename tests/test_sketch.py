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


def test_kmv_arrow_tier_identical_to_expr(spark):
    """The partial-sketch tier (mapInPandas bottom-k per partition, no
    corpus-wide shuffle) must produce the identical sketch as the expr
    path — grouped, ungrouped, and on empty input."""
    df = spark.range(60_000).select(
        "id",
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 9973).cast("string").alias("v"),
    ).repartition(8)
    expr = sorted(tuple(r) for r in S.kmv_distinct(df, F.col("v"), k=64, group_cols=["g"]).collect())
    arrow = sorted(tuple(r) for r in S.kmv_distinct_arrow(df, F.col("v"), k=64, group_cols=["g"]).collect())
    assert expr == arrow
    assert tuple(S.kmv_distinct(df, F.col("v"), k=64).collect()[0]) == tuple(
        S.kmv_distinct_arrow(df, F.col("v"), k=64).collect()[0]
    )
    # empty input: grouped -> no rows; ungrouped -> the (0, 0.0) empty
    # sketch (global aggregates always emit one row — both tiers agree)
    empty = df.filter(F.lit(False))
    assert S.kmv_distinct_arrow(empty, F.col("v"), k=8, group_cols=["g"]).count() == 0
    row = S.kmv_distinct_arrow(empty, F.col("v"), k=8).collect()[0]
    assert (row.n_kept, row.est_distinct) == (0, 0.0)


def test_kmv_filtered_tier_identical_to_expr(spark):
    """The threshold-prefilter tier must be output-identical to the expr
    path — including rare groups missed by the sample and forced
    threshold escalation from an adversarially bad sample estimate."""
    df = spark.range(60_000).select(
        "id",
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 9973).cast("string").alias("v"),
    ).repartition(8)
    expr = sorted(tuple(r) for r in S.kmv_distinct(df, F.col("v"), k=64, group_cols=["g"]).collect())
    filt = sorted(tuple(r) for r in S.kmv_distinct_filtered(df, F.col("v"), k=64, group_cols=["g"]).collect())
    assert expr == filt
    # rare group (5 rows) that a 1% sample usually misses entirely
    df2 = df.unionByName(
        spark.range(5).select("id", F.lit("z").alias("g"), (F.col("id") + 10**6).cast("string").alias("v"))
    )
    e2 = sorted(tuple(r) for r in S.kmv_distinct(df2, F.col("v"), k=64, group_cols=["g"]).collect())
    f2 = sorted(tuple(r) for r in S.kmv_distinct_filtered(df2, F.col("v"), k=64, group_cols=["g"]).collect())
    assert e2 == f2
    assert ("z", 5, 5.0) in f2  # exact for the tiny group
    # undersized thresholds must escalate, never truncate the sketch
    f3 = sorted(
        tuple(r)
        for r in S.kmv_distinct_filtered(
            df, F.col("v"), k=64, group_cols=["g"], sample_fraction=0.001, safety=0.05
        ).collect()
    )
    assert expr == f3
