"""Deterministic distinct-count sketches (KMV / bottom-k, Bar-Yossef et
al. 2002) for corpus statistics at 100 TB.

Exact ``COUNT(DISTINCT x)`` needs a full shuffle of every distinct value;
a KMV sketch is a bounded ``k``-row mergeable summary per group: keep the
``k`` smallest 60-bit md5 hashes, and if the k-th smallest normalized
hash is ``h_k`` then ``(k-1)/h_k`` estimates the distinct count with
relative error ~ ``1/sqrt(k)`` (~6% at k=256). Groups with fewer than
``k`` distinct values are EXACT (the sketch degenerates to the distinct
set itself).

Why KMV and not Spark's ``approx_count_distinct``: HLL++ registers are
engine-internal — DuckDB's approx_count_distinct uses a different
sketch, so the two engines could never agree bit-for-bit. md5 bottom-k
is deterministic and engine-portable (the same discipline as every other
cross-engine hash in this repo, ``functions/text.md5_long``), so the
estimate itself is oracle-checkable — and mergeability is trivial
algebra: the bottom-k of a union is the bottom-k of the concatenated
per-part bottom-ks (pytest-pinned), which is what makes the sketch a
partial aggregate at cluster scale.

Reference parity note: chroma has no sketching surface — this extends
the beyond-the-reference pipeline statistics (SURVEY §7) alongside
``statistics``/``ngram_topk``.

Scale shape: one map-side-combinable distinct per (group, hash), one
two-stage bottom-k per group (``operators/topk.py`` — no single-partition
window), then a k-row-per-group aggregate. Nothing corpus-sized survives
the sketch boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long, md5_long_sql

# md5_long is 60 bits: hashes normalize to [0, 1) by this constant
_HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    value: Column,
    k: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group distinct-count estimate: ``(group..., n_kept,
    est_distinct)``. ``n_kept < k`` means the group was exact."""
    groups = list(group_cols or [])
    from .topk import topk_per_group

    hashed = df.select(*groups, md5_long(value).alias("__h")).distinct()
    bottom = topk_per_group(hashed, groups, [F.col("__h").asc()], k)
    est = F.when(
        F.count("*") < k, F.count("*").cast("double")
    ).otherwise(F.lit(float(k - 1)) / (F.max("__h").cast("double") / F.lit(_HASH_SPACE)))
    agg = bottom.groupBy(*groups).agg(
        F.count("*").cast("long").alias("n_kept"),
        (F.round(est, 6) + F.lit(0.0)).alias("est_distinct"),
    )
    return agg


def kmv_distinct_sql(
    rows_sql: str,
    value_sql: str,
    k: int = 256,
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB twin over ``rows_sql``; ``value_sql`` is the hashed
    expression, ``group_cols`` must be columns of ``rows_sql``."""
    groups = list(group_cols or [])
    gsel = ", ".join(f'"{g}"' for g in groups)
    gpre = f"{gsel}, " if groups else ""
    part = f"PARTITION BY {gsel} " if groups else ""
    return f"""
WITH __rows AS ({rows_sql}),
__h AS (SELECT DISTINCT {gpre}{md5_long_sql(value_sql)} AS __h FROM __rows),
__bot AS (
  SELECT * FROM (
    SELECT {gpre}__h, row_number() OVER ({part}ORDER BY __h ASC) AS __rn FROM __h
  ) WHERE __rn <= {int(k)}
)
SELECT {gpre}CAST(count(*) AS BIGINT) AS n_kept,
       (round(CASE WHEN count(*) < {int(k)} THEN CAST(count(*) AS DOUBLE)
              ELSE {float(k - 1)!r} / (CAST(max(__h) AS DOUBLE) / {_HASH_SPACE!r}) END, 6) + 0.0)
         AS est_distinct
FROM __bot{f" GROUP BY {gsel}" if groups else ""}"""


def kmv_merge(sketches: DataFrame, k: int, group_cols: list[str] | None = None) -> DataFrame:
    """Merge per-part bottom-k hash sets (``(group..., __h)`` rows) into
    the union's sketch estimate — the partial-aggregate form: bottom-k of
    the concatenation IS the union's bottom-k."""
    groups = list(group_cols or [])
    from .topk import topk_per_group

    bottom = topk_per_group(sketches.distinct(), groups, [F.col("__h").asc()], k)
    est = F.when(
        F.count("*") < k, F.count("*").cast("double")
    ).otherwise(F.lit(float(k - 1)) / (F.max("__h").cast("double") / F.lit(_HASH_SPACE)))
    return bottom.groupBy(*groups).agg(
        F.count("*").cast("long").alias("n_kept"),
        (F.round(est, 6) + F.lit(0.0)).alias("est_distinct"),
    )


def kmv_hashes(
    df: DataFrame, value: Column, k: int = 256, group_cols: list[str] | None = None
) -> DataFrame:
    """The raw sketch rows ``(group..., __h)`` (bottom-k hash set) — what
    a shard would ship to a merge step."""
    groups = list(group_cols or [])
    from .topk import topk_per_group

    hashed = df.select(*groups, md5_long(value).alias("__h")).distinct()
    return topk_per_group(hashed, groups, [F.col("__h").asc()], k)
