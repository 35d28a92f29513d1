"""Dense-vector distance expressions (l2 / cosine / ip).

Semantics match the reference exactly
(``chromadb/utils/distance_functions.py``, ``rust/distance/src/types.rs:217``,
hnswlib spec): distances are **ascending = better**.

- ``l2``     = squared euclidean  ``sum((x-y)^2)``  (NOT square-rooted)
- ``cosine`` = ``1 - dot(x,y) / (||x|| * ||y|| + 1e-30)``
- ``ip``     = ``1 - dot(x,y)``

All arithmetic is done in DOUBLE regardless of the stored element type
(testdata stores ``ARRAY<FLOAT>``), so the Spark engine and the DuckDB
oracle agree bit-for-bit up to summation order; callers round to
:data:`ROUND_DECIMALS` before emitting results to absorb non-associative
float summation differences.

These are pure Catalyst column expressions (``zip_with`` + ``aggregate``) —
they stay JVM-side inside whole-stage codegen; no Python UDF in the hot
path. The SQL twins emit the identical computation for DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SPACES = ("l2", "cosine", "ip")
NORM_EPS = 1e-30
ROUND_DECIMALS = 6


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def l2(a: Column, b: Column) -> Column:
    diffs = F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double")))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return F.lit(1.0) - dot(a, b) / (_norm(a) * _norm(b) + F.lit(NORM_EPS))


def ip(a: Column, b: Column) -> Column:
    return F.lit(1.0) - dot(a, b)


def distance(a: Column, b: Column, space: str) -> Column:
    if space == "l2":
        return l2(a, b)
    if space == "cosine":
        return cosine(a, b)
    if space == "ip":
        return ip(a, b)
    raise ValueError(f"unknown space {space!r}; expected one of {SPACES}")


# ---------------------------------------------------------------------------
# DuckDB SQL twins — same arithmetic, emitted as SQL strings for the oracle.
# `a`/`b` are SQL expressions of type FLOAT[]/DOUBLE[].
# ---------------------------------------------------------------------------


def dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


def _norm_sql(a: str) -> str:
    return (
        f"sqrt(list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    )


def l2_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
        f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
    )


def cosine_sql(a: str, b: str) -> str:
    return f"(1.0 - {dot_sql(a, b)} / ({_norm_sql(a)} * {_norm_sql(b)} + {NORM_EPS!r}))"


def ip_sql(a: str, b: str) -> str:
    return f"(1.0 - {dot_sql(a, b)})"


def distance_sql(a: str, b: str, space: str) -> str:
    if space == "l2":
        return l2_sql(a, b)
    if space == "cosine":
        return cosine_sql(a, b)
    if space == "ip":
        return ip_sql(a, b)
    raise ValueError(f"unknown space {space!r}; expected one of {SPACES}")
