"""``Limit {offset, limit}`` pagination.

Reference: ``chromadb/execution/expression/operator.py:546-593`` and
``rust/worker/src/execution/operators/limit.rs:23-36`` — without a rank the
result is ordered by the internal insertion offset id; with a rank, by score
ascending. Spark ≥3.4 has a native ``DataFrame.offset``; the global sort is
a single range-partitioned shuffle of only the (already-filtered) candidate
set, and Catalyst turns sort+limit into TakeOrderedAndProject when the page
is small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def page(df: DataFrame, order_cols: list[Column], offset: int = 0, limit: int | None = None) -> DataFrame:
    out = df.orderBy(*order_cols)
    if offset:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)
    return out


def page_sql(base_sql: str, order_by: str, offset: int = 0, limit: int | None = None) -> str:
    out = f"SELECT * FROM ({base_sql}) ORDER BY {order_by}"
    if limit is not None:
        out += f" LIMIT {limit}"
    if offset:
        out += f" OFFSET {offset}"
    return out
