"""Streaming ingest deduplication — the online half of operators/dedup.py.

A 100-TB training-data ingest dedups AT THE DOOR: a document arriving twice
within the watermark horizon must land once. Spark's
``dropDuplicatesWithinWatermark`` keeps one fingerprint per record in the
state store, expiring entries past the watermark — state is bounded by
(horizon x arrival rate), not corpus size, which is what makes exact
streaming dedup feasible. (The reference has no streaming surface — SURVEY
§2.8; its WAL add is keyed by user id, not content.)

Batch DataFrames run the same callable (``dropDuplicates`` — no watermark
needed when the whole input is visible), so the oracle-checked batch twin
and the streaming form share one code path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def content_fingerprint(text: Column) -> Column:
    """Whitespace-normalized md5 content fingerprint (the exact-dedup key
    of operators/dedup.exact_dup_groups, stable across engines)."""
    return F.md5(F.concat_ws(" ", tokens(text)))


def dedup_stream(
    records: DataFrame,
    text_col: str = "document",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    fingerprint: Column | None = None,
) -> DataFrame:
    """Keep the first arrival per content fingerprint.

    Streaming input: exact within the watermark horizon (a duplicate
    arriving later than ``watermark`` after the first may re-emit — the
    bounded-state trade, batch-compacted dedup catches stragglers).
    Batch input: plain exact dedup.
    """
    fp = fingerprint if fingerprint is not None else content_fingerprint(F.col(text_col))
    out = records.withColumn("__fp", fp)
    if out.isStreaming:
        out = out.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(["__fp"])
    else:
        out = out.dropDuplicates(["__fp"])
    return out.drop("__fp")
