"""Event-time windowed aggregation + custom stateful operators.

The reference has no event-time windows or watermarks (SURVEY §2.8) — its
streaming story is the WAL/compaction loop (compactor.py). These are the
Spark-native streaming operators a 100-TB ingest pipeline adds on top: late
-data-tolerant windowed rollups over the event stream, and per-key running
state (the `record_counter`/session analog) via ``applyInPandasWithState``.

Scale notes:
- watermark + tumbling window is the canonical streaming agg: state size is
  bounded by (watermark horizon / window) × key cardinality; late rows
  beyond the watermark are dropped, not buffered forever.
- ``applyInPandasWithState`` keeps per-key state in the state store
  (RocksDB-backed on a real cluster); the fold function sees Arrow batches
  per key — same shape as the WAL materialize fold, but incremental.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    window: str = "1 hour",
    watermark: str = "2 hours",
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling event-time window aggregation with a late-data watermark.

    Works identically on a batch or streaming DataFrame (same API) — the
    batch twin is what the `events_hourly_window` oracle query checks.
    """
    aggs = [F.count("*").alias("n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), *[F.col(k) for k in keys])
        .agg(*aggs)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            *[c for c in ("n", "sum_value") if value_col is not None or c == "n"],
        )
    )


RUNNING_STATS_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)

RUNNING_STATS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def running_user_stats(events: DataFrame, key_col: str = "user_id", value_col: str = "value") -> DataFrame:
    """Per-key running (count, sum) maintained across triggers in the state
    store — the incremental form of the record_counter attached function.

    Emits the updated totals for every key seen in the trigger.
    """

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [total]})

    return events.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=RUNNING_STATS_OUTPUT,
        stateStructType=RUNNING_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    ts_micros_col: str = "tsu",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessionization via Spark's native ``session_window``.

    The streaming-capable form of gaps-and-islands. Spark merges sessions
    whose windows touch INCLUSIVELY (an event exactly ``gap`` after the
    previous one still extends the session); a new session starts only when
    the gap is strictly greater than ``gap``. One shuffle on the session key; in
    streaming the same expression composes with ``withWatermark`` and the
    state store holds only open sessions.

    Input needs ``ts_micros_col`` as epoch MICROS (BIGINT) — timezone-free
    and exactly comparable across engines. Output:
    ``(key, session_start_us, session_end_us, n_events, total_value)``
    with ``session_end_us = last event + gap`` (Spark's window end).
    """
    tsm = F.timestamp_micros(F.col(ts_micros_col))
    return (
        events.groupBy(
            F.col(key_col), F.session_window(tsm, gap).alias("w")
        )
        .agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum(value_col), 6) + F.lit(0.0)).alias("total_value"),
        )
        .select(
            key_col,
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
            "n_events",
            "total_value",
        )
    )
