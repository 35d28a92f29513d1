"""Event-time windows with watermarks and applyInPandasWithState running
state, run as real streaming queries (file source, checkpointed)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chroma_spark.streaming.windows import running_user_stats, windowed_counts

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _t(minute):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60)


BATCH1 = [
    (_t(5), 1, "click", 1.0),
    (_t(20), 1, "click", 2.0),
    (_t(65), 2, "view", 3.0),
]
BATCH2 = [
    (_t(70), 1, "click", 4.0),
    (_t(30), 2, "click", 5.0),  # late but within watermark
]


def _write(spark, rows, path):
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _drain(stream_df, ckpt, sink_dir):
    def append(batch, batch_id):
        if not batch.isEmpty():
            batch.write.mode("append").parquet(sink_dir)

    q = (
        stream_df.writeStream.foreachBatch(append)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_windowed_counts_streaming_with_late_data(spark, tmp_path):
    src, ckpt = str(tmp_path / "events"), str(tmp_path / "ckpt")
    _write(spark, BATCH1, src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    sink = str(tmp_path / "win_sink")
    wc = windowed_counts(stream, window="1 hour", watermark="2 hours", keys=("event_type",))
    _drain(wc, ckpt, sink)
    _write(spark, BATCH2, src)
    _drain(wc, ckpt, sink)

    # update mode re-emits a (window, key) on change; highest n wins
    rows = spark.read.parquet(sink).collect()
    latest = {}
    for r in rows:
        k = (r.window_start, r.event_type)
        if k not in latest or r.n > latest[k][0]:
            latest[k] = (r.n, r.sum_value)
    # hour 0 clicks: 2 from batch1, +1 late row within watermark -> 3 total
    assert latest[(_t(0), "click")] == (3, 8.0)
    assert latest[(_t(60), "view")] == (1, 3.0)
    assert latest[(_t(60), "click")] == (1, 4.0)


def test_windowed_counts_batch_twin(spark):
    df = spark.createDataFrame(BATCH1 + BATCH2, EVENT_SCHEMA)
    out = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in windowed_counts(df).collect()
    }
    assert out[(_t(0), "click")] == (3, 8.0)


def test_running_user_stats_state_persists_across_triggers(spark, tmp_path):
    src, ckpt = str(tmp_path / "events"), str(tmp_path / "ckpt")
    _write(spark, BATCH1, src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    sink = str(tmp_path / "stats_sink")
    stats = running_user_stats(stream)
    _drain(stats, ckpt, sink)
    first = {r.user_id: (r.n_events, r.sum_value) for r in spark.read.parquet(sink).collect()}
    assert first[1] == (2, 3.0) and first[2] == (1, 3.0)

    _write(spark, BATCH2, src)
    _drain(stats, ckpt, sink)
    rows = spark.read.parquet(sink).collect()
    latest = {}
    for r in rows:  # the sink appends updates; keep the max-n per user
        if r.user_id not in latest or r.n_events > latest[r.user_id][0]:
            latest[r.user_id] = (r.n_events, r.sum_value)
    # state carried: user 1 = 2 (batch1) + 1 (batch2), user 2 = 1 + 1
    assert latest[1] == (3, 7.0)
    assert latest[2] == (2, 8.0)


DOC_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("document", T.StringType()),
    ]
)


def test_streaming_dedup_across_triggers(spark, tmp_path):
    """dropDuplicatesWithinWatermark ingest dedup: a document re-arriving
    in a LATER trigger (same content, different whitespace) is dropped;
    state is keyed by the content fingerprint."""
    from chroma_spark.streaming.dedup import dedup_stream

    src, ckpt, sink = (str(tmp_path / d) for d in ("docs", "ckpt", "sink"))
    _write_rows = lambda rows: (
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    )
    _write_rows([(_t(1), 1, "alpha beta"), (_t(2), 2, "gamma delta")])
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(src)
    dd = dedup_stream(stream, watermark="2 hours")
    _drain(dd, ckpt, sink)
    _write_rows([(_t(10), 3, "alpha  beta"), (_t(11), 4, "epsilon")])  # 3 = dup of 1
    _drain(dd, ckpt, sink)

    out = sorted(r.doc_id for r in spark.read.parquet(sink).collect())
    assert out == [1, 2, 4]


def test_batch_dedup_twin(spark):
    from chroma_spark.streaming.dedup import dedup_stream

    df = spark.createDataFrame(
        [(_t(1), 1, "x y"), (_t(2), 2, "x  y"), (_t(3), 3, "z")], DOC_SCHEMA
    )
    kept = sorted(r.doc_id for r in dedup_stream(df).collect())
    assert kept in ([1, 3], [2, 3])  # one of the dups survives


def test_sessionize_gap_boundary(spark):
    """Spark merges at the exact-gap boundary (inclusive windows); a new
    session starts only when the gap is STRICTLY greater than the session
    gap — the oracle's gaps-and-islands break uses > accordingly."""
    from chroma_spark.streaming.windows import sessionize

    gap_us = 30 * 60 * 1_000_000
    rows = [
        (1, 0, 1.0),
        (1, gap_us, 2.0),                # exactly gap after -> SAME session
        (1, 2 * gap_us + 1, 4.0),        # gap+1 after prev -> new session
        (2, 0, 8.0),
    ]
    out = sessionize(
        spark.createDataFrame(rows, "user_id INT, tsu BIGINT, value DOUBLE"),
        gap="30 minutes",
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    s1 = sorted(by_user[1], key=lambda r: r["session_start_us"])
    assert len(s1) == 2
    assert s1[0]["n_events"] == 2 and s1[0]["total_value"] == 3.0
    assert s1[0]["session_end_us"] == 2 * gap_us  # last event + gap
    assert s1[1]["n_events"] == 1 and s1[1]["total_value"] == 4.0
    assert len(by_user[2]) == 1 and by_user[2][0]["n_events"] == 1
