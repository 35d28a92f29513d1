"""Write-ahead log materialization — the CDC net-effect merge.

Reference semantics:
- WAL record ``(seq_id, operation, id, ...)``
  (``chromadb/migrations/embeddings_queue/00001-embeddings.sqlite.sql:1-10``,
  ``chromadb/db/mixins/embeddings_queue.py:189``; distributed ``rust/wal3/``).
- Net-effect fold per id in seq order
  (``rust/worker/src/execution/operators/materialize_logs.rs:81``, states
  ``rust/types/src/operation.rs:16-35``):

  * ADD     — insert; IGNORED if the record already exists (duplicate add)
  * UPDATE  — merge non-null fields; NO-OP if the record does not exist
  * UPSERT  — insert, or merge non-null fields if it exists
  * DELETE  — remove; a later ADD/UPSERT recreates (OverwriteExisting)

Spark shape: ``repartition(id)`` (the reference's ``partition_log.rs``) then
``applyInPandas`` per id-group — the fold is inherently sequential per id
but embarrassingly parallel across ids, and groups are tiny (a handful of
log entries per record), so this scales linearly with executor count. The
Arrow boundary transfers each group once.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPS = ("ADD", "UPDATE", "UPSERT", "DELETE")
BASE_OP = "BASE"


def materialize(
    base: DataFrame | None,
    log: DataFrame,
    id_col: str = "id",
    seq_col: str = "seq_id",
    op_col: str = "op",
) -> DataFrame:
    """Fold ``log`` (in ``seq_col`` order, per ``id_col``) onto ``base``.

    Returns the new compacted state: one row per surviving id with the
    record's field columns (everything except seq/op). ``base`` rows are
    treated as pre-existing state (MaterializedLogOperation::Initial).
    """
    field_cols = [c for c in log.columns if c not in (id_col, seq_col, op_col)]
    if base is not None:
        base_aligned = base
        for c in [seq_col, op_col]:
            if c not in base.columns:
                base_aligned = base_aligned.withColumn(
                    c, F.lit(-1).cast("long") if c == seq_col else F.lit(BASE_OP)
                )
        missing = [c for c in log.columns if c not in base_aligned.columns]
        for c in missing:
            base_aligned = base_aligned.withColumn(c, F.lit(None).cast(dict(log.dtypes)[c]))
        union = base_aligned.select(*log.columns).unionByName(log)
    else:
        union = log

    out_schema = union.select(id_col, *field_cols).schema

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(seq_col, kind="mergesort")
        exists = False
        state: dict = {}
        for row in pdf.itertuples(index=False):
            d = row._asdict()
            op = d[op_col]
            if op == BASE_OP:
                exists = True
                state = {c: d[c] for c in field_cols}
            elif op == "ADD":
                if not exists:
                    exists = True
                    state = {c: d[c] for c in field_cols}
            elif op == "UPDATE":
                if exists:
                    for c in field_cols:
                        if not _is_null(d[c]):
                            state[c] = d[c]
            elif op == "UPSERT":
                if exists:
                    for c in field_cols:
                        if not _is_null(d[c]):
                            state[c] = d[c]
                else:
                    exists = True
                    state = {c: d[c] for c in field_cols}
            elif op == "DELETE":
                exists = False
                state = {}
        if not exists:
            return pd.DataFrame(columns=[id_col, *field_cols])
        return pd.DataFrame([{id_col: pdf[id_col].iloc[0], **state}])

    return union.groupBy(id_col).applyInPandas(fold, schema=out_schema)


def _is_null(v) -> bool:
    if v is None:
        return True
    try:
        result = pd.isna(v)
        return bool(result) if not hasattr(result, "__len__") else False
    except (TypeError, ValueError):
        return False


def next_seq_window(log: DataFrame, seq_col: str = "seq_id") -> int:
    """Max assigned seq + 1 (the log version a new append starts at)."""
    row = log.agg(F.max(seq_col).alias("m")).first()
    return int(row["m"]) + 1 if row["m"] is not None else 0
