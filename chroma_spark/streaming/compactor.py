"""Structured Streaming WAL compactor.

The reference's async compaction loop (scheduler -> CompactOrchestrator ->
fetch/partition/materialize logs -> apply -> register new version,
`rust/worker/src/execution/orchestration/compact.rs:54-70`) re-expressed as
the idiomatic Spark shape: ``readStream`` over the append-only WAL
directory, ``foreachBatch`` doing the net-effect merge (sources/log.py
``materialize``), versioned base snapshots standing in for the sysdb
``register`` step, and attached functions piggybacking on each batch
(`execute_task.rs`, SURVEY §3.3).

Scale notes:
- the file stream source tracks processed files in the checkpoint — exactly
  the reference's ``log_position`` cursor; restart-safe, each WAL fragment
  processed once (`maxFilesPerTrigger` bounds batch size for steady-state
  runs; ``availableNow`` drains the backlog then stops).
- the merge itself repartitions by id (partition_log.rs analog) inside
  ``materialize``; base + batch are the only inputs, so compaction cost is
  O(base + new-log), not O(total-log-history).
- versioned base dirs (``base_v{N}``) make snapshot writes atomic-ish
  without a table format: readers of v(N-1) are never disturbed; a real
  deployment swaps this for Delta/Iceberg MERGE with optimistic commit.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..sources.log import materialize


@dataclass
class AttachedFunction:
    """A derived computation run on every compaction batch.

    ``fn(state_df, log_batch_df) -> DataFrame`` — receives the NEW compacted
    state and the raw log batch; the result is appended under
    ``{state_dir}/fn_{name}/batch_{id}`` (the "output collection").
    """

    name: str
    fn: Callable[[DataFrame, DataFrame], DataFrame]


def _current_version(state_dir: str) -> int:
    if not os.path.isdir(state_dir):
        return 0
    versions = [
        int(d.split("_v")[1]) for d in os.listdir(state_dir) if d.startswith("base_v")
    ]
    return max(versions, default=0)


def read_state(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Latest compacted snapshot, or None before the first compaction."""
    v = _current_version(state_dir)
    return spark.read.parquet(f"{state_dir}/base_v{v}") if v else None


def stream_compact(
    spark: SparkSession,
    log_dir: str,
    state_dir: str,
    log_schema: T.StructType,
    checkpoint_dir: str,
    attached: list[AttachedFunction] | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    index_builder: Callable[[DataFrame, str], None] | None = None,
):
    """Run the WAL->base compaction as a streaming query.

    Returns the StreamingQuery; with ``available_now`` it drains the current
    backlog and stops (call ``.awaitTermination()``), otherwise it runs
    continuously as new WAL fragments land.

    ``index_builder(state_df, index_path)`` runs after each batch's base
    write — the reference's compaction writes the vector-segment index in
    the same pass; :func:`ivf_index_builder` gives the canonical one. The
    per-version index lands under ``{state_dir}/index_v{N}``.
    """
    reader = spark.readStream.schema(log_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(log_dir)

    def compact_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        s = batch.sparkSession
        base = read_state(s, state_dir)
        merged = materialize(base, batch)
        new_v = _current_version(state_dir) + 1
        merged.write.mode("overwrite").parquet(f"{state_dir}/base_v{new_v}")
        state = s.read.parquet(f"{state_dir}/base_v{new_v}")
        if index_builder is not None:
            index_builder(state, f"{state_dir}/index_v{new_v}")
        for af in attached or []:
            af.fn(state, batch).write.mode("overwrite").parquet(
                f"{state_dir}/fn_{af.name}/batch_{batch_id}"
            )

    writer = stream.writeStream.foreachBatch(compact_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ivf_index_builder(
    n_lists: int = 16,
    replicas: int = 2,
    id_col: str = "id",
    vec_col: str = "embedding",
    retrain_every: int = 10,
) -> Callable[[DataFrame, str], None]:
    """Canonical per-batch index builder: IVF over the new state, written
    in the partitioned deployment layout (write_ivf).

    K-means does NOT retrain per batch: when the previous version's
    centroid table exists it is reused and the batch pays only the
    broadcast assignment pass (SPANN's incremental-head discipline — the
    Collection-level compact() goes further with epoch-stamped delta
    appends). Retraining happens every ``retrain_every`` versions to absorb
    distribution drift; pass 1 to restore the old per-batch retrain."""

    def build(state: DataFrame, path: str) -> None:
        from pyspark.sql import functions as F

        from ..ann.ivf import assign_to_centroids, build_ivf, write_ivf

        records = state.filter(F.col(vec_col).isNotNull()).select(id_col, vec_col)
        if records.isEmpty():
            return
        spark = state.sparkSession
        version = int(path.rsplit("_v", 1)[1]) if "_v" in path else 0
        prev_centroids_dir = f"{path.rsplit('_v', 1)[0]}_v{version - 1}/centroids"
        centroids = None
        if version % max(1, retrain_every) != 0 and os.path.isdir(prev_centroids_dir):
            # Validate before reuse: a reconfigured builder (n_lists changed)
            # or a corrupt/partial previous write must trigger a fresh train,
            # not silently serve centroids with the wrong list count.
            try:
                prev = spark.read.parquet(prev_centroids_dir)
                if prev.count() == n_lists:
                    centroids = prev
            except Exception:
                centroids = None
        if centroids is None:
            centroids, postings = build_ivf(
                records, n_lists=n_lists, replicas=replicas, assign_method="arrow"
            )
        else:
            postings = assign_to_centroids(
                records, centroids, replicas, id_col=id_col, vec_col=vec_col, method="arrow"
            )
        write_ivf(centroids, postings, path)

    return build


def minhash_index_builder(
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "document",
    id_col: str = "id",
) -> Callable[[DataFrame, str], None]:
    """Per-batch maintainer of the incremental-dedup LSH band table
    (operators/dedup.write_minhash_index layout + a content fingerprint).

    Incremental discipline: band rows carry ``fp = md5(text)``; rows whose
    ``(id, fp)`` still exists in the new state are KEPT from the previous
    version (zero recompute), deleted ids drop out, and only new/updated
    documents are re-shingled — per-batch cost is O(changed docs), not
    O(corpus). The written ``{path}/bands`` table feeds
    ``minhash_incremental_pairs`` directly, so a streaming pipeline can
    dedup each incoming batch against everything compacted so far."""

    def build(state: DataFrame, path: str) -> None:
        from pyspark.sql import functions as F

        from ..operators.dedup import minhash_bands, minhash_signatures

        records = state.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias("id"),
            F.col(text_col).alias("document"),
            F.md5(F.col(text_col)).alias("fp"),
        )
        spark = state.sparkSession
        version = int(path.rsplit("_v", 1)[1]) if "_v" in path else 0
        prev_dir = f"{path.rsplit('_v', 1)[0]}_v{version - 1}/bands"
        keep = None
        todo = records
        if os.path.isdir(prev_dir):
            try:
                prev = spark.read.parquet(prev_dir)
                live = records.select("id", "fp")
                keep = prev.join(live, ["id", "fp"], "semi")
                todo = records.join(prev.select("id", "fp").distinct(), ["id", "fp"], "anti")
            except Exception:
                keep, todo = None, records
        rows = num_perm // bands
        fresh = minhash_bands(
            minhash_signatures(todo, num_perm, n, "document", "id"), bands, rows, "id"
        ).join(todo.select("id", "fp"), "id")
        out = fresh if keep is None else keep.unionByName(fresh)
        out.repartition("band").write.mode("overwrite").partitionBy("band").parquet(
            f"{path}/bands"
        )

    return build


def read_function_output(spark: SparkSession, state_dir: str, name: str) -> DataFrame:
    """Union of an attached function's per-batch outputs (its collection)."""
    return spark.read.parquet(f"{state_dir}/fn_{name}/batch_*")
