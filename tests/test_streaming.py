"""Structured Streaming compactor: checkpointed incremental WAL merge,
attached-function outputs, parity with the batch materialize fold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chroma_spark.sources.log import materialize
from chroma_spark.streaming import (
    AttachedFunction,
    read_function_output,
    read_state,
    record_counter,
    revision_history,
    statistics,
    stream_compact,
)

LOG_SCHEMA = T.StructType(
    [
        T.StructField("seq_id", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("document", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

BATCH1 = [
    (0, "ADD", "a", "alpha", 1.0),
    (1, "ADD", "b", "beta", 2.0),
    (2, "ADD", "c", "gamma", 3.0),
]
BATCH2 = [
    (3, "UPDATE", "a", None, 9.0),  # partial update: document survives
    (4, "DELETE", "b", None, None),
    (5, "UPSERT", "d", "delta", 4.0),
    (6, "ADD", "a", "dup", 0.0),  # duplicate add: ignored
]


def _write_log(spark, rows, path):
    spark.createDataFrame(rows, LOG_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run(spark, log_dir, state_dir, ckpt, attached=None):
    q = stream_compact(spark, log_dir, state_dir, LOG_SCHEMA, ckpt, attached=attached)
    q.awaitTermination(120)
    return q


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "log"), str(tmp_path / "state"), str(tmp_path / "ckpt")


def test_stream_compact_incremental_matches_batch_fold(spark, dirs):
    log_dir, state_dir, ckpt = dirs
    _write_log(spark, BATCH1, log_dir)
    _run(spark, log_dir, state_dir, ckpt)
    s1 = {r.id: r for r in read_state(spark, state_dir).collect()}
    assert set(s1) == {"a", "b", "c"} and s1["a"].document == "alpha"

    _write_log(spark, BATCH2, log_dir)
    _run(spark, log_dir, state_dir, ckpt)
    s2 = {r.id: r for r in read_state(spark, state_dir).collect()}
    assert set(s2) == {"a", "c", "d"}
    assert s2["a"].document == "alpha" and s2["a"].score == 9.0  # UPDATE merged, ADD-dup ignored
    assert s2["d"].score == 4.0

    # incremental result == one-shot batch fold over the whole log
    full = materialize(None, spark.createDataFrame(BATCH1 + BATCH2, LOG_SCHEMA))
    expect = {r.id: r for r in full.collect()}
    assert {i: (r.document, r.score) for i, r in s2.items()} == {
        i: (r.document, r.score) for i, r in expect.items()
    }


def test_checkpoint_prevents_reprocessing(spark, dirs):
    log_dir, state_dir, ckpt = dirs
    _write_log(spark, BATCH1, log_dir)
    _run(spark, log_dir, state_dir, ckpt)
    v1 = read_state(spark, state_dir)
    assert v1.count() == 3
    # no new files -> no new batch -> no new base version
    import os

    versions_before = sorted(d for d in os.listdir(state_dir) if d.startswith("base_v"))
    _run(spark, log_dir, state_dir, ckpt)
    versions_after = sorted(d for d in os.listdir(state_dir) if d.startswith("base_v"))
    assert versions_before == versions_after == ["base_v1"]


def test_attached_functions_run_per_batch(spark, dirs):
    log_dir, state_dir, ckpt = dirs
    attached = [
        AttachedFunction("stats", lambda state, batch: statistics(state, ["document"])),
        AttachedFunction("counter", lambda state, batch: record_counter(state)),
        AttachedFunction("history", lambda state, batch: revision_history(batch)),
    ]
    _write_log(spark, BATCH1, log_dir)
    _run(spark, log_dir, state_dir, ckpt, attached)
    _write_log(spark, BATCH2, log_dir)
    _run(spark, log_dir, state_dir, ckpt, attached)

    counts = read_function_output(spark, state_dir, "counter").collect()
    assert sorted(r.n_records for r in counts) == [3, 3]  # 3 live after each batch

    hist = read_function_output(spark, state_dir, "history").collect()
    assert len(hist) == len(BATCH1) + len(BATCH2)  # every write archived
    a_versions = sorted((r.seq_id, r.version) for r in hist if r.id == "a")
    assert [v for _, v in a_versions] == [1, 1, 2]  # per-batch ordinals

    stats = {
        (r.key, r.value): r.n
        for r in read_function_output(spark, state_dir, "stats").collect()
    }
    assert stats[("document", "alpha")] == 1  # batch-2 run sees surviving docs


VEC_LOG_SCHEMA = T.StructType(
    [
        T.StructField("seq_id", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def test_stream_compact_maintains_ivf_index(spark, dirs):
    """index_builder runs per batch (the reference compaction writes the
    vector segment's index in the same pass): after each drain the current
    version's index exists and searches the current state."""
    from chroma_spark.ann.ivf import ivf_search, read_ivf
    from chroma_spark.streaming.compactor import ivf_index_builder, stream_compact

    log_dir, state_dir, ckpt = dirs
    rows1 = [(0, "ADD", "a", [1.0, 0.0]), (1, "ADD", "b", [0.0, 1.0])]
    rows2 = [(2, "UPSERT", "c", [0.9, 0.1]), (3, "DELETE", "b", None)]
    spark.createDataFrame(rows1, VEC_LOG_SCHEMA).coalesce(1).write.mode("append").parquet(log_dir)
    builder = ivf_index_builder(n_lists=1, replicas=1)
    q = stream_compact(
        spark, log_dir, state_dir, VEC_LOG_SCHEMA, ckpt, index_builder=builder
    )
    q.awaitTermination(120)
    spark.createDataFrame(rows2, VEC_LOG_SCHEMA).coalesce(1).write.mode("append").parquet(log_dir)
    q = stream_compact(
        spark, log_dir, state_dir, VEC_LOG_SCHEMA, ckpt, index_builder=builder
    )
    q.awaitTermination(120)

    import os

    versions = sorted(d for d in os.listdir(state_dir) if d.startswith("index_v"))
    assert versions == ["index_v1", "index_v2"]
    centroids, postings = read_ivf(spark, f"{state_dir}/index_v2")
    qdf = spark.createDataFrame([(0, [1.0, 0.0])], "query_id INT, embedding ARRAY<FLOAT>")
    top = ivf_search(centroids, postings, qdf, k=2, nprobe=1).collect()
    assert [r["id"] for r in top] == ["a", "c"]  # b deleted; c upserted

    # consecutive versions reuse the trained centroid table (no per-batch
    # k-means retrain): v2's centroids are byte-identical to v1's
    c1 = sorted(tuple(r.centroid) for r in read_ivf(spark, f"{state_dir}/index_v1")[0].collect())
    c2 = sorted(tuple(r.centroid) for r in centroids.collect())
    assert c1 == c2


def test_statistics_null_bucket(spark):
    df = spark.createDataFrame(
        [("x", None), ("x", "u"), (None, "u")], ["k1", "k2"]
    )
    out = {(r.key, r.value): r.n for r in statistics(df, ["k1", "k2"]).collect()}
    assert out[("k1", "__null__")] == 1 and out[("k2", "u")] == 2


def test_record_counter_grouped(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], ["g"])
    out = {r.g: r.n_records for r in record_counter(df, "g").collect()}
    assert out == {"a": 2, "b": 1}


def test_attach_function_lifecycle(spark, tmp_path):
    from chroma_spark.api import Client

    client = Client(spark, str(tmp_path / "fn_root"))
    col = client.create_collection("c", dimension=2)
    col.attach_function("freq", "statistics", keys=["color"])
    col.attach_function("hist", "revision_history")
    assert set(col.list_functions()) == {"freq", "hist"}

    col.add(
        ids=["a", "b", "c"],
        embeddings=[[0.0, 1.0]] * 3,
        metadatas=[{"color": "red"}, {"color": "red"}, {"color": "blue"}],
    )
    col.update(ids=["a"], metadatas=[{"color": "blue"}])
    v = col.compact()

    freq = {(r.key, r.value): r.n for r in col.read_function_output("freq").collect()}
    assert freq[("color", "blue")] == 2 and freq[("color", "red")] == 1

    hist = col.read_function_output("hist", version=v)
    by_id = {(r.id, r.version) for r in hist.select("id", "version").collect()}
    assert ("a", 1) in by_id and ("a", 2) in by_id  # pre-image archived
    assert ("b", 1) in by_id

    # detach: the next compaction writes no new output version for it
    col.detach_function("hist")
    col.add(ids=["d"], embeddings=[[1.0, 0.0]], metadatas=[{"color": "red"}])
    v2 = col.compact()
    assert col.read_function_output("freq", version=v2).count() == 2  # still runs
    import pytest as _p
    with _p.raises(Exception):
        col.read_function_output("hist", version=v2).count()


def test_attach_function_validates_kind_and_quota(spark, tmp_path):
    import pytest as _p

    from chroma_spark.api import Client
    from chroma_spark.quota import QuotaExceededError, StaticQuotaEnforcer, UsageType

    client = Client(
        spark,
        str(tmp_path / "fnq_root"),
        quota_enforcer=StaticQuotaEnforcer(limits={UsageType.NUM_FUNCTIONS: 1}),
    )
    col = client.create_collection("c", dimension=2)
    with _p.raises(ValueError, match="unknown attached-function kind"):
        col.attach_function("x", "nope")
    col.attach_function("freq", "statistics", keys=["k"])
    col.attach_function("freq", "statistics", keys=["k2"])  # re-attach same name ok
    with _p.raises(QuotaExceededError, match="num_functions"):
        col.attach_function("more", "record_counter")
    with _p.raises(Exception, match="no attached function"):
        col.detach_function("ghost")


def test_gc_prunes_point_in_time_function_outputs_keeps_history(spark, tmp_path):
    import os

    from chroma_spark.api import Client

    client = Client(spark, str(tmp_path / "fngc_root"))
    col = client.create_collection("c", dimension=2)
    col.attach_function("freq", "statistics", keys=["k"])
    col.attach_function("hist", "revision_history")
    versions = []
    for i in range(3):
        col.add(ids=[f"r{i}"], embeddings=[[float(i), 0.0]], metadatas=[{"k": i % 2}])
        versions.append(col.compact())

    coll_dir = os.path.join(col._store.catalog.root, col._store.name)
    col.gc(keep_last=1, grace_seconds=0)
    freq_dirs = sorted(os.listdir(os.path.join(coll_dir, "fn_freq")))
    hist_dirs = sorted(os.listdir(os.path.join(coll_dir, "fn_hist")))
    assert freq_dirs == [f"v{versions[-1]}"]  # stale snapshots pruned
    assert hist_dirs == [f"v{v}" for v in versions]  # archive intact
    assert col.read_function_output("freq").count() > 0


def test_stream_compact_maintains_minhash_band_table(spark, dirs):
    """minhash_index_builder keeps the LSH band table per version: rows for
    unchanged (id, fingerprint) pairs carry over, updated docs re-shingle,
    deletes drop out — and the maintained table drives incremental dedup."""
    from chroma_spark.operators.dedup import minhash_incremental_pairs
    from chroma_spark.streaming.compactor import minhash_index_builder, stream_compact

    log_dir, state_dir, ckpt = dirs
    d1 = "the quick brown fox jumps over the lazy dog one two three"
    d2 = "completely different content about spark exchanges and shuffles"
    d3 = "the quick brown fox jumps over the lazy dog one two four"
    _write_log(spark, [(0, "ADD", "a", d1, 1.0), (1, "ADD", "b", d2, 2.0)], log_dir)
    builder = minhash_index_builder(num_perm=16, bands=4, n=3)
    q = stream_compact(spark, log_dir, state_dir, LOG_SCHEMA, ckpt, index_builder=builder)
    q.awaitTermination(120)
    _write_log(
        spark,
        [(2, "UPDATE", "b", d2 + " updated", 2.0), (3, "UPSERT", "c", d3, 3.0)],
        log_dir,
    )
    q = stream_compact(spark, log_dir, state_dir, LOG_SCHEMA, ckpt, index_builder=builder)
    q.awaitTermination(120)

    v1 = spark.read.parquet(f"{state_dir}/index_v1/bands")
    v2 = spark.read.parquet(f"{state_dir}/index_v2/bands")
    rows1 = {(r.id, r.band, r.bh, r.fp) for r in v1.collect()}
    rows2 = {(r.id, r.band, r.bh, r.fp) for r in v2.collect()}
    a1 = {t for t in rows1 if t[0] == "a"}
    assert a1 and a1 == {t for t in rows2 if t[0] == "a"}  # unchanged: carried over
    b1_fp = {t[3] for t in rows1 if t[0] == "b"}
    b2_fp = {t[3] for t in rows2 if t[0] == "b"}
    assert b1_fp and b2_fp and b1_fp != b2_fp  # updated doc re-fingerprinted
    assert {t[0] for t in rows2} == {"a", "b", "c"}

    # the maintained table serves incremental dedup of the next batch
    from chroma_spark.streaming.compactor import read_state

    new_batch = spark.createDataFrame(
        [("n1", "the quick brown fox jumps over the lazy dog one two five")],
        "id STRING, document STRING",
    )
    state = read_state(spark, state_dir).select("id", "document")
    pairs = minhash_incremental_pairs(new_batch, state, v2.drop("fp"), 0.5)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert ("a", "n1") in found and ("c", "n1") in found
    assert all("b" not in p for p in found)


def test_attach_quality_score_runs_at_compaction(spark, tmp_path):
    """quality_score as a persisted attached function: the trained model's
    weights live in the collection config, every compaction scores the new
    state, and a cold re-open re-creates the identical scorer."""
    from chroma_spark.api import Client

    client = Client(spark, str(tmp_path / "q_root"))
    col = client.create_collection("cq", dimension=2)
    model = {"dim": 64, "intercept": -0.1, "weights": [0.02 * i - 0.6 for i in range(64)]}
    col.attach_function("qs", "quality_score", **model)

    col.add(
        ids=["a", "b"],
        embeddings=[[0.0, 1.0], [1.0, 0.0]],
        documents=["the quick brown fox jumps", "zzz qqq zzz qqq zzz"],
    )
    v = col.compact()
    out = {r.id: r for r in col.read_function_output("qs", version=v).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"].n_tokens == 5 and 0.0 < out["a"].score < 1.0

    # scores match the standalone operator on the same text
    from chroma_spark.operators.quality_model import score_quality

    docs = spark.createDataFrame(
        [("a", "the quick brown fox jumps"), ("b", "zzz qqq zzz qqq zzz")],
        "id STRING, document STRING",
    )
    direct = {r.id: r.score for r in score_quality(docs, model).collect()}
    assert {k: v.score for k, v in out.items()} == direct

    # cold re-open: the persisted spec still validates and still runs
    col2 = Client(spark, str(tmp_path / "q_root")).get_collection("cq")
    col2.add(ids=["c"], embeddings=[[0.5, 0.5]], documents=["plain simple words here"])
    v2 = col2.compact()
    assert col2.read_function_output("qs", version=v2).count() == 3


def test_attach_lm_perplexity_runs_at_compaction(spark, tmp_path):
    """lm_perplexity as a persisted attached function: every compaction
    re-trains the in-domain bigram LM on the new state and scores it; a
    cold re-open re-creates the identical scorer from the persisted spec."""
    from chroma_spark.api import Client

    client = Client(spark, str(tmp_path / "lm_root"))
    col = client.create_collection("clm", dimension=2)
    col.attach_function("ppl", "lm_perplexity", add_k=0.5)

    col.add(
        ids=["a", "b", "c"],
        embeddings=[[0.0, 1.0], [1.0, 0.0], [0.5, 0.5]],
        documents=["the cat sat on the mat", "the cat sat on the mat", "xq zv wk yj"],
    )
    v = col.compact()
    out = {r.id: r for r in col.read_function_output("ppl", version=v).collect()}
    assert set(out) == {"a", "b", "c"}
    # repeated in-distribution docs score below the gibberish doc
    assert out["a"].ppl == out["b"].ppl < out["c"].ppl

    # matches the standalone operator self-trained on the same state
    from chroma_spark.operators.lm import lm_perplexity

    docs = spark.createDataFrame(
        [("a", "the cat sat on the mat"), ("b", "the cat sat on the mat"), ("c", "xq zv wk yj")],
        "id STRING, document STRING",
    )
    direct = {r.id: r.ppl for r in lm_perplexity(docs).collect()}
    assert {k: r.ppl for k, r in out.items()} == direct

    # cold re-open: persisted spec validates, next compaction re-scores ALL
    # state under the updated corpus distribution
    col2 = Client(spark, str(tmp_path / "lm_root")).get_collection("clm")
    col2.add(ids=["d"], embeddings=[[0.2, 0.8]], documents=["the dog sat on the rug"])
    v2 = col2.compact()
    out2 = col2.read_function_output("ppl", version=v2)
    assert out2.count() == 4
    assert out2.filter("id = 'a'").collect()[0].ppl != out["a"].ppl  # corpus changed


def test_attach_bpe_vocab_runs_at_compaction(spark, tmp_path):
    """bpe_vocab as a persisted attached function: compaction re-learns
    the merge table from the new state and writes the symbol histogram;
    learned-merge symbols carry their rank, base characters don't."""
    from chroma_spark.api import Client
    from chroma_spark.operators.bpe import EOW, bpe_symbol_frequencies, bpe_train

    client = Client(spark, str(tmp_path / "bpe_root"))
    col = client.create_collection("cbpe", dimension=2)
    col.attach_function("vocab", "bpe_vocab", n_merges=4)
    col.add(
        ids=["a", "b", "c"],
        embeddings=[[0.0, 1.0], [1.0, 0.0], [0.5, 0.5]],
        documents=["the the the cat", "the cat cat", "dog"],
    )
    v = col.compact()
    out = {r.symbol: r for r in col.read_function_output("vocab", version=v).collect()}
    docs = spark.createDataFrame(
        [("a", "the the the cat"), ("b", "the cat cat"), ("c", "dog")],
        "id STRING, document STRING",
    )
    merges = bpe_train(docs, 4)
    direct = {r.symbol: r.freq for r in bpe_symbol_frequencies(docs, merges).collect()}
    assert {s: r.freq for s, r in out.items()} == direct
    rank_of: dict = {}
    for i, (a, b) in enumerate(merges):
        rank_of.setdefault(a + b, i + 1)
    for s, r in out.items():
        assert r.merge_rank == rank_of.get(s), s
    # the most frequent word collapses to few symbols: "the" appears 4x
    assert any(s.endswith(EOW) and out[s].freq >= 4 for s in out if len(s) > len(EOW))
