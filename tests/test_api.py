"""Write-surface tests: add/update/upsert/delete/get/query/count/peek/fork,
WAL materialization semantics (operation.rs:16-35 fixture T6), compaction,
and conditional-commit version checks.
"""

from __future__ import annotations

import pytest

from chroma_spark.api import Client
from chroma_spark.sources.collection import CollectionError, StaleReadError


@pytest.fixture()
def client(spark, tmp_path):
    return Client(spark, str(tmp_path / "store"))


def _mk(client, name="c1", dim=4):
    col = client.create_collection(name, dimension=dim, space="l2")
    col.add(
        ids=["a", "b", "c"],
        embeddings=[[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0]],
        documents=["alpha doc", "beta doc", None],
        metadatas=[{"k": 1, "tag": "x"}, {"k": 2, "tag": "y"}, {"k": 3}],
    )
    return col


def test_add_get_count(client):
    col = _mk(client)
    assert col.count() == 3
    rows = col.get(where={"k": {"$gte": 2}})
    assert sorted(r["id"] for r in rows) == ["b", "c"]
    # missing-key semantics: $ne matches the record without 'tag'
    rows = col.get(where={"tag": {"$ne": "x"}})
    assert sorted(r["id"] for r in rows) == ["b", "c"]


def test_duplicate_add_rejected(client):
    col = _mk(client)
    with pytest.raises(CollectionError, match="duplicate"):
        col.add(ids=["a"], embeddings=[[9.0, 0, 0, 0]])
    assert col.count() == 3


def test_update_partial_fields(client):
    col = _mk(client)
    col.update(ids=["a"], documents=["alpha v2"], metadatas=[{"k": 10}])
    row = col.get(ids=["a"])[0]
    assert row["document"] == "alpha v2"
    assert row["k"] == 10
    assert row["tag"] == "x"  # untouched field survives partial update
    # update of nonexistent id is a no-op
    col.update(ids=["zz"], documents=["ghost"])
    assert col.count() == 3


def test_upsert_insert_and_update(client):
    col = _mk(client)
    col.upsert(ids=["c", "d"], documents=["gamma doc", "delta doc"],
               embeddings=[None, [1.0, 1, 0, 0]])
    assert col.count() == 4
    assert col.get(ids=["c"])[0]["document"] == "gamma doc"
    assert col.get(ids=["d"])[0]["document"] == "delta doc"


def test_delete_and_recreate(client):
    col = _mk(client)
    col.delete(ids=["b"])
    assert col.count() == 2
    # delete -> add recreates (OverwriteExisting)
    col.add(ids=["b"], embeddings=[[0, 9.0, 0, 0]], documents=["beta v2"])
    row = col.get(ids=["b"])[0]
    assert row["document"] == "beta v2"
    assert row.get("tag") is None  # old state gone
    # delete by where
    col.delete(where={"k": {"$eq": 1}})
    assert sorted(r["id"] for r in col.get()) == ["b", "c"]


def test_add_records_bulk_ingest_distributed(client, spark):
    """add_records appends a whole DataFrame to the WAL (the 100-TB ingest
    path): parity with list-based add, dup rejection, UPSERT merge, seq
    cursor interleaving with the list API, and compaction fold."""
    col = client.create_collection("bulk", dimension=2, space="l2")
    df = spark.createDataFrame(
        [("a", [1.0, 0.0], "alpha doc", 1), ("b", [0.0, 1.0], "beta doc", 2), ("c", [0.5, 0.5], None, 3)],
        "id STRING, embedding ARRAY<FLOAT>, document STRING, k LONG",
    )
    assert col.add_records(df) == 3
    assert col.count() == 3
    rows = {r["id"]: r for r in col.get()}
    assert rows["a"]["document"] == "alpha doc" and rows["b"]["k"] == 2
    assert [r["id"] for r in col.get(where={"k": {"$gte": 2}})] != []

    with pytest.raises(CollectionError, match="duplicate"):
        col.add_records(df)
    with pytest.raises(CollectionError, match="'id' column"):
        col.add_records(df.drop("id"))
    with pytest.raises(CollectionError, match="reserved"):
        col.add_records(df.withColumnRenamed("k", "seq_id"))
    with pytest.raises(CollectionError, match="unsupported metadata"):
        col.add_records(df.withColumn("bad", F_create_map()))

    # bulk UPSERT merges non-null fields; list API interleaves cleanly after
    up = spark.createDataFrame(
        [("a", None, "alpha v2", None), ("d", [0.9, 0.1], "delta doc", 4)],
        "id STRING, embedding ARRAY<FLOAT>, document STRING, k LONG",
    )
    assert col.add_records(up, op="UPSERT") == 2
    assert col.count() == 4
    got = {r["id"]: r for r in col.get()}
    assert got["a"]["document"] == "alpha v2" and got["a"]["k"] == 1  # merge kept k
    col.add(ids=["e"], embeddings=[[0.1, 0.9]])  # list API after bulk: cursor advanced
    assert col.count() == 5
    assert col.get()[-1]["id"] == "e"  # insertion-offset pagination still last

    col.compact()
    assert col.count() == 5
    res = col.query([[0.9, 0.1]], n_results=1)
    assert res["ids"][0] == ["d"]

    # dimension guard
    with pytest.raises(CollectionError, match="dimension"):
        col.add_records(
            spark.createDataFrame([("z", [1.0, 0.0, 0.0])], "id STRING, embedding ARRAY<FLOAT>")
        )


def F_create_map():
    from pyspark.sql import functions as F

    return F.create_map(F.lit("x"), F.lit(1))


def test_delete_records_bulk_and_decontam_composition(client, spark):
    """delete_records removes a DataFrame of ids — the shape a dedup or
    decontamination pass produces — without driver-side lists."""
    from chroma_spark.operators.decontam import ngram_contamination

    col = client.create_collection("bulkdel", dimension=2)
    docs = [
        ("a", "the quick brown fox jumps"),
        ("b", "totally original content here"),
        ("c", "again the quick brown fox appears"),
    ]
    col.add_records(
        spark.createDataFrame(
            [(i, [1.0, 0.0], d) for i, d in docs],
            "id STRING, embedding ARRAY<FLOAT>, document STRING",
        )
    )
    eval_set = spark.createDataFrame(
        [("e1", "saw the quick brown fox leap")], "id STRING, document STRING"
    )
    contaminated = ngram_contamination(
        col.snapshot().select("id", "document"), eval_set, n=4
    )
    assert col.delete_records(contaminated) == 2
    assert sorted(r["id"] for r in col.get()) == ["b"]
    col.compact()
    assert col.count() == 1
    with pytest.raises(CollectionError, match="'id' column"):
        col.delete_records(eval_set.drop("id"))


def test_add_records_duplicate_ids_need_order_by(client, spark):
    """Duplicate ids within one UPDATE/UPSERT batch are rejected unless an
    order_by column makes the winner deterministic; with order_by the LAST
    row in sort order wins the WAL fold — reproducible across partition
    layouts (ADVICE r4: monotonically_increasing_id alone made it
    layout-dependent)."""
    col = client.create_collection("bulkdup", dimension=2)
    col.add_records(
        spark.createDataFrame(
            [("a", [1.0, 0.0], "v0")], "id STRING, embedding ARRAY<FLOAT>, document STRING"
        )
    )
    dup = spark.createDataFrame(
        [("a", None, "v1", 1), ("a", None, "v3", 3), ("a", None, "v2", 2)],
        "id STRING, embedding ARRAY<FLOAT>, document STRING, rev LONG",
    ).repartition(3)
    with pytest.raises(CollectionError, match="order_by"):
        col.add_records(dup, op="UPSERT")
    with pytest.raises(CollectionError, match="order_by columns"):
        col.add_records(dup, op="UPSERT", order_by="nope")
    assert col.add_records(dup, op="UPSERT", order_by="rev") == 3
    got = {r["id"]: r for r in col.get()}
    assert got["a"]["document"] == "v3" and got["a"]["rev"] == 3
    # order_by never legalizes duplicates in an ADD batch
    with pytest.raises(CollectionError, match="duplicate"):
        client.create_collection("bulkdup2", dimension=2).add_records(
            dup.select("id", "embedding", "document", "rev"), order_by="rev"
        )


def test_add_records_auto_embeds_with_attached_ef(client, spark):
    col = client.create_collection(
        "bulkef", embedding_function="hashing", embedding_function_kwargs={"dim": 16}
    )
    df = spark.createDataFrame(
        [("a", "alpha beta"), ("b", "gamma delta")], "id STRING, document STRING"
    )
    assert col.add_records(df) == 2
    rows = col.get(include=["embeddings", "documents"])
    assert all(len(r["embedding"]) == 16 for r in rows)
    # the Arrow-embedded vectors match the client-side EF exactly
    res = col.query(query_texts=["alpha beta"], n_results=1)
    assert res["ids"][0] == ["a"] and res["distances"][0][0] < 1e-6


def test_query_knn_and_read_levels(client):
    col = _mk(client)
    res = col.query([[1.0, 0, 0, 0]], n_results=2)
    assert res["ids"][0][0] == "a"
    assert res["distances"][0][0] == 0.0
    col.compact()
    # pre-compaction write visible at index_and_wal, not at index_only
    col.add(ids=["e"], embeddings=[[0.9, 0, 0, 0]])
    assert col.count() == 4
    assert col.count(read_level="index_only") == 3
    # bounded-staleness read: WAL tail cut at a scouted seq_id
    col.add(ids=["f"], embeddings=[[0.8, 0, 0, 0]])
    full = col.snapshot("index_and_wal")
    tail_seqs = sorted(
        r["seq_id"] for r in col._store.read_log().select("seq_id").collect()
    )
    bounded = col.snapshot("index_and_bounded_wal", log_bound=tail_seqs[0])
    assert bounded.count() == 4  # "e" visible, "f" (later seq) not
    assert full.count() == 5
    import pytest as _pytest

    with _pytest.raises(ValueError):
        col.snapshot("index_and_bounded_wal")


def test_compact_then_same_results(client):
    col = _mk(client)
    col.update(ids=["a"], metadatas=[{"k": 99}])
    before = sorted((r["id"], r.get("k")) for r in col.get())
    v = col.compact()
    assert v == 1
    after = sorted((r["id"], r.get("k")) for r in col.get())
    assert before == after


def test_fork_zero_copy_divergence(client):
    col = _mk(client)
    fork = col.fork("c1-fork")
    fork.add(ids=["z"], embeddings=[[0, 0, 0, 1.0]])
    assert fork.count() == 4
    assert col.count() == 3  # parent unaffected


def test_conditional_commit_version_check(client):
    col = _mk(client)
    meta = col._store.meta
    with pytest.raises(CollectionError, match="conditional commit"):
        col._store.catalog.update(meta, expected_version=42)


def test_search_on_collection(client):
    col = _mk(client)
    df = col.search(
        rank={"$knn": {"query": [1.0, 0, 0, 0], "limit": 3}},
        limit=2,
        select=["id"],
    )
    rows = df.collect()
    assert [r["id"] for r in rows] == ["a", "d"] or rows[0]["id"] == "a"


def test_search_select_special_keys(client):
    """#-key selection (operator.py:1239-1326): #document/#embedding map to
    record fields, #metadata expands to every metadata column."""
    col = _mk(client)
    rank = {"$knn": {"query": [1.0, 0, 0, 0], "limit": 3}}
    df = col.search(rank=rank, select=["#id", "#document", "#metadata"])
    assert set(df.columns) == {"id", "document", "k", "tag", "score"}
    df2 = col.search(rank=rank, select=["#embedding", "#score"])
    assert set(df2.columns) == {"embedding", "score"}
    with pytest.raises(ValueError, match="unknown special"):
        col.search(rank=rank, select=["#nope"])


def test_peek(client):
    col = _mk(client)
    assert len(col.peek(limit=2)) == 2


# ---------------------------------------------------------------------------
# Tenant / database namespaces + Collection.modify
# ---------------------------------------------------------------------------


def test_tenant_database_namespacing(spark, tmp_path):
    from chroma_spark.api import Client

    root = str(tmp_path / "store")
    c_default = Client(spark, root)
    c_default.create_collection("shared", dimension=2)

    c_default.create_tenant("acme")
    c_default.create_database("prod", tenant="acme")
    c_acme = Client(spark, root, tenant="acme", database="prod")
    c_acme.create_collection("shared", dimension=4)  # same name, no clash

    assert c_default.list_collections() == ["shared"]
    assert c_acme.list_collections() == ["shared"]
    assert c_default.get_collection("shared")._store.meta.dimension == 2
    assert c_acme.get_collection("shared")._store.meta.dimension == 4
    assert c_acme.list_tenants() == ["acme", "default_tenant"]
    assert c_acme.list_databases() == ["prod"]


def test_unknown_database_rejected(spark, tmp_path):
    from chroma_spark.api import Client

    root = str(tmp_path / "store")
    Client(spark, root)  # creates defaults
    with pytest.raises(CollectionError, match="does not exist"):
        Client(spark, root, tenant="ghost", database="db")


def test_modify_rename_and_metadata(client):
    col = _mk(client, name="orig")
    col.modify(metadata={"purpose": "test"})
    assert col._store.meta.metadata == {"purpose": "test"}
    col.modify(name="renamed")
    assert col.name == "renamed"
    assert client.list_collections() == ["renamed"]
    # data survives the rename (paths are absolute in the meta)
    assert col.count() == 3
    with pytest.raises(CollectionError):
        client.get_collection("orig")


def test_modify_rename_clash_rejected(client):
    _mk(client, name="a1")
    col = _mk(client, name="b1")
    with pytest.raises(CollectionError, match="already exists"):
        col.modify(name="a1")


def test_query_include_hydration(client):
    """QueryResult carries documents/metadatas/embeddings/uris per include
    (chromadb/api/types.py:619-651), hydrated winners-only."""
    col = _mk(client)
    res = col.query(
        [[1.0, 0, 0, 0]],
        n_results=2,
        include=["documents", "metadatas", "embeddings", "uris", "distances"],
    )
    assert res["ids"][0][0] == "a"
    assert res["documents"][0][0] == "alpha doc"
    assert res["metadatas"][0][0] == {"k": 1, "tag": "x"}
    assert res["embeddings"][0][0] == [1.0, 0.0, 0.0, 0.0]
    assert res["uris"][0] == [None, None]
    assert res["distances"][0][0] == 0.0
    # record 'c' has a null document and partial metadata
    resc = col.query([[0, 0, 1.0, 0]], n_results=1)
    assert resc["documents"][0] == [None]
    assert resc["metadatas"][0][0] == {"k": 3}
    # default include has no embeddings
    assert "embeddings" not in resc
    with pytest.raises(CollectionError, match="unknown include"):
        col.query([[1.0, 0, 0, 0]], include=["nope"])


def test_search_empty_collection_returns_empty(client):
    col = client.create_collection("esearch", dimension=2)
    df = col.search(rank={"$knn": {"query": [1.0, 0], "limit": 3}}, select=["#id"])
    assert df.collect() == []
    assert col.search().collect() == []  # un-ranked form too


def test_schema_configured_index_builds_at_compaction(client):
    from chroma_spark.schema import Schema

    schema = Schema().create_index("vector_index", "#embedding", {"n_lists": 2})
    col = client.create_collection("auto_idx", dimension=2, schema=schema)
    col.add(ids=["a", "b", "c"], embeddings=[[1.0, 0], [0, 1.0], [0.7, 0.7]])
    assert col._store.meta.vector_index is None
    col.compact()  # declarative: schema config -> index written by compaction
    vi = col._store.meta.vector_index
    assert vi is not None and vi["version"] == col.version and vi["n_lists"] == 2
    assert col.query([[1.0, 0]], n_results=1)["ids"][0] == ["a"]


def test_quantized_vector_index_lifecycle(client, spark):
    import random

    col = client.create_collection("qidx", dimension=8)
    rnd = random.Random(11)
    ids = [f"q{i}" for i in range(20)]
    embs = [[rnd.random() for _ in range(8)] for _ in ids]
    col.add(ids=ids, embeddings=embs)
    vi = col.build_vector_index(n_lists=2, quantized=True, rerank_factor=24)
    assert vi.get("means") is not None and len(vi["means"]) == 8
    res = col.query([embs[3]], n_results=3)
    assert res["ids"][0][0] == "q3" and res["distances"][0][0] == 0.0
    # tail merge still works on the quantized path
    col.add(ids=["qnew"], embeddings=[embs[3]])
    res = col.query([embs[3]], n_results=4)
    assert set(res["ids"][0][:2]) == {"q3", "qnew"}
    # compaction refresh preserves quantization
    col.compact()
    assert col._store.meta.vector_index.get("means") is not None


def test_query_empty_collection_per_query_lists(client):
    col = client.create_collection("empty", dimension=2)
    res = col.query([[1.0, 0], [0, 1.0]], n_results=3)
    assert res["ids"] == [[], []]
    assert res["distances"] == [[], []]
    assert res["documents"] == [[], []]
    assert res["metadatas"] == [[], []]


def test_query_ids_prefilter(client):
    col = _mk(client)
    res = col.query([[1.0, 0, 0, 0]], n_results=3, ids=["b", "c"])
    assert set(res["ids"][0]) == {"b", "c"}  # 'a' excluded despite distance 0


def test_compact_runs_attached_functions(client, spark):
    from chroma_spark.streaming import AttachedFunction, statistics

    col = _mk(client)
    v = col.compact(attached=[AttachedFunction("stats", lambda state, log: statistics(state, ["tag"]))])
    import os

    out_dir = os.path.join(client.catalog.root, col._store.name, "fn_stats", f"v{v}")
    stats = {(r.key, r.value): r.n for r in spark.read.parquet(out_dir).collect()}
    assert stats[("tag", "x")] == 1 and stats[("tag", "__null__")] == 1


def test_version_time_travel_and_gc(client, spark):
    col = _mk(client, name="tt")
    col.compact()  # v1: a, b, c
    col.delete(ids=["a"])
    col.compact()  # v2: b, c
    col.upsert(ids=["d"], embeddings=[[0.0, 0.0, 0.0, 1.0]])
    col.compact()  # v3: b, c, d
    assert col.list_versions() == [1, 2, 3]
    assert sorted(r.id for r in col.snapshot_at(1).collect()) == ["a", "b", "c"]
    assert sorted(r.id for r in col.snapshot_at(2).collect()) == ["b", "c"]

    # grace=0 sweeps in one pass; with a grace the first pass only MARKS
    # (concurrent-reader protection), so prune deterministically here
    assert col.gc(keep_last=1) == []  # default grace: marked, not swept
    deleted = col.gc(keep_last=1, grace_seconds=0)
    assert deleted == [1, 2] and col.list_versions() == [3]
    with pytest.raises(StaleReadError, match="not on disk"):
        col.snapshot_at(1)
    assert col.count() == 3  # current state untouched


def test_get_include_gates_metadata(client):
    col = _mk(client)
    rows = col.get(ids=["a"], include=[])
    assert set(rows[0].keys()) == {"id"}
    rows = col.get(ids=["a"], include=["documents"])
    assert set(rows[0].keys()) == {"id", "document"}
    rows = col.get(ids=["a"], include=["metadatas"])
    assert set(rows[0].keys()) == {"id", "k", "tag"}


def test_gc_grace_is_mark_and_sweep(client):
    """A just-superseded base version must survive a graced gc pass even
    though the DIRECTORY is old (mtime is creation time — the cross-
    process reader race the mark-and-sweep exists for), then sweep once a
    pass runs >= grace after the mark, and lose its mark if re-referenced
    in between."""
    import json
    import os

    col = _mk(client, name="gcmark")
    col.compact()  # v1
    col.upsert(ids=["d"], embeddings=[[0.0, 0.0, 0.0, 1.0]])
    col.compact()  # v2 — v1 superseded this instant
    # pass 1 with a grace: v1 is only marked, a concurrent reader that
    # resolved v1 as head keeps its files
    assert col.gc(keep_last=1, grace_seconds=60.0) == []
    assert col.list_versions() == [1, 2]
    marks_path = os.path.join(client.catalog.root, col._store.name, ".gc_marks.json")
    marks = json.load(open(marks_path))
    assert any(p.endswith(os.sep + "v1") or "v1" in p for p in marks)
    # age the mark past the grace: the next pass sweeps
    json.dump({p: t - 120.0 for p, t in marks.items()}, open(marks_path, "w"))
    assert col.gc(keep_last=1, grace_seconds=60.0) == [1]
    assert col.list_versions() == [2]
    assert not os.path.exists(marks_path)  # no candidates left -> no marks


def test_gc_removes_stale_index_versions(client):
    import os

    col = client.create_collection("gcidx", dimension=2)
    col.add(ids=["a", "b"], embeddings=[[1.0, 0], [0, 1.0]])
    col.build_vector_index(n_lists=1)  # v1 index
    col.add(ids=["c"], embeddings=[[0.5, 0.5]])
    col.build_vector_index(n_lists=1)  # v2 index; v1's is now unreferenced
    idx_root = os.path.join(client.catalog.root, col._store.name, "index_vector")
    assert sorted(os.listdir(idx_root)) == ["v1", "v2"]
    col.gc(keep_last=1, grace_seconds=0)
    assert sorted(os.listdir(idx_root)) == ["v2"]
    assert col.query([[1.0, 0]], n_results=1)["ids"][0] == ["a"]


def test_gc_preserves_fork_referenced_versions(client):
    col = _mk(client, name="parent")
    col.compact()  # v1 — about to be referenced by the fork
    fork = col.fork("child")
    col.update(ids=["a"], metadatas=[{"k": 99}])
    col.compact()  # v2
    deleted = col.gc(keep_last=1)
    assert deleted == []  # v1 is the fork's base: must survive
    assert fork.count() == 3


def test_gc_preserves_fork_pinned_index_layout_and_prunes_orphan_logs(client):
    """Fork ref-counting across ALL artifact kinds: a fork pins the
    parent's index layout and WAL batches by path, so the parent's gc must
    keep them even after the parent rebuilds its own index — while WAL
    batch dirs referenced by nobody are pruned from disk (compact() resets
    log_paths but leaves the files for exactly this fork case)."""
    import os

    col = client.create_collection("gcfork", dimension=2)
    col.add(ids=["a", "b"], embeddings=[[1.0, 0.0], [0.0, 1.0]])
    col.build_vector_index(n_lists=1)  # v1 layout
    col.add(ids=["c"], embeddings=[[0.5, 0.5]])  # un-compacted WAL batch
    fork = col.fork("gcfork_child")  # pins v1 layout + the live WAL batch

    col.add(ids=["d"], embeddings=[[0.2, 0.8]])
    col.build_vector_index(n_lists=1)  # parent now on a newer layout
    n_logs_before = len(col._store.list_log_batch_dirs())
    col.gc(keep_last=1, grace_seconds=0)

    idx_root = os.path.join(client.catalog.root, col._store.name, "index_vector")
    assert os.path.isdir(os.path.join(idx_root, "v1"))  # fork-pinned layout survives
    # fork still queries through the pinned layout and sees its WAL tail
    assert fork.query([[0.5, 0.5]], n_results=1)["ids"][0] == ["c"]
    assert fork.count() == 3
    # the parent's own compactions folded every batch it references, so the
    # only batch dirs left are the fork-pinned ones
    remaining = set(col._store.list_log_batch_dirs())
    assert remaining == set(fork._store.meta.log_paths)
    assert len(remaining) < n_logs_before
    # parent unaffected throughout
    assert col.count() == 4


def test_attached_embedding_function_auto_embed_and_query_texts(client):
    col = client.create_collection(
        "ef", embedding_function="hashing", embedding_function_kwargs={"dim": 16}
    )
    col.add(ids=["a", "b"], documents=["alpha beta", "gamma delta"])
    rows = col.get(include=["embeddings", "documents"])
    assert all(len(r["embedding"]) == 16 for r in rows)

    res = col.query(query_texts=["alpha beta"], n_results=1)
    assert res["ids"][0] == ["a"] and res["distances"][0][0] < 1e-6

    with pytest.raises(CollectionError, match="not both"):
        col.query(query_embeddings=[[0.0] * 16], query_texts=["x"])
    with pytest.raises(CollectionError, match="required"):
        col.query()


def test_search_string_knn_query_embeds_clientside(client):
    """String $knn queries embed with the attached EF before the search
    runs (Collection.py:447-449)."""
    col = client.create_collection(
        "efsearch", embedding_function="hashing", embedding_function_kwargs={"dim": 16}
    )
    col.add(ids=["a", "b"], documents=["alpha beta", "gamma delta"])
    rows = col.search(rank={"$knn": {"query": "alpha beta", "limit": 2}}, select=["#id"]).collect()
    assert rows[0]["id"] == "a" and rows[0]["score"] < 1e-6
    plain = _mk(client)
    with pytest.raises(CollectionError, match="embedding function"):
        plain.search(rank={"$knn": {"query": "text", "limit": 1}})


def test_query_texts_without_ef_rejected(client):
    col = _mk(client)
    with pytest.raises(CollectionError, match="embedding function"):
        col.query(query_texts=["hello"])


def test_unknown_embedding_function_rejected_at_create(client):
    with pytest.raises(KeyError, match="unknown embedding function"):
        client.create_collection("bad", embedding_function="nope")


# ---------------------------------------------------------------------------
# Vector-index lifecycle: build -> index-served query -> WAL-tail knn_merge
# -> staleness fallback (reference: compaction writes the vector segment,
# knn_log + knn_hnsw -> knn_merge, operators/knn_merge.rs:43)
# ---------------------------------------------------------------------------


def test_vector_index_lifecycle_and_knn_merge(client, spark):
    import random

    col = client.create_collection("vidx", dimension=4, space="l2")
    rnd = random.Random(3)
    ids = [f"r{i}" for i in range(12)]
    embs = [[rnd.random() for _ in range(4)] for _ in ids]
    col.add(ids=ids, embeddings=embs, metadatas=[{"grp": i % 2} for i in range(12)])
    vi = col.build_vector_index(n_lists=3)
    assert vi["version"] == col.version

    q = [embs[5]]
    qdf = spark.createDataFrame(
        [(0, [float(x) for x in embs[5]])], "query_id INT, embedding ARRAY<FLOAT>"
    )
    # the index path engages (nprobe defaults to all lists -> exact)
    assert col._query_via_index(qdf, 3, None, "index_and_wal", None) is not None
    res = col.query(q, n_results=3)
    assert res["ids"][0][0] == "r5" and res["distances"][0][0] == 0.0

    # filtered KNN restricts within the probed lists (allowed-ids semi-join)
    res = col.query(q, n_results=4, where={"grp": {"$eq": 0}})
    assert all(int(i[1:]) % 2 == 0 for i in res["ids"][0])

    # WAL tail after the build: add/update/delete all honored via knn_merge
    col.add(ids=["new"], embeddings=[embs[5]])
    col.update(ids=["r5"], embeddings=[[9.0, 9.0, 9.0, 9.0]])
    col.delete(ids=["r7"])
    res = col.query(q, n_results=12)
    assert res["ids"][0][0] == "new"          # tail-side insert wins
    assert "r7" not in res["ids"][0]          # tail-side delete excluded
    by_id = dict(zip(res["ids"][0], res["distances"][0]))
    assert by_id["r5"] > 100                  # tail-side update moved it away

    # pending predicate delete: the index stays engaged (matched ids are
    # computed vectorized against base and excluded; no wholesale fallback)
    col.delete(where={"never_there": {"$eq": 1}})
    assert col._query_via_index(qdf, 3, None, "index_and_wal", None) is not None
    assert col.query(q, n_results=3)["ids"][0][0] == "new"

    # compaction without refresh leaves the index stale -> exact fallback
    col.compact(refresh_indexes=False)
    assert col._query_via_index(qdf, 3, None, "index_and_wal", None) is None
    assert col.query(q, n_results=3)["ids"][0][0] == "new"
    col.build_vector_index(n_lists=3)
    assert col._query_via_index(qdf, 3, None, "index_and_wal", None) is not None
    assert col.query(q, n_results=3)["ids"][0][0] == "new"

    # default compact() refreshes the registered index for the new version
    # (the reference's compaction flushes the vector segment's index too)
    col.add(ids=["new2"], embeddings=[[0.1, 0.1, 0.1, 0.1]])
    col.compact()
    assert col._store.meta.vector_index["version"] == col.version
    assert col._query_via_index(qdf, 3, None, "index_and_wal", None) is not None


def test_fork_inherits_vector_index(client, spark):
    col = client.create_collection("vparent", dimension=2)
    col.add(ids=["a", "b"], embeddings=[[1.0, 0], [0, 1.0]])
    col.build_vector_index(n_lists=1)
    fork = col.fork("vchild")
    qdf = spark.createDataFrame([(0, [1.0, 0.0])], "query_id INT, embedding ARRAY<FLOAT>")
    # the child serves from the parent's index files (zero-copy)
    assert fork._query_via_index(qdf, 2, None, "index_and_wal", None) is not None
    assert fork.query([[1.0, 0]], n_results=1)["ids"][0] == ["a"]
    # divergent child writes merge through the tail; parent untouched
    fork.add(ids=["z"], embeddings=[[1.0, 0.0]])
    assert fork.query([[1.0, 0]], n_results=2)["ids"][0] == ["a", "z"]
    assert col.query([[1.0, 0]], n_results=2)["ids"][0] == ["a", "b"]


def test_compaction_maintains_index_incrementally(client, spark):
    """A small delta must NOT retrain k-means or rewrite the corpus: the
    trained centroids stay byte-identical, the delta is appended at the new
    epoch, and the index-served query equals brute force over the snapshot.
    Cumulative drift past REINDEX_FRACTION then triggers a retrain."""
    import random

    from chroma_spark.operators.knn import exact_knn

    col = client.create_collection("vinc", dimension=4, space="l2")
    rnd = random.Random(7)
    ids = [f"r{i}" for i in range(40)]
    embs = [[rnd.random() for _ in range(4)] for _ in ids]
    col.add(ids=ids, embeddings=embs)
    vi = col.build_vector_index(n_lists=4)
    trained = vi["trained_version"]
    cents0 = sorted(tuple(r.centroid) for r in col._load_vector_index()[0].collect())

    col.add(ids=["n1"], embeddings=[[2.0, 2, 2, 2]])
    col.update(ids=["r3"], embeddings=[[3.0, 3, 3, 3]])
    col.delete(ids=["r4"])
    col.compact()
    vi2 = col._store.meta.vector_index
    assert vi2["trained_version"] == trained, "small delta must not retrain"
    assert vi2["version"] == col.version and vi2["n_appended"] == 3
    cents1 = sorted(tuple(r.centroid) for r in col._load_vector_index()[0].collect())
    assert cents1 == cents0, "centroid table must be untouched by the delta"

    # live postings reflect the delta: n1 present, r4 gone, r3 moved
    live = {r.id for r in col._load_vector_index()[1].select("id").distinct().collect()}
    assert "n1" in live and "r4" not in live and "r3" in live

    # with no WAL tail, the index-served query must equal exact brute force
    # (nprobe defaults to every list)
    assert col._store.meta.log_paths == []
    qdf = spark.createDataFrame([(0, [2.0, 2.0, 2.0, 2.0])], "query_id INT, embedding ARRAY<FLOAT>")
    assert col._query_via_index(qdf, 5, None, "index_and_wal", None) is not None
    got = col.query([[2.0, 2, 2, 2]], n_results=5)["ids"][0]
    exact = exact_knn(col.snapshot().filter("embedding is not null"), qdf, k=5, space="l2")
    assert got == [r.id for r in exact.orderBy("rank").collect()]
    assert got[0] == "n1"

    # cumulative drift beyond REINDEX_FRACTION * n_rows retrains
    col.add(
        ids=[f"m{i}" for i in range(30)],
        embeddings=[[rnd.random() for _ in range(4)] for _ in range(30)],
    )
    col.compact()
    vi3 = col._store.meta.vector_index
    assert vi3["trained_version"] == col.version, "drift must trigger a retrain"
    assert vi3["n_appended"] == 0


def test_compaction_maintains_sparse_index_incrementally(client):
    """Same discipline as the vector index: a small delta appends at the
    new epoch (no rewrite), deletes tombstone, search agrees with the
    ground truth, and drift rebuilds."""
    col = client.create_collection("sinc", dimension=2)
    ids = [f"d{i}" for i in range(20)]
    col.add(
        ids=ids,
        embeddings=[[float(i), 1.0] for i in range(20)],
        metadatas=[{"sv": {"indices": [i % 4], "values": [1.0 + i]}} for i in range(20)],
    )
    si0 = col.build_sparse_index("sv", n_buckets=4)
    assert si0["epoch"] == col.version and si0["n_appended"] == 0

    col.add(ids=["n1"], embeddings=[[99.0, 1.0]], metadatas=[{"sv": {"indices": [1], "values": [50.0]}}])
    col.delete(ids=["d5"])
    col.update(ids=["d6"], metadatas=[{"sv": {"indices": [2], "values": [40.0]}}])
    v_before = col.version
    col.compact()
    si = col._store.meta.sparse_indexes["sv"]
    assert si["version"] == col.version and si["epoch"] == col.version
    assert si["n_appended"] == 3
    assert si["path"] == si0["path"], "small delta must not rewrite the layout"
    assert si["n_docs"] == 20.0  # 20 + n1 - d5
    assert col.version == v_before + 1

    live = col._load_sparse_index(si)
    live_ids = {r.id for r in live.select("id").distinct().collect()}
    assert "n1" in live_ids and "d5" not in live_ids
    assert "__epoch" not in live.columns

    # index-served search equals the snapshot truth: top doc for term 1 is n1
    rank = {"$knn": {"query": {"indices": [1], "values": [1.0]}, "key": "sv", "limit": 3}}
    top = [r["id"] for r in col.search(rank=rank, select=["#id"]).collect()]
    assert top[0] == "n1"
    # updated doc d6 serves its NEW posting (old term-1 entry tombstoned)
    rank2 = {"$knn": {"query": {"indices": [2], "values": [1.0]}, "key": "sv", "limit": 3}}
    top2 = [r["id"] for r in col.search(rank=rank2, select=["#id"]).collect()]
    assert top2[0] == "d6"

    # drift: touch >50% of docs -> rebuild resets the layout + counters
    col.add(
        ids=[f"m{i}" for i in range(15)],
        embeddings=[[0.0, float(i)] for i in range(15)],
        metadatas=[{"sv": {"indices": [3], "values": [2.0]}} for _ in range(15)],
    )
    col.compact()
    si2 = col._store.meta.sparse_indexes["sv"]
    assert si2["n_appended"] == 0 and si2["path"] != si0["path"], "drift must rebuild"


def test_sq4_index_lifecycle_and_incremental_maintenance(client):
    """quantized='sq4' registers the 4-bit tier: queries serve via ADC +
    re-rank, compaction appends deltas encoded with the TRAINED (lo, step),
    and the tail merge stays correct."""
    import random

    col = client.create_collection("vsq4", dimension=4, space="l2")
    rnd = random.Random(13)
    ids = [f"s{i}" for i in range(30)]
    embs = [[rnd.random() for _ in range(4)] for _ in ids]
    col.add(ids=ids, embeddings=embs)
    vi = col.build_vector_index(n_lists=3, quantized="sq4")
    assert vi["rerank_factor"] == 4 and len(vi["sq4_lo"]) == 4 and "means" not in vi
    assert col.query([embs[7]], n_results=1)["ids"][0] == ["s7"]

    # WAL tail merges; then compaction appends with the trained ranges
    col.add(ids=["zz"], embeddings=[[2.0, 2, 2, 2]])
    assert col.query([[2.0, 2, 2, 2]], n_results=1)["ids"][0] == ["zz"]
    col.compact()
    vi2 = col._store.meta.vector_index
    assert vi2["trained_version"] == vi["trained_version"]
    assert vi2["sq4_lo"] == vi["sq4_lo"] and vi2["sq4_step"] == vi["sq4_step"]
    assert col.query([[2.0, 2, 2, 2]], n_results=1)["ids"][0] == ["zz"]
    assert col.query([embs[7]], n_results=1)["ids"][0] == ["s7"]

    with pytest.raises(CollectionError, match="quantization tier"):
        col.build_vector_index(quantized="rabitq")


def test_pq_index_lifecycle_and_incremental_maintenance(client):
    """quantized='pq' registers the product-quantization tier: codebooks
    persist beside the layout (not the catalog), queries serve via LUT-ADC
    + re-rank, and compaction appends deltas encoded with the TRAINED
    codebooks."""
    import os
    import random

    col = client.create_collection("vpq", dimension=8, space="l2")
    rnd = random.Random(29)
    ids = [f"p{i}" for i in range(40)]
    embs = [[rnd.random() for _ in range(8)] for _ in ids]
    col.add(ids=ids, embeddings=embs)
    vi = col.build_vector_index(n_lists=3, quantized="pq")
    assert vi["rerank_factor"] == 8 and vi["pq"]["m"] == 1
    assert "means" not in vi and "sq4_lo" not in vi
    assert os.path.exists(os.path.join(vi["path"], "pq_books.json"))
    assert col.query([embs[7]], n_results=1)["ids"][0] == ["p7"]

    # WAL tail merges; then compaction appends with the trained codebooks
    col.add(ids=["zz"], embeddings=[[2.0] * 8])
    assert col.query([[2.0] * 8], n_results=1)["ids"][0] == ["zz"]
    col.compact()
    vi2 = col._store.meta.vector_index
    assert vi2["trained_version"] == vi["trained_version"]
    assert col.query([[2.0] * 8], n_results=1)["ids"][0] == ["zz"]
    assert col.query([embs[7]], n_results=1)["ids"][0] == ["p7"]
    # appended delta rows carry pq codes (encoded with trained books)
    postings = col._load_vector_index()[1]
    assert postings.filter("pq_code is null").count() == 0

    # dim not divisible by 8 -> clean refusal
    col8 = client.create_collection("vpq_dim", dimension=4, space="l2")
    col8.add(ids=["a"], embeddings=[[0.1, 0.2, 0.3, 0.4]])
    with pytest.raises(CollectionError, match="divisible by 8"):
        col8.build_vector_index(quantized="pq")


def test_incremental_maintenance_soak_many_cycles(client, spark):
    """Five add/update/delete/re-add + compact cycles against one trained
    index: every cycle's full-probe query must equal exact brute force over
    the snapshot (repeated tombstone + re-add of the SAME id across epochs
    is where epoch MVCC could slip), and k-means must never retrain."""
    import random

    from chroma_spark.operators.knn import exact_knn

    col = client.create_collection("vsoak", dimension=4, space="l2")
    rnd = random.Random(5)
    ids = [f"r{i}" for i in range(24)]
    col.add(ids=ids, embeddings=[[rnd.random() for _ in range(4)] for _ in ids])
    trained = col.build_vector_index(n_lists=3)["trained_version"]

    victim = "r0"  # deleted and re-added every cycle
    for cycle in range(5):
        col.delete(ids=[victim])
        col.add(ids=[victim], embeddings=[[float(cycle), 0.5, 0.5, 0.5]])
        col.update(ids=["r1"], embeddings=[[0.5, float(cycle), 0.5, 0.5]])
        col.compact()
        vi = col._store.meta.vector_index
        assert vi["trained_version"] == trained, f"cycle {cycle} retrained"
        assert vi["version"] == col.version
        q = [float(cycle), 0.5, 0.5, 0.5]
        qdf = spark.createDataFrame([(0, q)], "query_id INT, embedding ARRAY<FLOAT>")
        got = col.query([q], n_results=6)["ids"][0]
        exact = exact_knn(
            col.snapshot().filter("embedding is not null"), qdf, k=6, space="l2"
        )
        assert got == [r.id for r in exact.orderBy("rank").collect()], f"cycle {cycle}"
        assert got[0] == victim
        # exactly one live posting per id despite 5 generations of appends
        live = col._load_vector_index()[1].groupBy("id").count()
        over = live.filter(F_col_count_gt(2)).collect()  # replicas=2 per id max
        assert over == [], over


def F_col_count_gt(n):
    from pyspark.sql import functions as F

    return F.col("count") > n


def test_quantized_index_incremental_append_uses_trained_pivot(client, spark):
    col = client.create_collection("vincq", dimension=4, space="l2")
    import random

    rnd = random.Random(11)
    ids = [f"q{i}" for i in range(30)]
    col.add(ids=ids, embeddings=[[rnd.random() for _ in range(4)] for _ in ids])
    vi = col.build_vector_index(n_lists=3, quantized=True, rerank_factor=24)
    means0 = vi["means"]
    col.add(ids=["zz"], embeddings=[[2.0, 2, 2, 2]])
    col.compact()
    vi2 = col._store.meta.vector_index
    assert vi2["trained_version"] == vi["trained_version"]
    assert vi2["means"] == means0, "delta must encode with the trained pivot"
    # appended row is code-searchable end to end
    assert col.query([[2.0, 2, 2, 2]], n_results=1)["ids"][0] == ["zz"]


def test_fork_isolated_from_parent_incremental_appends(client):
    """Epoch MVCC on the shared layout: after a fork, the parent's
    incremental compactions append rows/tombstones at LATER epochs into
    the same files — the child, pinned at the fork version, must keep
    reading its original state (deleted ids still visible, parent's new
    ids invisible) from those shared files without any copy."""
    col = client.create_collection("vmvcc", dimension=2)
    # big enough that the parent's 2-id delta stays under REINDEX_FRACTION
    ids = ["a", "b", "c"] + [f"f{i}" for i in range(7)]
    col.add(
        ids=ids,
        embeddings=[[1.0, 0], [0, 1.0], [0.5, 0.5]] + [[2.0 + i, 2.0] for i in range(7)],
        metadatas=[{"sv": {"indices": [0], "values": [3.0]}},
                   {"sv": {"indices": [0], "values": [2.0]}},
                   {"sv": {"indices": [0], "values": [1.0]}}] + [{}] * 7,
    )
    col.build_vector_index(n_lists=1)
    col.build_sparse_index("sv", n_buckets=2)
    child = col.fork("vmvcc-child")

    # parent diverges: new vector, delete 'b', compact (incremental append)
    col.add(ids=["p1"], embeddings=[[0.9, 0.1]],
            metadatas=[{"sv": {"indices": [0], "values": [9.0]}}])
    col.delete(ids=["b"])
    col.compact()
    assert col._store.meta.vector_index["path"] == child._store.meta.vector_index["path"]

    # parent sees its new state
    got_parent = set(col.query([[0.0, 1.0]], n_results=4)["ids"][0])
    assert "p1" in got_parent and "b" not in got_parent
    # child still sees the fork-time state from the SAME shared files
    got_child = set(child.query([[0.0, 1.0]], n_results=4)["ids"][0])
    assert "b" in got_child and "p1" not in got_child
    rank = {"$knn": {"query": {"indices": [0], "values": [1.0]}, "key": "sv", "limit": 4}}
    child_sparse = {r["id"] for r in child.search(rank=rank, select=["#id"]).collect()}
    assert child_sparse == {"a", "b", "c"}
    parent_sparse = {r["id"] for r in col.search(rank=rank, select=["#id"]).collect()}
    assert parent_sparse == {"a", "c", "p1"}


def test_build_vector_index_autocompacts_and_rejects_empty(client):
    col = client.create_collection("vempty", dimension=2)
    with pytest.raises(CollectionError, match="empty"):
        col.build_vector_index()
    col.add(ids=["a", "b"], embeddings=[[1.0, 0], [0, 1.0]])
    v_before = col.version
    vi = col.build_vector_index(n_lists=1)
    assert col.version == v_before + 1  # pending WAL compacted first
    assert vi["version"] == col.version


# ---------------------------------------------------------------------------
# Insertion-offset pagination + predicate deletes (VERDICT r1 #3/#8)
# ---------------------------------------------------------------------------


def test_get_orders_by_insertion_offset_not_string_id(client):
    """limit.rs:23-36: un-ranked get orders by internal offset id. With
    string ids '10' < '2' lexicographically — insertion order must win."""
    col = client.create_collection("offs", dimension=2)
    col.add(ids=["10", "2", "1"], embeddings=[[1.0, 0], [0, 1.0], [1.0, 1.0]])
    assert [r["id"] for r in col.get()] == ["10", "2", "1"]
    assert [r["id"] for r in col.get(limit=2, offset=1)] == ["2", "1"]
    assert [r["id"] for r in col.peek(limit=1)] == ["10"]


def test_offset_survives_update_and_compact_but_not_readd(client):
    col = client.create_collection("offs2", dimension=2)
    col.add(ids=["b", "a"], embeddings=[[1.0, 0], [0, 1.0]])
    col.update(ids=["b"], documents=["updated"])  # update keeps the offset
    assert [r["id"] for r in col.get()] == ["b", "a"]
    col.compact()
    assert [r["id"] for r in col.get()] == ["b", "a"]  # offset persisted in base
    col.delete(ids=["b"])
    col.add(ids=["b"], embeddings=[[2.0, 0]])  # re-add = fresh offset (end)
    assert [r["id"] for r in col.get()] == ["a", "b"]


def test_no_arg_delete_raises(client):
    col = _mk(client)
    with pytest.raises(CollectionError, match="requires"):
        col.delete()
    assert col.count() == 3


def test_predicate_delete_stores_predicate_not_expansion(client):
    col = _mk(client)
    n_log_rows_before = col._store.read_log().count()
    col.delete(where={"k": {"$gte": 2}})
    log = col._store.read_log()
    # exactly ONE new log record, carrying the predicate
    assert log.count() == n_log_rows_before + 1
    assert log.filter(log.op == "DELETE_WHERE").count() == 1
    assert sorted(r["id"] for r in col.get()) == ["a"]
    # fold survives compaction too
    col.compact()
    assert sorted(r["id"] for r in col.get()) == ["a"]


def test_predicate_delete_where_document_and_ids(client):
    col = _mk(client)
    # ids AND where must both match (reference delete combines constraints)
    col.delete(ids=["a", "b"], where={"k": {"$eq": 2}})
    assert sorted(r["id"] for r in col.get()) == ["a", "c"]
    col.delete(where_document={"$contains": "alpha"})
    assert sorted(r["id"] for r in col.get()) == ["c"]


def test_predicate_delete_then_readd(client):
    col = _mk(client)
    col.delete(where={"tag": {"$eq": "x"}})  # removes 'a'
    assert sorted(r["id"] for r in col.get()) == ["b", "c"]
    col.add(ids=["a"], embeddings=[[5.0, 0, 0, 0]], metadatas=[{"tag": "x"}])
    # the predicate applied at ITS seq position — not to the later re-add
    assert sorted(r["id"] for r in col.get()) == ["a", "b", "c"]


def test_sparse_vector_metadata_and_hybrid_search(client):
    """SparseVector metadata values (base_types.py:13-117) survive the WAL
    fold and serve sparse $knn terms in search() — the record-side half of
    hybrid search."""
    col = client.create_collection("svcol", dimension=2)
    col.add(
        ids=["a", "b", "c"],
        embeddings=[[1.0, 0], [0, 1.0], [0.5, 0.5]],
        metadatas=[
            {"sv": {"indices": [0, 2], "values": [1.0, 2.0]}},
            {"sv": {"indices": [2, 5], "values": [3.0, 1.0]}},
            {"sv": {"indices": [7], "values": [4.0], "labels": ["rare"]}},
        ],
    )
    row = col.get(ids=["a"])[0]
    assert row["sv"]["indices"] == [0, 2] and row["sv"]["values"] == [1.0, 2.0]
    assert col.get(ids=["c"])[0]["sv"]["labels"] == ["rare"]
    # sparse $knn over the metadata column (idf off: hand-checkable dots)
    df = col.search(
        rank={"$knn": {"query": {"indices": [0, 2], "values": [1.0, 1.0]},
                       "key": "sv", "limit": 3, "idf": False}},
        select=["#id"],
    )
    scores = {r["id"]: r["score"] for r in df.collect()}
    assert scores == {"a": 1.0 - 3.0, "b": 1.0 - 3.0}  # c shares no term
    # malformed sparse metadata rejected at write time
    with pytest.raises(Exception, match="ascending"):
        col.add(ids=["z"], embeddings=[[0.0, 0]],
                metadatas=[{"sv": {"indices": [3, 1], "values": [1.0, 1.0]}}])


def test_sparse_index_lifecycle_in_search(client):
    """build_sparse_index -> search sparse $knn reads the bucket-pruned
    index; WAL-tail writes merge via anti-join + tail postings union (the
    sparse_index_knn + sparse_log_knn pipeline)."""
    col = client.create_collection("svidx", dimension=2)
    col.add(
        ids=["a", "b", "c"],
        embeddings=[[1.0, 0], [0, 1.0], [0.5, 0.5]],
        metadatas=[
            {"sv": {"indices": [0, 2], "values": [1.0, 2.0]}},
            {"sv": {"indices": [2, 5], "values": [3.0, 1.0]}},
            {"sv": {"indices": [7], "values": [4.0]}},
        ],
    )
    si = col.build_sparse_index("sv", n_buckets=8)
    assert si["version"] == col.version and si["n_docs"] == 3.0
    rank = {"$knn": {"query": {"indices": [0, 2], "values": [1.0, 1.0]},
                     "key": "sv", "limit": 4, "idf": False}}
    scores = {r["id"]: r["score"] for r in col.search(rank=rank, select=["#id"]).collect()}
    assert scores == {"a": -2.0, "b": -2.0}
    # tail writes: update b's vector, delete a, add d — index entries for
    # touched ids must not leak through
    col.update(ids=["b"], metadatas=[{"sv": {"indices": [2], "values": [10.0]}}])
    col.delete(ids=["a"])
    col.add(ids=["d"], embeddings=[[0.0, 0]],
            metadatas=[{"sv": {"indices": [0], "values": [7.0]}}])
    scores = {r["id"]: r["score"] for r in col.search(rank=rank, select=["#id"]).collect()}
    assert scores == {"b": 1.0 - 10.0, "d": 1.0 - 7.0}
    # compaction refreshes the sparse index for the new version
    col.compact()
    assert col._store.meta.sparse_indexes["sv"]["version"] == col.version
    assert col._store.meta.sparse_indexes["sv"]["n_docs"] == 3.0  # b, c, d
    scores = {r["id"]: r["score"] for r in col.search(rank=rank, select=["#id"]).collect()}
    assert scores == {"b": 1.0 - 10.0, "d": 1.0 - 7.0}


def test_delete_empty_id_list_with_where_deletes_nothing(client):
    """ids=[] is a real matches-nothing constraint, not 'no constraint' —
    the intersection with any predicate is empty."""
    col = _mk(client)
    col.delete(ids=[], where={"k": {"$gte": 0}})
    assert col.count() == 3


def test_compact_deregisters_index_when_collection_empties(client):
    col = client.create_collection("vgone", dimension=2)
    col.add(ids=["a", "b"], embeddings=[[1.0, 0], [0, 1.0]])
    col.build_vector_index(n_lists=1)
    col.delete(ids=["a", "b"])
    v = col.compact()  # must not crash the k-means build on zero vectors
    assert col.count() == 0 and col.version == v
    assert col._store.meta.vector_index is None
    # and the collection keeps working afterwards
    col.add(ids=["c"], embeddings=[[0.5, 0.5]])
    assert col.query([[0.5, 0.5]], n_results=1)["ids"][0] == ["c"]


def test_search_empty_collection_with_sparse_rank(client):
    col = client.create_collection("esparse", dimension=2)
    df = col.search(
        rank={"$knn": {"query": {"indices": [0], "values": [1.0]}, "key": "sv", "limit": 2}},
        select=["#id"],
    )
    assert df.collect() == []


def test_filtered_sparse_idf_consistent_inline_vs_indexed(client):
    """A where-filtered sparse search must score identically whether it
    reads the persisted index or falls back inline: IDF stats always come
    from the whole corpus, the filter only restricts the support."""
    col = client.create_collection("idfc", dimension=2)
    col.add(
        ids=["a", "b", "c", "d"],
        embeddings=[[1.0, 0], [0, 1.0], [0.5, 0.5], [0.2, 0.8]],
        metadatas=[
            {"grp": "x", "sv": {"indices": [0, 1], "values": [1.0, 1.0]}},
            {"grp": "x", "sv": {"indices": [1], "values": [2.0]}},
            {"grp": "y", "sv": {"indices": [0], "values": [3.0]}},
            {"grp": "y", "sv": {"indices": [1, 2], "values": [1.0, 1.0]}},
        ],
    )
    col.build_sparse_index("sv", n_buckets=4)
    rank = {"$knn": {"query": {"indices": [0, 1], "values": [1.0, 1.0]}, "key": "sv", "limit": 4}}
    indexed = {
        r["id"]: r["score"]
        for r in col.search(where={"grp": {"$eq": "x"}}, rank=rank, select=["#id"]).collect()
    }
    # the same corpus without a persisted index scores via the inline path
    col2 = client.create_collection("idfc2", dimension=2)
    col2.add(
        ids=["a", "b", "c", "d"],
        embeddings=[[1.0, 0], [0, 1.0], [0.5, 0.5], [0.2, 0.8]],
        metadatas=[
            {"grp": "x", "sv": {"indices": [0, 1], "values": [1.0, 1.0]}},
            {"grp": "x", "sv": {"indices": [1], "values": [2.0]}},
            {"grp": "y", "sv": {"indices": [0], "values": [3.0]}},
            {"grp": "y", "sv": {"indices": [1, 2], "values": [1.0, 1.0]}},
        ],
    )
    inline = {
        r["id"]: r["score"]
        for r in col2.search(where={"grp": {"$eq": "x"}}, rank=rank, select=["#id"]).collect()
    }
    assert inline == indexed and set(inline) == {"a", "b"}
    # a pending predicate delete no longer abandons the index: the spec is
    # still served (matched ids excluded via the bounded tail fold) and a
    # nothing-matching predicate leaves scores identical
    col.delete(where={"never": {"$eq": 1}})
    assert col._fresh_sparse_indexes("index_and_wal", keys={"sv"}) != {}
    tolerated = {
        r["id"]: r["score"]
        for r in col.search(where={"grp": {"$eq": "x"}}, rank=rank, select=["#id"]).collect()
    }
    assert tolerated == indexed


def test_index_reads_tolerate_matching_predicate_deletes(client, spark):
    """Pending DELETE_WHERE with real matches: vector and sparse reads stay
    index-served and agree exactly with the post-compaction ground truth."""
    col = client.create_collection("pdel", dimension=2)
    ids = [f"r{i}" for i in range(10)]
    col.add(
        ids=ids,
        embeddings=[[float(i), float(10 - i)] for i in range(10)],
        metadatas=[
            {"grp": "x" if i % 2 else "y", "sv": {"indices": [i % 3], "values": [1.0 + i]}}
            for i in range(10)
        ],
    )
    col.build_vector_index(n_lists=2)
    col.build_sparse_index("sv", n_buckets=4)
    col.delete(where={"grp": {"$eq": "x"}})  # matches r1,r3,r5,r7,r9 — pending

    qdf = spark.createDataFrame([(0, [2.0, 8.0])], "query_id INT, embedding ARRAY<FLOAT>")
    assert col._query_via_index(qdf, 4, None, "index_and_wal", None) is not None
    got_vec = col.query([[2.0, 8.0]], n_results=4)["ids"][0]
    assert col._fresh_sparse_indexes("index_and_wal", keys={"sv"}) != {}
    rank = {"$knn": {"query": {"indices": [1], "values": [1.0]}, "key": "sv", "limit": 5}}
    got_sparse = [r["id"] for r in col.search(rank=rank, select=["#id"]).collect()]

    col.compact()  # ground truth: predicate applied for real
    assert col.query([[2.0, 8.0]], n_results=4)["ids"][0] == got_vec
    assert [r["id"] for r in col.search(rank=rank, select=["#id"]).collect()] == got_sparse
    assert not any(int(i[1:]) % 2 for i in got_vec), "deleted grp=x ids leaked"


def test_array_metadata_values_and_contains(client):
    """Array metadata (Bool/Int/Float/StringArray, metadata.rs:673-681)
    round-trips through the WAL and serves $contains/$not_contains."""
    col = client.create_collection("arr", dimension=2)
    col.add(
        ids=["a", "b", "c"],
        embeddings=[[1.0, 0], [0, 1.0], [0.5, 0.5]],
        metadatas=[
            {"tags": ["red", "hot"], "nums": [1, 2]},
            {"tags": ["blue"], "nums": [2.5, 3]},  # mixed int/float -> float
            {"tags": []},
        ],
    )
    rows = {r["id"]: r for r in col.get()}
    assert rows["a"]["tags"] == ["red", "hot"]
    assert rows["b"]["nums"] == [2.5, 3.0]
    assert rows["c"]["tags"] == [] and rows["c"]["nums"] is None
    got = [r["id"] for r in col.get(where={"tags": {"$contains": "red"}})]
    assert got == ["a"]
    got = sorted(r["id"] for r in col.get(where={"tags": {"$not_contains": "red"}}))
    assert got == ["b", "c"]  # empty array and missing both count as not-contains
    got = [r["id"] for r in col.get(where={"nums": {"$contains": 2}})]
    assert got == ["a"]
    with pytest.raises(CollectionError, match="mixed element types"):
        col.add(ids=["z"], embeddings=[[0.0, 0]], metadatas=[{"tags": ["x", 1]}])
    # survives compaction + predicate delete over the array
    col.compact()
    col.delete(where={"tags": {"$contains": "blue"}})
    assert sorted(r["id"] for r in col.get()) == ["a", "c"]


def test_mixed_numeric_metadata_coerces_to_float(client):
    col = client.create_collection("mx", dimension=2)
    col.add(
        ids=["i", "f"],
        embeddings=[[1.0, 0], [0, 1.0]],
        metadatas=[{"x": 1}, {"x": 2.5}],
    )
    vals = {r["id"]: r["x"] for r in col.get()}
    assert vals == {"i": 1.0, "f": 2.5}
    assert all(isinstance(v, float) for v in vals.values())
    with pytest.raises(CollectionError, match="mixed types"):
        col.add(
            ids=["s", "s2"],
            embeddings=[[1.0, 1], [0, 1.0]],
            metadatas=[{"y": 1}, {"y": "str"}],
        )


def test_query_batch_matches_query_exact_and_indexed(spark, tmp_path):
    import math
    import random

    from chroma_spark.api import Client

    rnd = random.Random(7)
    n, dim = 120, 8
    ids = [f"r{i}" for i in range(n)]
    vecs = [[rnd.uniform(-1, 1) for _ in range(dim)] for _ in range(n)]
    client = Client(spark, str(tmp_path / "qb_root"))
    col = client.create_collection("c", dimension=dim, space="l2")
    col.add(ids=ids, embeddings=vecs, metadatas=[{"bucket": i % 3} for i in range(n)])

    qdf = spark.createDataFrame(
        [(i, vecs[i * 10]) for i in range(4)], "query_id INT, embedding ARRAY<FLOAT>"
    )

    def _collect(df):
        return {
            (r.query_id, r.rank): (r.id, round(r.dist, 5))
            for r in df.collect()
        }

    # exact path (no index): per-query API agrees with the batch join
    batch = _collect(col.query_batch(qdf, n_results=5))
    for qi in range(4):
        res = col.query(query_embeddings=[vecs[qi * 10]], n_results=5)
        for rank0, (rid, dist) in enumerate(zip(res["ids"][0], res["distances"][0])):
            assert batch[(qi, rank0 + 1)][0] == rid
            assert math.isclose(batch[(qi, rank0 + 1)][1], round(dist, 5), abs_tol=1e-4)

    # filtered batch respects the predicate
    fb = col.query_batch(qdf, n_results=5, where={"bucket": 1})
    got_ids = {r.id for r in fb.collect()}
    allowed = {ids[i] for i in range(n) if i % 3 == 1}
    assert got_ids <= allowed and fb.count() == 20

    # index-served path returns the same winners
    col.compact()
    col.build_vector_index(n_lists=4)
    ib = _collect(col.query_batch(qdf, n_results=5))
    assert set(ib) == set(batch)
    assert {k: v[0] for k, v in ib.items()} == {k: v[0] for k, v in batch.items()}

    # empty collection: empty frame with the caller's query_id type
    empty_col = client.create_collection("empty", dimension=dim)
    out = empty_col.query_batch(qdf, n_results=3, where={"x": 1})
    assert out.count() == 0 and dict(out.dtypes)["query_id"] == "int"


def test_sparse_query_batch_inline_and_indexed(client):
    """Distributed sparse retrieval join: inline snapshot scoring and the
    persisted bucket index agree, with and without bucket pruning."""
    col = client.create_collection("svbatch", dimension=2)
    col.add(
        ids=["a", "b", "c"],
        embeddings=[[1.0, 0], [0, 1.0], [0.5, 0.5]],
        metadatas=[
            {"sv": {"indices": [0, 2], "values": [1.0, 2.0]}},
            {"sv": {"indices": [2, 5], "values": [3.0, 1.0]}},
            {"sv": {"indices": [7], "values": [4.0]}},
        ],
    )
    spark = col._client.spark
    qdf = spark.createDataFrame(
        [
            (0, {"indices": [0, 2], "values": [1.0, 1.0]}),
            (1, {"indices": [7], "values": [2.0]}),
        ],
        "query_id INT, sv STRUCT<indices: ARRAY<INT>, values: ARRAY<FLOAT>>",
    )

    def got(df):
        return {(r.query_id, r.id): r.score for r in df.collect()}

    expected = {(0, "a"): 3.0, (0, "b"): 3.0, (1, "c"): 8.0}
    inline = got(col.sparse_query_batch(qdf, key="sv", n_results=3, idf=False))
    assert inline == expected

    col.compact()
    col.build_sparse_index("sv", n_buckets=4)
    indexed = got(col.sparse_query_batch(qdf, key="sv", n_results=3, idf=False))
    assert indexed == expected
    unpruned = got(
        col.sparse_query_batch(qdf, key="sv", n_results=3, idf=False, prune_buckets=False)
    )
    assert unpruned == expected
    # idf scaling changes scores but keeps per-query ranking deterministic
    with_idf = col.sparse_query_batch(qdf, key="sv", n_results=3, idf=True)
    assert {r.query_id for r in with_idf.collect()} == {0, 1}

    # adaptive default: a batch over the threshold skips the vocabulary
    # collect (scans all buckets) yet returns identical results; the
    # threshold probe itself is a bounded limit().count(), not a full count
    auto_big = got(
        col.sparse_query_batch(qdf, key="sv", n_results=3, idf=False, prune_threshold=1)
    )
    assert auto_big == expected
    auto_small = got(
        col.sparse_query_batch(qdf, key="sv", n_results=3, idf=False, prune_threshold=1024)
    )
    assert auto_small == expected


def test_hybrid_query_batch_rrf_fusion(client):
    """Batch RRF agrees with hand-computed fusion of the two sides."""
    col = client.create_collection("hyb", dimension=2, space="l2")
    col.add(
        ids=["a", "b", "c"],
        embeddings=[[1.0, 0.0], [0.0, 1.0], [0.7, 0.7]],
        metadatas=[
            {"sv": {"indices": [0], "values": [5.0]}},
            {"sv": {"indices": [0], "values": [1.0]}},
            {"sv": {"indices": [1], "values": [2.0]}},
        ],
    )
    spark = col._client.spark
    dq = spark.createDataFrame([(0, [1.0, 0.0])], "query_id INT, embedding ARRAY<FLOAT>")
    sq = spark.createDataFrame(
        [(0, {"indices": [0], "values": [1.0]})],
        "query_id INT, sv STRUCT<indices: ARRAY<INT>, values: ARRAY<FLOAT>>",
    )
    out = {r.id: r.score for r in col.hybrid_query_batch(
        dq, sq, key="sv", n_results=3, rrf_k=60, per_side_limit=10, idf=False
    ).collect()}
    # dense l2 ranks from [1,0]: a(0), c(~0.18), b(2) -> rank0 a=0 c=1 b=2
    # sparse dot: a=5 (rank0 0), b=1 (rank0 1); c missing -> default 10
    exp = {
        "a": -(1 / 60 + 1 / 60),
        "b": -(1 / 62 + 1 / 61),
        "c": -(1 / 61 + 1 / 70),
    }
    assert set(out) == set(exp)
    for k in exp:
        assert abs(out[k] - exp[k]) < 1e-9, (k, out[k], exp[k])
    # fusion order: a best; b (present in BOTH lists) beats c (dense-only)
    ordered = sorted(out, key=out.get)
    assert ordered == ["a", "b", "c"]


def test_dedup_index_lifecycle(client):
    """build_dedup_index -> find_near_duplicates gate -> incremental
    maintenance at compact (unchanged docs carry over by fingerprint) ->
    gc keeps only the referenced layout."""
    import os

    base_txt = "the quick brown fox jumps over the lazy dog one two "
    col = client.create_collection("dedup", dimension=2)
    fillers = [f"f{i}" for i in range(6)]
    col.add(
        ids=["a", "b", *fillers],
        embeddings=[[0.0, 1.0]] * 8,
        documents=[
            base_txt + "three",
            "entirely different words about spark plans here",
            *[f"unrelated filler document number {i} keeping the drift counter low" for i in range(6)],
        ],
    )
    desc = col.build_dedup_index(num_perm=16, bands=4, n=3)
    assert desc["version"] == col.version

    spark = col._client.spark
    batch = spark.createDataFrame(
        [("n1", base_txt + "four"), ("n2", "no overlap at all with anything else truly")],
        "id STRING, document STRING",
    )
    pairs = {(r.id_a, r.id_b) for r in col.find_near_duplicates(batch, threshold=0.5).collect()}
    assert ("a", "n1") in pairs and not any("n2" in p or "b" in p for p in pairs)

    # pin every band-table file before the incremental compaction: the
    # O(changed)-WRITES contract is that maintenance only APPENDS — files
    # already on disk stay byte-identical (path, size, mtime)
    def _file_states(root):
        out = {}
        for dirpath, _dirs, files in os.walk(root):
            for f in files:
                if f == "_SUCCESS" or f.endswith(".crc"):
                    continue  # Spark job markers, rewritten by any append
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
        return out

    before = _file_states(os.path.join(desc["path"], "bands"))

    # ingest + compact: maintenance refreshes the index to the new version
    col.add(ids=["c"], embeddings=[[1.0, 0.0]], documents=[base_txt + "five"])
    with pytest.raises(Exception, match="stale"):
        col.find_near_duplicates(batch)
    v2 = col.compact()
    desc2 = col._store.meta.metadata["__dedup_index__"]
    assert desc2["version"] == v2
    assert desc2["path"] == desc["path"]  # in-place append, no new layout dir
    after = _file_states(os.path.join(desc2["path"], "bands"))
    assert {p: after[p] for p in before} == before  # pre-existing files untouched
    assert set(after) > set(before)  # the changed doc's rows were appended
    live = col._load_dedup_bands(desc2)
    rows2 = {(r.id, r.band, r.bh) for r in live.drop("fp").collect()}
    b_old = spark.read.parquet(os.path.join(desc["path"], "bands")).filter("__epoch = %d" % desc["epoch"])
    rows1 = {(r.id, r.band, r.bh) for r in b_old.drop("fp", "__epoch").collect()}
    assert {t for t in rows2 if t[0] == "a"} == {t for t in rows1 if t[0] == "a"}
    assert {t[0] for t in rows2} == {"a", "b", "c", *fillers}
    pairs2 = {(r.id_a, r.id_b) for r in col.find_near_duplicates(batch, threshold=0.5).collect()}
    assert ("a", "n1") in pairs2 and ("c", "n1") in pairs2

    # update one doc: its old rows die by tombstone, others stay on disk
    col.update(ids=["b"], documents=["completely new content replacing b entirely now"])
    col.compact()
    desc3 = col._store.meta.metadata["__dedup_index__"]
    live3 = {(r.id, r.fp) for r in col._load_dedup_bands(desc3).select("id", "fp").distinct().collect()}
    assert {i for i, _ in live3} == {"a", "b", "c", *fillers}
    b_fp = {fp for i, fp in live3 if i == "b"}
    old_b_fp = {fp for i, fp in {(r.id, r.fp) for r in b_old.collect()} if i == "b"}
    assert b_fp and b_fp.isdisjoint(old_b_fp)  # b re-fingerprinted, old rows dead

    # gc keeps the (still-referenced) layout dir; the index keeps serving
    col.gc(keep_last=1, grace_seconds=0)
    idx_root = os.path.dirname(desc3["path"])
    assert os.path.isdir(desc3["path"]) and sorted(os.listdir(idx_root)) == ["v1"]
    assert col.find_near_duplicates(batch, threshold=0.5).count() >= 2


def test_client_utility_surface(spark, tmp_path):
    """BaseAPI utility parity: heartbeat, version, max batch size,
    count_collections, gated reset."""
    from chroma_spark.api import Client

    client = Client(spark, str(tmp_path / "util_root"))
    assert client.heartbeat() > 1_700_000_000 * 10**9
    assert isinstance(client.get_version(), str) and client.get_version()
    assert client.get_max_batch_size() >= 1
    client.create_collection("u1")
    client.create_collection("u2")
    assert client.count_collections() == 2
    with pytest.raises(Exception, match="disabled"):
        client.reset()
    assert client.count_collections() == 2  # nothing deleted
    client.allow_reset = True
    assert client.reset() is True
    assert client.count_collections() == 0 and client.list_collections() == []


def test_write_batch_cap_enforced(spark, tmp_path, monkeypatch):
    from chroma_spark.api import Client

    client = Client(spark, str(tmp_path / "cap_root"))
    col = client.create_collection("capped", dimension=2)
    monkeypatch.setattr(Client, "get_max_batch_size", lambda self: 2)
    with pytest.raises(Exception, match="exceeds get_max_batch_size"):
        col.add(ids=["a", "b", "c"], embeddings=[[0.0, 1.0]] * 3)
    col.add(ids=["a", "b"], embeddings=[[0.0, 1.0]] * 2)
    assert col.count() == 2


def test_admin_database_surface(spark, tmp_path):
    """AdminAPI parity: get_database raises-if-absent, list_* pagination,
    delete_database cascades its collections in one catalog commit."""
    from chroma_spark.api import Client
    from chroma_spark.sources.collection import CollectionError

    client = Client(spark, str(tmp_path / "admin_root"))
    client.create_database("d1")
    client.create_database("d2")
    assert client.get_database("d1")["name"] == "d1"
    with pytest.raises(CollectionError, match="does not exist"):
        client.get_database("ghost")
    dbs = client.list_databases()
    assert dbs == sorted(dbs) and {"d1", "d2"} <= set(dbs)
    assert client.list_databases(limit=1) == dbs[:1]
    assert client.list_databases(limit=2, offset=1) == dbs[1:3]

    d1 = Client(spark, str(tmp_path / "admin_root"), database="d1")
    for n in ("c1", "c2", "c3"):
        d1.create_collection(n)
    assert d1.list_collections() == ["c1", "c2", "c3"]
    assert d1.list_collections(limit=2) == ["c1", "c2"]
    assert d1.list_collections(limit=2, offset=2) == ["c3"]

    client.delete_database("d1")
    assert "d1" not in client.list_databases()
    # the cascade removed the scoped collections from the catalog
    assert not any(n.startswith(f"{client.tenant}/d1/") for n in client.catalog.list())
    with pytest.raises(CollectionError):
        client.delete_database("d1")


def test_filtered_index_query_boosts_nprobe(spark, tmp_path):
    """A selective filter with a small explicit nprobe must not lose the
    answer: selectivity-adaptive probe boosting scales the budget so
    filter-before-ANN keeps its candidates (adversarial layout: the
    allowed records live in lists far from the query)."""
    from chroma_spark.api import Client

    client = Client(spark, str(tmp_path / "store"))
    col = client.create_collection("fq", dimension=2, space="l2")
    # 4 tight clusters at the corners; label = cluster
    ids, embs, metas = [], [], []
    corners = {"a": (0.0, 0.0), "b": (10.0, 0.0), "c": (0.0, 10.0), "d": (10.0, 10.0)}
    for lab, (x, y) in corners.items():
        for i in range(8):
            ids.append(f"{lab}{i}")
            embs.append([x + i * 0.01, y + i * 0.01])
            metas.append({"lab": lab})
    col.add(ids=ids, embeddings=embs, metadatas=metas)
    col.build_vector_index(n_lists=4)

    # query sits ON cluster a, but the filter only allows cluster d:
    # nprobe=1 would probe a's list and find nothing without the boost
    res = col.query([[0.0, 0.0]], n_results=3, where={"lab": "d"}, nprobe=1)
    assert res["ids"][0] == ["d0", "d1", "d2"]


def test_semantic_near_duplicates_from_vector_index(client, spark):
    """SemDeDup served from the collection's own IVF layout: planted
    near-identical vectors land in one group with exactly one keeper;
    a pending WAL tail or a missing index raises."""
    import random

    col = client.create_collection("semdd", dimension=8)
    rnd = random.Random(5)
    ids = [f"d{i:02d}" for i in range(24)]
    embs = [[rnd.gauss(0, 1) for _ in range(8)] for _ in ids]
    # d21/d22 are near-copies of d20 (tiny perturbation)
    embs[21] = [v * 1.0005 + 1e-4 for v in embs[20]]
    embs[22] = [v * 0.9995 - 1e-4 for v in embs[20]]
    col.add(ids=ids, embeddings=embs)
    with pytest.raises(CollectionError, match="no vector index"):
        col.semantic_near_duplicates()
    col.build_vector_index(n_lists=2)
    rows = {r.id: r for r in col.semantic_near_duplicates(threshold=0.001).collect()}
    assert len(rows) == 24
    dup_group = {rows[i].group for i in ("d20", "d21", "d22")}
    assert len(dup_group) == 1
    keepers = [i for i in ("d20", "d21", "d22") if rows[i].keep]
    assert len(keepers) == 1
    assert all(rows[i].keep for i in rows if i not in ("d20", "d21", "d22"))
    # expr tier agrees end to end through the API path
    expr_rows = {r.id: r for r in col.semantic_near_duplicates(threshold=0.001, method="expr").collect()}
    assert {(r.id, r.group, r.keep) for r in rows.values()} == {
        (r.id, r.group, r.keep) for r in expr_rows.values()
    }
    col.add(ids=["zz"], embeddings=[[0.0] * 8])
    with pytest.raises(CollectionError, match="stale"):
        col.semantic_near_duplicates()


def test_persisted_tokenizer_lifecycle(client, spark, tmp_path):
    """build_tokenizer freezes a merge table in the collection config:
    token counts stay stable as the corpus grows, a cold re-open rebuilds
    the identical tokenizer, and WAL-tail docs are visible read-level
    aware before compaction."""
    from chroma_spark.api import Client

    col = client.create_collection("tok", dimension=2)
    with pytest.raises(CollectionError, match="no tokenizer"):
        col.token_counts()
    col.add(
        ids=["a", "b"],
        embeddings=[[0.0, 1.0], [1.0, 0.0]],
        documents=["the cat sat on the mat", "the cat cat"],
    )
    col.compact()
    desc = col.build_tokenizer(n_merges=8)
    # the trainer stops early once no pair repeats (tiny corpus)
    assert 1 <= len(desc["merges"]) <= 8
    before = {r.id: (r.n_words, r.n_bpe) for r in col.token_counts().collect()}
    assert set(before) == {"a", "b"} and before["a"][0] == 6

    # corpus grows; frozen merges don't move, new doc visible pre-compaction
    col.add(ids=["c"], embeddings=[[0.5, 0.5]], documents=["dog dog dog"])
    after = {r.id: (r.n_words, r.n_bpe) for r in col.token_counts().collect()}
    assert after["a"] == before["a"] and after["b"] == before["b"]
    assert after["c"][0] == 3
    assert col._store.meta.metadata["__tokenizer__"]["merges"] == desc["merges"]
    # index_only skips the WAL tail
    assert {r.id for r in col.token_counts(read_level="index_only").collect()} == {"a", "b"}

    # cold re-open: the persisted spec rebuilds the identical tokenizer
    client2 = Client(spark, client.catalog.root)
    col2 = client2.get_collection("tok")
    again = {r.id: (r.n_words, r.n_bpe) for r in col2.token_counts().collect()}
    assert again == after
    toks = {r.id: list(r.bpe_tokens) for r in col2.tokenize().collect()}
    assert sum(len(t) for t in toks.values()) == sum(n for _, n in after.values())


def test_copy_to_materialized_full_and_filtered(spark, tmp_path):
    client = Client(spark, str(tmp_path / "store"))
    col = client.create_collection(
        "src", dimension=2, space="cosine", metadata={"team": "data"}
    )
    col.add(
        ids=["a", "b", "c"],
        embeddings=[[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
        documents=["alpha doc", "beta doc", "gamma text"],
        metadatas=[{"k": 1}, {"k": 2}, {"k": 3}],
    )
    # full copy preserves records and config
    dst = col.copy_to("dst")
    assert dst.count() == 3
    row = dst.get(ids=["b"])[0]
    assert row["document"] == "beta doc" and row["k"] == 2
    res = dst.query(query_embeddings=[[0.1, 0.9]], n_results=1)
    assert res["ids"][0] == ["b"]  # space/dimension carried over
    # the copy is MATERIALIZED: writes to src do not leak into dst (and
    # vice versa), unlike fork's shared files
    col.add(ids=["d"], embeddings=[[0.5, 0.5]], documents=["delta"])
    dst.delete(ids=["a"])
    assert col.count() == 4 and dst.count() == 2
    # filtered subset copy
    sub = col.copy_to("sub", where={"k": {"$gte": 2}}, where_document={"$contains": "doc"})
    assert sorted(r["id"] for r in sub.get()) == ["b"]
    # empty result still creates the (empty) destination
    none = col.copy_to("none", where={"k": {"$gt": 99}})
    assert none.count() == 0 and "none" in client.list_collections()


def test_copy_to_across_clients(spark, tmp_path):
    src_client = Client(spark, str(tmp_path / "store_a"))
    dst_client = Client(spark, str(tmp_path / "store_b"))
    col = src_client.create_collection("src", dimension=2)
    col.add(ids=["x"], embeddings=[[1.0, 2.0]], documents=["cross-store"])
    moved = col.copy_to("moved", client=dst_client)
    assert moved.count() == 1
    assert "moved" in dst_client.list_collections()
    assert "moved" not in src_client.list_collections()
    assert dst_client.get_collection("moved").get(ids=["x"])[0]["document"] == "cross-store"


def test_client_vacuum_compacts_and_prunes(spark, tmp_path):
    client = Client(spark, str(tmp_path / "store"))
    a = client.create_collection("va", dimension=2)
    b = client.create_collection("vb", dimension=2)
    a.add(ids=["1"], embeddings=[[1.0, 0.0]], documents=["one"])
    a.compact()
    a.add(ids=["2"], embeddings=[[0.0, 1.0]], documents=["two"])
    b.add(ids=["9"], embeddings=[[1.0, 1.0]], documents=["nine"])
    pruned = client.vacuum(grace_seconds=0.0)
    assert set(pruned) == {"va", "vb"}
    # both collections fully compacted: WAL folded, reads intact
    assert a.count(read_level="index_only") == 2
    assert b.count(read_level="index_only") == 1
    # va's pre-vacuum base version (superseded twice) got pruned
    assert len(pruned["va"]) >= 1
    assert a.get(ids=["1"])[0]["document"] == "one"
