"""File ingestion sources (sources/files.py): JSONL / CSV / text readers,
the Collection.add_files path, the streaming reader, and the JSONL sink."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from chroma_spark.api import Client
from chroma_spark.sources.collection import CollectionError
from chroma_spark.sources.files import (
    read_documents_csv,
    read_documents_jsonl,
    read_documents_text,
    stream_documents_jsonl,
    write_documents_jsonl,
)

JSONL_SCHEMA = (
    "doc_id STRING, text STRING, emb ARRAY<DOUBLE>, lang STRING, stars LONG"
)


def _jsonl_corpus(tmp_path):
    rows = [
        {"doc_id": f"d{i}", "text": f"document body {i}", "emb": [float(i), 0.5],
         "lang": "en" if i % 2 == 0 else "fr", "stars": i}
        for i in range(6)
    ]
    d = tmp_path / "jsonl"
    d.mkdir()
    with open(d / "part0.jsonl", "w") as f:
        for r in rows[:3]:
            f.write(json.dumps(r) + "\n")
    with gzip.open(d / "part1.jsonl.gz", "wt") as f:  # gz shard reads transparently
        for r in rows[3:]:
            f.write(json.dumps(r) + "\n")
    return rows, str(d)


def test_read_jsonl_canonical_shape(spark, tmp_path):
    rows, d = _jsonl_corpus(tmp_path)
    df = read_documents_jsonl(
        spark, d, schema=JSONL_SCHEMA, id_col="doc_id", document_col="text",
        embedding_col="emb",
    )
    assert df.columns == ["id", "document", "embedding", "lang", "stars"]
    assert dict(df.dtypes)["embedding"] == "array<float>"
    got = {r["id"]: r for r in df.collect()}
    assert len(got) == 6
    assert got["d4"]["document"] == "document body 4"
    assert got["d4"]["embedding"] == [4.0, 0.5]
    assert got["d3"]["lang"] == "fr" and got["d3"]["stars"] == 3


def test_read_jsonl_content_ids_and_meta_selection(spark, tmp_path):
    rows, d = _jsonl_corpus(tmp_path)
    df = read_documents_jsonl(
        spark, d, schema=JSONL_SCHEMA, document_col="text", metadata_cols=["lang"]
    )
    assert df.columns == ["id", "document", "lang"]
    ids = [r["id"] for r in df.collect()]
    assert len(ids) == len(set(ids)) == 6 and all(len(i) == 64 for i in ids)
    with pytest.raises(CollectionError, match="not in input"):
        read_documents_jsonl(spark, d, schema=JSONL_SCHEMA, document_col="nope")


def test_read_csv_with_delimited_embedding(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        "rid,body,vec,grade\n"
        "a,alpha text,0.1;0.2,3\n"
        "b,beta text,1.5;2.5,4\n"
    )
    df = read_documents_csv(
        spark, str(p), id_col="rid", document_col="body", embedding_col="vec"
    )
    got = {r["id"]: r for r in df.collect()}
    assert got["b"]["embedding"] == pytest.approx([1.5, 2.5])
    assert got["a"]["grade"] == 3  # inferSchema typed the metadata column


def test_read_text_lines_dedup_and_whole_files(spark, tmp_path):
    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("same line\nunique one\nsame line\n\n")
    (d / "b.txt").write_text("from b\n")
    df = read_documents_text(spark, str(d))
    rows = df.collect()
    # 4 non-empty lines, exact-duplicate "same line" collapses -> 3 records
    assert sorted(r["document"] for r in rows) == ["from b", "same line", "unique one"]
    assert all(r["uri"].endswith((".txt",)) for r in rows)
    whole = read_documents_text(spark, str(d), whole_files=True).collect()
    assert len(whole) == 2
    byfile = {os.path.basename(r["uri"]): r["document"] for r in whole}
    assert "unique one" in byfile["a.txt"] and byfile["b.txt"].strip() == "from b"


def test_add_files_end_to_end(spark, tmp_path):
    rows, d = _jsonl_corpus(tmp_path)
    client = Client(spark, str(tmp_path / "store"))
    col = client.create_collection("fromfiles", dimension=2)
    n = col.add_files(
        d, format="jsonl", schema=JSONL_SCHEMA, id_col="doc_id",
        document_col="text", embedding_col="emb",
    )
    assert n == 6 and col.count() == 6
    row = col.get(ids=["d2"], include=["documents", "metadatas"])[0]
    assert row["document"] == "document body 2"
    assert row["lang"] == "en"
    assert len(col.get(where={"lang": "fr"})) == 3
    with pytest.raises(CollectionError, match="format"):
        col.add_files(d, format="avro")


def test_stream_jsonl_ingest(spark, tmp_path):
    rows, d = _jsonl_corpus(tmp_path)
    client = Client(spark, str(tmp_path / "store"))
    col = client.create_collection("streamed", dimension=2)
    stream = stream_documents_jsonl(
        spark, d, JSONL_SCHEMA, id_col="doc_id", document_col="text",
        embedding_col="emb", options={"maxFilesPerTrigger": "1"},
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, _bid: batch.count() and col.add_records(batch)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert col.count() == 6


def test_write_documents_jsonl_roundtrip(spark, tmp_path):
    rows, d = _jsonl_corpus(tmp_path)
    df = read_documents_jsonl(
        spark, d, schema=JSONL_SCHEMA, id_col="doc_id", document_col="text"
    )
    out = str(tmp_path / "export")
    write_documents_jsonl(df.repartition(2), out)
    assert any(f.endswith(".gz") for f in os.listdir(out))
    back = spark.read.json(out)
    assert back.count() == 6
    assert {r["id"] for r in back.select("id").collect()} == {f"d{i}" for i in range(6)}


def test_export_files_roundtrip_filtered(spark, tmp_path):
    client = Client(spark, str(tmp_path / "store"))
    col = client.create_collection("exp", dimension=2)
    col.add(
        ids=["a", "b", "c"],
        embeddings=[[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
        documents=["alpha doc", "beta doc", "gamma text"],
        metadatas=[{"k": 1}, {"k": 2}, {"k": 3}],
    )
    out = str(tmp_path / "export")
    n = col.export_files(out, where={"k": {"$lte": 2}}, include=["documents", "metadatas"])
    assert n == 2
    back = {r["id"]: r for r in spark.read.json(out).collect()}
    assert set(back) == {"a", "b"}
    assert back["a"]["document"] == "alpha doc" and back["b"]["k"] == 2
    assert "embedding" not in spark.read.json(out).columns  # not in include
    # re-ingest the export into a fresh collection (the full loop)
    col2 = client.create_collection("reimp")
    assert col2.add_files(out, format="jsonl", id_col="id", document_col="document") == 2
    assert col2.get(ids=["b"])[0]["k"] == 2
