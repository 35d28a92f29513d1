"""Schema system: per-key index toggles, query-time rejection, persistence
(reference collection_schema.rs:233-239, 2432-2467;
service_based_frontend.rs:2813-2819; chromadb/api/types.py:2101)."""

from __future__ import annotations

import pytest

from chroma_spark.api import Client
from chroma_spark.schema import Schema, SchemaError


def test_defaults_all_enabled():
    s = Schema()
    assert s.is_index_enabled("string_inverted_index")
    assert s.is_index_enabled("vector_index", "anykey")
    s.validate_where({"k": {"$eq": "v"}})  # no raise


def test_per_key_override_and_config():
    s = Schema().delete_index("string_inverted_index", key="notes")
    assert not s.is_index_enabled("string_inverted_index", "notes")
    assert s.is_index_enabled("string_inverted_index", "other")
    s.create_index("vector_index", config={"space": "cosine", "nprobe": 16})
    assert s.index_config("vector_index")["nprobe"] == 16


def test_where_validation_recurses_composites():
    s = Schema().delete_index("int_inverted_index", key="age")
    s.validate_where({"name": "x"})
    with pytest.raises(SchemaError, match="age"):
        s.validate_where({"$and": [{"name": "x"}, {"$or": [{"age": {"$gt": 3}}]}]})
    # same key, string type -> different index -> allowed
    s.validate_where({"age": {"$eq": "three"}})
    # $in checks element types
    with pytest.raises(SchemaError):
        s.validate_where({"age": {"$in": [1, 2]}})


def test_type_level_default_disable():
    s = Schema().delete_index("bool_inverted_index")
    with pytest.raises(SchemaError, match="bool"):
        s.validate_where({"flag": True})
    s.create_index("bool_inverted_index", key="flag")  # re-enable just one key
    s.validate_where({"flag": True})


def test_fts_and_knn_gates():
    s = Schema().delete_index("fts_index", key="#document")
    with pytest.raises(SchemaError, match="fts"):
        s.validate_where_document({"$contains": "x"})
    s2 = Schema().delete_index("vector_index", key="#embedding")
    with pytest.raises(SchemaError, match="vector"):
        s2.validate_knn()
    s2.validate_knn(sparse=True)  # sparse index untouched


def test_roundtrip_dict():
    s = Schema().delete_index("fts_index").create_index("vector_index", config={"space": "ip"})
    s2 = Schema.from_dict(s.to_dict())
    assert not s2.is_index_enabled("fts_index")
    assert s2.index_config("vector_index")["space"] == "ip"


def test_collection_rejects_disabled_index_queries(spark, tmp_path):
    client = Client(spark, str(tmp_path / "store"))
    schema = Schema().delete_index("float_inverted_index", key="score")
    col = client.create_collection("s", dimension=2, schema=schema)
    col.add(ids=["a"], embeddings=[[1.0, 0.0]], metadatas=[{"score": 0.5}], documents=["d"])
    with pytest.raises(SchemaError, match="score"):
        col.get(where={"score": {"$gt": 0.1}})
    with pytest.raises(SchemaError, match="score"):
        col.query([[1.0, 0.0]], where={"score": {"$gt": 0.1}})
    assert len(col.get()) == 1  # unfiltered reads unaffected

    # schema persists across Collection re-open
    col2 = client.get_collection("s")
    with pytest.raises(SchemaError):
        col2.get(where={"score": 0.5})

    # mutate + persist: re-enable
    s = col2.schema.create_index("float_inverted_index", key="score")
    col2.update_schema(s)
    assert col2.get(where={"score": {"$gt": 0.1}})[0]["id"] == "a"


def test_collection_knn_gate(spark, tmp_path):
    client = Client(spark, str(tmp_path / "store"))
    schema = Schema().delete_index("vector_index")
    col = client.create_collection("v", dimension=2, schema=schema)
    col.add(ids=["a"], embeddings=[[1.0, 0.0]])
    with pytest.raises(SchemaError, match="vector"):
        col.query([[1.0, 0.0]])
    col.get()  # metadata reads unaffected
