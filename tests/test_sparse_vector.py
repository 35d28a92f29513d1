"""SparseVector value-type parity tests (chromadb/base_types.py:13-117):
construction-time validation, labels/tokens wire format, struct assembly.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chroma_spark.sparse_vector import (
    SPARSE_VECTOR_TYPE,
    SparseVectorError,
    from_wire,
    sparse_struct,
    to_wire,
    validate_sparse_vector,
)


def test_valid_vectors_pass():
    validate_sparse_vector({"indices": [0, 3, 7], "values": [1.0, 2.0, 0.5]})
    validate_sparse_vector(
        {"indices": [1, 2], "values": [1, 2], "labels": ["alpha", "beta"]}
    )


@pytest.mark.parametrize(
    "sv,msg",
    [
        ({"indices": [0, 1], "values": [1.0]}, "lengths differ"),
        ({"indices": [3, 1], "values": [1.0, 2.0]}, "strictly ascending"),
        ({"indices": [1, 1], "values": [1.0, 2.0]}, "strictly ascending"),
        ({"indices": [-1], "values": [1.0]}, "non-negative"),
        ({"indices": [0], "values": ["x"]}, "not numeric"),
        ({"indices": [0, 1], "values": [1.0, 2.0], "labels": ["only-one"]}, "align"),
        ({"indices": [True], "values": [1.0]}, "non-negative int"),
    ],
)
def test_invalid_vectors_raise(sv, msg):
    with pytest.raises(SparseVectorError, match=msg):
        validate_sparse_vector(sv)


def test_wire_format_round_trip_tokens_key():
    """Wire format uses ``tokens`` for labels (base_types.py:90-101)."""
    sv = {"indices": [0, 5], "values": [1.0, 2.0], "labels": ["a", "b"]}
    wire = to_wire(sv)
    assert wire == {"indices": [0, 5], "values": [1.0, 2.0], "tokens": ["a", "b"]}
    assert from_wire(wire) == sv
    # no labels -> key omitted entirely
    bare = to_wire({"indices": [1], "values": [3.0]})
    assert "tokens" not in bare and "labels" not in bare
    assert from_wire(bare)["labels"] is None
    # lenient reader accepts the python-side 'labels' key too
    assert from_wire({"indices": [1], "values": [3.0], "labels": ["x"]})["labels"] == ["x"]


def test_sparse_struct_column(spark):
    df = spark.createDataFrame(
        [([0, 2], [1.0, 2.0], ["t0", "t2"]), ([1], [5.0], None)],
        "i ARRAY<INT>, v ARRAY<FLOAT>, l ARRAY<STRING>",
    ).select(sparse_struct(F.col("i"), F.col("v"), F.col("l")).alias("sv"))
    assert df.schema["sv"].dataType == SPARSE_VECTOR_TYPE
    rows = {tuple(r.sv.indices): r.sv for r in df.collect()}
    assert rows[(0, 2)].labels == ["t0", "t2"]
    assert rows[(1,)].labels is None
    # structs with labels still work in the posting-list operators
    from chroma_spark.operators.sparse import explode_postings

    posts = explode_postings(
        df.select(F.lit("d1").alias("id"), F.col("sv").alias("sparse"))
    ).collect()
    assert {(r.idx, r.doc_w) for r in posts} == {(0, 1.0), (2, 2.0), (1, 5.0)}
