"""Property-based search-pipeline testing: random (k, mode, offset, limit)
grouped-top-k plus pagination must match an independent pure-Python model —
the reference's search-variant property strategy
(``chromadb/test/property/test_filtering.py:492-650`` get/query/search
variants over random payloads).
"""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from chroma_spark.operators.group_by import ranked_group_by
from chroma_spark.operators.limit import page


def _records(n=40, seed=9):
    rnd = random.Random(seed)
    return [
        (i, rnd.randrange(4), round(rnd.uniform(0, 10), 3))
        for i in range(n)
    ]


ROWS = _records()


@pytest.fixture(scope="module")
def rdf(spark):
    df = spark.createDataFrame(ROWS, "id BIGINT, label INT, score DOUBLE")
    df.cache().count()
    return df


def model(rows, k, mode, offset, limit):
    """Independent implementation: per-group top-k by (score asc|desc, id
    asc), flatten, global order (score asc, id asc), slice."""
    by_group: dict[int, list] = {}
    for r in rows:
        by_group.setdefault(r[1], []).append(r)
    kept = []
    for g, members in by_group.items():
        members = sorted(
            members, key=lambda r: (r[2] if mode == "min_k" else -r[2], r[0])
        )
        kept.extend(members[:k])
    kept = sorted(kept, key=lambda r: (r[2], r[0]))
    end = None if limit is None else offset + limit
    return [r[0] for r in kept[offset:end]]


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    k=st.integers(min_value=1, max_value=12),
    mode=st.sampled_from(["min_k", "max_k"]),
    offset=st.integers(min_value=0, max_value=8),
    limit=st.one_of(st.none(), st.integers(min_value=1, max_value=15)),
)
def test_grouped_topk_pagination_matches_model(rdf, k, mode, offset, limit):
    out = ranked_group_by(rdf, ["label"], k, ["score"], mode)
    out = page(out, [F.col("score").asc(), F.col("id").asc()], offset=offset, limit=limit)
    got = [r["id"] for r in out.select("id").collect()]
    assert got == model(ROWS, k, mode, offset, limit), (k, mode, offset, limit)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    k=st.integers(min_value=1, max_value=6),
    offset=st.integers(min_value=0, max_value=5),
    limit=st.one_of(st.none(), st.integers(min_value=1, max_value=10)),
)
def test_group_slice_preserves_payload_columns(spark, rdf, k, offset, limit):
    """Payload columns ride through the group/slice stages aligned with
    their ids (the Projection contract: winners keep their fields)."""
    out = ranked_group_by(rdf, ["label"], k, ["score"], "min_k")
    out = page(out, [F.col("score").asc(), F.col("id").asc()], offset=offset, limit=limit)
    got = [(r["id"], r["label"]) for r in out.select("id", "label").collect()]
    expect_ids = model(ROWS, k, "min_k", offset, limit)
    labels = {r[0]: r[1] for r in ROWS}
    assert got == [(i, labels[i]) for i in expect_ids]
