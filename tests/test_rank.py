"""RankDomain merge semantics (rank.rs:34-120) and RRF desugar unit tests."""

from __future__ import annotations

import pytest

from chroma_spark.operators.rank import RankDomain, RankError, _merge, rrf


def _dom(spark, pairs, default=None):
    if pairs is None:
        return RankDomain(None, default)
    df = spark.createDataFrame(pairs, "id BIGINT, score DOUBLE")
    return RankDomain(df, default)


def _collect(domain):
    return {r["id"]: r["score"] for r in domain.support.collect()}


def test_merge_both_defaults_union(spark):
    l = _dom(spark, [(1, 10.0), (2, 20.0)], default=0.0)
    r = _dom(spark, [(2, 1.0), (3, 3.0)], default=100.0)
    out = _merge(l, r, lambda a, b: a + b)
    assert out.default == 100.0
    assert _collect(out) == {1: 110.0, 2: 21.0, 3: 3.0}


def test_merge_one_default_bounds_support(spark):
    l = _dom(spark, [(1, 10.0), (2, 20.0)], default=5.0)
    r = _dom(spark, [(2, 1.0), (3, 3.0)], default=None)
    out = _merge(l, r, lambda a, b: a + b)
    assert out.default is None
    assert _collect(out) == {2: 21.0, 3: 8.0}


def test_merge_no_defaults_intersection(spark):
    l = _dom(spark, [(1, 10.0), (2, 20.0)], default=None)
    r = _dom(spark, [(2, 1.0), (3, 3.0)], default=None)
    out = _merge(l, r, lambda a, b: a + b)
    assert out.default is None
    assert _collect(out) == {2: 21.0}


def test_merge_flat_sides(spark):
    flat = _dom(spark, None, default=2.0)
    sup = _dom(spark, [(1, 3.0)], default=None)
    out = _merge(flat, sup, lambda a, b: a * b)
    assert out.default is None
    assert _collect(out) == {1: 6.0}
    # empty domain (no support, no default) wipes everything under no-default merge
    empty = _dom(spark, None, default=None)
    gone = _merge(empty, sup, lambda a, b: a + b)
    assert gone.support is None and gone.default is None


def test_rrf_desugar_shape():
    expr = rrf([{"query": [0.1], "limit": 5}], k=60)
    assert "$sub" in expr
    inner = expr["$sub"]["right"]
    assert "$div" in inner  # single term is not wrapped in $sum
    knn = inner["$div"]["right"]["$sum"][1]["$knn"]
    assert knn["return_rank"] is True


def test_rrf_validation():
    with pytest.raises(RankError):
        rrf([], k=60)
    with pytest.raises(RankError):
        rrf([{"query": [0.1]}], k=0)
    with pytest.raises(RankError):
        rrf([{"query": [0.1]}], weights=[1.0, 2.0])
    with pytest.raises(RankError):
        rrf([{"query": [0.1]}], weights=[-1.0])
    with pytest.raises(RankError):
        rrf([{"query": [0.1]}], weights=[0.0], normalize=True)
