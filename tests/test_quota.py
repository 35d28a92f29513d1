"""Quota enforcement + rate limiting (chroma_spark/quota.py).

Mirrors the reference's frontend quota tests: measurement per UsageType,
static limits with per-tenant overrides, enforcement wired through the
Client/Collection entry points, and the token-bucket rate limiter
(rust/frontend/src/quota/mod.rs)."""

from __future__ import annotations

import pytest

from chroma_spark.api import Client
from chroma_spark.quota import (
    Action,
    QuotaExceededError,
    QuotaPayload,
    RateLimitError,
    StaticQuotaEnforcer,
    TokenBucketRateLimiter,
    UsageType,
)


# ---------------------------------------------------------------- measurement


def test_measure_add_payload():
    u = QuotaPayload(
        action=Action.ADD,
        tenant="t",
        ids=["a", "bb", "ccc"],
        embeddings=[[1.0, 2.0], [1.0, 2.0, 3.0], None],
        documents=["hi", None, "héllo"],  # é is 2 utf-8 bytes -> 6
        uris=[None, "s3://x/y", None],
        metadatas=[{"k1": "vvvv", "n": 3}, None, {"a": True}],
    )
    usages = u.usages()
    assert usages[UsageType.NUM_RECORDS] == 3
    assert usages[UsageType.ID_SIZE_BYTES] == 3
    assert usages[UsageType.EMBEDDING_DIMENSIONS] == 3
    assert usages[UsageType.DOCUMENT_SIZE_BYTES] == 6
    assert usages[UsageType.URI_SIZE_BYTES] == 8
    assert usages[UsageType.NUM_METADATA_KEYS] == 2
    assert usages[UsageType.METADATA_KEY_SIZE_BYTES] == 2
    assert usages[UsageType.METADATA_VALUE_SIZE_BYTES] == 4  # strings only
    # absent payload fields measure nothing
    assert UsageType.NUM_QUERY_EMBEDDINGS not in usages
    assert UsageType.LIMIT_VALUE not in usages


def test_measure_where_trees():
    u = QuotaPayload(
        action=Action.GET,
        tenant="t",
        where={
            "$and": [
                {"color": "turquoise"},
                {"$or": [{"size": {"$gte": 10}}, {"tag": {"$in": ["aa", "bbbb"]}}]},
            ]
        },
        where_document={
            "$or": [{"$contains": "needle"}, {"$regex": "ab?c{2,3}"}]
        },
        limit=25,
    ).usages()
    assert u[UsageType.NUM_WHERE_PREDICATES] == 3
    assert u[UsageType.WHERE_VALUE_SIZE_BYTES] == len("turquoise")
    assert u[UsageType.NUM_WHERE_DOCUMENT_PREDICATES] == 2
    assert u[UsageType.WHERE_DOCUMENT_VALUE_LENGTH] == len("ab?c{2,3}")
    assert u[UsageType.REGEX_PATTERN_LENGTH] == len("ab?c{2,3}")
    assert u[UsageType.LIMIT_VALUE] == 25


def test_measure_query_and_rank():
    u = QuotaPayload(
        action=Action.SEARCH,
        tenant="t",
        query_embeddings=[[0.0] * 8, [0.0] * 16],
        rank={
            "$sum": [
                {"$knn": {"query": [1.0, 2.0], "limit": 64}},
                {"$mul": [{"$val": 0.3}, {"$knn": {"query": [0.0], "limit": 128}}]},
            ]
        },
    ).usages()
    assert u[UsageType.NUM_QUERY_EMBEDDINGS] == 2
    assert u[UsageType.EMBEDDING_DIMENSIONS] == 16
    assert u[UsageType.NUM_RANK_KNN] == 2
    assert u[UsageType.RANK_KNN_LIMIT] == 128


# ---------------------------------------------------------------- enforcement


def test_static_enforcer_limits_and_overrides():
    enforcer = StaticQuotaEnforcer(
        limits={UsageType.NUM_RECORDS: 2},
        tenant_overrides={"vip": {UsageType.NUM_RECORDS: 10}},
    )
    small = QuotaPayload(action=Action.ADD, tenant="t", ids=["a", "b"])
    enforcer.enforce(small)  # at the limit is fine
    big = QuotaPayload(action=Action.ADD, tenant="t", ids=["a", "b", "c"])
    with pytest.raises(QuotaExceededError, match="num_records=3 > limit 2"):
        enforcer.enforce(big)
    vip = QuotaPayload(action=Action.ADD, tenant="vip", ids=["a", "b", "c"])
    enforcer.enforce(vip)  # override shadows the default


def test_enforcer_accepts_string_keys():
    enforcer = StaticQuotaEnforcer(limits={"regex_pattern_length": 4})
    bad = QuotaPayload(
        action=Action.GET, tenant="t", where_document={"$regex": "abcde"}
    )
    with pytest.raises(QuotaExceededError):
        enforcer.enforce(bad)


# ---------------------------------------------------------------- rate limit


def test_token_bucket_burst_and_refill():
    now = [0.0]
    rl = TokenBucketRateLimiter(capacity=2, refill_per_sec=1.0, clock=lambda: now[0])
    rl.check("t", Action.QUERY)
    rl.check("t", Action.QUERY)
    with pytest.raises(RateLimitError):
        rl.check("t", Action.QUERY)
    # other tenants / actions have independent buckets
    rl.check("u", Action.QUERY)
    rl.check("t", Action.GET)
    # refill restores tokens with time
    now[0] = 1.5
    rl.check("t", Action.QUERY)
    with pytest.raises(RateLimitError):
        rl.check("t", Action.QUERY)


def test_per_action_rates():
    now = [0.0]
    rl = TokenBucketRateLimiter(
        capacity=100,
        refill_per_sec=10,
        action_rates={Action.SEARCH: (1, 0.1)},
        clock=lambda: now[0],
    )
    rl.check("t", Action.SEARCH)
    with pytest.raises(RateLimitError):
        rl.check("t", Action.SEARCH)
    for _ in range(50):  # default bucket untouched by the override
        rl.check("t", Action.GET)


# ---------------------------------------------------------------- wired through


def test_client_enforces_quotas_end_to_end(spark, tmp_path):
    enforcer = StaticQuotaEnforcer(
        limits={
            UsageType.NUM_RECORDS: 3,
            UsageType.NUM_WHERE_PREDICATES: 2,
            UsageType.LIMIT_VALUE: 100,
            UsageType.NUM_COLLECTIONS: 2,
        }
    )
    client = Client(spark, str(tmp_path / "quota_root"), quota_enforcer=enforcer)
    col = client.create_collection("c1", dimension=2)

    col.add(ids=["a", "b", "c"], embeddings=[[0.0, 1.0]] * 3)  # at limit
    with pytest.raises(QuotaExceededError, match="num_records"):
        col.add(ids=["d", "e", "f", "g"], embeddings=[[0.0, 1.0]] * 4)
    # rejected batch never reached the log
    assert col.count() == 3

    with pytest.raises(QuotaExceededError, match="num_where_predicates"):
        col.get(where={"$and": [{"a": 1}, {"b": 2}, {"c": 3}]})
    with pytest.raises(QuotaExceededError, match="limit_value"):
        col.get(limit=101)
    with pytest.raises(QuotaExceededError, match="limit_value"):
        col.query(query_embeddings=[[0.0, 1.0]], n_results=500)
    assert len(col.get(limit=2)) == 2  # compliant calls still work

    client.create_collection("c2")
    with pytest.raises(QuotaExceededError, match="num_collections"):
        client.create_collection("c3")


def test_client_rate_limiter_end_to_end(spark, tmp_path):
    now = [0.0]
    rl = TokenBucketRateLimiter(capacity=2, refill_per_sec=0.0, clock=lambda: now[0])
    client = Client(spark, str(tmp_path / "rate_root"), rate_limiter=rl)
    col = client.create_collection("c", dimension=2)
    col.add(ids=["a"], embeddings=[[0.0, 1.0]])
    col.get()
    col.get()
    with pytest.raises(RateLimitError):
        col.get()
    # writes draw from the ADD bucket, still fine
    col.update(ids=["a"], embeddings=[[1.0, 1.0]])


# ---------------------------------------------------------------- properties


def test_quota_measurement_properties():
    """Hypothesis: measurement is monotone in batch growth, never crashes on
    odd payloads, and enforcing with limits >= measured values passes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    meta_vals = st.one_of(st.booleans(), st.integers(-5, 5), st.text(max_size=8))
    payloads = st.builds(
        QuotaPayload,
        action=st.just(Action.ADD),
        tenant=st.text(min_size=1, max_size=5),
        ids=st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=8),
        embeddings=st.lists(
            st.one_of(st.none(), st.lists(st.floats(-1, 1, allow_nan=False), max_size=6)),
            max_size=8,
        ),
        documents=st.lists(st.one_of(st.none(), st.text(max_size=20)), max_size=8),
        metadatas=st.lists(
            st.one_of(st.none(), st.dictionaries(st.text(min_size=1, max_size=6), meta_vals, max_size=4)),
            max_size=8,
        ),
    )

    @given(p=payloads)
    @settings(max_examples=60, deadline=None)
    def check(p: QuotaPayload):
        u = p.usages()
        assert u[UsageType.NUM_RECORDS] == len(p.ids)
        for k, v in u.items():
            assert isinstance(v, int) and v >= 0, (k, v)
        # exact limits always pass; any limit one below a positive value fails
        StaticQuotaEnforcer(limits=dict(u)).enforce(p)
        for k, v in u.items():
            if v > 0:
                try:
                    StaticQuotaEnforcer(limits={k: v - 1}).enforce(p)
                except QuotaExceededError:
                    continue
                raise AssertionError(f"{k}={v} passed under limit {v - 1}")

    check()


def test_where_predicate_count_matches_leaf_count():
    from chroma_spark.quota import _walk_where

    nested = {
        "$or": [
            {"$and": [{"a": 1}, {"b": {"$in": [1, 2, 3]}}, {"c": {"$gte": 0}}]},
            {"d": "x"},
        ]
    }
    preds, max_val = _walk_where(nested)
    assert preds == 4
    assert max_val == 1  # longest operand repr is single-char
