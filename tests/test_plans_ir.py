"""Plan-IR tests: the reference's dataclass plans (plan.py:19-43) execute
against a Collection and round-trip through dicts (the proto analog)."""

from __future__ import annotations

import pytest

from chroma_spark.api import Client
from chroma_spark.plans import CountPlan, Filter, GetPlan, KNNPlan, Limit, Search, plan_from_dict


@pytest.fixture()
def col(spark, tmp_path):
    client = Client(spark, str(tmp_path / "store"))
    c = client.create_collection("p", dimension=2)
    c.add(
        ids=["a", "b", "c"],
        embeddings=[[1.0, 0], [0, 1.0], [0.6, 0.6]],
        documents=["alpha", "beta", "gamma"],
        metadatas=[{"k": 1}, {"k": 2}, {"k": 3}],
    )
    return c


def test_count_plan(col):
    assert CountPlan().execute(col) == 3


def test_get_plan_with_filter_and_limit(col):
    plan = GetPlan(filter=Filter(where={"k": {"$gte": 2}}), limit=Limit(offset=0, limit=1))
    rows = plan.execute(col)
    assert [r["id"] for r in rows] == ["b"]


def test_knn_plan(col):
    plan = KNNPlan(embeddings=[[1.0, 0.0]], fetch=2, filter=Filter(ids=["b", "c"]))
    res = plan.execute(col)
    assert res["ids"][0][0] == "c"  # 'a' excluded by the id filter


def test_search_plan(col):
    plan = Search(
        rank={"$knn": {"query": [1.0, 0.0], "limit": 3}},
        limit=Limit(limit=2),
        select=["#id", "#document"],
    )
    rows = plan.execute(col).collect()
    assert rows[0]["id"] == "a" and rows[0]["document"] == "alpha"


def test_plan_dict_round_trip(col):
    for plan in (
        CountPlan(),
        GetPlan(filter=Filter(where={"k": {"$lte": 2}})),
        KNNPlan(embeddings=[[0.0, 1.0]], fetch=1),
        Search(rank={"$knn": {"query": [0.0, 1.0], "limit": 2}}, select=["#id"]),
    ):
        revived = plan_from_dict(plan.to_dict())
        assert revived == plan
    # executing the revived plan gives the same result
    p = KNNPlan(embeddings=[[0.0, 1.0]], fetch=1)
    assert plan_from_dict(p.to_dict()).execute(col) == p.execute(col)
