"""Property-based RankDomain merge algebra vs a pure-Python oracle.

The reference pins rank semantics with executable oracles
(``chromadb/test/property/test_filtering.py`` style); here the oracle is a
direct Python transcription of ``RankDomain::merge`` / fold identities
(``rust/worker/src/execution/operators/rank.rs:34-133``) and the system
under test is the DataFrame implementation in
``chroma_spark/operators/rank.py``.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chroma_spark.operators.rank import F32_MAX, F32_MIN, RankDomain, _fold, _merge

# ---------------------------------------------------------------------------
# pure-Python oracle (rank.rs:34-120 transcription over {id: score} dicts)
# ---------------------------------------------------------------------------


class PyDomain:
    def __init__(self, support: dict[int, float] | None, default: float | None):
        self.support = support
        self.default = default


def py_merge(l: PyDomain, r: PyDomain, op) -> PyDomain:
    ld, rd = l.default, r.default
    nd = op(ld, rd) if (ld is not None and rd is not None) else None
    if l.support is None and r.support is None:
        return PyDomain(None, nd)
    if l.support is None:
        if ld is None:
            return PyDomain(None, None)
        return PyDomain({i: op(ld, s) for i, s in r.support.items()}, nd)
    if r.support is None:
        if rd is None:
            return PyDomain(None, None)
        return PyDomain({i: op(s, rd) for i, s in l.support.items()}, nd)
    if ld is not None and rd is not None:
        ids = set(l.support) | set(r.support)
    elif ld is not None:
        ids = set(r.support)
    elif rd is not None:
        ids = set(l.support)
    else:
        ids = set(l.support) & set(r.support)
    sup = {
        i: op(l.support.get(i, ld), r.support.get(i, rd))
        for i in ids
    }
    return PyDomain(sup, nd)


def py_fold(domains: list[PyDomain], identity: float, op) -> PyDomain:
    acc = PyDomain(None, identity)
    for d in domains:
        acc = py_merge(acc, d, op)
    return acc


# ---------------------------------------------------------------------------
# strategies: small domains with ids 0..5, finite scores, optional defaults
# ---------------------------------------------------------------------------

_score = st.integers(min_value=-8, max_value=8).map(float)
_support = st.one_of(
    st.none(),
    st.dictionaries(st.integers(min_value=0, max_value=5), _score, min_size=0, max_size=4),
)
_domain = st.tuples(_support, st.one_of(st.none(), _score))

_OPS = {
    "add": (lambda a, b: a + b, 0.0),
    "mul": (lambda a, b: a * b, 1.0),
    "max": (max, F32_MIN),
    "min": (min, F32_MAX),
}


def _spark_domain(spark, support, default) -> RankDomain:
    """Empty support == flat domain (rank.rs keeps an empty map; our
    DataFrame convention uses None) — the assertions below treat {} and
    None-support as the same outcome, matching that equivalence."""
    if not support:
        return RankDomain(None, default)
    df = spark.createDataFrame(list(support.items()), "id BIGINT, score DOUBLE")
    return RankDomain(df, default)


def _collect(d: RankDomain) -> dict[int, float] | None:
    if d.support is None:
        return None
    return {r["id"]: r["score"] for r in d.support.collect()}


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(doms=st.lists(_domain, min_size=2, max_size=3), opname=st.sampled_from(list(_OPS)))
def test_fold_matches_python_oracle(spark, doms, opname):
    op, identity = _OPS[opname]
    # Spark's least/greatest for min/max over Columns
    from pyspark.sql import functions as F

    def spark_op(a, b):
        from pyspark.sql import Column

        if opname in ("max", "min") and (isinstance(a, Column) or isinstance(b, Column)):
            return (F.greatest if opname == "max" else F.least)(a, b)
        return op(a, b)

    expected = py_fold([PyDomain(s, d) for s, d in doms], identity, op)
    actual = _fold([_spark_domain(spark, s, d) for s, d in doms], identity, spark_op)

    got = _collect(actual)
    exp = expected.support if expected.support is None or expected.support else (
        # empty-dict support materializes as an empty DataFrame -> {}
        {}
    )
    if exp is None:
        assert got is None or got == {}
    else:
        assert got == exp or (not got and not exp)
    if expected.default is None:
        assert actual.default is None
    else:
        assert actual.default is not None
        assert math.isclose(actual.default, expected.default, rel_tol=1e-9)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(l=_domain, r=_domain)
def test_sub_merge_matches_python_oracle(spark, l, r):
    op = lambda a, b: a - b  # noqa: E731
    expected = py_merge(PyDomain(*l), PyDomain(*r), op)
    actual = _merge(_spark_domain(spark, *l), _spark_domain(spark, *r), op)
    got = _collect(actual)
    if expected.support is None:
        assert got is None or got == {}
    else:
        assert (got or {}) == expected.support
    assert (actual.default is None) == (expected.default is None)
    if expected.default is not None:
        assert math.isclose(actual.default, expected.default, rel_tol=1e-9)
