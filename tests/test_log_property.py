"""Property-based WAL materialization testing: random operation sequences
folded by the Spark applyInPandas merge must match a pure-Python state
machine implementing operation.rs:16-35 semantics (the reference's stateful
test_embeddings machine, SURVEY §5)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chroma_spark.sources.log import materialize

IDS = ["a", "b", "c"]


def _op():
    return st.tuples(
        st.sampled_from(["ADD", "UPDATE", "UPSERT", "DELETE"]),
        st.sampled_from(IDS),
        st.one_of(st.none(), st.sampled_from(["d1", "d2", "d3"])),
        st.one_of(st.none(), st.sampled_from([1.0, 2.0, 3.0])),
    )


def py_fold(ops, base=None):
    """operation.rs:16-35: ADD ignores existing, UPDATE merges non-null into
    existing only, UPSERT both, DELETE removes (later ADD recreates)."""
    state = dict(base or {})
    for op, rid, doc, score in ops:
        exists = rid in state
        fields = {"document": doc, "score": score}
        if op == "ADD" and not exists:
            state[rid] = dict(fields)
        elif op == "UPDATE" and exists:
            state[rid].update({k: v for k, v in fields.items() if v is not None})
        elif op == "UPSERT":
            if exists:
                state[rid].update({k: v for k, v in fields.items() if v is not None})
            else:
                state[rid] = dict(fields)
        elif op == "DELETE" and exists:
            del state[rid]
    return state


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=st.lists(_op(), min_size=1, max_size=12))
def test_materialize_matches_state_machine(spark, ops):
    log = spark.createDataFrame(
        [(i, op, rid, doc, score) for i, (op, rid, doc, score) in enumerate(ops)],
        "seq_id LONG, op STRING, id STRING, document STRING, score DOUBLE",
    )
    got = {r.id: {"document": r.document, "score": r.score} for r in materialize(None, log).collect()}
    assert got == py_fold(ops)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=st.lists(_op(), min_size=1, max_size=8))
def test_materialize_with_base_matches_state_machine(spark, ops):
    base_rows = [("a", "base-doc", 0.5), ("b", None, 9.9)]
    base = spark.createDataFrame(base_rows, "id STRING, document STRING, score DOUBLE")
    log = spark.createDataFrame(
        [(i, op, rid, doc, score) for i, (op, rid, doc, score) in enumerate(ops)],
        "seq_id LONG, op STRING, id STRING, document STRING, score DOUBLE",
    )
    expect = py_fold(ops, base={r[0]: {"document": r[1], "score": r[2]} for r in base_rows})
    got = {r.id: {"document": r.document, "score": r.score} for r in materialize(base, log).collect()}
    assert got == expect


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=st.lists(_op(), min_size=1, max_size=12))
def test_vectorized_fold_equals_python_fold(spark, ops):
    """The window/aggregate fold and the per-group pandas fold must agree on
    every column INCLUDING offset_id, with and without a base side."""
    base = spark.createDataFrame(
        [("a", "base-doc", 0.5), ("b", None, 9.9)],
        "id STRING, document STRING, score DOUBLE",
    )
    log = spark.createDataFrame(
        [(i, op, rid, doc, score) for i, (op, rid, doc, score) in enumerate(ops)],
        "seq_id LONG, op STRING, id STRING, document STRING, score DOUBLE",
    )
    for b in (None, base):
        vec = sorted(tuple(r) for r in materialize(b, log, impl="vectorized").collect())
        py = sorted(tuple(r) for r in materialize(b, log, impl="python").collect())
        assert vec == py, (b is not None, ops)


# ---------------------------------------------------------------------------
# DELETE_WHERE folding + offset_id assignment (reference: the predicate is
# stored in the log and applied at materialization; offset id = seq of the
# record's current insertion, limit.rs:23-36)
# ---------------------------------------------------------------------------

_WHERE_OPS = [
    ({"score": {"$gte": 2.0}}, None),
    ({"score": {"$ne": 1.0}}, None),  # missing score MATCHES
    ({"score": {"$lt": 3.0}}, None),
    (None, {"$contains": "d2"}),      # empty/missing doc -> False
]


def _item():
    return st.one_of(
        st.tuples(st.just("REC"), _op()),
        st.tuples(st.just("WHERE"), st.sampled_from(_WHERE_OPS)),
    )


def _py_where_matches(meta, w):
    [(key, operand)] = w.items()
    [(op, val)] = operand.items()
    v = meta.get(key)
    if op == "$gte":
        return v is not None and v >= val
    if op == "$lt":
        return v is not None and v < val
    if op == "$ne":
        return v is None or v != val
    raise AssertionError(op)


def py_fold_with_where(items):
    state: dict = {}
    offs: dict = {}
    for seq, (kind, payload) in enumerate(items):
        if kind == "REC":
            op, rid, doc, score = payload
            exists = rid in state
            fields = {"document": doc, "score": score}
            if op == "ADD" and not exists:
                state[rid] = dict(fields)
                offs[rid] = seq
            elif op == "UPDATE" and exists:
                state[rid].update({k: v for k, v in fields.items() if v is not None})
            elif op == "UPSERT":
                if exists:
                    state[rid].update({k: v for k, v in fields.items() if v is not None})
                else:
                    state[rid] = dict(fields)
                    offs[rid] = seq
            elif op == "DELETE" and exists:
                del state[rid]
                del offs[rid]
        else:
            w, wd = payload
            for rid in list(state):
                meta = {k: v for k, v in state[rid].items() if v is not None}
                ok = w is None or _py_where_matches(meta, w)
                if ok and wd is not None:
                    ok = wd["$contains"] in (meta.get("document") or "")
                if ok:
                    del state[rid]
                    del offs[rid]
    return state, offs


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(items=st.lists(_item(), min_size=1, max_size=12))
def test_materialize_where_ops_and_offsets_match_state_machine(spark, items):
    rec_rows = [
        (seq, *payload[:2], payload[2], payload[3])
        for seq, (kind, payload) in enumerate(items)
        if kind == "REC"
    ]
    where_ops = [
        (seq, None, payload[0], payload[1])
        for seq, (kind, payload) in enumerate(items)
        if kind == "WHERE"
    ]
    if not rec_rows:
        return  # materialize needs at least one log row
    log = spark.createDataFrame(
        rec_rows, "seq_id LONG, op STRING, id STRING, document STRING, score DOUBLE"
    )
    expect_state, expect_offs = py_fold_with_where(items)
    rows = materialize(None, log, where_ops=where_ops).collect()
    got_state = {r.id: {"document": r.document, "score": r.score} for r in rows}
    got_offs = {r.id: r.offset_id for r in rows}
    assert got_state == expect_state, items
    assert got_offs == expect_offs, items
