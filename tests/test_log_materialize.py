"""Materialization fold vs a pure-Python oracle (FIXTURES.md T6; semantics
rust/types/src/operation.rs:16-35). Randomized op sequences via a fixed
seed cover add->update, add->delete, delete->add, upsert-as-insert/update,
duplicate ADD (ignored), UPDATE of nonexistent id (no-op).
"""

from __future__ import annotations

import random

from chroma_spark.sources.log import materialize


def _python_oracle(base_rows, log_rows, fields):
    state = {r["id"]: {f: r[f] for f in fields} for r in base_rows}
    for r in sorted(log_rows, key=lambda r: r["seq_id"]):
        rid, op = r["id"], r["op"]
        if op == "ADD":
            if rid not in state:
                state[rid] = {f: r[f] for f in fields}
        elif op == "UPDATE":
            if rid in state:
                for f in fields:
                    if r[f] is not None:
                        state[rid][f] = r[f]
        elif op == "UPSERT":
            if rid in state:
                for f in fields:
                    if r[f] is not None:
                        state[rid][f] = r[f]
            else:
                state[rid] = {f: r[f] for f in fields}
        elif op == "DELETE":
            state.pop(rid, None)
    return state


FIELDS = ["document", "val"]
SCHEMA_LOG = "seq_id BIGINT, op STRING, id STRING, document STRING, val BIGINT"
SCHEMA_BASE = "id STRING, document STRING, val BIGINT"


def test_materialize_matches_oracle(spark):
    rng = random.Random(42)
    ids = [f"r{i}" for i in range(30)]
    base_rows = [
        {"id": i, "document": f"base-{i}", "val": n}
        for n, i in enumerate(ids[:10])
    ]
    log_rows = []
    for seq in range(300):
        rid = rng.choice(ids)
        op = rng.choice(["ADD", "UPDATE", "UPSERT", "DELETE"])
        log_rows.append(
            {
                "seq_id": seq,
                "op": op,
                "id": rid,
                "document": None if (op != "ADD" and rng.random() < 0.5) else f"doc-{seq}",
                "val": None if (op != "ADD" and rng.random() < 0.5) else seq,
            }
        )
    base = spark.createDataFrame(base_rows, SCHEMA_BASE)
    log = spark.createDataFrame(log_rows, SCHEMA_LOG)
    got = {
        r["id"]: {"document": r["document"], "val": r["val"]}
        for r in materialize(base, log).collect()
    }
    want = _python_oracle(base_rows, log_rows, FIELDS)
    assert got == want


def test_materialize_no_base(spark):
    log_rows = [
        {"seq_id": 0, "op": "ADD", "id": "x", "document": "d0", "val": 1},
        {"seq_id": 1, "op": "DELETE", "id": "x", "document": None, "val": None},
        {"seq_id": 2, "op": "ADD", "id": "x", "document": "d2", "val": None},
        {"seq_id": 3, "op": "UPDATE", "id": "x", "document": None, "val": 7},
        {"seq_id": 4, "op": "ADD", "id": "x", "document": "ignored-dup", "val": 9},
        {"seq_id": 5, "op": "UPDATE", "id": "ghost", "document": "noop", "val": 1},
    ]
    log = spark.createDataFrame(log_rows, SCHEMA_LOG)
    rows = materialize(None, log).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id"], r["document"], r["val"]) == ("x", "d2", 7)
