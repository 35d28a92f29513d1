"""Property test: the commit-log Catalog behaves like a plain dict model
under arbitrary operation sequences, and a COLD re-open (fresh Catalog
instance, commit-file bootstrap) always sees the same state — the
single-process correctness half of the CAS protocol (the cross-process
half is tests/test_multiprocess.py)."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chroma_spark.sources.collection import Catalog, CollectionError, CollectionMeta

NAMES = ["alpha", "beta", "gamma"]

op = st.one_of(
    st.tuples(st.just("create"), st.sampled_from(NAMES)),
    st.tuples(st.just("bump"), st.sampled_from(NAMES)),  # mutate: counter+=1, version+=1
    st.tuples(st.just("cas_ok"), st.sampled_from(NAMES)),  # update at the right version
    st.tuples(st.just("cas_stale"), st.sampled_from(NAMES)),  # update at a WRONG version
    st.tuples(st.just("drop"), st.sampled_from(NAMES)),
    st.tuples(st.just("rename"), st.sampled_from(NAMES), st.sampled_from(NAMES)),
)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(op, max_size=40))
def test_catalog_matches_dict_model(tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("cat"))
    cat = Catalog(root)
    model: dict[str, dict] = {}  # name -> {"version": v, "counter": c}

    for o in ops:
        kind, name = o[0], o[1]
        if kind == "create":
            if name in model:
                try:
                    cat.create(CollectionMeta(name=name, id="x"))
                    raise AssertionError("create of existing must raise")
                except CollectionError:
                    pass
            else:
                cat.create(CollectionMeta(name=name, id="x"))
                model[name] = {"version": 0, "counter": 0}
        elif kind == "bump":
            def fn(m):
                m.version += 1
                m.metadata["counter"] = int(m.metadata.get("counter", 0)) + 1

            if name in model:
                cat.mutate(name, fn)
                model[name]["version"] += 1
                model[name]["counter"] += 1
            else:
                try:
                    cat.mutate(name, fn)
                    raise AssertionError("mutate of missing must raise")
                except CollectionError:
                    pass
        elif kind == "cas_ok" and name in model:
            meta = cat.get(name)
            cat.update(meta, expected_version=model[name]["version"])
        elif kind == "cas_stale" and name in model:
            meta = cat.get(name)
            try:
                cat.update(meta, expected_version=model[name]["version"] + 7)
                raise AssertionError("stale CAS must raise")
            except CollectionError as e:
                assert "conditional commit failed" in str(e)
        elif kind == "drop":
            if name in model:
                cat.drop(name)
                del model[name]
            else:
                try:
                    cat.drop(name)
                    raise AssertionError("drop of missing must raise")
                except CollectionError:
                    pass
        elif kind == "rename":
            new = o[2]
            if name in model and new not in model and name != new:
                cat.rename(name, new)
                model[new] = model.pop(name)
            elif name in model and (new in model or name == new):
                try:
                    cat.rename(name, new)
                    raise AssertionError("rename onto existing must raise")
                except CollectionError:
                    pass

    def observed(c: Catalog) -> dict:
        out = {}
        for n in c.list():
            m = c.get(n)
            out[n] = {"version": m.version, "counter": int(m.metadata.get("counter", 0))}
        return out

    assert observed(cat) == model
    # cold re-open: a brand-new Catalog (fresh process analog) bootstraps
    # the same state from the commit log / checkpoint
    assert observed(Catalog(root)) == model
    # stray tmp files (a crashed writer's leftovers) never corrupt reads
    leftover = os.path.join(root, "_commits", ".tmp.deadbeef")
    with open(leftover, "w") as f:
        f.write("{not json")
    assert observed(Catalog(root)) == model
