"""Cross-version persistence: catalog + index-layout format stamps.

The analog of the reference's upgrade-compat property suite
(``chromadb/test/property/test_cross_version_persist.py``): persisted
state written by one engine build must either open-and-migrate in a later
build or refuse cleanly — never be silently misread. Covers the catalog
JSON (``__format__`` stamp + v0 migration) and the IVF / sparse layout
stamps (``_layout.json``)."""

from __future__ import annotations

import json
import os

import pytest

from chroma_spark.api import Client
from chroma_spark.layout import LayoutFormatError
from chroma_spark.sources.collection import CollectionError


def _mk_store(spark, root):
    client = Client(spark, root)
    col = client.create_collection("pc", dimension=2)
    col.add(
        ids=["a", "b", "c"],
        embeddings=[[1.0, 0.0], [0.0, 1.0], [0.5, 0.5]],
        documents=["alpha", "beta", "gamma"],
        metadatas=[{"sv": {"indices": [1], "values": [2.0]}}] * 3,
    )
    col.build_vector_index(n_lists=1)
    col.build_sparse_index("sv", n_buckets=4)
    return client, col


def _latest_commit_path(root):
    d = os.path.join(root, "_commits")
    gens = sorted(n for n in os.listdir(d) if n.endswith(".json"))
    return os.path.join(d, gens[-1])


def _to_legacy(root, flat_collections, version):
    """Rewrite the root as a store an OLD (v<=1, pre-commit-log) engine
    build would have left behind: single catalog.json, no _commits."""
    import shutil

    shutil.rmtree(os.path.join(root, "_commits"))
    data = dict(flat_collections)
    if version is not None:
        data["__format__"] = {"version": version}
    json.dump(data, open(os.path.join(root, "catalog.json"), "w"))


def test_reopen_current_format_round_trips(spark, tmp_path):
    root = str(tmp_path / "store")
    _mk_store(spark, root)
    # a later process opens the same root cold
    col = Client(spark, root).get_collection("pc")
    assert col.count() == 3
    assert col.query([[1.0, 0.0]], n_results=1)["ids"][0] == ["a"]
    # both the commit head and the checkpoint carry the current stamp, so
    # an OLDER engine build (reads <= v1) refuses instead of misreading
    assert json.load(open(_latest_commit_path(root)))["__format__"]["version"] == 2
    catalog = json.load(open(os.path.join(root, "catalog.json")))
    assert catalog["__format__"]["version"] == 2


def test_newer_catalog_format_refuses_cleanly(spark, tmp_path):
    root = str(tmp_path / "store")
    _mk_store(spark, root)
    p = _latest_commit_path(root)
    data = json.load(open(p))
    data["__format__"] = {"version": 99}
    json.dump(data, open(p, "w"))
    with pytest.raises(CollectionError, match="newer engine"):
        Client(spark, root).get_collection("pc")


def test_newer_legacy_catalog_refuses_cleanly(spark, tmp_path):
    root = str(tmp_path / "store")
    _mk_store(spark, root)
    colls = json.load(open(_latest_commit_path(root)))["collections"]
    _to_legacy(root, colls, version=99)
    with pytest.raises(CollectionError, match="newer engine"):
        Client(spark, root).get_collection("pc")


def test_v0_catalog_migrates_unknown_meta_fields(spark, tmp_path):
    root = str(tmp_path / "store")
    _mk_store(spark, root)
    colls = json.load(open(_latest_commit_path(root)))["collections"]
    for meta in colls.values():
        meta["experimental_field_from_old_build"] = {"x": 1}
    _to_legacy(root, colls, version=0)
    col = Client(spark, root).get_collection("pc")  # migrates, no crash
    assert col.count() == 3


def test_unstamped_catalog_is_pre_versioning_and_opens(spark, tmp_path):
    root = str(tmp_path / "store")
    _mk_store(spark, root)
    colls = json.load(open(_latest_commit_path(root)))["collections"]
    _to_legacy(root, colls, version=None)
    assert Client(spark, root).get_collection("pc").count() == 3


def test_stale_format_without_migration_refuses(spark, tmp_path):
    root = str(tmp_path / "store")
    _mk_store(spark, root)
    colls = json.load(open(_latest_commit_path(root)))["collections"]
    _to_legacy(root, colls, version=-1)
    with pytest.raises(CollectionError, match="no migration path"):
        Client(spark, root).get_collection("pc")


@pytest.mark.parametrize("kind", ["ivf", "sparse"])
def test_newer_index_layout_refuses_cleanly(spark, tmp_path, kind):
    root = str(tmp_path / "store")
    client, col = _mk_store(spark, root)
    meta = col._store.meta
    layout_dir = meta.vector_index["path"] if kind == "ivf" else meta.sparse_indexes["sv"]["path"]
    stamp_path = os.path.join(layout_dir, "_layout.json")
    stamp = json.load(open(stamp_path))
    assert stamp == {"format_version": 1, "kind": kind}
    json.dump({"format_version": 99, "kind": kind}, open(stamp_path, "w"))
    with pytest.raises(LayoutFormatError, match="newer engine"):
        if kind == "ivf":
            col.query([[1.0, 0.0]], n_results=1)
        else:
            col.search(rank={"$knn": {"query": {"indices": [1], "values": [1.0]}, "key": "sv"}})


def test_unstamped_index_layout_is_pre_versioning_and_reads(spark, tmp_path):
    root = str(tmp_path / "store")
    client, col = _mk_store(spark, root)
    os.remove(os.path.join(col._store.meta.vector_index["path"], "_layout.json"))
    assert col.query([[1.0, 0.0]], n_results=1)["ids"][0] == ["a"]


def test_wrong_layout_kind_refuses(spark, tmp_path):
    root = str(tmp_path / "store")
    client, col = _mk_store(spark, root)
    stamp_path = os.path.join(col._store.meta.vector_index["path"], "_layout.json")
    json.dump({"format_version": 1, "kind": "sparse"}, open(stamp_path, "w"))
    with pytest.raises(LayoutFormatError, match="expected 'ivf'"):
        col.query([[1.0, 0.0]], n_results=1)


def test_newer_dedup_layout_refuses_cleanly(spark, tmp_path):
    root = str(tmp_path / "store")
    client, col = _mk_store(spark, root)
    col.build_dedup_index(num_perm=8, bands=2)
    layout_dir = col._store.meta.metadata["__dedup_index__"]["path"]
    stamp_path = os.path.join(layout_dir, "_layout.json")
    assert json.load(open(stamp_path)) == {"format_version": 2, "kind": "dedup"}
    json.dump({"format_version": 99, "kind": "dedup"}, open(stamp_path, "w"))
    batch = spark.createDataFrame([("n1", "alpha beta gamma")], "id STRING, document STRING")
    with pytest.raises(LayoutFormatError, match="newer engine"):
        col.find_near_duplicates(batch)
