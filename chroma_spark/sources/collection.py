"""Collection storage: parquet base + append-only WAL log + JSON catalog.

Maps the reference's storage model (SURVEY §1.1) to files:

- catalog (``<root>/catalog.json``) — the sysdb analog: one entry per
  collection with id, dimension, distance space, version, log position
  (``chromadb/types.py:71-105``; register op ``operators/register.rs``).
- ``<root>/<name>/base/`` — compacted records (the record+metadata+vector
  segments collapsed into one parquet table; SURVEY §1.1 "Segment" row).
- ``<root>/<name>/log/`` — WAL batches ``(seq_id, op, id, fields...)``
  (``embeddings_queue.py:189``; wal3). Every write APPENDS parquet part
  files; nothing is rewritten until compaction.
- reads materialize ``base ∪ log`` (ReadLevel INDEX_AND_WAL,
  ``rust/types/src/execution/plan.rs:553``) or base only (INDEX_ONLY).
- ``compact()`` folds the log into a new base version (the
  CompactOrchestrator path: partition_log -> materialize_logs -> flush ->
  register) and truncates the log.
- ``fork`` (``Collection.py:329``) — zero-copy: the child catalog entry
  references the parent's base/log part files by path; new writes land in
  the child's own log dir.

Single-writer local semantics (like the reference's single-node SQLite
WAL); on a cluster the catalog would live in a transactional store and
appends would use unique task-attempt filenames, which parquet part files
already give us.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_COLS = ("id", "embedding", "document", "uri")
LOG_COLS = ("seq_id", "op")


class CollectionError(ValueError):
    pass


class StaleReadError(CollectionError):
    """A read targeted state that no longer exists (modified during a
    transaction, or a version pruned by :meth:`Collection.gc`)."""


@dataclass
class CollectionMeta:
    name: str
    id: str
    dimension: int | None = None
    space: str = "l2"
    version: int = 0
    log_position: int = 0
    metadata: dict[str, Any] = field(default_factory=dict)
    base_paths: list[str] = field(default_factory=list)
    log_paths: list[str] = field(default_factory=list)
    schema: dict | None = None  # serialized chroma_spark.schema.Schema
    # persisted ANN index descriptor {version, path, n_lists, space} — the
    # vector-segment registration (a compaction writes the index for one
    # collection version; queries check freshness against it)
    vector_index: dict | None = None
    # per-key sparse posting indexes {key: {version, path, n_buckets, n_docs}}
    sparse_indexes: dict[str, dict] = field(default_factory=dict)


CATALOG_FORMAT_VERSION = 1


def _migrate_catalog_v0(data: dict[str, dict]) -> dict[str, dict]:
    """v0 -> v1: drop meta keys this build's CollectionMeta doesn't know
    (pre-versioning catalogs could carry fields from experimental builds;
    dataclass construction would otherwise crash on them)."""
    import dataclasses

    known = {f.name for f in dataclasses.fields(CollectionMeta)}
    return {
        name: {k: v for k, v in meta.items() if k in known} for name, meta in data.items()
    }


_CATALOG_MIGRATIONS = {0: _migrate_catalog_v0}


class Catalog:
    """JSON-file sysdb with optimistic version checks.

    The file carries a ``__format__`` stamp; opening a catalog written by
    a NEWER engine refuses cleanly (never misreads), and older stamped
    versions migrate stepwise through ``_CATALOG_MIGRATIONS`` (the
    reference's cross-version-persist upgrade contract,
    ``chromadb/test/property/test_cross_version_persist.py``). A file with
    no stamp is a pre-versioning catalog from an earlier build of this
    engine and reads as the current format.
    """

    def __init__(self, root: str) -> None:
        self.root = root
        self.path = os.path.join(root, "catalog.json")
        os.makedirs(root, exist_ok=True)

    def _read(self) -> dict[str, dict]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            data = json.load(f)
        fmt = data.pop("__format__", None)
        v = int(fmt.get("version", CATALOG_FORMAT_VERSION)) if fmt else CATALOG_FORMAT_VERSION
        if v > CATALOG_FORMAT_VERSION:
            raise CollectionError(
                f"catalog {self.path} was written by a newer engine (format v{v}; "
                f"this build reads <= v{CATALOG_FORMAT_VERSION}) — upgrade the engine"
            )
        while v < CATALOG_FORMAT_VERSION:
            if v not in _CATALOG_MIGRATIONS:
                raise CollectionError(
                    f"catalog {self.path} has format v{v} with no migration path; "
                    "refusing to open"
                )
            data = _CATALOG_MIGRATIONS[v](data)
            v += 1
        return data

    def _write(self, data: dict[str, dict]) -> None:
        tmp = self.path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"__format__": {"version": CATALOG_FORMAT_VERSION}, **data}, f, indent=1)
        os.replace(tmp, self.path)

    def list(self) -> list[str]:
        return sorted(self._read())

    def get(self, name: str) -> CollectionMeta:
        data = self._read()
        if name not in data:
            raise CollectionError(f"collection {name!r} does not exist")
        return CollectionMeta(**data[name])

    def create(self, meta: CollectionMeta, get_or_create: bool = False) -> CollectionMeta:
        data = self._read()
        if meta.name in data:
            if get_or_create:
                return CollectionMeta(**data[meta.name])
            raise CollectionError(f"collection {meta.name!r} already exists")
        data[meta.name] = meta.__dict__
        self._write(data)
        return meta

    def update(self, meta: CollectionMeta, expected_version: int | None = None) -> None:
        """Register a new collection state; ``expected_version`` gives the
        reference's conditional-transaction commit check
        (``chromadb/api/__init__.py:320-450``)."""
        data = self._read()
        if meta.name not in data:
            raise CollectionError(f"collection {meta.name!r} does not exist")
        if expected_version is not None and data[meta.name]["version"] != expected_version:
            raise CollectionError(
                f"conditional commit failed: version is {data[meta.name]['version']}, "
                f"expected {expected_version}"
            )
        data[meta.name] = meta.__dict__
        self._write(data)

    def drop(self, name: str) -> None:
        data = self._read()
        if name not in data:
            raise CollectionError(f"collection {name!r} does not exist")
        del data[name]
        self._write(data)

    def rename(self, old: str, new: str) -> None:
        """Collection.modify(name=...) — a catalog-only move: data paths are
        recorded absolute in the meta, so no files move."""
        data = self._read()
        if old not in data:
            raise CollectionError(f"collection {old!r} does not exist")
        if new in data:
            raise CollectionError(f"collection {new!r} already exists")
        data[new] = data.pop(old)
        data[new]["name"] = new
        self._write(data)

    # -- tenant / database namespaces (chromadb/types.py:202-210;
    # routes rust/frontend/src/server.rs:306-325) ----------------------

    @property
    def _ns_path(self) -> str:
        return os.path.join(self.root, "namespaces.json")

    def _read_ns(self) -> dict[str, list[str]]:
        if not os.path.exists(self._ns_path):
            return {}
        with open(self._ns_path) as f:
            return json.load(f)

    def _write_ns(self, ns: dict[str, list[str]]) -> None:
        tmp = self._ns_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(ns, f, indent=1)
        os.replace(tmp, self._ns_path)

    def create_tenant(self, tenant: str, get_or_create: bool = False) -> None:
        ns = self._read_ns()
        if tenant in ns:
            if get_or_create:
                return
            raise CollectionError(f"tenant {tenant!r} already exists")
        ns[tenant] = []
        self._write_ns(ns)

    def create_database(self, tenant: str, database: str, get_or_create: bool = False) -> None:
        ns = self._read_ns()
        if tenant not in ns:
            raise CollectionError(f"tenant {tenant!r} does not exist")
        if database in ns[tenant]:
            if get_or_create:
                return
            raise CollectionError(f"database {database!r} already exists in tenant {tenant!r}")
        ns[tenant].append(database)
        self._write_ns(ns)

    def has_database(self, tenant: str, database: str) -> bool:
        return database in self._read_ns().get(tenant, [])

    def list_tenants(self) -> list[str]:
        return sorted(self._read_ns())

    def list_databases(self, tenant: str) -> list[str]:
        return sorted(self._read_ns().get(tenant, []))


class CollectionStore:
    """Physical IO for one collection (paths, appends, reads)."""

    def __init__(self, spark: SparkSession, catalog: Catalog, name: str) -> None:
        self.spark = spark
        self.catalog = catalog
        self.name = name

    @property
    def meta(self) -> CollectionMeta:
        return self.catalog.get(self.name)

    def _dir(self, kind: str, version: int | None = None) -> str:
        sub = f"base_v{version}" if kind == "base" and version is not None else kind
        return os.path.join(self.catalog.root, self.name, sub)

    def append_log(self, df: DataFrame) -> str:
        """Append one WAL batch as a new parquet path; returns the path."""
        path = os.path.join(self._dir("log"), f"batch-{time.time_ns()}-{uuid.uuid4().hex[:8]}")
        df.write.mode("error").parquet(path)
        return path

    def read_log(self) -> DataFrame | None:
        paths = self.meta.log_paths
        if not paths:
            return None
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def read_base(self) -> DataFrame | None:
        paths = self.meta.base_paths
        if not paths:
            return None
        return self.spark.read.option("mergeSchema", "true").parquet(*paths)

    def write_base(self, df: DataFrame, version: int) -> str:
        path = self._dir("base", version)
        df.write.mode("overwrite").parquet(path)
        return path

    def list_base_versions(self) -> list[int]:
        """Versions still on disk (compaction keeps old bases until gc)."""
        d = os.path.join(self.catalog.root, self.name)
        if not os.path.isdir(d):
            return []
        return sorted(
            int(s.rsplit("_v", 1)[1]) for s in os.listdir(d) if s.startswith("base_v")
        )

    def read_base_version(self, version: int) -> DataFrame:
        path = self._dir("base", version)
        if not os.path.isdir(path):
            raise StaleReadError(
                f"version {version} of {self.name!r} is not on disk "
                f"(pruned by gc or never compacted; available: "
                f"{self.list_base_versions()})"
            )
        return self.spark.read.parquet(path)

    def list_log_batch_dirs(self) -> list[str]:
        """Every WAL batch dir on disk (referenced or not — gc's input)."""
        d = self._dir("log")
        if not os.path.isdir(d):
            return []
        return sorted(os.path.join(d, s) for s in os.listdir(d) if s.startswith("batch-"))


def align_columns(dfs: list[DataFrame]) -> list[DataFrame]:
    """unionByName-compatible column alignment across evolving schemas."""
    all_cols: list[str] = []
    types: dict[str, str] = {}
    for df in dfs:
        for c, t in df.dtypes:
            if c not in types:
                all_cols.append(c)
                types[c] = t
    out = []
    for df in dfs:
        missing = [c for c in all_cols if c not in df.columns]
        for c in missing:
            df = df.withColumn(c, F.lit(None).cast(types[c]))
        out.append(df.select(*all_cols))
    return out
