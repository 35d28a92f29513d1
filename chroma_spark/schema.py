"""Collection schema: per-key index configuration + query-time validation.

Reference: ``Schema { defaults: ValueTypes, keys: HashMap<String,
ValueTypes> }`` (`rust/types/src/collection_schema.rs:233-239`) with
per-value-type index toggles (`:696-867`), Python mirror
`chromadb/api/types.py:2101` (`create_index`/`delete_index`
`:2124,:2210`). Queries on keys whose index is disabled are REJECTED at
the frontend — recursive Where walk in
`collection_schema.rs:2432-2467` (`is_metadata_where_indexing_enabled`:
composite recurses, document predicates require fts, metadata predicates
require the key+value-type index) and
`service_based_frontend.rs:2813-2819`.

In this engine "index enabled" is the planner's *permission bit* (SURVEY
§1.4): Spark can always brute-force scan, but the schema contract keeps
query surface parity — and at 100 TB the same bit decides whether a
derived index table (IVF postings, doc_freq, inverted projection) is built
and maintained for the key.

Index kinds per value type (collection_schema.rs:696-867):
- string: ``string_inverted_index``, ``fts_index``
- int / float / bool: ``{int,float,bool}_inverted_index``
- string/int/float/bool arrays: the element type's inverted index
- dense vector: ``vector_index`` (hnsw/spann config: space, ef, M, nprobe)
- sparse vector: ``sparse_vector_index`` (BM25-capable)
"""

from __future__ import annotations

import copy
from typing import Any

from .sources.collection import CollectionError


class SchemaError(CollectionError):
    pass


INDEX_KINDS = (
    "string_inverted_index",
    "int_inverted_index",
    "float_inverted_index",
    "bool_inverted_index",
    "fts_index",
    "vector_index",
    "sparse_vector_index",
)

# value type -> the index kind a metadata predicate on it needs
_TYPE_TO_INDEX = {
    "string": "string_inverted_index",
    "int": "int_inverted_index",
    "float": "float_inverted_index",
    "bool": "bool_inverted_index",
    "sparse_vector": "sparse_vector_index",
    "dense_vector": "vector_index",
}


def _value_type(v: Any) -> str:
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    if isinstance(v, str):
        return "string"
    raise SchemaError(f"unsupported metadata value type {type(v).__name__}")


class Schema:
    """Per-key index configuration with type-level defaults.

    All indexes are enabled by default (the reference's dynamic-schema
    behavior); ``delete_index`` turns one off, ``create_index`` turns it
    (back) on and attaches a config (e.g. vector-index space/nprobe).
    """

    def __init__(self) -> None:
        self.defaults: dict[str, dict] = {k: {"enabled": True, "config": {}} for k in INDEX_KINDS}
        self.keys: dict[str, dict[str, dict]] = {}

    # -- configuration ------------------------------------------------

    def _slot(self, key: str | None, kind: str) -> dict:
        if kind not in INDEX_KINDS:
            raise SchemaError(f"unknown index kind {kind!r}; known: {INDEX_KINDS}")
        if key is None:
            return self.defaults[kind]
        per_key = self.keys.setdefault(key, {})
        if kind not in per_key:
            per_key[kind] = copy.deepcopy(self.defaults[kind])
        return per_key[kind]

    def create_index(self, kind: str, key: str | None = None, config: dict | None = None) -> "Schema":
        slot = self._slot(key, kind)
        slot["enabled"] = True
        if config:
            slot["config"] = dict(config)
        return self

    def delete_index(self, kind: str, key: str | None = None) -> "Schema":
        self._slot(key, kind)["enabled"] = False
        return self

    def is_index_enabled(self, kind: str, key: str | None = None) -> bool:
        if key is not None and key in self.keys and kind in self.keys[key]:
            return self.keys[key][kind]["enabled"]
        if kind not in INDEX_KINDS:
            raise SchemaError(f"unknown index kind {kind!r}")
        return self.defaults[kind]["enabled"]

    def index_config(self, kind: str, key: str | None = None) -> dict:
        if key is not None and key in self.keys and kind in self.keys[key]:
            return self.keys[key][kind]["config"]
        return self.defaults[kind]["config"]

    # -- query-time validation (collection_schema.rs:2432-2467) -------

    def validate_where(self, where: dict | None) -> None:
        if not where:
            return
        for key, cond in where.items():
            if key in ("$and", "$or"):
                for child in cond:
                    self.validate_where(child)
                continue
            if not isinstance(cond, dict):
                self._check_metadata(key, cond)
                continue
            for op, val in cond.items():
                if op in ("$in", "$nin"):
                    for v in val:
                        self._check_metadata(key, v)
                elif op in ("$contains", "$not_contains"):
                    self._check_metadata(key, val)  # array membership: element type
                else:
                    self._check_metadata(key, val)

    def _check_metadata(self, key: str, value: Any) -> None:
        vt = _value_type(value)
        kind = _TYPE_TO_INDEX[vt]
        if not self.is_index_enabled(kind, key):
            raise SchemaError(f"indexing disabled for key {key!r} value type {vt!r}")

    def validate_where_document(self, where_document: dict | None) -> None:
        if where_document and not self.is_index_enabled("fts_index", "#document"):
            raise SchemaError("fts indexing disabled for this collection")

    def validate_knn(self, key: str = "#embedding", sparse: bool = False) -> None:
        kind = "sparse_vector_index" if sparse else "vector_index"
        if not self.is_index_enabled(kind, key):
            raise SchemaError(
                f"{'sparse ' if sparse else ''}vector indexing disabled for key {key!r}"
            )

    # -- persistence (catalog JSON) -----------------------------------

    def to_dict(self) -> dict:
        return {"defaults": self.defaults, "keys": self.keys}

    @classmethod
    def from_dict(cls, d: dict | None) -> "Schema | None":
        if d is None:
            return None
        s = cls()
        s.defaults = {k: dict(v) for k, v in d.get("defaults", {}).items()}
        for k in INDEX_KINDS:  # forward-compat: new kinds default-enabled
            s.defaults.setdefault(k, {"enabled": True, "config": {}})
        s.keys = {key: {k: dict(v) for k, v in kinds.items()} for key, kinds in d.get("keys", {}).items()}
        return s
