"""Frontend quota enforcement and rate limiting.

Mirrors the reference's frontend quota layer
(`rust/frontend/src/quota/mod.rs`): each API entry point builds a
:class:`QuotaPayload` naming the :class:`Action` (mod.rs:16-31) and the
request's raw inputs; the configured :class:`QuotaEnforcer` derives
per-:class:`UsageType` measurements (mod.rs:247-279) and rejects any that
exceed the tenant's limit. The default enforcer allows everything, exactly
like the reference's blanket ``impl QuotaEnforcer for ()`` (mod.rs:477-486).

Rate limiting is a per-``(tenant, action)`` token bucket applied before
quota measurement — the analog of the reference server's middleware chain
(`rust/frontend/src/server.rs`), which runs request-rate checks ahead of
the quota enforcer.

Everything here is driver-side arithmetic over the already-materialized
Python argument lists at the API edge — no Spark jobs, no extra scans —
so enforcement adds O(batch) work to calls that are already O(batch).
DataFrame-typed bulk ingest (``add_records``) deliberately skips
per-record content measurements: measuring them would force an extra
distributed scan per write, and the reference's quota layer likewise only
sees list-typed REST payloads.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable, Mapping, Sequence


class QuotaExceededError(ValueError):
    """A measured usage exceeded the tenant's limit."""


class RateLimitError(RuntimeError):
    """The tenant exhausted its request-rate budget for an action."""


class Action(str, Enum):
    """API actions subject to quota — quota/mod.rs:16-31."""

    CREATE_DATABASE = "create_database"
    CREATE_COLLECTION = "create_collection"
    LIST_COLLECTIONS = "list_collections"
    UPDATE_COLLECTION = "update_collection"
    ADD = "add"
    GET = "get"
    DELETE = "delete"
    UPDATE = "update"
    UPSERT = "upsert"
    QUERY = "query"
    SEARCH = "search"
    FORK_COLLECTION = "fork_collection"
    ATTACH_FUNCTION = "attach_function"


class UsageType(str, Enum):
    """Measured quantities — quota/mod.rs:247-279 (the subset that exists
    in this engine; HNSW-only and URI-segment types are omitted)."""

    METADATA_KEY_SIZE_BYTES = "metadata_key_size_bytes"
    METADATA_VALUE_SIZE_BYTES = "metadata_value_size_bytes"
    NUM_METADATA_KEYS = "num_metadata_keys"
    NUM_WHERE_PREDICATES = "num_where_predicates"
    WHERE_VALUE_SIZE_BYTES = "where_value_size_bytes"
    NUM_WHERE_DOCUMENT_PREDICATES = "num_where_document_predicates"
    WHERE_DOCUMENT_VALUE_LENGTH = "where_document_value_length"
    NUM_RECORDS = "num_records"
    EMBEDDING_DIMENSIONS = "embedding_dimensions"
    SPARSE_VECTOR_POPULATED_DIMENSIONS = "sparse_vector_populated_dimensions"
    DOCUMENT_SIZE_BYTES = "document_size_bytes"
    URI_SIZE_BYTES = "uri_size_bytes"
    ID_SIZE_BYTES = "id_size_bytes"
    NAME_SIZE_BYTES = "name_size_bytes"
    LIMIT_VALUE = "limit_value"
    RANK_KNN_LIMIT = "rank_knn_limit"
    NUM_QUERY_EMBEDDINGS = "num_query_embeddings"
    NUM_QUERY_IDS = "num_query_ids"
    NUM_COLLECTIONS = "num_collections"
    NUM_DATABASES = "num_databases"
    REGEX_PATTERN_LENGTH = "regex_pattern_length"
    NUM_FORKS = "num_forks"
    NUM_RANK_KNN = "num_rank_knn"
    NUM_FUNCTIONS = "num_functions"


_LOGICAL = ("$and", "$or")
_DOC_VALUE_OPS = ("$contains", "$not_contains")
_DOC_REGEX_OPS = ("$regex", "$not_regex")


def _utf8len(s: Any) -> int:
    return len(str(s).encode("utf-8"))


def _walk_where(node: Mapping[str, Any]) -> tuple[int, int]:
    """(leaf predicate count, max value size in bytes) for a metadata
    ``where`` tree — counting mirrors quota/mod.rs NumWherePredicates /
    WhereValueSizeBytes."""
    preds, max_val = 0, 0
    for key, val in node.items():
        if key in _LOGICAL:
            for child in val:
                p, v = _walk_where(child)
                preds += p
                max_val = max(max_val, v)
            continue
        preds += 1
        if isinstance(val, Mapping):  # {"k": {"$gte": 3}} / {"$in": [...]}
            for operand in val.values():
                items = operand if isinstance(operand, (list, tuple)) else [operand]
                for item in items:
                    max_val = max(max_val, _utf8len(item))
        else:  # {"k": v} shorthand
            max_val = max(max_val, _utf8len(val))
    return preds, max_val


def _walk_where_document(node: Mapping[str, Any]) -> tuple[int, int, int]:
    """(predicate count, max operand length, max regex pattern length)."""
    preds = length = regex = 0
    for key, val in node.items():
        if key in _LOGICAL:
            for child in val:
                p, ln, rx = _walk_where_document(child)
                preds, length, regex = preds + p, max(length, ln), max(regex, rx)
        elif key in _DOC_REGEX_OPS:
            preds += 1
            length = max(length, len(str(val)))
            regex = max(regex, len(str(val)))
        elif key in _DOC_VALUE_OPS:
            preds += 1
            length = max(length, len(str(val)))
    return preds, length, regex


def _walk_rank(node: Any) -> tuple[int, int]:
    """(number of $knn terms, max $knn limit) in a rank expression —
    NumRankKnn / RankKnnLimit, quota/mod.rs:303,313."""
    knns, max_limit = 0, 0
    if isinstance(node, Mapping):
        for key, val in node.items():
            if key == "$knn":
                knns += 1
                if isinstance(val, Mapping):
                    max_limit = max(max_limit, int(val.get("limit", 0) or 0))
                continue
            k, l = _walk_rank(val)
            knns, max_limit = knns + k, max(max_limit, l)
    elif isinstance(node, (list, tuple)):
        for child in node:
            k, l = _walk_rank(child)
            knns, max_limit = knns + k, max(max_limit, l)
    return knns, max_limit


@dataclass
class QuotaPayload:
    """One API request's quota-relevant inputs — quota/mod.rs:75-102."""

    action: Action
    tenant: str
    api_token: str | None = None
    ids: Sequence[str] | None = None
    embeddings: Sequence[Sequence[float] | None] | None = None
    sparse_vectors: Sequence[Any] | None = None
    documents: Sequence[str | None] | None = None
    uris: Sequence[str | None] | None = None
    metadatas: Sequence[Mapping[str, Any] | None] | None = None
    where: Mapping[str, Any] | None = None
    where_document: Mapping[str, Any] | None = None
    collection_name: str | None = None
    limit: int | None = None
    n_results: int | None = None
    query_embeddings: Sequence[Sequence[float]] | None = None
    query_ids: Sequence[str] | None = None
    rank: Any | None = None
    num_collections: int | None = None
    num_databases: int | None = None
    num_forks: int | None = None
    num_functions: int | None = None

    def usages(self) -> dict[UsageType, int]:
        """Derive every measurable usage from the payload. Only usages the
        payload actually carries appear in the result, so a limit on, say,
        ``num_query_embeddings`` never blocks an ``add``."""
        u: dict[UsageType, int] = {}

        def put_max(kind: UsageType, value: int) -> None:
            u[kind] = max(u.get(kind, 0), value)

        if self.ids is not None:
            u[UsageType.NUM_RECORDS] = len(self.ids)
            for i in self.ids:
                put_max(UsageType.ID_SIZE_BYTES, _utf8len(i))
        if self.embeddings is not None:
            for e in self.embeddings:
                if e is not None:
                    put_max(UsageType.EMBEDDING_DIMENSIONS, len(e))
        if self.sparse_vectors is not None:
            for sv in self.sparse_vectors:
                if sv is None:
                    continue
                indices = getattr(sv, "indices", None)
                if indices is None and isinstance(sv, Mapping):
                    indices = sv.get("indices", ())
                put_max(
                    UsageType.SPARSE_VECTOR_POPULATED_DIMENSIONS,
                    len(indices or ()),
                )
        if self.documents is not None:
            for d in self.documents:
                if d is not None:
                    put_max(UsageType.DOCUMENT_SIZE_BYTES, _utf8len(d))
        if self.uris is not None:
            for uri in self.uris:
                if uri is not None:
                    put_max(UsageType.URI_SIZE_BYTES, _utf8len(uri))
        if self.metadatas is not None:
            for md in self.metadatas:
                if not md:
                    continue
                put_max(UsageType.NUM_METADATA_KEYS, len(md))
                for k, v in md.items():
                    put_max(UsageType.METADATA_KEY_SIZE_BYTES, _utf8len(k))
                    if isinstance(v, str):
                        put_max(UsageType.METADATA_VALUE_SIZE_BYTES, _utf8len(v))
        if self.where is not None:
            preds, max_val = _walk_where(self.where)
            u[UsageType.NUM_WHERE_PREDICATES] = preds
            put_max(UsageType.WHERE_VALUE_SIZE_BYTES, max_val)
        if self.where_document is not None:
            preds, length, regex = _walk_where_document(self.where_document)
            u[UsageType.NUM_WHERE_DOCUMENT_PREDICATES] = preds
            put_max(UsageType.WHERE_DOCUMENT_VALUE_LENGTH, length)
            if regex:
                put_max(UsageType.REGEX_PATTERN_LENGTH, regex)
        if self.collection_name is not None:
            put_max(UsageType.NAME_SIZE_BYTES, _utf8len(self.collection_name))
        if self.limit is not None:
            put_max(UsageType.LIMIT_VALUE, int(self.limit))
        if self.n_results is not None:
            put_max(UsageType.LIMIT_VALUE, int(self.n_results))
        if self.query_embeddings is not None:
            u[UsageType.NUM_QUERY_EMBEDDINGS] = len(self.query_embeddings)
            for e in self.query_embeddings:
                put_max(UsageType.EMBEDDING_DIMENSIONS, len(e))
        if self.query_ids is not None:
            u[UsageType.NUM_QUERY_IDS] = len(self.query_ids)
        if self.rank is not None:
            knns, knn_limit = _walk_rank(self.rank)
            if knns:
                u[UsageType.NUM_RANK_KNN] = knns
                put_max(UsageType.RANK_KNN_LIMIT, knn_limit)
        if self.num_collections is not None:
            u[UsageType.NUM_COLLECTIONS] = self.num_collections
        if self.num_databases is not None:
            u[UsageType.NUM_DATABASES] = self.num_databases
        if self.num_forks is not None:
            u[UsageType.NUM_FORKS] = self.num_forks
        if self.num_functions is not None:
            u[UsageType.NUM_FUNCTIONS] = self.num_functions
        return u


class AllowAllQuotaEnforcer:
    """Default: everything passes — the reference's blanket ``impl
    QuotaEnforcer for ()`` (quota/mod.rs:477-486)."""

    def enforce(self, payload: QuotaPayload) -> None:  # noqa: ARG002
        return None


class StaticQuotaEnforcer:
    """Limits from a static table, with optional per-tenant overrides.

    ``limits`` maps :class:`UsageType` (or its string value) to the
    maximum allowed measurement; ``tenant_overrides`` maps tenant name to
    such a table that shadows the defaults for that tenant."""

    def __init__(
        self,
        limits: Mapping[UsageType | str, int] | None = None,
        tenant_overrides: Mapping[str, Mapping[UsageType | str, int]] | None = None,
    ) -> None:
        self.limits = {UsageType(k): int(v) for k, v in (limits or {}).items()}
        self.tenant_overrides = {
            t: {UsageType(k): int(v) for k, v in table.items()}
            for t, table in (tenant_overrides or {}).items()
        }

    def _limit_for(self, tenant: str, usage: UsageType) -> int | None:
        override = self.tenant_overrides.get(tenant, {})
        if usage in override:
            return override[usage]
        return self.limits.get(usage)

    def enforce(self, payload: QuotaPayload) -> None:
        for usage, value in payload.usages().items():
            limit = self._limit_for(payload.tenant, usage)
            if limit is not None and value > limit:
                raise QuotaExceededError(
                    f"quota exceeded for {payload.action.value}: "
                    f"{usage.value}={value} > limit {limit}"
                    f" (tenant {payload.tenant!r})"
                )


@dataclass
class _Bucket:
    tokens: float
    last: float


class TokenBucketRateLimiter:
    """Per-``(tenant, action)`` token bucket.

    ``capacity`` requests may burst; the bucket refills at
    ``refill_per_sec``. ``action_rates`` overrides ``(capacity,
    refill_per_sec)`` for specific actions (e.g. tighter limits on
    ``query`` than on ``get``). ``clock`` is injectable for tests."""

    def __init__(
        self,
        capacity: float = 100.0,
        refill_per_sec: float = 10.0,
        action_rates: Mapping[Action | str, tuple[float, float]] | None = None,
        clock: Callable[[], float] = time.monotonic,
    ) -> None:
        self.capacity = float(capacity)
        self.refill_per_sec = float(refill_per_sec)
        self.action_rates = {
            Action(k): (float(c), float(r)) for k, (c, r) in (action_rates or {}).items()
        }
        self.clock = clock
        self._buckets: dict[tuple[str, Action], _Bucket] = {}

    def check(self, tenant: str, action: Action) -> None:
        capacity, refill = self.action_rates.get(
            action, (self.capacity, self.refill_per_sec)
        )
        now = self.clock()
        key = (tenant, action)
        bucket = self._buckets.get(key)
        if bucket is None:
            bucket = self._buckets[key] = _Bucket(tokens=capacity, last=now)
        else:
            bucket.tokens = min(capacity, bucket.tokens + (now - bucket.last) * refill)
            bucket.last = now
        if bucket.tokens < 1.0:
            raise RateLimitError(
                f"rate limit exceeded for tenant {tenant!r} action {action.value!r}"
            )
        bucket.tokens -= 1.0
