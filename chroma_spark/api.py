"""Public API: Client / Collection, mirroring the reference surface.

``chromadb/api/models/Collection.py``: add(:96) update(:459) upsert(:515)
delete(:559) get peek(:194) query(:212) search(:368) count(:61) fork(:329)
— re-expressed over parquet + WAL storage (sources/collection.py) with all
reads/queries as DataFrame plans.

Reads default to ReadLevel INDEX_AND_WAL (base ∪ un-compacted log,
materialized on the fly — ``rust/types/src/execution/plan.rs:553``);
``read_level="index_only"`` skips the log tail. ``compact()`` is the
compaction orchestrator analog: fold log into a new base version and
register it in the catalog.
"""

from __future__ import annotations

import uuid
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .operators.knn import exact_knn
from .operators.search import search as search_op
from .sources.collection import (
    Catalog,
    CollectionError,
    CollectionMeta,
    CollectionStore,
    StaleReadError,
)
from .quota import Action, AllowAllQuotaEnforcer, QuotaPayload
from .schema import Schema
from .sources.log import materialize
from .where import where_doc_to_column, where_to_column

_META_SPARK_TYPES = {bool: T.BooleanType(), int: T.LongType(), float: T.DoubleType(), str: T.StringType()}


class _LogCursorMoved(Exception):
    """Internal: a WAL-append CAS found the log cursor advanced by another
    writer; carries the fresh position so the fragment can be re-based."""

    def __init__(self, fresh_pos: int) -> None:
        self.fresh_pos = fresh_pos


class _TxnCursorMoved(Exception):
    """Internal: a transactional first append lost its cursor CAS —
    Transaction.commit re-validates its read/write sets and retries."""


DEFAULT_TENANT = "default_tenant"
DEFAULT_DATABASE = "default_database"


class Client:
    """Entry point; ``root`` is the storage directory (local or any
    Hadoop-compatible FS URI on a cluster).

    Collections are namespaced under (tenant, database) exactly as the
    reference's REST surface (`chromadb/types.py:202-210`,
    `rust/frontend/src/server.rs:306-325`); the default pair is
    auto-created, any other must exist (``create_tenant`` /
    ``create_database``)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        tenant: str = DEFAULT_TENANT,
        database: str = DEFAULT_DATABASE,
        quota_enforcer=None,
        rate_limiter=None,
        auth_provider=None,
        authz_provider=None,
        credentials: dict | None = None,
    ) -> None:
        self.spark = spark
        self.catalog = Catalog(root)
        # authn happens ONCE at construction (the reference authenticates
        # per request because each request is a fresh HTTP call; a client
        # object is the session here), authz per action in _enforce
        self.user = None
        self.authz_provider = authz_provider
        if auth_provider is not None:
            from .auth import resolve_tenant_scope

            self.user = auth_provider.authenticate_or_raise(credentials or {})
            tenant, database = resolve_tenant_scope(
                self.user, tenant, database, DEFAULT_TENANT, DEFAULT_DATABASE
            )
        self.tenant, self.database = tenant, database
        # frontend admission control (quota.py; rust/frontend/src/quota):
        # rate check first, then usage measurement — default allows all
        self.quota_enforcer = quota_enforcer or AllowAllQuotaEnforcer()
        self.rate_limiter = rate_limiter
        if tenant == DEFAULT_TENANT:
            self.catalog.create_tenant(tenant, get_or_create=True)
            if database == DEFAULT_DATABASE:
                self.catalog.create_database(tenant, database, get_or_create=True)
        if not self.catalog.has_database(tenant, database):
            raise CollectionError(f"database {database!r} in tenant {tenant!r} does not exist")

    def _enforce(self, action: Action, **fields) -> None:
        """Admission control for one API call, in the reference's
        middleware order: authorization (chromadb/auth authorize_or_raise),
        then rate bucket, then quota measurement (quota/mod.rs:465-474)."""
        if self.authz_provider is not None:
            from .auth import UserIdentity

            self.authz_provider.authorize_or_raise(
                self.user or UserIdentity(user_id="anonymous"), action
            )
        if self.rate_limiter is not None:
            self.rate_limiter.check(self.tenant, action)
        self.quota_enforcer.enforce(QuotaPayload(action=action, tenant=self.tenant, **fields))

    # -- utility surface (BaseAPI, chromadb/api/__init__.py:95,480-512) --

    def heartbeat(self) -> int:
        """Nanoseconds since epoch — liveness probe (BaseAPI.heartbeat)."""
        import time as _time

        return _time.time_ns()

    def get_version(self) -> str:
        from . import __version__

        return __version__

    def get_max_batch_size(self) -> int:
        """Max records per list-typed write call. The reference caps REST
        payloads; here the cap protects the driver (list-typed args are
        materialized there — DataFrame ingest via add_records is unbounded).
        Advisory unless a quota enforcer sets a stricter num_records."""
        return 100_000

    def count_collections(self) -> int:
        prefix = f"{self.tenant}/{self.database}/"
        return sum(1 for n in self.catalog.list() if n.startswith(prefix))

    def reset(self) -> bool:
        """Delete every collection in this (tenant, database). Destructive;
        requires opt-in exactly like the reference's ALLOW_RESET setting
        (BaseAPI.reset) — refuse otherwise."""
        if not getattr(self, "allow_reset", False):
            raise CollectionError(
                "reset() is disabled; construct the Client and set "
                "client.allow_reset = True to enable (ALLOW_RESET analog)"
            )
        prefix = f"{self.tenant}/{self.database}/"
        for name in list(self.catalog.list()):
            if name.startswith(prefix):
                self.catalog.drop(name)
        return True

    # -- admin surface -------------------------------------------------

    def create_tenant(self, name: str) -> None:
        self.catalog.create_tenant(name)

    def create_database(self, name: str, tenant: str | None = None) -> None:
        self._enforce(
            Action.CREATE_DATABASE,
            collection_name=name,
            num_databases=len(self.catalog.list_databases(tenant or self.tenant)) + 1,
        )
        self.catalog.create_database(tenant or self.tenant, name)

    def list_tenants(self) -> list[str]:
        return self.catalog.list_tenants()

    def list_databases(
        self, tenant: str | None = None, limit: int | None = None, offset: int = 0
    ) -> list[str]:
        names = self.catalog.list_databases(tenant or self.tenant)
        return names[offset : offset + limit if limit is not None else None]

    def get_database(self, name: str, tenant: str | None = None) -> dict:
        """AdminAPI.get_database: raises if absent
        (chromadb/api/__init__.py:724)."""
        t = tenant or self.tenant
        if not self.catalog.has_database(t, name):
            raise CollectionError(f"database {name!r} in tenant {t!r} does not exist")
        return {"name": name, "tenant": t}

    def delete_database(self, name: str, tenant: str | None = None) -> None:
        """AdminAPI.delete_database (chromadb/api/__init__.py:735):
        removes the database AND its collections' catalog entries in ONE
        CAS commit (the sysdb cascade); on-disk data falls to gc."""
        self.catalog.drop_database(tenant or self.tenant, name)

    def _scoped(self, name: str) -> str:
        return f"{self.tenant}/{self.database}/{name}"

    def create_collection(
        self,
        name: str,
        dimension: int | None = None,
        space: str = "l2",
        metadata: dict[str, Any] | None = None,
        get_or_create: bool = False,
        schema: "Schema | None" = None,
        embedding_function: str | None = None,
        embedding_function_kwargs: dict | None = None,
    ) -> "Collection":
        """``embedding_function`` is a registry name from
        functions/embedding.py (persisted in the collection config, as the
        reference stores the EF name in configuration_json) — when set,
        ``add``/``upsert`` auto-embed documents and ``query`` accepts
        ``query_texts``."""
        self._enforce(
            Action.CREATE_COLLECTION,
            collection_name=name,
            metadatas=[metadata] if metadata else None,
            num_collections=sum(
                1 for n in self.catalog.list() if n.startswith(f"{self.tenant}/{self.database}/")
            )
            + 1,
        )
        md = dict(metadata or {})
        if embedding_function is not None:
            from .functions.embedding import get_embedding_function

            get_embedding_function(embedding_function, **(embedding_function_kwargs or {}))  # validate
            md["__embedding_function__"] = {
                "name": embedding_function,
                "kwargs": embedding_function_kwargs or {},
            }
        meta = CollectionMeta(
            name=self._scoped(name),
            id=uuid.uuid4().hex,
            dimension=dimension,
            space=space,
            metadata=md,
            schema=schema.to_dict() if schema is not None else None,
        )
        self.catalog.create(meta, get_or_create=get_or_create)
        return Collection(self, self._scoped(name))

    def get_collection(self, name: str) -> "Collection":
        self.catalog.get(self._scoped(name))
        return Collection(self, self._scoped(name))

    def get_or_create_collection(self, name: str, **kw) -> "Collection":
        return self.create_collection(name, get_or_create=True, **kw)

    def delete_collection(self, name: str) -> None:
        self.catalog.drop(self._scoped(name))

    def list_collections(self, limit: int | None = None, offset: int = 0) -> list[str]:
        self._enforce(Action.LIST_COLLECTIONS)
        prefix = f"{self.tenant}/{self.database}/"
        names = [n[len(prefix):] for n in self.catalog.list() if n.startswith(prefix)]
        return names[offset : offset + limit if limit is not None else None]

    def vacuum(self, keep_last: int = 1, grace_seconds: float = 60.0) -> dict[str, list[int]]:
        """Store-wide maintenance sweep — the CLI ``vacuum`` analog
        (`rust/cli/src/commands/vacuum.rs:224`): fold every collection's
        pending WAL into its base (compaction runs attached functions and
        incremental index maintenance as usual), then GC unreferenced base
        versions / index layouts / orphaned WAL dirs under ``gc``'s
        mark-and-sweep + fork-ref-count rules. Returns
        ``{collection: [pruned base versions]}``."""
        out: dict[str, list[int]] = {}
        for name in self.list_collections():
            col = self.get_collection(name)
            col.compact()
            out[name] = col.gc(keep_last=keep_last, grace_seconds=grace_seconds)
        return out


class Collection:
    def __init__(self, client: Client, name: str) -> None:
        self._client = client
        self._store = CollectionStore(client.spark, client.catalog, name)

    # ------------------------------------------------------------------
    # write surface
    # ------------------------------------------------------------------

    @property
    def name(self) -> str:
        return self._store.name.rsplit("/", 1)[-1]  # bare (unscoped) name

    @property
    def version(self) -> int:
        return self._store.meta.version

    @property
    def schema(self) -> Schema | None:
        return Schema.from_dict(self._store.meta.schema)

    def modify(self, name: str | None = None, metadata: dict | None = None) -> None:
        """Rename and/or replace collection metadata
        (Collection.modify in the reference client)."""
        self._client._enforce(
            Action.UPDATE_COLLECTION,
            collection_name=name,
            metadatas=[metadata] if metadata else None,
        )
        if metadata is not None:
            def _set(m):
                m.metadata = dict(metadata)

            self._store.catalog.mutate(self._store.name, _set)
        if name is not None and name != self.name:
            new_scoped = self._client._scoped(name)
            self._store.catalog.rename(self._store.name, new_scoped)
            self._store.name = new_scoped

    def update_schema(self, schema: Schema) -> None:
        """Persist a modified index configuration (Schema.create_index /
        delete_index mutate a copy; this registers it, the `register`
        operator analog)."""
        def _set(m):
            m.schema = schema.to_dict()

        self._store.catalog.mutate(self._store.name, _set)

    def _validate_indexed(self, where, where_document, knn: bool = False, sparse: bool = False) -> None:
        """Frontend filter gate: payload validation first (malformed
        operators/values reject BEFORE execution, even against an empty
        collection — the reference validates at the frontend), then the
        index gate (service_based_frontend.rs:2813-2819: reject queries
        touching keys whose index is disabled)."""
        from .where import validate_payloads

        validate_payloads(where, where_document)
        s = self.schema
        if s is None:
            return
        s.validate_where(where)
        s.validate_where_document(where_document)
        if knn:
            s.validate_knn(sparse=sparse)

    def _embedding_function(self):
        cfg = self._store.meta.metadata.get("__embedding_function__")
        if cfg is None:
            return None
        from .functions.embedding import get_embedding_function

        return get_embedding_function(cfg["name"], **cfg.get("kwargs", {}))

    def _auto_embed(self, embeddings, documents):
        """Client-side embedding of documents when the collection has an
        attached EF and no embeddings were passed (CollectionCommon
        _validate_and_prepare semantics)."""
        if embeddings is not None or documents is None:
            return embeddings
        ef = self._embedding_function()
        return ef(list(documents)) if ef is not None else None

    def add(self, ids, embeddings=None, documents=None, uris=None, metadatas=None) -> None:
        """Insert records; duplicate ids (already present) are an error
        (Collection.py:96 contract).

        The dup check is a broadcast semi-join of the incoming id batch
        against the snapshot — only the (<= 5) offending ids ever reach the
        driver, so add() scales to any collection size."""
        self._client._enforce(
            Action.ADD, ids=ids, embeddings=embeddings, documents=documents,
            uris=uris, metadatas=metadatas,
        )
        snap = self.snapshot()
        if snap is not None:
            ids_df = self._client.spark.createDataFrame(
                [(str(i),) for i in ids], "id STRING"
            )
            dup = [
                r["id"]
                for r in snap.select("id")
                .join(F.broadcast(ids_df), "id", "semi")
                .limit(5)
                .collect()
            ]
            if dup:
                raise CollectionError(f"duplicate ids in add: {sorted(dup)}")
        self._append("ADD", ids, self._auto_embed(embeddings, documents), documents, uris, metadatas)

    _BULK_META_TYPES = (
        T.BooleanType,
        T.LongType,
        T.DoubleType,
        T.StringType,
        T.IntegerType,
        T.FloatType,
    )

    def add_records(self, records: DataFrame, op: str = "ADD", order_by=None) -> int:
        """Distributed bulk ingest: append a whole DataFrame of records to
        the WAL with NO driver-side row materialization — the 100-TB ingest
        path (``add()`` mirrors the reference's list-based client API; this
        is the Spark-native source for pipelines feeding from
        JSONL/parquet/streams).

        ``records`` columns: ``id`` (required, cast to string); optional
        ``embedding ARRAY<FLOAT>``, ``document STRING``, ``uri STRING``;
        every other column is a metadata key typed by its Spark type
        (bool/long/double/string, arrays thereof, SparseVector struct).
        When the collection has an attached embedding function and no
        embedding column is given, documents embed through the Arrow
        pandas-UDF path inside the same write.

        Scale shape: one distributed semi-join dup check (ADD only, <= 5
        offending ids reach the driver), seq ids from
        ``monotonically_increasing_id`` offset by the log cursor (unique
        and order-stable per partition — pagination order WITHIN one bulk
        batch follows partition order), one parquet append, one MAX
        aggregate over the written fragment to advance the cursor.

        Duplicate ids WITHIN one batch are rejected for every op unless
        ``order_by`` (a column name or list of names) is given: with it,
        rows are hash-repartitioned by id and sorted by ``(id, *order_by)``
        within partitions before seq ids are assigned, so the LAST row in
        ``order_by`` order deterministically wins the per-id WAL fold —
        reproducible across runs and cluster sizes (without it, which
        duplicate won would depend on partition layout)."""
        if op not in ("ADD", "UPDATE", "UPSERT"):
            raise CollectionError(f"add_records op must be ADD/UPDATE/UPSERT, got {op!r}")
        if "id" not in records.columns:
            raise CollectionError("add_records needs an 'id' column")
        for reserved in ("seq_id", "op", "where_json", "offset_id"):
            if reserved in records.columns:
                raise CollectionError(f"column name {reserved!r} is reserved")
        meta = self._store.meta
        df = records.withColumn("id", F.col("id").cast("string"))
        if "embedding" not in df.columns and "document" in df.columns:
            ef = self._embedding_function()
            if ef is not None:
                df = df.withColumn("embedding", ef.embed_column(F.col("document")).cast("array<float>"))
        if "embedding" in df.columns:
            df = df.withColumn("embedding", F.col("embedding").cast("array<float>"))
        from .sparse_vector import SPARSE_VECTOR_TYPE

        for f in df.schema.fields:
            if f.name in ("id", "embedding", "document", "uri"):
                continue
            t = f.dataType
            ok = (
                isinstance(t, self._BULK_META_TYPES)
                or (isinstance(t, T.ArrayType) and isinstance(t.elementType, self._BULK_META_TYPES))
                or t == SPARSE_VECTOR_TYPE
            )
            if not ok:
                raise CollectionError(
                    f"unsupported metadata column type {t.simpleString()} for key {f.name!r}"
                )
        if order_by is not None and op != "ADD":
            order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
            missing = [c for c in order_cols if c not in df.columns]
            if missing:
                raise CollectionError(f"order_by columns not in records: {missing}")
            # All rows of an id land in one partition, sorted by order_by, so
            # per-partition-ascending monotonically_increasing_id makes the
            # order_by-last row the per-id seq winner — deterministically.
            df = df.repartition(F.col("id")).sortWithinPartitions("id", *order_cols)
        else:
            dup_in = [
                r["id"]
                for r in df.groupBy("id").count().filter(F.col("count") > 1).limit(5).collect()
            ]
            if dup_in:
                raise CollectionError(
                    f"duplicate ids within add_records batch: {sorted(dup_in)} "
                    "(pass order_by=<col> to resolve duplicates deterministically)"
                )
        if op == "ADD":
            snap = self.snapshot()
            if snap is not None:
                dup = [
                    r["id"]
                    for r in snap.select("id").join(df.select("id"), "id", "semi").limit(5).collect()
                ]
                if dup:
                    raise CollectionError(f"duplicate ids in add_records: {sorted(dup)}")
        log_df = df.withColumn(
            "seq_id", (F.lit(int(meta.log_position)) + F.monotonically_increasing_id()).cast("long")
        ).withColumn("op", F.lit(op))
        for c in ("embedding", "document", "uri"):
            if c not in log_df.columns:
                typ = "array<float>" if c == "embedding" else "string"
                log_df = log_df.withColumn(c, F.lit(None).cast(typ))
        front = ["seq_id", "op", "id", "embedding", "document", "uri"]
        log_df = log_df.select(*front, *[c for c in log_df.columns if c not in front])
        path = self._store.append_log(log_df)
        # validate dimensions on the WRITTEN fragment (one narrow scan that
        # shares the cursor read) so an attached EF's pandas UDF is not
        # evaluated twice; a failed check leaves the fragment unreferenced
        written = self._client.spark.read.parquet(path)
        row = written.agg(
            F.max("seq_id").alias("m"),
            F.count("*").alias("n"),
            F.collect_set(F.size("embedding")).alias("dims"),
        ).first()
        dims = [int(d) for d in (row["dims"] or []) if d is not None and d >= 0]
        if dims:
            if meta.dimension is None and len(dims) == 1:
                meta.dimension = dims[0]
            elif set(dims) != {meta.dimension}:
                raise CollectionError(
                    f"embedding dimension {sorted(dims)} != collection dimension {meta.dimension}"
                )
        self._commit_log_append(
            path,
            base_pos=int(meta.log_position),
            max_seq=int(row["m"]) if row["m"] is not None else None,
            dimension_hint=meta.dimension,
        )
        return int(row["n"])

    def add_files(
        self, path: str, format: str = "jsonl", op: str = "ADD", order_by=None, **reader_kwargs
    ) -> int:
        """Ingest a file corpus (JSONL / CSV / text directory, glob, or
        single file) as ONE distributed ``add_records`` write — the loader
        loop every reference user hand-rolls around client ``add()``
        batches (`chromadb/api/models/Collection.py:81`), collapsed into a
        single plan: read -> canonicalize -> (auto-embed) -> WAL append.
        ``reader_kwargs`` pass through to the format's reader in
        ``sources/files.py`` (``schema`` matters at scale — see there)."""
        from .sources.files import (
            read_documents_csv,
            read_documents_jsonl,
            read_documents_text,
        )

        readers = {
            "jsonl": read_documents_jsonl,
            "json": read_documents_jsonl,
            "csv": read_documents_csv,
            "text": read_documents_text,
        }
        if format not in readers:
            raise CollectionError(f"add_files format must be one of {sorted(readers)}")
        records = readers[format](self._client.spark, path, **reader_kwargs)
        return self.add_records(records, op=op, order_by=order_by)

    def export_files(
        self,
        path: str,
        format: str = "jsonl",
        include: Sequence[str] = ("documents", "metadatas"),
        where: dict | None = None,
        where_document: dict | None = None,
        shards: int | None = None,
        mode: str = "error",
    ) -> int:
        """Export the collection (optionally filtered/projected) as sharded
        JSONL — the interchange shape downstream tokenizer/training jobs
        read, and the inverse of :meth:`add_files`. Returns rows written.
        One distributed write; ``shards`` controls output file count (gz
        shards are non-splittable on re-read, so pick ~0.1-1 GB each)."""
        from .sources.files import write_documents_jsonl

        if format not in ("jsonl", "json"):
            raise CollectionError("export_files supports format='jsonl'")
        snap = self.snapshot()
        if snap is None:
            raise CollectionError("nothing to export: collection is empty")
        self._validate_indexed(where, where_document)
        if where is not None:
            snap = snap.filter(where_to_column(where, known_keys=frozenset(snap.columns)))
        if where_document is not None:
            cands = self._fts_candidates(where_document)
            if cands is not None:
                snap = snap.join(cands, "id", "semi")
            snap = snap.filter(where_doc_to_column(where_document))
        drop = {"embeddings": "embedding", "documents": "document", "uris": "uri"}
        hidden = {v for k, v in drop.items() if k not in include}
        hidden |= {"seq_id", "op", "where_json", "offset_id"}
        out = snap.drop(*hidden)
        if shards is not None:
            out = out.repartition(int(shards))
        write_documents_jsonl(out, path, mode=mode)
        return self._client.spark.read.json(path).count()

    def delete_records(self, ids: DataFrame) -> int:
        """Bulk delete by a DataFrame of ids — the distributed twin of
        ``delete(ids=[...])`` for pipeline-scale removals (e.g. the output
        of a dedup or decontamination pass anti-joined into the corpus).
        One DELETE log row per id, appended with no driver-side rows;
        returns the number of delete records written."""
        if "id" not in ids.columns:
            raise CollectionError("delete_records needs an 'id' column")
        meta = self._store.meta
        log_df = (
            ids.select(F.col("id").cast("string").alias("id"))
            .distinct()
            .withColumn(
                "seq_id",
                (F.lit(int(meta.log_position)) + F.monotonically_increasing_id()).cast("long"),
            )
            .withColumn("op", F.lit("DELETE"))
            .withColumn("embedding", F.lit(None).cast("array<float>"))
            .withColumn("document", F.lit(None).cast("string"))
            .withColumn("uri", F.lit(None).cast("string"))
            .select("seq_id", "op", "id", "embedding", "document", "uri")
        )
        path = self._store.append_log(log_df)
        written = self._client.spark.read.parquet(path)
        row = written.agg(F.max("seq_id").alias("m"), F.count("*").alias("n")).first()
        self._commit_log_append(
            path,
            base_pos=int(meta.log_position),
            max_seq=int(row["m"]) if row["m"] is not None else None,
        )
        return int(row["n"])

    def update(self, ids, embeddings=None, documents=None, uris=None, metadatas=None) -> None:
        self._client._enforce(
            Action.UPDATE, ids=ids, embeddings=embeddings, documents=documents,
            uris=uris, metadatas=metadatas,
        )
        self._append("UPDATE", ids, self._auto_embed(embeddings, documents), documents, uris, metadatas)

    def upsert(self, ids, embeddings=None, documents=None, uris=None, metadatas=None) -> None:
        self._client._enforce(
            Action.UPSERT, ids=ids, embeddings=embeddings, documents=documents,
            uris=uris, metadatas=metadatas,
        )
        self._append("UPSERT", ids, self._auto_embed(embeddings, documents), documents, uris, metadatas)

    def delete(self, ids=None, where=None, where_document=None) -> None:
        """Delete by ids and/or predicates. A no-argument delete() raises —
        the reference errors rather than wiping the collection
        (chromadb/api/models/Collection.py:559-581).

        Predicate deletes append ONE DELETE_WHERE log record carrying the
        predicate, folded per record at materialization (the reference
        stores the predicate, not the matched-id expansion) — no driver-side
        id collection at any collection size."""
        if ids is None and where is None and where_document is None:
            raise CollectionError("delete() requires ids, where, or where_document")
        self._client._enforce(
            Action.DELETE, ids=ids, where=where, where_document=where_document
        )
        if where is None and where_document is None:
            self._append("DELETE", ids, None, None, None, None)
            return
        self._append_delete_where(ids, where, where_document)

    def _commit_log_append(
        self,
        path: str,
        base_pos: int,
        max_seq: int | None,
        dimension_hint: int | None = None,
    ) -> None:
        """CAS-register a written WAL fragment: append its path and advance
        the log cursor in ONE catalog commit that re-checks the cursor
        against FRESH state (wal3's log-position CAS). If another process
        advanced the cursor since ``base_pos``, this fragment's seq ids
        could collide with the winner's, so the fragment is rewritten with
        seqs shifted onto the fresh cursor and the CAS retried — O(batch)
        per contention round, zero cost uncontended. Seq ranges therefore
        never overlap across writers and WAL order linearizes with catalog
        commit order."""
        expect_pos = getattr(self, "_txn_expect_pos", None)
        self._txn_expect_pos = None
        while True:
            def fn(m):
                if m.log_position != base_pos or (
                    expect_pos is not None and m.log_position != expect_pos
                ):
                    raise _LogCursorMoved(m.log_position)
                if dimension_hint is not None:
                    if m.dimension is None:
                        m.dimension = dimension_hint
                    elif m.dimension != dimension_hint:
                        raise CollectionError(
                            f"embedding dimension {dimension_hint} != collection "
                            f"dimension {m.dimension}"
                        )
                m.log_paths = [*m.log_paths, path]
                if max_seq is not None:
                    m.log_position = max_seq + 1

            try:
                self._store.catalog.mutate(self._store.name, fn)
                return
            except _LogCursorMoved as moved:
                if expect_pos is not None:
                    # transactional append: the conflict check validated at
                    # expect_pos — a moved cursor means unvalidated foreign
                    # writes; the caller re-validates rather than re-basing
                    import shutil

                    shutil.rmtree(path, ignore_errors=True)
                    raise _TxnCursorMoved() from None
                delta = moved.fresh_pos - base_pos
                path = self._shift_log_fragment(path, delta)
                if max_seq is not None:
                    max_seq += delta
                base_pos = moved.fresh_pos

    def _shift_log_fragment(self, path: str, delta: int) -> str:
        """Rewrite one WAL fragment with seq ids shifted by ``delta`` into
        a new unique dir (append-only stores never rewrite in place); the
        superseded dir is removed. Cost is one fragment, not the log."""
        import shutil

        df = self._client.spark.read.parquet(path).withColumn(
            "seq_id", (F.col("seq_id") + F.lit(int(delta))).cast("long")
        )
        new_path = self._store.append_log(df)
        shutil.rmtree(path, ignore_errors=True)
        return new_path

    def _append_delete_where(self, ids, where, where_document) -> None:
        import json as _json

        from .where import where_doc_to_sql, where_to_sql

        # grammar validation at write time (the reference's frontend rejects
        # malformed plans before they reach the log)
        if where is not None:
            where_to_sql(where)
        if where_document is not None:
            where_doc_to_sql(where_document)
        meta = self._store.meta
        payload = _json.dumps(
            {
                "ids": [str(i) for i in ids] if ids is not None else None,
                "where": where,
                "where_document": where_document,
            }
        )
        schema = T.StructType(
            [
                T.StructField("seq_id", T.LongType()),
                T.StructField("op", T.StringType()),
                T.StructField("id", T.StringType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
                T.StructField("document", T.StringType()),
                T.StructField("uri", T.StringType()),
                T.StructField("where_json", T.StringType()),
            ]
        )
        df = self._client.spark.createDataFrame(
            [(meta.log_position, "DELETE_WHERE", None, None, None, None, payload)], schema
        )
        path = self._store.append_log(df)
        self._commit_log_append(path, base_pos=int(meta.log_position), max_seq=int(meta.log_position))

    def _append(self, op, ids, embeddings, documents, uris, metadatas) -> None:
        meta = self._store.meta
        ids = [str(i) for i in ids]
        n = len(ids)
        cap = self._client.get_max_batch_size()
        if n > cap:
            # list-typed writes materialize on the driver; the reference
            # raises the same way (utils/batch_utils.py) — DataFrame ingest
            # via add_records is the unbounded path
            raise CollectionError(
                f"batch of {n} exceeds get_max_batch_size()={cap}; "
                "use add_records(DataFrame) for bulk ingest"
            )
        if embeddings is not None:
            dims = {len(e) for e in embeddings if e is not None}
            if meta.dimension is None and dims:
                meta.dimension = dims.pop()
                if dims:
                    raise CollectionError("inconsistent embedding dimensions")
            elif dims and dims != {meta.dimension}:
                raise CollectionError(
                    f"embedding dimension {dims} != collection dimension {meta.dimension}"
                )

        def _col(vals, i):
            return None if vals is None else vals[i]

        from .sparse_vector import SPARSE_VECTOR_TYPE, validate_sparse_vector

        def _scalar_type(x, ctx):
            if isinstance(x, bool):
                return bool
            if isinstance(x, int):
                return int
            if isinstance(x, float):
                return float
            if isinstance(x, str):
                return str
            raise CollectionError(f"unsupported metadata value {x!r} in {ctx}")

        def _vtype(k, v):
            """Value type tag: a scalar type, ("array", elem), or "sparse"
            (reference MetadataValue incl. Bool/Int/Float/StringArray,
            rust/types/src/metadata.rs:659-682)."""
            if isinstance(v, dict):
                validate_sparse_vector(v)
                return "sparse"
            if isinstance(v, list):
                elem = None  # None = empty array, adopts the column's type
                for x in v:
                    t = _scalar_type(x, f"array key {k!r}")
                    if elem is None or elem is t:
                        elem = t
                    elif {elem, t} == {int, float}:
                        elem = float  # mixed-numeric arrays coerce (metadata.rs:709-712)
                    else:
                        raise CollectionError(
                            f"mixed element types in array metadata key {k!r}"
                        )
                return ("array", elem)
            return _scalar_type(v, f"key {k!r}")

        def _promote(prev, cur, k):
            if prev is None or prev == cur:
                return cur
            if {prev, cur} == {int, float}:
                return float
            if (
                isinstance(prev, tuple)
                and isinstance(cur, tuple)
                and prev[0] == cur[0] == "array"
            ):
                a, b = prev[1], cur[1]
                if a is None:
                    return cur
                if b is None or a is b:
                    return prev
                if {a, b} == {int, float}:
                    return ("array", float)
            raise CollectionError(
                f"mixed types for metadata key {k!r}: {prev} vs {cur}"
            )

        rows = []
        meta_keys: dict[str, object] = {}
        for m in metadatas or []:
            for k, v in (m or {}).items():
                meta_keys[k] = _promote(meta_keys.get(k), _vtype(k, v), k)
        for k, t in list(meta_keys.items()):
            if t == ("array", None):
                meta_keys[k] = ("array", str)  # only-empty arrays: string

        def _coerce(v, t):
            if v is None:
                return None
            if t is float and isinstance(v, int) and not isinstance(v, bool):
                return float(v)
            if t == "sparse":
                return {
                    "indices": [int(i) for i in v["indices"]],
                    "values": [float(x) for x in v["values"]],
                    "labels": list(v["labels"]) if v.get("labels") is not None else None,
                }
            if isinstance(t, tuple):
                if t[1] is float:
                    return [float(x) for x in v]
                return list(v)
            return v

        for i in range(n):
            m = _col(metadatas, i) or {}
            emb = _col(embeddings, i)
            rows.append(
                {
                    "seq_id": meta.log_position + i,
                    "op": op,
                    "id": ids[i],
                    "embedding": [float(x) for x in emb] if emb is not None else None,
                    "document": _col(documents, i),
                    "uri": _col(uris, i),
                    **{k: _coerce(m.get(k), t) for k, t in meta_keys.items()},
                }
            )
        fields = [
            T.StructField("seq_id", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("id", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("document", T.StringType()),
            T.StructField("uri", T.StringType()),
        ]
        for k, t in meta_keys.items():
            if t == "sparse":
                fields.append(T.StructField(k, SPARSE_VECTOR_TYPE))
            elif isinstance(t, tuple):
                fields.append(T.StructField(k, T.ArrayType(_META_SPARK_TYPES[t[1]])))
            elif t in _META_SPARK_TYPES:
                fields.append(T.StructField(k, _META_SPARK_TYPES[t]))
            else:
                raise CollectionError(f"unsupported metadata type {t!r} for key {k!r}")
        df = self._client.spark.createDataFrame(rows, T.StructType(fields))
        path = self._store.append_log(df)
        self._commit_log_append(
            path,
            base_pos=int(meta.log_position),
            max_seq=int(meta.log_position) + n - 1 if n else None,
            dimension_hint=meta.dimension,
        )

    # ------------------------------------------------------------------
    # state assembly (ReadLevels) + compaction
    # ------------------------------------------------------------------

    def snapshot(
        self, read_level: str = "index_and_wal", log_bound: int | None = None
    ) -> DataFrame | None:
        """Materialized record state as a DataFrame (None when empty).

        ``read_level`` mirrors the reference's ReadLevel
        (``rust/types/src/execution/plan.rs:553``): ``index_only`` (base
        only), ``index_and_wal`` (base ∪ full log tail), or
        ``index_and_bounded_wal`` (base ∪ log where ``seq_id <= log_bound``
        — bounded-staleness reads; the frontend's log scouting picks the
        bound, ``service_based_frontend.rs:2833-2852``)."""
        if read_level == "index_and_bounded_wal" and log_bound is None:
            raise ValueError("index_and_bounded_wal requires log_bound")
        base = self._store.read_base()
        log = self._store.read_log() if read_level != "index_only" else None
        if log is not None and read_level == "index_and_bounded_wal":
            log = log.filter(F.col("seq_id") <= int(log_bound))
        log, where_ops = self._split_where_ops(log)
        return self._fold(base, log, where_ops)

    @staticmethod
    def _split_where_ops(log: DataFrame | None) -> tuple[DataFrame | None, list[tuple]]:
        """Separate DELETE_WHERE predicate records from the id-keyed log.

        The collect is bounded by the number of predicate-delete statements
        issued (predicates, not data)."""
        where_ops: list[tuple] = []
        if log is not None and "where_json" in log.columns:
            import json as _json

            wrows = (
                log.filter(F.col("op") == "DELETE_WHERE")
                .select("seq_id", "where_json")
                .collect()
            )
            for r in wrows:
                p = _json.loads(r["where_json"])
                where_ops.append(
                    (
                        int(r["seq_id"]),
                        # an EMPTY id list is a real (matches-nothing)
                        # constraint, distinct from "no id constraint"
                        set(p["ids"]) if p.get("ids") is not None else None,
                        p.get("where"),
                        p.get("where_document"),
                    )
                )
            log = log.filter(F.col("op") != "DELETE_WHERE").drop("where_json")
        return log, where_ops

    @staticmethod
    def _predicate_matched_ids(base: DataFrame, where_ops: list[tuple]) -> DataFrame:
        """Base ids matched by any pending DELETE_WHERE, evaluated
        vectorized with the same where compilers every read uses. Exact for
        ids the id-keyed tail never touches (their state at each predicate's
        seq IS base state); ids the tail does touch are collected separately
        by the callers, so the union is always a superset of the stale set —
        over-inclusion only routes an id through the bounded tail fold,
        never drops one."""
        known = frozenset(base.columns)
        cond = F.lit(False)
        for _seq, w_ids, w, wd in where_ops:
            c = F.lit(True)
            if w_ids is not None:
                c = c & F.col("id").isin([str(i) for i in w_ids])
            if w is not None:
                c = c & where_to_column(w, known_keys=known)
            if wd is not None:
                c = c & where_doc_to_column(wd)
            cond = cond | c
        return base.filter(cond).select("id")

    @staticmethod
    def _fold(base: DataFrame | None, log: DataFrame | None, where_ops: list[tuple]) -> DataFrame | None:
        if log is None:
            return base
        if base is None:
            return materialize(None, log, where_ops=where_ops)
        # give the log every base column (schema may have evolved); then
        # materialize() aligns the base side to the log's field set
        base_types = dict(base.dtypes)
        for c in base.columns:
            if c not in log.columns and c != "offset_id":
                log = log.withColumn(c, F.lit(None).cast(base_types[c]))
        return materialize(base, log, where_ops=where_ops)

    # -- attached functions (reference: chromadb/api/functions.py:21-28,
    # rust/worker/src/execution/functions/, run piggybacked on compaction
    # via execute_task.rs) ---------------------------------------------

    def attach_function(self, name: str, kind: str, **params) -> None:
        """Persistently attach a derived computation; every subsequent
        ``compact()`` runs it against the new state / log batch and writes
        its output collection under ``fn_{name}/v{version}``.

        ``kind`` ∈ statistics | record_counter | revision_history |
        quality_score | lm_perplexity
        (streaming/functions.py ``make_attached_function``); ``params``
        must be JSON-serializable — they're stored in the collection config
        exactly as the reference stores the function spec."""
        from .streaming.functions import make_attached_function

        make_attached_function(name, kind, **params)  # validate kind/params
        fns = dict(self._store.meta.metadata.get("__functions__", {}))
        self._client._enforce(
            Action.ATTACH_FUNCTION,
            collection_name=name,
            num_functions=len(fns) + (0 if name in fns else 1),
        )

        def _set(m):
            cur = dict(m.metadata.get("__functions__", {}))
            cur[name] = {"kind": kind, "params": params}
            m.metadata["__functions__"] = cur

        self._store.catalog.mutate(self._store.name, _set)

    def detach_function(self, name: str) -> None:
        def _del(m):
            fns = dict(m.metadata.get("__functions__", {}))
            if name not in fns:
                raise CollectionError(f"no attached function named {name!r}")
            del fns[name]
            m.metadata["__functions__"] = fns

        self._store.catalog.mutate(self._store.name, _del)

    def list_functions(self) -> dict[str, dict]:
        return dict(self._store.meta.metadata.get("__functions__", {}))

    def _attached_functions(self) -> list:
        from .streaming.functions import make_attached_function

        return [
            make_attached_function(n, spec["kind"], **spec.get("params", {}))
            for n, spec in sorted(self.list_functions().items())
        ]

    def read_function_output(self, name: str, version: int | None = None) -> DataFrame:
        """Latest (or pinned-version) output collection of an attached
        function."""
        import os as _os

        base = _os.path.join(self._store.catalog.root, self._store.name, f"fn_{name}")
        if version is None:
            versions = [
                int(d[1:]) for d in (_os.listdir(base) if _os.path.isdir(base) else [])
                if d.startswith("v") and d[1:].isdigit()
            ]
            if not versions:
                raise CollectionError(f"function {name!r} has no output yet")
            version = max(versions)
        return self._client.spark.read.parquet(_os.path.join(base, f"v{version}"))

    def compact(self, attached: list | None = None, refresh_indexes: bool = True) -> int:
        """Fold the WAL into a new base version; returns the new version.

        ``attached`` — AttachedFunction list (streaming/compactor.py) run
        piggybacked on the compaction exactly as the reference's
        execute_task.rs: each gets (new state, raw log batch) and its
        output lands under the collection dir as the derived "output
        collection" (`fn_{name}/v{version}`).

        ``refresh_indexes`` — when a vector index is registered, rebuild it
        for the new version (the reference's compaction writes the vector
        segment's index as part of the same flush, SURVEY §3.3), so index
        reads never go stale across compactions.

        Single-compactor-per-collection: an advisory lockfile serializes
        compaction ACROSS PROCESSES (the reference assigns one compaction
        owner per collection; two unserialized compactors here would both
        write the same base_v{N+1} dir before either registers, and the
        loser's overwrite could corrupt the winner's registered files).
        The version CAS at register stays as the correctness backstop; a
        crashed owner's stale lock is taken over after LOCK_STALE_SECONDS.
        """
        with self._compaction_lock():
            return self._compact_locked(attached, refresh_indexes)

    LOCK_STALE_SECONDS = 600.0

    def _compaction_lock(self):
        import contextlib
        import os as _os
        import time as _time

        lock_path = _os.path.join(
            self._store.catalog.root, self._store.name, ".compact.lock"
        )

        @contextlib.contextmanager
        def _lock():
            _os.makedirs(_os.path.dirname(lock_path), exist_ok=True)
            while True:
                try:
                    fd = _os.open(lock_path, _os.O_CREAT | _os.O_EXCL | _os.O_WRONLY)
                    _os.write(fd, f"{_os.getpid()} {_time.time()}".encode())
                    _os.close(fd)
                    break
                except FileExistsError:
                    try:
                        age = _time.time() - _os.path.getmtime(lock_path)
                    except OSError:
                        continue  # released between open and stat; retry
                    if age > self.LOCK_STALE_SECONDS:
                        # crashed owner: steal (unlink may race another
                        # stealer — the O_EXCL retry arbitrates)
                        try:
                            _os.unlink(lock_path)
                        except OSError:
                            pass
                        continue
                    raise CollectionError(
                        f"another process is compacting {self.name!r} "
                        f"(lock {lock_path}, {age:.0f}s old)"
                    )
            try:
                yield
            finally:
                try:
                    _os.unlink(lock_path)
                except OSError:
                    pass

        return _lock()

    def _compact_locked(self, attached: list | None, refresh_indexes: bool) -> int:
        # pin the fold's inputs ONCE: the fold, the attached functions, and
        # the register below all see exactly these paths, so a concurrent
        # writer's fragment is never half-included (it either commits its
        # path before this read — folded — or survives in the kept tail)
        meta = self._store.meta
        consumed_logs = list(meta.log_paths)
        spark = self._client.spark
        base = (
            spark.read.option("mergeSchema", "true").parquet(*meta.base_paths)
            if meta.base_paths
            else None
        )
        log_batch = (
            spark.read.option("mergeSchema", "true").parquet(*consumed_logs)
            if consumed_logs
            else None
        )
        log, where_ops = self._split_where_ops(log_batch)
        snap = self._fold(base, log, where_ops)
        if snap is None:
            return meta.version
        new_version = meta.version + 1
        path = self._store.write_base(snap, new_version)
        # persistently-attached functions always run; ad-hoc ones compose
        attached = [*self._attached_functions(), *(attached or [])]
        if attached:
            state = self._client.spark.read.parquet(path)
            import os as _os

            for af in attached:
                out = af.fn(state, log_batch) if log_batch is not None else af.fn(state, state.limit(0))
                out.write.mode("overwrite").parquet(
                    _os.path.join(self._store.catalog.root, self._store.name, f"fn_{af.name}", f"v{new_version}")
                )
        # register: version CAS against FRESH state — a concurrent
        # compaction from another process loses cleanly instead of silently
        # clobbering, and WAL fragments appended since the pin survive in
        # the kept tail (their seqs are > every folded seq by the append CAS)
        consumed = set(consumed_logs)

        def _register(m):
            if m.version != meta.version:
                raise CollectionError(
                    f"concurrent compaction: version moved v{meta.version} -> "
                    f"v{m.version} during compact()"
                )
            m.version = new_version
            m.base_paths = [path]
            m.log_paths = [p for p in m.log_paths if p not in consumed]

        self._store.catalog.mutate(self._store.name, _register)
        if refresh_indexes:
            base = self._store.read_base()

            def _has_rows(col_name: str) -> bool:
                return (
                    base is not None
                    and col_name in base.columns
                    and base.filter(F.col(col_name).isNotNull()).head() is not None
                )

            vi = meta.vector_index
            if vi is not None:
                if _has_rows("embedding"):
                    self._maintain_vector_index(log_batch)
                else:
                    # the collection emptied out (or lost every embedding):
                    # deregister rather than crash the k-means build; a
                    # later compaction with vectors re-registers via the
                    # schema path or an explicit build
                    self._store.catalog.mutate(
                        self._store.name, lambda m: setattr(m, "vector_index", None)
                    )
            elif self.schema is not None:
                # declarative indexing: an explicit vector_index config in
                # the schema means "maintain the index at compaction" (the
                # reference's compaction always writes the vector segment)
                cfg = self.schema.index_config("vector_index", "#embedding") or {}
                if cfg.get("n_lists") and _has_rows("embedding"):
                    self.build_vector_index()
            for key, si in list((meta.sparse_indexes or {}).items()):
                if _has_rows(key):
                    self._maintain_sparse_index(key, log_batch)
                else:
                    def _drop_si(m, key=key):
                        m.sparse_indexes = {
                            k: v for k, v in (m.sparse_indexes or {}).items() if k != key
                        }

                    self._store.catalog.mutate(self._store.name, _drop_si)
            self._maintain_dedup_index()
            self._maintain_fts_index()
        return new_version

    def build_vector_index(
        self,
        n_lists: int | None = None,
        replicas: int = 2,
        quantized: bool | str | None = None,
        rerank_factor: int | None = None,
    ) -> dict:
        """Build + register the SPANN/IVF-style vector index for the
        current version (the vector-segment write of the reference's
        compaction: ``apply/commit/flush`` then ``register``). Pending WAL
        entries are compacted first so the index corresponds to exactly one
        collection version; ``query()`` then serves from the index and
        brute-forces only the WAL tail written after the build
        (merged via knn_merge, ``operators/knn_merge.rs:43``).

        ``quantized`` picks the code tier, mirroring the reference's
        1-bit..multi-bit RaBitQ spectrum (rust/index/src/quantization/
        mod.rs): ``"sign"``/``True`` packs sign-bit codes (Hamming
        prefilter; rerank_factor defaults to 24), ``"sq4"`` packs 4-bit
        scalar codes with per-dim corrective (lo, step) (ADC prefilter;
        rerank_factor defaults to 4), ``"pq"`` trains product-quantization
        codebooks (dim/8 subspaces, 256 codes each — m bytes/vector; LUT
        ADC prefilter; rerank_factor defaults to 8). PQ codebooks persist
        beside the layout (``pq_books.json``), not in the catalog."""
        import os as _os

        from .ann.ivf import build_ivf, write_ivf

        if self._store.meta.log_paths:
            # refresh_indexes=False: this build IS the refresh
            self.compact(refresh_indexes=False)
        meta = self._store.meta
        base = self._store.read_base()
        if base is None:
            raise CollectionError("cannot index an empty collection")
        records = base.filter(F.col("embedding").isNotNull()).select("id", "embedding")
        cfg = {}
        if self.schema is not None:
            cfg = self.schema.index_config("vector_index", "#embedding") or {}
        n_lists = int(n_lists or cfg.get("n_lists", 16))
        if quantized is None:
            quantized = cfg.get("quantized", False)
        if quantized is True:
            quantized = "sign"
        if quantized not in (False, "sign", "sq4", "pq"):
            raise CollectionError(
                f"unknown quantization tier {quantized!r}; use 'sign', 'sq4' or 'pq'"
            )
        # bulk build: GEMM assignment (ivf._assign_arrow) — the expression
        # form is O(N * n_lists) interpreted array distances, hours at SIFT1M+
        centroids, postings = build_ivf(
            records, n_lists=n_lists, replicas=replicas, assign_method="arrow"
        )
        path = _os.path.join(
            self._store.catalog.root, self._store.name, "index_vector", f"v{meta.version}"
        )
        desc = {
            "version": meta.version,
            "path": path,
            "n_lists": n_lists,
            "space": meta.space,
            # incremental-maintenance state: epoch stamps every posting row
            # (readers filter `__epoch <= version`, so shared-layout forks
            # stay consistent); trained_version/n_rows/n_appended drive the
            # retrain-on-drift decision at compaction
            "epoch": meta.version,
            "trained_version": meta.version,
            "replicas": int(replicas),
            "n_rows": int(records.count()),
            "n_appended": 0,
        }
        if quantized == "sign":
            from .ann.quantize import build_codes

            postings, means = build_codes(postings)
            desc["means"] = [float(m) for m in means]
            desc["rerank_factor"] = int(rerank_factor or 24)
        elif quantized == "sq4":
            from .ann.quantize import build_codes4

            postings, (lo, step) = build_codes4(postings)
            desc["sq4_lo"] = [float(x) for x in lo]
            desc["sq4_step"] = [float(x) for x in step]
            desc["rerank_factor"] = int(rerank_factor or 4)
        elif quantized == "pq":
            import json as _json

            from .ann.pq import encode_pq, train_pq

            dim = len(records.select("embedding").first()["embedding"])
            if dim % 8 != 0:
                raise CollectionError(f"pq tier needs dim divisible by 8, got {dim}")
            books = train_pq(records, m=dim // 8, k_codes=256)
            postings = encode_pq(postings, books)
            _os.makedirs(path, exist_ok=True)
            with open(_os.path.join(path, "pq_books.json"), "w") as f:
                _json.dump(books, f)
            desc["pq"] = {"m": dim // 8, "k_codes": 256}
            desc["rerank_factor"] = int(rerank_factor or 8)
        postings = postings.withColumn("__epoch", F.lit(meta.version).cast("long"))
        write_ivf(centroids, postings, path)
        self._store.catalog.mutate(
            self._store.name, lambda m: setattr(m, "vector_index", desc)
        )
        return desc

    # fraction of the trained corpus that may accumulate as tombstoned/
    # appended deltas before compaction retrains k-means from scratch —
    # SPANN's incremental-head discipline (types.rs splits/merges heads
    # incrementally and reclusters only on imbalance)
    REINDEX_FRACTION = 0.5

    def _maintain_vector_index(self, log_batch: DataFrame | None) -> dict:
        """Per-compaction index upkeep WITHOUT a full rebuild: reuse the
        trained centroids, tombstone the batch's touched ids at the new
        epoch, assign only the delta's vectors (old centroids, old
        quantization pivot) and append them to the existing partitioned
        layout. A 0.1% delta costs a delta-sized pass, not a corpus-sized
        one. Retrains from scratch only when cumulative drift exceeds
        ``REINDEX_FRACTION`` of the trained corpus (or no epoch-stamped
        layout exists yet)."""
        import os as _os

        from .ann.ivf import append_ivf_postings, assign_to_centroids

        meta = self._store.meta
        vi = meta.vector_index

        def _full() -> dict:
            tier: bool | str = False
            if vi is not None and vi.get("means") is not None:
                tier = "sign"
            elif vi is not None and vi.get("sq4_lo") is not None:
                tier = "sq4"
            elif vi is not None and vi.get("pq") is not None:
                tier = "pq"
            return self.build_vector_index(
                n_lists=vi.get("n_lists") if vi else None,
                quantized=tier,
                rerank_factor=int(vi["rerank_factor"]) if vi and "rerank_factor" in vi else None,
            )

        if vi is None or vi.get("epoch") is None or log_batch is None:
            return _full()
        own_prefix = _os.path.join(self._store.catalog.root, self._store.name) + _os.sep
        if not vi["path"].startswith(own_prefix):
            # fork child diverging from a parent-owned layout: appending here
            # would interleave two collections' independent epoch counters —
            # rebuild once into our own directory instead
            return _full()
        base = self._store.read_base()
        touched = self._touched_ids(log_batch, self._load_vector_index()[1].select("id"))
        n_touched = int(touched.count())
        if vi.get("n_appended", 0) + n_touched > self.REINDEX_FRACTION * max(
            1, vi.get("n_rows", 0)
        ):
            return _full()
        spark = self._client.spark
        if n_touched:
            touched.withColumn("epoch", F.lit(meta.version).cast("long")).write.mode(
                "append"
            ).parquet(_os.path.join(vi["path"], "tombstones"))
            delta = (
                base.join(touched, "id", "semi")
                .filter(F.col("embedding").isNotNull())
                .select("id", "embedding")
            )
            centroids = spark.read.parquet(_os.path.join(vi["path"], "centroids"))
            assigned = assign_to_centroids(
                delta, centroids, replicas=int(vi.get("replicas", 2)), method="arrow"
            )
            if vi.get("means") is not None:
                from .ann.quantize import build_codes

                assigned, _ = build_codes(assigned, means=[float(m) for m in vi["means"]])
            elif vi.get("sq4_lo") is not None:
                from .ann.quantize import build_codes4

                assigned, _ = build_codes4(
                    assigned, ranges=(list(vi["sq4_lo"]), list(vi["sq4_step"]))
                )
            elif vi.get("pq") is not None:
                assigned = self._encode_pq_delta(assigned, vi)
            assigned = assigned.withColumn("__epoch", F.lit(meta.version).cast("long"))
            append_ivf_postings(assigned, vi["path"])
        desc = {
            **vi,
            "version": meta.version,
            "epoch": meta.version,
            "n_appended": int(vi.get("n_appended", 0)) + n_touched,
        }
        self._store.catalog.mutate(
            self._store.name, lambda m: setattr(m, "vector_index", desc)
        )
        return desc

    def _pq_books(self, vi: dict) -> "list":
        """Codebooks persisted beside the layout (too big for the catalog
        JSON; the delta encoder and the query LUT both need them)."""
        import json as _json
        import os as _os

        with open(_os.path.join(vi["path"], "pq_books.json")) as f:
            return _json.load(f)

    def _encode_pq_delta(self, assigned: DataFrame, vi: dict) -> DataFrame:
        from .ann.pq import encode_pq

        return encode_pq(assigned, self._pq_books(vi))

    def _load_vector_index(self) -> tuple[DataFrame, DataFrame]:
        """(centroids, live postings) for the registered vector index.

        Epoch MVCC: keep rows with ``__epoch <= vi.version`` that are not
        superseded by a tombstone (``__epoch < dead_upto``). The tombstone
        join is an equi-join on id whose right side is bounded by
        ``REINDEX_FRACTION`` of the corpus (retrain resets it), and a fork
        child reading the parent's layout filters both sides to its own
        pinned version — shared files, no copies."""
        import os as _os

        from .layout import check_layout

        spark = self._client.spark
        vi = self._store.meta.vector_index
        check_layout(vi["path"], "ivf")
        centroids = spark.read.parquet(_os.path.join(vi["path"], "centroids"))
        postings = spark.read.parquet(_os.path.join(vi["path"], "postings"))
        if "__epoch" in postings.columns and vi.get("epoch") is not None:
            version = int(vi["version"])
            postings = postings.filter(F.col("__epoch") <= version)
            tomb_path = _os.path.join(vi["path"], "tombstones")
            if _os.path.isdir(tomb_path):
                dead = (
                    spark.read.parquet(tomb_path)
                    .filter(F.col("epoch") <= version)
                    .groupBy("id")
                    .agg(F.max("epoch").alias("__dead_upto"))
                )
                postings = (
                    postings.join(dead, "id", "left")
                    .filter(F.col("__dead_upto").isNull() | (F.col("__epoch") >= F.col("__dead_upto")))
                    .drop("__dead_upto")
                )
        return centroids, postings

    def _touched_ids(self, log_batch: DataFrame, live_ids: DataFrame) -> DataFrame:
        """Ids whose index entries a compaction batch invalidates: the
        id-keyed log rows plus — under predicate deletes — previously-live
        ids absent from the new (folded) base."""
        touched = log_batch.filter(F.col("id").isNotNull()).select("id").distinct()
        if "where_json" in log_batch.columns and (
            log_batch.filter(F.col("op") == "DELETE_WHERE").head() is not None
        ):
            base = self._store.read_base()
            gone = live_ids.distinct().join(base.select("id"), "id", "anti")
            touched = touched.unionByName(gone).distinct()
        return touched

    def _maintain_sparse_index(self, key: str, log_batch: DataFrame | None) -> dict:
        """Per-compaction sparse-index upkeep without a full rebuild — the
        same epoch/tombstone scheme as _maintain_vector_index: touched ids
        tombstone at the new epoch, the delta's postings append into the
        bucket-partitioned layout, and only drift past REINDEX_FRACTION
        (of indexed docs) rewrites from scratch. ``n_docs`` (the IDF
        denominator) refreshes with one narrow count over the new base."""
        import os as _os

        from .operators.sparse import explode_postings

        meta = self._store.meta
        si = (meta.sparse_indexes or {}).get(key)

        def _full() -> dict:
            return self.build_sparse_index(
                key, n_buckets=int(si.get("n_buckets", 64)) if si else 64
            )

        if si is None or si.get("epoch") is None or log_batch is None:
            return _full()
        own_prefix = _os.path.join(self._store.catalog.root, self._store.name) + _os.sep
        if not si["path"].startswith(own_prefix):
            return _full()  # fork child diverging from a parent-owned layout
        touched = self._touched_ids(log_batch, self._load_sparse_index(si).select("id"))
        n_touched = int(touched.count())
        if si.get("n_appended", 0) + n_touched > self.REINDEX_FRACTION * max(
            1, si.get("n_docs", 0)
        ):
            return _full()
        base = self._store.read_base()
        if n_touched:
            touched.withColumn("epoch", F.lit(meta.version).cast("long")).write.mode(
                "append"
            ).parquet(_os.path.join(si["path"], "tombstones"))
            delta = explode_postings(
                base.join(touched, "id", "semi").filter(F.col(key).isNotNull()),
                id_col="id",
                sparse_col=key,
            )
            n_buckets = int(si["n_buckets"])
            delta.withColumn("bucket", (F.col("idx") % n_buckets).cast("int")).withColumn(
                "__epoch", F.lit(meta.version).cast("long")
            ).repartition("bucket").write.mode("append").partitionBy("bucket").parquet(
                _os.path.join(si["path"], "postings")
            )
        n_docs = float(base.filter(F.col(key).isNotNull()).count())
        desc = {
            **si,
            "version": meta.version,
            "epoch": meta.version,
            "n_docs": n_docs,
            "n_appended": int(si.get("n_appended", 0)) + n_touched,
        }

        def _set_si(m):
            m.sparse_indexes = {**(m.sparse_indexes or {}), key: desc}

        self._store.catalog.mutate(self._store.name, _set_si)
        return desc

    def _load_sparse_index(self, si: dict) -> DataFrame:
        """Live posting rows for a registered sparse index (epoch MVCC like
        _load_vector_index), with the book-keeping column dropped so the
        shape matches what the search operators and tail union expect."""
        import os as _os

        from .layout import check_layout

        spark = self._client.spark
        # incremental layouts keep postings/ + tombstones/ as siblings (a
        # tombstone dir inside a partitioned tree breaks discovery); plain
        # layouts (pre-incremental / offline caches) are the bare dir
        root = si["path"]
        check_layout(root, "sparse")
        postings_dir = _os.path.join(root, "postings")
        postings = spark.read.parquet(postings_dir if _os.path.isdir(postings_dir) else root)
        if "__epoch" in postings.columns and si.get("epoch") is not None:
            version = int(si["version"])
            postings = postings.filter(F.col("__epoch") <= version)
            tomb_path = _os.path.join(si["path"], "tombstones")
            if _os.path.isdir(tomb_path):
                dead = (
                    spark.read.parquet(tomb_path)
                    .filter(F.col("epoch") <= version)
                    .groupBy("id")
                    .agg(F.max("epoch").alias("__dead_upto"))
                )
                postings = (
                    postings.join(dead, "id", "left")
                    .filter(
                        F.col("__dead_upto").isNull() | (F.col("__epoch") >= F.col("__dead_upto"))
                    )
                    .drop("__dead_upto")
                )
            postings = postings.drop("__epoch")
        return postings

    def build_sparse_index(self, key: str, n_buckets: int = 64) -> dict:
        """Build + register the term-bucket posting index over a
        SparseVector metadata column (the sparse-segment write of the
        reference's compaction; per-term posting reads,
        rust/index/src/sparse/reader.rs). ``search()`` sparse $knn terms on
        ``key`` then read only their buckets' partitions, with WAL-tail
        postings unioned in (the sparse_index_knn + sparse_log_knn merge,
        SURVEY §3.2)."""
        import os as _os

        from .operators.sparse import explode_postings, write_sparse_index

        if self._store.meta.log_paths:
            # refresh_indexes=False: this build IS the refresh
            self.compact(refresh_indexes=False)
        meta = self._store.meta
        base = self._store.read_base()
        if base is None or key not in base.columns:
            raise CollectionError(f"no SparseVector column {key!r} to index")
        postings = explode_postings(
            base.filter(F.col(key).isNotNull()), id_col="id", sparse_col=key
        ).withColumn("__epoch", F.lit(meta.version).cast("long"))
        path = _os.path.join(
            self._store.catalog.root, self._store.name, f"index_sparse_{key}", f"v{meta.version}"
        )
        write_sparse_index(postings, _os.path.join(path, "postings"), n_buckets=n_buckets)
        from .layout import stamp_layout

        stamp_layout(path, "sparse")
        n_docs = float(postings.select("id").distinct().count())
        desc = {
            "version": meta.version,
            "path": path,
            "n_buckets": int(n_buckets),
            "n_docs": n_docs,
            # incremental-maintenance state (same scheme as the vector
            # index: epoch-stamped rows, tombstones, drift counter)
            "epoch": meta.version,
            "n_appended": 0,
        }

        def _set_si(m):
            m.sparse_indexes = {**(m.sparse_indexes or {}), key: desc}

        self._store.catalog.mutate(self._store.name, _set_si)
        return desc

    @staticmethod
    def _rank_knn_keys(rank) -> dict[str, bool]:
        """Every $knn key a rank expression touches -> is_sparse."""
        out: dict[str, bool] = {}

        def walk(node):
            if isinstance(node, list):
                for e in node:
                    walk(e)
                return
            if not isinstance(node, dict):
                return
            for op, arg in node.items():
                if op == "$knn" and isinstance(arg, dict):
                    q = arg.get("query")
                    if isinstance(q, dict):
                        out[str(arg.get("key", "sparse")).lstrip("#")] = True
                    else:
                        out[str(arg.get("key") or "#embedding").lstrip("#")] = False
                else:
                    walk(arg)

        walk(rank)
        return out

    def _fresh_sparse_indexes(self, read_level: str, keys: set[str] | None = None) -> dict:
        """Fresh per-key sparse indexes as RankEvaluator specs, with
        WAL-tail postings merged in: index entries for touched ids are
        anti-joined away and the live tail records' postings unioned (the
        reference's parallel sparse_index_knn + sparse_log_knn). Pending
        predicate deletes fold in the same way — their matched ids come
        from one vectorized base scan (_predicate_matched_ids) and replay
        at seq position inside the bounded tail fold; n_docs refreshes at
        compaction like the reference's index-time stats. ``keys``
        restricts the work to the sparse columns a payload queries."""
        from .operators.sparse import explode_postings

        meta = self._store.meta
        if not meta.sparse_indexes:
            return {}
        if keys is not None and not (keys & set(meta.sparse_indexes)):
            return {}
        log = self._store.read_log() if read_level != "index_only" else None
        log, where_ops = self._split_where_ops(log)
        out: dict = {}
        touched: DataFrame | None = None
        if log is not None:
            touched = log.select("id").distinct()
            if where_ops:
                base = self._store.read_base()
                if base is not None:
                    touched = touched.unionByName(
                        self._predicate_matched_ids(base, where_ops)
                    ).distinct()
        for key, si in meta.sparse_indexes.items():
            if keys is not None and key not in keys:
                continue
            if si.get("version") != meta.version:
                continue
            postings = self._load_sparse_index(si)
            if touched is not None:
                base = self._store.read_base()
                base_t = base.join(touched, "id", "semi") if base is not None else None
                tail = self._fold(base_t, log, where_ops)
                live = postings.join(touched, "id", "anti")
                if key in tail.columns:
                    tail_postings = explode_postings(
                        tail.filter(F.col(key).isNotNull()), id_col="id", sparse_col=key
                    ).withColumn(
                        "bucket", (F.col("idx") % si["n_buckets"]).cast("int")
                    )
                    live = live.unionByName(tail_postings)
                postings = live
            out[key] = (postings, int(si["n_buckets"]), float(si["n_docs"]))
        return out

    # -- dedup index (minhash band table as a collection index tier) -----

    def build_dedup_index(
        self, num_perm: int = 16, bands: int = 4, n: int = 3, text_col: str = "document"
    ) -> dict:
        """Build + register the minhash LSH band table over ``text_col`` —
        near-duplicate detection as a first-class collection index
        (operators/dedup.write_minhash_index layout + content
        fingerprints). :meth:`find_near_duplicates` then matches any
        incoming batch in O(batch); compaction maintains the table
        incrementally (only changed documents re-shingle)."""
        import os as _os

        from .layout import stamp_layout
        from .operators.dedup import minhash_bands, minhash_signatures

        if self._store.meta.log_paths:
            self.compact(refresh_indexes=False)
        meta = self._store.meta
        base = self._store.read_base()
        if base is None or text_col not in base.columns:
            raise CollectionError(f"no text column {text_col!r} to index")
        records = base.filter(F.col(text_col).isNotNull()).select(
            "id", F.col(text_col).alias("document"), F.md5(F.col(text_col)).alias("fp")
        )
        rows = num_perm // bands
        bdf = (
            minhash_bands(
                minhash_signatures(records, num_perm, n, "document", "id"), bands, rows, "id"
            )
            .join(records.select("id", "fp"), "id")
            .withColumn("__epoch", F.lit(meta.version).cast("long"))
        )
        path = _os.path.join(
            self._store.catalog.root, self._store.name, f"index_dedup_{text_col}", f"v{meta.version}"
        )
        bdf.repartition("band").write.mode("overwrite").partitionBy("band").parquet(
            _os.path.join(path, "bands")
        )
        stamp_layout(path, "dedup")
        desc = {
            "version": meta.version,
            "path": path,
            "num_perm": int(num_perm),
            "bands": int(bands),
            "n": int(n),
            "text_col": text_col,
            # incremental-maintenance state (same epoch/tombstone scheme as
            # the vector and sparse indexes)
            "epoch": meta.version,
            "n_docs": int(records.count()),
            "n_appended": 0,
        }
        self._store.catalog.mutate(
            self._store.name,
            lambda m: m.metadata.__setitem__("__dedup_index__", desc),
        )
        return desc

    def _load_dedup_bands(self, desc: dict) -> DataFrame:
        """Live band rows for the registered dedup index — epoch MVCC like
        _load_vector_index/_load_sparse_index: rows with ``__epoch <=
        version`` not superseded by a tombstone. A legacy (v1, rewritten)
        layout without epoch columns reads as-is; a fork child filtering at
        its pinned version never sees the parent's later appends."""
        import os as _os

        from .layout import check_layout

        check_layout(desc["path"], "dedup")
        spark = self._client.spark
        bands = spark.read.parquet(_os.path.join(desc["path"], "bands"))
        if "__epoch" in bands.columns and desc.get("epoch") is not None:
            version = int(desc["version"])
            bands = bands.filter(F.col("__epoch") <= version)
            tomb_path = _os.path.join(desc["path"], "tombstones")
            if _os.path.isdir(tomb_path):
                dead = (
                    spark.read.parquet(tomb_path)
                    .filter(F.col("epoch") <= version)
                    .groupBy("id")
                    .agg(F.max("epoch").alias("__dead_upto"))
                )
                bands = (
                    bands.join(dead, "id", "left")
                    .filter(
                        F.col("__dead_upto").isNull()
                        | (F.col("__epoch") >= F.col("__dead_upto"))
                    )
                    .drop("__dead_upto")
                )
            bands = bands.drop("__epoch")
        return bands

    def _maintain_dedup_index(self) -> None:
        """Post-compaction upkeep, O(changed docs) in COMPUTE and WRITES:
        changed/new documents re-shingle and their band rows APPEND into
        the existing band-partitioned layout at the new epoch; stale ids
        (deleted, or superseded content fingerprints) get a tombstone row.
        Files written by earlier epochs are never rewritten — the same
        append-only MVCC discipline as the vector/sparse indexes. Drift
        past REINDEX_FRACTION of the indexed corpus rebuilds from scratch
        into a fresh layout dir."""
        import os as _os

        from .operators.dedup import minhash_bands, minhash_signatures

        meta = self._store.meta
        desc = meta.metadata.get("__dedup_index__")
        if desc is None or desc["version"] == meta.version:
            return
        base = self._store.read_base()
        text_col = desc["text_col"]
        if base is None or text_col not in base.columns:
            self._store.catalog.mutate(
                self._store.name,
                lambda m: m.metadata.pop("__dedup_index__", None) and None,
            )
            return

        def _full() -> None:
            self.build_dedup_index(
                num_perm=int(desc["num_perm"]),
                bands=int(desc["bands"]),
                n=int(desc["n"]),
                text_col=text_col,
            )

        own_prefix = _os.path.join(self._store.catalog.root, self._store.name) + _os.sep
        if desc.get("epoch") is None or not desc["path"].startswith(own_prefix):
            # legacy (v1) layout, or a fork child diverging from a
            # parent-owned layout: rebuild once into our own epoch layout
            return _full()
        records = base.filter(F.col(text_col).isNotNull()).select(
            "id", F.col(text_col).alias("document"), F.md5(F.col(text_col)).alias("fp")
        )
        live = self._load_dedup_bands(desc).select("id", "fp").distinct()
        todo = records.join(live, ["id", "fp"], "anti")
        dead = live.join(records.select("id", "fp"), ["id", "fp"], "anti").select("id").distinct()
        n_todo, n_dead = int(todo.count()), int(dead.count())
        n_touched = n_todo + n_dead
        if desc.get("n_appended", 0) + n_touched > self.REINDEX_FRACTION * max(
            1, desc.get("n_docs", 0)
        ):
            return _full()
        if n_dead:
            # a changed id is in dead (its old fingerprint left the base)
            # AND in todo: one tombstone at the new epoch kills its old
            # rows, the fresh append (same epoch, kept by the >= dead_upto
            # filter) replaces them
            dead.withColumn("epoch", F.lit(meta.version).cast("long")).write.mode(
                "append"
            ).parquet(_os.path.join(desc["path"], "tombstones"))
        if n_todo:
            rows = desc["num_perm"] // desc["bands"]
            fresh = (
                minhash_bands(
                    minhash_signatures(todo, desc["num_perm"], desc["n"], "document", "id"),
                    desc["bands"],
                    rows,
                    "id",
                )
                .join(todo.select("id", "fp"), "id")
                .withColumn("__epoch", F.lit(meta.version).cast("long"))
            )
            fresh.repartition("band").write.mode("append").partitionBy("band").parquet(
                _os.path.join(desc["path"], "bands")
            )
        new_desc = {
            **desc,
            "version": meta.version,
            "epoch": meta.version,
            "n_docs": int(records.count()),
            "n_appended": int(desc.get("n_appended", 0)) + n_touched,
        }
        self._store.catalog.mutate(
            self._store.name,
            lambda m: m.metadata.__setitem__("__dedup_index__", new_desc),
        )

    def find_near_duplicates(
        self, new_docs: DataFrame, threshold: float = 0.8,
        id_col: str = "id", text_col: str | None = None,
    ) -> DataFrame:
        """Near-dup pairs ``(id_a, id_b, jac)`` between an incoming batch
        and the collection (plus within-batch), via the registered dedup
        index — the pre-ingest gate of a training-data pipeline. Corpus
        text is hydrated only for candidate ids."""
        from .operators.dedup import minhash_incremental_pairs

        desc = self._store.meta.metadata.get("__dedup_index__")
        if desc is None:
            raise CollectionError("no dedup index; call build_dedup_index() first")
        if desc["version"] != self._store.meta.version or self._store.meta.log_paths:
            raise CollectionError(
                "dedup index is stale (WAL tail pending or version "
                f"{desc['version']} != {self._store.meta.version}); compact() refreshes it"
            )
        bands_df = self._load_dedup_bands(desc).drop("fp")
        base = self._store.read_base()
        corpus = base.select("id", F.col(desc["text_col"]).alias("document"))
        batch = new_docs.select(
            F.col(id_col).alias("id"),
            F.col(text_col or desc["text_col"]).alias("document"),
        )
        return minhash_incremental_pairs(
            batch,
            corpus,
            bands_df,
            threshold,
            num_perm=desc["num_perm"],
            bands=desc["bands"],
            n=desc["n"],
        )

    def semantic_near_duplicates(
        self, threshold: float = 0.05, method: str = "arrow"
    ) -> DataFrame:
        """SemDeDup decisions ``(id, group, cd, keep)`` served from the
        built vector index (Abbas et al. 2023): the IVF posting lists ARE
        the paper's clustering, so assignment costs nothing — within-list
        cosine pairs above ``threshold`` connect into duplicate groups and
        the member furthest from its centroid is kept. ``method="arrow"``
        (default) runs the per-cluster GEMM bulk tier; ``"expr"`` is the
        oracle-parity form. Like the minhash dedup index, the layout must
        be fresh (no pending WAL tail) so decisions cover exactly one
        collection version."""
        from .operators.dedup import semdedup_from_postings

        vi = self._store.meta.vector_index
        if vi is None:
            raise CollectionError("no vector index; call build_vector_index() first")
        if self._store.meta.log_paths:
            raise CollectionError(
                "vector index is stale (WAL tail pending); compact() refreshes it"
            )
        centroids, postings = self._load_vector_index()
        return semdedup_from_postings(
            postings.select("centroid_id", "id", "embedding"),
            centroids.select("centroid_id", "centroid"),
            threshold,
            method=method,
        )

    def build_tokenizer(
        self, n_merges: int = 256, max_words: int = 50_000, text_col: str = "document"
    ) -> dict:
        """Train and persist a FROZEN BPE merge table on the current state
        (operators/bpe.py) — the realistic LLM workflow: the tokenizer is
        trained once on a corpus snapshot and then applied unchanged as
        the corpus grows (re-training would silently change every token
        count downstream; the ``bpe_vocab`` attached function is the
        opposite tool — it re-learns at every compaction to TRACK drift).
        The merge table is config-sized, so it lives in the collection
        metadata like an embedding-function spec and any later process
        rebuilds the identical tokenizer."""
        from .operators.bpe import bpe_train

        state = self.snapshot()
        if state is None or text_col not in state.columns:
            raise CollectionError(f"no text column {text_col!r} to train a tokenizer on")
        docs = state.filter(F.col(text_col).isNotNull())
        merges = bpe_train(docs, n_merges, text_col=text_col, max_words=max_words)
        desc = {
            "merges": [[a, b] for a, b in merges],
            "text_col": text_col,
            "version": self._store.meta.version,
            "max_words": int(max_words),
        }
        self._store.catalog.mutate(
            self._store.name,
            lambda m: m.metadata.__setitem__("__tokenizer__", desc),
        )
        return desc

    def _tokenizer(self) -> tuple[list[tuple[str, str]], str]:
        desc = self._store.meta.metadata.get("__tokenizer__")
        if desc is None:
            raise CollectionError("no tokenizer; call build_tokenizer() first")
        return [tuple(m) for m in desc["merges"]], desc["text_col"]

    def tokenize(self, read_level: str = "index_and_wal") -> DataFrame:
        """``(id, bpe_tokens)`` for every document under the persisted
        frozen merge table (read-level aware, like ``count``)."""
        from .operators.bpe import bpe_tokenize

        merges, text_col = self._tokenizer()
        state = self.snapshot(read_level)
        if state is None:
            raise CollectionError("empty collection")
        return bpe_tokenize(state.filter(F.col(text_col).isNotNull()), merges, text_col=text_col)

    def token_counts(self, read_level: str = "index_and_wal") -> DataFrame:
        """``(id, n_words, n_bpe, head)`` under the persisted tokenizer —
        the per-document token-budget accounting a training pipeline reads
        before packing/mixing."""
        from .operators.bpe import bpe_token_counts

        merges, text_col = self._tokenizer()
        state = self.snapshot(read_level)
        if state is None:
            raise CollectionError("empty collection")
        return bpe_token_counts(state, merges, text_col=text_col)

    def build_fts_index(self, text_col: str = "document", n_buckets: int = 64) -> dict:
        """Build + register the trigram FTS posting index over ``text_col``
        (operators/fts.py; the reference's full-text segment,
        `rust/index/src/fulltext/types.rs`). ``get``/``query`` document
        filters with positive >= 3-char literals are then served as a
        partition-pruned candidate lookup + exact verify on the candidates
        only — never a full-text scan. Compaction maintains the postings
        incrementally (only changed documents re-trigram, appends only)."""
        import os as _os

        from .layout import stamp_layout
        from .operators.fts import doc_trigram_postings

        if self._store.meta.log_paths:
            self.compact(refresh_indexes=False)
        meta = self._store.meta
        base = self._store.read_base()
        if base is None or text_col not in base.columns:
            raise CollectionError(f"no text column {text_col!r} to index")
        records = base.filter(F.col(text_col).isNotNull()).select(
            "id", F.col(text_col).alias("document"), F.md5(F.col(text_col)).alias("fp")
        )
        postings = doc_trigram_postings(records, n_buckets).withColumn(
            "__epoch", F.lit(meta.version).cast("long")
        )
        path = _os.path.join(
            self._store.catalog.root, self._store.name, f"index_fts_{text_col}", f"v{meta.version}"
        )
        postings.repartition("bucket").write.mode("overwrite").partitionBy("bucket").parquet(
            _os.path.join(path, "postings")
        )
        records.select("id", "fp").withColumn(
            "__epoch", F.lit(meta.version).cast("long")
        ).write.mode("overwrite").parquet(_os.path.join(path, "fps"))
        stamp_layout(path, "fts")
        desc = {
            "version": meta.version,
            "path": path,
            "n_buckets": int(n_buckets),
            "text_col": text_col,
            "epoch": meta.version,
            "n_docs": int(records.count()),
            "n_appended": 0,
        }
        self._store.catalog.mutate(
            self._store.name,
            lambda m: m.metadata.__setitem__("__fts_index__", desc),
        )
        return desc

    def _load_fts_live(self, desc: dict, sub: str) -> DataFrame:
        """Epoch-MVCC live rows of an FTS layout piece (``postings`` or
        ``fps``) — same visibility rule as the dedup/sparse tiers: rows
        with ``__epoch <= version`` not superseded by a per-id tombstone."""
        import os as _os

        from .layout import check_layout

        check_layout(desc["path"], "fts")
        df = self._client.spark.read.parquet(_os.path.join(desc["path"], sub))
        version = int(desc["version"])
        df = df.filter(F.col("__epoch") <= version)
        tomb_path = _os.path.join(desc["path"], "tombstones")
        if _os.path.isdir(tomb_path):
            dead = (
                self._client.spark.read.parquet(tomb_path)
                .filter(F.col("epoch") <= version)
                .groupBy("id")
                .agg(F.max("epoch").alias("__dead_upto"))
            )
            df = (
                df.join(dead, "id", "left")
                .filter(
                    F.col("__dead_upto").isNull()
                    | (F.col("__epoch") >= F.col("__dead_upto"))
                )
                .drop("__dead_upto")
            )
        return df.drop("__epoch")

    def _maintain_fts_index(self) -> None:
        """Post-compaction upkeep, O(changed docs) in compute and writes —
        the dedup-tier maintenance pattern verbatim: changed/new documents
        re-trigram and APPEND into the bucket partitions at the new epoch,
        stale ids get a tombstone row, drift past REINDEX_FRACTION
        rebuilds."""
        import os as _os

        from .operators.fts import doc_trigram_postings

        meta = self._store.meta
        desc = meta.metadata.get("__fts_index__")
        if desc is None or desc["version"] == meta.version:
            return
        base = self._store.read_base()
        text_col = desc["text_col"]
        if base is None or text_col not in base.columns:
            self._store.catalog.mutate(
                self._store.name,
                lambda m: m.metadata.pop("__fts_index__", None) and None,
            )
            return
        own_prefix = _os.path.join(self._store.catalog.root, self._store.name) + _os.sep
        if not desc["path"].startswith(own_prefix):
            # fork child diverging from a parent-owned layout: own rebuild
            return self.build_fts_index(text_col, int(desc["n_buckets"])) and None
        records = base.filter(F.col(text_col).isNotNull()).select(
            "id", F.col(text_col).alias("document"), F.md5(F.col(text_col)).alias("fp")
        )
        live = self._load_fts_live(desc, "fps").select("id", "fp").distinct()
        todo = records.join(live, ["id", "fp"], "anti")
        dead = live.join(records.select("id", "fp"), ["id", "fp"], "anti").select("id").distinct()
        n_todo, n_dead = int(todo.count()), int(dead.count())
        n_touched = n_todo + n_dead
        if desc.get("n_appended", 0) + n_touched > self.REINDEX_FRACTION * max(
            1, desc.get("n_docs", 0)
        ):
            self.build_fts_index(text_col, int(desc["n_buckets"]))
            return
        if n_dead:
            dead.withColumn("epoch", F.lit(meta.version).cast("long")).write.mode(
                "append"
            ).parquet(_os.path.join(desc["path"], "tombstones"))
        if n_todo:
            doc_trigram_postings(todo, int(desc["n_buckets"])).withColumn(
                "__epoch", F.lit(meta.version).cast("long")
            ).repartition("bucket").write.mode("append").partitionBy("bucket").parquet(
                _os.path.join(desc["path"], "postings")
            )
            todo.select("id", "fp").withColumn(
                "__epoch", F.lit(meta.version).cast("long")
            ).write.mode("append").parquet(_os.path.join(desc["path"], "fps"))
        new_desc = {
            **desc,
            "version": meta.version,
            "epoch": meta.version,
            "n_docs": int(records.count()),
            "n_appended": int(desc.get("n_appended", 0)) + n_touched,
        }
        self._store.catalog.mutate(
            self._store.name,
            lambda m: m.metadata.__setitem__("__fts_index__", new_desc),
        )

    def _fts_candidates(self, where_document: dict) -> DataFrame | None:
        """Index-served candidate ids for a document filter, or None when
        the index can't help (absent, stale, or no positive >= 3-char
        literal in the tree). The candidate set is a SOUND superset of the
        base-side matches; WAL-touched ids union in so tail writes are
        re-checked exactly; the exact predicate always verifies."""
        from .operators.fts import contains_candidates, required_needles

        desc = self._store.meta.metadata.get("__fts_index__")
        if desc is None or desc["version"] != self._store.meta.version:
            return None
        needles = required_needles(where_document)
        if not needles:
            return None
        cands = contains_candidates(
            self._load_fts_live(desc, "postings"), needles, int(desc["n_buckets"])
        )
        log = self._store.read_log()
        if log is not None:
            cands = cands.unionByName(log.select("id").distinct()).distinct()
        return cands

    def snapshot_at(self, version: int) -> DataFrame:
        """Time travel: the compacted state as of ``version`` (old base
        versions stay on disk until :meth:`gc`; cross_version_persist
        analog of the reference's versioned collections)."""
        return self._store.read_base_version(version)

    def list_versions(self) -> list[int]:
        return self._store.list_base_versions()

    def gc(self, keep_last: int = 1, grace_seconds: float = 60.0) -> list[int]:
        """Remove old base versions, stale index layouts, and orphaned WAL
        batch dirs (`rust/garbage_collector/` analog); returns the base
        versions deleted.

        Ref-counted against EVERY collection in the catalog, so fork
        lineage pins shared state: a shallow-cloned child's meta references
        the parent's base part files, log batches, and index layouts by
        path, and anything referenced survives. Never removes the current
        version or the ``keep_last`` most recent. Reads at a pruned version
        fail with :class:`StaleReadError`. Local-FS implementation; a
        production deployment delegates to the table format's VACUUM with
        the same referenced-set rule.

        ``grace_seconds`` is a MARK-AND-SWEEP window, not an mtime check:
        a pass that finds an artifact unreferenced only *marks* it (in a
        ``.gc_marks.json`` sidecar); deletion happens on a pass running at
        least ``grace_seconds`` after the mark, and only if the artifact
        is still unreferenced then. This covers BOTH cross-process races:
        (a) an artifact written but not yet CAS-committed by another
        process (the orphan-grace rule of object-store GC — wal3 keeps a
        cutoff the same way), and (b) an artifact that became stale only
        moments ago — e.g. a base version superseded by a concurrent
        compaction while a reader that resolved it as head is still
        scanning it. An artifact-age cutoff misses (b): the old base dir's
        mtime is its creation time, arbitrarily far in the past.
        ``grace_seconds=0`` deletes in the same pass (tests use this for
        deterministic pruning).
        """
        import json as _json
        import os
        import shutil
        import time as _time

        grace = max(0.0, grace_seconds)
        now = _time.time()

        referenced: set[str] = set()
        log_referenced: set[str] = set()
        index_referenced: set[str] = set()
        for cname in self._store.catalog.list():
            m = self._store.catalog.get(cname)
            referenced.update(m.base_paths)
            log_referenced.update(m.log_paths)
            if m.vector_index:
                index_referenced.add(m.vector_index["path"])
            for si in (m.sparse_indexes or {}).values():
                index_referenced.add(si["path"])
            di = m.metadata.get("__dedup_index__")
            if di:
                index_referenced.add(di["path"])
            fi = m.metadata.get("__fts_index__")
            if fi:
                index_referenced.add(fi["path"])
        keep = set(self.list_versions()[-max(1, keep_last):])
        keep.add(self._store.meta.version)
        # candidate set: everything unreferenced RIGHT NOW, each tagged
        # with the base version it prunes (None for non-base artifacts)
        candidates: list[tuple[str, int | None]] = []
        for v in self.list_versions():
            path = self._store._dir("base", v)
            if v not in keep and path not in referenced:
                candidates.append((path, v))
        # WAL batch dirs left behind by compaction (compact() resets
        # log_paths but keeps files for forks that still reference them)
        for p in self._store.list_log_batch_dirs():
            if p not in log_referenced:
                candidates.append((p, None))
        # stale per-version index layouts (not referenced by any
        # collection's current descriptors — fork children may point at a
        # parent's old index)
        coll_dir = os.path.join(self._store.catalog.root, self._store.name)
        for sub in os.listdir(coll_dir) if os.path.isdir(coll_dir) else []:
            if not (
                sub == "index_vector"
                or sub.startswith("index_sparse_")
                or sub.startswith("index_dedup_")
                or sub.startswith("index_fts_")
            ):
                continue
            for vdir in os.listdir(os.path.join(coll_dir, sub)):
                p = os.path.join(coll_dir, sub, vdir)
                if p not in index_referenced:
                    candidates.append((p, None))
        # attached-function outputs: point-in-time outputs (statistics,
        # record_counter) of pruned versions go with them; revision_history
        # is the append-only pre-image archive and is always kept (the
        # reference's history collection is never GCed from under readers)
        attached = self.list_functions()
        for sub in os.listdir(coll_dir) if os.path.isdir(coll_dir) else []:
            if not sub.startswith("fn_"):
                continue
            if attached.get(sub[3:], {}).get("kind") == "revision_history":
                continue
            for vdir in os.listdir(os.path.join(coll_dir, sub)):
                if vdir.startswith("v") and vdir[1:].isdigit() and int(vdir[1:]) not in keep:
                    candidates.append((os.path.join(coll_dir, sub, vdir), None))
        # mark-and-sweep: delete only what an earlier pass (>= grace ago)
        # already found unreferenced and that is STILL unreferenced now;
        # everything else (re-)marks. Paths that regained a reference fall
        # out of the candidate set and lose their mark automatically.
        marks_path = os.path.join(coll_dir, ".gc_marks.json")
        try:
            with open(marks_path) as f:
                marks = {k: float(v) for k, v in _json.load(f).items()}
        except (OSError, ValueError):
            marks = {}
        deleted: list[int] = []
        new_marks: dict[str, float] = {}
        for path, ver in candidates:
            first_seen = marks.get(path, now)
            if now - first_seen >= grace:
                # ignore_errors: a concurrent gc in another process may
                # sweep the same path first
                shutil.rmtree(path, ignore_errors=True)
                if ver is not None:
                    deleted.append(ver)
            else:
                new_marks[path] = first_seen
        if new_marks:
            os.makedirs(coll_dir, exist_ok=True)
            tmp = f"{marks_path}.tmp.{os.getpid()}"
            with open(tmp, "w") as f:
                _json.dump(new_marks, f)
            os.replace(tmp, marks_path)
        elif os.path.exists(marks_path):
            try:
                os.remove(marks_path)
            except OSError:
                pass
        return sorted(deleted)

    def fork(self, name: str) -> "Collection":
        """Zero-copy clone at the current version (Collection.py:329):
        the child references the parent's part files; new writes diverge."""
        parent = self._store.meta
        # NumForks (quota/mod.rs:311): forks share the root's base part
        # files, so count live collections referencing any of them
        shared = set(parent.base_paths)
        num_forks = sum(
            1
            for other in self._store.catalog.list()
            if other != self._store.name
            and shared & set(self._store.catalog.get(other).base_paths)
        )
        self._client._enforce(
            Action.FORK_COLLECTION, collection_name=name, num_forks=num_forks + 1
        )
        child = CollectionMeta(
            name=self._client._scoped(name),
            id=uuid.uuid4().hex,
            dimension=parent.dimension,
            space=parent.space,
            version=parent.version,
            metadata=dict(parent.metadata),
            base_paths=list(parent.base_paths),
            log_paths=list(parent.log_paths),
            log_position=parent.log_position,
            schema=parent.schema,
            # zero-copy includes the indexes: the child serves from the
            # parent's index files until its own writes diverge + compact
            vector_index=dict(parent.vector_index) if parent.vector_index else None,
            sparse_indexes={k: dict(v) for k, v in (parent.sparse_indexes or {}).items()},
        )
        self._store.catalog.create(child)
        return Collection(self._client, self._client._scoped(name))

    def copy_to(
        self,
        name: str,
        where: dict | None = None,
        where_document: dict | None = None,
        client: "Client | None" = None,
    ) -> "Collection":
        """MATERIALIZED copy (vs ``fork``'s zero-copy shared-files clone):
        config + records flow into a fresh collection, optionally filtered
        to a subset. The reference CLI's copy command pages ``get()`` +
        ``add()`` through the driver at ``--batch 100``
        (`rust/cli/src/commands/copy.rs:81,298`); here the snapshot flows
        as ONE distributed ``add_records`` write — 100 TB copies without a
        driver loop. Pass ``client`` to copy across stores (the
        local<->cloud direction of the CLI)."""
        dst_client = client or self._client
        meta = self._store.meta
        from .schema import Schema

        dst = dst_client.create_collection(
            name,
            dimension=meta.dimension,
            space=meta.space,
            metadata=dict(meta.metadata),
            schema=Schema.from_dict(meta.schema),
        )
        snap = self.snapshot()
        if snap is None:
            return dst
        self._validate_indexed(where, where_document)
        if where is not None:
            snap = snap.filter(where_to_column(where, known_keys=frozenset(snap.columns)))
        if where_document is not None:
            cands = self._fts_candidates(where_document)
            if cands is not None:
                snap = snap.join(cands, "id", "semi")
            snap = snap.filter(where_doc_to_column(where_document))
        records = snap.drop("seq_id", "op", "where_json", "offset_id")
        if records.isEmpty():
            return dst
        dst.add_records(records)
        return dst

    # ------------------------------------------------------------------
    # read surface
    # ------------------------------------------------------------------

    def count(self, read_level: str = "index_and_wal") -> int:
        snap = self.snapshot(read_level)
        return 0 if snap is None else snap.count()

    def peek(self, limit: int = 10) -> list[dict]:
        return self.get(limit=limit)

    def get(
        self,
        ids: Sequence[str] | None = None,
        where: dict | None = None,
        where_document: dict | None = None,
        limit: int | None = None,
        offset: int = 0,
        include: Sequence[str] = ("documents", "metadatas"),
        read_level: str = "index_and_wal",
    ) -> list[dict]:
        self._client._enforce(
            Action.GET, query_ids=ids, where=where, where_document=where_document,
            limit=limit,
        )
        self._validate_indexed(where, where_document)
        snap = self.snapshot(read_level)
        if snap is None:
            return []
        if ids is not None:
            snap = snap.filter(F.col("id").isin([str(i) for i in ids]))
        if where is not None:
            snap = snap.filter(where_to_column(where, known_keys=frozenset(snap.columns)))
        if where_document is not None:
            cands = self._fts_candidates(where_document)
            if cands is not None:
                # index-served prefilter: exact predicate verifies the
                # (sound superset) candidates only — no full-text scan
                snap = snap.join(cands, "id", "semi")
            snap = snap.filter(where_doc_to_column(where_document))
        # un-ranked gets are ordered by the internal insertion offset, not
        # the user string id ("10" < "2" lexicographically) — limit.rs:23-36
        if "offset_id" in snap.columns:
            snap = snap.orderBy(F.col("offset_id").asc_nulls_first(), F.col("id").asc())
        else:
            snap = snap.orderBy("id")
        if offset:
            snap = snap.offset(offset)
        if limit is not None:
            snap = snap.limit(limit)
        drop = {"embeddings": "embedding", "documents": "document", "uris": "uri"}
        hidden = {v for k, v in drop.items() if k not in include} | {"offset_id"}
        if "metadatas" not in include:
            # include gates metadata too (GetResult carries metadatas only
            # when asked, chromadb/api/types.py:585-608)
            hidden |= {c for c in snap.columns if c not in ("id", "embedding", "document", "uri")}
        cols = [c for c in snap.columns if c not in hidden]
        return [r.asDict(recursive=True) for r in snap.select(*cols).collect()]

    _QUERY_INCLUDE_DEFAULT = ("metadatas", "documents", "distances")
    _INTERNAL_COLS = frozenset({"id", "embedding", "document", "uri", "offset_id"})

    def query(
        self,
        query_embeddings: Sequence[Sequence[float]] | None = None,
        n_results: int = 10,
        ids: Sequence[str] | None = None,
        where: dict | None = None,
        where_document: dict | None = None,
        read_level: str = "index_and_wal",
        query_texts: Sequence[str] | None = None,
        include: Sequence[str] = _QUERY_INCLUDE_DEFAULT,
        nprobe: int | None = None,
    ) -> dict:
        """Batch KNN; returns the column-major QueryResult shape
        (chromadb/api/types.py:619-651): lists-of-lists per query for
        ``ids`` plus every field named in ``include`` (``distances``,
        ``documents``, ``metadatas``, ``embeddings``, ``uris``). Winners-only
        hydration: payload fields are joined for the top-k ids only (the
        KnnProjection contract, knn_projection.rs:61). An empty collection
        yields one empty list PER QUERY in every field. ``query_texts`` are
        embedded client-side with the collection's attached embedding
        function (Collection.py:212).

        When a fresh vector index exists (build_vector_index), the search
        probes ``nprobe`` posting lists (default: all — exact within the
        index; tune down for speed) and brute-forces only WAL-tail records,
        merging the two top-k streams (the reference's parallel
        knn_log + knn_hnsw -> knn_merge pipeline, SURVEY §3.2). Falls back
        to the exact scan when no fresh index exists or predicate deletes
        are pending in the tail."""
        self._client._enforce(
            Action.QUERY, query_embeddings=query_embeddings, query_ids=ids,
            where=where, where_document=where_document, n_results=n_results,
        )
        if query_embeddings is None:
            if query_texts is None:
                raise CollectionError("one of query_embeddings / query_texts is required")
            ef = self._embedding_function()
            if ef is None:
                raise CollectionError("query_texts requires an attached embedding function")
            query_embeddings = ef(list(query_texts))
        elif query_texts is not None:
            raise CollectionError("pass query_embeddings or query_texts, not both")
        include = tuple(include)
        bad = set(include) - {"distances", "documents", "metadatas", "embeddings", "uris"}
        if bad:
            raise CollectionError(f"unknown include fields: {sorted(bad)}")
        nq = len(query_embeddings)
        empty: dict[str, list] = {"ids": [[] for _ in range(nq)]}
        for f in include:
            empty[f] = [[] for _ in range(nq)]
        self._validate_indexed(where, where_document, knn=True)
        snap = self.snapshot(read_level)
        if snap is None:
            return empty
        filtered = snap
        if ids is not None:
            filtered = filtered.filter(F.col("id").isin([str(i) for i in ids]))
        if where is not None:
            filtered = filtered.filter(
                where_to_column(where, known_keys=frozenset(filtered.columns))
            )
        if where_document is not None:
            cands = self._fts_candidates(where_document)
            if cands is not None:
                filtered = filtered.join(cands, "id", "semi")
            filtered = filtered.filter(where_doc_to_column(where_document))
        spark = self._client.spark
        qdf = spark.createDataFrame(
            [(i, [float(x) for x in q]) for i, q in enumerate(query_embeddings)],
            "query_id INT, embedding ARRAY<FLOAT>",
        )
        has_filters = ids is not None or where is not None or where_document is not None
        top = self._query_via_index(
            qdf, n_results, nprobe, read_level,
            allowed=filtered.select("id") if has_filters else None,
        )
        if top is None:
            top = exact_knn(filtered, qdf, k=n_results, space=self._store.meta.space)
        snap = filtered
        need_payload = bool(set(include) - {"distances"})
        if need_payload:
            # winners-only hydration: the top-k side is tiny — broadcast it
            # as the BUILD side of an inner join (winner ids are by
            # construction a subset of the snapshot, so inner == left, and
            # a left join could not broadcast its left/build side)
            winners = snap.join(F.broadcast(top), "id", "inner")
        else:
            winners = top
        rows = [r.asDict(recursive=True) for r in winners.collect()]
        meta_cols = [c for c in snap.columns if c not in self._INTERNAL_COLS]
        out = empty
        for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
            q = r["query_id"]
            out["ids"][q].append(r["id"])
            if "distances" in include:
                out["distances"][q].append(r["dist"])
            if "documents" in include:
                out["documents"][q].append(r["document"])
            if "uris" in include:
                out["uris"][q].append(r["uri"])
            if "embeddings" in include:
                emb = r["embedding"]
                out["embeddings"][q].append(list(emb) if emb is not None else None)
            if "metadatas" in include:
                md = {k: r[k] for k in meta_cols if r[k] is not None}
                out["metadatas"][q].append(md or None)
        return out

    def _embed_rank_queries(self, rank):
        """String $knn queries embed client-side with the collection's
        attached embedding function (Collection.py:447-449 embeds text Knn
        queries before the search payload ships)."""
        if isinstance(rank, list):
            return [self._embed_rank_queries(e) for e in rank]
        if not isinstance(rank, dict):
            return rank
        out = {}
        for op, arg in rank.items():
            if op == "$knn" and isinstance(arg, dict) and isinstance(arg.get("query"), str):
                ef = self._embedding_function()
                if ef is None:
                    raise CollectionError(
                        "string $knn query requires an attached embedding function"
                    )
                out[op] = {**arg, "query": [float(x) for x in ef([arg["query"]])[0]]}
            else:
                out[op] = self._embed_rank_queries(arg)
        return out

    def _query_via_index(
        self,
        qdf: DataFrame,
        k: int,
        nprobe: int | None,
        read_level: str,
        allowed: DataFrame | None,
    ) -> DataFrame | None:
        """Index-side KNN + WAL-tail brute force + knn_merge; None when the
        exact path must run instead (no fresh index or bounded read level).

        Pending predicate deletes do NOT abandon the index: for ids the
        id-keyed tail never touches, base state IS their state at every
        tail seq, so each predicate's matched set is exact when evaluated
        vectorized against base (one pushdown-able filter scan) — those ids
        join the excluded set and the bounded tail fold, which replays the
        predicate at its seq position for the touched groups."""
        meta = self._store.meta
        vi = meta.vector_index
        if vi is None or vi.get("version") != meta.version:
            return None
        if read_level not in ("index_only", "index_and_wal"):
            return None
        from .ann.ivf import ivf_search
        from .operators.knn import knn_merge

        log = self._store.read_log() if read_level != "index_only" else None
        log, where_ops = self._split_where_ops(log)
        centroids, postings = self._load_vector_index()
        probes = int(nprobe or vi["n_lists"])
        if allowed is not None and nprobe is not None and vi.get("n_rows"):
            # filter-before-ANN thins every probed list by the filter's
            # selectivity, so a fixed probe budget quietly loses recall
            # (measured at 1M: 10%-selective filters need ~4x the probes,
            # BASELINE.md round-6 filtered table). Scale the budget so the
            # expected CANDIDATE count matches what the caller asked for;
            # the one bounded count here prices a recall cliff away.
            import math as _math

            sel = allowed.count() / max(1, int(vi["n_rows"]))
            if 0.0 < sel < 1.0:
                probes = max(probes, min(int(vi["n_lists"]), _math.ceil(probes / sel)))
        touched = log.select("id").distinct() if log is not None else None
        if where_ops:
            matched = self._predicate_matched_ids(self._store.read_base(), where_ops)
            touched = matched if touched is None else touched.unionByName(matched).distinct()
        if vi.get("means") is not None:
            from .ann.quantize import ivf_quantized_search

            index_top = ivf_quantized_search(
                centroids,
                postings,
                qdf,
                [float(m) for m in vi["means"]],
                k=k,
                nprobe=probes,
                rerank_factor=int(vi.get("rerank_factor", 24)),
                space=vi.get("space", meta.space),
                allowed_ids=allowed,
                excluded_ids=touched,
            )
        elif vi.get("sq4_lo") is not None:
            from .ann.quantize import ivf_sq4_search

            index_top = ivf_sq4_search(
                centroids,
                postings,
                qdf,
                (list(vi["sq4_lo"]), list(vi["sq4_step"])),
                k=k,
                nprobe=probes,
                rerank_factor=int(vi.get("rerank_factor", 4)),
                space=vi.get("space", meta.space),
                allowed_ids=allowed,
                excluded_ids=touched,
            )
        elif vi.get("pq") is not None:
            from .ann.pq import ivf_pq_search

            index_top = ivf_pq_search(
                centroids,
                postings,
                qdf,
                self._pq_books(vi),
                k=k,
                nprobe=probes,
                rerank_factor=int(vi.get("rerank_factor", 8)),
                space=vi.get("space", meta.space),
                allowed_ids=allowed,
                excluded_ids=touched,
            )
        else:
            index_top = ivf_search(
                centroids,
                postings,
                qdf,
                k=k,
                nprobe=probes,
                space=vi.get("space", meta.space),
                allowed_ids=allowed,
                excluded_ids=touched,
            )
        if touched is None:
            return index_top
        # WAL tail: materialize ONLY the touched id-groups (base semi-join),
        # brute-force them, then merge the two top-k streams; pending
        # predicate deletes replay inside the bounded fold
        base = self._store.read_base()
        base_t = base.join(touched, "id", "semi") if base is not None else None
        tail = self._fold(base_t, log, where_ops)
        tail = tail.filter(F.col("embedding").isNotNull())
        if allowed is not None:
            tail = tail.join(allowed, "id", "semi")
        tail_top = exact_knn(tail, qdf, k=k, space=meta.space)
        return knn_merge([index_top, tail_top], k)

    @staticmethod
    def _knn_out_schema(qdf: DataFrame) -> T.StructType:
        """Empty-result schema for query_batch: query_id keeps the caller's
        type (string ids and long ids both flow through unchanged)."""
        return T.StructType(
            [
                qdf.schema["query_id"],
                T.StructField("id", T.StringType()),
                T.StructField("dist", T.DoubleType()),
                T.StructField("rank", T.IntegerType()),
            ]
        )

    def query_batch(
        self,
        queries: DataFrame,
        n_results: int = 10,
        where: dict | None = None,
        where_document: dict | None = None,
        read_level: str = "index_and_wal",
        nprobe: int | None = None,
        query_id_col: str = "query_id",
        query_vec_col: str = "embedding",
    ) -> DataFrame:
        """Distributed KNN join: a DataFrame of query vectors against the
        collection, returning ``(query_id, id, dist, rank)`` — the
        100-TB-side twin of :meth:`query` (which mirrors the reference's
        list-typed client API). No query row ever reaches the driver, so
        the batch can be another table (the classic similarity join).

        Served by the fresh vector index when one exists (same
        nprobe-pruned pipeline + WAL-tail merge as :meth:`query`), else by
        the exact scan. Predicates restrict the candidate set before the
        index/exact search (filter-before-ANN, knn_filter.rs).

        Scale note: queries stay distributed through the centroid
        assignment (centroids are the broadcast side); the probed-list join
        broadcasts ``queries × nprobe`` rows, so chunk batches beyond ~10M
        probe pairs (or lower nprobe) rather than raising the broadcast
        ceiling."""
        self._client._enforce(Action.QUERY, n_results=n_results, where=where,
                              where_document=where_document)
        self._validate_indexed(where, where_document, knn=True)
        qdf = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("embedding"),
        )
        allowed = None
        if where is not None or where_document is not None:
            snap_f = self.snapshot(read_level)
            if snap_f is None:
                return qdf.sparkSession.createDataFrame([], self._knn_out_schema(qdf))
            if where is not None:
                snap_f = snap_f.filter(
                    where_to_column(where, known_keys=frozenset(snap_f.columns))
                )
            if where_document is not None:
                snap_f = snap_f.filter(where_doc_to_column(where_document))
            allowed = snap_f.select("id")
        via_index = self._query_via_index(qdf, n_results, nprobe, read_level, allowed)
        if via_index is not None:
            return via_index
        snap = self.snapshot(read_level)
        if snap is None:
            return qdf.sparkSession.createDataFrame([], self._knn_out_schema(qdf))
        cand = snap.join(allowed, "id", "semi") if allowed is not None else snap
        cand = cand.filter(F.col("embedding").isNotNull())
        return exact_knn(cand, qdf, k=n_results, space=self._store.meta.space)

    def sparse_query_batch(
        self,
        queries: DataFrame,
        key: str = "sparse",
        n_results: int = 10,
        read_level: str = "index_and_wal",
        idf: bool = True,
        query_id_col: str = "query_id",
        query_vec_col: str | None = None,
        prune_buckets: bool | str = "auto",
        prune_threshold: int = 1024,
    ) -> DataFrame:
        """Distributed sparse retrieval join: a DataFrame of SparseVector
        queries against the collection's ``key`` column, returning
        ``(query_id, id, score)`` top-``n_results`` per query by (optionally
        IDF-scaled) dot product — the BM25-style twin of
        :meth:`query_batch` for lexical/learned-sparse retrieval at scale
        (hard-negative mining, cross-corpus linking).

        Served by the fresh persisted term-bucket index (with WAL-tail
        postings merged) when one exists, else by inline postings exploded
        from the snapshot. ``prune_buckets`` controls the driver-side
        distinct-term collect that turns the batch vocabulary into
        partition filters: ``"auto"`` (default) prunes only when the batch
        holds <= ``prune_threshold`` queries (checked with a bounded
        ``limit().count()``, never a full count) — a huge batch's
        vocabulary approaches the whole term space, so the collect would
        cost an unbounded driver round-trip to prune nothing. ``True`` /
        ``False`` force either side. Scale note: query postings are the
        broadcast side of the scoring join; chunk batches whose exploded
        postings exceed broadcast size."""
        from .operators.sparse import _dot_topk, explode_postings, sparse_index_topk

        self._client._enforce(Action.QUERY, n_results=n_results)
        qdf = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col or key).alias("__q"),
        )
        specs = self._fresh_sparse_indexes(read_level, keys={key})
        if key in specs:
            postings, n_buckets, n_docs = specs[key]
            if prune_buckets == "auto":
                prune_buckets = (
                    qdf.limit(prune_threshold + 1).count() <= prune_threshold
                )
            return sparse_index_topk(
                postings,
                qdf,
                k=n_results,
                n_buckets=n_buckets,
                sparse_col="__q",
                idf=idf,
                n_docs=n_docs,
                query_indices=None if prune_buckets else list(range(n_buckets)),
            )
        snap = self.snapshot(read_level)
        if snap is None or key not in snap.columns:
            return qdf.sparkSession.createDataFrame(
                [],
                T.StructType(
                    [
                        qdf.schema["query_id"],
                        T.StructField("id", T.StringType()),
                        T.StructField("score", T.DoubleType()),
                    ]
                ),
            )
        postings = explode_postings(snap.filter(F.col(key).isNotNull()), sparse_col=key)
        qpost = explode_postings(
            qdf, id_col="query_id", sparse_col="__q"
        ).withColumnsRenamed({"id": "query_id", "doc_w": "q_w"})
        return _dot_topk(
            postings, qpost, n_results, 6, idf_from=postings if idf else None
        )

    def hybrid_query_batch(
        self,
        dense_queries: DataFrame,
        sparse_queries: DataFrame,
        key: str = "sparse",
        n_results: int = 10,
        rrf_k: int = 60,
        per_side_limit: int = 100,
        read_level: str = "index_and_wal",
        nprobe: int | None = None,
        idf: bool = True,
    ) -> DataFrame:
        """Reciprocal-rank fusion of the dense and sparse distributed
        retrieval joins — batch hybrid search with no driver-side query
        lists. Both query frames carry ``query_id`` (shared id space) plus
        their vector column; returns ``(query_id, id, score)`` top
        ``n_results`` per query, reference Rrf semantics
        (operator.py:1144-1238 desugar): score =
        −Σ 1/(rrf_k + rank0), a side that missed a record contributes
        its ``per_side_limit`` default rank, ascending-is-better.

        Each side retrieves its own top ``per_side_limit`` candidates
        through the index-served batch paths; the fusion join touches only
        ``n_queries × per_side_limit`` rows per side."""
        from .operators.topk import topk_per_group

        dense = self.query_batch(
            dense_queries, n_results=per_side_limit, read_level=read_level, nprobe=nprobe
        ).select("query_id", "id", (F.col("rank") - 1).cast("double").alias("__d0"))
        sp = self.sparse_query_batch(
            sparse_queries, key=key, n_results=per_side_limit,
            read_level=read_level, idf=idf,
        )
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("id").asc())
        sp = sp.select(
            "query_id", "id", (F.row_number().over(w) - 1).cast("double").alias("__s0")
        )
        default = float(per_side_limit)
        fused = dense.join(sp, ["query_id", "id"], "full").select(
            "query_id",
            "id",
            (
                -(
                    1.0 / (F.lit(float(rrf_k)) + F.coalesce(F.col("__d0"), F.lit(default)))
                    + 1.0 / (F.lit(float(rrf_k)) + F.coalesce(F.col("__s0"), F.lit(default)))
                )
            ).alias("score"),
        )
        return topk_per_group(
            fused, ["query_id"], [F.col("score").asc(), F.col("id").asc()], n_results
        )

    def search(self, read_level: str = "index_and_wal", **payload) -> DataFrame:
        """Hybrid search (Search payload of SURVEY §3.2) as a DataFrame."""
        self._client._enforce(
            Action.SEARCH,
            where=payload.get("where"),
            where_document=payload.get("where_document"),
            rank=payload.get("rank"),
            limit=(payload.get("limit") or {}).get("limit")
            if isinstance(payload.get("limit"), dict)
            else payload.get("limit"),
        )
        self._validate_indexed(payload.get("where"), payload.get("where_document"))
        payload = dict(payload)
        if payload.get("rank") is not None:
            payload["rank"] = self._embed_rank_queries(payload["rank"])
        rank_keys = self._rank_knn_keys(payload.get("rank"))
        snap = self.snapshot(read_level)
        if snap is None:
            # reference semantics: an empty collection yields an empty
            # SearchResult, not an error — run the pipeline over an empty
            # record frame carrying the standard record schema plus any
            # column the rank expression references (sparse keys /
            # alternate dense vector keys)
            from .sparse_vector import SPARSE_VECTOR_TYPE

            fields = [
                T.StructField("id", T.StringType()),
                T.StructField("offset_id", T.LongType()),
                T.StructField("embedding", T.ArrayType(T.FloatType())),
                T.StructField("document", T.StringType()),
                T.StructField("uri", T.StringType()),
            ]
            standard = {f.name for f in fields}
            for key, is_sparse in rank_keys.items():
                if key not in standard:
                    fields.append(
                        T.StructField(
                            key, SPARSE_VECTOR_TYPE if is_sparse else T.ArrayType(T.FloatType())
                        )
                    )
            snap = self._client.spark.createDataFrame([], T.StructType(fields))
        sparse_keys = {k for k, s in rank_keys.items() if s}
        wd = payload.get("where_document")
        return search_op(
            snap,
            default_space=self._store.meta.space,
            offset_col="offset_id" if "offset_id" in snap.columns else None,
            sparse_index=self._fresh_sparse_indexes(read_level, keys=sparse_keys)
            if sparse_keys
            else {},
            doc_candidates=self._fts_candidates(wd) if wd is not None else None,
            **payload,
        )

    # ------------------------------------------------------------------
    # conditional transactions
    # ------------------------------------------------------------------

    def transaction(self) -> "CollectionTransaction":
        """Begin a read-set-validated optimistic transaction
        (`chromadb/api/__init__.py:320-450`)."""
        return CollectionTransaction(self)


class ConditionalWriteConflictError(CollectionError):
    """A record this transaction writes was concurrently written."""


class CollectionTransaction:
    """Optimistic conditional transaction: reads record a read-set, writes
    are buffered; commit validates no concurrent write touched the read- or
    write-set since begin (the Delta optimistic-concurrency analog of the
    reference's conditional transaction,
    `chromadb/api/__init__.py:320-450`, `ConditionalCommitResult`
    `chromadb/api/types.py:791`). Conflict granularity is per record id via
    the WAL seq cursor — exactly the log-position scouting the reference
    frontend does (`service_based_frontend.rs:2833-2852`)."""

    def __init__(self, collection: Collection) -> None:
        self._coll = collection
        meta = collection._store.meta
        self._begin_pos = meta.log_position
        self._begin_version = meta.version
        self._read_ids: set[str] = set()
        self._buffer: list[tuple[str, tuple]] = []
        self._record_count = 0
        self._done = False

    def _check_open(self) -> None:
        if self._done:
            raise CollectionError("transaction already committed")

    def get(self, **kwargs) -> list[dict]:
        self._check_open()
        rows = self._coll.get(**kwargs)
        if kwargs.get("ids") is not None:
            self._read_ids.update(str(i) for i in kwargs["ids"])
        self._read_ids.update(r["id"] for r in rows)
        return rows

    def _buffered(self, op: str, ids, *payload) -> bool:
        self._check_open()
        self._buffer.append((op, (list(ids), *payload)))
        self._record_count += len(ids)
        return True

    def add(self, ids, embeddings=None, documents=None, uris=None, metadatas=None) -> bool:
        return self._buffered("add", ids, embeddings, documents, uris, metadatas)

    def update(self, ids, embeddings=None, documents=None, uris=None, metadatas=None) -> bool:
        return self._buffered("update", ids, embeddings, documents, uris, metadatas)

    def upsert(self, ids, embeddings=None, documents=None, uris=None, metadatas=None) -> bool:
        return self._buffered("upsert", ids, embeddings, documents, uris, metadatas)

    def delete(self, ids) -> bool:
        return self._buffered("delete", ids, None, None, None, None)

    def commit(self) -> dict:
        """Validate and apply; returns ``{first_inserted_record_offset,
        record_count}`` (ConditionalCommitResult shape). Raises
        :class:`StaleReadError` / :class:`ConditionalWriteConflictError` on
        conflict — callers retry with backoff, as the reference client does.

        Cross-process window: validation pins the fresh log position and the
        FIRST buffered append CAS-requires it unchanged (strict — no seq
        re-basing), so any foreign write landing between validation and
        apply forces a silent re-validate + retry here rather than slipping
        past the conflict check. Appends between this transaction's own ops
        re-base normally; a foreign write interleaving exactly there is the
        one residual (sub-millisecond) unvalidated window."""
        self._check_open()
        for _ in range(10):
            meta = self._validate()
            first_offset = meta.log_position
            self._coll._txn_expect_pos = int(meta.log_position)
            try:
                for op, (ids, *payload) in self._buffer:
                    if op == "delete":
                        self._coll.delete(ids)
                    else:
                        getattr(self._coll, op)(ids, *payload)
            except _TxnCursorMoved:
                continue  # nothing applied; re-validate against the fresh tail
            finally:
                self._coll._txn_expect_pos = None
            self._done = True
            return {
                "first_inserted_record_offset": first_offset,
                "record_count": self._record_count,
            }
        raise ConditionalWriteConflictError(
            "conditional transaction lost its commit race 10 times"
        )

    def _validate(self) -> "CollectionMeta":
        """The begin-snapshot conflict checks against fresh state; returns
        the fresh meta whose log position the apply phase pins."""
        store = self._coll._store
        meta = store.meta
        write_ids = {str(i) for op, (ids, *_) in self._buffer for i in ids}
        if meta.version != self._begin_version:
            # compaction consumed the log tail; per-id validation impossible
            raise StaleReadError(
                f"collection compacted during transaction (v{self._begin_version}"
                f" -> v{meta.version})"
            )
        if meta.log_position != self._begin_pos:
            # Distributed conflict check: the log tail since begin_pos may be
            # arbitrarily large under concurrent bulk ingest, so it is NEVER
            # collected — the txn's own (bounded, list-API-sized) read/write
            # id sets are broadcast against it and only <=5 exemplar ids per
            # conflict kind reach the driver (same shape as add()'s dup
            # check). Write conflicts take precedence via the sort.
            probe = sorted(write_ids | self._read_ids)
            if probe:
                spark = self._coll._client.spark
                tail = store.read_log().filter(F.col("seq_id") >= self._begin_pos).select("id")
                ids_df = spark.createDataFrame(
                    [(i, i in write_ids) for i in probe], "id STRING, is_write BOOLEAN"
                )
                hits = (
                    tail.join(F.broadcast(ids_df), "id")
                    .select("id", "is_write")
                    .distinct()
                    .orderBy(F.col("is_write").desc(), "id")
                    .limit(6)
                    .collect()
                )
                w_hits = [r["id"] for r in hits if r["is_write"]][:5]
                if w_hits:
                    raise ConditionalWriteConflictError(f"concurrent write to {w_hits}")
                r_hits = [r["id"] for r in hits if not r["is_write"]][:5]
                if r_hits:
                    raise StaleReadError(f"read set modified: {r_hits}")
        return meta
