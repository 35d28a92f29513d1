"""HTTP client for the v2 REST facade (`server.py`) — the
`chromadb.HttpClient` analog (`chromadb/api/fastapi.py`), stdlib-only
(urllib): a process with no SparkSession talks to a store served by
`python -m chroma_spark.server`, with the same method surface the local
`Client`/`Collection` expose. Record reads return the reference client's
column-major Get/QueryResult shapes (chromadb/api/types.py:619) — i.e.
exactly what the wire carries.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from typing import Any, Sequence

DEFAULT_TENANT = "default_tenant"
DEFAULT_DATABASE = "default_database"


class HttpClientError(Exception):
    """4xx/5xx from the server; carries the server's error message."""

    def __init__(self, status: int, message: str) -> None:
        super().__init__(f"[{status}] {message}")
        self.status = status


class HttpClient:
    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 8000,
        ssl: bool = False,
        tenant: str = DEFAULT_TENANT,
        database: str = DEFAULT_DATABASE,
        headers: dict[str, str] | None = None,
        timeout: float = 120.0,
    ) -> None:
        self._root = f"http{'s' if ssl else ''}://{host}:{port}/api/v2"
        self._scope = f"/tenants/{tenant}/databases/{database}"
        self.tenant, self.database = tenant, database
        self._headers = dict(headers or {})
        self._timeout = timeout

    # -- wire ------------------------------------------------------------
    def _request(self, method: str, path: str, body: Any | None = None) -> Any:
        req = urllib.request.Request(
            self._root + path,
            data=None if body is None else json.dumps(body).encode(),
            headers={"Content-Type": "application/json", **self._headers},
            method=method,
        )
        try:
            with urllib.request.urlopen(req, timeout=self._timeout) as r:
                return json.loads(r.read() or b"null")
        except urllib.error.HTTPError as e:
            try:
                message = json.loads(e.read()).get("message", str(e))
            except Exception:
                message = str(e)
            raise HttpClientError(e.code, message) from None

    # -- utility ----------------------------------------------------------
    def heartbeat(self) -> int:
        return int(self._request("GET", "/heartbeat")["nanosecond heartbeat"])

    def get_version(self) -> str:
        return str(self._request("GET", "/version"))

    def get_max_batch_size(self) -> int:
        return int(self._request("GET", "/pre-flight-checks")["max_batch_size"])

    def reset(self) -> bool:
        return bool(self._request("POST", "/reset"))

    def get_user_identity(self) -> dict:
        return self._request("GET", "/auth/identity")

    # -- tenants / databases ----------------------------------------------
    def create_tenant(self, name: str) -> None:
        self._request("POST", "/tenants", {"name": name})

    def get_tenant(self, name: str) -> dict:
        return self._request("GET", f"/tenants/{name}")

    def create_database(self, name: str, tenant: str | None = None) -> None:
        self._request("POST", f"/tenants/{tenant or self.tenant}/databases", {"name": name})

    def list_databases(self, tenant: str | None = None) -> list[dict]:
        return self._request("GET", f"/tenants/{tenant or self.tenant}/databases")

    def get_database(self, name: str, tenant: str | None = None) -> dict:
        return self._request("GET", f"/tenants/{tenant or self.tenant}/databases/{name}")

    def delete_database(self, name: str, tenant: str | None = None) -> None:
        self._request("DELETE", f"/tenants/{tenant or self.tenant}/databases/{name}")

    # -- collections --------------------------------------------------------
    def create_collection(
        self,
        name: str,
        metadata: dict | None = None,
        dimension: int | None = None,
        space: str = "l2",
        get_or_create: bool = False,
    ) -> "HttpCollection":
        model = self._request(
            "POST",
            f"{self._scope}/collections",
            {
                "name": name,
                "metadata": metadata,
                "configuration": {"dimension": dimension, "space": space},
                "get_or_create": get_or_create,
            },
        )
        return HttpCollection(self, model)

    def get_collection(self, name: str) -> "HttpCollection":
        return HttpCollection(self, self._request("GET", f"{self._scope}/collections/{name}"))

    def get_or_create_collection(self, name: str, **kw) -> "HttpCollection":
        return self.create_collection(name, get_or_create=True, **kw)

    def delete_collection(self, name: str) -> None:
        self._request("DELETE", f"{self._scope}/collections/{name}")

    def list_collections(self, limit: int | None = None, offset: int = 0) -> list[str]:
        q = f"?offset={offset}" + (f"&limit={limit}" if limit is not None else "")
        return [c["name"] for c in self._request("GET", f"{self._scope}/collections{q}")]

    def count_collections(self) -> int:
        return int(self._request("GET", f"{self._scope}/collections_count"))


class HttpCollection:
    def __init__(self, client: HttpClient, model: dict) -> None:
        self._client = client
        self.id = model["id"]
        self.name = model["name"]
        self.metadata = model.get("metadata")
        self.dimension = model.get("dimension")

    def _op(self, method: str, op: str, body: Any | None = None) -> Any:
        return self._client._request(
            method, f"{self._client._scope}/collections/{self.id}/{op}", body
        )

    @staticmethod
    def _records(ids, embeddings, documents, uris, metadatas) -> dict:
        return {
            "ids": list(ids),
            "embeddings": embeddings,
            "documents": documents,
            "uris": uris,
            "metadatas": metadatas,
        }

    def add(self, ids, embeddings=None, documents=None, uris=None, metadatas=None) -> bool:
        return self._op("POST", "add", self._records(ids, embeddings, documents, uris, metadatas))

    def update(self, ids, embeddings=None, documents=None, uris=None, metadatas=None) -> bool:
        return self._op("POST", "update", self._records(ids, embeddings, documents, uris, metadatas))

    def upsert(self, ids, embeddings=None, documents=None, uris=None, metadatas=None) -> bool:
        return self._op("POST", "upsert", self._records(ids, embeddings, documents, uris, metadatas))

    def get(
        self,
        ids: Sequence[str] | None = None,
        where: dict | None = None,
        where_document: dict | None = None,
        limit: int | None = None,
        offset: int = 0,
        include: Sequence[str] = ("documents", "metadatas"),
    ) -> dict:
        return self._op(
            "POST", "get",
            {"ids": ids, "where": where, "where_document": where_document,
             "limit": limit, "offset": offset, "include": list(include)},
        )

    def delete(self, ids=None, where=None, where_document=None) -> None:
        self._op("POST", "delete", {"ids": ids, "where": where, "where_document": where_document})

    def count(self) -> int:
        return int(self._op("GET", "count"))

    def query(
        self,
        query_embeddings,
        n_results: int = 10,
        where: dict | None = None,
        where_document: dict | None = None,
        ids: Sequence[str] | None = None,
        include: Sequence[str] = ("documents", "metadatas", "distances"),
    ) -> dict:
        return self._op(
            "POST", "query",
            {"query_embeddings": query_embeddings, "n_results": n_results,
             "where": where, "where_document": where_document, "ids": ids,
             "include": list(include)},
        )

    def search(self, *searches: dict, read_level: str = "IndexAndWal") -> dict:
        return self._op(
            "POST", "search", {"searches": list(searches), "read_level": read_level}
        )

    def fork(self, new_name: str) -> "HttpCollection":
        return HttpCollection(self._client, self._op("POST", "fork", {"new_name": new_name}))

    def modify(self, name: str | None = None, metadata: dict | None = None) -> None:
        self._client._request(
            "PUT", f"{self._client._scope}/collections/{self.name}",
            {"new_name": name, "new_metadata": metadata},
        )
        if name is not None:
            self.name = name
