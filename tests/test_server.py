"""HTTP facade (chroma_spark/server.py): the reference's v2 REST routes
served over the Spark engine, exercised through Flask's test client (same
WSGI path a real socket would hit)."""

from __future__ import annotations

import pytest

flask = pytest.importorskip("flask")

from chroma_spark.server import create_app  # noqa: E402

BASE = "/api/v2/tenants/default_tenant/databases/default_database"


@pytest.fixture()
def http(spark, tmp_path):
    app = create_app(spark, str(tmp_path / "store"), allow_reset=True)
    app.testing = True
    with app.test_client() as c:
        yield c


def test_utility_routes(http):
    assert "nanosecond heartbeat" in http.get("/api/v2/heartbeat").get_json()
    assert isinstance(http.get("/api/v2/version").get_json(), str)
    assert http.get("/api/v2/pre-flight-checks").get_json()["max_batch_size"] > 0
    ident = http.get("/api/v2/auth/identity").get_json()
    assert ident["tenant"] == "default_tenant"


def test_tenant_database_crud(http):
    assert http.post("/api/v2/tenants", json={"name": "acme"}).status_code == 200
    assert http.get("/api/v2/tenants/acme").get_json() == {"name": "acme"}
    assert http.get("/api/v2/tenants/ghost").status_code == 404
    r = http.post("/api/v2/tenants/acme/databases", json={"name": "prod"})
    assert r.status_code == 200
    names = [d["name"] for d in http.get("/api/v2/tenants/acme/databases").get_json()]
    assert "prod" in names
    assert http.get("/api/v2/tenants/acme/databases/prod").get_json()["name"] == "prod"
    # collections scope to (tenant, database)
    cbase = "/api/v2/tenants/acme/databases/prod"
    http.post(f"{cbase}/collections", json={"name": "scoped"})
    assert http.get(f"{cbase}/collections_count").get_json() == 1
    assert http.get(f"{BASE}/collections_count").get_json() == 0
    # DELETE database cascades (sysdb delete-database semantics)
    assert http.delete("/api/v2/tenants/acme/databases/prod").status_code == 200
    assert http.get("/api/v2/tenants/acme/databases/prod").status_code == 404


def test_collection_crud_and_records(http):
    r = http.post(
        f"{BASE}/collections",
        json={"name": "col1", "metadata": {"team": "x"},
              "configuration": {"dimension": 2, "space": "cosine"}},
    )
    model = r.get_json()
    assert r.status_code == 200 and model["name"] == "col1"
    assert model["metadata"] == {"team": "x"} and model["dimension"] == 2
    cid = model["id"]

    # records address the collection by uuid (reference record routes)
    assert http.post(
        f"{BASE}/collections/{cid}/add",
        json={"ids": ["a", "b", "c"],
              "embeddings": [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
              "documents": ["alpha doc", "beta doc", "gamma"],
              "metadatas": [{"k": 1}, {"k": 2}, None]},
    ).get_json() is True
    assert http.get(f"{BASE}/collections/{cid}/count").get_json() == 3

    got = http.post(
        f"{BASE}/collections/{cid}/get",
        json={"where": {"k": {"$gte": 2}}, "include": ["documents", "metadatas"]},
    ).get_json()
    assert got["ids"] == ["b"] and got["documents"] == ["beta doc"]
    assert got["metadatas"] == [{"k": 2}] and got["embeddings"] is None

    res = http.post(
        f"{BASE}/collections/{cid}/query",
        json={"query_embeddings": [[0.1, 0.9]], "n_results": 2},
    ).get_json()
    assert res["ids"][0][0] == "b" and len(res["ids"][0]) == 2
    assert res["distances"][0][0] == pytest.approx(0.0, abs=0.03)

    # update + upsert + delete
    http.post(f"{BASE}/collections/{cid}/update",
              json={"ids": ["a"], "metadatas": [{"k": 9}]})
    http.post(f"{BASE}/collections/{cid}/upsert",
              json={"ids": ["d"], "embeddings": [[0.5, 0.5]], "documents": ["delta"]})
    http.post(f"{BASE}/collections/{cid}/delete", json={"ids": ["c"]})
    got = http.post(f"{BASE}/collections/{cid}/get", json={}).get_json()
    assert sorted(got["ids"]) == ["a", "b", "d"]

    # collection-level routes address by NAME; PUT renames
    assert http.get(f"{BASE}/collections/col1").get_json()["id"] == cid
    http.put(f"{BASE}/collections/col1", json={"new_name": "col2"})
    assert http.get(f"{BASE}/collections/col1").status_code == 404
    assert http.get(f"{BASE}/collections/col2").get_json()["id"] == cid

    # fork, then clean up both
    fork = http.post(f"{BASE}/collections/{cid}/fork", json={"new_name": "col2fork"})
    assert fork.get_json()["name"] == "col2fork"
    assert http.get(f"{BASE}/collections/col2fork/count").get_json() == 3
    assert http.delete(f"{BASE}/collections/col2fork").status_code == 200
    names = [c["name"] for c in http.get(f"{BASE}/collections").get_json()]
    assert names == ["col2"]


def test_error_statuses_and_reset(http):
    assert http.get(f"{BASE}/collections/ghost").status_code == 404
    http.post(f"{BASE}/collections", json={"name": "e1", "configuration": {"dimension": 2}})
    # bad where payload -> 400
    r = http.post(
        f"{BASE}/collections/e1/get", json={"where": {"k": {"$bogus": 1}}}
    )
    assert r.status_code == 400
    # duplicate create -> 400; get_or_create -> 200
    assert http.post(f"{BASE}/collections", json={"name": "e1"}).status_code == 400
    assert http.post(
        f"{BASE}/collections", json={"name": "e1", "get_or_create": True}
    ).status_code == 200
    assert http.post("/api/v2/reset").get_json() is True
    assert http.get(f"{BASE}/collections_count").get_json() == 0


def test_real_socket_serving(spark, tmp_path):
    """One request over an actual TCP socket (the WSGI tests above cover
    routing; this pins that run_server-style serving works end to end)."""
    import json
    import socket
    import threading
    import urllib.request

    from werkzeug.serving import make_server

    app = create_app(spark, str(tmp_path / "sockstore"))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = make_server("127.0.0.1", port, app)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v2/heartbeat", timeout=30
        ) as r:
            assert "nanosecond heartbeat" in json.loads(r.read())
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{BASE}/collections",
            data=json.dumps({"name": "sock"}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert json.loads(r.read())["name"] == "sock"
    finally:
        srv.shutdown()


def test_search_route(http):
    r = http.post(
        f"{BASE}/collections",
        json={"name": "s1", "configuration": {"dimension": 2, "space": "cosine"}},
    )
    cid = r.get_json()["id"]
    http.post(
        f"{BASE}/collections/{cid}/add",
        json={"ids": ["a", "b", "c"],
              "embeddings": [[1.0, 0.0], [0.0, 1.0], [0.9, 0.1]],
              "documents": ["alpha", "beta", "близко"],
              "metadatas": [{"k": 1}, {"k": 2}, {"k": 3}]},
    )
    resp = http.post(
        f"{BASE}/collections/{cid}/search",
        json={
            "searches": [
                {"rank": {"$knn": {"query": [1.0, 0.0], "limit": 3}},
                 "limit": 2,
                 "select": {"keys": ["#id", "#document", "#score", "#metadata"]}},
                {"where": {"k": {"$gte": 3}},
                 "select": ["#id"]},
            ],
            "read_level": "IndexAndWal",
        },
    ).get_json()
    # per-search column-major entries (api_types.rs SearchResponse)
    assert resp["ids"][0] == ["a", "c"]  # cosine order to [1, 0]
    assert resp["documents"][0] == ["alpha", "близко"]
    assert resp["scores"][0][0] == pytest.approx(0.0, abs=1e-6)
    assert resp["metadatas"][0] == [{"k": 1}, {"k": 3}]
    assert resp["ids"][1] == ["c"]
    assert resp["scores"][1] is None  # un-ranked search has no score column
    assert resp["select"][1] == ["#id"]


def test_authenticated_server(spark, tmp_path):
    """Per-request token authn + RBAC authz over HTTP, the reference's
    middleware order (401 no/bad token, 403 insufficient role)."""
    from chroma_spark.auth import (
        SimpleRBACAuthorizationProvider,
        TokenAuthenticationProvider,
    )

    authn = TokenAuthenticationProvider(
        [
            {"id": "writer", "tokens": ["w-tok"]},
            {"id": "reader", "tokens": ["r-tok"]},
        ]
    )
    authz = SimpleRBACAuthorizationProvider(
        {
            "roles": {"rw": ["*"], "ro": ["get", "query", "list_collections"]},
            "users": [{"id": "writer", "role": "rw"}, {"id": "reader", "role": "ro"}],
        }
    )
    app = create_app(
        spark, str(tmp_path / "store"), auth_provider=authn, authz_provider=authz
    )
    app.testing = True
    http = app.test_client()
    w = {"Authorization": "Bearer w-tok"}
    r = {"X-Chroma-Token": "r-tok"}

    # utility probes stay open; everything else requires a valid token
    assert http.get("/api/v2/heartbeat").status_code == 200
    assert http.get(f"{BASE}/collections").status_code == 401
    assert http.get(f"{BASE}/collections", headers={"Authorization": "Bearer nope"}).status_code == 401
    assert http.get("/api/v2/auth/identity", headers=w).get_json()["user_id"] == "writer"

    # writer can create + add; reader can read but not write (403)
    assert http.post(f"{BASE}/collections", headers=w,
                     json={"name": "c", "configuration": {"dimension": 2}}).status_code == 200
    assert http.post(f"{BASE}/collections/c/add", headers=w,
                     json={"ids": ["a"], "embeddings": [[1.0, 0.0]]}).status_code == 200
    assert http.post(f"{BASE}/collections/c/get", headers=r, json={}).get_json()["ids"] == ["a"]
    assert http.post(f"{BASE}/collections/c/add", headers=r,
                     json={"ids": ["b"], "embeddings": [[0.0, 1.0]]}).status_code == 403


def test_http_client_end_to_end(spark, tmp_path):
    """Client/server split with our own stdlib HttpClient over a real
    socket — no SparkSession on the client side."""
    import socket
    import threading

    import pytest as _pytest
    from werkzeug.serving import make_server

    from chroma_spark.http_client import HttpClient, HttpClientError

    app = create_app(spark, str(tmp_path / "store"))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = make_server("127.0.0.1", port, app, threaded=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        client = HttpClient(port=port)
        assert client.heartbeat() > 0
        assert client.get_max_batch_size() > 0

        col = client.create_collection("remote", dimension=2, space="cosine",
                                       metadata={"via": "http"})
        assert col.metadata == {"via": "http"}
        col.add(ids=["a", "b"], embeddings=[[1.0, 0.0], [0.0, 1.0]],
                documents=["alpha", "beta"], metadatas=[{"k": 1}, {"k": 2}])
        assert col.count() == 2
        got = col.get(where={"k": 2})
        assert got["ids"] == ["b"] and got["documents"] == ["beta"]
        res = col.query([[0.9, 0.1]], n_results=1)
        assert res["ids"][0] == ["a"]
        sr = col.search({"rank": {"$knn": {"query": [1.0, 0.0], "limit": 2}},
                         "select": ["#id", "#score"]})
        assert sr["ids"][0] == ["a", "b"]
        twin = col.fork("remote2")
        assert twin.name == "remote2" and client.count_collections() == 2
        col.modify(name="renamed")
        assert sorted(client.list_collections()) == ["remote2", "renamed"]
        client.delete_collection("remote2")
        # server-side errors surface with status + message
        with _pytest.raises(HttpClientError) as ei:
            client.get_collection("ghost")
        assert ei.value.status == 404
        with _pytest.raises(HttpClientError) as ei:
            col.get(where={"k": {"$nope": 1}})
        assert ei.value.status == 400
    finally:
        srv.shutdown()


def test_server_embedding_function_config(http):
    """configuration.embedding_function persists and auto-embeds documents
    added over HTTP (the reference stores the EF in configuration_json)."""
    r = http.post(
        f"{BASE}/collections",
        json={"name": "efcol",
              "configuration": {"embedding_function": {
                  "name": "hashing", "config": {"dim": 8}}}},
    )
    assert r.status_code == 200
    cid = r.get_json()["id"]
    assert http.post(
        f"{BASE}/collections/{cid}/add",
        json={"ids": ["x", "y"], "documents": ["hello world", "totally different text"]},
    ).status_code == 200
    got = http.post(
        f"{BASE}/collections/{cid}/get", json={"include": ["embeddings"]}
    ).get_json()
    assert all(len(e) == 8 for e in got["embeddings"])


def test_concurrent_http_requests(spark, tmp_path):
    """Parallel requests over one SparkSession: the threaded WSGI server
    drives concurrent Spark jobs (scheduler interleaves); per-thread
    collections isolate the write paths, one shared collection serves
    concurrent reads."""
    import socket
    import threading

    from werkzeug.serving import make_server

    from chroma_spark.http_client import HttpClient

    app = create_app(spark, str(tmp_path / "store"))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = make_server("127.0.0.1", port, app, threaded=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    shared = HttpClient(port=port).create_collection("shared", dimension=2)
    shared.add(ids=["s1", "s2"], embeddings=[[1.0, 0.0], [0.0, 1.0]])
    errors: list = []

    def worker(i: int) -> None:
        try:
            c = HttpClient(port=port)
            col = c.create_collection(f"w{i}", dimension=2)
            col.add(ids=[f"{i}-a", f"{i}-b"], embeddings=[[1.0, 0.0], [0.0, float(i + 1)]])
            assert col.count() == 2
            res = c.get_collection("shared").query([[1.0, 0.0]], n_results=1)
            assert res["ids"][0] == ["s1"]
        except Exception as e:  # noqa: BLE001
            errors.append((i, repr(e)))

    try:
        threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
        [t.start() for t in threads]
        [t.join(timeout=300) for t in threads]
        assert not errors, errors
        names = HttpClient(port=port).list_collections()
        assert len(names) == 7  # shared + 6 workers
    finally:
        srv.shutdown()
