"""Authn/authz middleware parity (chromadb/auth: token_authn +
simple_rbac_authz + identity tenancy scoping)."""

from __future__ import annotations

import pytest

from chroma_spark.auth import (
    AuthError,
    AuthzError,
    SimpleRBACAuthorizationProvider,
    TokenAuthenticationProvider,
    UserIdentity,
    resolve_tenant_scope,
)
from chroma_spark.quota import Action

USERS = [
    {"id": "admin", "tokens": ["admin-tok"], "tenant": "*"},
    {"id": "reader", "tokens": ["reader-tok", "reader-tok-2"]},
    {"id": "t1only", "tokens": ["t1-tok"], "tenant": "t1", "databases": ["d1"]},
]
RBAC = {
    "roles": {
        "admin": ["*"],
        "reader": [Action.GET.value, Action.QUERY.value, Action.LIST_COLLECTIONS.value],
    },
    "users": [
        {"id": "admin", "role": "admin"},
        {"id": "reader", "role": "reader"},
        {"id": "t1only", "role": "admin"},
    ],
}


def test_token_authentication():
    authn = TokenAuthenticationProvider(USERS)
    assert authn.authenticate_or_raise({"token": "admin-tok"}).user_id == "admin"
    assert authn.authenticate_or_raise({"token": "reader-tok-2"}).user_id == "reader"
    with pytest.raises(AuthError, match="invalid credentials"):
        authn.authenticate_or_raise({"token": "nope"})
    with pytest.raises(AuthError):
        authn.authenticate_or_raise({})
    with pytest.raises(ValueError, match="ASCII"):
        TokenAuthenticationProvider([{"id": "x", "tokens": ["bad token\n"]}])
    with pytest.raises(ValueError, match="more than one user"):
        TokenAuthenticationProvider(
            [{"id": "a", "tokens": ["t"]}, {"id": "b", "tokens": ["t"]}]
        )


def test_rbac_authorization():
    authz = SimpleRBACAuthorizationProvider(RBAC)
    reader = UserIdentity(user_id="reader")
    authz.authorize_or_raise(reader, Action.GET)
    authz.authorize_or_raise(reader, Action.QUERY)
    with pytest.raises(AuthzError, match="not permitted"):
        authz.authorize_or_raise(reader, Action.ADD)
    authz.authorize_or_raise(UserIdentity(user_id="admin"), Action.DELETE)
    with pytest.raises(AuthzError):
        authz.authorize_or_raise(UserIdentity(user_id="stranger"), Action.GET)
    with pytest.raises(ValueError, match="unknown role"):
        SimpleRBACAuthorizationProvider(
            {"roles": {}, "users": [{"id": "x", "role": "ghost"}]}
        )


def test_tenant_scope_resolution():
    pinned = UserIdentity(user_id="u", tenant="t1", databases=["d1"])
    # singleton overwrite: default ask routes to the pinned pair
    assert resolve_tenant_scope(pinned, "default_tenant", "default_database",
                                "default_tenant", "default_database") == ("t1", "d1")
    # explicit matching ask passes through
    assert resolve_tenant_scope(pinned, "t1", "d1",
                                "default_tenant", "default_database") == ("t1", "d1")
    with pytest.raises(AuthzError, match="tenant"):
        resolve_tenant_scope(pinned, "t2", "d1", "default_tenant", "default_database")
    with pytest.raises(AuthzError, match="database"):
        resolve_tenant_scope(pinned, "t1", "d9", "default_tenant", "default_database")
    unrestricted = UserIdentity(user_id="root", tenant="*")
    assert resolve_tenant_scope(unrestricted, "any", "db",
                                "default_tenant", "default_database") == ("any", "db")


def test_client_end_to_end_auth(spark, tmp_path):
    """The middleware wired through Client: authn at construction, authz
    per action, identity tenancy routing."""
    from chroma_spark.api import Client

    root = str(tmp_path / "store")
    authn = TokenAuthenticationProvider(USERS)
    authz = SimpleRBACAuthorizationProvider(RBAC)

    admin = Client(spark, root, auth_provider=authn, authz_provider=authz,
                   credentials={"token": "admin-tok"})
    admin.create_tenant("t1")
    admin.create_database("d1", tenant="t1")
    col = admin.create_collection("docs")
    col.add(ids=["a"], documents=["hello auth"], embeddings=[[1.0, 0.0]])

    with pytest.raises(AuthError, match="invalid credentials"):
        Client(spark, root, auth_provider=authn, credentials={"token": "wrong"})

    reader = Client(spark, root, auth_provider=authn, authz_provider=authz,
                    credentials={"token": "reader-tok"})
    rcol = reader.get_collection("docs")
    assert [r["id"] for r in rcol.get(ids=["a"], include=[])] == ["a"]
    with pytest.raises(AuthzError, match="not permitted"):
        rcol.add(ids=["b"], documents=["nope"], embeddings=[[0.0, 1.0]])
    with pytest.raises(AuthzError):
        rcol.delete(ids=["a"])

    # identity pinned to (t1, d1): default ask is routed there
    t1 = Client(spark, root, auth_provider=authn, authz_provider=authz,
                credentials={"token": "t1-tok"})
    assert (t1.tenant, t1.database) == ("t1", "d1")
    t1.create_collection("scoped")
    assert t1.list_collections() == ["scoped"]
    assert "scoped" not in admin.list_collections()
