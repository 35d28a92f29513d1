"""Authentication + authorization middleware for the Client frontend.

Mirrors the reference's pluggable auth boundary (`chromadb/auth/__init__.py`:
``ServerAuthenticationProvider.authenticate_or_raise`` -> ``UserIdentity`` ->
``ServerAuthorizationProvider.authorize_or_raise``; token transport
`chromadb/auth/token_authn/`; role-based policy
`chromadb/auth/simple_rbac_authz/`). There is no HTTP layer here — the
Client IS the frontend — so "headers" become the ``credentials`` mapping
passed at Client construction, and providers run in-process in the same
order the reference's FastAPI middleware does: authenticate once at client
construction, authorize per API action.

Identity-scoped tenancy follows the reference, including the singleton
convenience rule (`chromadb/auth/__init__.py:145-155`): a client that asked
for the DEFAULT tenant/database while its identity pins exactly one is
silently routed to the pinned pair; any other mismatch is a 403-equivalent
:class:`AuthzError`.
"""

from __future__ import annotations

import string
from dataclasses import dataclass, field

from .quota import Action

_VALID_TOKEN_CHARS = set(string.digits + string.ascii_letters + string.punctuation)


class AuthError(Exception):
    """401-equivalent: the request could not be authenticated."""


class AuthzError(AuthError):
    """403-equivalent: authenticated, but the action is not permitted."""


@dataclass
class UserIdentity:
    """Everything the authenticator learned about the caller; the
    authorizer decides from it (reference UserIdentity contract).
    ``tenant``/``databases`` of ``"*"`` mean unrestricted."""

    user_id: str
    tenant: str | None = None
    databases: list[str] | None = None
    attributes: dict = field(default_factory=dict)


class ServerAuthenticationProvider:
    def authenticate_or_raise(self, credentials: dict) -> UserIdentity:
        raise NotImplementedError


class TokenAuthenticationProvider(ServerAuthenticationProvider):
    """Static-token authn (the reference's token_authn provider): a config
    of users, each with one or more tokens; the caller presents
    ``{"token": ...}``. Tokens must be printable ASCII (same validation the
    reference applies at config load)."""

    def __init__(self, users: list[dict]) -> None:
        self._by_token: dict[str, UserIdentity] = {}
        for u in users:
            tokens = u.get("tokens") or []
            if not tokens:
                raise ValueError(f"user {u.get('id')!r} has no tokens")
            for t in tokens:
                if not t or not all(c in _VALID_TOKEN_CHARS for c in str(t)):
                    raise ValueError(
                        "invalid token: must be non-empty ASCII letters/digits/punctuation"
                    )
                if t in self._by_token:
                    raise ValueError("token assigned to more than one user")
                self._by_token[str(t)] = UserIdentity(
                    user_id=str(u["id"]),
                    tenant=u.get("tenant"),
                    databases=list(u["databases"]) if u.get("databases") else None,
                )

    def authenticate_or_raise(self, credentials: dict) -> UserIdentity:
        token = str(credentials.get("token", ""))
        identity = self._by_token.get(token)
        if identity is None:
            raise AuthError("invalid credentials")
        return identity


class ServerAuthorizationProvider:
    def authorize_or_raise(self, user: UserIdentity, action: Action) -> None:
        raise NotImplementedError


class SimpleRBACAuthorizationProvider(ServerAuthorizationProvider):
    """Role-based policy (the reference's simple_rbac_authz provider):
    ``users`` map ids to a role, ``roles`` map a role to the Action values
    it may perform (``"*"`` = all). Permissions flatten to a per-user set
    at construction, exactly one dict probe per request."""

    def __init__(self, config: dict) -> None:
        roles: dict[str, set[str]] = {
            role: {str(a) for a in actions} for role, actions in config["roles"].items()
        }
        self._permissions: dict[str, set[str]] = {}
        for u in config["users"]:
            if u["role"] not in roles:
                raise ValueError(f"user {u['id']!r} has unknown role {u['role']!r}")
            self._permissions[str(u["id"])] = roles[u["role"]]

    def authorize_or_raise(self, user: UserIdentity, action: Action) -> None:
        allowed = self._permissions.get(user.user_id, set())
        if "*" in allowed or str(action.value) in allowed:
            return
        raise AuthzError(
            f"user {user.user_id!r} is not permitted to {action.value!r}"
        )


def resolve_tenant_scope(
    user: UserIdentity,
    tenant: str,
    database: str,
    default_tenant: str,
    default_database: str,
) -> tuple[str, str]:
    """Apply identity tenancy to the requested (tenant, database):
    the singleton overwrite rule first, then hard scope checks."""
    if (
        tenant == default_tenant
        and database == default_database
        and user.tenant not in (None, "*")
        and user.databases
        and len(user.databases) == 1
        and user.databases[0] != "*"
    ):
        return user.tenant, user.databases[0]
    if user.tenant not in (None, "*") and tenant != user.tenant:
        raise AuthzError(f"user {user.user_id!r} may not access tenant {tenant!r}")
    if user.databases and "*" not in user.databases and database not in user.databases:
        raise AuthzError(f"user {user.user_id!r} may not access database {database!r}")
    return tenant, database
