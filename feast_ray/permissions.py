"""Role-based permissions for store resources.

A first-party analog of the reference's permissions framework
(feast/permissions/permission.py:28-120 ``Permission``,
permissions/action.py:4-41 ``AuthzedAction`` + the ALL/READ/WRITE/CRUD
aliases, permissions/policy.py:16-120 ``Policy``/``RoleBasedPolicy``/
``AllowAll``, permissions/enforcer.py:15-120 ``enforce_policy``,
permissions/security_manager.py ``SecurityManager`` + the contextvar
current user): declarative ``Permission`` objects match resources by
type, name pattern and tags, and a policy validates the current user's
roles before an action runs.

Differences from the reference (documented scope): no OIDC/Kubernetes
token plumbing (no network in this environment — the HTTP server
accepts a dev bearer header instead, serve.py), no protobuf
round-trip, and decisions are ANY-grant (the reference's
DecisionEvaluator in unanimous mode over matching permissions; its
default "ALLOW if any matching permission's policy grants" is what
``enforce_policy`` below implements).

Enforcement activates when at least one ``Permission`` is applied to a
``Store`` — matching the reference's behavior where an empty
permission registry under an active auth manager denies everything,
while a store with no permissions applied (the ``no_auth`` default)
stays open.
"""

from __future__ import annotations

import enum
import re
from contextvars import ContextVar
from dataclasses import dataclass, field


class Action(enum.Enum):
    """CRUD + plane-specific read/write actions
    (reference: permissions/action.py:4-17)."""

    CREATE = "create"
    DESCRIBE = "describe"
    UPDATE = "update"
    DELETE = "delete"
    READ_ONLINE = "read_online"
    READ_OFFLINE = "read_offline"
    WRITE_ONLINE = "write_online"
    WRITE_OFFLINE = "write_offline"


ALL_ACTIONS = list(Action)
READ = [Action.READ_OFFLINE, Action.READ_ONLINE]
WRITE = [Action.WRITE_OFFLINE, Action.WRITE_ONLINE]
CRUD = [Action.CREATE, Action.DESCRIBE, Action.UPDATE, Action.DELETE]


class PermissionDenied(Exception):
    """Raised when the current user is not authorized for an action
    (the reference's FeastPermissionError)."""


@dataclass(frozen=True)
class User:
    """Authenticated principal: a name plus granted roles
    (reference: permissions/user.py)."""

    username: str
    roles: tuple[str, ...] = ()

    def has_matching_role(self, roles: "list[str] | tuple[str, ...]") -> bool:
        return any(r in self.roles for r in roles)


#: request-scoped current user (reference: security_manager.py keeps
#: the same contextvar so concurrent server requests don't bleed)
_current_user: ContextVar["User | None"] = ContextVar(
    "feast_ray_current_user", default=None
)


def set_current_user(user: "User | None"):
    """Bind the current principal (returns the contextvar token so
    callers can restore — the HTTP server does per-request)."""
    return _current_user.set(user)


def current_user() -> "User | None":
    return _current_user.get()


class Policy:
    """Validates a user; subclasses decide how
    (reference: permissions/policy.py:16-63)."""

    def validate_user(self, user: "User | None") -> tuple[bool, str]:
        raise NotImplementedError


class RoleBasedPolicy(Policy):
    """Grants when the user holds at least one of the listed roles
    (reference: permissions/policy.py:66-120)."""

    def __init__(self, roles: list[str]):
        if not roles:
            raise ValueError("RoleBasedPolicy requires at least one role")
        self.roles = list(roles)

    def validate_user(self, user: "User | None") -> tuple[bool, str]:
        if user is None:
            return False, "no authenticated user"
        if user.has_matching_role(self.roles):
            return True, ""
        return (
            False,
            f"requires role in {self.roles}, user has {list(user.roles)}",
        )

    def __eq__(self, other):
        return isinstance(other, RoleBasedPolicy) and sorted(
            self.roles
        ) == sorted(other.roles)


class _AllowAll(Policy):
    def validate_user(self, user):
        return True, ""


#: policy that always grants (reference: policy.py AllowAll singleton)
AllowAll: Policy = _AllowAll()


@dataclass
class Permission:
    """Authorize ``actions`` on resources matching ``types`` +
    ``name_patterns`` + ``required_tags`` when ``policy`` validates the
    current user (reference: permissions/permission.py:28-120).

    ``types`` is a tuple of resource classes (empty = every type, the
    reference's ALL_RESOURCE_TYPES default); ``name_patterns`` are
    regexes fullmatch-ed against ``resource.name`` (empty = any name).
    """

    name: str
    types: tuple = ()
    name_patterns: tuple[str, ...] = ()
    actions: tuple = tuple(ALL_ACTIONS)
    policy: Policy = AllowAll
    required_tags: dict = field(default_factory=dict)

    def __post_init__(self):
        if not self.actions:
            raise ValueError("'actions' must be non-empty")
        if isinstance(self.name_patterns, str):
            self.name_patterns = (self.name_patterns,)
        self.actions = tuple(
            a if isinstance(a, Action) else Action(a) for a in self.actions
        )

    def match_resource(self, resource) -> bool:
        """Type + name-pattern + required-tags match
        (reference: permissions/matcher.py resource_match_config)."""
        if self.types and not isinstance(resource, tuple(self.types)):
            return False
        rname = getattr(resource, "name", None)
        if self.name_patterns and not any(
            re.fullmatch(p, rname or "") for p in self.name_patterns
        ):
            return False
        if self.required_tags:
            tags = getattr(resource, "tags", None) or {}
            if any(tags.get(k) != v for k, v in self.required_tags.items()):
                return False
        return True

    def match_actions(self, actions: list[Action]) -> bool:
        return all(a in self.actions for a in actions)


def enforce_policy(
    permissions: list[Permission],
    user: "User | None",
    resources: list,
    actions: list[Action],
    filter_only: bool = False,
) -> list:
    """Apply configured permissions to requested actions on resources
    (reference: permissions/enforcer.py:15-120).

    With no permissions configured the request is DENIED (the
    reference's security measure — callers gate enforcement on
    "any permissions applied" before getting here). A resource with no
    matching permission is denied; a matching permission set grants
    when ANY matching policy validates the user. ``filter_only`` drops
    unauthorized resources instead of raising."""
    if not permissions:
        raise PermissionDenied(
            "permissions are not defined - access denied for all resources"
        )
    permitted = []
    for resource in resources:
        matching = [
            p
            for p in permissions
            if p.match_resource(resource) and p.match_actions(actions)
        ]
        if not matching:
            if filter_only:
                continue
            raise PermissionDenied(
                f"no permission grants {[a.value for a in actions]} on "
                f"{type(resource).__name__}:{getattr(resource, 'name', '?')}"
            )
        reasons = []
        for p in matching:
            ok, why = p.policy.validate_user(user)
            if ok:
                permitted.append(resource)
                break
            reasons.append(f"{p.name}: {why}")
        else:
            if filter_only:
                continue
            raise PermissionDenied(
                f"permission denied for "
                f"{[a.value for a in actions]} on "
                f"{type(resource).__name__}:"
                f"{getattr(resource, 'name', '?')} ({'; '.join(reasons)})"
            )
    return permitted


class SecurityManager:
    """Holds the applied permissions and enforces them against the
    contextvar current user (reference: security_manager.py)."""

    def __init__(self, permissions: "list[Permission] | None" = None):
        self.permissions: list[Permission] = list(permissions or [])

    def assert_permissions(self, resource, actions: "list[Action] | Action"):
        """Raise PermissionDenied unless the current user may run
        ``actions`` on ``resource``. No-op when no permissions are
        configured (open mode — see module docstring)."""
        if not self.permissions:
            return resource
        acts = actions if isinstance(actions, list) else [actions]
        return enforce_policy(
            self.permissions, current_user(), [resource], acts
        )[0]

    def permitted_resources(self, resources: list, actions) -> list:
        """Filter ``resources`` down to what the current user may act
        on (reference: enforcer filter_only=True)."""
        if not self.permissions:
            return list(resources)
        acts = actions if isinstance(actions, list) else [actions]
        return enforce_policy(
            self.permissions, current_user(), resources, acts, filter_only=True
        )


class StaticTokenAuth:
    """Server-side shared-secret token registry: opaque bearer token →
    ``User``. The sandbox analog of the reference's token verifiers
    (permissions/auth/oidc_token_parser.py,
    permissions/auth/kubernetes_token_parser.py — both need network /
    cluster identity providers): identity comes from a secret the
    server already holds, never from client-asserted names or roles.

    Install on a server (``serve(..., auth=...)`` /
    ``serve_registry(..., auth=...)``) to REPLACE the dev
    identity-assertion bearer shape: unknown tokens get 401, and a
    ``user:roles`` header grants nothing unless that exact string is a
    registered secret. Without it, servers stay in the dev shape,
    which is identity ASSERTION for testing only."""

    def __init__(self, tokens: "dict[str, User]"):
        self._tokens = {str(t): u for t, u in tokens.items()}

    def authenticate(self, token: str) -> "User | None":
        import hmac

        # constant-time compare against every registered secret so a
        # network client can't timing-probe token prefixes. Compare as
        # BYTES: compare_digest raises TypeError on non-ASCII str, and
        # http.server hands headers through latin-1 — a stray 0x80+
        # byte from an unauthenticated client must mean 401, not a
        # crashed handler (code-review r5).
        t = token.encode("utf-8", "surrogateescape")
        found = None
        for secret, user in self._tokens.items():
            if hmac.compare_digest(secret.encode("utf-8"), t):
                found = user
        return found
