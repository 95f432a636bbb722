"""Role-based permissions: matching, policy validation, enforcement
semantics (reference: feast/permissions/*), Store integration, and the
HTTP server's per-request principal."""

import numpy as np
import pandas as pd
import pytest

from feast_ray.permissions import (
    ALL_ACTIONS,
    CRUD,
    READ,
    WRITE,
    Action,
    AllowAll,
    Permission,
    PermissionDenied,
    RoleBasedPolicy,
    SecurityManager,
    User,
    current_user,
    enforce_policy,
    set_current_user,
)
from feast_ray.views import Entity, TableSource, View


@pytest.fixture(autouse=True)
def _clear_user():
    tok = set_current_user(None)
    yield
    from feast_ray.permissions import _current_user

    _current_user.reset(tok)


def _view(name="clicks", tags=None):
    v = View(
        name=name,
        source=TableSource(name="events", table="events", timestamp_field="ts"),
        entities=[Entity("user", "user_id")],
        features=["value"],
    )
    if tags is not None:
        v.tags = tags
    return v


def test_permission_matching():
    p = Permission(
        name="reader",
        types=(View,),
        name_patterns=("click.*",),
        actions=tuple(READ),
        policy=RoleBasedPolicy(["analyst"]),
    )
    assert p.match_resource(_view("clicks"))
    assert not p.match_resource(_view("orders"))  # name pattern
    assert p.match_actions([Action.READ_OFFLINE])
    assert not p.match_actions([Action.WRITE_ONLINE])
    assert not p.match_actions([Action.READ_OFFLINE, Action.DELETE])
    # required tags must all be present on the resource
    pt = Permission(name="t", required_tags={"team": "ml"})
    assert pt.match_resource(_view(tags={"team": "ml", "x": "1"}))
    assert not pt.match_resource(_view(tags={"team": "web"}))
    assert not pt.match_resource(_view())  # no tags at all
    # string actions normalize to the enum
    ps = Permission(name="s", actions=("read_online",))
    assert ps.actions == (Action.READ_ONLINE,)


def test_role_based_policy():
    pol = RoleBasedPolicy(["admin", "writer"])
    assert pol.validate_user(User("a", ("writer",)))[0]
    ok, why = pol.validate_user(User("b", ("reader",)))
    assert not ok and "writer" in why
    assert not pol.validate_user(None)[0]
    with pytest.raises(ValueError):
        RoleBasedPolicy([])
    assert AllowAll.validate_user(None)[0]


def test_enforce_policy_semantics():
    v = _view()
    reader = Permission(
        name="r", types=(View,), actions=tuple(READ),
        policy=RoleBasedPolicy(["analyst"]),
    )
    # no permissions at all -> deny (the reference's security measure)
    with pytest.raises(PermissionDenied, match="not defined"):
        enforce_policy([], User("u", ("analyst",)), [v], [Action.READ_ONLINE])
    # no matching permission for the action -> deny
    with pytest.raises(PermissionDenied, match="no permission grants"):
        enforce_policy([reader], User("u", ("analyst",)), [v], [Action.DELETE])
    # matching + role -> grant; matching + wrong role -> deny
    got = enforce_policy([reader], User("u", ("analyst",)), [v], [Action.READ_ONLINE])
    assert got == [v]
    with pytest.raises(PermissionDenied, match="denied"):
        enforce_policy([reader], User("u", ("intern",)), [v], [Action.READ_ONLINE])
    # ANY matching permission granting suffices
    admin = Permission(name="a", policy=RoleBasedPolicy(["admin"]))
    got = enforce_policy(
        [reader, admin], User("u", ("admin",)), [v], [Action.READ_ONLINE]
    )
    assert got == [v]
    # filter_only drops instead of raising
    got = enforce_policy(
        [reader], User("u", ("intern",)), [v, _view("orders")],
        [Action.READ_ONLINE], filter_only=True,
    )
    assert got == []


def test_security_manager_open_until_configured():
    sm = SecurityManager()
    v = _view()
    assert sm.assert_permissions(v, Action.DELETE) is v  # open mode
    sm.permissions.append(
        Permission(name="r", actions=tuple(READ), policy=AllowAll)
    )
    with pytest.raises(PermissionDenied):
        sm.assert_permissions(v, Action.DELETE)
    assert sm.permitted_resources([v], READ) == [v]


def test_store_enforcement(tmp_path, sf_small, ray_session):
    """End to end: apply views + permissions, then plane-scoped reads
    and writes are granted/denied by the current user's roles."""
    from feast_ray.store import Store

    st = Store(str(tmp_path / "repo"), sf_small)
    view = View(
        name="user_values",
        source=TableSource(name="events", table="events", timestamp_field="ts"),
        entities=[Entity("user", "user_id")],
        features=["value"],
    )
    st.apply([view])
    st.materialize()  # open mode: no permissions applied yet

    st.apply([
        Permission(
            name="analyst_read", types=(View,), actions=tuple(READ),
            policy=RoleBasedPolicy(["analyst"]),
        ),
        Permission(
            name="pipeline_write", types=(View,),
            actions=tuple(WRITE) + tuple(CRUD),
            policy=RoleBasedPolicy(["pipeline"]),
        ),
    ])

    set_current_user(User("ana", ("analyst",)))
    out = st.get_online_features(["user_values:value"], [{"user_id": 1}])
    assert len(out) == 1
    with pytest.raises(PermissionDenied):
        st.materialize()  # analyst cannot write online
    with pytest.raises(PermissionDenied):
        st.push("user_values", pd.DataFrame({
            "user_id": [1], "ts": [pd.Timestamp("2024-06-01")], "value": [1.0]
        }))

    set_current_user(User("job", ("pipeline",)))
    st.materialize()
    with pytest.raises(PermissionDenied):
        st.get_online_features(["user_values:value"], [{"user_id": 1}])

    # unauthenticated: everything guarded is denied
    set_current_user(None)
    with pytest.raises(PermissionDenied):
        st.get_online_features(["user_values:value"], [{"user_id": 1}])
    # applying a new view now requires CREATE
    with pytest.raises(PermissionDenied):
        st.apply([_view("new_view")])
    set_current_user(User("job", ("pipeline",)))
    st.apply([_view("new_view")])  # pipeline has CRUD


def test_http_bearer_principal(tmp_path, sf_small, ray_session):
    """The server binds the bearer principal per request and returns
    403 on PermissionDenied."""
    import json
    import urllib.request

    from feast_ray.serve import serve
    from feast_ray.store import Store

    st = Store(str(tmp_path / "repo"), sf_small)
    view = View(
        name="user_values",
        source=TableSource(name="events", table="events", timestamp_field="ts"),
        entities=[Entity("user", "user_id")],
        features=["value"],
    )
    st.apply([view])
    st.materialize()
    st.apply([
        Permission(
            name="analyst_read", types=(View,), actions=tuple(READ),
            policy=RoleBasedPolicy(["analyst"]),
        ),
    ])
    server = serve(st, port=0)
    try:
        port = server.server_address[1]
        body = json.dumps({
            "features": ["user_values:value"], "entities": {"user_id": [1]}
        }).encode()

        def post(auth=None):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/get-online-features", data=body,
                headers={"Content-Type": "application/json",
                         **({"Authorization": auth} if auth else {})},
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, resp = post("Bearer ana:analyst")
        assert code == 200 and "results" in resp
        code, resp = post("Bearer eve:intern")
        assert code == 403 and "PermissionDenied" in resp["error"]
        code, resp = post(None)  # anonymous
        assert code == 403
    finally:
        server.shutdown()


def test_static_token_auth_unit():
    """Server-side token map: exact-secret lookup, no partial matches."""
    from feast_ray.permissions import StaticTokenAuth

    auth = StaticTokenAuth({
        "s3cret-analyst": User("ana", ("analyst",)),
        "s3cret-admin": User("root", ("admin",)),
    })
    assert auth.authenticate("s3cret-analyst").roles == ("analyst",)
    assert auth.authenticate("s3cret-admin").username == "root"
    assert auth.authenticate("s3cret") is None
    assert auth.authenticate("s3cret-analyst ") is None
    assert auth.authenticate("") is None


def test_http_token_auth_rejects_self_asserted_roles(tmp_path, sf_small, ray_session):
    """With StaticTokenAuth installed, identity comes from the server's
    secret map: unknown tokens get 401 and a 'user:role' assertion
    grants nothing (advice r4 — bearer was client-asserted)."""
    import json
    import urllib.request

    from feast_ray.permissions import StaticTokenAuth
    from feast_ray.serve import serve
    from feast_ray.store import Store

    st = Store(str(tmp_path / "repo"), sf_small)
    view = View(
        name="user_values",
        source=TableSource(name="events", table="events", timestamp_field="ts"),
        entities=[Entity("user", "user_id")],
        features=["value"],
    )
    st.apply([view])
    st.materialize()
    st.apply([
        Permission(
            name="analyst_read", types=(View,), actions=tuple(READ),
            policy=RoleBasedPolicy(["analyst"]),
        ),
    ])
    server = serve(st, port=0, auth=StaticTokenAuth({
        "tok-ana": User("ana", ("analyst",)),
        "tok-eve": User("eve", ("intern",)),
    }))
    try:
        port = server.server_address[1]
        body = json.dumps({
            "features": ["user_values:value"], "entities": {"user_id": [1]}
        }).encode()

        def post(auth_hdr=None):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/get-online-features", data=body,
                headers={"Content-Type": "application/json",
                         **({"Authorization": auth_hdr} if auth_hdr else {})},
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, resp = post("Bearer tok-ana")  # server-side roles
        assert code == 200 and "results" in resp
        code, resp = post("Bearer tok-eve")  # valid token, wrong role
        assert code == 403 and "PermissionDenied" in resp["error"]
        code, resp = post("Bearer eve:admin")  # self-asserted role: 401
        assert code == 401
        code, resp = post("Bearer nope")  # unknown token
        assert code == 401
        code, resp = post(None)  # missing header
        assert code == 401
    finally:
        server.shutdown()


def test_static_token_auth_non_ascii_token_is_rejected_not_crash():
    """hmac.compare_digest rejects non-ASCII str; a latin-1 header byte
    from an unauthenticated client must mean None (-> 401), not a
    TypeError in the request handler (code-review r5)."""
    from feast_ray.permissions import StaticTokenAuth

    auth = StaticTokenAuth({"tok": User("u", ("r",))})
    assert auth.authenticate("s\xe9cret") is None
    assert auth.authenticate("tok") is not None
