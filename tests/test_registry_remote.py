"""Remote registry (reference: infra/registry/remote.py +
caching_registry.py): spec round-trips, HTTP server + cached client,
replica sync sharing the online plane, registry-spec reload, and
permission enforcement through the remote apply path."""

from datetime import timedelta

import pandas as pd
import pytest

from feast_ray.registry_server import RemoteRegistry, serve_registry
from feast_ray.stages.aggregate import AggSpec
from feast_ray.store import Store
from feast_ray.views import (
    Entity,
    FeatureService,
    TableSource,
    View,
    view_from_dict,
    view_to_dict,
)


def _view(name="user_values", **kw):
    return View(
        name=name,
        source=TableSource(name="events", table="events", timestamp_field="ts"),
        entities=[Entity("user", "user_id")],
        features=["value"],
        **kw,
    )


def test_view_spec_roundtrip():
    import pyarrow as pa

    from feast_ray.schema import Schema

    v = View(
        name="agg_view",
        source=View(  # derived-view chain source
            name="base",
            source=TableSource(name="events", table="events", timestamp_field="ts"),
            entities=[Entity("user", "user_id")],
            features=["value"],
        ),
        entities=[Entity("user", "user_id")],
        schema=Schema([
            ("value", pa.float64()), ("ts", pa.timestamp("us")),
            ("emb", pa.list_(pa.float32())),
        ]),
        ttl=timedelta(hours=3),
        sql="value * 2 as value2",
        aggregations=[AggSpec("value", "sum", "value_sum")],
        window=timedelta(hours=1),
        slide=timedelta(minutes=10),
        features=["value_sum"],
        tags={"team": "ml"},
    )
    d = view_to_dict(v)
    import json

    json.dumps(d)  # wire-safe
    v2 = view_from_dict(d)
    assert view_to_dict(v2) == d
    assert v2.window == timedelta(hours=1) and v2.slide == timedelta(minutes=10)
    assert isinstance(v2.source, View) and v2.source.name == "base"
    assert v2.schema.arrow() == v.schema.arrow()
    # udf callables don't round-trip; the NAME survives in the spec
    def my_udf(t):  # pragma: no cover - never called
        return t

    vu = _view(udf=my_udf)
    du = view_to_dict(vu)
    assert du["udf_name"] == "my_udf"
    assert view_from_dict(du).udf is None


def test_registry_server_and_replica_sync(tmp_path, sf_small, ray_session):
    """Primary applies + materializes; a replica store sharing the
    repo dir bootstraps its catalog from the registry service and
    serves online lookups; remote apply propagates new objects."""
    repo = str(tmp_path / "repo")
    primary = Store(repo, sf_small)
    primary.apply([
        _view(),
        FeatureService(name="svc", features=("user_values:value",)),
    ])
    primary.materialize()
    server = serve_registry(primary, port=0)
    try:
        port = server.server_address[1]
        remote = RemoteRegistry(f"http://127.0.0.1:{port}", cache_ttl_s=60)
        assert remote.list_views() == ["user_values"]
        assert remote.list_services() == ["svc"]
        v = remote.get_view("user_values")
        assert v.join_keys == ["user_id"] and v.features == ["value"]
        assert remote.watermarks("user_values")  # materialize recorded one
        with pytest.raises(KeyError):
            remote.get_view("nope")

        # replica: same repo dir (shared online plane), catalog via sync
        replica = Store(repo, sf_small)
        assert replica.sync_from(remote) == 2
        out = replica.get_online_features(
            ["user_values:value"], [{"user_id": 1}]
        )
        assert len(out) == 1 and "user_values__value" in "".join(
            out.columns
        ) or "value" in out.columns

        # remote apply: a second view appears after cache invalidation
        remote.apply([_view("clicks2")])
        assert "clicks2" in remote.list_views()
        # the TTL cache serves stale reads until refresh
        stale = RemoteRegistry(f"http://127.0.0.1:{port}", cache_ttl_s=600)
        stale._manifest()
        primary.apply([_view("late_view")])
        assert "late_view" not in stale.list_views()  # cached
        stale.refresh()
        assert "late_view" in stale.list_views()
    finally:
        server.shutdown()


def test_load_applied_from_registry_specs(tmp_path, sf_small, ray_session):
    """A fresh process rebuilds views from registry.json view_specs
    and can materialize + serve without re-running the apply script."""
    repo = str(tmp_path / "repo")
    st = Store(repo, sf_small)
    st.apply([
        _view(),
        View(
            name="hourly",
            source=TableSource(name="events", table="events", timestamp_field="ts"),
            entities=[Entity("user", "user_id")],
            aggregations=[AggSpec("value", "sum", "value_sum")],
            window=timedelta(hours=1),
            features=["value_sum"],
        ),
    ])
    fresh = Store(repo, sf_small)
    assert fresh.views == {}
    assert fresh.load_applied() == 2
    assert set(fresh.views) == {"user_values", "hourly"}
    fresh.materialize(views=["user_values"])
    out = fresh.get_online_features(["user_values:value"], [{"user_id": 1}])
    assert len(out) == 1


def test_remote_apply_enforced(tmp_path, sf_small, ray_session):
    """Permissions guard the remote apply path: the bearer principal
    needs CREATE on View; denials surface as PermissionDenied."""
    from feast_ray.permissions import (
        CRUD,
        Permission,
        PermissionDenied,
        RoleBasedPolicy,
    )

    primary = Store(str(tmp_path / "repo"), sf_small)
    primary.apply([
        Permission(
            name="admin_crud", actions=tuple(CRUD),
            policy=RoleBasedPolicy(["admin"]),
        ),
    ])
    server = serve_registry(primary, port=0)
    try:
        port = server.server_address[1]
        anon = RemoteRegistry(f"http://127.0.0.1:{port}")
        with pytest.raises(PermissionDenied):
            anon.apply([_view("v1")])
        admin = RemoteRegistry(f"http://127.0.0.1:{port}", bearer="root:admin")
        assert admin.apply([_view("v1")]) == 1
        assert "v1" in admin.list_views()
    finally:
        server.shutdown()


def test_registry_reads_enforce_describe(tmp_path, sf_small, ray_session):
    """Registry GETs are permission-enforced like every other plane
    (code-review r4): with read permissions restricted by role, an
    anonymous client sees an empty catalog and per-view 404s, while a
    permitted principal sees everything."""
    from feast_ray.permissions import (
        Action,
        Permission,
        RoleBasedPolicy,
    )

    st = Store(str(tmp_path / "repo"), sf_small)
    st.apply([_view("secret_view")])
    st.apply([
        Permission(
            name="analyst_describe",
            actions=(Action.DESCRIBE,),
            policy=RoleBasedPolicy(["analyst"]),
        ),
    ])
    server = serve_registry(st, port=0)
    try:
        port = server.server_address[1]
        anon = RemoteRegistry(f"http://127.0.0.1:{port}")
        assert anon.list_views() == []
        with pytest.raises(KeyError):
            anon.get_view("secret_view")
        ana = RemoteRegistry(f"http://127.0.0.1:{port}", bearer="ana:analyst")
        assert ana.list_views() == ["secret_view"]
        assert ana.get_view("secret_view").name == "secret_view"
    finally:
        server.shutdown()


def test_registry_get_errors_return_json_500_and_token_auth(tmp_path, sf_small, ray_session):
    """do_GET must return a JSON 500 on unexpected errors (advice r4 —
    it previously dropped the connection) and honor StaticTokenAuth."""
    import json
    import urllib.error
    import urllib.request

    from feast_ray.permissions import StaticTokenAuth, User

    st = Store(str(tmp_path / "repo"), sf_small)
    st.apply([_view()])
    server = serve_registry(
        st, port=0, auth=StaticTokenAuth({"tok-ops": User("ops", ("admin",))})
    )
    try:
        port = server.server_address[1]

        def get(path, auth_hdr=None):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                headers={"Authorization": auth_hdr} if auth_hdr else {},
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, _ = get("/registry", "Bearer tok-ops")
        assert code == 200
        code, _ = get("/registry", "Bearer eve:admin")  # self-asserted
        assert code == 401
        code, _ = get("/registry")  # anonymous
        assert code == 401

        # force an internal error: corrupt the registry file so
        # _load_registry raises inside _get_route
        with open(st.registry_path, "w") as f:
            f.write("{not json")
        code, resp = get("/registry", "Bearer tok-ops")
        assert code == 500 and "error" in resp
    finally:
        server.shutdown()
