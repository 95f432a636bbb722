"""HTTP feature server (reference `feast serve` parity)."""

import json
import urllib.request

import pandas as pd
import pytest

from feast_ray.serve import serve
from feast_ray.store import Store
from feast_ray.views import Entity, TableSource, View

USER = Entity("user", "user_id")


@pytest.fixture()
def served_store(tmp_path, sf_small):
    s = Store(str(tmp_path / "repo"), sf_small)
    v = View(
        name="user_values",
        source=TableSource(name="events", table="events", timestamp_field="ts"),
        entities=[USER],
        features=["value"],
    )
    s.apply([v])
    s.materialize()
    server = serve(s, port=0)
    yield s, server
    server.shutdown()


def _post(server, path, obj):
    port = server.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_health_and_get_online_features(served_store):
    s, server = served_store
    port = server.server_address[1]
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
        assert json.loads(r.read())["status"] == "ok"

    out = _post(
        server,
        "/get-online-features",
        {"features": ["user_values:value"], "entities": {"user_id": [1, 2]}},
    )
    assert "value" in out["metadata"]["feature_names"]
    vcol = out["metadata"]["feature_names"].index("value")
    served_vals = out["results"][vcol]["values"]
    exp = s.get_online_features(
        ["user_values:value"], [{"user_id": 1}, {"user_id": 2}]
    )["value"].tolist()
    assert [pytest.approx(e) if e == e else None for e in exp] == [
        pytest.approx(v) if v is not None else None for v in served_vals
    ] or served_vals == [None if e != e else pytest.approx(e) for e in exp]


def test_bad_request(served_store):
    _, server = served_store
    port = server.server_address[1]
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/get-online-features",
        data=b"{not json",
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised


def test_push_and_materialize_endpoints(tmp_path, sf_small, ray_session):
    """The reference server's /push and /materialize(-incremental)
    endpoints (feature_server.py:812,958): push upserts rows into the
    online plane over HTTP; materialize loads a window; permission
    denials surface as 403."""
    import json
    import urllib.request

    import pandas as pd

    from feast_ray.serve import serve
    from feast_ray.store import Store
    from feast_ray.views import Entity, TableSource, View

    st = Store(str(tmp_path / "repo"), sf_small)
    st.apply([View(
        name="user_values",
        source=TableSource(name="events", table="events", timestamp_field="ts"),
        entities=[Entity("user", "user_id")],
        features=["value"],
    )])
    server = serve(st, port=0)
    try:
        port = server.server_address[1]

        def post(path, payload, auth=None):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json",
                         **({"Authorization": auth} if auth else {})},
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        code, resp = post("/materialize", {"views": ["user_values"]})
        assert code == 200 and "user_values" in resp["materialized"]
        code, resp = post("/push", {
            "view": "user_values",
            "df": {"user_id": [777], "ts": ["2024-06-01T00:00:00"],
                   "value": [42.5]},
        })
        assert code == 200 and resp["pushed"] == 1
        out = st.get_online_features(["user_values:value"], [{"user_id": 777}])
        assert float(out["value"].iloc[0]) == 42.5

        # permissions: pushing without the writer role is a 403
        from feast_ray.permissions import (
            WRITE,
            Permission,
            RoleBasedPolicy,
        )

        st.apply([Permission(
            name="writer_only", actions=tuple(WRITE),
            policy=RoleBasedPolicy(["writer"]),
        )])
        code, resp = post("/push", {
            "view": "user_values",
            "df": {"user_id": [778], "ts": ["2024-06-01T00:00:00"],
                   "value": [1.0]},
        }, auth="Bearer eve:intern")
        assert code == 403
        code, resp = post("/push", {
            "view": "user_values",
            "df": {"user_id": [778], "ts": ["2024-06-01T00:00:00"],
                   "value": [1.0]},
        }, auth="Bearer job:writer")
        assert code == 200
    finally:
        server.shutdown()
