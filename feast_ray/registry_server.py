"""Remote registry — server + client.

The reference runs its registry as a standalone service
(``feast serve_registry``; infra/registry/remote.py ``RemoteRegistry``
is a gRPC client proxying every registry method, and
infra/registry/caching_registry.py wraps it with a TTL'd local cache).
Recast here over stdlib HTTP (no gRPC toolchain in this environment):

- :func:`serve_registry` exposes a Store's registry:
  ``GET /registry`` (full manifest), ``GET /views`` /
  ``GET /views/<name>`` (specs), ``GET /watermarks/<view>``, and
  ``POST /apply`` ({"views": [spec...], "services": [spec...]}) which
  routes through ``Store.apply`` — so the permissions layer enforces
  CREATE/UPDATE exactly as for local applies, with the same dev bearer
  principal as the feature server (serve.py).
- :class:`RemoteRegistry` is the client: object getters backed by a
  manifest cache refreshed at ``cache_ttl_s`` (the caching registry's
  shape), plus ``apply()``.
- ``Store.sync_from(remote)`` pulls every view/service spec into a
  local store — the serving-replica bootstrap: replicas share the
  online plane on disk and learn the object catalog from the registry
  service instead of re-running apply scripts.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def _make_handler(store, auth=None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, obj) -> None:
            body = json.dumps(obj, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _manifest(self) -> dict:
            from feast_ray.views import service_to_dict, view_to_dict

            reg = store._load_registry()
            return {
                "views": {n: view_to_dict(v) for n, v in store.views.items()},
                "services": {
                    n: service_to_dict(s) for n, s in store.services.items()
                },
                "watermarks": reg.get("watermarks", {}),
                "permissions": [p.name for p in store.security.permissions],
            }

        def _bind_principal(self):
            """Per-request principal from the bearer header (the
            feature server's shape, serve.py). With a StaticTokenAuth
            installed the token is validated server-side; otherwise
            this is dev identity ASSERTION (testing only). Returns
            ``(ok, token)``: ok=False means a 401 was already sent;
            token is the contextvar reset handle or None."""
            from feast_ray.permissions import User, set_current_user

            hdr = self.headers.get("Authorization", "")
            bearer = (
                hdr[len("Bearer ") :].strip()
                if hdr.startswith("Bearer ")
                else ""
            )
            if auth is not None:
                user = auth.authenticate(bearer) if bearer else None
                if user is None:
                    self._send(
                        401, {"error": "invalid or missing bearer token"}
                    )
                    return False, None
                return True, set_current_user(user)
            if not bearer:
                return True, None
            name, _, roles = bearer.partition(":")
            return True, set_current_user(
                User(name, tuple(r for r in roles.split(",") if r))
            )

        def _describable(self):
            """Views/services the current principal may DESCRIBE —
            registry READS are enforced like every other plane
            (code-review r4: GETs bypassed the permissions the same
            PR introduced; the reference enforces DESCRIBE on
            registry reads). Open until Permissions are applied."""
            from feast_ray.permissions import Action

            views = store.security.permitted_resources(
                list(store.views.values()), Action.DESCRIBE
            )
            services = store.security.permitted_resources(
                list(store.services.values()), Action.DESCRIBE
            )
            return {v.name for v in views}, {s.name for s in services}

        def do_GET(self):
            from feast_ray.permissions import PermissionDenied, _current_user

            ok, token = self._bind_principal()
            if not ok:
                return
            try:
                self._get_route()
            except PermissionDenied as e:
                self._send(403, {"error": f"PermissionDenied: {e}"})
            except Exception as e:  # noqa: BLE001 — serving surface:
                # an unexpected _get_route error must come back as a
                # JSON 500, not a dropped connection (advice r4)
                self._send(500, {"error": f"{type(e).__name__}: {e}"})
            finally:
                if token is not None:
                    _current_user.reset(token)

        def _get_route(self):
            parts = [p for p in self.path.split("/") if p]
            if self.path == "/health":
                self._send(200, {"status": "ok"})
                return
            vnames, snames = self._describable()
            if self.path == "/registry":
                m = self._manifest()
                m["views"] = {k: v for k, v in m["views"].items() if k in vnames}
                m["services"] = {
                    k: v for k, v in m["services"].items() if k in snames
                }
                m["watermarks"] = {
                    k: v for k, v in m["watermarks"].items() if k in vnames
                }
                self._send(200, m)
            elif self.path == "/views":
                self._send(200, sorted(vnames))
            elif len(parts) == 2 and parts[0] == "views":
                if parts[1] not in vnames:
                    self._send(
                        404, {"error": f"view {parts[1]!r} not found"}
                    )
                    return
                self._send(200, self._manifest()["views"].get(parts[1]))
            elif len(parts) == 2 and parts[0] == "watermarks":
                if parts[1] not in vnames:
                    self._send(
                        404, {"error": f"view {parts[1]!r} not found"}
                    )
                    return
                reg = store._load_registry()
                self._send(200, reg.get("watermarks", {}).get(parts[1], []))
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            from feast_ray.permissions import PermissionDenied, _current_user
            from feast_ray.views import service_from_dict, view_from_dict

            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                self._send(400, {"error": "invalid json"})
                return
            ok, token = self._bind_principal()
            if not ok:
                return
            try:
                if self.path == "/apply":
                    objs = [view_from_dict(d) for d in req.get("views", [])]
                    objs += [
                        service_from_dict(d) for d in req.get("services", [])
                    ]
                    store.apply(objs)
                    self._send(200, {"applied": len(objs)})
                else:
                    self._send(404, {"error": "not found"})
            except PermissionDenied as e:
                self._send(403, {"error": f"PermissionDenied: {e}"})
            except Exception as e:  # noqa: BLE001 — serving surface
                self._send(500, {"error": f"{type(e).__name__}: {e}"})
            finally:
                if token is not None:
                    _current_user.reset(token)

    return Handler


def serve_registry(
    store, host: str = "127.0.0.1", port: int = 6570, auth=None
) -> ThreadingHTTPServer:
    """Start the registry server in a daemon thread; returns the server
    (``server.server_address`` has the bound port). ``auth``: a
    ``permissions.StaticTokenAuth`` to require server-side-validated
    bearer tokens (None = dev identity assertion, testing only)."""
    server = ThreadingHTTPServer((host, port), _make_handler(store, auth))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server


class RemoteRegistry:
    """HTTP registry client with a TTL'd manifest cache
    (reference: infra/registry/remote.py + caching_registry.py's
    refresh-interval cache; every getter reads the cache, ``refresh()``
    forces a fetch)."""

    def __init__(self, endpoint: str, cache_ttl_s: float = 60.0,
                 bearer: "str | None" = None):
        self.endpoint = endpoint.rstrip("/")
        self.cache_ttl_s = cache_ttl_s
        self.bearer = bearer
        self._cache: "dict | None" = None
        self._fetched_at = 0.0

    # ------------------------------------------------------------ http

    def _req(self, path: str, payload: "dict | None" = None) -> dict:
        headers = {"Content-Type": "application/json"}
        if self.bearer:
            headers["Authorization"] = f"Bearer {self.bearer}"
        data = json.dumps(payload).encode() if payload is not None else None
        req = urllib.request.Request(
            f"{self.endpoint}{path}", data=data, headers=headers
        )
        try:
            with urllib.request.urlopen(req, timeout=10) as r:
                return json.loads(r.read())
        except urllib.error.HTTPError as e:
            body = e.read()
            try:
                msg = json.loads(body).get("error", body.decode())
            except Exception:  # noqa: BLE001
                msg = body.decode(errors="replace")
            if e.code == 403:
                from feast_ray.permissions import PermissionDenied

                raise PermissionDenied(msg) from None
            raise RuntimeError(f"registry {e.code}: {msg}") from None

    # ----------------------------------------------------------- cache

    def _manifest(self) -> dict:
        now = time.monotonic()
        if self._cache is None or now - self._fetched_at > self.cache_ttl_s:
            self._cache = self._req("/registry")
            self._fetched_at = now
        return self._cache

    def refresh(self) -> None:
        """Invalidate + refetch (caching_registry.refresh shape)."""
        self._cache = None
        self._manifest()

    # --------------------------------------------------------- getters

    def list_views(self) -> list[str]:
        return sorted(self._manifest()["views"])

    def get_view(self, name: str):
        from feast_ray.views import view_from_dict

        spec = self._manifest()["views"].get(name)
        if spec is None:
            raise KeyError(f"view {name!r} not in remote registry")
        return view_from_dict(spec)

    def list_services(self) -> list[str]:
        return sorted(self._manifest()["services"])

    def get_service(self, name: str):
        from feast_ray.views import service_from_dict

        spec = self._manifest()["services"].get(name)
        if spec is None:
            raise KeyError(f"service {name!r} not in remote registry")
        return service_from_dict(spec)

    def watermarks(self, view_name: str) -> list:
        return self._req(f"/watermarks/{view_name}")

    # ----------------------------------------------------------- apply

    def apply(self, objects: list) -> int:
        """Apply views/services through the remote registry (enforced
        server-side by its permissions + this client's bearer)."""
        from feast_ray.views import (
            FeatureService,
            View,
            service_to_dict,
            view_to_dict,
        )

        views = [view_to_dict(o) for o in objects if isinstance(o, View)]
        services = [
            service_to_dict(o) for o in objects if isinstance(o, FeatureService)
        ]
        out = self._req("/apply", {"views": views, "services": services})
        self._cache = None  # applied objects must be visible next read
        return out["applied"]
