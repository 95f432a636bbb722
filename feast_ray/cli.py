"""CLI — the reference's ``feast`` command subset, runnable directly or
via ``ray job submit -- python -m feast_ray.cli <cmd>``.

Commands (reference: cli/cli.py):
- ``apply``        register the demo view set into a repo dir
- ``materialize``  offline→online load for [start, end)
- ``materialize-incremental`` resume from the registry watermark
- ``quality-filter`` run the flagship web-text pipeline to parquet
  (resumable; re-run after a kill skips committed partitions)
- ``stats``        print registry + online-plane row counts

This module is the one place (besides bench.py and tests) that owns a
Ray session: it guards ``ray.init`` so the driver contract
(__ray_entry__ must not init) stays intact.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from datetime import datetime


def _ensure_ray(num_cpus: int | None = None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _demo_store(repo: str, data: str):
    from datetime import timedelta

    from feast_ray.stages.aggregate import AggSpec
    from feast_ray.store import Store
    from feast_ray.views import Entity, FeatureService, TableSource, View

    user = Entity("user", "user_id")
    events = TableSource(name="events", table="events", timestamp_field="ts")
    store = Store(repo, data)
    store.apply(
        [
            View(name="user_values", source=events, entities=[user],
                 ttl=timedelta(days=2), features=["value"]),
            View(name="user_stats", source=events, entities=[user],
                 aggregations=[AggSpec("value", "sum", "total_value"),
                               AggSpec(None, "count", "n_events")],
                 features=["total_value", "n_events"]),
            FeatureService("user_svc", ("user_values:value", "user_stats:total_value")),
        ]
    )
    return store


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="feast_ray")
    p.add_argument("--repo", default="/tmp/feast_ray_repo")
    p.add_argument("--data", default="/root/testdata/sf0.001")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("apply")
    m = sub.add_parser("materialize")
    m.add_argument("--start", default=None)
    m.add_argument("--end", default=None)
    mi = sub.add_parser("materialize-incremental")
    mi.add_argument("--end", required=True)
    qf = sub.add_parser("quality-filter")
    qf.add_argument("--out", default="/tmp/feast_ray_corpus")
    qf.add_argument("--partitions", type=int, default=8)
    qf.add_argument("--no-resume", action="store_true")
    ex = sub.add_parser("export-corpus")
    ex.add_argument("--out", default="/tmp/feast_ray_export")
    sub.add_parser("stats")
    sv = sub.add_parser("serve")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=6566)
    sr = sub.add_parser("serve-registry")  # reference: feast serve_registry
    sr.add_argument("--host", default="127.0.0.1")
    sr.add_argument("--port", type=int, default=6570)
    args = p.parse_args(argv)

    _ensure_ray(args.num_cpus)
    import ray

    try:
        if args.cmd == "apply":
            store = _demo_store(args.repo, args.data)
            print(json.dumps({"views": sorted(store.views), "services": sorted(store.services)}))
        elif args.cmd == "materialize":
            store = _demo_store(args.repo, args.data)
            start = datetime.fromisoformat(args.start) if args.start else None
            end = datetime.fromisoformat(args.end) if args.end else None
            print(json.dumps(store.materialize(start, end)))
        elif args.cmd == "materialize-incremental":
            store = _demo_store(args.repo, args.data)
            print(json.dumps(store.materialize_incremental(datetime.fromisoformat(args.end))))
        elif args.cmd == "quality-filter":
            from feast_ray.pipelines.quality_filter import (
                PIPELINE_VERSION,
                quality_filter,
                quality_metrics,
            )
            from feast_ray.sources import synth_webpages
            from feast_ray.state import materialize_resumable

            res = materialize_resumable(
                lambda ds: quality_filter(ds, validate_input=False),
                synth_webpages(args.data),
                args.out,
                num_partitions=args.partitions,
                version=PIPELINE_VERSION,
                resume=not args.no_resume,
                metrics_fn=quality_metrics,
            )
            print(json.dumps(res))
        elif args.cmd == "export-corpus":
            from feast_ray.pipelines.corpus_export import export_corpus
            from feast_ray.pipelines.quality_filter import quality_filter
            from feast_ray.sources import synth_webpages

            res = quality_filter(synth_webpages(args.data), validate_input=False)
            counts = export_corpus(res, args.out)
            print(json.dumps(counts, sort_keys=True))
        elif args.cmd == "serve":
            # the reference's `feast serve` entry point (feature_store.py:4640)
            store = _demo_store(args.repo, args.data)
            store.materialize()
            from feast_ray.serve import serve as _serve

            server = _serve(store, host=args.host, port=args.port)
            print(json.dumps({"serving": list(server.server_address)}))
            import time as _time

            try:
                while True:
                    _time.sleep(3600)
            except KeyboardInterrupt:
                server.shutdown()
        elif args.cmd == "serve-registry":
            # the reference's `feast serve_registry` (registry service)
            store = _demo_store(args.repo, args.data)
            from feast_ray.registry_server import serve_registry as _sreg

            server = _sreg(store, host=args.host, port=args.port)
            print(json.dumps({"registry_serving": list(server.server_address)}))
            import time as _time

            try:
                while True:
                    _time.sleep(3600)
            except KeyboardInterrupt:
                server.shutdown()
        elif args.cmd == "stats":
            store = _demo_store(args.repo, args.data)
            reg = store._load_registry()
            counts = {}
            online_root = os.path.join(args.repo, "online")
            if os.path.isdir(online_root):
                for v in os.listdir(online_root):
                    try:
                        counts[v] = store.online.read(v).num_rows
                    except Exception:  # noqa: BLE001
                        counts[v] = None
            print(json.dumps({"registry": reg, "online_rows": counts}, default=str))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
