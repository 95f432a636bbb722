"""Declarative view layer — the reference's registry object model
recast for Ray Data.

Semantics reproduced (SURVEY.md §1.1):
- ``Entity`` (feast/entity.py:28-90) — named join key.
- ``TableSource`` ≈ FileSource (infra/offline_stores/file_source.py:32):
  parquet path/table + timestamp_field + created_timestamp_column +
  field_mapping renames.
- ``View`` ≈ FeatureView / BatchFeatureView (feast/feature_view.py:111-341,
  batch_feature_view.py:31): entities, schema, ttl, optional ``udf``
  batch transform, optional ``aggregations``, source (a TableSource or
  another View — the derived-view chain, ray/nodes.py:769-834).
- ``FeatureService`` (feast/feature_service.py:33) — a named bundle of
  "view:feature" references.

A view COMPILES to a lazy Ray Dataset via ``feast_ray.store.Store``:
Source → [Transform] → [Filter] → (Aggregate | passthrough), the
reference's canonical node order (feature_builder.py:81-142).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import timedelta
from typing import Callable

from feast_ray.schema import Schema
from feast_ray.stages.aggregate import AggSpec


@dataclass(frozen=True)
class Entity:
    name: str
    join_key: str | None = None

    @property
    def key(self) -> str:
        return self.join_key or self.name


@dataclass(frozen=True)
class TableSource:
    """Parquet table source. ``table`` resolves to {sf_dir}/{table}.parquet
    under the store's data dir; ``path`` overrides with an explicit path."""

    name: str
    table: str | None = None
    path: str | None = None
    timestamp_field: str | None = None
    created_timestamp_column: str | None = None
    field_mapping: dict[str, str] = field(default_factory=dict)


@dataclass
class View:
    name: str
    source: "TableSource | View"
    entities: list[Entity] = field(default_factory=list)
    schema: Schema | None = None
    ttl: timedelta | None = None
    udf: Callable | None = None          # batch transform: pa.Table -> pa.Table
    sql: str | None = None               # SQL-mode transform over `batch` (row-local)
    aggregations: list[AggSpec] = field(default_factory=list)
    window: timedelta | None = None      # with aggregations: tumbling window
    slide: timedelta | None = None       # with window: sliding hop
    features: list[str] = field(default_factory=list)  # feature column names
    online: bool = True
    tags: dict = field(default_factory=dict)  # metadata; permission required_tags match these

    @property
    def join_keys(self) -> list[str]:
        return [e.key for e in self.entities]

    @property
    def timestamp_field(self) -> str | None:
        src = self.source
        while isinstance(src, View):
            src = src.source
        return src.timestamp_field

    @property
    def created_timestamp_column(self) -> str | None:
        src = self.source
        while isinstance(src, View):
            src = src.source
        return src.created_timestamp_column


@dataclass(frozen=True)
class FeatureService:
    name: str
    features: tuple[str, ...]  # "view:feature" refs


@dataclass
class OnDemandView:
    """Request-time transform over joined features (+ request data) —
    the reference's OnDemandFeatureView
    (feast/on_demand_feature_view.py:116-210): a transform applied to
    the retrieval result at collection time, in pandas, pyarrow or
    SUBSTRAIT mode (the reference's third transformation kind,
    transformation/substrait_transformation.py). ``sources`` are
    "view:feature" refs pulled in before the transform runs;
    ``features`` are the columns the transform adds.

    ``mode="substrait"``: ``substrait_plan`` is a serialized Substrait
    ExtendedExpression (e.g. from ``pyarrow.substrait
    .serialize_expressions``); each named expression becomes an output
    column, evaluated Arrow-native per batch — a portable plan instead
    of a pickled Python udf."""

    name: str
    udf: "Callable | None" = None  # pd.DataFrame -> pd.DataFrame (mode="pandas")
    sources: tuple[str, ...] = ()
    features: tuple[str, ...] = ()
    mode: str = "pandas"  # "pyarrow": pa.Table -> pa.Table; "substrait"
    substrait_plan: "bytes | None" = None

    def transform_fn(self) -> Callable:
        """The batch callable for this view's mode (pandas/pyarrow:
        the udf itself; substrait: the plan evaluator)."""
        if self.mode == "substrait":
            if self.substrait_plan is None:
                raise ValueError(f"OnDemandView {self.name}: mode='substrait' needs substrait_plan")
            from feast_ray.stages.transform import substrait_eval

            plan = bytes(self.substrait_plan)
            return lambda t, p=plan: substrait_eval(t, p)
        if self.udf is None:
            raise ValueError(f"OnDemandView {self.name}: udf required for mode={self.mode!r}")
        return self.udf


# ------------------------------------------------------- serialization
# Registry wire format (the reference serializes registry objects as
# protos, e.g. feature_view.py to_proto/from_proto; JSON dicts here —
# no proto toolchain in this environment). Python ``udf`` callables
# don't survive the wire (the reference ships pickled transformation
# bytecode; out of scope): a view spec records the udf's NAME and
# rebuilds with udf=None, while ``sql`` / ``aggregations`` / substrait
# plans round-trip fully.


def _dtype_str(dt) -> str:
    return str(dt)


def _parse_dtype(s: str):
    import pyarrow as pa

    if s.startswith("timestamp"):
        inner = s[s.index("[") + 1 : s.index("]")] if "[" in s else "us"
        # str(pa.timestamp('us', tz='UTC')) == 'timestamp[us, tz=UTC]'
        unit, _, tz = inner.partition(", tz=")
        return pa.timestamp(unit, tz=tz or None)
    if s.startswith("list<item: ") and s.endswith(">"):
        return pa.list_(_parse_dtype(s[len("list<item: ") : -1]))
    return pa.type_for_alias(s)


def _schema_to_list(schema: "Schema | None"):
    if schema is None:
        return None
    return [[f.name, _dtype_str(f.dtype)] for f in schema.fields]


def _schema_from_list(lst):
    if lst is None:
        return None
    return Schema([(n, _parse_dtype(t)) for n, t in lst])


def _td_s(td: "timedelta | None") -> "float | None":
    return None if td is None else td.total_seconds()


def _td(s: "float | None") -> "timedelta | None":
    return None if s is None else timedelta(seconds=s)


def source_to_dict(src: "TableSource | View") -> dict:
    if isinstance(src, View):
        return {"kind": "view", **view_to_dict(src)}
    return {
        "kind": "table",
        "name": src.name,
        "table": src.table,
        "path": src.path,
        "timestamp_field": src.timestamp_field,
        "created_timestamp_column": src.created_timestamp_column,
        "field_mapping": dict(src.field_mapping),
    }


def source_from_dict(d: dict) -> "TableSource | View":
    if d["kind"] == "view":
        return view_from_dict(d)
    return TableSource(
        name=d["name"],
        table=d.get("table"),
        path=d.get("path"),
        timestamp_field=d.get("timestamp_field"),
        created_timestamp_column=d.get("created_timestamp_column"),
        field_mapping=d.get("field_mapping") or {},
    )


def view_to_dict(v: View) -> dict:
    return {
        "name": v.name,
        "source": source_to_dict(v.source),
        "entities": [[e.name, e.join_key] for e in v.entities],
        "schema": _schema_to_list(v.schema),
        "ttl_s": _td_s(v.ttl),
        "udf_name": getattr(v.udf, "__name__", None) if v.udf else None,
        "sql": v.sql,
        "aggregations": [
            {"col": a.col, "fn": a.fn, "alias": a.alias} for a in v.aggregations
        ],
        "window_s": _td_s(v.window),
        "slide_s": _td_s(v.slide),
        "features": list(v.features),
        "online": v.online,
        "tags": dict(v.tags),
    }


def view_from_dict(d: dict) -> View:
    return View(
        name=d["name"],
        source=source_from_dict(d["source"]),
        entities=[Entity(n, jk) for n, jk in d.get("entities", [])],
        schema=_schema_from_list(d.get("schema")),
        ttl=_td(d.get("ttl_s")),
        udf=None,  # callables don't round-trip; udf_name preserved in the spec
        sql=d.get("sql"),
        aggregations=[AggSpec(**a) for a in d.get("aggregations", [])],
        window=_td(d.get("window_s")),
        slide=_td(d.get("slide_s")),
        features=list(d.get("features", [])),
        online=d.get("online", True),
        tags=d.get("tags") or {},
    )


def service_to_dict(s: FeatureService) -> dict:
    return {"name": s.name, "features": list(s.features)}


def service_from_dict(d: dict) -> FeatureService:
    return FeatureService(name=d["name"], features=tuple(d["features"]))
