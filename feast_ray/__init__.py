"""feast_ray — a from-scratch Ray-Data-native data-processing engine.

Re-expresses the query / data-processing capabilities of feast-dev/feast
(reference at /root/reference, see SURVEY.md) as idiomatic Ray Data
pipelines: every logical table is a ``ray.data.Dataset`` of Arrow blocks,
every operator is a ``map_batches`` / ``groupby`` / actor-pool stage, and
the flagship pipeline is a web-text quality filter (language-ID +
heuristic quality rules + PII scrub) per BASELINE.json's north rule.

Nothing here ports reference code; reference file:line citations in
docstrings mark which *semantics* each component reproduces.
"""

from feast_ray.schema import Field, Schema, validate_table


def __getattr__(name):
    # lazy: the Store surface pulls in ray.data; keep bare imports light
    if name in ("Store", "OnlineParquetStore"):
        from feast_ray import store

        return getattr(store, name)
    if name in ("Entity", "View", "TableSource", "FeatureService", "OnDemandView"):
        from feast_ray import views

        return getattr(views, name)
    if name == "FType":
        from feast_ray.types import FType

        return FType
    raise AttributeError(name)


__all__ = [
    "Field", "Schema", "validate_table",
    "Store", "OnlineParquetStore",
    "Entity", "View", "TableSource", "FeatureService", "OnDemandView",
    "FType",
]
__version__ = "0.1.0"
