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

__all__ = ["Field", "Schema", "validate_table"]
__version__ = "0.1.0"
