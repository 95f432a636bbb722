"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported;
nothing here (or in feast_ray) calls ray.init()/ray.shutdown().

- ``entry()``     — flagship quality-filter pipeline on sf0.001.
- ``queries()``   — one entry per implemented operator/pipeline
                    (SURVEY.md §2 coverage; see feast_ray/pipelines/queries.py).
- ``oracle_sql()``— DuckDB-equivalent SQL for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001 (driver smoke check)."""
    from feast_ray.pipelines.quality_filter import quality_filter
    from feast_ray.sources import synth_webpages

    return quality_filter(synth_webpages("/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[str], Any]]:
    from feast_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from feast_ray.pipelines import queries as q

    return q.oracle_sql()
