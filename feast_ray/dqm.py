"""Data-quality monitoring: dataset profiles + validation.

Semantics reproduced: the reference's DQM profiler protocol
(dqm/profilers/profiler.py; Great Expectations impl
ge_profiler.py:1-203) and saved-dataset validation
(saved_dataset.py, feature_store.py:4782 validate_logged_features):
profile a reference dataset once, persist the profile, validate later
runs against it with tolerances. GE is not in the sandbox; the profile
is a plain statistical contract computed with a two-phase distributed
aggregate (never a driver collapse).
"""

from __future__ import annotations

import json
import math

import pandas as pd
import pyarrow as pa
import ray.data

from feast_ray.stages.aggregate import AggSpec, grouped_agg

_NUMERIC = ("int", "uint", "float", "double")


def profile_dataset(ds: ray.data.Dataset, columns: list[str] | None = None) -> dict:
    """One profile dict per column: count, null_frac, and for numeric
    columns min/max/mean/std — computed distributedly."""
    schema = ds.schema()
    cols = columns or list(schema.names)
    types = dict(zip(schema.names, [str(t) for t in schema.types]))
    numeric = [c for c in cols if any(k in types.get(c, "") for k in _NUMERIC)]

    specs: list[AggSpec] = [AggSpec(None, "count", "__n")]
    for c in numeric:
        specs += [
            AggSpec(c, "count", f"{c}__nn"),
            AggSpec(c, "mean", f"{c}__mean"),
            AggSpec(c, "std", f"{c}__std"),
            AggSpec(c, "min", f"{c}__min"),
            AggSpec(c, "max", f"{c}__max"),
        ]
    row = grouped_agg(ds, [], specs).to_pandas().iloc[0]
    n = int(row["__n"])
    prof: dict = {"row_count": n, "columns": {}}
    for c in cols:
        entry: dict = {"dtype": types.get(c, "unknown")}
        if c in numeric:
            entry.update(
                null_frac=1.0 - float(row[f"{c}__nn"]) / max(1, n),
                mean=float(row[f"{c}__mean"]),
                std=float(row[f"{c}__std"]),
                min=float(row[f"{c}__min"]),
                max=float(row[f"{c}__max"]),
            )
        prof["columns"][c] = entry
    return prof


def validate_against_profile(
    ds: ray.data.Dataset,
    profile: dict,
    *,
    mean_rtol: float = 0.15,
    range_slack: float = 0.0,
    row_count_rtol: float = 0.5,
) -> list[str]:
    """Validate a new dataset against a saved profile. Returns the list
    of violations (empty = pass), mirroring the reference's validation
    report shape (ValidationFailed carries per-expectation results)."""
    new = profile_dataset(ds, columns=list(profile["columns"]))
    problems: list[str] = []
    n0, n1 = profile["row_count"], new["row_count"]
    if n0 and abs(n1 - n0) / n0 > row_count_rtol:
        problems.append(f"row_count {n1} deviates >{row_count_rtol:%} from {n0}")
    for col, ref in profile["columns"].items():
        got = new["columns"].get(col)
        # a profiled-numeric column that is now missing or non-numeric
        # produces an entry WITHOUT stats — that IS the schema drift
        # this validator exists to catch (code-review r2 finding)
        if got is None or ("mean" in ref and "mean" not in got):
            problems.append(f"column {col} missing or no longer numeric")
            continue
        if "mean" in ref and not math.isnan(ref["mean"]):
            if ref["mean"] != 0 and abs(got["mean"] - ref["mean"]) / abs(ref["mean"]) > mean_rtol:
                problems.append(
                    f"{col}.mean {got['mean']:.4g} outside ±{mean_rtol:%} of {ref['mean']:.4g}"
                )
            lo = ref["min"] - range_slack
            hi = ref["max"] + range_slack
            if got["min"] < lo or got["max"] > hi:
                problems.append(f"{col} range [{got['min']}, {got['max']}] outside [{lo}, {hi}]")
    return problems


def save_profile(profile: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(profile, f, indent=1, sort_keys=True)


def load_profile(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
