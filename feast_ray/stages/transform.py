"""Transform stage: UDF over batches, stateless or actor-pool.

Semantics reproduced: the reference's Transform node and its UDF modes
(ray/nodes.py:657-766, transformation/ray_transformation.py:14-180,
transformation/pandas_transformation.py:93-100). The reference ships
dill-serialized UDFs to workers; Ray Data does that natively
(cloudpickle), so this wrapper only normalizes the two execution
flavors:

- plain function → stateless Ray tasks (cheap, elastic);
- callable class → actor pool, state built once per actor in
  ``__init__`` (model load / regex compile), per the reference's own
  documented pattern (transformation/ray_transformation.py:30-74).
"""

from __future__ import annotations

import inspect
from typing import Any

import ray.data


def transform(
    ds: ray.data.Dataset,
    fn: Any,
    *,
    batch_format: str = "pyarrow",
    batch_size: int | None = None,
    concurrency: int | tuple[int, int] | None = None,
    num_cpus: float | None = None,
    fn_constructor_args: tuple = (),
    zero_copy_batch: bool = True,
    **kwargs,
) -> ray.data.Dataset:
    opts: dict[str, Any] = dict(batch_format=batch_format, **kwargs)
    if batch_size is not None:
        opts["batch_size"] = batch_size
    if num_cpus is not None:
        opts["num_cpus"] = num_cpus
    if inspect.isclass(fn):
        opts["concurrency"] = concurrency or (1, 4)
        if fn_constructor_args:
            opts["fn_constructor_args"] = fn_constructor_args
    else:
        opts["zero_copy_batch"] = zero_copy_batch
        if concurrency is not None:
            opts["concurrency"] = concurrency
    return ds.map_batches(fn, **opts)
