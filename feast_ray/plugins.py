"""Pluggable-component loader — the reference's dotted-path plugin
convention (feast/utils or infra provider/online-store resolution:
`feast.infra.passthrough_provider.PassthroughProvider`-style strings in
config, resolved via get_class_from_type / import_class). Lets view
UDFs, model stages and quality rules be named by string in declarative
configs instead of imported by hand."""

from __future__ import annotations

import importlib
from typing import Any


def import_class(path: str, expected_base: type | None = None) -> Any:
    """Resolve ``"pkg.module:attr"`` (or ``"pkg.module.attr"``) to the
    attribute. With ``expected_base``, the resolved object must be a
    subclass (or instance) of it — a config typo fails loudly here, not
    deep inside a worker."""
    if ":" in path:
        mod_name, attr = path.split(":", 1)
    else:
        mod_name, _, attr = path.rpartition(".")
    if not mod_name:
        raise ValueError(f"not a dotted path: {path!r}")
    try:
        mod = importlib.import_module(mod_name)
    except ImportError as e:
        raise ImportError(f"cannot import module {mod_name!r} for {path!r}") from e
    try:
        obj = getattr(mod, attr)
    except AttributeError as e:
        raise ImportError(f"{mod_name!r} has no attribute {attr!r}") from e
    if expected_base is not None:
        if isinstance(obj, type):
            if not issubclass(obj, expected_base):
                raise TypeError(
                    f"{path!r} is not a subclass of {expected_base.__name__}"
                )
        elif not isinstance(obj, expected_base):
            raise TypeError(
                f"{path!r} is not an instance of {expected_base.__name__}"
            )
    return obj


def resolve_udf(udf):
    """A udf given as a dotted-path string becomes the callable it
    names; callables pass through. Used by Store.build_view_ds and
    stages.transform so declarative configs can name their transforms."""
    if isinstance(udf, str):
        obj = import_class(udf)
        if not callable(obj):
            raise TypeError(f"{udf!r} resolved to a non-callable")
        return obj
    return udf
