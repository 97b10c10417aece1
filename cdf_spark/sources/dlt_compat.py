"""dlt-compatible authoring shim.

Re-expresses the reference's Python-facing dlt surface
(`python/cdf_sdk/dlt.py:19-176`): ``@dlt.source`` / ``@dlt.resource``
decorators that attach declarative metadata to plain generator
functions, plus the ``incremental`` cursor hint with dlt's state
semantics (last_value tracking, initial/end bounds, row ordering
hints). The decorated functions remain ordinary callables; this module
additionally binds them into the engine (ResourceDescriptor +
PythonResource) so a dlt-authored resource runs through the same
LoadPipeline/contract/package path as every other source.

State model (dlt parity): each resource's incremental state is one
JSON-able mapping ``{"last_value": ...}`` keyed by resource name.
``pipeline_state`` keeps it in-process; callers persist it next to
their checkpoint ledger (the engine's CursorPosition is the
checkpointed twin of dlt's last_value).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence
from dataclasses import dataclass, field
from typing import Any

from .base import CursorSpec, ResourceDescriptor
from .python_source import PythonResource


@dataclass
class Incremental:
    """dlt-style incremental cursor hint with runtime state.

    ``last_value`` carries the high-water mark across runs; rows whose
    cursor value is <= last_value (or > end_value when bounded) are
    filtered out, and the mark advances to the max seen.
    """

    cursor_path: str
    initial_value: Any = None
    end_value: Any = None
    row_order: str | None = None  # "asc" | "desc" | None
    _state: dict = field(default_factory=dict, repr=False)

    @property
    def last_value(self):
        return self._state.get("last_value", self.initial_value)

    @last_value.setter
    def last_value(self, v) -> None:
        self._state["last_value"] = v

    def bind_state(self, state: dict) -> "Incremental":
        self._state = state
        return self

    def accept(self, row: dict) -> bool:
        v = row.get(self.cursor_path)
        if v is None:
            return True
        if self.last_value is not None and v <= self.last_value:
            return False
        return not (self.end_value is not None and v > self.end_value)

    def observe(self, row: dict) -> None:
        v = row.get(self.cursor_path)
        if v is None:
            return
        if self.last_value is None or v > self.last_value:
            self.last_value = v


def incremental(
    cursor_path: str,
    initial_value: Any = None,
    end_value: Any = None,
    row_order: str | None = None,
) -> Incremental:
    return Incremental(cursor_path, initial_value, end_value, row_order)


def _keys(value: str | Sequence[str] | None) -> list[str] | None:
    if value is None:
        return None
    return [value] if isinstance(value, str) else list(value)


DLT_META_ATTR = "__cdf_dlt_meta__"


def resource(
    func: Callable | None = None,
    /,
    *,
    name: str | None = None,
    table_name: str | None = None,
    primary_key: str | Sequence[str] | None = None,
    merge_key: str | Sequence[str] | None = None,
    write_disposition: str = "append",
    columns: dict[str, str] | None = None,
    selected: bool = True,
    incremental: Incremental | None = None,
):
    """``@dlt.resource`` — declare a generator as a loadable resource."""

    def decorate(fn: Callable) -> Callable:
        meta = {
            "kind": "resource",
            "name": name or fn.__name__,
            "table_name": table_name or name or fn.__name__,
            "primary_key": _keys(primary_key),
            "merge_key": _keys(merge_key),
            "write_disposition": write_disposition,
            "columns": columns,
            "selected": selected,
            "incremental": incremental,
        }
        setattr(fn, DLT_META_ATTR, meta)
        return fn

    return decorate(func) if func is not None else decorate


def source(func: Callable | None = None, /, *, name: str | None = None):
    """``@dlt.source`` — a function returning (or yielding) resources."""

    def decorate(fn: Callable) -> Callable:
        setattr(fn, DLT_META_ATTR, {"kind": "source", "name": name or fn.__name__})
        return fn

    return decorate(func) if func is not None else decorate


def resources_of(source_fn: Callable, *args, **kwargs) -> dict[str, Callable]:
    """Materialize a @source function into its selected @resource
    members (dlt sources return an iterable of resources)."""
    meta = getattr(source_fn, DLT_META_ATTR, None)
    if not meta or meta["kind"] != "source":
        raise TypeError("not a @dlt source function")
    out = {}
    for r in source_fn(*args, **kwargs):
        rmeta = getattr(r, DLT_META_ATTR, None)
        if not rmeta or rmeta["kind"] != "resource":
            raise TypeError(f"source yielded a non-resource: {r!r}")
        if rmeta["selected"]:
            out[rmeta["name"]] = r
    return out


def to_descriptor(resource_fn: Callable) -> ResourceDescriptor:
    """dlt metadata -> engine ResourceDescriptor (cursor from the
    incremental hint, dedup from primary/merge keys)."""
    meta = getattr(resource_fn, DLT_META_ATTR, None)
    if not meta or meta["kind"] != "resource":
        raise TypeError("not a @dlt resource function")
    inc: Incremental | None = meta["incremental"]
    keys = meta["merge_key"] or meta["primary_key"]
    return ResourceDescriptor(
        resource_id=meta["name"],
        schema=meta["columns"],
        primary_key=meta["primary_key"],
        cursor=CursorSpec(inc.cursor_path, initial_value=inc.initial_value) if inc else None,
        dedup_keys=keys,
    )


class pipeline_state:
    """In-process state store with dlt's shape: one mapping per
    resource. Persist/restore via plain dicts (``snapshot``/``load``)."""

    def __init__(self) -> None:
        self._by_resource: dict[str, dict] = {}

    def resource_state(self, name: str) -> dict:
        return self._by_resource.setdefault(name, {})

    def snapshot(self) -> dict:
        return {k: dict(v) for k, v in self._by_resource.items()}

    def load(self, data: dict) -> "pipeline_state":
        self._by_resource = {k: dict(v) for k, v in data.items()}
        return self


def run_resource(
    spark,
    resource_fn: Callable,
    state: pipeline_state | None = None,
    **kwargs,
):
    """Execute a @dlt resource: generator rows -> DataFrame, with the
    incremental filter applied and last_value advanced (dlt cursor
    semantics). Returns (DataFrame, descriptor)."""
    meta = getattr(resource_fn, DLT_META_ATTR, None)
    if not meta or meta["kind"] != "resource":
        raise TypeError("not a @dlt resource function")
    desc = to_descriptor(resource_fn)
    inc: Incremental | None = meta["incremental"]
    if inc is not None and state is not None:
        inc.bind_state(state.resource_state(meta["name"]))

    all_rows = list(resource_fn(**kwargs))
    prior = inc.last_value if inc is not None else None  # mark BEFORE this run
    accepted = [r for r in all_rows if inc is None or inc.accept(r)]
    if inc is not None:
        for row in accepted:
            inc.observe(row)

    # build the frame from ALL rows (so an empty incremental delta still
    # has an inferable schema), then apply the cursor window in-plan —
    # the same (prior, end] predicate accept() used for the state advance
    pyres = PythonResource(descriptor=desc, fn=lambda: all_rows)
    df = pyres.read(spark)
    if inc is not None:
        from pyspark.sql import functions as F

        c = F.col(inc.cursor_path)
        if prior is not None:
            df = df.filter(c > F.lit(prior))
        if inc.end_value is not None:
            df = df.filter(c <= F.lit(inc.end_value))
    return df, desc
