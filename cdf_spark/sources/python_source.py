"""Python generator resources.

Re-expresses the reference's Python SDK `@resource` surface
(`python/cdf_sdk/resource.py:14-80`, dlt-compat shim
`python/cdf_sdk/dlt.py:63-176`): a Python generator yields dict rows
(or pyarrow batches); the engine turns them into a DataFrame. Rows are
materialized driver-side — this is for small/control-plane feeds (REST
pages, seeds); large data belongs in file/JDBC resources. An optional
incremental cursor filters previously-seen rows, mirroring dlt's
`incremental` hint.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..types.schema import CanonicalSchema
from .base import CursorSpec, ResourceDescriptor


@dataclass
class PythonResource:
    descriptor: ResourceDescriptor
    fn: Callable[..., Iterable[dict]]

    def read(self, spark: SparkSession, cursor_resume: object | None = None, **kwargs) -> DataFrame:
        # Context injection (reference python/cdf_sdk/context.py:60-71):
        # a generator whose first parameter is named `context`/`ctx`
        # receives the engine-built capability object — cursor view
        # seeded from the resume position so the resource can push the
        # filter to its upstream instead of over-fetching.
        import inspect

        params = list(inspect.signature(self.fn).parameters)
        if params and params[0] in ("context", "ctx") and params[0] not in kwargs:
            from .context import build_context

            cur = self.descriptor.cursor
            positions = {cur.field: cursor_resume} if (cur and cursor_resume is not None) else {}
            kwargs[params[0]] = build_context(positions=positions)
        rows = list(self.fn(**kwargs))
        schema = (
            CanonicalSchema.from_declared(self.descriptor.schema).to_spark()
            if self.descriptor.schema
            else None
        )
        df = spark.createDataFrame(rows, schema=schema)  # type: ignore[arg-type]
        cur = self.descriptor.cursor
        if cur is not None:
            resume = cursor_resume if cursor_resume is not None else cur.initial_value
            if resume is not None:
                df = df.filter(df[cur.field] > resume)
        return df

    def __call__(self, *args, **kwargs) -> Iterator[dict]:
        return iter(self.fn(*args, **kwargs))


def python_resource(
    resource_id: str,
    schema: dict[str, str] | None = None,
    primary_key: list[str] | None = None,
    cursor: str | None = None,
    cursor_initial: object | None = None,
) -> Callable[[Callable[..., Iterable[dict]]], PythonResource]:
    """Decorator: ``@python_resource("my_feed", schema={...}, cursor="id")``."""

    def wrap(fn: Callable[..., Iterable[dict]]) -> PythonResource:
        desc = ResourceDescriptor(
            resource_id=resource_id,
            schema=schema,
            primary_key=primary_key or [],
            cursor=CursorSpec(cursor, cursor_initial) if cursor else None,
        )
        return PythonResource(desc, fn)

    return wrap
