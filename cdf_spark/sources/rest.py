"""REST resources: declarative HTTP pagination.

Re-expresses the reference's REST source
(`crates/cdf-source-rest/src/runtime.rs:365-520`): a declarative
endpoint with pagination strategy (page-number / cursor-token /
offset), cursor predicate pushed as a query parameter
(`runtime.rs:370-380,515-520`), and replayable positions (the page
token IS the position).

Spark shape: pages are fetched on the DRIVER (control-plane I/O —
bounded by rate limits, not data volume) and turned into a DataFrame;
heavy post-processing distributes from there. A custom `fetcher`
injects the HTTP stack (and makes this testable without network);
without one we try urllib at call time.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..types.schema import CanonicalSchema
from .base import ResourceDescriptor


@dataclass
class Pagination:
    strategy: str = "page"          # page | cursor | offset | none
    param: str = "page"              # query param carrying page/cursor/offset
    start: object = 1
    size_param: str | None = None
    page_size: int = 100
    # cursor strategy: JSON path in the response yielding the next token
    next_token_field: str = "next"
    items_field: str | None = None   # JSON field holding the record list


@dataclass
class RestResource:
    descriptor: ResourceDescriptor
    url: str
    pagination: Pagination = field(default_factory=Pagination)
    params: dict[str, str] = field(default_factory=dict)
    headers: dict[str, str] = field(default_factory=dict)
    max_pages: int = 1000
    fetcher: Callable[[str, dict], dict] | None = None  # (url, params) -> parsed JSON

    def _fetch(self, params: dict) -> dict | list:
        if self.fetcher is not None:
            return self.fetcher(self.url, params)
        import urllib.parse
        import urllib.request

        qs = urllib.parse.urlencode(params)
        req = urllib.request.Request(f"{self.url}?{qs}", headers=self.headers)
        with urllib.request.urlopen(req, timeout=30) as resp:  # pragma: no cover
            return json.load(resp)

    def _extract_items(self, payload: dict | list) -> list[dict]:
        if isinstance(payload, list):
            return payload
        if self.pagination.items_field:
            return payload.get(self.pagination.items_field, []) or []
        return payload.get("items", payload.get("data", [])) or []

    def pages(self, cursor_resume: object | None = None) -> Iterator[tuple[list[dict], object]]:
        """Yield (rows, position) per page. The position is the page
        number / offset / token — the replayable resume point."""
        pg = self.pagination
        params = dict(self.params)
        # cursor predicate pushed as a query parameter (runtime.rs:515-520)
        cur = self.descriptor.cursor
        if cur is not None:
            resume = cursor_resume if cursor_resume is not None else cur.initial_value
            if resume is not None:
                params[f"{cur.field}_gt"] = str(resume)

        if pg.strategy == "none":
            payload = self._fetch(params)
            yield self._extract_items(payload), None
            return

        position = pg.start
        for _ in range(self.max_pages):
            page_params = dict(params)
            page_params[pg.param] = str(position)
            if pg.size_param:
                page_params[pg.size_param] = str(pg.page_size)
            payload = self._fetch(page_params)
            items = self._extract_items(payload)
            if not items:
                return
            yield items, position
            if pg.strategy == "page":
                position = int(position) + 1
            elif pg.strategy == "offset":
                position = int(position) + len(items)
            elif pg.strategy == "cursor":
                position = payload.get(pg.next_token_field) if isinstance(payload, dict) else None
                if position is None:
                    return

    def read(self, spark: SparkSession, cursor_resume: object | None = None) -> tuple[DataFrame, object]:
        """Fetch all pages -> DataFrame + last position."""
        rows: list[dict] = []
        last_pos = None
        for items, pos in self.pages(cursor_resume):
            rows.extend(items)
            last_pos = pos
        schema = (
            CanonicalSchema.from_declared(self.descriptor.schema).to_spark()
            if self.descriptor.schema
            else None
        )
        if not rows and schema is None:
            raise ValueError("empty REST response with no declared schema")
        df = spark.createDataFrame(rows, schema=schema)  # type: ignore[arg-type]
        return df, last_pos
