"""Execution context for Python resources.

Re-expresses the reference SDK's `Context` protocol
(`python/cdf_sdk/context.py:9-71`): a resource generator receives one
injected object carrying the controlled capabilities — an HTTP client,
a secret provider, a read-only cursor view, and a logger — instead of
reaching for globals. The engine owns construction, so runs are
reproducible (cursor view reflects the checkpoint ledger) and secrets
never appear in resource code.

Driver-side by design: Python resources are control-plane feeds (REST
pages, seeds); the data plane goes through file/JDBC resources.
"""

from __future__ import annotations

import json as _json
import logging
import urllib.request
from collections.abc import Mapping
from dataclasses import dataclass, field


@dataclass
class HttpResponse:
    status_code: int
    headers: Mapping[str, str]
    body: bytes

    def json(self) -> object:
        return _json.loads(self.body)

    def text(self) -> str:
        return self.body.decode("utf-8", errors="replace")


class HttpClient:
    """Minimal stdlib HTTP client (`context.py:22-39` shape). A custom
    transport callable can be injected for tests/offline runs."""

    def __init__(self, transport=None, timeout: int = 30):
        self._transport = transport
        self._timeout = timeout

    def request(self, method: str, url: str, *, headers: Mapping[str, str] | None = None,
                body: bytes | None = None) -> HttpResponse:
        if self._transport is not None:
            return self._transport(method, url, headers or {}, body)
        req = urllib.request.Request(url, data=body, method=method, headers=dict(headers or {}))
        with urllib.request.urlopen(req, timeout=self._timeout) as resp:  # noqa: S310
            return HttpResponse(
                status_code=resp.status, headers=dict(resp.headers), body=resp.read()
            )

    def get(self, url: str, *, headers: Mapping[str, str] | None = None) -> HttpResponse:
        return self.request("GET", url, headers=headers)


class SecretProvider:
    """Resolves secret URIs. Supported schemes: ``env:NAME`` (process
    environment) and ``literal:value`` (tests/fixtures). Unknown
    schemes raise — a resource cannot invent new secret sources
    (`context.py:42-43`)."""

    def __init__(self, overrides: Mapping[str, str] | None = None):
        self._overrides = dict(overrides or {})

    def get(self, uri: str) -> str:
        if uri in self._overrides:
            return self._overrides[uri]
        scheme, _, rest = uri.partition(":")
        if scheme == "env":
            import os

            val = os.environ.get(rest)
            if val is None:
                raise KeyError(f"secret env var {rest!r} is not set")
            return val
        if scheme == "literal":
            return rest
        raise ValueError(f"unknown secret scheme {scheme!r} in {uri!r}")


class CursorView:
    """Read-only view of the resource's resume positions
    (`context.py:46-47`). Backed by the checkpoint ledger's positions
    dict; resources read, the engine writes."""

    def __init__(self, positions: Mapping[str, object] | None = None):
        self._positions = dict(positions or {})

    def get(self, fieldname: str, default: object | None = None) -> object | None:
        return self._positions.get(fieldname, default)


@dataclass
class Context:
    http: HttpClient = field(default_factory=HttpClient)
    secrets: SecretProvider = field(default_factory=SecretProvider)
    cursor: CursorView = field(default_factory=CursorView)
    logger: logging.Logger = field(default_factory=lambda: logging.getLogger("cdf_spark.resource"))


def build_context(
    positions: Mapping[str, object] | None = None,
    secrets: Mapping[str, str] | None = None,
    transport=None,
) -> Context:
    """Engine-side constructor: ledger positions become the cursor
    view; secret overrides and a fake HTTP transport support tests."""
    return Context(
        http=HttpClient(transport=transport),
        secrets=SecretProvider(overrides=secrets),
        cursor=CursorView(positions),
    )
