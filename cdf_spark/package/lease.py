"""Scope leases: exclusive state ownership per resource.

Re-expresses the reference's scope-lease machinery (conformance suite
`crates/cdf-conformance/src/lib.rs` scope-lease; `state_scope` on
`ResourceDescriptor`): two concurrent runs of the same resource must
not interleave checkpoints. A lease is an exclusive, TTL-bounded claim
on a resource's state scope; checkpoint advancement requires holding
it.

File-based implementation (atomic create on local/posix; on an object
store this maps to conditional-put). Leases auto-expire so a crashed
holder cannot deadlock the resource; renewal extends the TTL.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass
from pathlib import Path


class LeaseHeld(Exception):
    pass


@dataclass
class Lease:
    resource_id: str
    holder: str
    acquired_at_ms: int
    expires_at_ms: int
    path: Path

    @property
    def expired(self) -> bool:
        return time.time() * 1000 > self.expires_at_ms


class ScopeLeaseManager:
    def __init__(self, root: str | Path, ttl_ms: int = 10 * 60 * 1000):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.ttl_ms = ttl_ms

    def _path(self, resource_id: str) -> Path:
        return self.root / f"{resource_id}.lease"

    def acquire(self, resource_id: str, holder: str | None = None) -> Lease:
        """Acquire the exclusive lease; raises LeaseHeld if an unexpired
        lease exists. Expired leases are broken and replaced."""
        holder = holder or f"run-{uuid.uuid4().hex[:12]}"
        path = self._path(resource_id)
        now = int(time.time() * 1000)
        if path.exists():
            try:
                cur = json.loads(path.read_text())
            except (json.JSONDecodeError, OSError):
                cur = None
            if cur and now <= cur["expires_at_ms"]:
                raise LeaseHeld(
                    f"resource {resource_id!r} leased by {cur['holder']} until {cur['expires_at_ms']}"
                )
            path.unlink(missing_ok=True)  # break expired lease

        lease = Lease(
            resource_id=resource_id,
            holder=holder,
            acquired_at_ms=now,
            expires_at_ms=now + self.ttl_ms,
            path=path,
        )
        # atomic create: fails if a competitor won the race
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise LeaseHeld(f"resource {resource_id!r} lease lost to a concurrent claimant") from None
        with os.fdopen(fd, "w") as f:
            json.dump(
                {"resource_id": resource_id, "holder": holder, "acquired_at_ms": now,
                 "expires_at_ms": lease.expires_at_ms},
                f,
            )
        return lease

    def renew(self, lease: Lease) -> Lease:
        if not lease.path.exists():
            raise LeaseHeld(f"lease on {lease.resource_id!r} no longer exists")
        cur = json.loads(lease.path.read_text())
        if cur["holder"] != lease.holder:
            raise LeaseHeld(f"lease on {lease.resource_id!r} stolen by {cur['holder']}")
        lease.expires_at_ms = int(time.time() * 1000) + self.ttl_ms
        lease.path.write_text(
            json.dumps({"resource_id": lease.resource_id, "holder": lease.holder,
                        "acquired_at_ms": lease.acquired_at_ms, "expires_at_ms": lease.expires_at_ms})
        )
        return lease

    def release(self, lease: Lease) -> None:
        if lease.path.exists():
            cur = json.loads(lease.path.read_text())
            if cur["holder"] == lease.holder:
                lease.path.unlink()
