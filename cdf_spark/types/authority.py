"""Schema authority: immutable versioned schema heads with promotion.

Re-expresses the reference's schema authority
(`crates/cdf-kernel/src/schema_authority.rs:1-920`): per-resource
append-only version history, a promotion lifecycle
(candidate -> active -> retired), and admission of observed batch
schemas against the active head (exact / widenable / drifted). Backed
by a JSON ledger on local or shared storage — on a cluster this would
live on the object store next to the checkpoint ledger; it is
driver-side metadata, never in the data path.
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass, field
from pathlib import Path

from pyspark.sql import types as T

from .schema import CanonicalSchema


@dataclass
class SchemaVersion:
    version: int
    fingerprint: str
    schema_json: str
    status: str  # candidate | active | retired
    created_at_ms: int = field(default_factory=lambda: int(time.time() * 1000))


class SchemaDriftError(Exception):
    pass


# Lossless widenings (canonical-type -> admissible wider canonical types).
_WIDENABLE: dict[str, set[str]] = {
    "int8": {"int16", "int32", "int64", "float64"},
    "int16": {"int32", "int64", "float64"},
    "int32": {"int64", "float64"},
    "float32": {"float64"},
    "date32": {"timestamp(us)", "timestamp(us, UTC)"},
}


@dataclass
class AdmissionResult:
    """Verdict of reconciling an observed schema against the authority."""

    verdict: str  # exact | widened | extra_fields | missing_fields | drifted
    unknown_fields: list[str] = field(default_factory=list)
    missing_fields: list[str] = field(default_factory=list)
    widened_fields: list[str] = field(default_factory=list)
    drifted_fields: list[str] = field(default_factory=list)
    missing_required: list[str] = field(default_factory=list)

    @property
    def admissible(self) -> bool:
        # missing_fields is admissible only because the caller is told
        # (distinct verdict) and expected to null-fill; a missing
        # NON-nullable field is reported in missing_required and makes
        # the batch inadmissible (reference: cdf-contract
        # reconciliation missing_field_error semantics).
        return self.verdict in ("exact", "widened", "extra_fields", "missing_fields")


class SchemaAuthority:
    """JSON-ledger-backed versioned schema registry for one resource."""

    def __init__(self, root: str | Path, resource_id: str):
        self.resource_id = resource_id
        self.path = Path(root) / f"{resource_id}.schema.json"
        self.versions: list[SchemaVersion] = []
        if self.path.exists():
            data = json.loads(self.path.read_text())
            self.versions = [SchemaVersion(**v) for v in data["versions"]]

    def _persist(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(
            json.dumps({"resource_id": self.resource_id, "versions": [asdict(v) for v in self.versions]}, indent=1)
        )
        tmp.replace(self.path)

    def active(self) -> SchemaVersion | None:
        for v in reversed(self.versions):
            if v.status == "active":
                return v
        return None

    def active_schema(self) -> CanonicalSchema | None:
        head = self.active()
        if head is None:
            return None
        from .schema import CanonicalField

        fields = json.loads(head.schema_json)["fields"]
        return CanonicalSchema(
            [CanonicalField(f["name"], f["type"], f.get("nullable", True)) for f in fields]
        )

    def propose(self, schema: CanonicalSchema | T.StructType) -> SchemaVersion:
        """Register a candidate version (idempotent on fingerprint)."""
        if isinstance(schema, T.StructType):
            schema = CanonicalSchema.from_spark(schema)
        fp = schema.fingerprint()
        for v in self.versions:
            if v.fingerprint == fp:
                return v
        ver = SchemaVersion(
            version=len(self.versions) + 1,
            fingerprint=fp,
            schema_json=schema.canonical_json(),
            status="candidate",
        )
        self.versions.append(ver)
        self._persist()
        return ver

    def promote(self, version: int) -> SchemaVersion:
        """candidate -> active; the previous active head is retired."""
        target = next((v for v in self.versions if v.version == version), None)
        if target is None:
            raise KeyError(f"no schema version {version}")
        for v in self.versions:
            if v.status == "active":
                v.status = "retired"
        target.status = "active"
        self._persist()
        return target

    def admit(self, observed: CanonicalSchema | T.StructType) -> AdmissionResult:
        """Reconcile an observed batch schema against the active head.

        Mirrors `crates/cdf-engine/src/execution/schema_admission.rs`:
        unknown fields are reported (for variant capture / quarantine),
        lossless widenings pass, type drift fails.
        """
        if isinstance(observed, T.StructType):
            observed = CanonicalSchema.from_spark(observed)
        head = self.active_schema()
        if head is None:
            raise SchemaDriftError(f"resource {self.resource_id} has no active schema head")
        declared = {f.name: f.type for f in head.fields}
        declared_nullable = {f.name: f.nullable for f in head.fields}
        seen = {f.name: f.type for f in observed.fields}

        unknown = [n for n in seen if n not in declared]
        missing = [n for n in declared if n not in seen]
        missing_required = [n for n in missing if not declared_nullable.get(n, True)]
        widened: list[str] = []
        drifted: list[str] = []
        for name, otype in seen.items():
            dtype = declared.get(name)
            if dtype is None or otype == dtype:
                continue
            if dtype in _WIDENABLE.get(otype, set()) or otype in _WIDENABLE.get(dtype, set()):
                widened.append(name)
            else:
                drifted.append(name)

        # `exact` requires field-set equality; a batch lacking declared
        # NON-nullable fields is refused outright, lacking nullable ones
        # gets the distinct missing_fields verdict (caller null-fills).
        if drifted or missing_required:
            verdict = "drifted"
        elif missing:
            verdict = "missing_fields"
        elif unknown:
            verdict = "extra_fields"
        elif widened:
            verdict = "widened"
        else:
            verdict = "exact"
        return AdmissionResult(verdict, unknown, missing, widened, drifted, missing_required)
