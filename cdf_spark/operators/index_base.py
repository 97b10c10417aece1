"""Shared persistence discipline for the incremental-index family.

Every persisted index in this suite (LMIndex, NBIndex,
ExactSubstrIndex, MinHashLSHIndex, IVFIndex, InvertedIndex, DSIRIndex)
keeps a `meta.json` pointer under its root and commits state changes
by writing data files FIRST and swapping the pointer LAST via an
atomic tmp+rename — a crash mid-mutation leaves the previous index
live (the staged-commit rule the destinations follow). That pointer
logic was copy-pasted per class and had started to drift (the r12
review found IVFIndex.delete missing the dead-id anti-join its
InvertedIndex sibling had); this mixin holds it once.

Deliberately NOT shared: sweep/reclaim policies (append-only parts
with retire-then-sweep vs versioned dirs with keep-live-minus-one
differ by design per artifact shape) and the epoch fence comparison
(one line, but it reads each class's own meta layout)."""

from __future__ import annotations


class IndexArtifact:
    """Root-dir + atomic meta-pointer plumbing for a persisted index."""

    def __init__(self, root):
        from pathlib import Path as _P

        self.root = _P(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _meta(self) -> dict | None:
        import json as _json

        p = self.root / "meta.json"
        return _json.loads(p.read_text()) if p.exists() else None

    def _swap_meta(self, meta: dict) -> None:
        """Atomic pointer swap (tmp + rename) — a crash mid-write must
        leave the PREVIOUS meta intact, or the documented
        crash-leaves-old-state-live guarantee is void at the one step
        that matters."""
        import json as _json

        tmp = self.root / "meta.json.tmp"
        tmp.write_text(_json.dumps(meta))
        tmp.replace(self.root / "meta.json")

    @staticmethod
    def _schema_json(df) -> str:
        """The written part's schema, recorded in the meta at write
        time so probes can read it back EXPLICITLY (r15, guide §1.2):
        without it every `spark.read.parquet` on the probe path pays a
        parquet schema-inference job — pure per-probe scheduling
        overhead for a layout this class fixed when it wrote the part."""
        return df.schema.json()

    def _carry_schemas(self, meta: dict) -> dict:
        """The schema_* keys every meta mutation must propagate."""
        return {k: v for k, v in meta.items() if k.startswith("schema_")}

    def _read_parts(self, spark, dirs: list[str], schema_json: str | None = None):
        """Read part dirs under root, with the recorded schema when the
        meta carries one (skips the per-read schema-inference job);
        indexes written before r15 fall back to inference."""
        reader = spark.read
        if schema_json:
            import json as _json

            from pyspark.sql.types import StructType

            reader = reader.schema(StructType.fromJson(_json.loads(schema_json)))
        return reader.parquet(*[str(self.root / d) for d in dirs])
