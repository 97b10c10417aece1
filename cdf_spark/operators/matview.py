"""Incremental view maintenance: a persisted GROUP BY aggregate kept
current from a Delta table's change data feed or an Iceberg table's
incremental changelog (both speak the same signed-delta algebra).

The materialized-view member of the incremental-index family
(`index_base.IndexArtifact`; siblings NBIndex / LMIndex / IVFIndex /
InvertedIndex / DSIRIndex / ExactSubstrIndex / MinHashLSHIndex): a
100 TB fact table re-aggregated per dashboard refresh is the same
wrong shape as a corpus re-tokenized per classifier call. COUNT and
SUM are self-maintainable aggregates (Gupta & Mumick's IVM
classification): every CDF row folds as a signed delta — insert /
update_postimage = +1, delete / update_preimage = -1 — so a refresh
costs O(changes since cursor) + an O(groups) state merge, never a
fact-table scan. MIN/MAX are deliberately NOT offered: they are not
self-maintainable under deletes (a retracted minimum forces a group
re-scan), and a silent recompute fallback would lie about the cost
model; callers who need them re-aggregate.

Exactness discipline: sums ride DECIMAL(38,6) (the hypertable-rollup
rule — decimal addition is associative/commutative, immune to float
summation order across partitions, engines, and refresh batching), so
a refreshed view is BIT-IDENTICAL to a from-scratch aggregate of the
current snapshot — which is exactly what the oracle checks. Groups
whose count reaches zero are dropped (a vanished group must vanish
from the view, as it would from the recompute).

Refresh is exactly-once by construction: the state parquet for the
next version is written FIRST, the meta pointer (which carries the
Delta version cursor) swaps LAST via the family's atomic tmp+rename —
a crash between the two leaves the previous state AND previous cursor
live, so the retried refresh re-folds the same change window into the
same next-version directory (overwrite), and a completed swap advances
state and cursor atomically. No separate epoch fence is needed: the
cursor IS the fence.

Reference frame: the reference maintains per-package column statistics
incrementally (`crates/cdf-kernel/src/statistics.rs:517-560` merge);
this generalizes that shape to user-declared aggregates over a
destination table's own change log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .index_base import IndexArtifact

_PLUS = ("insert", "update_postimage")
_MINUS = ("delete", "update_preimage")


class _DeltaChanges:
    """Delta leg: versions are the cursor domain, `table_changes` the
    change feed (insert / delete / update pre+postimage rows)."""

    def __init__(self, table_root: str):
        from ..sources.delta import DeltaTable

        self.t = DeltaTable(table_root)

    def cursor(self) -> int:
        return int(self.t.current_version())

    def snapshot(self, spark, cursor: int):
        from ..plans.scan import ScanRequest

        df, _plan = self.t.scan(spark, ScanRequest("matview_build"), version=cursor)
        return df

    def changes_after(self, spark, cursor: int, to_cursor: int):
        return self.t.table_changes(spark, cursor + 1, to_cursor)


class _IcebergChanges:
    """Iceberg leg: snapshot ids are the cursor domain,
    `changelog_scan` the change feed (insert / delete rows — updates
    surface as delete+insert pairs, which fold identically under the
    signed-delta algebra)."""

    def __init__(self, table_root: str):
        from ..sources.iceberg import IcebergTable

        self.t = IcebergTable(table_root)

    def cursor(self) -> int:
        sid = self.t.current_snapshot_id()
        if sid is None:
            raise ValueError("iceberg table has no snapshots")
        return int(sid)

    def snapshot(self, spark, cursor: int):
        from ..plans.scan import ScanRequest

        df, _plan = self.t.scan(spark, ScanRequest("matview_build"), snapshot_id=cursor)
        return df

    def changes_after(self, spark, cursor: int, to_cursor: int):
        return self.t.changelog_scan(
            spark, from_snapshot_id=cursor, to_snapshot_id=to_cursor
        )


_FORMATS = {"delta": _DeltaChanges, "iceberg": _IcebergChanges}


class MaterializedAggregate(IndexArtifact):
    """Persisted (keys -> COUNT(*), SUM(col)...) view over a Delta or
    Iceberg table, refreshed from its row-level change feed (Delta
    CDF `table_changes` / Iceberg incremental `changelog_scan`).

    Layout under ``root/``: ``state_v<N>/`` parquet
    (keys..., cnt BIGINT, sum_<col> DECIMAL(38,6)...) + ``meta.json``
    {version, cursor, table, format, keys, sums}. ``cursor`` is the
    last Delta commit version / Iceberg snapshot id folded in.
    """

    def build(
        self,
        spark,
        table_root: str,
        keys: list[str],
        sums: list[str],
        source_format: str = "delta",
    ) -> dict:
        """Initial materialization: one full aggregate of the CURRENT
        snapshot; the cursor pins the version it saw."""
        if self._meta() is not None:
            raise ValueError("materialized aggregate already initialized")
        if not keys or not sums:
            raise ValueError("need at least one group key and one sum column")
        if source_format not in _FORMATS:
            raise ValueError(
                f"unknown source format {source_format!r} (formats: {sorted(_FORMATS)})"
            )
        t = _FORMATS[source_format](table_root)
        cur = t.cursor()
        df = t.snapshot(spark, cur)
        state = df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("cnt"),
            *[
                F.sum(F.col(c).cast("decimal(38,6)")).cast("decimal(38,6)").alias(f"sum_{c}")
                for c in sums
            ],
        )
        out = self.root / "state_v1"
        state.write.mode("overwrite").parquet(str(out))
        meta = {
            "version": 1,
            "cursor": int(cur),
            "table": str(table_root),
            "format": source_format,
            "keys": list(keys),
            "sums": list(sums),
        }
        self._swap_meta(meta)
        return meta

    def refresh(self, spark) -> dict:
        """Fold all commits past the cursor. O(changes) + O(groups);
        a no-op (same meta back) when the table hasn't moved."""
        meta = self._meta()
        if meta is None:
            raise ValueError("materialized aggregate not initialized")
        t = _FORMATS[meta.get("format", "delta")](meta["table"])
        cur = t.cursor()
        cursor = int(meta["cursor"])
        if cur == cursor:
            return meta
        keys, sums = meta["keys"], meta["sums"]
        ch = t.changes_after(spark, cursor, cur)
        sign = (
            F.when(F.col("_change_type").isin(*_PLUS), F.lit(1))
            .when(F.col("_change_type").isin(*_MINUS), F.lit(-1))
            .otherwise(F.lit(0))
        )
        delta = (
            ch.select(*keys, sign.alias("_sg"), *[F.col(c).cast("decimal(38,6)").alias(c) for c in sums])
            .groupBy(*keys)
            .agg(
                F.sum("_sg").alias("_dcnt"),
                *[
                    F.sum(F.col(c) * F.col("_sg")).cast("decimal(38,6)").alias(f"_dsum_{c}")
                    for c in sums
                ],
            )
        )
        state = spark.read.parquet(str(self.root / f"state_v{meta['version']}"))
        zero = F.lit(0).cast("decimal(38,6)")
        merged = (
            state.join(delta, on=keys, how="full_outer")
            .select(
                *keys,
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.coalesce(F.col("_dcnt"), F.lit(0)))
                .cast("long")
                .alias("cnt"),
                *[
                    (
                        F.coalesce(F.col(f"sum_{c}"), zero)
                        + F.coalesce(F.col(f"_dsum_{c}"), zero)
                    )
                    .cast("decimal(38,6)")
                    .alias(f"sum_{c}")
                    for c in sums
                ],
            )
            .filter(F.col("cnt") != 0)
        )
        version = int(meta["version"]) + 1
        out = self.root / f"state_v{version}"
        merged.write.mode("overwrite").parquet(str(out))
        new_meta = {**meta, "version": version, "cursor": int(cur)}
        self._swap_meta(new_meta)
        self._reclaim(version)
        return new_meta

    def read(self, spark) -> DataFrame:
        meta = self._meta()
        if meta is None:
            raise ValueError("materialized aggregate not initialized")
        return spark.read.parquet(str(self.root / f"state_v{meta['version']}"))

    def _reclaim(self, live_version: int) -> None:
        """Keep live and live-1 (the NBIndex reader-grace rule), sweep
        older versions and any orphaned future dirs a crash left
        between a state write and a swap that never happened."""
        import shutil

        for p in self.root.glob("state_v*"):
            try:
                v = int(p.name.split("_v")[1])
            except ValueError:
                continue
            if v < live_version - 1 or v > live_version:
                shutil.rmtree(p, ignore_errors=True)
