"""Incremental view maintenance: a persisted GROUP BY aggregate kept
current from a Delta table's change data feed, an Iceberg table's
incremental changelog, or a Hudi MoR table's instant timeline (all
three speak the same signed-delta algebra; the Hudi leg derives
pre-images as a touched-key-confined two-snapshot diff).

The materialized-view member of the incremental-index family
(`index_base.IndexArtifact`; siblings NBIndex / LMIndex / IVFIndex /
InvertedIndex / DSIRIndex / ExactSubstrIndex / MinHashLSHIndex): a
100 TB fact table re-aggregated per dashboard refresh is the same
wrong shape as a corpus re-tokenized per classifier call. COUNT and
SUM are self-maintainable aggregates (Gupta & Mumick's IVM
classification): every CDF row folds as a signed delta — insert /
update_postimage = +1, delete / update_preimage = -1 — so a refresh
costs O(changes since cursor) + an O(groups) state merge, never a
fact-table scan. MIN/MAX (r13) are NOT self-maintainable under
deletes (a retracted minimum can force a group re-scan), so they ride
an auxiliary bounded candidate heap per group — the `extreme_k`
closest-to-the-extreme values plus a discard bound — and a refresh
that drains a heap below its bound pays an HONEST, evidenced partial
recompute confined to the fenced groups (one key-semi-joined snapshot
pass), never a silent full re-scan and never an uncertified answer.

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

try:  # only the MIN/MAX pandas UDF needs pandas; sums-only views and
    # the _FORMATS adapters must import on pandas-free images
    import pandas as pd
except ImportError:  # pragma: no cover — exercised on slim executors
    pd = None  # type: ignore[assignment]
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


class _HudiMorChanges:
    """Hudi merge-on-read leg (r13): instants are the cursor domain.

    Hudi's log-derived change stream carries upserts/deletes WITHOUT
    pre-images (delete tombstones are key-only), so the signed-delta
    fold can't consume it directly. Instead of deriving a pre-image
    per instant (O(instants) snapshot reads), the whole refresh window
    collapses to a two-snapshot diff confined to touched keys: for the
    multiset algebra, every key touched anywhere in (cursor, now]
    contributes exactly (-1 × its as-of-cursor row, if it existed) +
    (+1 × its as-of-now row, if it survives) — intermediate upserts of
    the same key cancel. Two key-semi-joined snapshot reads per
    refresh, O(changes) output rows, regardless of how many commits
    the window spans.

    Compaction-gated like r12's XTable MoR translation: resolving the
    as-of-cursor file slice (or replaying the window's log blocks)
    raises `HudiError` if the cleaner removed it — the refresh refuses
    loudly rather than folding a wrong pre-image.
    """

    def __init__(self, table_root: str):
        from ..sources.hudi_mor import HudiMorTable

        self.t = HudiMorTable(table_root)

    def cursor(self) -> str:
        return self.t.latest_instant()

    def snapshot(self, spark, cursor: str):
        return self.t.snapshot(spark, instant=cursor)

    def changes_after(self, spark, cursor: str, to_cursor: str):
        from ..sources.hudi import HudiEmptyWindowError

        key = self.t.record_key
        try:
            ch = self.t.change_stream(
                spark, from_instant=cursor, to_instant=to_cursor
            )
        except HudiEmptyWindowError:
            # compaction/cluster-only window (a TYPED signal — any
            # other HudiError, e.g. a cleaned-file replay failure,
            # propagates): the cursor must still advance, with a
            # zero-row logical delta
            snap = self.t.snapshot(spark, instant=to_cursor)
            return snap.limit(0).withColumn("_change_type", F.lit("insert"))
        touched = ch.select(key).distinct()
        pre = (
            self.t.snapshot(spark, instant=cursor)
            .join(touched, on=key, how="left_semi")
            .withColumn("_change_type", F.lit("update_preimage"))
        )
        post = (
            self.t.snapshot(spark, instant=to_cursor)
            .join(touched, on=key, how="left_semi")
            .withColumn("_change_type", F.lit("update_postimage"))
        )
        return pre.unionByName(post)


_FORMATS = {"delta": _DeltaChanges, "iceberg": _IcebergChanges, "hudi": _HudiMorChanges}

_DEC = "decimal(38,6)"


def _nullsafe_join(left: DataFrame, right: DataFrame, keys: list[str], how: str) -> DataFrame:
    """Join on null-safe key equality and coalesce the key columns —
    GROUP BY treats NULL as a first-class group value, so the state
    merge must too (plain equality would duplicate NULL-keyed groups).
    Semi/anti joins return the left frame's columns unchanged."""
    l, r = left.alias("_nsl"), right.alias("_nsr")
    cond = None
    for k in keys:
        term = F.col(f"_nsl.{k}").eqNullSafe(F.col(f"_nsr.{k}"))
        cond = term if cond is None else (cond & term)
    if how in ("left_semi", "left_anti", "semi", "anti"):
        return l.join(r, on=cond, how=how)
    return l.join(r, on=cond, how=how).select(
        *[F.coalesce(F.col(f"_nsl.{k}"), F.col(f"_nsr.{k}")).alias(k) for k in keys],
        *[F.col(f"_nsl.{c}") for c in left.columns if c not in keys],
        *[F.col(f"_nsr.{c}") for c in right.columns if c not in keys],
    )


def _heap_agg(
    df: DataFrame, keys: list[str], col: str, k: int, asc: bool, hname: str, bname: str
) -> DataFrame:
    """Per-group candidate heap for MIN (asc) / MAX (desc): the k
    closest-to-the-extreme non-null values WITH multiplicity, plus the
    discard bound — the (k+1)-th value when the group was truncated,
    NULL when the heap is the complete non-null multiset. Built with a
    rank-filter (streaming row_number over the group sort), never an
    unbounded per-group collect: memory is O(k) per group at any
    corpus size."""
    from pyspark.sql import Window

    v = F.col(col).cast(_DEC)
    w = Window.partitionBy(*keys).orderBy(F.col("_v").asc() if asc else F.col("_v").desc())
    return (
        df.select(*keys, v.alias("_v"))
        .filter(F.col("_v").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k + 1)
        .groupBy(*keys)
        .agg(
            F.sort_array(
                F.collect_list(F.when(F.col("_rn") <= k, F.col("_v"))), asc=asc
            ).alias(hname),
            F.max(F.when(F.col("_rn") == k + 1, F.col("_v"))).alias(bname),
        )
    )


def _merge_extreme_rows(heap, bound, pairs, asc: bool, k: int):
    """Fold a group's net value-deltas into its candidate heap.

    Invariant maintained: every live non-null value of the group is
    either IN the heap or ≥ bound (MIN) / ≤ bound (MAX); bound is NULL
    iff the heap is the complete non-null multiset. The served extreme
    heap[0] is certifiable iff it is on the tracked side of the bound;
    otherwise the group is FENCED for a partial recompute — never a
    silently-possibly-wrong answer.
    """
    from collections import Counter

    heap_ms = Counter(list(heap) if heap is not None else [])
    net: Counter = Counter()
    for p in list(pairs) if pairs is not None else []:
        net[p["v"]] += p["sg"]
    fence = False

    def tracked(v):  # strictly inside the tracked region
        if bound is None:
            return True
        return v < bound if asc else v > bound

    for v, n in net.items():
        if n < 0:
            take = min(heap_ms[v], -n)
            heap_ms[v] -= take
            if (-n - take) and tracked(v):
                # retraction of a value the tracked region must contain:
                # inconsistent feed — heal via recompute, don't guess
                fence = True
        elif n > 0 and tracked(v):
            heap_ms[v] += n
    vals = sorted(heap_ms.elements(), reverse=not asc)
    if len(vals) > k:
        edge = vals[k]
        vals = vals[:k]
        if bound is None:
            bound = edge
        else:
            bound = min(bound, edge) if asc else max(bound, edge)
    if bound is not None:
        if not vals:
            fence = True  # heap drained below a truncation bound
        elif not (vals[0] <= bound if asc else vals[0] >= bound):
            fence = True  # untracked region may hide a better extreme
    return vals, bound, fence


def _merge_extreme_udf(asc: bool, k: int):
    if pd is None:
        raise ImportError(
            "MIN/MAX view maintenance needs pandas for the Arrow heap "
            "fold — install pandas or declare sums only"
        )
    from pyspark.sql import types as T

    ret = T.StructType(
        [
            T.StructField("heap", T.ArrayType(T.DecimalType(38, 6))),
            T.StructField("bound", T.DecimalType(38, 6)),
            T.StructField("fence", T.BooleanType()),
        ]
    )

    @F.pandas_udf(ret)
    def merge(heap: pd.Series, bound: pd.Series, pairs: pd.Series) -> pd.DataFrame:
        out = []
        for h, b, p in zip(heap, bound, pairs):
            if b is not None and isinstance(b, float) and b != b:  # NaN guard
                b = None
            vals, nb, fence = _merge_extreme_rows(h, b, p, asc, k)
            out.append({"heap": vals, "bound": nb, "fence": fence})
        return pd.DataFrame(out)

    return merge


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
        mins: list[str] | None = None,
        maxs: list[str] | None = None,
        extreme_k: int = 16,
    ) -> dict:
        """Initial materialization: one full aggregate of the CURRENT
        snapshot; the cursor pins the version it saw.

        ``mins``/``maxs`` (r13) maintain MIN/MAX incrementally via a
        bounded per-group candidate heap of the ``extreme_k``
        closest-to-the-extreme values plus a discard bound; deletes
        that drain a heap below its bound trigger an honest per-group
        partial recompute at refresh time (see `_merge_extreme_rows`),
        never a silent full re-scan and never a wrong answer."""
        mins, maxs = list(mins or []), list(maxs or [])
        if self._meta() is not None:
            raise ValueError("materialized aggregate already initialized")
        if not keys or not (sums or mins or maxs):
            raise ValueError("need at least one group key and one aggregate column")
        if extreme_k < 1:
            raise ValueError("extreme_k must be >= 1")
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
        for c in mins:
            state = _nullsafe_join(
                state,
                _heap_agg(df, keys, c, extreme_k, True, f"hmin_{c}", f"bmin_{c}"),
                keys,
                "left",
            )
        for c in maxs:
            state = _nullsafe_join(
                state,
                _heap_agg(df, keys, c, extreme_k, False, f"hmax_{c}", f"bmax_{c}"),
                keys,
                "left",
            )
        state = self._finish_extremes(state, mins, maxs)
        out = self.root / "state_v1"
        state.write.mode("overwrite").parquet(str(out))
        meta = {
            "version": 1,
            "cursor": cur if isinstance(cur, str) else int(cur),
            "table": str(table_root),
            "format": source_format,
            "keys": list(keys),
            "sums": list(sums),
            "mins": mins,
            "maxs": maxs,
            "extreme_k": int(extreme_k),
        }
        self._swap_meta(meta)
        return meta

    @staticmethod
    def _finish_extremes(state: DataFrame, mins: list[str], maxs: list[str]) -> DataFrame:
        """Normalize heap columns (no-row groups -> empty arrays) and
        materialize the served scalars: the heap head is the exact
        extreme whenever the state is certified (which refresh
        enforces via the fence)."""
        empty = F.array().cast(f"array<{_DEC}>")
        for pre, cols in (("min", mins), ("max", maxs)):
            for c in cols:
                state = state.withColumn(
                    f"h{pre}_{c}", F.coalesce(F.col(f"h{pre}_{c}"), empty)
                ).withColumn(f"{pre}_{c}", F.get(F.col(f"h{pre}_{c}"), F.lit(0)))
        return state

    def refresh(self, spark) -> dict:
        """Fold all commits past the cursor. O(changes) + O(groups);
        a no-op (same meta back) when the table hasn't moved."""
        meta = self._meta()
        if meta is None:
            raise ValueError("materialized aggregate not initialized")
        t = _FORMATS[meta.get("format", "delta")](meta["table"])
        cur = t.cursor()
        cursor = meta["cursor"]
        cursor = cursor if isinstance(cursor, str) else int(cursor)
        if cur == cursor:
            return meta
        keys, sums = meta["keys"], meta["sums"]
        mins, maxs = meta.get("mins", []), meta.get("maxs", [])
        ek = int(meta.get("extreme_k", 16))
        ext_cols = sorted(set(mins) | set(maxs))
        ch = t.changes_after(spark, cursor, cur)
        sign = (
            F.when(F.col("_change_type").isin(*_PLUS), F.lit(1))
            .when(F.col("_change_type").isin(*_MINUS), F.lit(-1))
            .otherwise(F.lit(0))
        )
        val_cols = sorted(set(sums) | set(ext_cols))
        delta = (
            ch.select(*keys, sign.alias("_sg"), *[F.col(c).cast(_DEC).alias(c) for c in val_cols])
            .groupBy(*keys)
            .agg(
                F.sum("_sg").alias("_dcnt"),
                *[
                    F.sum(F.col(c) * F.col("_sg")).cast(_DEC).alias(f"_dsum_{c}")
                    for c in sums
                ],
            )
        )
        state = spark.read.parquet(str(self.root / f"state_v{meta['version']}"))
        zero = F.lit(0).cast(_DEC)
        # Null-safe key merge (see _nullsafe_join): GROUP BY treats
        # NULL as a real group value; plain equality would leave a
        # NULL-keyed group duplicated across state and delta rows,
        # silently breaking the refresh==recompute bit-identity
        # contract for nullable keys.
        carried = [f"{p}_{m}" for m in mins for p in ("hmin", "bmin")] + [
            f"{p}_{m}" for m in maxs for p in ("hmax", "bmax")
        ]
        merged = _nullsafe_join(
            state.select(*keys, "cnt", *[f"sum_{c}" for c in sums], *carried),
            delta,
            keys,
            "full_outer",
        ).select(
            *keys,
            (F.coalesce(F.col("cnt"), F.lit(0)) + F.coalesce(F.col("_dcnt"), F.lit(0)))
            .cast("long")
            .alias("cnt"),
            *[
                (F.coalesce(F.col(f"sum_{c}"), zero) + F.coalesce(F.col(f"_dsum_{c}"), zero))
                .cast(_DEC)
                .alias(f"sum_{c}")
                for c in sums
            ],
            *carried,
        ).filter(F.col("cnt") != 0)
        if ext_cols:
            # NETTED (value, sign) pairs per group — the documented
            # compression: duplicate values collapse to one struct with
            # their signed net, so a per-group change storm (10M deletes
            # of one value) folds as ONE pair, never an unbounded array
            # in a single Arrow cell. Two combinable shuffles per
            # extreme column; same-window insert+delete of a value nets
            # to zero and vanishes before the merge.
            for c in ext_cols:
                netted = (
                    ch.select(
                        *keys, F.col(c).cast(_DEC).alias("_v"), sign.alias("_sg")
                    )
                    .filter(F.col("_v").isNotNull() & (F.col("_sg") != 0))
                    .groupBy(*keys, "_v")
                    .agg(F.sum("_sg").alias("_n"))
                    .filter(F.col("_n") != 0)
                    .groupBy(*keys)
                    .agg(
                        F.collect_list(
                            F.struct(F.col("_v").alias("v"), F.col("_n").alias("sg"))
                        ).alias(f"_pairs_{c}")
                    )
                )
                merged = _nullsafe_join(merged, netted, keys, "left")
            merged = self._fold_extremes(spark, t, cur, merged, keys, mins, maxs, ek)
        version = int(meta["version"]) + 1
        out = self.root / f"state_v{version}"
        merged.write.mode("overwrite").parquet(str(out))
        new_meta = {**meta, "version": version, "cursor": cur if isinstance(cur, str) else int(cur)}
        self._swap_meta(new_meta)
        self._reclaim(version)
        return new_meta

    def _fold_extremes(
        self, spark, t, cur, merged: DataFrame, keys: list[str],
        mins: list[str], maxs: list[str], ek: int,
    ) -> DataFrame:
        """Apply the per-group heap fold for every MIN/MAX column, then
        heal fenced groups (heap drained below its bound / extreme not
        certifiable) with a partial recompute confined to those groups:
        one key-semi-joined snapshot pass, O(fenced groups), never a
        full re-scan. Output carries fresh heaps, bounds, and certified
        scalar extremes; the fold is deterministic so the crash-retry
        overwrite discipline is unchanged."""
        sides = [(c, True, "min") for c in mins] + [(c, False, "max") for c in maxs]
        fence_cols = []
        for c, asc, pre in sides:
            udf = _merge_extreme_udf(asc, ek)
            merged = (
                merged.withColumn(
                    "_mx", udf(F.col(f"h{pre}_{c}"), F.col(f"b{pre}_{c}"), F.col(f"_pairs_{c}"))
                )
                .withColumn(f"h{pre}_{c}", F.col("_mx.heap"))
                .withColumn(f"b{pre}_{c}", F.col("_mx.bound"))
                .withColumn(f"_fence_{pre}_{c}", F.col("_mx.fence"))
                .drop("_mx")
            )
            fence_cols.append(f"_fence_{pre}_{c}")
        merged = merged.drop(*[f"_pairs_{c}" for c in sorted(set(mins) | set(maxs))])
        any_fence = None
        for fc in fence_cols:
            term = F.coalesce(F.col(fc), F.lit(False))
            any_fence = term if any_fence is None else (any_fence | term)
        # one materialization: the fence probe is an action and the
        # final write must see the same fold
        merged = merged.localCheckpoint(eager=True)
        fenced = merged.filter(any_fence)
        if fenced.limit(1).count() > 0:
            snap = t.snapshot(spark, cur)
            snap_f = _nullsafe_join(
                snap.select(*keys, *sorted(set(mins) | set(maxs))),
                fenced.select(*keys),
                keys,
                "left_semi",
            )
            healed = fenced.drop(
                *[f"{p}_{m}" for m in mins for p in ("hmin", "bmin")],
                *[f"{p}_{m}" for m in maxs for p in ("hmax", "bmax")],
            )
            for c, asc, pre in sides:
                healed = _nullsafe_join(
                    healed,
                    _heap_agg(snap_f, keys, c, ek, asc, f"h{pre}_{c}", f"b{pre}_{c}"),
                    keys,
                    "left",
                )
            merged = merged.filter(~any_fence).unionByName(
                healed.select(*merged.columns)
            )
        merged = merged.drop(*fence_cols)
        return self._finish_extremes(merged, mins, maxs)

    def read(self, spark, internal: bool = False) -> DataFrame:
        meta = self._meta()
        if meta is None:
            raise ValueError("materialized aggregate not initialized")
        df = spark.read.parquet(str(self.root / f"state_v{meta['version']}"))
        if internal:
            return df
        aux = [
            c
            for c in df.columns
            if c.split("_", 1)[0] in ("hmin", "bmin", "hmax", "bmax")
        ]
        return df.drop(*aux)

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
