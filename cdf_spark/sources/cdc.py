"""CDC log source: ordered effect streams with transaction boundaries.

Re-expresses the reference's CDC machinery
(`crates/cdf-kernel/src/position/cdc.rs:1-936` — WAL-decoded keyed
insert/update/delete batches at transaction boundaries;
`crates/cdf-runtime/src/cdc_log_source.rs` + `drain_epoch.rs:1-1258`
— epochs close ONLY at source-proven transaction boundaries).

The log is any table/file stream with:
  op column      insert | update | delete
  txid column    monotone transaction id (LSN-like)
  key columns    the merge identity

Epoch semantics: an epoch may only include WHOLE transactions, and
only transactions at or below the log's committed frontier. A
transaction's effects apply atomically: either all of its rows are in
an epoch or none. Positions are the last fully-applied txid.

Apply semantics: within an epoch, effects reduce per key by
(txid, seq) order — winner last — then merge into the target
(delete winners drop the key). Delivery: effectively-once-per-position.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.effects import apply_effects_to_target, reduce_keyed_effects


@dataclass
class CdcEpochPlan:
    """Which transactions an epoch may consume."""

    from_txid_exclusive: int
    to_txid_inclusive: int
    txn_count: int


class CdcLogSource:
    """A CDC effect log backed by any DataFrame-producing path."""

    def __init__(
        self,
        log_path: str,
        keys: list[str],
        op_col: str = "op",
        txid_col: str = "txid",
        seq_col: str = "seq",
        format: str = "parquet",
    ):
        self.log_path = log_path
        self.keys = keys
        self.op_col = op_col
        self.txid_col = txid_col
        self.seq_col = seq_col
        self.format = format

    def read_log(self, spark: SparkSession) -> DataFrame:
        return spark.read.format(self.format).load(self.log_path)

    def committed_frontier(self, spark: SparkSession) -> int | None:
        """Highest txid present in full (the log's committed frontier).
        A real WAL source gets this from the replication protocol; a
        log table treats the max txid as committed."""
        row = self.read_log(spark).agg(F.max(self.txid_col).alias("m")).collect()[0]
        return row.m

    def plan_epoch(
        self,
        spark: SparkSession,
        resume_txid: int | None,
        max_txns: int | None = None,
        max_bytes_per_txn: int | None = None,
    ) -> CdcEpochPlan | None:
        """Select the next run of WHOLE transactions after resume_txid.

        `max_txns` bounds epoch size (the reference's CDC transaction
        byte ceiling, `StreamEpochPolicy` — expressed in transactions
        here since Spark sizes bytes per stage)."""
        frontier = self.committed_frontier(spark)
        if frontier is None:
            return None
        resume = resume_txid if resume_txid is not None else -(2**62)
        txns = (
            self.read_log(spark)
            .filter(F.col(self.txid_col) > resume)
            .select(self.txid_col)
            .distinct()
            .orderBy(self.txid_col)
        )
        if max_txns is not None:
            txns = txns.limit(max_txns)
        # only the frontier and the count come to the driver — one row,
        # regardless of how many transactions the epoch spans
        agg = txns.agg(F.max(self.txid_col).alias("hi"), F.count(F.lit(1)).alias("n")).collect()[0]
        if agg.n == 0:
            return None
        return CdcEpochPlan(from_txid_exclusive=resume, to_txid_inclusive=agg.hi, txn_count=agg.n)

    def read_epoch(self, spark: SparkSession, plan: CdcEpochPlan) -> DataFrame:
        """All effects of the planned transactions, atomically."""
        return self.read_log(spark).filter(
            (F.col(self.txid_col) > plan.from_txid_exclusive)
            & (F.col(self.txid_col) <= plan.to_txid_inclusive)
        )

    def apply_epoch(
        self,
        spark: SparkSession,
        target: DataFrame,
        plan: CdcEpochPlan,
        payload_cols: list[str],
    ) -> DataFrame:
        """Reduce the epoch's effects per key and merge into the target."""
        effects = self.read_epoch(spark, plan)
        reduced = reduce_keyed_effects(
            effects, self.keys, [self.txid_col, self.seq_col], op_col=self.op_col, winner="last"
        )
        reduced = reduced.select(*self.keys, *payload_cols, self.op_col)
        return apply_effects_to_target(target, reduced, self.keys, op_col=self.op_col)
