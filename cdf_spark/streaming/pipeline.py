"""Streaming load pipeline: Structured Streaming + the CDF commit path.

The streaming analogue of :class:`cdf_spark.runtime.LoadPipeline`
(§3.1 step 7 of SURVEY): `readStream` -> per-micro-batch (epoch)
contract evaluation, dedup-within-epoch, late-data split against the
engine watermark ledger -> package build -> destination commit ->
receipt verify -> checkpoint advance -- all inside `foreachBatch`, so
each epoch is one transactional unit with an auditable package.

Why engine-side watermarks instead of `withWatermark`: Spark's
watermark silently DROPS late rows and only supports timestamps; the
reference requires late rows to be recaptured / quarantined /
annotated as evidence, over any ordered domain
(`crates/cdf-engine/src/late_data.rs:22-110`). We therefore keep the
stream un-watermarked and split per epoch against the ledger value.

Extents (`epochs.StreamExtent`):
  DRAIN    -> Trigger(availableNow=True), runs to the frontier, stops
  RESIDENT -> Trigger(processingTime=interval), runs until stopped

File-source caveat (measured, Spark 4.x): CONTINUOUS discovery lists
only flat files in the watched directory, while availableNow's initial
listing also recurses into subdirectories — a resident stream over a
dir of per-batch SUBDIRS silently sees nothing. Land each batch as a
flat file (write to a staging dir, move the part file in).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..contracts.evaluator import evaluate_contract
from ..contracts.policy import Contract
from ..operators.dedup import dedup_keyed
from ..operators.late_data import classify_late_data
from ..package.builder import PackageBuilder
from ..package.ledger import CheckpointLedger, ParquetDestination
from ..sources.base import ResourceDescriptor, WriteDisposition
from .epochs import DrainState, DrainTermination, EpochPolicy, StreamExtent
from .watermark import WatermarkLedger, WatermarkPolicy, observed_frontier


@dataclass
class EpochResult:
    epoch_id: int
    rows_admitted: int
    rows_quarantined: int
    rows_late: int
    package_id: str | None
    receipt_verified: bool
    watermark_after: object = None


@dataclass
class StreamingLoadPipeline:
    descriptor: ResourceDescriptor
    source_path: str
    schema: object  # pyspark StructType for the stream reader
    contract: Contract | None = None
    watermark: WatermarkPolicy | None = None
    late_action: str = "quarantine"
    package_root: str = "/tmp/cdf_stream_packages"
    ledger_root: str = "/tmp/cdf_stream_ledger"
    # any destination speaking the commit protocol (commit/verify):
    # ParquetDestination, TombstoneParquetDestination, DuckDbDestination,
    # DbApiDestination
    destination: object | None = None
    disposition: WriteDisposition = WriteDisposition.APPEND
    extent: StreamExtent = StreamExtent.DRAIN
    epoch_policy: EpochPolicy = field(default_factory=EpochPolicy)
    termination: DrainTermination = field(default_factory=DrainTermination)
    source_format: str = "parquet"
    # options for the stream reader (e.g. maxFilesPerTrigger to bound
    # epoch size — the rows/bytes axis of EpochPolicy for file sources)
    reader_options: dict = field(default_factory=dict)

    # run auto-maintenance on the destination's table every N verified
    # epochs (0 = off): per-epoch streaming commits are exactly the
    # workload that accretes small files/tombstones, and dataChange=
    # false maintenance commits never disturb downstream incremental
    # consumers. Policy = package.maintenance.MaintenancePolicy.
    maintenance_every_epochs: int = 0
    maintenance_policy: object | None = None
    maintenance_reports: list[dict] = field(default_factory=list)

    epochs: list[EpochResult] = field(default_factory=list)

    def _process_epoch(self, batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        desc = self.descriptor
        wm_ledger = WatermarkLedger(self.ledger_root, desc.resource_id)
        ck_ledger = CheckpointLedger(self.ledger_root)

        # exactly-once across restarts: after a crash between the sink
        # commit and Spark's offset commit, the restarted query replays
        # the batch under the SAME epoch id — the checkpoint ledger
        # already holds its verified receipt, so the replay is skipped
        # (recorded with package_id=None as the replay signature)
        if self.destination is not None and ck_ledger.epoch_committed(
            desc.resource_id, epoch_id
        ):
            self.epochs.append(
                EpochResult(
                    epoch_id=epoch_id,
                    rows_admitted=0,
                    rows_quarantined=0,
                    rows_late=0,
                    package_id=None,
                    receipt_verified=True,
                )
            )
            return

        df = batch_df
        quarantined = None
        cres = None
        if self.contract:
            cres = evaluate_contract(df, self.contract, observe=True)
            df, quarantined = cres.admitted, cres.quarantined

        if desc.dedup_keys:
            order = [desc.cursor.field] if desc.cursor else desc.primary_key or desc.dedup_keys
            df = dedup_keyed(df, desc.dedup_keys, order, keep=desc.dedup_keep)

        rows_late = 0
        wm_after = None
        if self.watermark is not None:
            # recaptured rows from the previous epoch rejoin the batch
            # (LateDataCarryoverRef parity): they are re-presented to
            # the same contract/dedup path and re-classified.
            carryover_dir = Path(self.ledger_root) / "carryover" / desc.resource_id
            if self.late_action == "recapture" and carryover_dir.exists():
                # materialize eagerly: the carryover dir is REPLACED later
                # this epoch, so the plan must not lazily re-read it
                carried = spark.read.parquet(str(carryover_dir)).localCheckpoint(eager=True)
                df = df.unionByName(carried)

            current = wm_ledger.current(self.watermark.column)
            if current is not None:
                from .watermark import parse_stored_watermark

                dtype = dict(df.dtypes).get(self.watermark.column, "")
                wm_value = parse_stored_watermark(current, dtype)
                split = classify_late_data(df, self.watermark.column, wm_value, self.late_action)
                if self.late_action == "quarantine":
                    from pyspark.sql import functions as F

                    from ..contracts.evaluator import (
                        VERDICT_COL,
                        VERDICT_QUARANTINE,
                        VIOLATIONS_COL,
                    )
                    from ..operators.late_data import LATE_COL

                    late = (
                        split.quarantined.drop(LATE_COL)
                        .withColumn(VERDICT_COL, F.lit(VERDICT_QUARANTINE))
                        .withColumn(VIOLATIONS_COL, F.array(F.lit("late_data")))
                    )
                    rows_late = late.count()
                    # evidence, not a drop: late rows join the package's
                    # quarantine segment alongside contract rejections
                    quarantined = (
                        late
                        if quarantined is None
                        else quarantined.unionByName(late, allowMissingColumns=True)
                    )
                    df = split.on_time
                elif self.late_action == "recapture":
                    # persist for the NEXT epoch; replace the previous
                    # carryover set (those rows are in `df` already)
                    staging = carryover_dir.with_name(carryover_dir.name + ".staging")
                    split.recaptured.write.mode("overwrite").parquet(str(staging))
                    recaptured = spark.read.parquet(str(staging))
                    rows_late = recaptured.count()
                    import shutil as _shutil

                    if carryover_dir.exists():
                        _shutil.rmtree(carryover_dir)
                    staging.rename(carryover_dir)
                    df = split.on_time
                else:
                    df = split.admitted_annotated
            frontier = observed_frontier(batch_df, self.watermark)
            if frontier is not None:
                wm_after = wm_ledger.advance(self.watermark.column, frontier)

        late_in_quarantine = self.late_action == "quarantine" and rows_late > 0
        hint = (
            cres.observed_quarantine_count
            if (cres is not None and not late_in_quarantine)
            else None
        )
        builder = PackageBuilder(self.package_root, desc.resource_id)
        package = builder.build(
            admitted=df,
            quarantined=quarantined,
            contract=self.contract,
            quarantine_count_hint=hint,
        )

        receipt_verified = False
        if self.destination is not None and package.rows_admitted > 0:
            receipt = self.destination.commit(spark, package, self.disposition)
            receipt = self.destination.verify(spark, receipt, package)
            receipt_verified = receipt.verified
            ck_ledger.record_receipt(receipt)
            if receipt.verified:
                ck_ledger.advance(desc.resource_id, receipt, {"epoch": epoch_id})

        self.epochs.append(
            EpochResult(
                epoch_id=epoch_id,
                rows_admitted=package.rows_admitted,
                rows_quarantined=package.rows_quarantined,
                rows_late=rows_late,
                package_id=package.package_id,
                receipt_verified=receipt_verified,
                watermark_after=wm_after,
            )
        )

        if (
            self.maintenance_every_epochs
            and receipt_verified
            and len([e for e in self.epochs if e.receipt_verified])
            % self.maintenance_every_epochs
            == 0
        ):
            table_path = getattr(self.destination, "table_path", None)
            if table_path is not None:
                from ..package.maintenance import run_maintenance

                self.maintenance_reports.append(
                    run_maintenance(spark, table_path, self.maintenance_policy)
                )

    def run(self, spark: SparkSession, checkpoint_dir: str | None = None):
        """Start the stream. DRAIN blocks until the frontier is reached
        and returns the epoch results; RESIDENT returns the live query
        handle (caller stops it)."""
        reader = (
            spark.readStream.format(self.source_format)
            .schema(self.schema)
            .options(**{k: str(v) for k, v in self.reader_options.items()})
            .load(self.source_path)
        )
        checkpoint_dir = checkpoint_dir or str(Path(self.ledger_root) / "spark_checkpoints" / self.descriptor.resource_id)

        writer = (
            reader.writeStream.foreachBatch(self._process_epoch)
            .option("checkpointLocation", checkpoint_dir)
        )
        if self.extent is StreamExtent.DRAIN:
            q = writer.trigger(availableNow=True).start()
            q.awaitTermination()
            return self.epochs
        if self.extent is StreamExtent.RESIDENT:
            q = writer.trigger(processingTime=self.epoch_policy.trigger_interval).start()
            return q
        raise ValueError("BOUNDED extent uses runtime.LoadPipeline, not the stream path")


def run_drain_with_budget(
    pipeline: StreamingLoadPipeline,
    spark: SparkSession,
    termination: DrainTermination,
) -> tuple[list[EpochResult], str]:
    """Drain with explicit budgets: process availableNow, then evaluate
    the termination ledger (records/bytes/duration/quiescent). Returns
    (epochs, stop_cause). Budgets that trip mid-drain stop the query at
    the next epoch boundary — epochs are never split."""
    state = DrainState()
    epochs = pipeline.run(spark)
    for ep in epochs:
        state.observe_batch(ep.rows_admitted)
        cause = termination.should_stop(state)
        if cause and cause != "quiescent":
            return epochs, cause
    return epochs, "quiescent"
