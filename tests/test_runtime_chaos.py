"""Runtime-chaos conformance against a LIVE DuckDB: an interrupted
incremental load must resume to exactly the uninterrupted load's final
state (conformance analog of the reference's live-run/runtime-chaos
suites, `crates/cdf-conformance/src/lib.rs:3-16`).

Two failure points are injected into the negotiated-scan -> contract ->
package -> MERGE-commit -> verify -> checkpoint path:

1. Crash AFTER the destination transaction committed but BEFORE the
   receipt verified (verify raises). The checkpoint must NOT advance,
   and the resume re-delivers the same batch — the null-safe keyed
   MERGE absorbs the duplicate (at-least-once + idempotent merge =
   effectively-once table state).
2. Crash INSIDE the merge transaction (after DELETE, before INSERT).
   DuckDB must roll back — the table keeps its pre-batch state, the
   checkpoint must not advance, and the resume completes normally.

Both scenarios end with the table hash equal to a never-interrupted
reference run over the same data.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import duckdb
import pytest

from cdf_spark.package.duckdb_dest import DuckDbDestination
from cdf_spark.package.ledger import CheckpointLedger
from cdf_spark.runtime import LoadPipeline
from cdf_spark.sources import FileResource, ResourceDescriptor
from cdf_spark.sources.base import CursorSpec, WriteDisposition


def _copy_slice(slices: Path, name: str, live: Path) -> None:
    # flat parquet files: spark.read.parquet does not recurse into the
    # per-slice subdirectories a DataFrame write produces
    (src,) = sorted((slices / name).glob("*.parquet"))
    shutil.copy(str(src), str(live / f"{name}.parquet"))


def _table_state(db_path: str) -> list[tuple]:
    con = duckdb.connect(db_path, read_only=True)
    try:
        return con.execute(
            "SELECT o_orderkey, o_custkey, o_totalprice FROM orders_tbl ORDER BY o_orderkey"
        ).fetchall()
    finally:
        con.close()


def _write_slices(spark, orders, root: Path) -> None:
    from pyspark.sql import functions as F

    o = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    root.mkdir()
    o.filter(F.col("o_orderkey") <= 500).coalesce(1).write.mode("overwrite").parquet(
        str(root / "s1")
    )
    o.filter(F.col("o_orderkey") > 500).coalesce(1).write.mode("overwrite").parquet(
        str(root / "s2")
    )


def _pipeline(src_dir: str, tmp: Path, name: str, dest: DuckDbDestination) -> LoadPipeline:
    return LoadPipeline(
        resource=FileResource(
            ResourceDescriptor(resource_id="orders_inc", cursor=CursorSpec("o_orderkey")),
            src_dir,
        ),
        package_root=str(tmp / f"pkgs_{name}"),
        ledger=CheckpointLedger(tmp / f"ledger_{name}"),
        destination=dest,
        disposition=WriteDisposition.MERGE,
    )


def _incremental_load(spark, tmp: Path, slices: Path, name: str, faulty_dest=None) -> str:
    """Two incremental runs (slice 1 visible, then slice 2 added by a
    staging-dir swap); returns the db path. `faulty_dest` replaces the
    destination for the SECOND run only (the injected crash), after
    which a clean resume run follows."""
    db = str(tmp / f"{name}.duckdb")
    dest = DuckDbDestination(db, "orders_tbl", merge_keys=["o_orderkey"])
    live = tmp / f"live_{name}"
    live.mkdir()
    _copy_slice(slices, "s1", live)

    _pipeline(str(live), tmp, name, dest).run(spark)
    led = CheckpointLedger(tmp / f"ledger_{name}")
    pos1 = led.resume_position("orders_inc", "o_orderkey")
    assert pos1 is not None and int(pos1) <= 500

    _copy_slice(slices, "s2", live)
    if faulty_dest is not None:
        with pytest.raises(RuntimeError, match="injected"):
            _pipeline(str(live), tmp, name, faulty_dest(db)).run(spark)
        # the crash must not have advanced the position
        assert led.resume_position("orders_inc", "o_orderkey") == pos1
    _pipeline(str(live), tmp, name, dest).run(spark)
    assert int(led.resume_position("orders_inc", "o_orderkey")) > 500
    return db


@pytest.fixture()
def slices(spark, orders, tmp_path):
    root = tmp_path / "slices"
    _write_slices(spark, orders, root)
    return root


def test_resume_after_verify_crash_matches_uninterrupted(spark, tmp_path, slices):
    """Crash between destination-txn commit and receipt verification:
    the batch IS in the database but the checkpoint did not advance.
    Resume re-delivers the same key range; the keyed MERGE makes the
    replay idempotent and the final table equals the reference run."""

    class VerifyCrashDest(DuckDbDestination):
        def verify(self, spark, receipt, package):
            raise RuntimeError("injected crash before receipt verification")

    ref_db = _incremental_load(spark, tmp_path, slices, "ref")
    chaos_db = _incremental_load(
        spark,
        tmp_path,
        slices,
        "verify_crash",
        faulty_dest=lambda db: VerifyCrashDest(db, "orders_tbl", merge_keys=["o_orderkey"]),
    )
    ref, chaos = _table_state(ref_db), _table_state(chaos_db)
    assert len(ref) > 500
    assert chaos == ref


def test_rollback_on_mid_transaction_crash_then_resume(spark, tmp_path, slices):
    """Crash INSIDE the merge transaction, after the DELETE and before
    the INSERT — the most dangerous instant: a non-transactional sink
    would have destroyed matched rows with nothing inserted. DuckDB
    rolls back; the table must still hold exactly slice 1, and the
    clean resume completes to the reference state."""

    class MidTxnCrashDest(DuckDbDestination):
        def _merge(self, con, glob: str) -> None:
            t = '"orders_tbl"'
            con.execute("BEGIN TRANSACTION")
            try:
                con.execute(
                    f"CREATE TEMPORARY VIEW _stg AS SELECT * FROM read_parquet('{glob}')"
                )
                if not self._table_exists(con):
                    con.execute(f"CREATE TABLE {t} AS SELECT * FROM _stg LIMIT 0")
                con.execute(
                    f"DELETE FROM {t} USING _stg "
                    f"WHERE {t}.o_orderkey IS NOT DISTINCT FROM _stg.o_orderkey"
                )
                raise RuntimeError("injected crash mid-transaction (post-DELETE)")
            except Exception:
                con.execute("ROLLBACK")
                raise

    captured: dict[str, list] = {}

    def make_faulty(db: str):
        # snapshot the pre-batch state so the rollback check is exact
        captured["before"] = _table_state(db)
        return MidTxnCrashDest(db, "orders_tbl", merge_keys=["o_orderkey"])

    ref_db = _incremental_load(spark, tmp_path, slices, "ref2")
    chaos_db = _incremental_load(
        spark, tmp_path, slices, "midtxn_crash", faulty_dest=make_faulty
    )
    assert captured["before"]  # slice 1 was committed before the crash
    assert _table_state(chaos_db) == _table_state(ref_db)


def test_midtxn_rollback_preserves_table(spark, tmp_path, slices):
    """The rollback itself, observed directly: after the injected
    mid-transaction crash the table still holds exactly the slice-1
    rows (DELETE undone), before any resume happens."""

    class MidTxnCrashDest(DuckDbDestination):
        def _merge(self, con, glob: str) -> None:
            con.execute("BEGIN TRANSACTION")
            try:
                con.execute(
                    f"CREATE TEMPORARY VIEW _stg AS SELECT * FROM read_parquet('{glob}')"
                )
                con.execute(
                    'DELETE FROM "orders_tbl" USING _stg '
                    'WHERE "orders_tbl".o_orderkey IS NOT DISTINCT FROM _stg.o_orderkey'
                )
                raise RuntimeError("injected crash mid-transaction (post-DELETE)")
            except Exception:
                con.execute("ROLLBACK")
                raise

    db = str(tmp_path / "t.duckdb")
    dest = DuckDbDestination(db, "orders_tbl", merge_keys=["o_orderkey"])
    live = tmp_path / "live"
    live.mkdir()
    _copy_slice(slices, "s1", live)
    _pipeline(str(live), tmp_path, "t", dest).run(spark)
    before = _table_state(db)
    assert before

    _copy_slice(slices, "s2", live)
    faulty = MidTxnCrashDest(db, "orders_tbl", merge_keys=["o_orderkey"])
    with pytest.raises(RuntimeError, match="injected"):
        _pipeline(str(live), tmp_path, "t", faulty).run(spark)
    assert _table_state(db) == before  # transaction rolled back in full
