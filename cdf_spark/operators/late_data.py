"""Late-data classification: recapture / quarantine / admit-annotated.

Re-expresses the reference's late-data machinery
(`LateDataAction`, `crates/cdf-kernel/src/execution_extent.rs:613-617`;
`classify_late_data`, `crates/cdf-engine/src/late_data.rs:22-110`):
rows whose event time is ≤ the resource's current watermark are not
silently dropped (Spark's default) — they are split per declared
action with row-level evidence:

  recapture   carried over to the next epoch (LateDataCarryoverRef)
  quarantine  routed to the quarantine segment
  annotate    admitted with `_cdf_late=true`

The watermark is an explicit value (from the watermark ledger /
streaming state), not wall clock, and may live in a non-timestamp
domain (ints, decimals — `execution_extent.rs:282-325`): the
comparison is plain `col <= lit(watermark)` so any ordered type works.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LATE_COL = "_cdf_late"


@dataclass
class LateDataSplit:
    on_time: DataFrame
    recaptured: DataFrame | None
    quarantined: DataFrame | None
    admitted_annotated: DataFrame  # on-time ∪ (late if action=annotate), with _cdf_late


def classify_late_data(
    df: DataFrame,
    event_col: str,
    watermark_value,
    action: str = "annotate",  # recapture | quarantine | annotate
) -> LateDataSplit:
    """Split rows on `event_col <= watermark_value` per the action.

    ``watermark_value`` may be a scalar (the stored ledger value) or a
    Column already present on ``df`` (e.g. a broadcast-joined 1-row
    aggregate) — the Column form keeps a derived watermark inside one
    lazy plan instead of forcing a driver-side collect."""
    if action not in ("recapture", "quarantine", "annotate"):
        raise ValueError(f"unknown late-data action {action!r}")

    from pyspark.sql import Column

    wm = watermark_value if isinstance(watermark_value, Column) else F.lit(watermark_value)
    is_late = F.col(event_col) <= wm
    annotated = df.withColumn(LATE_COL, F.coalesce(is_late, F.lit(False)))
    on_time = annotated.filter(~F.col(LATE_COL))
    late = annotated.filter(F.col(LATE_COL))

    if action == "recapture":
        return LateDataSplit(
            on_time=on_time.drop(LATE_COL),
            recaptured=late.drop(LATE_COL),
            quarantined=None,
            admitted_annotated=on_time,
        )
    if action == "quarantine":
        return LateDataSplit(
            on_time=on_time.drop(LATE_COL),
            recaptured=None,
            quarantined=late,
            admitted_annotated=on_time,
        )
    return LateDataSplit(
        on_time=on_time.drop(LATE_COL),
        recaptured=None,
        quarantined=None,
        admitted_annotated=annotated,
    )
