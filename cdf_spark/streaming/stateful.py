"""Custom stateful streaming operators via applyInPandasWithState.

The reference's Resident extent keeps per-key state across epochs —
keyed-effect winners (`crates/cdf-kernel/src/effect.rs:162-180`) and
contract dedup (`crates/cdf-contract/src/policy.rs:263-275`) both need
"have I seen this key, and what won last" to survive micro-batch
boundaries. Spark's primitive for exactly this is
`applyInPandasWithState`: per-group Arrow-batched state on the
executor, persisted in the state store, recovered from the checkpoint
on restart.

Operators:

- :func:`streaming_dedup_first` — contract dedup `keep: First` as a
  RESIDENT operator: a key admits once across the whole stream
  lifetime (not once per micro-batch), with optional event-time state
  TTL for bounded state.
- :func:`streaming_session_agg` — gap-based sessionization with
  custom per-key accumulators: state holds (start, end, n) until the
  event-time watermark passes session_end + gap, then ONE session row
  emits and the state clears.

Why EVENT-time timeouts, not processing-time: Spark's stateful
operator reports `shouldRunAnotherBatch = true` unconditionally under
ProcessingTimeTimeout, so a Drain-style `availableNow` run never
terminates — it keeps scheduling empty micro-batches to poll wall
clocks forever. Event-time timeouts terminate exactly when the
watermark stops advancing, which is the reference's Drain-extent
contract (terminate when no further progress is possible,
`crates/cdf-runtime/src/extent.rs` Drain semantics) and is
deterministic in tests (no sleeps).

Scale posture: state is partitioned by key hash across executors
(one state store per shuffle partition), memory bounded by live keys x
state row size; the TTL/gap timeout is the pressure valve — the same
epoch-bounded state discipline the reference's Resident extent
prescribes. Batch-mode twins of both semantics exist in
`operators/dedup.py` / session windows in `queries.py`; the oracle
gate covers those, these operators are the streaming carriers.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_WM_COL = "_cdf_event_ts"


def _with_watermark(df: DataFrame, ts_ms_col: str, delay: str) -> DataFrame:
    """Attach an event-time watermark derived from an epoch-millis column."""
    return df.withColumn(_WM_COL, F.timestamp_millis(F.col(ts_ms_col))).withWatermark(
        _WM_COL, delay
    )


def streaming_dedup_first(
    df: DataFrame,
    keys: list[str],
    state_ttl_ms: int | None = None,
    ts_col: str | None = None,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Admit only the FIRST row per key across micro-batches.

    State per key: a single seen flag. Rows of an already-seen key are
    dropped in every later batch (and later in the same batch, in the
    group's arrival order). With `state_ttl_ms` (requires `ts_col`, an
    epoch-millis event-time column), a key's memory expires once the
    event-time watermark passes admission + TTL — bounded state for
    unbounded key domains (re-admission after expiry is the documented
    trade, the same one any TTL'd dedup makes).
    """
    out_schema = df.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])
    cols = [f.name for f in out_schema]
    if state_ttl_ms is not None:
        if ts_col is None:
            raise ValueError("state_ttl_ms requires ts_col (epoch-millis event time)")
        df = _with_watermark(df, ts_col, watermark_delay)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout

    def dedup(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        if not seen:
            for pdf in pdfs:
                if len(pdf):
                    yield pdf.iloc[:1][cols]
                    break
        else:
            for _ in pdfs:  # drain the iterator per contract
                pass
        state.update((True,))
        if state_ttl_ms is not None:
            # timeout must be strictly beyond the current watermark
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + max(state_ttl_ms, 1))

    return df.groupBy(*[F.col(k) for k in keys]).applyInPandasWithState(
        dedup, out_schema, state_schema, "append", timeout
    )


def streaming_session_agg(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_ms: int,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Gap-based sessions with custom state: accumulate per-key counts
    and time bounds; once the event-time watermark passes
    `session_end + gap_ms`, the session row emits and state clears.

    `ts_col` is an epoch-millis long column. Output: (key,
    session_start, session_end, n_events) — one row per closed
    session. (Spark's built-in `session_window` handles pure windowed
    aggregation; this operator is the applyInPandasWithState carrier
    for session state the built-in can't hold, e.g. arbitrary
    accumulators, per-key merge logic, or emit-on-close effects.)
    """
    out_schema = T.StructType(
        [
            T.StructField("key", df.schema[key].dataType),
            T.StructField("session_start", T.LongType()),
            T.StructField("session_end", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start", T.LongType()),
            T.StructField("end", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    df = _with_watermark(df, ts_col, watermark_delay)

    def sessionize(key_tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                [{"key": key_tuple[0], "session_start": start, "session_end": end, "n_events": n}]
            )
            return
        start, end, n = state.get if state.exists else (None, None, 0)
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts = pdf[ts_col].astype("int64")
            lo, hi = int(ts.min()), int(ts.max())
            start = lo if start is None else min(start, lo)
            end = hi if end is None else max(end, hi)
            n += len(pdf)
        if n:
            state.update((start, end, n))
            # close when the watermark passes end+gap (strictly beyond
            # the current watermark, per the EventTimeTimeout contract)
            state.setTimeoutTimestamp(
                max(end + gap_ms, state.getCurrentWatermarkMs() + 1)
            )

    return df.groupBy(F.col(key)).applyInPandasWithState(
        sessionize, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )
