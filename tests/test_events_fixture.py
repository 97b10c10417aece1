"""Fixture-drift guard for events.ts.

The driver has shipped events.parquet in two physical shapes so far:
round 1 = TIMESTAMP(NANOS) (Spark reads as bigint under
nanosAsLong), round 2 = TIMESTAMP_NTZ(us) (Spark forbids numeric
casts). `_events` must normalize BOTH to TimestampType so epoch math
in sessionization / tumbling_window_agg stays legal. This test runs
the real queries against synthetic fixtures in each shape, plus the
live driver fixture, so a third drift shows up as a red test rather
than a crashed bench.
"""

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cdf_spark.queries import QUERIES, _events

ROWS = [
    # (event_id, micros-since-epoch, user_id, event_type, value, props)
    (1, 1_700_000_000_000_000, 1, "click", 1.0, "{}"),
    (2, 1_700_000_000_500_000, 1, "view", 2.0, "{}"),
    # 1h gap -> new session for user 1
    (3, 1_700_003_600_000_000, 1, "click", 3.0, "{}"),
    (4, 1_700_000_100_000_000, 2, "purchase", 4.0, "{}"),
]


def _write_events(path: str, ts_arrow_type, ts_from_micros):
    cols = list(zip(*ROWS))
    table = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array([ts_from_micros(us) for us in cols[1]], ts_arrow_type),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(table, path)


@pytest.fixture(
    scope="module",
    params=[
        ("ntz_us", pa.timestamp("us"), lambda us: dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us)),
        ("nanos", pa.timestamp("ns"), lambda us: dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us)),
    ],
    ids=["timestamp_ntz_us", "timestamp_nanos"],
)
def events_dir(request, tmp_path_factory):
    name, arrow_type, conv = request.param
    d = tmp_path_factory.mktemp(f"events_{name}")
    _write_events(str(d / "events.parquet"), arrow_type, conv)
    return str(d)


def test_events_normalized_to_timestamp(spark, events_dir):
    df = _events(spark, events_dir)
    assert dict(df.dtypes)["ts"] == "timestamp"
    # epoch math must be legal and lossless (session tz is UTC)
    secs = sorted(r[0] for r in df.select(df.ts.cast("long")).collect())
    assert secs == sorted(us // 1_000_000 for us in (r[1] for r in ROWS))


def test_sessionization_on_fixture_shapes(spark, events_dir):
    out = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in QUERIES["sessionization"](spark, events_dir).collect()}
    assert out == {1: (2, 3), 2: (1, 1)}


def test_tumbling_window_on_fixture_shapes(spark, events_dir):
    rows = QUERIES["tumbling_window_agg"](spark, events_dir).collect()
    assert sum(r["n"] for r in rows) == len(ROWS)
    # every bucket is a 300s boundary
    assert all(r["bucket_s"] % 300 == 0 for r in rows)


def test_driver_fixture_runs(spark):
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    df = _events(spark, sf_dir)
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert QUERIES["sessionization"](spark, sf_dir).count() > 0
    assert QUERIES["tumbling_window_agg"](spark, sf_dir).count() > 0
