"""dlt-compat shim: decorator metadata, incremental cursor semantics,
and engine binding (`python/cdf_sdk/dlt.py:19-176` parity)."""

from __future__ import annotations

import pytest

from cdf_spark.sources import dlt_compat as dlt


def make_resource(inc=None):
    @dlt.resource(primary_key="id", incremental=inc)
    def events():
        for i in range(1, 6):
            yield {"id": i, "v": f"r{i}"}

    return events


def test_resource_metadata_shape():
    @dlt.resource(name="t", table_name="tbl", primary_key=["a", "b"], write_disposition="merge")
    def r():
        yield {}

    meta = getattr(r, dlt.DLT_META_ATTR)
    assert meta["name"] == "t" and meta["table_name"] == "tbl"
    assert meta["primary_key"] == ["a", "b"]
    assert meta["write_disposition"] == "merge"


def test_source_collects_selected_resources():
    @dlt.resource
    def a():
        yield {"x": 1}

    @dlt.resource(selected=False)
    def b():
        yield {"x": 2}

    @dlt.source
    def my_source():
        return [a, b]

    rs = dlt.resources_of(my_source)
    assert set(rs) == {"a"}


def test_incremental_first_and_second_run(spark):
    """dlt cursor semantics: run 1 loads all and advances last_value;
    run 2 with the same state loads nothing new."""
    state = dlt.pipeline_state()
    inc = dlt.incremental("id")
    res = make_resource(inc)

    df1, desc = dlt.run_resource(spark, res, state)
    assert df1.count() == 5
    assert desc.cursor.field == "id"
    assert state.resource_state("events")["last_value"] == 5

    df2, _ = dlt.run_resource(spark, res, state)
    assert df2.count() == 0  # nothing past the high-water mark


def test_incremental_initial_and_end_value(spark):
    state = dlt.pipeline_state()
    inc = dlt.incremental("id", initial_value=2, end_value=4)
    df, _ = dlt.run_resource(spark, make_resource(inc), state)
    assert sorted(r.id for r in df.collect()) == [3, 4]  # (2, 4] window


def test_state_snapshot_roundtrip(spark):
    state = dlt.pipeline_state()
    dlt.run_resource(spark, make_resource(dlt.incremental("id")), state)
    snap = state.snapshot()

    restored = dlt.pipeline_state().load(snap)
    df, _ = dlt.run_resource(spark, make_resource(dlt.incremental("id")), restored)
    assert df.count() == 0  # restored mark suppresses the re-read


def test_descriptor_binding():
    inc = dlt.incremental("id", initial_value=0)
    desc = dlt.to_descriptor(make_resource(inc))
    assert desc.resource_id == "events"
    assert desc.primary_key == ["id"]
    assert desc.dedup_keys == ["id"]
    assert desc.cursor.field == "id" and desc.cursor.initial_value == 0


def test_non_resource_rejected(spark):
    def plain():
        yield {}

    with pytest.raises(TypeError):
        dlt.run_resource(spark, plain)
    with pytest.raises(TypeError):
        dlt.to_descriptor(plain)
