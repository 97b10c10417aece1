"""Mongo-shaped source: extended-JSON scans + change-stream effects
with resume-token positions (`crates/cdf-source-mongodb/src/resource.rs:254-340`
semantics over the public interchange formats)."""

from __future__ import annotations

import json

from cdf_spark.positions import ResumeToken
from cdf_spark.sources import ResourceDescriptor
from cdf_spark.sources.mongo_source import MongoChangeStreamResource, MongoCollectionResource


def test_collection_scan_unwraps_extended_json(spark, tmp_path):
    docs = [
        {"_id": {"$oid": "64b000000000000000000001"}, "n": {"$numberLong": "42"},
         "at": {"$date": "2024-03-01T12:00:00Z"}, "name": "a"},
        {"_id": {"$oid": "64b000000000000000000002"}, "n": {"$numberLong": "43"},
         "at": {"$date": "2024-03-02T12:00:00Z"}, "name": "b"},
    ]
    p = tmp_path / "coll.ndjson"
    p.write_text("\n".join(json.dumps(d) for d in docs))
    res = MongoCollectionResource(ResourceDescriptor(resource_id="coll"), str(p))
    df = res.read(spark)
    rows = {r._id: r for r in df.collect()}
    assert rows["64b000000000000000000001"].n == 42
    assert str(df.schema["n"].dataType) == "LongType()"
    assert rows["64b000000000000000000002"].name == "b"
    assert rows["64b000000000000000000001"].at.year == 2024


def _event(token, op, _id, doc=None):
    e = {"_id": {"_data": token}, "operationType": op, "documentKey": {"_id": _id}}
    if doc is not None:
        e["fullDocument"] = {"_id": _id, **doc}
    return e


def test_change_stream_apply_and_resume(spark, tmp_path):
    events = [
        _event("0001", "insert", 1, {"v": "a"}),
        _event("0002", "insert", 2, {"v": "b"}),
        _event("0003", "update", 1, {"v": "a2"}),
        _event("0004", "delete", 2),
    ]
    p = tmp_path / "events.ndjson"
    p.write_text("\n".join(json.dumps(e) for e in events))
    res = MongoChangeStreamResource(ResourceDescriptor(resource_id="cs"), str(p))

    target = spark.createDataFrame([(0, "seed")], "_id long, v string")
    applied, pos = res.apply(spark, target)
    got = {r._id: r.v for r in applied.collect()}
    # 1 upserted at its LAST state, 2 inserted-then-deleted, seed kept
    assert got == {0: "seed", 1: "a2"}
    assert pos == ResumeToken("0004")

    # resume: replaying from the checkpointed token applies nothing new
    applied2, pos2 = res.apply(spark, applied, resume_after=pos)
    assert {r._id: r.v for r in applied2.collect()} == got
    assert pos2 == pos

    # a partial resume re-applies only later events
    ev = res.events(spark, resume_after=ResumeToken("0002"))
    assert {r._token for r in ev.collect()} == {"0003", "0004"}


def test_resume_token_merge_algebra():
    assert ResumeToken("0009").merge(ResumeToken("0002")) == ResumeToken("0009")
    assert ResumeToken("0002").merge(ResumeToken("0009")) == ResumeToken("0009")
