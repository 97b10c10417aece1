"""Jar-free protobuf wire decoding: primitives, proto3 semantics,
framing, Spark distributed read.

Reference parity: `crates/cdf-format-protobuf/src/wire.rs` (field
occurrences, last-wins), `framing.rs` (varint length prefixes),
`schema.rs:11-65` (scalar plans)."""

from __future__ import annotations

import pytest

from cdf_spark.sources.protobuf_format import (
    MessageSpec,
    ProtobufDecodeError,
    decode_message,
    deframe_messages,
    encode_message,
    frame_messages,
    read_protobuf,
    read_varint,
    spec_to_spark,
    write_protobuf,
    write_varint,
)

SPEC = MessageSpec.from_dict(
    {
        "name": "Event",
        "fields": [
            {"name": "id", "number": 1, "type": "int64"},
            {"name": "name", "number": 2, "type": "string"},
            {"name": "score", "number": 3, "type": "double"},
            {"name": "flags", "number": 4, "type": "sint32", "repeated": True},
            {"name": "ok", "number": 5, "type": "bool"},
            {"name": "payload", "number": 6, "type": "bytes"},
            {
                "name": "kind",
                "number": 7,
                "type": "enum",
                "enum_values": {0: "UNKNOWN", 1: "CLICK", 2: "VIEW"},
            },
            {
                "name": "meta",
                "number": 8,
                "type": "message",
                "message": {
                    "name": "Meta",
                    "fields": [
                        {"name": "k", "number": 1, "type": "string"},
                        {"name": "v", "number": 2, "type": "fixed32"},
                    ],
                },
            },
        ],
    }
)


def test_varint_round_trip_including_negatives():
    for n in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, -1, -(2**31)):
        out = bytearray()
        write_varint(out, n)
        got, pos = read_varint(bytes(out), 0)
        want = n if n >= 0 else n + (1 << 64)
        assert got == want and pos == len(out)


def test_encode_decode_round_trip_all_types():
    row = {
        "id": -42,
        "name": "héllo",
        "score": 2.5,
        "flags": [-1, 0, 7],
        "ok": True,
        "payload": b"\x00\x01\xff",
        "kind": "VIEW",
        "meta": {"k": "region", "v": 12},
    }
    got = decode_message(encode_message(row, SPEC), SPEC)
    assert got == row


def test_proto3_defaults_for_missing_fields():
    got = decode_message(b"", SPEC)
    assert got == {
        "id": 0, "name": "", "score": 0.0, "flags": [], "ok": False,
        "payload": b"", "kind": "UNKNOWN", "meta": None,
    }


def test_last_wins_for_non_repeated():
    two = encode_message({"id": 1}, SPEC) + encode_message({"id": 9}, SPEC)
    assert decode_message(two, SPEC)["id"] == 9


def test_unknown_fields_skipped():
    extra_spec = MessageSpec.from_dict(
        {
            "fields": [
                {"name": "id", "number": 1, "type": "int64"},
                {"name": "future", "number": 99, "type": "string"},
                {"name": "f64", "number": 98, "type": "fixed64"},
            ]
        }
    )
    raw = encode_message({"id": 5, "future": "x", "f64": 7}, extra_spec)
    got = decode_message(raw, SPEC)
    assert got["id"] == 5  # 99/98 not in SPEC -> skipped by wire type


def test_packed_repeated_scalars():
    # hand-build a packed sint32 field 4: tag=(4<<3)|2, len, zigzags
    out = bytearray()
    write_varint(out, (4 << 3) | 2)
    payload = bytearray()
    for v in (2, 1, 14):  # zigzag of (1, -1, 7)
        write_varint(payload, v)
    write_varint(out, len(payload))
    out.extend(payload)
    assert decode_message(bytes(out), SPEC)["flags"] == [1, -1, 7]


def test_depth_guard():
    deep = {"fields": [{"name": "m", "number": 1, "type": "message",
                        "message": {"fields": [{"name": "x", "number": 1, "type": "int32"}]}}]}
    spec = MessageSpec.from_dict(deep)
    raw = encode_message({"m": {"x": 1}}, spec)
    with pytest.raises(ProtobufDecodeError, match="depth"):
        decode_message(raw, spec, maximum_depth=1)


def test_framing_round_trip():
    msgs = [b"a", b"", b"x" * 300]
    assert deframe_messages(frame_messages(msgs)) == msgs
    with pytest.raises(ProtobufDecodeError, match="truncated"):
        deframe_messages(frame_messages(msgs)[:-1])


def test_spark_schema_mapping():
    from pyspark.sql import types as T

    st = spec_to_spark(SPEC)
    assert st["id"].dataType == T.LongType()
    assert st["flags"].dataType == T.ArrayType(T.IntegerType())
    assert st["kind"].dataType == T.StringType()
    assert isinstance(st["meta"].dataType, T.StructType)


def test_distributed_read(spark, tmp_path):
    rows = [
        {"id": i, "name": f"e{i}", "score": i / 4.0, "flags": [i, -i],
         "ok": i % 2 == 0, "payload": bytes([i]), "kind": "CLICK" if i % 2 else "VIEW",
         "meta": {"k": "p", "v": i}}
        for i in range(50)
    ]
    # two files -> two decode tasks
    write_protobuf(rows[:30], SPEC, str(tmp_path / "a.pb"))
    write_protobuf(rows[30:], SPEC, str(tmp_path / "b.pb"))
    df = read_protobuf(spark, str(tmp_path / "*.pb"), SPEC)
    got = {r.id: r for r in df.collect()}
    assert len(got) == 50
    assert got[3].name == "e3" and got[3].kind == "CLICK" and got[3].flags == [3, -3]
    assert got[4].meta.v == 4 and got[4].score == 1.0
