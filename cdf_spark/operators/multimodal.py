"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque `binary` columns with a typed metadata struct,
processed by Arrow-batched pandas iterators (`mapInPandas`) — the
Spark-idiomatic shape for per-asset Python work: each batch is a
pandas DataFrame, the decode library is imported once per executor,
and partitioning controls batch locality.

The actual codec work (PIL/ffmpeg/torchaudio) is NOT in this
container, so decode is stubbed: `decode_stub=True` produces
deterministic fake features derived from the bytes (so tests and
oracles are stable); `decode_stub=False` raises NotImplementedError at
the import site, marking exactly where a real decoder plugs in. The
Spark-side plumbing — schema, batch iteration, UDF signatures,
partition sizing — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("content_length", T.LongType(), True),
                    T.StructField("content_hash", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def to_media_table(df: DataFrame, id_col: str, payload_col: str, media_type: str, source_col: str | None = None) -> DataFrame:
    """Wrap raw binary payloads into the canonical media schema."""
    payload = F.col(payload_col)
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            (F.col(source_col) if source_col else F.lit(None).cast("string")).alias("source"),
            F.octet_length(payload).cast("long").alias("content_length"),
            F.md5(payload).alias("content_hash"),
        ).alias("meta"),
    )


def _fake_image_features(payload: bytes, n_dims: int = 8) -> tuple[int, int, list[float]]:
    """Deterministic fake decode: dimensions and features derived from
    the payload hash. Replace with a real decoder (PIL) in production."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feats = [round(b / 255.0, 6) for b in h[2 : 2 + n_dims]]
    return width, height, feats


def extract_image_features(df: DataFrame, decode_stub: bool = True, n_dims: int = 8) -> DataFrame:
    """Per-asset feature extraction over Arrow batches.

    Real implementation would `from PIL import Image` inside the
    iterator (one import per executor process, not per row).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not decode_stub:
            raise NotImplementedError(
                "real image decode requires PIL/opencv (not in this image); "
                "set decode_stub=True or plug a decoder in here"
            )
        for pdf in batches:
            out = {
                "asset_id": [],
                "width": [],
                "height": [],
                "n_bytes": [],
                "feature": [],
            }
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                w, h, feats = _fake_image_features(data, n_dims)
                out["asset_id"].append(asset_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(data))
                out["feature"].append(feats)
            yield pd.DataFrame(out)

    return df.select("asset_id", "payload").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(df: DataFrame, every_n_ms: int = 1000, decode_stub: bool = True) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame.

    Stub emits a deterministic frame count = content_length // 10_000
    (as if ~10 KB per frame-second); real impl plugs ffmpeg into the
    iterator. Output schema: (asset_id, frame_idx, frame_ts_ms,
    frame_payload)."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame_payload", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not decode_stub:
            raise NotImplementedError("real frame sampling requires ffmpeg bindings")
        for pdf in batches:
            rows = {"asset_id": [], "frame_idx": [], "frame_ts_ms": [], "frame_payload": []}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                n_frames = max(1, len(data) // 10_000) if data else 0
                for i in range(n_frames):
                    rows["asset_id"].append(asset_id)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * every_n_ms)
                    rows["frame_payload"].append(data[i * 16 : i * 16 + 16])
            yield pd.DataFrame(rows)

    return df.select("asset_id", "payload").mapInPandas(run, schema)
