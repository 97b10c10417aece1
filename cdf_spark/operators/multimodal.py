"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque `binary` columns with a typed metadata struct,
processed by Arrow-batched pandas iterators (`mapInPandas`) — the
Spark-idiomatic shape for per-asset Python work: each batch is a
pandas DataFrame, the decode library is imported once per executor,
and partitioning controls batch locality.

Image decode is REAL for uncompressed formats: a pure-numpy codec for
24-bit BMP and binary PPM/PGM (`decode_image`) parses headers, strips
row padding, un-flips BMP's bottom-up rows, and reorders BGR->RGB —
features come from actual pixel arrays. Compressed formats (JPEG/PNG)
route through PIL when importable and otherwise raise
NotImplementedError at the dispatch site, marking exactly where a
codec library plugs in. `decode_stub=True` keeps the deterministic
hash-derived fake as a fixture path for plumbing tests. ffmpeg-bound
audio/video decode remains stubbed the same way.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
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


# ---------------------------------------------------------------------------
# pure-numpy image codec (24-bit BMP, binary PPM/PGM)


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (BITMAPINFOHEADER): rows bottom-up, BGR byte order, each row padded
    to a 4-byte boundary — the format every viewer reads."""
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_bmp wants (h, w, 3) RGB")
    h, w, _ = arr.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += arr[y, :, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    img_size = len(body)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    return header + dib + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to (h, w, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack_from("<I", data, 10)
    dib_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression} unsupported")
    flipped = h > 0  # positive height = bottom-up storage
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    px = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    px = px.reshape(h, stride)[:, :row].reshape(h, w, 3)
    if flipped:
        px = px[::-1]
    return px[:, :, ::-1].copy()  # BGR -> RGB


def _decode_pnm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, RGB) / PGM (P5, grayscale) -> (h, w, 3) uint8."""
    fields: list[bytes] = []
    pos = 2
    while len(fields) < 3:  # width, height, maxval (comments skipped)
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            pos = data.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(data) and not data[end : end + 1].isspace():
            end += 1
        fields.append(data[pos:end])
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(f) for f in fields)
    if maxval > 255:
        raise NotImplementedError("16-bit PNM unsupported")
    ch = 3 if data[:2] == b"P6" else 1
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * ch, offset=pos).reshape(h, w, ch)
    return np.repeat(px, 3, axis=2) if ch == 1 else px.copy()


def decode_image(data: bytes) -> np.ndarray:
    """Dispatch on magic bytes -> (h, w, 3) uint8 RGB. BMP and PPM/PGM
    decode natively (numpy); anything else tries PIL and otherwise
    raises NotImplementedError — the honest boundary where a codec
    library plugs in."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] in (b"P6", b"P5"):
        return _decode_pnm(data)
    try:
        import io

        from PIL import Image  # not in the build image; works when present

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    except ImportError:
        raise NotImplementedError(
            f"no native decoder for magic {data[:2]!r} and PIL is unavailable"
        ) from None


def image_pixel_stats(df: DataFrame) -> DataFrame:
    """REAL per-image statistics from decoded pixel arrays: dimensions,
    per-channel means, and the bottom-right corner's red value (the
    corner catches orientation/channel-order bugs a mean cannot —
    BMP stores rows bottom-up in BGR, so a lazy decoder that skips the
    un-flip or the reorder produces the right means and the wrong
    corner). Arrow-batched mapInPandas; numpy imported once per
    executor, O(pixels) per asset."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("mean_r", T.DoubleType(), True),
            T.StructField("mean_g", T.DoubleType(), True),
            T.StructField("mean_b", T.DoubleType(), True),
            T.StructField("corner_r", T.IntegerType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "width", "height", "mean_r", "mean_g", "mean_b", "corner_r")}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                px = decode_image(bytes(payload))
                h, w, _ = px.shape
                means = px.reshape(-1, 3).mean(axis=0)
                # raw doubles, deliberately unrounded: integer pixel sums
                # are exact in float64, so both engines compute the
                # bit-identical quotient — rounding would ADD a
                # half-even-vs-half-up parity hazard, not remove one
                out["asset_id"].append(asset_id)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(float(means[0]))
                out["mean_g"].append(float(means[1]))
                out["mean_b"].append(float(means[2]))
                out["corner_r"].append(int(px[h - 1, w - 1, 0]))
            yield pd.DataFrame(out)

    return df.select("asset_id", "payload").mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# pure-numpy audio codec (RIFF/WAVE, 16-bit PCM)


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode a 1-D int16 array as a canonical RIFF/WAVE file (PCM,
    mono, 16-bit little-endian)."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = fmt + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE 16-bit PCM -> (samples int16 [n, channels],
    sample_rate). Walks the chunk list (real WAVs carry LIST/fact/cue
    chunks between fmt and data — fixed offsets are a decoder bug)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sample_rate, channels, bits, frames = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", data, pos)
            bits = struct.unpack_from("<H", data, pos + 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(f"WAV format {audio_fmt}/{bits}-bit unsupported")
        elif cid == b"data":
            if channels is None:
                raise ValueError("WAV data chunk before fmt chunk")
            n = size // (2 * channels)
            frames = np.frombuffer(data, dtype="<i2", count=n * channels, offset=pos).reshape(
                n, channels
            )
        pos += size + (size % 2)  # chunks are word-aligned
    if frames is None:
        raise ValueError("WAV has no data chunk")
    return frames, int(sample_rate)


def audio_sample_stats(df: DataFrame) -> DataFrame:
    """REAL per-clip statistics from decoded PCM: sample counts, exact
    integer sum/abs-sum (engine-exact, so a SQL oracle can match them
    bit-for-bit), and zero-crossing count — the waveform-shape signal
    level/length stats cannot fake."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("sum_amp", T.LongType(), True),
            T.StructField("sum_abs", T.LongType(), True),
            T.StructField("zero_crossings", T.LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "sample_rate", "n_samples", "sum_amp", "sum_abs", "zero_crossings")}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                frames, sr = decode_wav(bytes(payload))
                mono = frames[:, 0].astype(np.int64)
                out["asset_id"].append(asset_id)
                out["sample_rate"].append(sr)
                out["n_samples"].append(len(mono))
                out["sum_amp"].append(int(mono.sum()))
                out["sum_abs"].append(int(np.abs(mono).sum()))
                out["zero_crossings"].append(int(((mono[:-1] >= 0) != (mono[1:] >= 0)).sum()))
            yield pd.DataFrame(out)

    return df.select("asset_id", "payload").mapInPandas(run, schema)


def synthetic_wav_table(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One REAL 16-bit PCM WAV per input id from a closed-form
    triangle-ish waveform a SQL oracle can recompute:

        n  = 400 + id % 700          (samples, mono, 16 kHz)
        s_t = ((t * (13 + id % 7)) % 2001) - 1000   for t in [0, n)
    """
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "payload": []}
            for i in pdf[id_col]:
                i = int(i)
                n = 400 + i % 700
                t = np.arange(n, dtype=np.int64)
                s = ((t * (13 + i % 7)) % 2001) - 1000
                out["asset_id"].append(i)
                out["payload"].append(encode_wav(s.astype(np.int16)))
            yield pd.DataFrame(out)

    return ids_df.select(id_col).mapInPandas(gen, schema)


def synthetic_bmp_table(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One REAL 24-bit BMP per input id, generated executor-side from a
    closed-form pixel formula (channel- and axis-asymmetric so decoder
    bugs — row flip, BGR order, padding — shift the statistics):

        w = 8 + id % 23,  h = 8 + id % 17
        r(x,y) = (3x + 5y +  id) % 256
        g(x,y) = (7x + 2y + 2id) % 256
        b(x,y) = ( x + 11y + 3id) % 256

    The closed form is what lets a SQL oracle recompute the decoded
    statistics independently — the parity test of the whole
    encode -> decode -> feature path."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "payload": []}
            for i in pdf[id_col]:
                i = int(i)
                w, h = 8 + i % 23, 8 + i % 17
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                arr = np.stack(
                    [
                        np.broadcast_to((3 * x + 5 * y + i) % 256, (h, w)),
                        np.broadcast_to((7 * x + 2 * y + 2 * i) % 256, (h, w)),
                        np.broadcast_to((x + 11 * y + 3 * i) % 256, (h, w)),
                    ],
                    axis=2,
                ).astype(np.uint8)
                out["asset_id"].append(i)
                out["payload"].append(encode_bmp(arr))
            yield pd.DataFrame(out)

    return ids_df.select(id_col).mapInPandas(gen, schema)


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

    ``decode_stub=False`` decodes REAL pixels (`decode_image`: native
    BMP/PNM, PIL when present, NotImplementedError for anything else)
    and emits true dimensions plus a spatial feature: mean luma of
    `n_dims` vertical bands, normalized to [0, 1]. ``decode_stub=True``
    keeps the hash-derived fake for plumbing tests with arbitrary
    payload bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
                if decode_stub:
                    w, h, feats = _fake_image_features(data, n_dims)
                else:
                    px = decode_image(data)
                    h, w, _ = px.shape
                    luma = px.astype(np.float64).mean(axis=2)  # h x w
                    bands = np.array_split(luma, n_dims, axis=1)
                    feats = [round(float(b.mean()) / 255.0, 6) for b in bands]
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


def resize_image(arr: np.ndarray, out_h: int, out_w: int, method: str = "bilinear") -> np.ndarray:
    """Pure-numpy image resize (H x W x C uint8 -> out_h x out_w x C).

    - "nearest": pixel-center mapping `src = floor((i + 0.5) * in/out)`
      — every output pixel is an EXACT source lookup, so a SQL oracle
      can recompute resized statistics from the synthetic corpus's
      closed-form pixels (the parity mode).
    - "bilinear": half-pixel-centers convention (`src = (i + 0.5) *
      in/out - 0.5`, edges clamped) — the quality mode, the same
      convention OpenCV/PIL default to."""
    h, w = arr.shape[:2]
    if method == "nearest":
        sy = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
        sx = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
        return arr[sy[:, None], sx[None, :]]
    if method != "bilinear":
        raise ValueError(f"unknown resize method {method!r}")
    fy = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    fx = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    a = arr.astype(np.float64)
    top = a[y0[:, None], x0[None, :]] * (1 - wx) + a[y0[:, None], x1[None, :]] * wx
    bot = a[y1[:, None], x0[None, :]] * (1 - wx) + a[y1[:, None], x1[None, :]] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def resize_images(
    df: DataFrame,
    out_h: int,
    out_w: int,
    method: str = "bilinear",
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Batch image resize as an Arrow-batched mapInPandas: decode
    (BMP/PNM), resize, re-encode BMP — the media transform stage of a
    multimodal pipeline. Output: (asset_id, payload, h, w). Payloads
    stay opaque binary with typed metadata, per the media-table
    contract."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("w", T.IntegerType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "payload": [], "h": [], "w": []}
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = decode_image(bytes(payload))
                res = resize_image(arr, out_h, out_w, method=method)
                out["asset_id"].append(int(i))
                out["payload"].append(encode_bmp(res))
                out["h"].append(out_h)
                out["w"].append(out_w)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def image_resize_stats(
    df: DataFrame,
    out_h: int,
    out_w: int,
    method: str = "nearest",
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-image channel means AFTER resize, rounded for cross-engine
    comparison — decode -> resize -> stats in ONE Arrow-batched pass
    (no intermediate payload materialization). With method="nearest"
    over the synthetic closed-form corpus, a SQL oracle recomputes
    every value exactly."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("h", T.IntegerType(), False),
            T.StructField("w", T.IntegerType(), False),
            T.StructField("mean_r", T.DoubleType(), False),
            T.StructField("mean_g", T.DoubleType(), False),
            T.StructField("mean_b", T.DoubleType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "h", "w", "mean_r", "mean_g", "mean_b")}
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = resize_image(decode_image(bytes(payload)), out_h, out_w, method=method)
                m = arr.reshape(-1, arr.shape[2]).mean(axis=0)
                out["asset_id"].append(int(i))
                out["h"].append(out_h)
                out["w"].append(out_w)
                out["mean_r"].append(round(float(m[0]), 4))
                out["mean_g"].append(round(float(m[1]), 4))
                out["mean_b"].append(round(float(m[2]), 4))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def resample_audio_nearest(samples: np.ndarray, in_rate: int, out_rate: int) -> np.ndarray:
    """Nearest-sample audio resample (the decimation/upsampling mode a
    SQL oracle can reproduce — every output sample is an exact source
    lookup at `floor((j + 0.5) * n / n_out)`). Linear-phase filtering
    belongs to a DSP library; the Spark-side contract here is the
    plumbing: decode -> rate change -> re-encode, Arrow-batched."""
    n = samples.shape[0]
    n_out = max(1, (n * out_rate) // in_rate)
    src = np.minimum(((np.arange(n_out) + 0.5) * n / n_out).astype(np.int64), n - 1)
    return samples[src]


def audio_resample_stats(
    df: DataFrame,
    out_rate: int = 8_000,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode -> nearest-resample -> stats in ONE Arrow-batched pass:
    (asset_id, n_samples, sample_rate, mean_abs) of the RESAMPLED
    signal. Over the synthetic closed-form corpus a SQL oracle
    recomputes every value — a wrong sample mapping (off-by-half,
    rate inversion, channel mixup) shifts mean_abs and breaks it."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("n_samples", T.IntegerType(), False),
            T.StructField("sample_rate", T.IntegerType(), False),
            T.StructField("mean_abs", T.DoubleType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "n_samples", "sample_rate", "mean_abs")}
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                frames, sr = decode_wav(bytes(payload))
                mono = frames[:, 0]
                res = resample_audio_nearest(mono, sr, out_rate)
                out["asset_id"].append(int(i))
                out["n_samples"].append(int(res.shape[0]))
                out["sample_rate"].append(int(out_rate))
                out["mean_abs"].append(round(float(np.abs(res.astype(np.float64)).mean()), 4))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# pure-numpy video codec (YUV4MPEG2 / .y4m — raw uncompressed frames)


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode (T, H, W) uint8 LUMA frames as YUV4MPEG2 (4:2:0, U/V
    planes constant 128 = grayscale) — the raw container ffmpeg and
    mjpegtools speak, simple enough to be a real pure-numpy video
    path (compressed codecs stay the library plug-in point)."""
    t, h, w = frames.shape
    if h % 2 or w % 2:
        raise ValueError("y4m 4:2:0 needs even dimensions")
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()
    chroma = np.full((h // 2, w // 2), 128, dtype=np.uint8).tobytes()
    body = bytearray()
    for f in frames:
        body += b"FRAME\n" + f.astype(np.uint8).tobytes() + chroma + chroma
    return head + bytes(body)


def decode_y4m(data: bytes) -> np.ndarray:
    """Decode YUV4MPEG2 (C420) to (T, H, W) uint8 luma frames."""
    if not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a y4m payload")
    nl = data.index(b"\n")
    w = h = None
    for tok in data[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C" and tok not in (b"C420", b"C420jpeg", b"C420mpeg2"):
            raise NotImplementedError(f"y4m chroma {tok!r} unsupported")
    if w is None or h is None:
        raise ValueError("y4m header missing W/H")
    frame_bytes = h * w + 2 * (h // 2) * (w // 2)
    pos, frames = nl + 1, []
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {pos}")
        pos = data.index(b"\n", pos) + 1  # frame params allowed after FRAME
        luma = np.frombuffer(data, dtype=np.uint8, count=h * w, offset=pos).reshape(h, w)
        frames.append(luma)
        pos += frame_bytes
    return np.stack(frames)


def synthetic_y4m_table(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One REAL y4m clip per id from a closed-form luma formula a SQL
    oracle can recompute:

        T = 4 + id % 5,  w = 8 + 2*(id % 5),  h = 8 + 2*(id % 4)
        y(t, x, y) = (5x + 7y + 11t + id) % 256
    """
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "payload": []}
            for i in pdf[id_col]:
                i = int(i)
                nt, w, h = 4 + i % 5, 8 + 2 * (i % 5), 8 + 2 * (i % 4)
                x = np.arange(w)[None, None, :]
                y = np.arange(h)[None, :, None]
                t = np.arange(nt)[:, None, None]
                frames = ((5 * x + 7 * y + 11 * t + i) % 256).astype(np.uint8)
                out["asset_id"].append(i)
                out["payload"].append(encode_y4m(np.broadcast_to(frames, (nt, h, w)).copy()))
            yield pd.DataFrame(out)

    return ids_df.select(id_col).mapInPandas(gen, schema)


def video_frame_sample_stats(
    df: DataFrame,
    every_n: int = 2,
    id_col: str = "asset_id",
    payload_col: str = "payload",
) -> DataFrame:
    """FRAME SAMPLING over real decoded video: decode y4m, keep every
    Nth frame, emit per-sampled-frame luma means — the
    decode -> frame-sample -> feature stage of a video curation
    pipeline, one Arrow-batched pass, one output row per sampled
    frame (posexploded shape)."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("n_frames", T.IntegerType(), False),
            T.StructField("mean_y", T.DoubleType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "frame_idx", "n_frames", "mean_y")}
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                frames = decode_y4m(bytes(payload))
                for idx in range(0, frames.shape[0], every_n):
                    out["asset_id"].append(int(i))
                    out["frame_idx"].append(int(idx))
                    out["n_frames"].append(int(frames.shape[0]))
                    out["mean_y"].append(
                        round(float(frames[idx].astype(np.float64).mean()), 4)
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def synthetic_bmp_near_dup_table(
    ids_df: DataFrame, id_col: str = "doc_id", copy_base: int = 1000, brightness: int = 8
) -> DataFrame:
    """`synthetic_bmp_table` plus NEAR-DUPLICATE construction: an id
    >= `copy_base` encodes the SAME closed-form image as id -
    copy_base (same dims, same pixel formulas) with every channel
    brightness-shifted by min(255, v + brightness) — a perceptual
    near-dup whose dHash differs only where the clip zone flips
    gradient signs. The closed form (including the clip) keeps the
    whole path SQL-recomputable."""
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "payload": []}
            for i in pdf[id_col]:
                i = int(i)
                src = i - copy_base if i >= copy_base else i
                w, h = 8 + src % 23, 8 + src % 17
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                # hash-ish (not gradient) pixels: distinct ids get
                # effectively independent bit patterns, so banded
                # collisions are confined to the PLANTED copies — the
                # smooth-gradient formula of synthetic_bmp_table makes
                # every image's gradient-sign pattern near-identical
                # (useless as a near-dup fixture)
                arr = np.stack(
                    [
                        np.broadcast_to(
                            (2654435761 * x + 40503 * y + 97 * src) % 256, (h, w)
                        ),
                        np.broadcast_to(
                            (2246822519 * x + 3266489917 * y + 131 * src) % 256, (h, w)
                        ),
                        np.broadcast_to(
                            (668265263 * x + 374761393 * y + 193 * src) % 256, (h, w)
                        ),
                    ],
                    axis=2,
                ).astype(np.int64)
                if i >= copy_base:
                    arr = np.minimum(255, arr + brightness)
                out["asset_id"].append(i)
                out["payload"].append(encode_bmp(arr.astype(np.uint8)))
            yield pd.DataFrame(out)

    return ids_df.select(id_col).mapInPandas(gen, schema)


def image_dhash(df: DataFrame, payload_col: str = "payload", id_col: str = "asset_id") -> DataFrame:
    """Perceptual dHash (difference hash) over REAL decoded images —
    the standard image near-dup fingerprint (pHash family): integer
    grayscale (299r+587g+114b)//1000, NEAREST-neighbor resize to 9x8
    (src = (dst*dim)//target — exact integer index math, which is what
    lets a SQL oracle recompute the hash from the pixel formula), then
    bit(y,x) = gray[y,x+1] > gray[y,x], emitted as a 64-char '0'/'1'
    string in row-major order. Brightness/contrast shifts that
    preserve gradient signs leave the hash unchanged — the invariance
    image dedup wants. One narrow mapInPandas pass, no shuffle."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("dhash", T.StringType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = decode_bmp(bytes(payload)).astype(np.int64)
                h, w = arr.shape[0], arr.shape[1]
                gray = (299 * arr[:, :, 0] + 587 * arr[:, :, 1] + 114 * arr[:, :, 2]) // 1000
                sx = (np.arange(9) * w) // 9
                sy = (np.arange(8) * h) // 8
                g = gray[np.ix_(sy, sx)]  # 8 rows x 9 cols
                bits = (g[:, 1:] > g[:, :-1]).astype(np.uint8)  # 8x8
                hashes.append("".join("1" if b else "0" for b in bits.ravel()))
                ids.append(int(i))
            yield pd.DataFrame({id_col: ids, "dhash": hashes})

    return df.mapInPandas(gen, schema)


def banded_hamming_near_dups(
    hashes: DataFrame,
    id_col: str = "asset_id",
    bands: int = 4,
    max_hamming: int = 6,
) -> DataFrame:
    """Banded Hamming join over 64-bit fingerprint strings — the
    modality-generic matcher behind image dHash AND audio envelope
    hashes (the SimHash banding idea): 4 x 16-bit bands, candidates
    collide in >= 1 band (guaranteed recall for Hamming <= bands - 1,
    high recall well past it), exact Hamming distance verifies
    candidates. One shuffle on (band, value); no all-pairs anywhere."""
    r = 64 // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.substring("dhash", b * r + 1, r).alias("bv"),
        )
        for b in range(bands)
    ]
    banded = hashes.select(
        F.col(id_col).alias("id"), "dhash", F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", "dhash", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.dhash").alias("ha"),
            F.col("b.dhash").alias("hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: F.col("ha").substr(i, F.lit(1)) != F.col("hb").substr(i, F.lit(1)),
        )
    )
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def image_dhash_near_dups(
    hashes: DataFrame,
    id_col: str = "asset_id",
    bands: int = 4,
    max_hamming: int = 6,
) -> DataFrame:
    return banded_hamming_near_dups(hashes, id_col, bands, max_hamming)


def synthetic_wav_near_dup_table(
    ids_df: DataFrame,
    id_col: str = "doc_id",
    copy_base: int = 1000,
    gain_num: int = 9,
    gain_den: int = 8,
) -> DataFrame:
    """WAV fixture with PLANTED near-duplicates: an id >= `copy_base`
    encodes the SAME closed-form signal as id - copy_base with a
    gain_num/gain_den amplitude scale (integer floor division,
    clipped to int16) — a re-levelled copy of the same recording, the
    audio analog of a brightness-shifted image. Signal is hash-ish so
    unrelated ids get independent envelope patterns:

        n   = 400 + src % 700
        s_t = ((t*t*(7 + src % 13) + t*(11 + src % 17) + 97*src) % 4001) - 2000
    """
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "payload": []}
            for i in pdf[id_col]:
                i = int(i)
                src = i - copy_base if i >= copy_base else i
                n = 400 + src % 700
                t = np.arange(n, dtype=np.int64)
                s = ((t * t * (7 + src % 13) + t * (11 + src % 17) + 97 * src) % 4001) - 2000
                if i >= copy_base:
                    s = np.clip((s * gain_num) // gain_den, -32768, 32767)
                out["asset_id"].append(i)
                out["payload"].append(encode_wav(s.astype(np.int16)))
            yield pd.DataFrame(out)

    return ids_df.select(id_col).mapInPandas(gen, schema)


def audio_envelope_hash(
    df: DataFrame, payload_col: str = "payload", id_col: str = "asset_id"
) -> DataFrame:
    """Audio ENVELOPE hash — the dHash idea on the loudness envelope:
    decode the WAV, split into 65 integer-boundary frames
    (lo = (f*n)//65), per-frame mean absolute amplitude (integer), and
    bit f = energy[f+1] > energy[f] -> a 64-char '0'/'1' string.
    Uniform gain changes scale every frame energy together, so a
    re-levelled copy keeps (almost) every comparison — the invariance
    audio dedup wants; time-structure changes scramble the bits. One
    narrow mapInPandas pass; pairs come from the shared
    `banded_hamming_near_dups` matcher. All integer math so a SQL
    oracle recomputes the hash exactly from the closed-form signal."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("dhash", T.StringType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                s, _sr = decode_wav(bytes(payload))
                s = s.astype(np.int64)
                n = len(s)
                bounds = (np.arange(66) * n) // 65
                e = np.array(
                    [
                        int(np.sum(np.abs(s[bounds[f] : bounds[f + 1]])))
                        // max(1, int(bounds[f + 1] - bounds[f]))
                        for f in range(65)
                    ],
                    dtype=np.int64,
                )
                bits = (e[1:] > e[:-1]).astype(np.uint8)
                hashes.append("".join("1" if b else "0" for b in bits))
                ids.append(int(i))
            yield pd.DataFrame({id_col: ids, "dhash": hashes})

    return df.mapInPandas(gen, schema)
