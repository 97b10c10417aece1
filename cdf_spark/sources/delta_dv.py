"""Delta Lake deletion vectors, jar-free: Z85 codec, portable
RoaringBitmap(Array) serialization, and the on-disk DV file format —
the merge-on-read row-removal mechanism of the public Delta protocol
(PROTOCOL.md "Deletion Vectors"; same public-spec-implementation
posture as `iceberg.py`'s manifest codecs and `hudi_mor.py`'s log
blocks).

A deletion-vector descriptor on an `add` action marks rows of that
parquet file as deleted WITHOUT rewriting the file:

    {"storageType": "u" | "i" | "p",
     "pathOrInlineDv": ..., "offset": int?, "sizeInBytes": int,
     "cardinality": int}

- `u`: stored in `deletion_vector_<uuid>.bin` under the table root;
  `pathOrInlineDv` = optional random prefix + Z85-encoded 16-byte UUID
  (the final 20 characters).
- `i`: `pathOrInlineDv` IS the Z85-encoded bitmap blob.
- `p`: absolute path to the DV file.

The bitmap blob is `<magic 1681511377, int32 LE>` followed by the
64-bit RoaringBitmapArray portable serialization: int64 LE bitmap
count, then per bitmap an int32 LE high-key + the standard 32-bit
RoaringBitmap portable format (RoaringFormatSpec: cookie 12346/12347,
array / bitmap / run containers — all three decoded here; this writer
emits the no-run cookie). DV FILES frame each blob as
`<size int32 BE><blob><crc32-of-blob int32 BE>` after a 1-byte format
version; descriptors point `offset` at the size field.

Scale: descriptors are metadata (a handful of ints + a path) — the
driver never holds positions; blobs decode EXECUTOR-side in the
reader (`delta.py` distributes descriptors and anti-joins on parquet
`_metadata.row_index`, the same shape as Iceberg positional deletes).
"""

from __future__ import annotations

import struct
import uuid as _uuid
import zlib
from pathlib import Path

DV_MAGIC = 1681511377
_COOKIE_NO_RUN = 12346
_COOKIE_RUN = 12347

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


class DeletionVectorError(ValueError):
    pass


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise DeletionVectorError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            n, r = divmod(n, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise DeletionVectorError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i : i + 5]:
            try:
                n = n * 85 + _Z85_INDEX[c]
            except KeyError:
                raise DeletionVectorError(f"invalid z85 character {c!r}") from None
        out += n.to_bytes(4, "big")
    return bytes(out)


# ---------------------------------------------------------------------------
# 32-bit RoaringBitmap portable serialization


def _serialize_roaring32(values: list[int]) -> bytes:
    """Sorted distinct uint32 values -> portable bytes (no-run cookie:
    array containers <=4096 cardinality, bitmap containers above)."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<II", _COOKIE_NO_RUN, len(keys))
    bodies = []
    for k in keys:
        lows = sorted(set(containers[k]))
        out += struct.pack("<HH", k, len(lows) - 1)
        if len(lows) <= 4096:
            bodies.append(struct.pack(f"<{len(lows)}H", *lows))
        else:
            bits = bytearray(8192)
            for lo in lows:
                bits[lo >> 3] |= 1 << (lo & 7)
            bodies.append(bytes(bits))
    # offset header is mandatory for the no-run cookie
    pos = len(out) + 4 * len(keys)
    for b in bodies:
        out += struct.pack("<I", pos)
        pos += len(b)
    for b in bodies:
        out += b
    return bytes(out)


def _deserialize_roaring32(buf: bytes, off: int) -> tuple[list[int], int]:
    """-> (sorted values, bytes consumed). Decodes array, bitmap AND
    run containers (real Delta writers run-compress)."""
    (cookie,) = struct.unpack_from("<I", buf, off)
    pos = off + 4
    run_flags = b""
    if (cookie & 0xFFFF) == _COOKIE_RUN:
        n = (cookie >> 16) + 1
        nflag = (n + 7) // 8
        run_flags = buf[pos : pos + nflag]
        pos += nflag
    elif cookie == _COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<I", buf, pos)
        pos += 4
    else:
        raise DeletionVectorError(f"bad roaring cookie {cookie}")
    headers = []
    for i in range(n):
        k, cm1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        headers.append((k, cm1 + 1))
    # Per RoaringFormatSpec (and the Java writer), the offset header is
    # present for SERIAL_COOKIE (run) streams whenever n >= 4, regardless
    # of whether any container is actually run-encoded.
    if cookie == _COOKIE_NO_RUN or n >= 4:
        pos += 4 * n  # offset header (recomputed sequentially below)
    values: list[int] = []
    for i, (k, card) in enumerate(headers):
        base = k << 16
        is_run = bool(run_flags and run_flags[i >> 3] & (1 << (i & 7)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + start + j for j in range(length + 1))
        elif card <= 4096:
            values.extend(base + v for v in struct.unpack_from(f"<{card}H", buf, pos))
            pos += 2 * card
        else:
            bits = buf[pos : pos + 8192]
            pos += 8192
            for byte_i, byte in enumerate(bits):
                while byte:
                    low = byte & -byte
                    values.append(base + (byte_i << 3) + low.bit_length() - 1)
                    byte ^= low
    return sorted(values), pos - off


def serialize_dv_blob(positions: list[int]) -> bytes:
    """Row positions (int64 >= 0) -> Delta DV bitmap blob (magic +
    64-bit RoaringBitmapArray portable form)."""
    by_high: dict[int, list[int]] = {}
    for p in sorted(set(positions)):
        if p < 0:
            raise DeletionVectorError("row positions must be non-negative")
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<I", DV_MAGIC))
    out += struct.pack("<q", len(by_high))
    for high in sorted(by_high):
        out += struct.pack("<I", high)
        out += _serialize_roaring32(by_high[high])
    return bytes(out)


def deserialize_dv_blob(blob: bytes) -> list[int]:
    (magic,) = struct.unpack_from("<I", blob, 0)
    if magic != DV_MAGIC:
        raise DeletionVectorError(f"bad DV magic {magic}")
    (count,) = struct.unpack_from("<q", blob, 4)
    pos = 12
    out: list[int] = []
    for _ in range(count):
        (high,) = struct.unpack_from("<I", blob, pos)
        pos += 4
        vals, used = _deserialize_roaring32(blob, pos)
        pos += used
        out.extend((high << 32) | v for v in vals)
    return out


# ---------------------------------------------------------------------------
# DV files + descriptors


def write_dv_file(path: str | Path, blobs: list[bytes]) -> list[tuple[int, int]]:
    """Write a DV file holding `blobs`; returns [(offset, size)] per
    blob — offset points at the int32-BE size field, per the protocol."""
    p = Path(path)
    out = bytearray(b"\x01")  # format version
    spans = []
    for blob in blobs:
        spans.append((len(out), len(blob)))
        out += struct.pack(">i", len(blob))
        out += blob
        out += struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF)
    p.write_bytes(bytes(out))
    return spans


def read_dv_from_file(raw: bytes, offset: int, size_in_bytes: int) -> bytes:
    if not raw or raw[0] != 1:
        raise DeletionVectorError("unsupported DV file format version")
    (size,) = struct.unpack_from(">i", raw, offset)
    if size != size_in_bytes:
        raise DeletionVectorError(
            f"DV size mismatch: descriptor says {size_in_bytes}, file says {size}"
        )
    blob = raw[offset + 4 : offset + 4 + size]
    (crc,) = struct.unpack_from(">I", raw, offset + 4 + size)
    if crc != (zlib.crc32(blob) & 0xFFFFFFFF):
        raise DeletionVectorError("DV checksum mismatch (corrupt blob)")
    return blob


def dv_file_name(uid: _uuid.UUID, prefix: str = "") -> str:
    name = f"deletion_vector_{uid}.bin"
    return f"{prefix}/{name}" if prefix else name


def encode_uuid_path(uid: _uuid.UUID, prefix: str = "") -> str:
    """storageType='u' pathOrInlineDv: optional prefix + Z85 uuid (the
    final 20 chars)."""
    return prefix + z85_encode(uid.bytes)


def encode_inline(blob: bytes) -> str:
    """storageType='i' pathOrInlineDv (zero-padded to the z85 4-byte
    boundary; sizeInBytes records the true length)."""
    pad = (-len(blob)) % 4
    return z85_encode(blob + b"\x00" * pad)


def resolve_descriptor(desc: dict, table_root: str | Path) -> tuple[bytes, int | None, int]:
    """Descriptor -> (raw source bytes, offset-or-None, sizeInBytes).
    For inline DVs the returned bytes ARE the blob (offset None)."""
    st = desc.get("storageType")
    size = int(desc.get("sizeInBytes", 0))
    if st == "i":
        # z85 is 4-byte aligned; inline blobs are zero-padded at encode
        # time and trimmed back to sizeInBytes here
        raw = z85_decode(desc["pathOrInlineDv"])
        return (raw[:size] if size else raw), None, size
    if st == "u":
        enc = desc["pathOrInlineDv"]
        prefix, uid85 = enc[:-20], enc[-20:]
        uid = _uuid.UUID(bytes=z85_decode(uid85))
        path = Path(table_root) / dv_file_name(uid, prefix)
        return path.read_bytes(), int(desc.get("offset") or 1), size
    if st == "p":
        return Path(desc["pathOrInlineDv"]).read_bytes(), int(desc.get("offset") or 1), size
    raise DeletionVectorError(f"unknown DV storageType {st!r}")


def decode_descriptor(desc: dict, table_root: str | Path) -> list[int]:
    """Descriptor -> deleted row positions (executor-safe: pure
    function of descriptor + filesystem)."""
    raw, offset, size = resolve_descriptor(desc, table_root)
    blob = raw if offset is None else read_dv_from_file(raw, offset, size)
    positions = deserialize_dv_blob(blob)
    card = int(desc.get("cardinality", len(positions)))
    if card != len(positions):
        raise DeletionVectorError(
            f"DV cardinality mismatch: descriptor says {card}, bitmap has {len(positions)}"
        )
    return positions
