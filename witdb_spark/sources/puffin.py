"""Jar-free Puffin statistics files + theta sketches (r14).

The reference's iceberg ANALYZE (trino-iceberg TableStatisticsWriter)
collects per-column NDV as Apache DataSketches theta sketches and
persists them in a Puffin file registered under the table metadata's
``statistics`` list; SHOW STATS then serves NDV from each blob's
``ndv`` property (TableStatisticsReader reads the property, not the
sketch bytes). Both formats are PUBLIC specs:

Puffin (iceberg spec/puffin-spec.md):
  "PFA1" | blob bytes... | footer
  footer = "PFA1" | payload JSON (uncompressed here; flag bit 0 clear)
           | payload length (int32 LE) | 4 flag bytes | "PFA1"
  payload = {"blobs": [{type, fields, snapshot-id, sequence-number,
             offset, length, properties}], "properties": {...}}

Theta sketch, compact ordered form (datasketches memory layout):
  byte0 preLongs (1 empty / 2 exact / 3 estimation)
  byte1 serVer=3 | byte2 familyID=3 (COMPACT) | byte3-4 unused
  byte5 flags (bit1 READ_ONLY, bit2 EMPTY, bit3 COMPACT, bit4 ORDERED)
  bytes6-7 seed hash (LE; seed hash of DEFAULT_UPDATE_SEED=9001)
  [long1: curCount int32 LE + 4 unused]           (preLongs >= 2)
  [long2: thetaLong int64 LE]                     (preLongs == 3)
  retained hash longs, ascending, each < thetaLong

Entry hashes are murmur3_x64_128(value-bytes, seed=9001)[0] >>> 1 —
the datasketches update() rule. Values hash by their UTF-8 string
rendering (documented divergence from java's typed update(long/double)
overloads: estimates are equally valid, but sketches built here
union correctly only with sketches hashed the same way; the
reference's OWN reader consumes the ndv property, which is exact
w.r.t. this sketch).
"""

from __future__ import annotations

import json
import struct


class PuffinError(ValueError):
    pass


MAGIC = b"PFA1"
THETA_BLOB_TYPE = "apache-datasketches-theta-v1"
DEFAULT_SEED = 9001
NOMINAL_K = 4096
_MAX_THETA = (1 << 63) - 1


# ------------------------------------------------------- murmur3_x64_128
# Public MurmurHash3 (Austin Appleby, public domain), 128-bit x64
# variant — the hash datasketches theta sketches are defined over.

_M = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    h1 = h2 = seed & _M
    n = len(data)
    blocks = n // 16
    for i in range(blocks):
        k1, k2 = struct.unpack_from("<qq", data, i * 16)
        k1 &= _M
        k2 &= _M
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M
        h1 = (h1 * 5 + 0x52DCE729) & _M
        k2 = (k2 * _C2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M
        h2 = (h2 * 5 + 0x38495AB5) & _M
    tail = data[blocks * 16 :]
    k1 = k2 = 0
    t = len(tail)
    for i in range(min(t, 8) - 1, -1, -1):
        k1 = (k1 << 8) | tail[i]
    for i in range(t - 1, 7, -1):
        k2 = (k2 << 8) | tail[i]
    if t > 8:
        k2 = (k2 * _C2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M
        h2 ^= k2
    if t > 0:
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    return h1, h2


def theta_hash(value_bytes: bytes) -> int:
    """datasketches entry hash: murmur3_x64_128 under the default
    update seed, high bit cleared (>>> 1). Hash 0 is reserved."""
    return murmur3_x64_128(value_bytes, DEFAULT_SEED)[0] >> 1


def _seed_hash(seed: int = DEFAULT_SEED) -> int:
    """ThetaUtil.computeSeedHash: low 16 bits of the murmur hash of
    the seed long itself (seed 0 for this meta-hash); 0 forbidden."""
    h = murmur3_x64_128(struct.pack("<q", seed), 0)[0] & 0xFFFF
    if h == 0:
        raise PuffinError("seed hashes to the reserved value 0")
    return h


# ----------------------------------------------------------- theta build


def build_theta_sketch(
    sorted_hashes: list[int], k: int = NOMINAL_K
) -> tuple[bytes, float]:
    """Compact ordered theta sketch bytes + its NDV estimate from the
    (ascending, deduplicated) entry hashes. Caller supplies AT MOST
    k+1 smallest hashes — the (k+1)-th, when present, becomes theta
    (the KMV boundary) and the estimate extrapolates; fewer than k+1
    means exact mode (estimate = retained count)."""
    sh = _seed_hash()
    if not sorted_hashes:
        flags = 0b00011110  # READ_ONLY|EMPTY|COMPACT|ORDERED
        return (
            struct.pack("<BBBBBBH", 1, 3, 3, 0, 0, flags, sh),
            0.0,
        )
    flags = 0b00011010  # READ_ONLY|COMPACT|ORDERED
    if len(sorted_hashes) <= k:
        retained = sorted_hashes
        pre = struct.pack("<BBBBBBH", 2, 3, 3, 0, 0, flags, sh)
        pre += struct.pack("<iI", len(retained), 0)
        est = float(len(retained))
    else:
        theta = sorted_hashes[k]
        retained = sorted_hashes[:k]
        pre = struct.pack("<BBBBBBH", 3, 3, 3, 0, 0, flags, sh)
        pre += struct.pack("<iI", len(retained), 0)
        pre += struct.pack("<q", theta)
        est = len(retained) / (theta / float(_MAX_THETA + 1))
    return pre + b"".join(struct.pack("<q", h) for h in retained), est


def read_theta_sketch(buf: bytes) -> tuple[list[int], int]:
    """-> (retained hashes, thetaLong). Conformance reader for tests
    and sketch merges."""
    pre_longs, ser_ver, family = buf[0], buf[1], buf[2]
    if ser_ver != 3 or family != 3:
        raise PuffinError(
            f"not a compact theta sketch (serVer={ser_ver},"
            f" family={family})"
        )
    flags = buf[5]
    if flags & 0b100:  # EMPTY
        return [], _MAX_THETA + 1
    (count,) = struct.unpack_from("<i", buf, 8)
    theta = _MAX_THETA + 1
    off = 16
    if pre_longs == 3:
        (theta,) = struct.unpack_from("<q", buf, 16)
        off = 24
    hashes = list(
        struct.unpack_from(f"<{count}q", buf, off)
    )
    return hashes, theta


# ----------------------------------------------------------- puffin file


def write_puffin(path: str, blobs: list[dict], properties: dict | None = None) -> dict:
    """``blobs``: [{"type", "fields", "snapshot-id", "sequence-number",
    "data": bytes, "properties": {...}}]. Returns the statistics-entry
    shape iceberg metadata wants (file sizes + blob metadata with
    offsets)."""
    body = bytearray(MAGIC)
    metas = []
    for b in blobs:
        data = b["data"]
        metas.append(
            {
                "type": b["type"],
                "fields": list(b["fields"]),
                "snapshot-id": b["snapshot-id"],
                "sequence-number": b["sequence-number"],
                "offset": len(body),
                "length": len(data),
                "properties": dict(b.get("properties") or {}),
            }
        )
        body += data
    payload = json.dumps(
        {
            "blobs": metas,
            "properties": dict(properties or {"created-by": "witdb-spark"}),
        }
    ).encode()
    footer = (
        MAGIC
        + payload
        + struct.pack("<i", len(payload))
        + b"\x00\x00\x00\x00"
        + MAGIC
    )
    with open(path, "wb") as f:
        f.write(bytes(body) + footer)
    return {
        "file_size": len(body) + len(footer),
        "footer_size": len(footer),
        "blob_metadata": metas,
    }


def read_puffin(path: str) -> tuple[list[dict], dict, bytes]:
    """-> (blob metadata list, file properties, raw file bytes)."""
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:4] != MAGIC or buf[-4:] != MAGIC:
        raise PuffinError(f"{path}: not a Puffin file (magic)")
    flags = buf[-8:-4]
    if flags[0] & 1:
        raise PuffinError(
            f"{path}: LZ4-compressed Puffin footer — decoder carries"
            " no lz4"
        )
    (plen,) = struct.unpack_from("<i", buf, len(buf) - 12)
    payload = buf[len(buf) - 12 - plen : len(buf) - 12]
    doc = json.loads(payload)
    return doc.get("blobs") or [], doc.get("properties") or {}, buf


def read_puffin_blob(path: str, meta: dict) -> bytes:
    _, _, buf = read_puffin(path)
    off, ln = meta["offset"], meta["length"]
    return buf[off : off + ln]
