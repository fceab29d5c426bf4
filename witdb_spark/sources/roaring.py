"""Pure-Python Roaring bitmap + Z85 codecs for Delta deletion vectors.

Public-spec implementations, no library dependency:

- 32-bit Roaring bitmap **portable serialization**
  (github.com/RoaringBitmap/RoaringFormatSpec): cookie 12346
  (no run containers) / 12347 (with runs, container count packed in
  the cookie's upper 16 bits), little-endian descriptive headers of
  (key, cardinality-1), optional offset table, then array
  (<= 4096 sorted uint16), bitmap (8 KiB fixed), or run
  (count + (start, length-1) pairs) containers.
- Delta's **RoaringBitmapArray portable format** (delta-io PROTOCOL.md
  "Deletion Vector Format"; delta-spark RoaringBitmapArray): int32 LE
  magic 1681511377, int64 LE bitmap count, then one standard portable
  32-bit bitmap per 2^32 range — bitmap i holds values
  [i * 2^32, (i+1) * 2^32).
- **Z85** (ZeroMQ base-85, the variant Delta's protocol names for
  inline DVs and the 'u' storage path's encoded UUID): 4 bytes ->
  5 chars over the fixed 85-char alphabet, big-endian groups.

The encoder exists for fixtures and this repo's own DV writer; the
decoder is the read path for library-written tables. Reference analog:
plugin/trino-delta-lake/.../DeletionVectors (reads the same formats).
"""

from __future__ import annotations

import struct

ROARING_ARRAY_MAGIC = 1681511377  # delta-spark portable magic
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4  # spec: offsets written when >= 4 containers

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


class RoaringError(ValueError):
    pass


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise RoaringError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        (v,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_ALPHABET[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise RoaringError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            if c not in _Z85_INDEX:
                raise RoaringError(f"invalid z85 character {c!r}")
            v = v * 85 + _Z85_INDEX[c]
        if v > 0xFFFFFFFF:
            raise RoaringError("z85 group overflows 32 bits")
        out += struct.pack(">I", v)
    return bytes(out)


def _decode_bitmap32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """One standard portable 32-bit roaring bitmap at buf[pos:] ->
    (sorted values, new position)."""
    (cookie,) = struct.unpack_from("<i", buf, pos)
    low = cookie & 0xFFFF
    if low == _SERIAL_COOKIE:
        n = ((cookie >> 16) & 0xFFFF) + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_flags = buf[pos : pos + nbytes]
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif low == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        run_flags = b"\x00" * ((n + 7) // 8)
        has_offsets = True
    else:
        raise RoaringError(f"bad roaring cookie {cookie}")
    headers = []
    for i in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        headers.append((key, card_m1 + 1))
        pos += 4
    if has_offsets:
        pos += 4 * n  # offsets are redundant for sequential decode
    values: list[int] = []
    for i, (key, card) in enumerate(headers):
        base = key << 16
        is_run = bool(run_flags[i // 8] & (1 << (i % 8)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(
                    base + v for v in range(start, start + length_m1 + 1)
                )
        elif card > 4096:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            got = 0
            for wi, w in enumerate(words):
                while w:
                    b = (w & -w).bit_length() - 1
                    values.append(base + (wi << 6) + b)
                    w &= w - 1
                    got += 1
            if got != card:
                raise RoaringError(
                    f"bitmap container cardinality mismatch:"
                    f" header {card}, bits {got}"
                )
        else:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
    return values, pos


def _encode_bitmap32(values: list[int]) -> bytes:
    """Standard portable serialization (cookie 12346, no run
    containers, offsets always present) of sorted 32-bit values."""
    by_key: dict[int, list[int]] = {}
    for v in values:
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    n = len(keys)
    out = bytearray(struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, n))
    containers = []
    for k in keys:
        vals = sorted(set(by_key[k]))
        if len(vals) > 4096:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            containers.append((k, len(vals), struct.pack("<1024Q", *words)))
        else:
            containers.append(
                (k, len(vals), struct.pack(f"<{len(vals)}H", *vals))
            )
    for k, card, _ in containers:
        out += struct.pack("<HH", k, card - 1)
    offset = len(out) + 4 * n
    for _, _, blob in containers:
        out += struct.pack("<i", offset)
        offset += len(blob)
    for _, _, blob in containers:
        out += blob
    return bytes(out)


def decode_roaring_array(buf: bytes) -> list[int]:
    """Delta RoaringBitmapArray portable bytes -> sorted 64-bit values."""
    if len(buf) < 12:
        raise RoaringError("truncated RoaringBitmapArray")
    (magic,) = struct.unpack_from("<i", buf, 0)
    if magic != ROARING_ARRAY_MAGIC:
        raise RoaringError(
            f"unsupported RoaringBitmapArray magic {magic} (expected the"
            f" portable format {ROARING_ARRAY_MAGIC})"
        )
    (count,) = struct.unpack_from("<q", buf, 4)
    pos = 12
    out: list[int] = []
    for hi in range(count):
        vals, pos = _decode_bitmap32(buf, pos)
        base = hi << 32
        out.extend(base + v for v in vals)
    return out


def encode_roaring_array(values: list[int]) -> bytes:
    """Sorted 64-bit values -> Delta portable RoaringBitmapArray."""
    by_hi: dict[int, list[int]] = {}
    for v in sorted(set(values)):
        if v < 0:
            raise RoaringError("negative value in bitmap")
        by_hi.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    count = (max(by_hi) + 1) if by_hi else 0
    out = bytearray(struct.pack("<iq", ROARING_ARRAY_MAGIC, count))
    for hi in range(count):
        out += _encode_bitmap32(by_hi.get(hi, []))
    return bytes(out)
