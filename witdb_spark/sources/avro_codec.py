"""Minimal Apache Avro object-container-file codec (pure Python).

Implements the PUBLIC Avro 1.x specification (binary encoding + object
container files: magic ``Obj\\x01``, file-metadata map carrying
``avro.schema``/``avro.codec``, 16-byte sync marker, then data blocks)
— enough to READ real Avro files when neither spark-avro nor an avro
library is on this deployment. Two consumers:

  * sources/io.py ``read_any(fmt="avro")`` fallback: files decode on
    EXECUTORS (binaryFiles + flatMap), so the scan stays distributed —
    the driver never materializes rows.
  * sources/iceberg_meta.py: Iceberg manifest lists and manifests are
    Avro; decoding them driver-side yields the data-file list (the
    same thing every Iceberg reader materializes), after which the data
    scan is ordinary distributed parquet.

Supported: all primitive types, record/enum/array/map/union/fixed,
named-type references, the ``null`` / ``deflate`` (raw DEFLATE per the
spec) / ``bzip2`` / ``xz`` / ``snappy`` (r10: pure-Python raw-snappy
decoder + big-endian CRC32 frame) / ``zstandard`` (r10: pyarrow's
bundled zstd, decompressed size parsed from the zstd frame header —
RFC 8878 §3.1.1; loud remedy only when the frame omits
Frame_Content_Size or pyarrow lacks zstd) codecs, and the logical
types date / time[stamp]-millis/micros / decimal. Schema evolution
(separate reader schema) is out of scope — files decode with their
writer schema, which is what both consumers need. The writer covers
the same codecs (zstandard via pyarrow) for fixtures, round-trip
tests, and the avro sink.
"""

from __future__ import annotations

import datetime
import io
import json
import struct
import zlib
from decimal import Decimal

_MAGIC = b"Obj\x01"
_EPOCH_DATE = datetime.date(1970, 1, 1)
_EPOCH_NTZ = datetime.datetime(1970, 1, 1)


class AvroError(ValueError):
    pass


# ---------------------------------------------------------------- decode


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise AvroError("truncated Avro data")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def long(self) -> int:
        # zigzag varint
        shift, acc = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def eof(self) -> bool:
        return self.pos >= len(self.buf)


def _named(schema, names):
    """Resolve a string schema reference through primitives or the
    named-type registry."""
    if isinstance(schema, str):
        if schema in (
            "null", "boolean", "int", "long", "float", "double",
            "bytes", "string",
        ):
            return schema
        if schema in names:
            return names[schema]
        raise AvroError(f"unknown Avro type reference {schema!r}")
    return schema


def _register(schema, names):
    """Walk a schema once, registering named types (record/enum/fixed)
    under both full and simple names."""
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            name = schema["name"]
            ns = schema.get("namespace")
            names[name] = schema
            if ns:
                names[f"{ns}.{name}"] = schema
        if t == "record":
            for f in schema["fields"]:
                _register(f["type"], names)
        elif t == "array":
            _register(schema["items"], names)
        elif t == "map":
            _register(schema["values"], names)
    elif isinstance(schema, list):
        for s in schema:
            _register(s, names)


def _logical(schema, value):
    lt = schema.get("logicalType") if isinstance(schema, dict) else None
    if lt is None:
        return value
    if lt == "date":
        return _EPOCH_DATE + datetime.timedelta(days=value)
    if lt == "timestamp-millis":
        return _EPOCH_NTZ + datetime.timedelta(milliseconds=value)
    if lt == "timestamp-micros":
        return _EPOCH_NTZ + datetime.timedelta(microseconds=value)
    if lt == "time-millis":
        return (_EPOCH_NTZ + datetime.timedelta(milliseconds=value)).time()
    if lt == "time-micros":
        return (_EPOCH_NTZ + datetime.timedelta(microseconds=value)).time()
    if lt == "decimal":
        scale = schema.get("scale", 0)
        unscaled = int.from_bytes(value, "big", signed=True)
        return Decimal(unscaled).scaleb(-scale)
    return value


def _decode(schema, r: _Reader, names):
    schema = _named(schema, names)
    if isinstance(schema, list):  # union: long index, then value
        idx = r.long()
        if not 0 <= idx < len(schema):
            raise AvroError(f"union index {idx} out of range")
        return _decode(schema[idx], r, names)
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):  # {"type": {...nested...}}
            return _decode(t, r, names)
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return _logical(schema, r.long()) if isinstance(schema, dict) else r.long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        v = r.read(r.long())
        return _logical(schema, v) if isinstance(schema, dict) else v
    if t == "string":
        return r.read(r.long()).decode("utf-8")
    if t == "record":
        return {
            f["name"]: _decode(f["type"], r, names)
            for f in schema["fields"]
        }
    if t == "enum":
        return schema["symbols"][r.long()]
    if t == "fixed":
        v = r.read(schema["size"])
        return _logical(schema, v)
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.long()  # block byte size, unused
            for _ in range(n):
                out.append(_decode(schema["items"], r, names))
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                k = r.read(r.long()).decode("utf-8")
                out[k] = _decode(schema["values"], r, names)
    raise AvroError(f"unsupported Avro type {t!r}")


def snappy_decompress(data: bytes) -> bytes:
    """Raw (non-framed) snappy decompression, pure Python — the format
    avro containers, hudi log blocks, and iceberg manifests use
    (google/snappy format_description.txt, public): a little-endian
    varint uncompressed length, then literal / copy elements. Copies
    may overlap forward (run-length semantics), handled byte-wise."""
    n = shift = pos = 0
    while True:
        if pos >= len(data):
            raise AvroError("snappy: truncated length preamble")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        shift += 7
        if not (b & 0x80):
            break
    out = bytearray()
    ln = len(data)
    while pos < ln:
        tag = data[pos]
        pos += 1
        ttype = tag & 3
        if ttype == 0:  # literal
            sz = tag >> 2
            if sz >= 60:
                nb = sz - 59
                sz = int.from_bytes(data[pos:pos + nb], "little")
                pos += nb
            sz += 1
            if pos + sz > ln:
                raise AvroError("snappy: truncated literal")
            out += data[pos:pos + sz]
            pos += sz
            continue
        if ttype == 1:  # copy, 1-byte offset
            sz = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif ttype == 2:  # copy, 2-byte offset
            sz = (tag >> 2) + 1
            off = int.from_bytes(data[pos:pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            sz = (tag >> 2) + 1
            off = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise AvroError("snappy: copy offset out of range")
        start = len(out) - off
        if off >= sz:
            out += out[start:start + sz]
        else:
            for i in range(sz):  # overlapping: byte-wise semantics
                out.append(out[start + i])
    if len(out) != n:
        raise AvroError(
            f"snappy: declared {n} bytes, produced {len(out)}"
        )
    return bytes(out)


def snappy_compress(data: bytes) -> bytes:
    """Minimal spec-valid snappy compressor (literal elements only —
    every decoder must accept it; used for fixtures and the writer's
    symmetry tests, not for ratio)."""
    out = bytearray()
    n = len(data)
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            break
    i = 0
    while i < len(data):
        chunk = data[i:i + 65536]
        sz = len(chunk) - 1
        if sz < 60:
            out.append(sz << 2)
        else:
            out.append(61 << 2)  # 2-byte little-endian length
            out += sz.to_bytes(2, "little")
        out += chunk
        i += len(chunk)
    return bytes(out)


def _zstd_frame_content_size(frame: bytes) -> int:
    """Parse Frame_Content_Size from a zstd frame header (RFC 8878
    §3.1.1). Every writer that knows its input size (avro's zstd-jni,
    pyarrow, the zstd CLI on regular files) emits it; streaming-mode
    frames omit it and get the loud remedy."""
    if len(frame) < 6 or frame[:4] != b"\x28\xb5\x2f\xfd":
        raise AvroError("zstandard: not a zstd frame (bad magic)")
    fhd = frame[4]
    fcs_flag = fhd >> 6
    single_segment = bool(fhd & 0x20)
    did_flag = fhd & 0x03
    pos = 5
    if not single_segment:
        pos += 1  # Window_Descriptor
    pos += (0, 1, 2, 4)[did_flag]  # Dictionary_ID
    if fcs_flag == 0:
        if not single_segment:
            raise AvroError(
                "zstandard: frame omits Frame_Content_Size (streaming-"
                "mode writer) — re-encode with a size-aware zstd or use"
                " the spark-avro module"
            )
        return frame[pos]
    nbytes = (0, 2, 4, 8)[fcs_flag]
    val = int.from_bytes(frame[pos:pos + nbytes], "little")
    return val + 256 if fcs_flag == 1 else val


def _zstd_codec():
    try:
        import pyarrow as pa

        return pa.Codec("zstd")
    except Exception as exc:  # pragma: no cover - pyarrow is baked in
        raise AvroError(
            "zstandard codec needs pyarrow with zstd support"
            f" ({exc}); install pyarrow or use the spark-avro module"
        ) from exc


def zstd_decompress(frame: bytes) -> bytes:
    size = _zstd_frame_content_size(frame)
    return bytes(_zstd_codec().decompress(frame, size))


def zstd_compress(data: bytes) -> bytes:
    return bytes(_zstd_codec().compress(data))


_CODECS = ("null", "deflate", "bzip2", "xz", "snappy", "zstandard")


def read_container(data: bytes) -> tuple[dict | list | str, list]:
    """Decode a whole Avro object container file -> (writer schema,
    records). Records are dicts for record schemas."""
    r = _Reader(data)
    if r.read(4) != _MAGIC:
        raise AvroError("not an Avro object container file (bad magic)")
    meta = _decode({"type": "map", "values": "bytes"}, r, {})
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in _CODECS:
        raise AvroError(
            f"unsupported Avro codec {codec!r}"
            f" (supported jar-free: {'/'.join(_CODECS)})"
        )
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    names: dict = {}
    _register(schema, names)
    sync = r.read(16)
    records = []
    while not r.eof():
        count = r.long()
        size = r.long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw DEFLATE per spec
        elif codec == "bzip2":
            import bz2

            block = bz2.decompress(block)
        elif codec == "xz":
            import lzma

            block = lzma.decompress(block)
        elif codec == "snappy":
            # avro spec: snappy blocks append a 4-byte BIG-endian
            # CRC32 of the UNCOMPRESSED data
            comp, crc = block[:-4], block[-4:]
            block = snappy_decompress(comp)
            if (zlib.crc32(block) & 0xFFFFFFFF) != int.from_bytes(
                crc, "big"
            ):
                raise AvroError("snappy: block CRC32 mismatch")
        elif codec == "zstandard":
            block = zstd_decompress(block)
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode(schema, br, names))
        if r.read(16) != sync:
            raise AvroError("sync marker mismatch")
    return schema, records


def read_avro_file(path: str) -> tuple[dict | list | str, list]:
    with open(path, "rb") as f:
        return read_container(f.read())


# ---------------------------------------------------------------- encode
# Round-trip writer (all read-side codecs) — the read path above is
# the product surface.


def _zigzag(n: int) -> bytes:
    acc = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(schema, value, names, out: bytearray):
    schema = _named(schema, names)
    if isinstance(schema, list):
        for i, branch in enumerate(schema):
            b = _named(branch, names)
            bt = b if isinstance(b, str) else b["type"]
            if value is None and bt == "null":
                out += _zigzag(i)
                return
            if value is not None and bt != "null":
                out += _zigzag(i)
                _encode(branch, value, names, out)
                return
        raise AvroError("no matching union branch")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out += b"\x01" if value else b"\x00"
    elif t in ("int", "long"):
        # decoded logical types round-trip: date -> epoch days,
        # datetime -> epoch micros/millis per the schema's logicalType
        # (re-emitting decoded records through the writer is a core
        # path — iceberg kept-manifest entries carry datetime.date)
        if isinstance(value, datetime.datetime):
            lt = (
                schema.get("logicalType")
                if isinstance(schema, dict)
                else None
            )
            epoch = datetime.datetime(
                1970, 1, 1, tzinfo=value.tzinfo
            )
            # integer (days, seconds, microseconds) arithmetic is
            # exact at any timestamp; float total_seconds() drifts a
            # microsecond at extreme dates
            delta = value - epoch
            micros = (
                delta.days * 86_400_000_000
                + delta.seconds * 1_000_000
                + delta.microseconds
            )
            value = (
                micros // 1_000 if lt == "timestamp-millis" else micros
            )
        elif isinstance(value, datetime.date):
            value = (value - datetime.date(1970, 1, 1)).days
        out += _zigzag(int(value))
    elif t == "float":
        out += struct.pack("<f", value)
    elif t == "double":
        out += struct.pack("<d", value)
    elif t == "bytes":
        if isinstance(value, Decimal):
            # logical decimal: big-endian two's-complement unscaled int
            # at the schema's scale (the exact inverse of _logical)
            scale = (
                schema.get("scale", 0) if isinstance(schema, dict) else 0
            )
            unscaled = int(value.scaleb(scale))
            blen = max(1, (unscaled.bit_length() + 8) // 8)
            value = unscaled.to_bytes(blen, "big", signed=True)
        out += _zigzag(len(value)) + bytes(value)
    elif t == "string":
        enc = value.encode("utf-8")
        out += _zigzag(len(enc)) + enc
    elif t == "record":
        for f in schema["fields"]:
            ft = f["type"]
            if (
                f["name"] not in value
                and isinstance(ft, list)
                and "null" in ft
            ):
                # nullable field absent from the dict -> null branch
                # (lets schemas grow optional fields without every
                # producer of older records re-materializing them)
                _encode(ft, None, names, out)
            else:
                _encode(ft, value[f["name"]], names, out)
    elif t == "enum":
        out += _zigzag(schema["symbols"].index(value))
    elif t == "fixed":
        if len(value) != schema["size"]:
            raise AvroError("fixed size mismatch")
        out += bytes(value)
    elif t == "array":
        if value:
            out += _zigzag(len(value))
            for v in value:
                _encode(schema["items"], v, names, out)
        out += _zigzag(0)
    elif t == "map":
        if value:
            out += _zigzag(len(value))
            for k, v in value.items():
                enc = k.encode("utf-8")
                out += _zigzag(len(enc)) + enc
                _encode(schema["values"], v, names, out)
        out += _zigzag(0)
    else:
        raise AvroError(f"unsupported Avro type {t!r}")


def _compress_block(codec: str, block: bytes) -> bytes:
    if codec == "null":
        return block
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)  # raw DEFLATE per spec
        return co.compress(block) + co.flush()
    if codec == "bzip2":
        import bz2

        return bz2.compress(block)
    if codec == "xz":
        import lzma

        return lzma.compress(block)
    if codec == "snappy":
        crc = (zlib.crc32(block) & 0xFFFFFFFF).to_bytes(4, "big")
        return snappy_compress(block) + crc
    if codec == "zstandard":
        return zstd_compress(block)
    raise AvroError(
        f"unsupported Avro codec {codec!r}"
        f" (supported jar-free: {'/'.join(_CODECS)})"
    )


def write_container(
    schema,
    records,
    sync: bytes = b"witdbsparkavro01",
    codec: str = "null",
) -> bytes:
    names: dict = {}
    _register(schema, names)
    out = bytearray(_MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    _encode({"type": "map", "values": "bytes"}, meta, {}, out)
    out += sync
    if records:
        block = bytearray()
        for rec in records:
            _encode(schema, rec, names, block)
        comp = _compress_block(codec, bytes(block))
        out += _zigzag(len(records)) + _zigzag(len(comp)) + comp + sync
    return bytes(out)


def write_avro_file(path: str, schema, records, codec: str = "null") -> None:
    with open(path, "wb") as f:
        f.write(write_container(schema, records, codec=codec))
