"""Hudi log-file (HoodieLogFormat v1) reader — the MERGE_ON_READ half.

Validated byte-for-byte against a REAL hudi-library log file (the
reference repo ships one in plugin/trino-hudi test resources,
stock_ticks_mor): a log file is a sequence of blocks

    [MAGIC  6 bytes  "#HUDI#"]
    [block length        int64  BE]   (bytes remaining after this field)
    [log format version  int32  BE]   (1)
    [block type ordinal  int32  BE]   (HoodieLogBlockType:
                                       0 COMMAND, 1 DELETE, 2 CORRUPT,
                                       3 AVRO_DATA, 4 HFILE_DATA,
                                       5 PARQUET_DATA, 6 CDC_DATA)
    [header map: int32 count, then per entry
        int32 HeaderMetadataType ordinal (0 INSTANT_TIME,
              1 TARGET_INSTANT_TIME, 2 SCHEMA, 3 COMMAND_BLOCK_TYPE, ...),
        int32 byte length, utf-8 bytes]
    [content length      int64  BE]
    [content bytes]
    [footer map          same shape as header]
    [total block length  int64  BE]

AVRO_DATA content: int32 format version (1), int32 record count, then
per record int32 length + one binary-encoded Avro datum of the
header's SCHEMA (decoded with sources/avro_codec's raw decoder — no
container framing). COMMAND blocks are rollback markers: a command
block targeting instant T invalidates earlier blocks of T in the same
log. DELETE / HFILE / PARQUET / CDC blocks raise loudly (their
payloads are library-serialization-specific).
"""

from __future__ import annotations

import json
import struct

from witdb_spark.sources.avro_codec import _decode, _Reader, _register

MAGIC = b"#HUDI#"

BLOCK_COMMAND = 0
BLOCK_DELETE = 1
BLOCK_CORRUPT = 2
BLOCK_AVRO_DATA = 3

HEADER_INSTANT_TIME = 0
HEADER_TARGET_INSTANT_TIME = 1
HEADER_SCHEMA = 2
HEADER_COMMAND_BLOCK_TYPE = 3


class HudiLogError(ValueError):
    pass


def _read_meta_map(buf: bytes, pos: int) -> tuple[dict[int, str], int]:
    (count,) = struct.unpack_from(">i", buf, pos)
    pos += 4
    out: dict[int, str] = {}
    for _ in range(count):
        ordinal, slen = struct.unpack_from(">ii", buf, pos)
        pos += 8
        out[ordinal] = buf[pos : pos + slen].decode("utf-8")
        pos += slen
    return out, pos


def read_log_blocks(path: str) -> list[dict]:
    """Parse one log file into
    [{'type': int, 'headers': {ordinal: str}, 'content': bytes}]."""
    with open(path, "rb") as f:
        buf = f.read()
    pos = 0
    blocks: list[dict] = []
    while pos < len(buf):
        if buf[pos : pos + 6] != MAGIC:
            raise HudiLogError(
                f"{path}: bad log block magic at offset {pos}"
            )
        pos += 6
        (blen,) = struct.unpack_from(">q", buf, pos)
        pos += 8
        end = pos + blen
        (ver,) = struct.unpack_from(">i", buf, pos)
        if ver != 1:
            raise HudiLogError(
                f"{path}: unsupported log format version {ver}"
            )
        (btype,) = struct.unpack_from(">i", buf, pos + 4)
        headers, p = _read_meta_map(buf, pos + 8)
        (clen,) = struct.unpack_from(">q", buf, p)
        p += 8
        content = buf[p : p + clen]
        p += clen
        _footer, p = _read_meta_map(buf, p)
        p += 8  # trailing total-block-length
        if p != end:
            raise HudiLogError(
                f"{path}: log block framing mismatch ({p} != {end})"
            )
        blocks.append(
            {"type": btype, "headers": headers, "content": content}
        )
        pos = end
    return blocks


def decode_avro_block(content: bytes, schema_json: str) -> list[dict]:
    """AVRO_DATA block content -> list of record dicts."""
    (ver, count) = struct.unpack_from(">ii", content, 0)
    if ver != 1:
        raise HudiLogError(f"unsupported avro data block version {ver}")
    schema = json.loads(schema_json)
    names: dict = {}
    _register(schema, names)
    pos = 8
    out: list[dict] = []
    for _ in range(count):
        (rlen,) = struct.unpack_from(">i", content, pos)
        pos += 4
        r = _Reader(content[pos : pos + rlen])
        out.append(_decode(schema, r, names))
        pos += rlen
    if len(out) != count:
        raise HudiLogError("avro data block record count mismatch")
    return out


def encode_avro_block_content(records: list[dict], schema) -> bytes:
    """Records -> AVRO_DATA block content (int32 version 1, int32
    count, per record int32 length + binary Avro datum)."""
    from witdb_spark.sources.avro_codec import _encode, _register

    names: dict = {}
    _register(schema, names)
    out = bytearray(struct.pack(">ii", 1, len(records)))
    for rec in records:
        datum = bytearray()
        _encode(schema, rec, names, datum)
        out += struct.pack(">i", len(datum))
        out += datum
    return bytes(out)


def append_log_block(
    path: str,
    btype: int,
    headers: dict[int, str],
    content: bytes,
) -> None:
    """Append one framed block to a log file (creating it if absent),
    in the exact layout read_log_blocks parses."""
    body = bytearray()
    body += struct.pack(">ii", 1, btype)
    body += struct.pack(">i", len(headers))
    for ordinal, val in headers.items():
        vb = val.encode("utf-8")
        body += struct.pack(">ii", ordinal, len(vb))
        body += vb
    body += struct.pack(">q", len(content))
    body += content
    body += struct.pack(">i", 0)  # empty footer
    # trailing "total block length" = magic + length field + body so
    # far (matches the real library file: 22206-byte body-with-trailer
    # carries 22212 = 6 + 8 + 22198) — used for reverse traversal
    body += struct.pack(">q", 6 + 8 + len(body))
    with open(path, "ab") as f:
        f.write(MAGIC)
        f.write(struct.pack(">q", len(body)))
        f.write(bytes(body))


def log_entries(path: str) -> list[tuple[dict, str | None, bool]]:
    """All (record, block INSTANT_TIME, is_tombstone) entries of a log
    file, honoring COMMAND rollbacks: a command block targeting instant
    T drops earlier blocks whose INSTANT_TIME is T (the library's
    rollback mechanism). DELETE blocks (r11) decode when they carry a
    SCHEMA header — the shape this module's own MOR delete writer
    emits (tombstone records of the hoodie key fields; hudi's
    HoodieDeleteRecord analog: recordKey/partitionPath) — and the
    records return with is_tombstone=True; header-less DELETE payloads
    (the library's kryo/avro-list serializations) raise loudly.
    HFILE/PARQUET/CDC blocks raise."""
    kept: list[dict] = []
    for b in read_log_blocks(path):
        t = b["type"]
        if t == BLOCK_AVRO_DATA:
            kept.append(b)
        elif t == BLOCK_DELETE:
            if not b["headers"].get(HEADER_SCHEMA):
                raise HudiLogError(
                    f"{path}: DELETE log block without a SCHEMA header"
                    " (library kryo/avro-list payload) needs the"
                    " hudi-spark bundle"
                )
            kept.append(b)
        elif t == BLOCK_COMMAND:
            target = b["headers"].get(HEADER_TARGET_INSTANT_TIME)
            kept = [
                kb
                for kb in kept
                if kb["headers"].get(HEADER_INSTANT_TIME) != target
            ]
        elif t == BLOCK_CORRUPT:
            continue
        else:
            raise HudiLogError(
                f"{path}: log block type {t} (hfile/parquet/cdc)"
                " needs the hudi-spark bundle"
            )
    out: list = []
    for b in kept:
        schema_json = b["headers"].get(HEADER_SCHEMA)
        if not schema_json:
            raise HudiLogError(f"{path}: data block without SCHEMA header")
        recs = decode_avro_block(b["content"], schema_json)
        instant = b["headers"].get(HEADER_INSTANT_TIME)
        out.extend(
            (r, instant, b["type"] == BLOCK_DELETE) for r in recs
        )
    return out


def log_records(path: str, with_instants: bool = False) -> list:
    """Data records only (no tombstones) of a log file — the r9 shape
    kept for callers that predate DELETE-block support; a log carrying
    tombstones must be read through log_entries. ``with_instants``
    yields (record, block INSTANT_TIME) pairs — virtual-key tables
    (hoodie.populate.meta.fields=false) carry no _hoodie_commit_time
    column, so the block header is the record's commit time."""
    out: list = []
    for rec, instant, is_del in log_entries(path):
        if is_del:
            raise HudiLogError(
                f"{path}: log carries DELETE tombstones — read it via"
                " log_entries"
            )
        out.append((rec, instant) if with_instants else rec)
    return out
