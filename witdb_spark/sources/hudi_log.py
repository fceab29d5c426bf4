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
log. DELETE blocks decode both this module's SCHEMA-headered shape and
the library's avro-list serialization (r12, decode_delete_block);
PARQUET_DATA blocks decode via pyarrow (r12, decode_parquet_block —
the content IS a parquet file). Kryo DELETE payloads (serialization
v1/v2) decode jar-free since r13 (_kryo_delete_payload — strict,
unknown kryo graphs stay loud). CDC_DATA blocks (RFC-51) are served
via log_cdc_entries since r13 (snapshot reads skip them, as hudi's own
reader does). HFILE blocks decode jar-free since r14
(decode_hfile_block over sources/hfile.py's public-spec HBase HFile
v2/v3 reader) — every hudi log block type is now served.
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
BLOCK_HFILE_DATA = 4
BLOCK_PARQUET_DATA = 5
BLOCK_CDC_DATA = 6

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


def _delete_record_list_schema(wrappers: bool) -> dict:
    """The library's HoodieDeleteRecordList avro schema
    (hudi-common/src/main/avro/HoodieDeleteRecordList.avsc, public) —
    an array of HoodieDeleteRecord{recordKey, partitionPath,
    orderingVal}. Two published shapes of the orderingVal union exist
    across hudi versions: bare primitives, and single-field wrapper
    records (HoodieIntWrapper etc.); the decoder tries both under a
    consume-exactly check."""
    if wrappers:
        ordering = ["null"] + [
            {
                "type": "record",
                "name": f"Hoodie{n}Wrapper",
                "namespace": "org.apache.hudi.avro.model",
                "fields": [{"name": "value", "type": t}],
            }
            for n, t in (
                ("Boolean", "boolean"), ("Int", "int"),
                ("Long", "long"), ("Float", "float"),
                ("Double", "double"), ("Bytes", "bytes"),
                ("String", "string"),
                ("Decimal", "bytes"),
                ("Date", {"type": "int", "logicalType": "date"}),
                (
                    "TimestampMicros",
                    {"type": "long",
                     "logicalType": "timestamp-micros"},
                ),
            )
        ]
    else:
        ordering = [
            "null", "boolean", "int", "long", "float", "double",
            "bytes", "string",
        ]
    return {
        "namespace": "org.apache.hudi.avro.model",
        "type": "record",
        "name": "HoodieDeleteRecordList",
        "fields": [
            {
                "name": "deleteRecordList",
                "type": {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "HoodieDeleteRecord",
                        "fields": [
                            {
                                "name": "recordKey",
                                "type": ["null", "string"],
                                "default": None,
                            },
                            {
                                "name": "partitionPath",
                                "type": ["null", "string"],
                                "default": None,
                            },
                            {
                                "name": "orderingVal",
                                "type": ordering,
                                "default": None,
                            },
                        ],
                    },
                },
            }
        ],
    }


# ---------------------------------------------------------------
# Kryo decode for DELETE block serialization v1/v2 (r13).
#
# hudi-common's HoodieDeleteBlock versions 1 and 2 serialize
# HoodieKey[] / DeleteRecord[] via SerializationUtils — a default
# com.esotericsoftware Kryo 4 (kryo-shaded 4.0.2 across the hudi 0.x
# releases that wrote these versions) with registrationRequired=false
# and the default constructor's MapReferenceResolver (references ON).
# That pins a stable public wire shape (Kryo 4 Output/DefaultClass-
# Resolver/FieldSerializer, all documented formats):
#   writeClassAndObject = class tag + reference marker + body
#   class tag: varint 0 = null class; 1 = by-name (varint nameId,
#     first occurrence followed by the class-name string); else
#     registered id + 2 (the Kryo() constructor registers
#     int,String,float,boolean,byte,char,short,long,double as 0..8;
#     hudi registers avro Utf8 next, id 9)
#   reference marker (skipped for primitive wrappers): varint 0 =
#     null, 1 = new object (next sequential reference id), >= 2 =
#     back-reference to object id (marker - 2)
#   object arrays (non-final element class): varint (length + 1),
#     then each element as writeClassAndObject
#   FieldSerializer: fields in ALPHABETICAL name order —
#     HoodieKey{partitionPath, recordKey} (String fields: marker +
#     writeString), DeleteRecord{hoodieKey, orderingVal} (non-final
#     field types: class tag + marker + body)
#   strings: first byte high bit clear = ASCII run (last byte has the
#     high bit set), else a 6+7+7..-bit length (charCount+1; 0 = null,
#     1 = empty) followed by java-char UTF-8
#   varints: 7-bit little-endian groups, high bit = continuation;
#     int/long VALUES are zigzag varints, double/float fixed-width LE
#
# The decoder is STRICT: class names must be the known hudi model
# classes, every byte of the payload must be consumed, and anything
# else refuses loudly — an unknown kryo graph can only be read with
# the hudi-spark bundle.
# ---------------------------------------------------------------

_KRYO_KEY = "org.apache.hudi.common.model.HoodieKey"
_KRYO_DELETE = "org.apache.hudi.common.model.DeleteRecord"
_KRYO_KEY_ARR = "[L" + _KRYO_KEY + ";"
_KRYO_DELETE_ARR = "[L" + _KRYO_DELETE + ";"
# Kryo() constructor registration order -> (class-tag varint) - 2
_KRYO_REGISTERED = {
    0: "int", 1: "java.lang.String", 2: "float", 3: "boolean",
    4: "byte", 5: "char", 6: "short", 7: "long", 8: "double",
    9: "org.apache.avro.util.Utf8",
}
_KRYO_PRIMITIVES = {
    "int", "float", "boolean", "byte", "char", "short", "long",
    "double",
}


class _KryoReader:
    def __init__(self, buf: bytes):
        self.buf = memoryview(buf)
        self.pos = 0
        self.names: dict[int, str] = {}  # class nameId -> name
        self.refs: list = []  # reference ids in write order

    def eof(self) -> bool:
        return self.pos == len(self.buf)

    def _byte(self) -> int:
        if self.pos >= len(self.buf):
            raise HudiLogError("kryo: truncated stream")
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def varint(self) -> int:
        result, shift = 0, 0
        while True:
            b = self._byte()
            result |= (b & 0x7F) << shift
            if not (b & 0x80):
                return result
            shift += 7
            if shift > 70:
                raise HudiLogError("kryo: varint too long")

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def string(self) -> str | None:
        b = self._byte()
        if (b & 0x80) == 0:
            # ASCII run: bytes until the high bit marks the last char
            out = [b]
            while not (out[-1] & 0x80):
                out.append(self._byte())
            out[-1] &= 0x7F
            return bytes(out).decode("ascii")
        n = b & 0x3F
        shift = 6
        more = b & 0x40
        while more:
            b = self._byte()
            n |= (b & 0x7F) << shift
            shift += 7
            more = b & 0x80
        if n == 0:
            return None
        if n == 1:
            return ""
        chars = []
        for _ in range(n - 1):  # java-char UTF-8 (CESU-style)
            c = self._byte()
            if c < 0x80:
                chars.append(chr(c))
            elif (c >> 5) == 0b110:
                c2 = self._byte()
                chars.append(chr(((c & 0x1F) << 6) | (c2 & 0x3F)))
            elif (c >> 4) == 0b1110:
                c2, c3 = self._byte(), self._byte()
                chars.append(
                    chr(
                        ((c & 0x0F) << 12)
                        | ((c2 & 0x3F) << 6)
                        | (c3 & 0x3F)
                    )
                )
            else:
                raise HudiLogError("kryo: bad utf8 char")
        return "".join(chars)

    def read_class(self) -> str | None:
        v = self.varint()
        if v == 0:
            return None  # null class == null object
        if v == 1:  # by name
            name_id = self.varint()
            if name_id in self.names:
                return self.names[name_id]
            name = self.string()
            self.names[name_id] = name
            return name
        cls = _KRYO_REGISTERED.get(v - 2)
        if cls is None:
            raise HudiLogError(f"kryo: unregistered class tag {v}")
        return cls

    def ref_string(self) -> str | None:
        """A String field written via writeObjectOrNull: nullable
        reference marker + writeString."""
        m = self.varint()
        if m == 0:
            return None
        if m >= 2:
            s = self.refs[m - 2]
            if not isinstance(s, str):
                raise HudiLogError("kryo: back-reference is not a str")
            return s
        idx = len(self.refs)
        self.refs.append(None)
        s = self.string()
        self.refs[idx] = s
        return s

    def read_class_and_object(self):
        cls = self.read_class()
        if cls is None:
            return None
        if cls in _KRYO_PRIMITIVES:  # wrappers skip reference markers
            if cls in ("int", "long"):
                return self.zigzag()
            if cls in ("double", "float"):
                k = 8 if cls == "double" else 4
                if self.pos + k > len(self.buf):
                    raise HudiLogError("kryo: truncated stream")
                v = struct.unpack_from(
                    "<d" if cls == "double" else "<f",
                    self.buf, self.pos,
                )[0]
                self.pos += k
                return v
            if cls == "boolean":
                return self._byte() != 0
            if cls == "byte":
                b = self._byte()
                return b - 256 if b >= 128 else b
            if cls in ("short", "char"):
                hi, lo = self._byte(), self._byte()
                v = (hi << 8) | lo
                if cls == "char":
                    return chr(v)
                return v - 65536 if v >= 32768 else v
        m = self.varint()
        if m >= 2:
            return self.refs[m - 2]
        if m != 1:
            raise HudiLogError("kryo: unexpected null reference marker")
        idx = len(self.refs)
        self.refs.append(None)
        obj = self._read_body(cls)
        self.refs[idx] = obj
        return obj

    def _read_body(self, cls: str):
        if cls in ("java.lang.String", "org.apache.avro.util.Utf8"):
            return self.string()
        if cls in (_KRYO_KEY_ARR, _KRYO_DELETE_ARR):
            n = self.varint() - 1
            if n < 0:
                raise HudiLogError("kryo: negative array length")
            return [self.read_class_and_object() for _ in range(n)]
        if cls == _KRYO_KEY:
            # FieldSerializer, alphabetical: partitionPath, recordKey
            pp = self.ref_string()
            rk = self.ref_string()
            return {"recordKey": rk, "partitionPath": pp}
        if cls == _KRYO_DELETE:
            # alphabetical: hoodieKey, orderingVal — both non-final
            # field types (class tag + marker + body)
            hk = self.read_class_and_object()
            self.read_class_and_object()  # orderingVal (ignored)
            return hk
        raise HudiLogError(f"kryo: unsupported class {cls!r}")


def encode_kryo_delete_payload(
    records: list[dict], version: int = 2
) -> bytes:
    """Writer twin of _kryo_delete_payload for fixtures and tests:
    kryo-serialize [{'recordKey', 'partitionPath'}] exactly as
    hudi-common's SerializationUtils frames HoodieKey[] (v1) /
    DeleteRecord[] with null orderingVal (v2). The decoder is
    independently tested against HAND-ASSEMBLED bytes
    (tests/test_sources.py::test_hudi_kryo_delete_block_decode), so
    this twin is convenience, not the conformance evidence."""
    out = bytearray()

    def varint(v: int):
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return

    def wstring(s: str):
        if len(s) == 0:
            out.append(1 | 0x80)
            return
        data = s.encode("ascii")  # fixtures are ascii record keys
        if len(s) > 1 and len(data) < 64:
            out.extend(data[:-1])
            out.append(data[-1] | 0x80)
        else:
            varint_utf8_len(len(s) + 1)
            out.extend(data)

    def varint_utf8_len(v: int):
        if v >> 6 == 0:
            out.append(v | 0x80)
        elif v >> 13 == 0:
            out.append((v & 0x3F) | 0x40 | 0x80)
            out.append(v >> 6)
        else:
            raise HudiLogError("kryo fixture string too long")

    names: dict[str, int] = {}

    def wclass(name: str):
        out.append(1)  # by-name tag
        if name in names:
            varint(names[name])
        else:
            nid = len(names)
            names[name] = nid
            varint(nid)
            wstring(name)

    arr = _KRYO_KEY_ARR if version == 1 else _KRYO_DELETE_ARR
    wclass(arr)
    out.append(1)  # new-object reference marker (the array)
    varint(len(records) + 1)
    for r in records:
        if version == 1:
            wclass(_KRYO_KEY)
            out.append(1)
            out.append(1)
            wstring(str(r.get("partitionPath") or ""))
            out.append(1)
            wstring(str(r["recordKey"]))
        else:
            wclass(_KRYO_DELETE)
            out.append(1)
            wclass(_KRYO_KEY)
            out.append(1)
            out.append(1)
            wstring(str(r.get("partitionPath") or ""))
            out.append(1)
            wstring(str(r["recordKey"]))
            out.append(0)  # orderingVal: null class tag
    return bytes(out)


def _kryo_delete_payload(payload: bytes, path: str) -> list[dict]:
    """Kryo-serialized HoodieKey[] (v1) / DeleteRecord[] (v2) ->
    [{'recordKey', 'partitionPath'}]; strict — unknown classes, bad
    structure or trailing bytes refuse loudly."""
    r = _KryoReader(payload)
    try:
        arr = r.read_class_and_object()
        ok = r.eof() and isinstance(arr, list)
    except (HudiLogError, IndexError, UnicodeDecodeError) as exc:
        raise HudiLogError(
            f"{path}: kryo DELETE payload does not decode as"
            f" HoodieKey[]/DeleteRecord[] ({exc}) — needs the"
            " hudi-spark bundle"
        ) from exc
    if not ok:
        raise HudiLogError(
            f"{path}: kryo DELETE payload has trailing bytes or a"
            " non-array root — needs the hudi-spark bundle"
        )
    out = []
    for d in arr:
        if not isinstance(d, dict) or d.get("recordKey") is None:
            raise HudiLogError(
                f"{path}: kryo DELETE array holds a non-HoodieKey"
                " element — needs the hudi-spark bundle"
            )
        out.append(
            {
                "recordKey": str(d["recordKey"]),
                "partitionPath": str(d.get("partitionPath") or ""),
            }
        )
    return out


def decode_delete_block(content: bytes, path: str) -> list[dict]:
    """Library-serialized DELETE block content (no SCHEMA header) ->
    [{'recordKey', 'partitionPath'}]. Framing (hudi-common
    HoodieDeleteBlock.getContentBytes, public): int32 serialization
    version, int32 payload length, payload. Version >= 3 is a binary
    avro datum of HoodieDeleteRecordList (decoded here, r12 — tried
    against both published orderingVal union shapes under a strict
    consume-exactly-the-payload check, so a wrong shape refuses
    instead of misreading); versions 1/2 are kryo-serialized
    HoodieKey[]/DeleteRecord[] — decoded jar-free since r13
    (_kryo_delete_payload; strict, unknown kryo graphs stay loud)."""
    if len(content) < 8:
        raise HudiLogError(
            f"{path}: DELETE block content too short to frame —"
            " unknown serialization needs the hudi-spark bundle"
        )
    ver, plen = struct.unpack_from(">ii", content, 0)
    if 8 + plen != len(content):
        raise HudiLogError(
            f"{path}: DELETE block framing mismatch"
            f" (8+{plen} != {len(content)}) — unknown serialization"
            " needs the hudi-spark bundle"
        )
    payload = content[8:]
    if ver < 3:
        return _kryo_delete_payload(payload, path)
    for wrappers in (False, True):
        schema = _delete_record_list_schema(wrappers)
        names: dict = {}
        _register(schema, names)
        r = _Reader(payload)
        try:
            rec = _decode(schema, r, names)
        except Exception:
            continue
        if not r.eof():
            continue
        out = []
        for d in rec.get("deleteRecordList") or []:
            if d.get("recordKey") is None:
                break
            out.append(
                {
                    "recordKey": str(d["recordKey"]),
                    "partitionPath": str(d.get("partitionPath") or ""),
                }
            )
        else:
            return out
    raise HudiLogError(
        f"{path}: DELETE log block v{ver} payload does not decode as"
        " HoodieDeleteRecordList — needs the hudi-spark bundle"
    )


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


def decode_hfile_block(
    content: bytes, schema_json: str, path: str
) -> list[dict]:
    """HFILE_DATA block content -> record dicts (r14). The content is
    a complete inlined HFile (hudi HoodieHFileDataBlock; reference
    plugin/trino-hudi reads it via the hudi library's
    HoodieLogFileReader -> HBase HFile.Reader): each cell's row is the
    record key, its value the binary-avro datum under the block's
    SCHEMA header. sources/hfile.py walks the public HBase v2/v3
    layout jar-free."""
    from witdb_spark.sources.hfile import read_hfile_cells

    schema = json.loads(schema_json)
    names: dict = {}
    _register(schema, names)
    out: list[dict] = []
    for _row, val in read_hfile_cells(content, path):
        out.append(_decode(schema, _Reader(val), names))
    return out


def encode_hfile_block_content(
    records: list[dict], schema, key_field: str = "_hoodie_record_key",
    compression: str = "gz",
) -> bytes:
    """Records -> HFILE_DATA block content: avro-encode each record
    under ``schema``, key cells by ``key_field`` (hudi sorts by record
    key), and assemble the inlined HFile via sources/hfile.write_hfile.
    Conformance twin of decode_hfile_block."""
    from witdb_spark.sources.avro_codec import _encode
    from witdb_spark.sources.hfile import write_hfile

    names: dict = {}
    _register(schema, names)
    cells = []
    for rec in records:
        datum = bytearray()
        _encode(schema, rec, names, datum)
        cells.append((str(rec[key_field]).encode(), bytes(datum)))
    return write_hfile(cells, compression=compression)


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
    rollback mechanism). DELETE blocks decode two ways: with a SCHEMA
    header — the shape this module's own MOR delete writer emits
    (tombstone records of the hoodie key fields) — or header-less in
    the library's avro-list serialization (r12, decode_delete_block;
    tombstones synthesize their _hoodie_* key fields from the decoded
    HoodieDeleteRecords + the block's INSTANT_TIME). Either way the
    records return with is_tombstone=True; kryo payloads (block
    serialization v1/v2) decode jar-free (r13). PARQUET_DATA blocks (r12)
    decode via pyarrow — their content IS a parquet file (hudi's
    HoodieParquetDataBlock; PAR1-magic-checked, loud otherwise).
    CDC_DATA blocks are supplemental change info — skipped here,
    served by log_cdc_entries (r13). HFILE blocks (r14) decode via
    the jar-free HBase HFile reader (decode_hfile_block) — cell
    values are avro datums under the block's SCHEMA header."""
    kept: list[dict] = []
    for b in read_log_blocks(path):
        t = b["type"]
        if t in (
            BLOCK_AVRO_DATA,
            BLOCK_DELETE,
            BLOCK_PARQUET_DATA,
            BLOCK_HFILE_DATA,
        ):
            kept.append(b)
        elif t == BLOCK_COMMAND:
            target = b["headers"].get(HEADER_TARGET_INSTANT_TIME)
            kept = [
                kb
                for kb in kept
                if kb["headers"].get(HEADER_INSTANT_TIME) != target
            ]
        elif t in (BLOCK_CORRUPT, BLOCK_CDC_DATA):
            # CDC_DATA blocks (RFC-51) carry SUPPLEMENTAL change info
            # (op/before/after images) alongside the data blocks of
            # the same commit — hudi's own snapshot reader skips them
            # too; serve them via log_cdc_entries (r13)
            continue
        else:
            raise HudiLogError(
                f"{path}: unknown log block type {t}"
                " — needs the hudi-spark bundle"
            )
    out: list = []
    for b in kept:
        schema_json = b["headers"].get(HEADER_SCHEMA)
        instant = b["headers"].get(HEADER_INSTANT_TIME)
        if b["type"] == BLOCK_PARQUET_DATA:
            out.extend(
                (r, instant, False)
                for r in decode_parquet_block(b["content"], path)
            )
            continue
        if b["type"] == BLOCK_HFILE_DATA:
            if not schema_json:
                raise HudiLogError(
                    f"{path}: HFILE block without SCHEMA header"
                )
            out.extend(
                (r, instant, False)
                for r in decode_hfile_block(
                    b["content"], schema_json, path
                )
            )
            continue
        if not schema_json and b["type"] == BLOCK_DELETE:
            # library avro-list tombstones: synthesize the key-field
            # record shape the merge reader consumes; commit time is
            # the block's instant
            out.extend(
                (
                    {
                        "_hoodie_record_key": d["recordKey"],
                        "_hoodie_partition_path": d["partitionPath"],
                        "_hoodie_commit_time": instant,
                    },
                    instant,
                    True,
                )
                for d in decode_delete_block(b["content"], path)
            )
            continue
        if not schema_json:
            raise HudiLogError(f"{path}: data block without SCHEMA header")
        recs = decode_avro_block(b["content"], schema_json)
        out.extend(
            (r, instant, b["type"] == BLOCK_DELETE) for r in recs
        )
    return out


def decode_parquet_block(content: bytes, path: str) -> list[dict]:
    """PARQUET_DATA block content -> list of record dicts. The
    library's HoodieParquetDataBlock serializes the batch as a whole
    in-memory parquet file (hudi-common, public) — so the content is
    PAR1-framed and pyarrow reads it directly; values normalize to
    JSON-friendly python (dates/timestamps -> ISO strings, the shape
    the MOR reader's from_json pass parses). Anything that is not a
    parquet payload refuses loudly."""
    import io

    if content[:4] != b"PAR1":
        raise HudiLogError(
            f"{path}: PARQUET_DATA block content is not a parquet"
            " payload — needs the hudi-spark bundle"
        )
    try:
        import pyarrow.parquet as pq

        table = pq.read_table(io.BytesIO(content))
    except Exception as exc:
        raise HudiLogError(
            f"{path}: PARQUET_DATA block failed to parse: {exc}"
        ) from exc

    def norm(v):
        import datetime as _dt
        from decimal import Decimal as _Dec

        if isinstance(v, (_dt.datetime, _dt.date, _dt.time)):
            return v.isoformat(sep=" ") if isinstance(
                v, _dt.datetime
            ) else v.isoformat()
        if isinstance(v, _Dec):
            return str(v)
        if isinstance(v, bytes):
            return v.decode("utf-8", "replace")
        return v

    return [
        {k: norm(v) for k, v in rec.items()}
        for rec in table.to_pylist()
    ]


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


def log_cdc_entries(path: str) -> list[tuple[dict, str | None]]:
    """CDC_DATA block records of one log file (r13 — hudi RFC-51
    'Change Data Capture', hoodie.table.cdc.enabled): each block is
    avro-framed like AVRO_DATA with its schema in the SCHEMA header;
    under the default supplemental logging mode (data_before_after)
    records carry {op: 'i'|'u'|'d', ts_ms, before, after} with the
    before/after images as JSON STRINGS (hudi serializes the record
    images to json in the cdc file). op_key_only / data_before modes
    decode with their own header schemas the same way. COMMAND
    rollbacks apply as for data blocks. Returns
    [(record, block INSTANT_TIME)]."""
    kept: list[dict] = []
    for b in read_log_blocks(path):
        t = b["type"]
        if t == BLOCK_CDC_DATA:
            kept.append(b)
        elif t == BLOCK_COMMAND:
            target = b["headers"].get(HEADER_TARGET_INSTANT_TIME)
            kept = [
                kb
                for kb in kept
                if kb["headers"].get(HEADER_INSTANT_TIME) != target
            ]
    out: list = []
    for b in kept:
        schema_json = b["headers"].get(HEADER_SCHEMA)
        if not schema_json:
            raise HudiLogError(
                f"{path}: CDC_DATA block without SCHEMA header"
            )
        instant = b["headers"].get(HEADER_INSTANT_TIME)
        out.extend(
            (r, instant)
            for r in decode_avro_block(b["content"], schema_json)
        )
    return out
