"""Jar-free HBase HFile v2/v3 reader + conformance writer (r14).

Hudi's HFILE log blocks (HoodieHFileDataBlock) and metadata-table base
files inline a complete HFile: each cell's row key is the hudi record
key and its value the avro-encoded record. The reference reads them
through the hudi library (plugin/trino-hudi delegates to
HoodieLogFileReader -> HBase HFile.Reader); this module implements the
PUBLIC HFile format instead — the on-disk layout is specified by
HBase (hbase-server io.hfile: HFileBlock, FixedFileTrailer,
hbase-protocol HFile.proto) and stable since 0.96:

  [data block]*  [load-on-open: root data index, (meta index),
  file info]  [fixed trailer]

Block (33-byte header, checksummed):
  8B  block-type magic ("DATABLK*", "ROOTIDX>", "FILEINF2", ...)
  4B  onDiskSizeWithoutHeader   (payload-after-header + checksums)
  4B  uncompressedSizeWithoutHeader
  8B  prevBlockOffset
  1B  checksumType (0 NULL, 1 CRC32, 2 CRC32C)
  4B  bytesPerChecksum
  4B  onDiskDataSizeWithHeader  (header + compressed payload, NO checksums)
  payload (per trailer compression codec), then 4B checksum per
  bytesPerChecksum chunk of header+payload

Data block payload = cells:
  4B keyLen | 4B valueLen | key | value
  [2B tagsLen + tags        when file info carries hfile.MAX_TAGS_LEN]
  [vlong memstoreTS         when file info carries MAX_MEMSTORE_TS]
  key = 2B rowLen | row | 1B famLen | family | qualifier | 8B ts | 1B type

Trailer: "TRABLK\\"$" magic + protobuf FileTrailerProto + zero padding,
with the LAST 4 bytes = major | minor<<24. File info block content =
"PBUF" + FileInfoProto{repeated BytesBytesPair}.

The reader walks data blocks SEQUENTIALLY from
trailer.first_data_block_offset to load_on_open_data_offset — no index
needed for a full scan (the MOR merge consumes every record anyway) —
verifying checksums (CRC32 via zlib, CRC32C table-driven below) and
refusing loudly on encodings/codecs outside the subset (encoded data
blocks "DATABLKE", LZO/LZ4/BZIP2/ZSTD). GZ decompresses via zlib,
SNAPPY via the pure-python decoder avro_codec grew in r10.

The writer emits a minimal spec-shaped v3 file (sorted cells, one
root index level, MAX_MEMSTORE_TS=0, CRC32C) so tests can
round-trip conformance without HBase, the same strategy the kryo
DELETE work used (hudi_log.encode_kryo_delete_payload).
"""

from __future__ import annotations

import struct
import zlib


class HFileError(ValueError):
    pass


DATABLK = b"DATABLK*"
ENCODED_DATABLK = b"DATABLKE"
ROOTIDX = b"ROOTIDX>"
FILEINFO = b"FILEINF2"
TRAILER_MAGIC = b'TRABLK"$'
PB_MAGIC = b"PBUF"

# org.apache.hadoop.hbase.io.compress.Compression.Algorithm ordinals
_CODEC_LZO = 0
_CODEC_GZ = 1
_CODEC_NONE = 2
_CODEC_SNAPPY = 3

_HEADER_SIZE = 33

# ---------------------------------------------------------------- crc32c
# Castagnoli CRC-32 (poly 0x1EDC6F41 reflected = 0x82F63B78): HBase's
# default block checksum; not in the python stdlib.
_CRC32C_TABLE = []


def _crc32c_table():
    if not _CRC32C_TABLE:
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            _CRC32C_TABLE.append(c)
    return _CRC32C_TABLE


def crc32c(data: bytes, crc: int = 0) -> int:
    table = _crc32c_table()
    c = crc ^ 0xFFFFFFFF
    for b in data:
        c = table[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


# ------------------------------------------------------------- protobuf
# Minimal wire-format helpers for the two fixed HBase messages; tag 0
# terminates (the trailer pads with zeros).


def _pb_varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def _pb_parse(buf: bytes) -> dict[int, list]:
    """field number -> list of raw values (int for varint, bytes for
    length-delimited). Fixed32/64 kept as ints."""
    fields: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _pb_varint(buf, pos)
        if tag == 0:
            break  # zero padding
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _pb_varint(buf, pos)
        elif wt == 2:
            ln, pos = _pb_varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            (v,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        elif wt == 1:
            (v,) = struct.unpack_from("<Q", buf, pos)
            pos += 8
        else:
            raise HFileError(f"protobuf wire type {wt} unsupported")
        fields.setdefault(fnum, []).append(v)
    return fields


def _pb_emit_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_field(fnum: int, value) -> bytes:
    if isinstance(value, int):
        return _pb_emit_varint(fnum << 3) + _pb_emit_varint(value)
    if isinstance(value, str):
        value = value.encode()
    return (
        _pb_emit_varint((fnum << 3) | 2)
        + _pb_emit_varint(len(value))
        + value
    )


# --------------------------------------------------------------- reader


def _read_vlong(buf: bytes, pos: int) -> tuple[int, int]:
    """Hadoop WritableUtils.readVLong: first byte >= -112 is the value
    itself; -120..-113 prefix a (-112 - first)-byte positive payload;
    < -120 a (-120 - first)-byte payload to complement."""
    first = struct.unpack_from("b", buf, pos)[0]
    pos += 1
    if first >= -112:
        return first, pos
    if first >= -120:
        size, negative = -112 - first, False
    else:
        size, negative = -120 - first, True
    val = 0
    for _ in range(size):
        val = (val << 8) | buf[pos]
        pos += 1
    return (~val if negative else val), pos


def _decompress(payload: bytes, codec: int, path: str) -> bytes:
    if codec == _CODEC_NONE:
        return payload
    if codec == _CODEC_GZ:
        return zlib.decompress(payload, 47)  # gzip or zlib wrapper
    if codec == _CODEC_SNAPPY:
        from witdb_spark.sources.avro_codec import snappy_decompress

        return snappy_decompress(payload)
    raise HFileError(
        f"{path}: HFile compression codec ordinal {codec}"
        " (LZO/LZ4/BZIP2/ZSTD) needs the hudi-spark bundle"
    )


def _parse_trailer(buf: bytes, path: str) -> dict:
    if len(buf) < 16:
        raise HFileError(f"{path}: too short for an HFile")
    (vint,) = struct.unpack_from(">i", buf, len(buf) - 4)
    major, minor = vint & 0x00FFFFFF, vint >> 24
    if major not in (2, 3):
        raise HFileError(
            f"{path}: HFile major version {major} (v2/v3 supported)"
        )
    window = buf[-4096:]
    at = window.rfind(TRAILER_MAGIC)
    if at < 0:
        raise HFileError(f"{path}: HFile trailer magic not found")
    fields = _pb_parse(window[at + 8 : len(window) - 4])

    def one(fnum, default=None):
        vs = fields.get(fnum)
        return vs[-1] if vs else default

    t = {
        "file_info_offset": one(1),
        "load_on_open_data_offset": one(2),
        "entry_count": one(7, 0),
        "first_data_block_offset": one(9, 0),
        "last_data_block_offset": one(10, 0),
        "compression_codec": one(12, _CODEC_NONE),
        "major": major,
        "minor": minor,
    }
    if t["load_on_open_data_offset"] is None:
        raise HFileError(f"{path}: trailer missing load-on-open offset")
    return t


def _read_block(
    buf: bytes, off: int, codec: int, path: str
) -> tuple[bytes, bytes, int]:
    """-> (block magic, decompressed payload, next offset)."""
    magic = buf[off : off + 8]
    on_disk_wo_header, uncompressed_wo_header = struct.unpack_from(
        ">ii", buf, off + 8
    )
    checksum_type = buf[off + 24]
    (bytes_per_checksum,) = struct.unpack_from(">i", buf, off + 25)
    (on_disk_data_with_header,) = struct.unpack_from(">i", buf, off + 29)
    data_end = off + on_disk_data_with_header
    payload = buf[off + _HEADER_SIZE : data_end]
    checked = buf[off:data_end]
    sums = buf[data_end : off + _HEADER_SIZE + on_disk_wo_header]
    if checksum_type and bytes_per_checksum > 0:
        fn = zlib.crc32 if checksum_type == 1 else crc32c
        want = [
            struct.unpack_from(">I", sums, i)[0]
            for i in range(0, len(sums), 4)
        ]
        got = [
            fn(checked[i : i + bytes_per_checksum]) & 0xFFFFFFFF
            for i in range(0, len(checked), bytes_per_checksum)
        ]
        if want != got:
            raise HFileError(f"{path}: HFile block checksum mismatch")
    data = _decompress(payload, codec, path)
    if len(data) != uncompressed_wo_header:
        raise HFileError(
            f"{path}: HFile block decompressed to {len(data)} bytes,"
            f" expected {uncompressed_wo_header}"
        )
    return magic, data, off + _HEADER_SIZE + on_disk_wo_header


def _file_info(buf: bytes, trailer: dict, codec: int, path: str) -> dict:
    off = trailer["file_info_offset"]
    if off is None:
        return {}
    magic, data, _ = _read_block(buf, off, codec, path)
    if magic != FILEINFO:
        raise HFileError(
            f"{path}: expected FILEINF2 at {off}, got {magic!r}"
        )
    if data[:4] != PB_MAGIC:
        raise HFileError(f"{path}: file info without PBUF magic")
    out: dict[bytes, bytes] = {}
    for pair in _pb_parse(data[4:]).get(1, []):
        kv = _pb_parse(pair)
        k = kv.get(1, [b""])[0]
        v = kv.get(2, [b""])[0]
        out[bytes(k)] = bytes(v)
    return out


def read_hfile_cells(buf: bytes, path: str = "<hfile>") -> list[tuple[bytes, bytes]]:
    """Full sequential scan: [(row key, value)] in file order. Refuses
    loudly on encoded data blocks and unsupported codecs — misreading
    cells would corrupt the MOR merge silently."""
    trailer = _parse_trailer(buf, path)
    codec = trailer["compression_codec"]
    info = _file_info(buf, trailer, codec, path)
    with_tags = b"hfile.MAX_TAGS_LEN" in info
    with_mvcc = b"MAX_MEMSTORE_TS" in info or b"MAX_MEMSTORE_TS_KEY" in info
    cells: list[tuple[bytes, bytes]] = []
    off = trailer["first_data_block_offset"] or 0
    end = trailer["load_on_open_data_offset"]
    while off < end:
        magic, data, nxt = _read_block(buf, off, codec, path)
        off = nxt
        if magic == ENCODED_DATABLK:
            raise HFileError(
                f"{path}: encoded HFile data blocks"
                " (DataBlockEncoding) need the hudi-spark bundle"
            )
        if magic != DATABLK:
            continue  # bloom/meta chunks interleaved before load-on-open
        pos = 0
        while pos < len(data):
            klen, vlen = struct.unpack_from(">ii", data, pos)
            pos += 8
            key = data[pos : pos + klen]
            pos += klen
            value = data[pos : pos + vlen]
            pos += vlen
            if with_tags:
                (tlen,) = struct.unpack_from(">H", data, pos)
                pos += 2 + tlen
            if with_mvcc:
                _, pos = _read_vlong(data, pos)
            (rowlen,) = struct.unpack_from(">H", key, 0)
            cells.append((key[2 : 2 + rowlen], value))
        if pos != len(data):
            raise HFileError(
                f"{path}: HFile data block cell framing mismatch"
            )
    if trailer["entry_count"] and len(cells) != trailer["entry_count"]:
        raise HFileError(
            f"{path}: HFile cell count {len(cells)} !="
            f" trailer entry count {trailer['entry_count']}"
        )
    return cells


# --------------------------------------------------------------- writer


def _block(
    magic: bytes,
    payload: bytes,
    codec: int,
    prev_offset: int,
    bytes_per_checksum: int = 16384,
) -> bytes:
    if codec == _CODEC_GZ:
        on_disk = zlib.compress(payload)
        # hadoop GzipCodec writes gzip frames; zlib frames also
        # decompress under wbits=47 — the reader accepts both
    elif codec == _CODEC_NONE:
        on_disk = payload
    else:
        raise HFileError(f"writer supports NONE/GZ, not codec {codec}")
    on_disk_data_with_header = _HEADER_SIZE + len(on_disk)
    n_chunks = -(-on_disk_data_with_header // bytes_per_checksum)
    on_disk_wo_header = len(on_disk) + 4 * n_chunks
    header = (
        magic
        + struct.pack(">ii", on_disk_wo_header, len(payload))
        + struct.pack(">q", prev_offset)
        + bytes([2])  # CRC32C
        + struct.pack(">i", bytes_per_checksum)
        + struct.pack(">i", on_disk_data_with_header)
    )
    body = header + on_disk
    sums = b"".join(
        struct.pack(">I", crc32c(body[i : i + bytes_per_checksum]))
        for i in range(0, len(body), bytes_per_checksum)
    )
    return body + sums


def write_hfile(
    cells: list[tuple[bytes, bytes]],
    compression: str = "gz",
    block_size: int = 65536,
) -> bytes:
    """Spec-shaped minimal HFile v3: sorted cells in CRC32C-checked
    data blocks, a one-level root index, PBUF file info
    (MAX_MEMSTORE_TS=0 so cells carry the 1-byte vlong, as HBase's
    writer does), protobuf trailer. Conformance fixture builder for
    the reader above AND the payload builder for HFILE log blocks in
    tests."""
    codec = {"gz": _CODEC_GZ, "none": _CODEC_NONE}[compression]
    cells = sorted(cells, key=lambda kv: kv[0])
    out = bytearray()
    index: list[tuple[int, int, bytes]] = []  # offset, size, first key
    cur = bytearray()
    first_key = None
    prev_off = -1
    blocks: list[tuple[bytes, bytes]] = []  # (first key, payload)

    def key_bytes(row: bytes) -> bytes:
        # rowLen | row | famLen=0 | (no family/qualifier) | ts MAX | Put(4)
        return (
            struct.pack(">H", len(row))
            + row
            + b"\x00"
            + struct.pack(">q", 2**63 - 1)
            + bytes([4])
        )

    for row, value in cells:
        k = key_bytes(row)
        cell = (
            struct.pack(">ii", len(k), len(value))
            + k
            + value
            + b"\x00"  # vlong memstoreTS = 0
        )
        if first_key is None:
            first_key = k
        cur += cell
        if len(cur) >= block_size:
            blocks.append((first_key, bytes(cur)))
            cur, first_key = bytearray(), None
    if cur:
        blocks.append((first_key, bytes(cur)))

    first_data_off = last_data_off = 0
    for fk, payload in blocks:
        off = len(out)
        if not index:
            first_data_off = off
        last_data_off = off
        index.append((off, 0, fk))
        blk = _block(DATABLK, payload, codec, prev_off)
        index[-1] = (off, len(blk), fk)
        out += blk
        prev_off = off

    load_on_open = len(out)
    # root data index: [offset(8) | onDiskSize(4) | vint keyLen | key]*
    root = bytearray()
    for off, size, fk in index:
        root += struct.pack(">q", off) + struct.pack(">i", size)
        root += _write_vlong_bytes(len(fk)) + fk
    out += _block(ROOTIDX, bytes(root), codec, -1)

    file_info_off = len(out)
    pairs = b"".join(
        _pb_field(
            1,
            _pb_field(1, k) + _pb_field(2, v),
        )
        for k, v in [
            (b"MAX_MEMSTORE_TS", struct.pack(">q", 0)),
            (b"hfile.AVG_KEY_LEN", struct.pack(">i", 16)),
        ]
    )
    out += _block(FILEINFO, PB_MAGIC + pairs, codec, -1)

    proto = (
        _pb_field(1, file_info_off)
        + _pb_field(2, load_on_open)
        + _pb_field(3, len(root))
        + _pb_field(4, sum(len(p) for _, p in blocks))
        + _pb_field(5, len(index))
        + _pb_field(6, 0)
        + _pb_field(7, len(cells))
        + _pb_field(8, 1)
        + _pb_field(9, first_data_off)
        + _pb_field(10, last_data_off)
        + _pb_field(
            11,
            "org.apache.hadoop.hbase.CellComparatorImpl",
        )
        + _pb_field(12, codec)
    )
    trailer = TRAILER_MAGIC + proto
    pad = 212 - len(trailer) - 4
    if pad < 0:
        pad = 0
    trailer += b"\x00" * pad + struct.pack(">i", 3 | (0 << 24))
    out += trailer
    return bytes(out)


def _write_vlong_bytes(v: int) -> bytes:
    """Hadoop WritableUtils.writeVLong."""
    if -112 <= v <= 127:
        return struct.pack("b", v)
    length = -112
    if v < 0:
        v = ~v
        length = -120
    tmp = v
    while tmp != 0:
        tmp >>= 8
        length -= 1
    size = -(length + 112) if length >= -120 else -(length + 120)
    out = bytearray(struct.pack("b", length))
    for i in range(size - 1, -1, -1):
        out.append((v >> (8 * i)) & 0xFF)
    return bytes(out)
