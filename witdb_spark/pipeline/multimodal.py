"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched pandas iterators
(mapInPandas) — the pattern a 100 TB multimodal pipeline uses.

Decode tiers (r4):
  - UNCOMPRESSED formats decode for REAL, in pure numpy/struct — PPM (P6)
    / PGM (P5) / 24-bit BMP pixels and RIFF/WAV PCM audio need no codec
    library (_DECODE_SRC below; tests build payloads byte-by-byte).
  - COMPRESSED formats (JPEG/PNG/MP3/H.264) need codec libraries absent
    from this container and raise NotImplementedError, loudly.
  - fake=True keeps the md5-derived deterministic double so the DuckDB
    oracle can hash-verify the full distributed path end-to-end (an
    oracle cannot decode pixels).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

# Self-contained decoder source, exec'd inside executor closures (the
# workers can't import witdb_spark) and at module level for driver use —
# the same single-source pattern as functions/geometry._GEO_SRC.
_DECODE_SRC = r'''
import struct


def sniff(payload):
    p = bytes(payload)
    if p[:2] == b"BM":
        return "bmp"
    if p[:2] in (b"P6", b"P5"):
        return "pnm"
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        return "wav"
    return None


def _pnm_header(p):
    """(width, height, channels, raster_offset) for P6/P5."""
    toks, i = [], 2
    while len(toks) < 3:
        while i < len(p) and p[i : i + 1].isspace():
            i += 1
        if p[i : i + 1] == b"#":
            while i < len(p) and p[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(p) and not p[j : j + 1].isspace():
            j += 1
        toks.append(int(p[i:j]))
        i = j
    i += 1  # exactly one whitespace separates header and raster
    w, h, _maxval = toks
    return w, h, (3 if p[:2] == b"P6" else 1), i


def decode_dims(payload):
    """(width, height, channels) — REAL decode for BMP/PNM; compressed
    formats raise (no codec library in this deployment)."""
    p = bytes(payload)
    k = sniff(p)
    if k == "bmp":
        w = struct.unpack_from("<i", p, 18)[0]
        h = abs(struct.unpack_from("<i", p, 22)[0])
        bits = struct.unpack_from("<H", p, 28)[0]
        return w, h, max(1, bits // 8)
    if k == "pnm":
        w, h, c, _ = _pnm_header(p)
        return w, h, c
    raise NotImplementedError(
        "compressed/unknown image format: codec library required"
        " (uncompressed BMP/P6/P5 decode natively)"
    )


def decode_pixels(payload):
    """numpy (h, w, c) uint8 for P6/P5/24-bit-BMP."""
    import numpy as np

    p = bytes(payload)
    k = sniff(p)
    if k == "pnm":
        w, h, c, off = _pnm_header(p)
        arr = np.frombuffer(p, dtype=np.uint8, count=w * h * c, offset=off)
        return arr.reshape(h, w, c)
    if k == "bmp":
        w, h, c = decode_dims(p)
        if c != 3:
            raise NotImplementedError("only 24-bit BMP pixel decode")
        off = struct.unpack_from("<I", p, 10)[0]
        stride = (w * 3 + 3) // 4 * 4
        out = np.empty((h, w, 3), np.uint8)
        for r in range(h):
            line = np.frombuffer(
                p, np.uint8, count=w * 3, offset=off + r * stride
            ).reshape(w, 3)
            out[h - 1 - r] = line[:, ::-1]  # bottom-up BGR -> top-down RGB
        return out
    raise NotImplementedError("compressed/unknown image format")


def resize_nn(payload, out_w, out_h):
    """Nearest-neighbor resize -> P6 payload bytes (real pixels in, real
    pixels out; canonical output container so results chain)."""
    import numpy as np

    px = decode_pixels(payload)
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    h, w = px.shape[:2]
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    rs = px[yi][:, xi]
    return ("P6\n%d %d\n255\n" % (out_w, out_h)).encode() + rs.tobytes()


def feature_vec4(payload):
    """4 real image features: per-channel means + global std, in [0, 1]."""
    import numpy as np

    px = decode_pixels(payload).astype(np.float64)
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    m = px.mean(axis=(0, 1)) / 255.0
    return [float(m[0]), float(m[1]), float(m[2]), float(px.std() / 255.0)]


def decode_wav(payload):
    """(n_channels, sample_rate, bits, n_frames) from RIFF/WAV chunks."""
    p = bytes(payload)
    if sniff(p) != "wav":
        raise NotImplementedError("not a RIFF/WAVE payload")
    i, nch, rate, bits, dlen = 12, None, None, None, None
    while i + 8 <= len(p):
        cid = p[i : i + 4]
        sz = struct.unpack_from("<I", p, i + 4)[0]
        if cid == b"fmt ":
            nch = struct.unpack_from("<H", p, i + 10)[0]
            rate = struct.unpack_from("<I", p, i + 12)[0]
            bits = struct.unpack_from("<H", p, i + 22)[0]
        elif cid == b"data":
            dlen = sz
        i += 8 + sz + (sz & 1)
    if None in (nch, rate, bits, dlen):
        raise ValueError("malformed WAV: missing fmt/data chunk")
    return nch, rate, bits, dlen // max(1, nch * bits // 8)
'''

_decode_ns: dict = {}
exec(_DECODE_SRC, _decode_ns)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("byte_len", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def as_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a text column as an opaque media blob: (doc_id, payload binary).
    In production this is the raw image/audio bytes column read straight
    from parquet — binary stays opaque to the engine until a decode stage."""
    return df.select("doc_id", F.encode(F.col(text_col), "UTF-8").alias("payload"))


def decode_image(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) — REAL decode for uncompressed BMP/P6/P5
    (_DECODE_SRC); compressed formats raise NotImplementedError (no codec
    library in this deployment)."""
    return _decode_ns["decode_dims"](payload)


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    """Deterministic test double: dimensions derived from md5(payload) —
    reproducible by the DuckDB oracle as md5-hex arithmetic."""
    h = int(hashlib.md5(payload).hexdigest()[:8], 16)
    return 1 + h % 1024, 1 + (h >> 10) % 1024, 3


def extract_media_metadata(media: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched metadata extraction over the binary payload column.

    mapInPandas processes whole Arrow record batches per call: pandas
    vectorized ops inside, zero per-row Python dispatch, and the output
    schema is fixed so Catalyst can plan downstream stages. Partitioning is
    inherited from the input — no shuffle is introduced.
    """

    # The closure must be fully self-contained: cloudpickle serializes
    # references to module-level functions *by module name*, and Spark's
    # Python workers don't necessarily have this repo on sys.path (the
    # driver may be launched from any cwd). Everything the worker runs is
    # defined inside `extract` so it pickles by value.
    decode_src = _DECODE_SRC  # plain-str local: pickles by value

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def fake_dims(payload: bytes) -> tuple[int, int, int]:
            h = int(hashlib.md5(payload).hexdigest()[:8], 16)
            return 1 + h % 1024, 1 + (h >> 10) % 1024, 3

        _ns: dict = {}
        exec(decode_src, _ns)
        decode = fake_dims if fake else _ns["decode_dims"]
        for pdf in batches:
            dims = [decode(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(p) for p in pdf["payload"]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(extract, schema=MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emit (doc_id,
    frame_no) rows for frames 0, n, 2n, ... based on payload length as a
    stand-in for duration. Pure JVM sequence+explode — the decode of each
    sampled frame would be another mapInPandas stage."""
    n_frames = (F.length(F.col("payload")) / F.lit(100)).cast("int") + 1
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_no"),
    )


FEATURES_SCHEMA = StructType(
    [StructField("doc_id", LongType())]
    + [StructField(f"f{k}", DoubleType()) for k in range(4)]
)


def extract_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Feature extraction over binary payloads (the embed-the-image stage).
    Real extraction needs a vision model (not in this container) — the
    fake=True double derives 4 deterministic floats from md5 bytes, so the
    whole distributed path (Arrow batching, fixed output schema, no
    shuffle) runs and is oracle-checked end-to-end."""

    decode_src = _DECODE_SRC

    def extract(batches):
        import hashlib

        import pandas as _pd

        def fake_vec(payload):
            d = hashlib.md5(payload).digest()
            return [d[k] / 255.0 for k in range(4)]

        _ns: dict = {}
        exec(decode_src, _ns)
        vec = fake_vec if fake else _ns["feature_vec4"]
        for pdf in batches:
            vecs = [vec(p) for p in pdf["payload"]]
            out = {"doc_id": pdf["doc_id"]}
            for k in range(4):
                out[f"f{k}"] = [v[k] for v in vecs]
            yield _pd.DataFrame(out)

    return media.mapInPandas(extract, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(
    media: DataFrame, width: int = 224, height: int = 224, fake: bool = False
) -> DataFrame:
    """Resize stage plumbing. Real resizing needs an image codec — the
    fake=True double truncates/pads the payload to width*height bytes
    (deterministic, size-correct), proving the batch shape and schema."""

    decode_src = _DECODE_SRC

    def resize(batches):
        import pandas as _pd

        target = width * height

        def fake_resize(payload):
            b = bytes(payload)
            return b[:target].ljust(target, b"\0")

        _ns: dict = {}
        exec(decode_src, _ns)

        def real_resize(payload):
            return _ns["resize_nn"](payload, width, height)

        rs = fake_resize if fake else real_resize
        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [rs(p) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(resize, schema=RESIZED_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("bits", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_s", DoubleType()),
    ]
)


def extract_audio_metadata(media: DataFrame) -> DataFrame:
    """REAL audio metadata for RIFF/WAV payloads (pure struct parsing —
    _DECODE_SRC decode_wav): channels, sample rate, bit depth, frames,
    duration. Same map-only mapInPandas shape as the image metadata stage;
    compressed audio raises loudly."""
    decode_src = _DECODE_SRC

    def extract(batches):
        import pandas as _pd

        _ns: dict = {}
        exec(decode_src, _ns)
        dw = _ns["decode_wav"]
        for pdf in batches:
            rows = [dw(p) for p in pdf["payload"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_channels": [r[0] for r in rows],
                    "sample_rate": [r[1] for r in rows],
                    "bits": [r[2] for r in rows],
                    "n_frames": [r[3] for r in rows],
                    "duration_s": [r[3] / r[1] for r in rows],
                }
            )

    return media.mapInPandas(extract, schema=AUDIO_SCHEMA)
