"""Multimodal column handling: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched pandas iterators
(mapInPandas) — the pattern a 100 TB multimodal pipeline uses.

The container has no image/audio codecs, so decode_image() is a clearly
marked stub: the Spark-side plumbing (schema, batching, partitioning, UDF
signature) is real and tested; the pixel decode raises NotImplementedError
unless fake=True, which derives deterministic metadata from md5 so the
DuckDB oracle can verify the full distributed path end-to-end.
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
    """STUB — pixel decoding needs an image codec (PIL/libjpeg) that is not
    in this container. The distributed plumbing around this call is real."""
    raise NotImplementedError(
        "image decode requires a codec library; run extract_media_metadata"
        " with fake=True for the deterministic test double"
    )


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
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def fake_dims(payload: bytes) -> tuple[int, int, int]:
            h = int(hashlib.md5(payload).hexdigest()[:8], 16)
            return 1 + h % 1024, 1 + (h >> 10) % 1024, 3

        def real_dims(payload: bytes) -> tuple[int, int, int]:
            raise NotImplementedError(
                "image decode requires a codec library; pass fake=True for"
                " the deterministic test double"
            )

        decode = fake_dims if fake else real_dims
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

    def extract(batches):
        import hashlib

        import pandas as _pd

        def fake_vec(payload):
            d = hashlib.md5(payload).digest()
            return [d[k] / 255.0 for k in range(4)]

        def real_vec(payload):
            raise NotImplementedError(
                "feature extraction requires a vision model; pass fake=True"
                " for the deterministic test double"
            )

        vec = fake_vec if fake else real_vec
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

    def resize(batches):
        import pandas as _pd

        target = width * height

        def fake_resize(payload):
            b = bytes(payload)
            return b[:target].ljust(target, b"\0")

        def real_resize(payload):
            raise NotImplementedError(
                "image resize requires a codec library; pass fake=True for"
                " the deterministic test double"
            )

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
