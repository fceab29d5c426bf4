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
