"""Training-data curation operators: chunking, benchmark decontamination,
PII scrubbing, stratified sampling.

These are the pipeline steps between raw-corpus dedup (pipeline/dedup.py)
and training: cut documents into model-window-sized chunks, drop documents
that leak evaluation benchmarks (n-gram containment — the standard
"13-gram decontamination" of GPT-3/C4 lineage, done here as a
shingle-hash semi join), redact PII spans, and downsample sources to a
target mixture. Every operator is pure JVM column algebra (split /
sequence / transform / explode / regexp_replace / md5) — no Python in any
hot path — and every one is deterministic, so the DuckDB oracle replays
them (queries/curation_queries.py).

Scale shape: chunking and scrubbing are map-only; decontamination
shuffles once on shingle hash (benchmark side is small → broadcast semi
join); stratified sampling is map-only given a broadcast of per-source
fractions (one tiny count aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split whitespace-tokenized documents into overlapping chunks of
    ``chunk_tokens`` words with ``overlap`` carried between consecutive
    chunks (stride = chunk_tokens − overlap). Output adds chunk_id
    (0-based), chunk_text, chunk_n_tokens. Map-only: sequence+transform+
    posexplode, no shuffle."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    words = F.split(F.col(text_col), " ")
    # last start bound is size - overlap - 1, NOT size - 1: a start inside
    # the final overlap window would emit a chunk that is a strict subset
    # of the previous one — duplicated training data
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.lit(0), F.size(words) - overlap - 1),
        F.lit(stride),
    )
    chunks = F.transform(
        starts, lambda s: F.slice(words, s + 1, chunk_tokens)
    )
    return (
        df.where(F.length(text_col) > 0)
        .select(
            "*",
            F.posexplode(chunks).alias("chunk_id", "_chunk_words"),
        )
        .withColumn("chunk_text", F.array_join("_chunk_words", " "))
        .withColumn("chunk_n_tokens", F.size("_chunk_words"))
        .drop("_chunk_words")
    )


def _shingle_hash_rows(
    df: DataFrame, text_col: str, n: int, keep: list[str]
) -> DataFrame:
    """(keep..., h) — exploded md5 hashes of the document's word
    n-grams. The word array is materialized in its own projection first
    (dedup._gram_array contract: higher-order lambdas re-evaluate
    captured expressions, so split(text) must never be passed inline);
    documents shorter than n words contribute no rows."""
    from witdb_spark.pipeline.dedup import _gram_array

    step1 = df.select(*keep, F.split(F.col(text_col), " ").alias("__ws"))
    grams = F.transform(_gram_array(F.col("__ws"), n), F.md5)
    return step1.where(F.size("__ws") >= n).select(
        *keep, F.explode(grams).alias("h")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    ngram: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every document sharing ANY word ``ngram``-gram with the
    benchmark corpus (the GPT-3/C4-style n-gram decontamination;
    train-test overlap is removed from TRAIN). One shuffle on shingle
    hash; the benchmark side is normally tiny and broadcasts."""
    doc_sh = _shingle_hash_rows(docs, text_col, ngram, [id_col])
    bench_sh = _shingle_hash_rows(benchmark, text_col, ngram, []).distinct()
    contaminated = doc_sh.join(bench_sh, "h", "semi").select(id_col).distinct()
    return docs.join(contaminated, id_col, "anti")


PII_RULES: list[tuple[str, str, str]] = [
    # (name, RE2/Java-compatible pattern, replacement token)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace email / IPv4 / phone spans with redaction tokens
    (regexp_replace chain, map-only; the pattern subset is RE2- and
    Java-regex-compatible so the oracle replays it verbatim)."""
    col = F.col(text_col)
    for _, pat, token in PII_RULES:
        col = F.regexp_replace(col, pat, token)
    return df.withColumn(f"{text_col}_scrubbed", col)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    target_per_stratum: int,
) -> DataFrame:
    """Deterministic per-stratum downsample to ~``target_per_stratum``
    rows: keep a row iff its md5-hash bucket falls under the stratum's
    computed fraction (same hash-threshold device as the TABLESAMPLE
    query — reproducible across engines and runs, no RNG). One tiny
    count aggregate broadcasts back; the filter itself is map-only."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    frac = F.least(
        F.lit(1.0), F.lit(float(target_per_stratum)) / F.col("_n")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 10000
    )
    return (
        df.join(F.broadcast(counts.withColumn("_frac", frac)), strata_col)
        .where(bucket < F.col("_frac") * 10000)
        .drop("_n", "_frac")
    )


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    target_total: int,
) -> DataFrame:
    """Temperature-based source mixing (the multilingual/domain-balance
    sampler of mBERT/XLM-R — public methodology): per-source quotas
    proportional to n_s^alpha with alpha = 0.5, so small sources are
    UP-weighted relative to their share and head sources are capped.
    Returns the per-source mixing report: size, weight, integer quota,
    and how many documents the deterministic md5-bucket filter actually
    kept (the same hash-threshold device as ``stratified_sample`` — no
    RNG, reproducible across engines and runs).

    Determinism: sqrt is correctly rounded in IEEE 754 (identical in any
    engine); the weight is floored to integer parts-per-million and the
    quota computed with INTEGER division, so no cross-engine float
    summation ever happens. The final keep fraction is one IEEE division.

    Scale shape: one partial-agg shuffle for the source counts, one
    broadcast of the ~|sources| quota table, one map-only filter, one
    partial-agg count — the corpus is never shuffled."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    a6 = F.floor(F.sqrt(F.col("_n").cast("double")) * F.lit(1000000.0)).cast(
        "bigint"
    )
    weighted = counts.withColumn("weight_ppm", a6)
    total = weighted.agg(F.sum("weight_ppm").alias("_t"))
    quota = weighted.crossJoin(F.broadcast(total)).withColumn(
        "quota", F.expr(f"({int(target_total)} * weight_ppm) div _t")
    )
    frac = F.least(
        F.lit(1.0), F.col("quota").cast("double") / F.col("_n")
    )
    quota = quota.withColumn("_frac", frac)
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 10000
    )
    sampled = (
        df.join(F.broadcast(quota), strata_col)
        .where(bucket < F.col("_frac") * 10000)
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return (
        quota.join(sampled, strata_col, "left")
        .select(
            strata_col,
            F.col("_n").alias("n_docs"),
            "weight_ppm",
            "quota",
            F.coalesce(F.col("n_sampled"), F.lit(0)).cast("bigint").alias(
                "n_sampled"
            ),
        )
    )


# Above this benchmark count the inline-literal expression plan stops
# scaling (each vector is its own higher-order fold in ONE projection —
# codegen falls back to interpreted mode and driver planning grows
# linearly), so the scorer switches to a broadcast-matrix mapInPandas.
_INLINE_BENCH_MAX = 64


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Embedding-space decontamination: drop corpus rows whose cosine
    against ANY benchmark vector reaches ``threshold`` — the semantic
    complement of the n-gram `decontaminate` (paraphrased benchmark
    leakage survives word-level shingles). Output keeps the surviving
    rows plus their max benchmark cosine. Rows whose cosine is undefined
    (NULL/zero-norm embedding) cannot match any benchmark vector and
    SURVIVE with a NULL score.

    Scale shape: the benchmark side is collected once to the driver;
    the scoring pass over the corpus is a PURE MAP STAGE either way —
    zero shuffle, corpus read exactly once. Up to _INLINE_BENCH_MAX
    benchmark vectors the scores are inline-literal JVM folds (no
    Python); above that the benchmark becomes ONE broadcast numpy
    matrix and each Arrow batch is scored with a single matmul in
    mapInPandas (plan size constant in the benchmark count)."""
    from witdb_spark.pipeline.similarity import (
        _DOT,
        _vec_literal,
        dot_expr,
    )

    import math

    bench = [row[0] for row in benchmark.select(vec_col).collect()]
    if not bench:
        return corpus.withColumn("max_bench_cosine", F.lit(None).cast("double"))
    if len(bench) > _INLINE_BENCH_MAX:
        scored = _score_bench_matmul(corpus, bench, vec_col)
    else:
        # zero-norm/NULL corpus rows: NULL denominator -> NULL score
        # (never a divide-by-zero error under ANSI mode)
        vn = F.nullif(F.sqrt(dot_expr(vec_col, vec_col)), F.lit(0.0))
        scores = []
        for vec in bench:
            arr = _vec_literal(vec)
            # benchmark norms are constants: precompute driver-side instead
            # of re-folding the literal self-dot per corpus row (Catalyst
            # cannot constant-fold higher-order aggregate() expressions)
            bn = math.sqrt(sum(float(x) * float(x) for x in vec))
            scores.append(
                F.round(
                    F.expr(_DOT.format(a=vec_col, b=arr)) / (vn * F.lit(bn)), 6
                )
            )
        max_cos = F.greatest(*scores) if len(scores) > 1 else scores[0]
        scored = corpus.withColumn("max_bench_cosine", max_cos)
    # NULL-score rows survive: an undefined cosine is "no match", not
    # "contaminated" (NULL < threshold would silently drop them)
    return scored.where(
        (F.col("max_bench_cosine") < threshold)
        | F.col("max_bench_cosine").isNull()
    )


def _score_bench_matmul(
    corpus: DataFrame, bench: list, vec_col: str
) -> DataFrame:
    """Score max-benchmark-cosine with one BLAS matmul per Arrow batch:
    the benchmark matrix rides a broadcast variable (sent to each
    executor once, not per task), rows-normalized driver-side. Still a
    pure map stage — mapInPandas adds no shuffle."""
    import numpy as np
    from pyspark.sql.types import DoubleType, StructField, StructType

    spark = corpus.sparkSession
    mat = np.asarray([np.asarray(v, dtype=np.float64) for v in bench])
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = np.nan  # zero-norm benchmark rows never match
    bcast = spark.sparkContext.broadcast(mat / norms)

    out_schema = StructType(
        [*corpus.schema.fields, StructField("max_bench_cosine", DoubleType())]
    )

    def score(batches):
        bm = bcast.value  # (B, D) row-normalized
        for pdf in batches:
            vecs = pdf[vec_col]
            n = len(pdf)
            best = np.full(n, np.nan)
            ok = vecs.map(
                lambda v: v is not None and len(v) == bm.shape[1]
            ).to_numpy(dtype=bool)
            if ok.any():
                m = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in vecs[ok]]
                )
                vnorm = np.linalg.norm(m, axis=1)
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = (m @ bm.T) / vnorm[:, None]
                    allnan = np.isnan(cos).all(axis=1)
                    mx = np.where(
                        allnan, np.nan, np.nanmax(np.where(allnan[:, None], -np.inf, cos), axis=1)
                    )
                best[ok] = np.round(mx, 6)
            pdf = pdf.copy()
            # NaN must become SQL NULL (Spark's DOUBLE NaN is NOT null and
            # would be dropped by the < threshold filter)
            pdf["max_bench_cosine"] = [
                None if np.isnan(x) else float(x) for x in best
            ]
            yield pdf

    return corpus.mapInPandas(score, schema=out_schema)
