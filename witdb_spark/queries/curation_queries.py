"""Oracle-checked queries for the curation operators
(pipeline/curation.py): chunking, decontamination, PII scrub, stratified
sampling — the training-data steps between dedup and training."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from witdb_spark.catalog import Tables
from witdb_spark.queries.registry import register


@register(
    "curation_chunks",
    """
    WITH pre AS (
      SELECT doc_id, string_split(text, ' ') AS words
      FROM documents WHERE length(text) > 0)
    SELECT doc_id,
           CAST(s // 48 AS INT) AS chunk_id,
           array_to_string(list_slice(words, s + 1, s + 64), ' ') AS chunk_text,
           CAST(len(list_slice(words, s + 1, s + 64)) AS INT) AS chunk_n_tokens
    FROM pre, UNNEST(range(0, greatest(0, len(words) - 17) + 1, 48)) AS t(s)
    """,
    doc="Document chunking for model windows (pipeline/curation.py "
    "chunk_documents): 64-word chunks with 16-word overlap (stride 48), "
    "map-only sequence+transform+posexplode — the step that turns a "
    "deduped corpus into training windows. Oracle replays the slicing "
    "with DuckDB list functions.",
    tags=("pipeline", "curation", "chunk"),
)
def curation_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.pipeline.curation import chunk_documents

    t = Tables(spark, sf_dir)
    return chunk_documents(
        t.documents, chunk_tokens=64, overlap=16
    ).select("doc_id", "chunk_id", "chunk_text", "chunk_n_tokens")


@register(
    "curation_decontaminated",
    """
    WITH words AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
    doc_sh AS (
      SELECT doc_id, md5(array_to_string(list_slice(w, i, i + 7), ' ')) AS h
      FROM words, UNNEST(range(1, greatest(0, len(w) - 7) + 1)) AS t(i)
      WHERE source <> 'src0'),
    bench_sh AS (
      SELECT DISTINCT md5(array_to_string(list_slice(w, i, i + 7), ' ')) AS h
      FROM words, UNNEST(range(1, greatest(0, len(w) - 7) + 1)) AS t(i)
      WHERE source = 'src0'),
    dirty AS (
      SELECT DISTINCT doc_id FROM doc_sh JOIN bench_sh USING (h))
    SELECT d.source, COUNT(*) AS n_clean, CAST(SUM(d.doc_id) AS BIGINT) AS id_sum
    FROM documents d
    WHERE d.source <> 'src0' AND d.doc_id NOT IN (SELECT doc_id FROM dirty)
    GROUP BY d.source
    """,
    doc="Benchmark decontamination (pipeline/curation.py decontaminate — "
    "the GPT-3/C4-style n-gram overlap removal): drop every training "
    "document sharing any word 8-gram with the benchmark corpus (source "
    "src0 plays the benchmark). One shuffle on shingle md5; the benchmark "
    "side broadcasts. Oracle replays shingling + the semi/anti joins.",
    tags=("pipeline", "curation", "dedup"),
)
def curation_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.pipeline.curation import decontaminate

    t = Tables(spark, sf_dir)
    docs = t.documents
    clean = decontaminate(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
        ngram=8,
    )
    return clean.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_clean"),
        F.sum("doc_id").alias("id_sum"),
    )


@register(
    "curation_pii_scrub",
    """
    WITH synth AS (
      SELECT doc_id,
             'mail user' || CAST(doc_id AS VARCHAR) ||
             '@test-site.org call 555-867-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
             ' from 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.7 ' ||
             substr(text, 1, 40) AS s
      FROM documents WHERE doc_id < 200)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(s,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '<IP>', 'g'),
             '\\+?[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed
    FROM synth
    """,
    doc="PII scrubbing (pipeline/curation.py pii_scrub): email / IPv4 / "
    "phone spans replaced with redaction tokens via a map-only "
    "regexp_replace chain; patterns restricted to the RE2-and-Java-"
    "compatible subset so DuckDB replays them verbatim (synthetic PII "
    "injected deterministically — the corpus itself has none).",
    tags=("pipeline", "curation", "pii"),
)
def curation_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.pipeline.curation import pii_scrub

    t = Tables(spark, sf_dir)
    synth = t.documents.where(F.col("doc_id") < 200).select(
        "doc_id",
        F.concat(
            F.lit("mail user"), F.col("doc_id").cast("string"),
            F.lit("@test-site.org call 555-867-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 192.168."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 "), F.substring("text", 1, 40),
        ).alias("text"),
    )
    return pii_scrub(synth).select(
        "doc_id", F.col("text_scrubbed").alias("scrubbed")
    )


@register(
    "curation_stratified_sample",
    """
    WITH counted AS (
      SELECT doc_id, source,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents)
    SELECT source, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM counted
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10000
          < least(1.0, 15.0 / n) * 10000
    GROUP BY source
    """,
    doc="Stratified source downsampling (pipeline/curation.py "
    "stratified_sample): cap every source at ~15 docs via the "
    "deterministic md5-bucket threshold (no RNG — reproducible across "
    "engines, runs, and retries; the mixture-rebalancing step of a "
    "training pipeline). Map-only after a broadcast of per-source "
    "fractions.",
    tags=("pipeline", "curation", "sampling"),
)
def curation_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.pipeline.curation import stratified_sample

    t = Tables(spark, sf_dir)
    kept = stratified_sample(t.documents, "source", "doc_id", 15)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("id_sum"),
    )


from witdb_spark.queries.pipeline_queries import _dot_sql, _norm_sql  # noqa: E402


@register(
    "curation_semantic_decontaminated",
    f"""
    WITH b AS (SELECT embedding AS be, {_norm_sql('embedding')} AS bn
               FROM embeddings WHERE vec_id % 97 = 0),
    c AS (SELECT vec_id, embedding AS ce, {_norm_sql('embedding')} AS cn
          FROM embeddings WHERE vec_id % 97 <> 0),
    scored AS (
      SELECT c.vec_id,
             max(round({_dot_sql('c.ce', 'b.be')} / (c.cn * b.bn), 6))
               AS max_bench_cosine
      FROM c, b GROUP BY c.vec_id)
    SELECT vec_id, max_bench_cosine
    FROM scored WHERE max_bench_cosine < 0.35
    """,
    doc="Embedding-space benchmark decontamination (pipeline/curation.py "
    "semantic_decontaminate): drop corpus vectors whose cosine against "
    "ANY benchmark vector reaches the threshold — the semantic "
    "complement of the n-gram decontamination (paraphrased leakage "
    "survives word shingles). Spark scores in a ZERO-SHUFFLE pure map "
    "stage (benchmark vectors inlined as array literals, the same fold "
    "as IVF cell assignment); the oracle recomputes with a cross join + "
    "max in DuckDB.",
    tags=("pipeline", "curation", "similarity"),
)
def curation_semantic_decontaminated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from witdb_spark.pipeline.curation import semantic_decontaminate

    emb = Tables(spark, sf_dir).embeddings
    corpus = emb.where(F.col("vec_id") % 97 != 0)
    bench = emb.where(F.col("vec_id") % 97 == 0)
    return semantic_decontaminate(
        corpus, bench, threshold=0.35
    ).select("vec_id", "max_bench_cosine")


@register(
    "curation_temperature_mix",
    """
    WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    w AS (SELECT source, n,
            CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT)
              AS weight_ppm
          FROM c),
    t AS (SELECT SUM(weight_ppm) AS t FROM w),
    q AS (SELECT w.source, w.n, w.weight_ppm,
            CAST((200 * w.weight_ppm) // t.t AS BIGINT) AS quota
          FROM w CROSS JOIN t),
    s AS (SELECT d.source, COUNT(*) AS n_sampled
          FROM documents d JOIN q ON q.source = d.source
          WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                     AS BIGINT) % 10000
                < LEAST(1.0, CAST(q.quota AS DOUBLE) / q.n) * 10000
          GROUP BY d.source)
    SELECT q.source, CAST(q.n AS BIGINT) AS n_docs, q.weight_ppm, q.quota,
           CAST(COALESCE(s.n_sampled, 0) AS BIGINT) AS n_sampled
    FROM q LEFT JOIN s ON s.source = q.source
    """,
    doc="Temperature-based source mixing (pipeline/curation.py "
    "temperature_mix): per-source quotas proportional to sqrt(n_s) — the "
    "mBERT/XLM-R domain-balance sampler — with integer parts-per-million "
    "weights and integer quota division so no cross-engine float "
    "summation exists; documents selected by the deterministic "
    "md5-bucket threshold. One tiny agg + broadcast; corpus never "
    "shuffled.",
    tags=("pipeline", "curation", "sampling"),
)
def curation_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.pipeline.curation import temperature_mix

    return temperature_mix(
        Tables(spark, sf_dir).documents, "source", "doc_id", 200
    )
