"""Registry entries for the LLM-data-pipeline operators (dedup, similarity,
text analysis, multimodal) — each Spark pipeline paired with a DuckDB oracle
that spells the identical algorithm in portable SQL. All hashing is md5 so
both engines (and the mapInPandas python path) agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from witdb_spark.catalog import Tables
from witdb_spark.pipeline import dedup, multimodal, similarity, text
from witdb_spark.queries.registry import register

# ---------------------------------------------------------------- dedup ----

_MINHASH_SIG_SQL = ",\n    ".join(
    f"MIN(substr(md5(shingle) || md5('x:' || shingle), {4 * j + 1}, 4)) AS m{j}"
    for j in range(dedup.NUM_PERM)
)
_MINHASH_BANDS_SQL = "\n  UNION ALL ".join(
    "SELECT doc_id, {b} AS band_id, md5(m{i0}||m{i1}||m{i2}||m{i3}) AS band_hash FROM sig".format(
        b=b, i0=4 * b, i1=4 * b + 1, i2=4 * b + 2, i3=4 * b + 3
    )
    for b in range(dedup.NUM_BANDS)
)

_MINHASH_ORACLE = f"""
WITH ws AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w) - 1),
                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
    FROM ws) t
),
sig AS (
  SELECT doc_id, {_MINHASH_SIG_SQL}
  FROM sh GROUP BY doc_id
),
bands AS (
  {_MINHASH_BANDS_SQL}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.a_id, p.b_id, COUNT(*) AS i
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.a_id
  JOIN sh sb ON sb.doc_id = p.b_id AND sb.shingle = sa.shingle
  GROUP BY p.a_id, p.b_id
)
SELECT a_id, b_id,
       CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
FROM inter
JOIN sizes na ON na.doc_id = a_id
JOIN sizes nb ON nb.doc_id = b_id
WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.5
"""


@register(
    "dedup_exact",
    """
    SELECT md5(lower(trim(text))) AS fp,
           MIN(doc_id) AS canonical_doc,
           COUNT(*) AS group_size
    FROM documents
    GROUP BY md5(lower(trim(text)))
    """,
    doc="Exact dedup: hash-groupBy on the normalized digest — one shuffle on "
    "a 128-bit key at any scale.",
    tags=("pipeline", "dedup"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_duplicates(Tables(spark, sf_dir).documents)


@register(
    "dedup_minhash",
    _MINHASH_ORACLE,
    doc="MinHash+LSH near-dup detection: word-3-shingles -> 16 md5 min-hashes "
    "-> 4 band keys -> band-join candidates -> exact Jaccard verify. The "
    "band join keeps candidate generation near-linear; only candidates pay "
    "the pairwise verify.",
    tags=("pipeline", "dedup", "bench"),
)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_near_duplicates(
        Tables(spark, sf_dir).documents, threshold=0.5
    )


_SIMHASH_W_SQL = ",\n      ".join(
    f"SUM(CASE WHEN (h >> {k}) & 1 = 1 THEN 1 ELSE -1 END) AS w{k}"
    for k in range(32)
)
_SIMHASH_BITS_SQL = " + ".join(
    f"(CASE WHEN w{k} > 0 THEN CAST({1 << k} AS BIGINT) ELSE 0 END)"
    for k in range(32)
)


@register(
    "dedup_simhash",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    th AS (
      SELECT doc_id, CAST(('0x' || substr(md5(word), 1, 8)) AS BIGINT) AS h FROM tok
    ),
    wsum AS (
      SELECT doc_id,
      {_SIMHASH_W_SQL}
      FROM th GROUP BY doc_id
    ),
    sig AS (
      SELECT doc_id, CAST({_SIMHASH_BITS_SQL} AS BIGINT) AS simhash FROM wsum
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    doc="SimHash near-dup pairs: 32-bit sign-of-weighted-bits fingerprint, "
    "Hamming<=3, EXACT byte-chunk band join (pigeonhole: <=3 differing "
    "bits over 4 chunks leaves one chunk identical) — the pair space "
    "shrinks ~256x per chunk with zero recall loss. Oracle uses the "
    "direct pairwise formulation: banding is lossless, so results are "
    "identical.",
    tags=("pipeline", "dedup"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_near_duplicates(
        Tables(spark, sf_dir).documents, max_hamming=3
    )


@register(
    "dedup_ngram_jaccard",
    """
    WITH ws AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    tok AS (
      SELECT DISTINCT doc_id, source, word FROM (
        SELECT doc_id, source, unnest(w) AS word FROM ws) t
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS i
      FROM tok a JOIN tok b
        ON a.word = b.word AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT a_id, b_id,
           CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes na ON na.doc_id = a_id
    JOIN sizes nb ON nb.doc_id = b_id
    WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.9
    """,
    doc="Word-set Jaccard near-dups within each source partition: the "
    "blocking key (source) bounds the pair space — the grouping-key analog "
    "of LSH banding.",
    tags=("pipeline", "dedup"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    t = Tables(spark, sf_dir)
    tok = (
        t.documents.select(
            "doc_id", "source", F.explode(F.split("text", " ")).alias("word")
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)  # feeds candidates + verify
    )
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # Direct inverted-index join: on this corpus the qualifying pairs are
    # dense (templated docs), so prefix filtering
    # (dedup.jaccard_prefix_candidates — exact, measured here) prunes
    # nothing and just adds stages; it becomes the right plan when the
    # vocabulary is large and near-dups are sparse.
    a = tok.select(F.col("doc_id").alias("a_id"), "source", "word")
    b = tok.select(
        F.col("doc_id").alias("b_id"),
        F.col("source").alias("source_b"),
        F.col("word").alias("word_b"),
    )
    inter = (
        a.join(
            b,
            (F.col("word") == F.col("word_b"))
            & (F.col("source") == F.col("source_b"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    na = sizes.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb"))
    jac = F.col("i").cast("double") / (
        F.col("na") + F.col("nb") - F.col("i")
    ).cast("double")
    return (
        inter.join(na, "a_id")
        .join(nb, "b_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= 0.9)
        .select("a_id", "b_id", "jaccard")
    )


# ----------------------------------------------------------- similarity ----

# Sequential left-to-right double fold — DuckDB list_reduce mirrors Spark's
# aggregate() element order, so dot products are bit-identical (see
# pipeline/similarity.py _DOT).
def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
        "(x, y) -> x + y)"
    )


def _norm_sql(a: str) -> str:
    return f"sqrt({_dot_sql(a, a)})"


@register(
    "similarity_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe,
                      {_norm_sql('embedding')} AS qnorm
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS match_id, embedding AS ce,
                 {_norm_sql('embedding')} AS cnorm
          FROM embeddings),
    scored AS (
      SELECT q.query_id, c.match_id,
             round({_dot_sql('q.qe', 'c.ce')} / (q.qnorm * c.cnorm), 6) AS cosine
      FROM q, c
    )
    SELECT query_id, match_id, cosine, CAST(rn AS INT) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, match_id) AS rn
          FROM scored) r
    WHERE rn <= 10
    """,
    doc="Brute-force cosine top-10 for 5 query vectors: JVM zip_with/"
    "aggregate dot products (decimal-exact), broadcast query side, "
    "WindowGroupLimit top-k per query — the exact baseline an ANN index "
    "is measured against.",
    tags=("pipeline", "similarity", "bench"),
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    emb = t.embeddings
    return similarity.brute_force_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=10
    )


def _lsh_bucket_sql(num_planes: int, dim: int = 64, vec: str = "embedding") -> str:
    """DuckDB twin of similarity.lsh_buckets: identical md5-derived plane
    weights inlined as literals, identical sequential fold per plane."""
    terms = []
    for p, ws in enumerate(similarity.plane_weights(num_planes, dim)):
        lit = "CAST([" + ", ".join(str(w) for w in ws) + "] AS DOUBLE[])"
        terms.append(
            f"CASE WHEN {_dot_sql(vec, lit)} > 0 THEN {1 << p} ELSE 0 END"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


@register(
    "similarity_lsh_buckets",
    f"""
    SELECT vec_id, {_lsh_bucket_sql(8)} AS bucket FROM embeddings
    """,
    doc="Random-hyperplane LSH bucket assignment (8 planes, md5-derived "
    "weights inlined as array literals): the scale path for ANN — candidate "
    "search within a bucket is N/256 of the corpus. Bucketing is a pure map "
    "stage (per-row zip_with/aggregate folds, no explode, no join, no "
    "shuffle); the oracle folds the identical literals in DuckDB.",
    tags=("pipeline", "similarity"),
)
def similarity_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_buckets(Tables(spark, sf_dir).embeddings)


@register(
    "embedding_near_dup",
    f"""
    WITH buckets AS (
      SELECT vec_id, {_lsh_bucket_sql(4)} AS bucket FROM embeddings
    ),
    v AS (
      SELECT e.vec_id, e.embedding AS ev, b.bucket,
             {_norm_sql('e.embedding')} AS nrm
      FROM embeddings e JOIN buckets b USING (vec_id)
    ),
    scored AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             round({_dot_sql('a.ev', 'b.ev')} / (a.nrm * b.nrm), 6) AS cosine
      FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT a_id, b_id, cosine FROM scored WHERE cosine >= 0.2
    """,
    doc="Embedding-cosine near-duplicate pairs (cosine >= 0.2; synthetic "
    "embeddings are near-orthogonal, so the demo threshold is low), "
    "LSH-bucket-pruned: only same-bucket pairs (4 md5-derived hyperplanes, "
    "16 buckets) are scored, shrinking the pair join from O(n^2) to "
    "~n^2/16 — measured 20x faster at sf0.1 than exact pairwise. The "
    "oracle reproduces the identical buckets and scoring in DuckDB.",
    tags=("pipeline", "dedup", "similarity", "lsh"),
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # num_planes pinned to 4 to match the static oracle SQL; the API
    # default derives the plane count from corpus size (see
    # similarity.embedding_near_duplicates)
    return similarity.embedding_near_duplicates(
        Tables(spark, sf_dir).embeddings, threshold=0.2, num_planes=4
    )


# ------------------------------------------------------------------ text ----


@register(
    "text_quality",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS type_token_ratio,
           CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
             / len(string_split(text, ' ')) AS avg_word_len,
           CAST(len(list_filter(string_split(text, ' '),
                    x -> x = 'the' OR x = 'a')) AS DOUBLE)
             / len(string_split(text, ' ')) AS stopword_ratio,
           CAST(length(text) // 4 + len(string_split(text, ' ')) AS BIGINT) AS est_tokens
    FROM documents
    """,
    doc="Per-document quality signals (token counts, type-token ratio, avg "
    "word length, stopword ratio, BPE-ish token estimate) — pure JVM column "
    "expressions inside whole-stage codegen.",
    tags=("pipeline", "text"),
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.quality_metrics(Tables(spark, sf_dir).documents)


_LANGID_SCORES_SQL = {
    lang: "len(list_filter(string_split(text, ' '), x -> "
    + " OR ".join(f"x = '{m}'" for m in markers)
    + "))"
    for lang, markers in text.LANG_MARKERS.items()
}
_LANGID_KEYS_SQL = ", ".join(
    f"lpad(CAST(100000 - {_LANGID_SCORES_SQL[lang]} AS VARCHAR), 6, '0') || '{lang}'"
    for lang in sorted(text.LANG_MARKERS)
)


@register(
    "text_langid",
    f"""
    SELECT doc_id,
           {", ".join(f"CAST({_LANGID_SCORES_SQL[lang]} AS BIGINT) AS score_{lang}" for lang in sorted(text.LANG_MARKERS))},
           substr(least({_LANGID_KEYS_SQL}), 7, 2) AS predicted_lang
    FROM documents
    """,
    doc="Heuristic language ID: marker-word hit counts per language, argmax "
    "via LEAST over zero-padded inverted-score keys (deterministic "
    "tie-break, portable to any engine).",
    tags=("pipeline", "text"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.langid_scores(Tables(spark, sf_dir).documents)


@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           md5(lower(trim(text))) AS fp_md5,
           CAST(('0x' || substr(md5(lower(trim(text))), 1, 15)) AS BIGINT) AS fp_int
    FROM documents
    """,
    doc="Document fingerprinting: md5 digest + 60-bit integer prefix "
    "(positive in both engines' signed BIGINT).",
    tags=("pipeline", "text"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.fingerprint(Tables(spark, sf_dir).documents)


# ------------------------------------------------------------ multimodal ----


@register(
    "multimodal_metadata",
    """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS byte_len,
           CAST(1 + (CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 1024) AS INT) AS width,
           CAST(1 + ((CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) >> 10) % 1024) AS INT) AS height,
           CAST(3 AS INT) AS channels
    FROM documents
    """,
    doc="Multimodal metadata extraction through the real Arrow/mapInPandas "
    "path: binary payload column -> pandas batches -> typed metadata "
    "schema. Decode is stubbed (no codecs in container); the deterministic "
    "fake derives dims from md5 so the oracle verifies the full distributed "
    "plumbing.",
    tags=("pipeline", "multimodal"),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.as_media(Tables(spark, sf_dir).documents)
    return multimodal.extract_media_metadata(media, fake=True)


@register(
    "multimodal_frame_sample",
    """
    SELECT doc_id, CAST(frame_no AS INT) AS frame_no
    FROM (
      SELECT doc_id,
             unnest(range(0, CAST(strlen(text) // 100 AS INT) + 1, 10)) AS frame_no
      FROM documents) t
    """,
    doc="Frame-sampling plumbing for video-like payloads: sequence+explode "
    "of sampled frame indices (decode of each frame would be another "
    "mapInPandas stage).",
    tags=("pipeline", "multimodal"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.as_media(Tables(spark, sf_dir).documents)
    return multimodal.frame_sample_plan(media, every_n=10).select(
        "doc_id", F.col("frame_no").cast("int").alias("frame_no")
    )


_IVF_ASSIGN = """
      SELECT v_id, v_vec, vn, cid FROM (
        SELECT v.v_id, v.v_vec, v.vn, c.cid,
               round({dot} / (v.vn * c.cn), 6) AS ccos,
               row_number() OVER (PARTITION BY v.v_id
                                  ORDER BY round({dot} / (v.vn * c.cn), 6) DESC,
                                           c.cid) AS crn
        FROM {side} v, cents c) t
      WHERE crn <= {probe}
"""


@register(
    "similarity_ivf_topk",
    f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cv, {_norm_sql('embedding')} AS cn
      FROM embeddings WHERE vec_id < 8),
    corpus AS (
      SELECT vec_id AS v_id, embedding AS v_vec, {_norm_sql('embedding')} AS vn
      FROM embeddings),
    queries AS (
      SELECT vec_id AS v_id, embedding AS v_vec, {_norm_sql('embedding')} AS vn
      FROM embeddings WHERE vec_id < 5),
    corpus_cells AS ({_IVF_ASSIGN.format(dot=_dot_sql('v.v_vec', 'c.cv'), side='corpus', probe=1)}),
    query_cells AS ({_IVF_ASSIGN.format(dot=_dot_sql('v.v_vec', 'c.cv'), side='queries', probe=2)}),
    scored AS (
      SELECT q.v_id AS query_id, m.v_id AS match_id,
             round({_dot_sql('q.v_vec', 'm.v_vec')} / (q.vn * m.vn), 6) AS cosine
      FROM query_cells q JOIN corpus_cells m USING (cid)
    )
    SELECT query_id, match_id, cosine, CAST(rn AS INT) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, match_id) AS rn
          FROM (SELECT DISTINCT query_id, match_id, cosine FROM scored) d) r
    WHERE rn <= 5
    """,
    doc="IVF approximate top-k (pipeline/similarity.py::ivf_topk): "
    "deterministic coarse quantizer (lowest-id vectors as centroids), "
    "corpus assigned to nearest cell via broadcast argmax, queries probe 2 "
    "of 8 cells — candidate scoring at ~1/4 brute-force cost. Same oracle "
    "algorithm in DuckDB SQL, exact hash match.",
    tags=("pipeline", "similarity", "ann"),
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Tables(spark, sf_dir).embeddings
    return similarity.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5, n_centroids=8, n_probe=2
    )


@register(
    "multimodal_features",
    """
    SELECT doc_id,
           CAST(('0x' || substr(md5(text), 1, 2)) AS INT) / 255.0 AS f0,
           CAST(('0x' || substr(md5(text), 3, 2)) AS INT) / 255.0 AS f1,
           CAST(('0x' || substr(md5(text), 5, 2)) AS INT) / 255.0 AS f2,
           CAST(('0x' || substr(md5(text), 7, 2)) AS INT) / 255.0 AS f3
    FROM documents WHERE doc_id < 500
    """,
    doc="Multimodal feature extraction (embed-the-image stage as "
    "mapInPandas over binary payloads; vision model stubbed behind "
    "NotImplementedError, fake=True double derives features from md5 "
    "bytes): the oracle recomputes the same bytes from md5 hex — the whole "
    "Arrow-batched path is value-checked, not just smoke-run.",
    tags=("pipeline", "multimodal"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents.filter(F.col("doc_id") < 500)
    return multimodal.extract_features(multimodal.as_media(docs), fake=True)


@register(
    "multimodal_resize",
    """
    SELECT doc_id,
           CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
           CAST(4096 AS BIGINT) AS byte_len
    FROM documents WHERE doc_id < 500
    """,
    doc="Multimodal resize stage (codec stubbed; fake=True double is "
    "size-correct): output payloads must be exactly width*height bytes for "
    "every row — checked via the byte_len projection.",
    tags=("pipeline", "multimodal"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Tables(spark, sf_dir).documents.filter(F.col("doc_id") < 500)
    resized = multimodal.resize_images(
        multimodal.as_media(docs), width=64, height=64, fake=True
    )
    return resized.select(
        "doc_id", "width", "height", F.length("payload").cast("bigint").alias("byte_len")
    )


@register(
    "text_repetition",
    """
    WITH p AS (
      SELECT doc_id, string_split(text, ' ') AS parts,
             len(string_split(text, ' ')) AS nw
      FROM documents),
    g AS (
      SELECT doc_id, parts, nw,
             CASE WHEN nw >= 3 THEN list_transform(range(1, nw - 1),
               i -> concat_ws(' ', parts[i], parts[i+1], parts[i+2]))
             ELSE [] END AS grams
      FROM p)
    SELECT doc_id,
           CAST(nw AS BIGINT) AS n_words,
           CASE WHEN len(grams) > 0
                THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                     / len(grams)
                ELSE 0.0 END AS dup_ngram_frac,
           CAST(list_max(list_transform(list_distinct(parts),
                 u -> len(list_filter(parts, x -> x = u)))) AS DOUBLE)
             / nw AS top_word_share
    FROM g
    """,
    doc="Within-document repetition signals (Gopher/MassiveText rule "
    "family, Rae et al. 2021 A1.1 — public methodology): duplicate "
    "word-trigram fraction and top-word share, flagging boilerplate that "
    "survives corpus-level dedup because it repeats internally. Pure JVM "
    "array folds on the Spark side (zero shuffles); DuckDB recomputes "
    "with its own list lambdas.",
    tags=("pipeline", "text"),
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.repetition_signals(Tables(spark, sf_dir).documents)


@register(
    "text_tfidf_top_terms",
    """
    WITH tokens AS (
      SELECT doc_id, w AS word, COUNT(*) AS tf
      FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
      GROUP BY doc_id, w),
    dfreq AS (SELECT word, COUNT(*) AS df_docs FROM tokens GROUP BY word),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents),
    scored AS (
      SELECT t.doc_id, t.word,
             round(t.tf * ln((n.nd + 1) / (dfreq.df_docs + 1)), 6) AS score
      FROM tokens t JOIN dfreq USING (word) CROSS JOIN n)
    SELECT doc_id, word, score, CAST(rnk AS INT) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, word) AS rnk
          FROM scored) r
    WHERE rnk <= 5
    """,
    doc="Per-document top-5 TF-IDF terms (pipeline/text.py "
    "tfidf_top_terms): smoothed idf, deterministic (rounded-score, word) "
    "ordering, WindowGroupLimit top-k. The corpus-analysis primitive for "
    "keyword extraction and domain profiling; the oracle recomputes with "
    "DuckDB's own unnest/window machinery.",
    tags=("pipeline", "text", "tfidf"),
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.tfidf_top_terms(Tables(spark, sf_dir).documents)


from witdb_spark.queries.registry import QUERIES as _REG  # noqa: E402

_MINHASH_ORACLE = _REG["dedup_minhash"].oracle


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE mh AS ({_MINHASH_ORACLE}),
    e AS (SELECT a_id, b_id FROM mh),
    nodes AS (SELECT a_id AS n FROM e UNION SELECT b_id FROM e),
    sym AS (SELECT a_id AS s, b_id AS d FROM e
            UNION SELECT b_id, a_id FROM e),
    walk(node, r) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT w.node, s2.d FROM walk w JOIN sym s2 ON s2.s = w.r)
    SELECT node AS doc_id, MIN(r) AS cluster
    FROM walk GROUP BY node
    """,
    doc="Near-duplicate CLUSTERING (pipeline/dedup.py duplicate_clusters):"
    " connected components over the MinHash near-dup pair graph via"
    " min-label propagation — A~B and B~C collapse into one cluster even"
    " when A~C scored below threshold, which is what lets a dedup"
    " pipeline keep exactly one representative per group. The oracle"
    " computes the same components with DuckDB's native WITH RECURSIVE"
    " transitive closure — fully independent machinery.",
    tags=("pipeline", "dedup", "graph"),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.pipeline.dedup import (
        duplicate_clusters,
        minhash_near_duplicates,
    )

    docs = Tables(spark, sf_dir).documents
    pairs = minhash_near_duplicates(docs)
    return duplicate_clusters(pairs)


# ------------------------------------------------------------- quality ----

@register(
    "text_gopher_quality",
    """
    WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
    m AS (SELECT doc_id,
            CAST(len(w) AS BIGINT) AS n_words,
            CAST(length(text) - len(w) + 1 AS DOUBLE) / len(w) AS mean_word_len,
            CAST(len(list_filter(w,
                x -> x IN ('the','a','value','row','fast'))) AS BIGINT)
              AS stopword_hits,
            CAST(len(list_filter(w,
                x -> NOT regexp_matches(x, '[a-z]'))) AS BIGINT)
              AS symbol_words
          FROM d)
    SELECT doc_id, n_words, mean_word_len, stopword_hits, symbol_words,
           (n_words >= 40 AND mean_word_len >= 3.5 AND mean_word_len <= 4.8
            AND stopword_hits >= 6 AND symbol_words * 5 <= n_words) AS keep
    FROM m
    """,
    doc="Gopher/MassiveText document-quality rules (pipeline/text.py "
    "gopher_quality_flags): word-count floor, mean-word-length band, "
    "symbol-word count, stopword-hit floor, and the conjunction keep "
    "flag. Pure JVM map pass, zero shuffles.",
    tags=("pipeline", "text", "quality"),
)
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.gopher_quality_flags(Tables(spark, sf_dir).documents)


@register(
    "text_bigram_logprob",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    occ AS (SELECT doc_id,
              unnest(list_transform(range(1, len(w)),
                     i -> w[i] || ' ' || w[i+1])) AS bi
            FROM d WHERE len(w) >= 2),
    doc_bi AS (SELECT doc_id, bi, COUNT(*) AS m FROM occ GROUP BY 1, 2),
    c12 AS (SELECT bi, SUM(m) AS c12 FROM doc_bi GROUP BY bi),
    pref AS (SELECT bi, c12, string_split(bi, ' ')[1] AS w1 FROM c12),
    c1 AS (SELECT w1, SUM(c12) AS c1 FROM pref GROUP BY w1),
    v AS (SELECT COUNT(*) AS v FROM c1),
    scored AS (SELECT p.bi,
                 CAST(round(ln(CAST(p.c12 + 1 AS DOUBLE)
                               / CAST(c.c1 + v.v AS DOUBLE))
                            * 1000000.0) AS BIGINT) AS micro
               FROM pref p JOIN c1 c ON c.w1 = p.w1 CROSS JOIN v)
    SELECT db.doc_id,
           CAST(SUM(db.m) AS BIGINT) AS n_bigrams,
           round(CAST(SUM(db.m * s.micro) AS DOUBLE)
                 / (CAST(SUM(db.m) AS DOUBLE) * 1000000.0), 6) AS avg_logprob
    FROM doc_bi db JOIN scored s ON s.bi = db.bi
    GROUP BY db.doc_id
    """,
    doc="CCNet-style perplexity-proxy filtering (pipeline/text.py "
    "bigram_logprob): add-one-smoothed bigram LM trained on the corpus "
    "itself, each document scored by mean bigram log-probability. "
    "Micro-nat integers keep cross-engine summation exact; explode + "
    "three partial-agg shuffles + two equi-joins, no UDFs.",
    tags=("pipeline", "text", "quality"),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.bigram_logprob(Tables(spark, sf_dir).documents)


# ------------------------------------------------------------- packing ----

@register(
    "pipeline_pack_concat",
    """
    WITH d AS (SELECT source, doc_id,
                 CAST(length(text) // 4 + len(string_split(text, ' '))
                      AS BIGINT) AS tok
               FROM documents),
    o AS (SELECT source, doc_id, tok,
            CAST(SUM(tok) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
              AS end_off
          FROM d),
    s AS (SELECT source, doc_id, tok, end_off - tok AS start_off, end_off
          FROM o),
    x AS (SELECT source, doc_id, tok, start_off, end_off,
            unnest(range(start_off // 256, (end_off - 1) // 256 + 1))
              AS chunk_id
          FROM s)
    SELECT source, CAST(chunk_id AS BIGINT) AS chunk_id,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
           CAST(SUM(LEAST(end_off, (chunk_id + 1) * 256)
                    - GREATEST(start_off, chunk_id * 256)) AS BIGINT)
             AS fill_tokens
    FROM x GROUP BY source, chunk_id
    """,
    doc="GPT-style concatenate-and-split sequence packing (pipeline/"
    "packing.py concat_chunk_pack): documents laid end-to-end per source "
    "and cut every 256 estimated tokens; per chunk the touching-document "
    "count, first/last document and fill. Window + exact integer `div` "
    "arithmetic, one shuffle on source + one partial-agg shuffle.",
    tags=("pipeline", "packing"),
)
def pipeline_pack_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.pipeline.packing import concat_chunk_pack

    return concat_chunk_pack(Tables(spark, sf_dir).documents, budget=256)


@register(
    "pipeline_pack_nextfit",
    """
    WITH RECURSIVE d AS (
      SELECT source, doc_id,
             CAST(length(text) // 4 + len(string_split(text, ' '))
                  AS BIGINT) AS tok,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents),
    st AS (
      SELECT source, rn, doc_id, tok, CAST(1 AS BIGINT) AS bin_id,
             tok AS cur
      FROM d WHERE rn = 1
      UNION ALL
      SELECT n.source, n.rn, n.doc_id, n.tok,
             CASE WHEN s.cur + n.tok > 256 THEN s.bin_id + 1
                  ELSE s.bin_id END,
             CASE WHEN s.cur + n.tok > 256 THEN n.tok
                  ELSE s.cur + n.tok END
      FROM st s JOIN d n ON n.source = s.source AND n.rn = s.rn + 1)
    SELECT source, doc_id, tok, bin_id, cur - tok AS bin_offset FROM st
    """,
    doc="Boundary-preserving next-fit bin packing (pipeline/packing.py "
    "greedy_nextfit_pack): per document its bin and in-bin token offset; "
    "a bin closes when the next document does not fit in the 256-token "
    "budget. Arrow-batched per-source pandas scan (the recurrence is the "
    "algorithm's own data dependency); the oracle replays it as a "
    "recursive CTE — fully independent machinery.",
    tags=("pipeline", "packing"),
)
def pipeline_pack_nextfit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from witdb_spark.pipeline.packing import greedy_nextfit_pack

    return greedy_nextfit_pack(Tables(spark, sf_dir).documents, budget=256)


@register(
    "dedup_passage_boilerplate",
    """
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
    ),
    c AS (
      SELECT doc_id, unnest(
        [array_to_string(words[i*2+1 : i*2+2], ' ')
         for i in range(0, CAST(ceil(len(words)/2.0) AS INT))]
      ) AS chunk
      FROM w
    ),
    n AS (
      SELECT chunk, COUNT(DISTINCT doc_id) AS nd FROM c GROUP BY chunk
    )
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN n.nd >= 10 THEN 1 ELSE 0 END)
                AS BIGINT) AS boilerplate_chunks,
           CAST(SUM(CASE WHEN n.nd < 10
                         THEN len(string_split(c.chunk, ' '))
                         ELSE 0 END) AS BIGINT) AS kept_words
    FROM c JOIN n USING (chunk)
    GROUP BY c.doc_id
    ORDER BY doc_id
    """,
    doc="Common-passage boilerplate removal (r14, pipeline/dedup.py "
    "passage_boilerplate) — the CCNet/C4-style pass LLM corpora run "
    "before training: consecutive 2-word passages that appear "
    "verbatim in >= 10 distinct documents flag as boilerplate "
    "(headers/footers/license blurbs); per-doc survival stats. ONE "
    "shuffle on the passage text; the flagging join shares the "
    "aggregation key so the exchange is reused. Hash-equal to the "
    "DuckDB list-comprehension oracle.",
    tags=("pipeline", "dedup"),
)
def dedup_passage_boilerplate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return dedup.passage_boilerplate(Tables(spark, sf_dir).documents)


def _l2_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) *"
        f" (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))), "
        "(x, y) -> x + y)"
    )


@register(
    "similarity_pq_topk",
    f"""
    WITH js AS (SELECT unnest(range(0, 4)) AS j),
    cb AS (
      SELECT vec_id AS cid, j,
             embedding[j*16+1 : j*16+16] AS cvec
      FROM embeddings, js WHERE vec_id < 8),
    corp AS (
      SELECT vec_id AS match_id, j,
             embedding[j*16+1 : j*16+16] AS svec
      FROM embeddings, js),
    codes AS (
      SELECT match_id, j, cid FROM (
        SELECT c.match_id, c.j, b.cid,
               row_number() OVER (
                 PARTITION BY c.match_id, c.j
                 ORDER BY round({_l2_sql('c.svec', 'b.cvec')}, 6), b.cid
               ) AS rn
        FROM corp c JOIN cb b USING (j)) x
      WHERE rn = 1),
    q AS (
      SELECT vec_id AS query_id, j,
             embedding[j*16+1 : j*16+16] AS qvec
      FROM embeddings, js WHERE vec_id < 5),
    adc AS (
      SELECT q.query_id, codes.match_id,
             CAST(SUM(CAST(round({_l2_sql('q.qvec', 'cb.cvec')}, 6)
                           AS DECIMAL(20,6))) AS DOUBLE) AS adc
      FROM codes
      JOIN cb ON cb.j = codes.j AND cb.cid = codes.cid
      JOIN q ON q.j = codes.j
      GROUP BY q.query_id, codes.match_id)
    SELECT query_id, match_id, adc, CAST(rn AS INT) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adc ASC, match_id) AS rn
          FROM adc) r
    WHERE rn <= 5
    """,
    doc="Product-quantization ANN (r14, pipeline/similarity.py::"
    "pq_topk — the third scale path next to LSH and IVF, the one "
    "that shrinks the CORPUS: 64-dim vectors encode to m=4 codeword "
    "ids against per-subspace codebooks of 8, and queries score via "
    "ADC table lookups — a broadcast join of the 160-entry distance "
    "table plus one decimal-sum agg; no full vectors shuffle at any "
    "scale). Deterministic codebooks (lowest-id slices), round-6 + "
    "DECIMAL(20,6) summation, lowest-codeword tie-breaks — the "
    "DuckDB oracle replays the identical algorithm, exact hash "
    "match.",
    tags=("pipeline", "similarity", "ann"),
)
def similarity_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Tables(spark, sf_dir).embeddings
    return similarity.pq_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5, m=4, ksub=8
    )


@register(
    "similarity_ivfpq_topk",
    f"""
    WITH js AS (SELECT unnest(range(0, 4)) AS j),
    cents AS (
      SELECT vec_id AS cid, embedding AS cv, {_norm_sql('embedding')} AS cn
      FROM embeddings WHERE vec_id < 8),
    corpus AS (
      SELECT vec_id AS v_id, embedding AS v_vec, {_norm_sql('embedding')} AS vn
      FROM embeddings),
    queries AS (
      SELECT vec_id AS v_id, embedding AS v_vec, {_norm_sql('embedding')} AS vn
      FROM embeddings WHERE vec_id < 5),
    corpus_cells AS ({_IVF_ASSIGN.format(dot=_dot_sql('v.v_vec', 'c.cv'), side='corpus', probe=1)}),
    query_cells AS ({_IVF_ASSIGN.format(dot=_dot_sql('v.v_vec', 'c.cv'), side='queries', probe=2)}),
    cb AS (
      SELECT vec_id AS cid, j,
             embedding[j*16+1 : j*16+16] AS cvec
      FROM embeddings, js WHERE vec_id < 8),
    corp AS (
      SELECT vec_id AS match_id, j,
             embedding[j*16+1 : j*16+16] AS svec
      FROM embeddings, js),
    codes AS (
      SELECT match_id, j, cid FROM (
        SELECT c.match_id, c.j, b.cid,
               row_number() OVER (
                 PARTITION BY c.match_id, c.j
                 ORDER BY round({_l2_sql('c.svec', 'b.cvec')}, 6), b.cid
               ) AS rn
        FROM corp c JOIN cb b USING (j)) x
      WHERE rn = 1),
    q AS (
      SELECT vec_id AS query_id, j,
             embedding[j*16+1 : j*16+16] AS qvec
      FROM embeddings, js WHERE vec_id < 5),
    cand AS (
      SELECT qc.v_id AS query_id, mc.v_id AS match_id
      FROM query_cells qc JOIN corpus_cells mc USING (cid)),
    adc AS (
      SELECT cd.query_id, cd.match_id,
             CAST(SUM(CAST(round({_l2_sql('q.qvec', 'cb.cvec')}, 6)
                           AS DECIMAL(20,6))) AS DOUBLE) AS adc
      FROM cand cd
      JOIN codes ON codes.match_id = cd.match_id
      JOIN cb ON cb.j = codes.j AND cb.cid = codes.cid
      JOIN q ON q.query_id = cd.query_id AND q.j = codes.j
      GROUP BY cd.query_id, cd.match_id)
    SELECT query_id, match_id, adc, CAST(rn AS INT) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adc ASC, match_id) AS rn
          FROM adc) r
    WHERE rn <= 5
    """,
    doc="IVF x PQ composed ANN (r15, pipeline/similarity.py::"
    "ivfpq_topk — the actual 100 TB index shape, closing the r14 "
    "VERDICT's Next #2): IVF's coarse quantizer prunes the corpus to "
    "each query's 2 probed cells of 8, THEN PQ's ADC table lookups "
    "score only the surviving candidates — standalone PQ scans "
    "everything, standalone IVF scores full-dimension vectors. "
    "Faiss IVFADC layout with by_residual=False (codes encode raw "
    "vectors, keeping the distance table cell-independent). Index "
    "build is one map stage (cell argmax + m=4 codeword argmins "
    "against inlined literals); the probe list and the 160-entry "
    "distance table both broadcast; the only exchange carries "
    "(query, match, decimal) for probed candidates. Deterministic "
    "codebooks/centroids like its parents; the DuckDB oracle "
    "replays the identical algorithm, exact hash match. Bench-tagged "
    "(r15): the composed index is the ANN scale path, so its wall/"
    "CPU/bytes track round-over-round next to the brute-force "
    "baseline (similarity_topk).",
    tags=("pipeline", "similarity", "ann", "bench"),
)
def similarity_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Tables(spark, sf_dir).embeddings
    return similarity.ivfpq_topk(
        emb, emb.filter(F.col("vec_id") < 5),
        k=5, n_centroids=8, n_probe=2, m=4, ksub=8,
    )


@register(
    "similarity_ivfpq_residual_topk",
    f"""
    WITH js AS (SELECT unnest(range(0, 4)) AS j),
    cents AS (
      SELECT vec_id AS cid, embedding AS cv, {_norm_sql('embedding')} AS cn
      FROM embeddings WHERE vec_id < 8),
    corpus AS (
      SELECT vec_id AS v_id, embedding AS v_vec, {_norm_sql('embedding')} AS vn
      FROM embeddings),
    queries AS (
      SELECT vec_id AS v_id, embedding AS v_vec, {_norm_sql('embedding')} AS vn
      FROM embeddings WHERE vec_id < 5),
    corpus_cells AS ({_IVF_ASSIGN.format(dot=_dot_sql('v.v_vec', 'c.cv'), side='corpus', probe=1)}),
    query_cells AS ({_IVF_ASSIGN.format(dot=_dot_sql('v.v_vec', 'c.cv'), side='queries', probe=2)}),
    rcb AS (
      SELECT b.vec_id - 8 AS cid, j,
             list_transform(range(j*16+1, j*16+17),
                            i -> CAST(b.embedding[i] AS DOUBLE)
                                 - CAST(c.cv[i] AS DOUBLE)) AS cvec
      FROM embeddings b JOIN cents c ON c.cid = (b.vec_id - 8) % 8, js
      WHERE b.vec_id >= 8 AND b.vec_id < 16),
    corp_res AS (
      SELECT cc.v_id AS match_id, cc.cid AS cell, j,
             list_transform(range(j*16+1, j*16+17),
                            i -> CAST(cc.v_vec[i] AS DOUBLE)
                                 - CAST(c.cv[i] AS DOUBLE)) AS svec
      FROM corpus_cells cc JOIN cents c ON c.cid = cc.cid, js),
    codes AS (
      SELECT match_id, cell, j, cid FROM (
        SELECT r.match_id, r.cell, r.j, b.cid,
               row_number() OVER (
                 PARTITION BY r.match_id, r.j
                 ORDER BY round({_l2_sql('r.svec', 'b.cvec')}, 6), b.cid
               ) AS rn
        FROM corp_res r JOIN rcb b USING (j)) x
      WHERE rn = 1),
    q_res AS (
      SELECT qc.v_id AS query_id, qc.cid AS cell, j,
             list_transform(range(j*16+1, j*16+17),
                            i -> CAST(qc.v_vec[i] AS DOUBLE)
                                 - CAST(c.cv[i] AS DOUBLE)) AS qvec
      FROM query_cells qc JOIN cents c ON c.cid = qc.cid, js),
    cand AS (
      SELECT qc.v_id AS query_id, mc.v_id AS match_id, qc.cid AS cell
      FROM query_cells qc JOIN corpus_cells mc ON qc.cid = mc.cid),
    adc AS (
      SELECT cd.query_id, cd.match_id,
             CAST(SUM(CAST(round({_l2_sql('qr.qvec', 'cb.cvec')}, 6)
                           AS DECIMAL(20,6))) AS DOUBLE) AS adc
      FROM cand cd
      JOIN codes ON codes.match_id = cd.match_id
      JOIN rcb cb ON cb.j = codes.j AND cb.cid = codes.cid
      JOIN q_res qr ON qr.query_id = cd.query_id AND qr.cell = cd.cell
                   AND qr.j = codes.j
      GROUP BY cd.query_id, cd.match_id)
    SELECT query_id, match_id, adc, CAST(rn AS INT) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adc ASC, match_id) AS rn
          FROM adc) r
    WHERE rn <= 5
    """,
    doc="IVF x PQ with RESIDUAL encoding (r15, pipeline/similarity.py"
    "::ivfpq_topk(by_residual=True) — Faiss IVFADC's default layout): "
    "codes quantize v - centroid(cell(v)) instead of the raw vector, "
    "concentrating the codebook budget on within-cell spread (the "
    "recall lever over the plain composition, same plan shape). The "
    "ADC table gains a cell dimension (8*4*8 = 256 entries/query, "
    "still broadcast) and join keys grow to (query, cell, subspace, "
    "codeword). Residual arithmetic is float->double widening + one "
    "double subtraction — IEEE-exact, so the DuckDB oracle replays "
    "it bit-for-bit; codebooks come from the assignment-free fixed "
    "pairing vec(8+i) - centroid(i%8). Hash-exact.",
    tags=("pipeline", "similarity", "ann"),
)
def similarity_ivfpq_residual_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = Tables(spark, sf_dir).embeddings
    return similarity.ivfpq_topk(
        emb, emb.filter(F.col("vec_id") < 5),
        k=5, n_centroids=8, n_probe=2, m=4, ksub=8, by_residual=True,
    )
