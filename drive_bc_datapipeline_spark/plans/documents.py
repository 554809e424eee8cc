"""Document plans (SURVEY §2 F, H): LLM-training-data dedup + text
analysis over the ``documents`` table.

All hash-bearing operators use md5 over strings so the DuckDB oracle
computes bit-identical values; the hot path stays JVM-side (builtin
``md5``/``split``/``transform`` column functions — no Python UDFs).

Scale notes (100 TB of documents):
- exact dedup: one shuffle on the 128-bit content hash; group sizes
  are the duplicate multiplicity → near-uniform.
- n-gram Jaccard: blocked on *rare* shingles (document frequency cap)
  so the candidate join fans out per rare-shingle bucket rather than
  all-pairs; verification joins touch only candidate pairs.
- minhash-LSH (see below): signature is map-side O(n·k); the only
  shuffles are the banding join and candidate verification.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drive_bc_datapipeline_spark.plans.registry import query, t

# --------------------------------------------------------------------------
# F1 — exact dedup via content hash.
# --------------------------------------------------------------------------

DEDUP_EXACT_ORACLE = """
SELECT md5(text) AS text_hash,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
"""


@query("dedup_exact", DEDUP_EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.md5(F.col("text").cast("binary")).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --------------------------------------------------------------------------
# Shared shingling helpers (portable semantics: Spark transform/sequence
# ↔ DuckDB list_transform/generate_series, both 1-based substrings).
# --------------------------------------------------------------------------


def word_ngrams(df: DataFrame, n: int) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams, computed JVM-side."""
    tokens = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(tokens) - n, F.lit(-1))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return (
        df.select("doc_id", F.explode(grams).alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )


def word_ngrams_sql(n: int) -> str:
    """DuckDB twin of :func:`word_ngrams` (distinct (doc_id, shingle))."""
    parts = " || ' ' || ".join(f"tokens[i + {j}]" for j in range(n))
    return f"""
    SELECT DISTINCT doc_id, shingle FROM (
      SELECT doc_id,
             unnest(list_transform(
                 generate_series(1, greatest(len(tokens) - {n - 1}, 0)),
                 i -> {parts}
             )) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents)
    ) WHERE shingle <> ''
    """


# --------------------------------------------------------------------------
# F3 — n-gram Jaccard near-dup pairs with rare-shingle blocking.
# Candidates = pairs sharing ≥1 shingle whose document frequency ≤ DF_CAP
# (classic similarity-join blocking: common shingles generate quadratic
# fan-out but no discriminative signal, so they are excluded from
# candidate generation — NOT from the Jaccard itself).
# --------------------------------------------------------------------------

NGRAM_N = 3
DF_CAP = 10
JACCARD_MIN = 0.2

NGRAM_JACCARD_ORACLE = f"""
WITH shingles AS ({word_ngrams_sql(NGRAM_N)}),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id
),
rare AS (
  SELECT shingle FROM shingles GROUP BY shingle HAVING COUNT(*) <= {DF_CAP}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM shingles a
  JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN rare r ON a.shingle = r.shingle
),
inter AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, COUNT(*) AS n_common
  FROM shingles a
  JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN cand c ON c.doc_id_a = a.doc_id AND c.doc_id_b = b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_id_a, i.doc_id_b,
       ROUND(CAST(i.n_common AS DOUBLE)
             / (sa.n_sh + sb.n_sh - i.n_common), 4) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_id_a
JOIN sizes sb ON sb.doc_id = i.doc_id_b
WHERE CAST(i.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_common) >= {JACCARD_MIN}
"""


@query("dedup_ngram_jaccard", NGRAM_JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    shingles = word_ngrams(d, NGRAM_N).cache()
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    rare = (
        shingles.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= DF_CAP)
        .select("shingle")
    )
    a = shingles.alias("a")
    b = shingles.alias("b")
    cand = (
        a.join(F.broadcast(rare.alias("r")), F.col("a.shingle") == F.col("r.shingle"))
        .join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b")
        )
        .distinct()
    )
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"), F.col("b.doc_id").alias("doc_id_b")
        )
        .join(cand, ["doc_id_a", "doc_id_b"])
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")
    )
    return (
        inter.join(sa, F.col("doc_id_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_id_b") == F.col("sb.doc_id"))
        .filter(jac >= JACCARD_MIN)
        .select("doc_id_a", "doc_id_b", F.round(jac, 4).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# H1 — text quality scoring (length / punctuation / stopword ratios).
# --------------------------------------------------------------------------

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")
PUNCT_RE = "[.,!?;:]"

QUALITY_ORACLE = f"""
WITH stats AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             x -> x IN {STOPWORDS!r})) AS n_stop,
         length(text) - length(regexp_replace(text, '{PUNCT_RE}', '', 'g')) AS n_punct
  FROM documents
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(CAST(n_punct AS DOUBLE) / greatest(n_chars, 1), 4) AS punct_ratio,
       ROUND(CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1), 4) AS stopword_ratio,
       ROUND(CAST(n_chars AS DOUBLE) / greatest(n_tokens, 1), 4) AS chars_per_token,
       CASE WHEN n_tokens >= 10
             AND CAST(n_stop AS DOUBLE) / greatest(n_tokens, 1) >= 0.05
            THEN 1 ELSE 0 END AS quality_ok
FROM stats
"""


@query("text_quality_score", QUALITY_ORACLE)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    tokens = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    n_tokens = F.size(tokens)
    n_chars = F.length("text")
    n_stop = F.size(F.filter(tokens, lambda x: x.isin(*STOPWORDS)))
    n_punct = n_chars - F.length(F.regexp_replace("text", PUNCT_RE, ""))
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop.cast("double") / F.greatest(n_tokens, F.lit(1))
    return d.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(n_chars.cast("double") / F.greatest(n_tokens, F.lit(1)), 4).alias(
            "chars_per_token"
        ),
        F.when((n_tokens >= 10) & (stop_ratio >= 0.05), 1)
        .otherwise(0)
        .alias("quality_ok"),
    )


# --------------------------------------------------------------------------
# H2 — marker-word language ID. Deterministic argmax with fixed
# tie-break order (marker hit counts, then priority order of languages).
# --------------------------------------------------------------------------

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "fast", "slow"),
    "de": ("data", "table", "row", "key", "merge"),
    "es": ("query", "filter", "group", "sort", "join"),
    "fr": ("window", "stream", "batch", "value", "hash"),
    "zh": ("spark", "scan", "agg", "column", "line"),
}


def _lang_score_sql(words: tuple[str, ...]) -> str:
    return f"len(list_filter(toks, x -> x IN {words!r}))"


LANG_ID_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         {_lang_score_sql(LANG_MARKERS["en"])} AS s_en,
         {_lang_score_sql(LANG_MARKERS["de"])} AS s_de,
         {_lang_score_sql(LANG_MARKERS["es"])} AS s_es,
         {_lang_score_sql(LANG_MARKERS["fr"])} AS s_fr,
         {_lang_score_sql(LANG_MARKERS["zh"])} AS s_zh
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)
)
SELECT doc_id, lang AS labeled_lang,
       CASE
         WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
         WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
         WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
         WHEN s_fr >= s_zh THEN 'fr'
         ELSE 'zh'
       END AS pred_lang
FROM scored
"""


@query("lang_id", LANG_ID_ORACLE)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    def marker_count(words: tuple[str, ...]):
        return F.size(F.filter(toks, lambda x: x.isin(*words)))

    scores = {lang: marker_count(words) for lang, words in LANG_MARKERS.items()}
    s = {k: scores[k] for k in ("en", "de", "es", "fr", "zh")}
    pred = (
        F.when(
            (s["en"] >= s["de"])
            & (s["en"] >= s["es"])
            & (s["en"] >= s["fr"])
            & (s["en"] >= s["zh"]),
            "en",
        )
        .when((s["de"] >= s["es"]) & (s["de"] >= s["fr"]) & (s["de"] >= s["zh"]), "de")
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["zh"]), "es")
        .when(s["fr"] >= s["zh"], "fr")
        .otherwise("zh")
    )
    return d.select("doc_id", F.col("lang").alias("labeled_lang"), pred.alias("pred_lang"))


# --------------------------------------------------------------------------
# H3 — token counting: whitespace + BPE-ish regex segmentation.
# --------------------------------------------------------------------------

BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

TOKEN_COUNT_ORACLE = f"""
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
         AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_RE}')) AS BIGINT) AS bpe_tokens
FROM documents
"""


@query("token_count", TOKEN_COUNT_ORACLE)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    ws = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
    bpe = F.size(F.expr(f"regexp_extract_all(text, '{BPE_RE}', 0)"))
    return d.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


# --------------------------------------------------------------------------
# H4 — document fingerprint: min-of-shingle-hashes (winnowing-lite) over
# 8-char rolling shingles. One md5 per shingle, min lexicographic hex —
# identical on both engines.
# --------------------------------------------------------------------------

FP_W = 8

FINGERPRINT_ORACLE = f"""
SELECT doc_id,
       min(md5(sh)) AS fingerprint
FROM (
  SELECT doc_id,
         unnest(list_transform(
             generate_series(1, greatest(length(text) - {FP_W - 1}, 1)),
             i -> substr(text, CAST(i AS INTEGER), {FP_W})
         )) AS sh
  FROM documents
)
GROUP BY doc_id
"""


@query("doc_fingerprint", FINGERPRINT_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("text") - (FP_W - 1), F.lit(1))),
        lambda i: F.substring(F.col("text"), i, FP_W),
    )
    return (
        d.select("doc_id", F.explode(shingles).alias("sh"))
        .groupBy("doc_id")
        .agg(F.min(F.md5(F.col("sh").cast("binary"))).alias("fingerprint"))
    )
