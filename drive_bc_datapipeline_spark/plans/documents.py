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

from functools import reduce

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
  -- candidate-driven: fan-out is |cand| x shingles-per-doc, never df^2
  SELECT c.doc_id_a, c.doc_id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN shingles a ON a.doc_id = c.doc_id_a
  JOIN shingles b ON b.doc_id = c.doc_id_b AND b.shingle = a.shingle
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
    # Candidate-driven intersection: fan-out is |cand| x shingles-per-doc,
    # never df^2 — the property that keeps this plan alive at 100 TB.
    inter = (
        cand.join(a, F.col("a.doc_id") == F.col("doc_id_a"))
        .join(
            b,
            (F.col("b.doc_id") == F.col("doc_id_b"))
            & (F.col("b.shingle") == F.col("a.shingle")),
        )
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


# --------------------------------------------------------------------------
# F2 — MinHash + LSH near-dup detection.
# Shingles: distinct word 5-grams. K=16 md5-seeded min-hashes (hex
# strings, lexicographic min — identical across engines). 4 bands x 4
# rows; candidate pairs share >=1 band; candidates are verified with
# exact Jaccard and thresholded.
#
# 100 TB path: signatures are map-side (one groupBy doc_id); the band
# join keys on (band_id, band_hash) whose cardinality grows with the
# corpus, so buckets stay small; verification touches candidates only.
# --------------------------------------------------------------------------

MH_N = 5          # shingle n-gram size
MH_K = 16         # number of minhash permutations
MH_BANDS = 4      # LSH bands (MH_K / MH_BANDS rows each)
MH_JACCARD = 0.7  # verification threshold


def _mh_cols_spark():
    return [
        F.min(F.md5(F.concat(F.lit(f"mh{i}|"), F.col("shingle")).cast("binary"))).alias(f"h{i}")
        for i in range(MH_K)
    ]


def _mh_cols_sql() -> str:
    return ",\n         ".join(
        f"min(md5('mh{i}|' || shingle)) AS h{i}" for i in range(MH_K)
    )


def _band_exprs() -> list[list[str]]:
    rows = MH_K // MH_BANDS
    return [[f"h{b * rows + r}" for r in range(rows)] for b in range(MH_BANDS)]


MINHASH_ORACLE = f"""
WITH shingles AS ({word_ngrams_sql(MH_N)}),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM shingles GROUP BY doc_id
),
sigs AS (
  SELECT doc_id,
         {_mh_cols_sql()}
  FROM shingles GROUP BY doc_id
),
bands AS (
{" UNION ALL ".join(
    f"  SELECT doc_id, {b} AS band_id, md5({' || '.join(cols)}) AS band_hash FROM sigs"
    for b, cols in enumerate(_band_exprs())
)}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
  FROM bands a
  JOIN bands b ON a.band_id = b.band_id AND a.band_hash = b.band_hash
             AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_id_a, c.doc_id_b, COUNT(*) AS n_common
  FROM cand c
  JOIN shingles a ON a.doc_id = c.doc_id_a
  JOIN shingles b ON b.doc_id = c.doc_id_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT i.doc_id_a, i.doc_id_b,
       ROUND(CAST(i.n_common AS DOUBLE)
             / (sa.n_sh + sb.n_sh - i.n_common), 4) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_id_a
JOIN sizes sb ON sb.doc_id = i.doc_id_b
WHERE CAST(i.n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - i.n_common) >= {MH_JACCARD}
"""


@query("dedup_minhash_lsh", MINHASH_ORACLE)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    shingles = word_ngrams(d, MH_N).cache()
    sizes = shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sigs = shingles.groupBy("doc_id").agg(*_mh_cols_spark())
    band_frames = []
    for b, cols in enumerate(_band_exprs()):
        band_frames.append(
            sigs.select(
                "doc_id",
                F.lit(b).alias("band_id"),
                F.md5(F.concat(*[F.col(c) for c in cols]).cast("binary")).alias(
                    "band_hash"
                ),
            )
        )
    bands = band_frames[0]
    for bf in band_frames[1:]:
        bands = bands.unionByName(bf)
    ba, bb = bands.alias("ba"), bands.alias("bb")
    cand = (
        ba.join(
            bb,
            (F.col("ba.band_id") == F.col("bb.band_id"))
            & (F.col("ba.band_hash") == F.col("bb.band_hash"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(
            F.col("ba.doc_id").alias("doc_id_a"),
            F.col("bb.doc_id").alias("doc_id_b"),
        )
        .distinct()
    )
    a, b_ = shingles.alias("a"), shingles.alias("b")
    inter = (
        cand.join(a, F.col("a.doc_id") == F.col("doc_id_a"))
        .join(
            b_,
            (F.col("b.doc_id") == F.col("doc_id_b"))
            & (F.col("b.shingle") == F.col("a.shingle")),
        )
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa, sb = sizes.alias("sa"), sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")
    )
    return (
        inter.join(sa, F.col("doc_id_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_id_b") == F.col("sb.doc_id"))
        .filter(jac >= MH_JACCARD)
        .select("doc_id_a", "doc_id_b", F.round(jac, 4).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# F4 — SimHash near-dup detection (16-bit; weighted by token frequency).
# Token hash = first 4 hex chars of md5, decoded with a portable
# instr-based hex parse (identical SQL fragment runs on both engines).
# Candidates: pigeonhole on 4-bit chunks (hamming <= 3 implies >=1 of
# the 4 chunks is equal), then exact hamming filter via xor+bit_count.
# --------------------------------------------------------------------------

SH_BITS = 16
SH_HAMMING_MAX = 3

# Portable hex16 parser: works verbatim in Spark SQL and DuckDB.
_HEX16 = (
    "((instr('0123456789abcdef', substr(md5(token), 1, 1)) - 1) * 4096"
    " + (instr('0123456789abcdef', substr(md5(token), 2, 1)) - 1) * 256"
    " + (instr('0123456789abcdef', substr(md5(token), 3, 1)) - 1) * 16"
    " + (instr('0123456789abcdef', substr(md5(token), 4, 1)) - 1))"
)


def _simhash_agg_sql() -> str:
    """SUM of +/-cnt per bit, folded into a 16-bit integer."""
    bits = []
    for j in range(SH_BITS):
        bit = f"(CAST(floor(h16 / {float(2 ** j)}) AS INTEGER) % 2)"
        bits.append(
            f"(CASE WHEN SUM(cnt * (2 * {bit} - 1)) > 0 THEN {1 << j} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(bits) + " AS INTEGER)"


_SIMHASH_DOCS_SQL = f"""
  SELECT doc_id, {_simhash_agg_sql()} AS simhash
  FROM (
    SELECT doc_id, token, COUNT(*) AS cnt, {_HEX16} AS h16
    FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    )
    WHERE token <> ''
    GROUP BY doc_id, token
  )
  GROUP BY doc_id
"""

SIMHASH_ORACLE = f"""
WITH sim AS ({_SIMHASH_DOCS_SQL}),
chunked AS (
  SELECT doc_id, simhash,
         CAST(floor(simhash / 1.0)    AS INTEGER) % 16 AS c0,
         CAST(floor(simhash / 16.0)   AS INTEGER) % 16 AS c1,
         CAST(floor(simhash / 256.0)  AS INTEGER) % 16 AS c2,
         CAST(floor(simhash / 4096.0) AS INTEGER) % 16 AS c3
  FROM sim
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         a.simhash AS sim_a, b.simhash AS sim_b
  FROM chunked a JOIN chunked b
    ON a.doc_id < b.doc_id
   AND (a.c0 = b.c0 OR a.c1 = b.c1 OR a.c2 = b.c2 OR a.c3 = b.c3)
)
SELECT doc_id_a, doc_id_b,
       CAST(bit_count(xor(CAST(sim_a AS BIGINT), CAST(sim_b AS BIGINT))) AS INTEGER)
         AS hamming
FROM cand
WHERE bit_count(xor(CAST(sim_a AS BIGINT), CAST(sim_b AS BIGINT))) <= {SH_HAMMING_MAX}
"""


@query("dedup_simhash", SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("h16", F.expr(_HEX16))
    )
    bit_cases = []
    for j in range(SH_BITS):
        bit = (F.floor(F.col("h16") / float(2**j)).cast("int") % 2)
        s_j = F.sum(F.col("cnt") * (2 * bit - 1))
        bit_cases.append(F.when(s_j > 0, 1 << j).otherwise(0))
    simhash = reduce(lambda x, y: x + y, bit_cases).cast("int")
    sim = toks.groupBy("doc_id").agg(simhash.alias("simhash"))
    chunked = sim.select(
        "doc_id",
        "simhash",
        *[
            (F.floor(F.col("simhash") / float(16**c)).cast("int") % 16).alias(f"c{c}")
            for c in range(4)
        ],
    )
    a, b = chunked.alias("a"), chunked.alias("b")
    chunk_match = reduce(
        lambda x, y: x | y,
        [F.col(f"a.c{c}") == F.col(f"b.c{c}") for c in range(4)],
    )
    hamming = F.bit_count(
        F.col("a.simhash").cast("long").bitwiseXOR(F.col("b.simhash").cast("long"))
    )
    return (
        a.join(b, (F.col("a.doc_id") < F.col("b.doc_id")) & chunk_match)
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            hamming.cast("int").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= SH_HAMMING_MAX)
    )
