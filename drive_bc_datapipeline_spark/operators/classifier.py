"""Hashed linear text-classifier inference (SURVEY §2 E7).

The quality-classifier scoring step of a CCNet/fastText-style
training-data pipeline: a small linear model over hashed bag-of-token
features, applied to a 100 TB corpus. The reference has no classifier
surface (its ML scripts train tabular SparkML models,
ml-sparkml.py / inference-prediction.py); this is the LLM-data
extension of that inference step, kept as pure column algebra.

Why this shape scales:
- the MODEL is tiny (n_buckets weights) and rides a broadcast join —
  no per-executor model files, no Python in the hot path;
- tokens hash JVM-side with the same md5 convention as H15's
  `text_feature_hashing` (first 8 hex chars → BIGINT % buckets), so
  features are engine-portable and sequentially replayable in tests;
- the per-doc aggregate is ONE partial-aggregable groupBy on the doc
  id: the shuffle moves (doc, partial-sum) rows, never token rows.

fastText averages token vectors; the linear analogue scores
    p(doc) = sigmoid(bias + mean_over_tokens(w[bucket(tok)]))
with out-of-vocabulary buckets contributing weight 0 (left join +
coalesce), and an empty document scoring sigmoid(bias) exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hash_bucket(col, n_buckets: int):
    """md5-prefix bucket id, identical to H15's convention: the first
    8 hex chars parsed as BIGINT, mod n_buckets. Python twin:
    ``int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets``."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
        % n_buckets
    ).cast("int")


def score_hashed_linear(
    spark: SparkSession,
    df: DataFrame,
    weights: dict[int, float],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    bias: float = 0.0,
) -> DataFrame:
    """Score every document with a hashed linear model.

    ``weights`` maps bucket id -> weight (missing buckets weigh 0).
    Returns (id_col, n_tokens, score) with score in (0, 1); documents
    whose text yields zero tokens keep sigmoid(bias).

    Determinism: the sum of per-token weights is grouped by doc — the
    float add order inside a group is engine-defined, so tests compare
    to 1e-9 (the repo-wide float tolerance) rather than bit-exactly;
    every other step (hashing, join, mean, sigmoid) is exact algebra.
    """
    if not weights:
        raise ValueError("score_hashed_linear needs a non-empty model")
    wdf = spark.createDataFrame(
        [(int(b), float(w)) for b, w in sorted(weights.items())],
        "bucket int, weight double",
    )
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    exploded = df.select(id_col, F.explode(toks).alias("tok")).select(
        id_col, hash_bucket(F.col("tok"), n_buckets).alias("bucket")
    )
    per_doc = (
        exploded.join(F.broadcast(wdf), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("wsum"),
        )
    )
    # re-attach token-less docs (explode dropped them): mean term 0
    logit = F.lit(float(bias)) + F.coalesce(
        F.col("wsum") / F.col("n_tokens"), F.lit(0.0)
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias("score"),
        )
    )
