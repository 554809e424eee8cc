"""Hybrid-retrieval rank fusion (SURVEY §2 G19).

Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009): given K
independent rankings of candidates per query (in this repo: H22's BM25
lexical ranking and G1/G2's embedding ANN ranking — the standard
hybrid-search pair in a RAG stack), fuse them by

    rrf(d) = Σ_i 1 / (k0 + rank_i(d))

summing only over rankings that contain d. RRF is the production
default for lexical+vector fusion because it needs no score
calibration — ranks are scale-free — and a document missing from one
ranking simply contributes nothing.

Spark shape: union the (query_id, doc_id, rank) relations (map-side,
no shuffle), ONE hash aggregate on (query_id, doc_id) sums the
reciprocal contributions, and the per-query top-k is a
query-partitioned rank window. At 100 TB of candidates this is one
shuffle on the fused key plus one on query_id — candidate lists are
top-N-per-query sized (bounded by upstream retrieval), so both
exchanges move k·|queries|·|rankings| rows, never corpus-scale data.

Determinism: rank_i are integers, so the fused score is an exact sum
of unit fractions with k0 <= 60-ish denominators — identical across
engines/orders up to double associativity on at most |rankings| terms
(ties possible only for genuinely symmetric rank profiles); the final
ordering tie-breaks on doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rrf_fuse(
    rankings: list[DataFrame],
    k0: int = 60,
    top_k: int | None = None,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse per-query rankings into (query_id, doc_id, rrf_score,
    n_rankings, fused_rank).

    Each input frame holds one retrieval system's output: 1-based
    integer ``rank_col`` per (query, doc); ranks beyond a system's
    result list are simply absent. ``top_k`` truncates the fused list
    per query (None keeps every fused candidate). ``fused_rank`` uses
    row_number with a doc_id tiebreak so the output is deterministic.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(query_col).alias("query_id"),
            F.col(doc_col).alias("doc_id"),
            (1.0 / (F.lit(float(k0)) + F.col(rank_col).cast("double"))).alias(
                "__contrib"
            ),
        )
        for r in rankings
    ]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    fused = unioned.groupBy("query_id", "doc_id").agg(
        F.sum("__contrib").alias("rrf_score"),
        F.count(F.lit(1)).cast("int").alias("n_rankings"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.col("doc_id")
    )
    out = fused.withColumn("fused_rank", F.row_number().over(w).cast("int"))
    if top_k is not None:
        out = out.filter(F.col("fused_rank") <= top_k)
    return out
