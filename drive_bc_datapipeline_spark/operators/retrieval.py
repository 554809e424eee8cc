"""Hybrid-retrieval rank fusion + bounded lexical candidates (G19).

Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009): given K
independent rankings of candidates per query (the gated G19 fuses the
df-bounded token-Jaccard more-like-this ranking below with G1's exact
cosine ranking; ``rrf_fuse`` takes any list, so H22's BM25 ranks can
be fused as an additional system), fuse them by

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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def mlt_token_jaccard_ranking(
    toks: DataFrame,
    query_pred: Column,
    *,
    max_df_frac: float = 0.95,
    max_query_terms: int = 16,
    cand_k: int = 20,
    doc_col: str = "doc_id",
    tok_col: str = "tok",
) -> DataFrame:
    """Per-query lexical more-like-this ranking with BOUNDED fan-out:
    (query_id, doc_id, rank) by token-Jaccard between the query's
    capped token set and each candidate's screened token set.

    The naive shape — corpus tokens ⋈ query tokens on the raw token —
    fans out df(tok) rows per query occurrence of tok, dominated at
    corpus scale by exactly the stopword-grade tokens that carry no
    relevance signal. This operator bounds it the way Lucene's
    MoreLikeThis does:

    1. **df screen** (``max_df_frac``): tokens present in more than
       frac·|docs| documents are dropped from BOTH sides (and from the
       Jaccard set sizes), so no single token can fan out by more than
       frac·|docs| — stopwords never reach the join.
    2. **rarest-M query terms** (``max_query_terms``): each query keeps
       only its M lowest-df tokens (ties broken on the token string),
       so the join input is ≤ M rows per query and the candidate
       intermediate is ≤ Σ of the query's M smallest dfs — in a
       Zipfian vocabulary those are precisely the rare, high-signal
       terms.

    The score is exact Jaccard |q∩c| / |q∪c| over the capped query set
    and the screened candidate set (integer counts, one double
    division — cross-engine deterministic; rank ties break on doc_id).

    ``toks`` must be one row per (doc, distinct token); ``query_pred``
    selects the query documents (e.g. ``F.col("doc_id") < 5``).

    Scale notes: the df relation is one map-side-combinable aggregate
    (vocab-sized output) broadcast back onto the token stream — at a
    vocabulary too large to broadcast, drop the hint and let the
    screen run as a shuffle join (the F3 caveat, semantics unchanged).
    The per-doc screened sizes ride a doc-partitioned window — one
    narrow (doc, tok) exchange, strictly smaller than the raw token
    stream post-screen. Nothing downstream of the screen exceeds
    |queries|·M·(frac-capped df) rows.
    """
    reserved = [c for c in toks.columns if c.startswith("__")]
    if reserved:
        raise ValueError(f"toks must not carry __-prefixed columns: {reserved}")
    ndocs = toks.select(F.countDistinct(doc_col).alias("__n"))
    dfrel = toks.groupBy(tok_col).agg(F.countDistinct(doc_col).alias("__df"))
    keep = (
        dfrel.crossJoin(F.broadcast(ndocs))
        .filter(F.col("__df") <= F.col("__n") * F.lit(float(max_df_frac)))
        .select(tok_col, "__df")
    )
    scr = (
        toks.select(doc_col, tok_col)
        .join(F.broadcast(keep), tok_col)
        .withColumn("__csz", F.count(F.lit(1)).over(Window.partitionBy(doc_col)))
    )
    w_rare = Window.partitionBy(doc_col).orderBy("__df", tok_col)
    qt = (
        scr.filter(query_pred)
        .withColumn("__rn", F.row_number().over(w_rare))
        .filter(F.col("__rn") <= max_query_terms)
        .select(F.col(doc_col).alias("__query_id"), tok_col)
        .withColumn(
            "__qsz", F.count(F.lit(1)).over(Window.partitionBy("__query_id"))
        )
    )
    inter = (
        scr.join(F.broadcast(qt), tok_col)
        .filter(F.col(doc_col) != F.col("__query_id"))
        .groupBy("__query_id", doc_col, "__qsz", "__csz")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    jac = F.col("__i").cast("double") / (
        F.col("__qsz") + F.col("__csz") - F.col("__i")
    )
    w_rank = Window.partitionBy("__query_id").orderBy(F.desc("__jac"), doc_col)
    return (
        inter.withColumn("__jac", jac)
        .withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= cand_k)
        .select(
            F.col("__query_id").alias("query_id"),
            F.col(doc_col).alias("doc_id"),
            "rank",
        )
    )


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
