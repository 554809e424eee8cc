"""Target-conditioned language-model scoring (the CCNet scorer).

H25/H37 score a corpus under ITS OWN token statistics
(self-perplexity — a repetition/fluency signal). The CCNet recipe
(Wenzek et al. 2020) needs the other direction: train the LM on a
HIGH-QUALITY reference corpus (their KenLM on Wikipedia), score the
raw corpus under it, then cut per domain — lower perplexity = closer
to the reference. This module is that scorer as a standalone
operator; its output column (``avg_nll``) is exactly what
``operators/domain_filter`` consumes, closing the CCNet triple:

    unigram_lm_table(reference) → score_docs_under_lm(corpus)
      → domain_threshold_table → apply_domain_bands / filter

The LM is an add-alpha-smoothed unigram table (the KenLM stand-in the
environment allows — no external LM libs; the Spark-side contract is
the point): logp(tok) = log2((n_tok + alpha) / (N + alpha·(V + 1))),
with the SAME formula's unseen-token mass as the OOV score, so the
distribution sums to 1 over V known types + one OOV bucket.

Scale shape: the table fit is ONE explode + partial-aggregable
groupBy over the REFERENCE corpus (vocabulary-bounded output).
Scoring is one explode + equi-join (AQE broadcasts a small
vocabulary; a web-scale vocabulary falls back to a hash join — both
fine, the join key is the token) + one partial-aggregable
groupBy(doc). Nothing corpus-scale is collected; the scalar
normalizers ride a 1-row cross join, the H25 shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_lm_table(
    ref: DataFrame,
    *,
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Fit the smoothed unigram LM on the reference corpus: returns
    one row per vocabulary type ``(tok, logp)`` plus the scalar OOV
    mass as the single row ``(NULL, logp_oov)`` — one relation, so a
    consumer joins once and coalesces to the OOV row's value.

    Single-space tokenization (the corpus-wide H3/H25 convention);
    empty reference corpora fail loudly (an LM with no mass scores
    nothing meaningfully).
    """
    if alpha <= 0:
        raise ValueError(f"alpha={alpha}: add-alpha smoothing needs > 0")
    tk = ref.select(
        F.explode(F.split(text_col, " ")).alias("tok")
    ).filter(F.col("tok") != "")
    freq = tk.groupBy("tok").agg(F.count(F.lit(1)).alias("__n"))
    # vocabulary-bounded; consumed by the normalizer AND the logp
    # projection — pin it so the reference corpus tokenizes once
    freq = freq.localCheckpoint(eager=True)
    if freq.isEmpty():  # cheap: reads the materialized checkpoint
        raise ValueError(
            "unigram_lm_table: empty reference corpus — the LM has "
            "no mass to score under"
        )
    totals = freq.agg(
        F.sum("__n").cast("double").alias("__tot"),
        F.count(F.lit(1)).cast("double").alias("__vocab"),
    )
    denom = F.col("__tot") + alpha * (F.col("__vocab") + 1.0)
    known = (
        freq.crossJoin(F.broadcast(totals))
        .select(
            "tok",
            F.log2((F.col("__n") + alpha) / denom).alias("logp"),
        )
    )
    oov = totals.select(
        F.lit(None).cast("string").alias("tok"),
        F.log2(F.lit(alpha) / denom).alias("logp"),
    )
    return known.unionByName(oov)


def score_docs_under_lm(
    docs: DataFrame,
    lm: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_toks, avg_nll) for every document with >= 1 token,
    under the reference LM: avg_nll = −mean(logp(tok)), OOV tokens
    taking the table's NULL-row mass. Token-less documents are
    DROPPED (the H25 convention — there is nothing to score; filter
    or handle them upstream, they would otherwise reach the
    domain-threshold fit as NULLs and fail it loudly).

    One explode + one equi-join on the token + one partial-aggregable
    groupBy(doc); the single OOV row rides in as a broadcast scalar.
    """
    oov_rows = lm.filter(F.col("tok").isNull()).select("logp").collect()
    if len(oov_rows) != 1:
        raise ValueError(
            "score_docs_under_lm: the LM table must carry exactly one "
            f"NULL-token OOV row (got {len(oov_rows)}) — fit it with "
            "unigram_lm_table"
        )
    oov_logp = float(oov_rows[0]["logp"])
    tk = docs.select(
        F.col(id_col),
        F.explode(F.split(text_col, " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    joined = tk.join(lm.filter(F.col("tok").isNotNull()), "tok", "left")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            (
                -F.sum(F.coalesce(F.col("logp"), F.lit(oov_logp)))
                / F.count(F.lit(1))
            ).alias("avg_nll"),
        )
    )
