"""Per-domain perplexity-threshold filtering (the CCNet cut).

H25/H37 give every document a language-model score (avg negative
log-likelihood — a perplexity proxy); what a curation pipeline
actually DOES with it is Wenzek et al.'s CCNet move: compute score
quantiles PER DOMAIN (web text and books have incomparable absolute
perplexities), then band each domain into head / middle / tail — or
filter at one per-domain threshold. The r13 verdict named this the
missing consumer: the scores existed, the per-source threshold table
and the filter/banding did not.

Reference parity: none — the reference has no LM scoring at all; this
extends the LLM-curation surface (SURVEY §2 H-family), citing the
public CCNet recipe (Wenzek et al. 2020, "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data").

Scale shape: the threshold table is ONE partial-aggregable
groupBy(source) over the scored relation — |sources| × |quantiles|
rows of model state, never corpus-scale. Application collects that
model state EXACTLY ONCE (the fit plan would otherwise re-execute
per consumer — the curation job's re-scan lesson) and joins a
LITERAL local relation back: ONE broadcast equi-join on source + a
JVM filter/banding expression, with no trace of the fit aggregate in
the application plan (test-pinned).
``approx=True`` (the 100 TB path) uses ``approx_percentile`` (a
mergeable t-digest-style sketch aggregate, one pass, bounded memory);
``approx=False`` uses exact ``percentile`` (per-group sort-based —
fine when one domain's scores fit an executor, and the
oracle-comparable mode the tests bit-match against numpy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: guard: the threshold table is broadcast model state
MAX_DOMAIN_THRESHOLDS = 1_000_000


def domain_threshold_table(
    df: DataFrame,
    qs: tuple[float, ...] = (1.0 / 3.0, 2.0 / 3.0),
    *,
    source_col: str = "source",
    score_col: str = "avg_nll",
    approx: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-domain score quantiles: one row per (source, q) with the
    threshold — ascending in q within a source by construction.

    NULL/NaN scores fail fast AT EXECUTION riding the aggregate's own
    projection (percentile aggregates silently ignore NULL — a doc
    whose score upstream failed would silently not count toward its
    domain's distribution); a NULL source is a real group and is
    rejected too (every doc must belong to a domain before banding
    means anything).
    """
    if not qs or sorted(qs) != list(qs) or len(set(qs)) != len(qs):
        raise ValueError(
            f"qs must be non-empty, strictly ascending (got {qs!r})"
        )
    if any(not 0.0 < q < 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1) (got {qs!r})")
    s = F.col(score_col)
    checked = F.when(
        s.isNotNull() & ~F.isnan(s) & F.col(source_col).isNotNull(), s
    ).otherwise(
        F.raise_error(
            F.lit(
                f"domain_threshold_table: NULL/NaN {score_col} or "
                f"NULL {source_col} — score and domain every doc "
                "before fitting thresholds"
            )
        )
    )
    q_arr = F.array(*[F.lit(float(q)) for q in qs])
    agg = (
        F.percentile_approx(checked, q_arr, F.lit(accuracy))
        if approx
        else F.percentile(checked, q_arr)
    )
    per_source = df.groupBy(F.col(source_col).alias("source")).agg(
        agg.alias("__t"), F.count(F.lit(1)).alias("n_docs")
    )
    return per_source.select(
        "source",
        F.posexplode("__t").alias("__i", "threshold"),
        "n_docs",
    ).select(
        "source",
        F.element_at(
            F.array(*[F.lit(float(q)) for q in qs]), F.col("__i") + 1
        ).alias("q"),
        F.col("threshold").cast("double").alias("threshold"),
        "n_docs",
    )


def collect_domain_thresholds(table: DataFrame) -> list:
    """Materialize the threshold table EXACTLY ONCE (its plan holds
    the corpus-scale fit aggregate — re-executing it per consumer is
    the re-scan class the curation job just eliminated) and bound it:
    it is declared driver/broadcast model state.

    Public (r15): a caller that needs the thresholds for BOTH a
    manifest and an apply must collect here once and pass the rows to
    ``apply_domain_filter``/``apply_domain_bands`` — collecting the
    table twice runs the corpus-scale percentile aggregate twice, and
    ``approx=True`` sketches are not guaranteed to reproduce the same
    thresholds across executions (the manifest could then disagree
    with the cut actually applied — the r14 ADVICE finding)."""
    rows = table.select("source", "q", "threshold").collect()
    if len(rows) > MAX_DOMAIN_THRESHOLDS:
        raise ValueError(
            f"{len(rows)} (source, q) rows exceed the broadcast "
            f"threshold-table bound ({MAX_DOMAIN_THRESHOLDS})"
        )
    return rows


def _rows_of(table) -> list:
    """Accept either the threshold-table DataFrame (collected here,
    once) or rows already materialized by collect_domain_thresholds."""
    if isinstance(table, DataFrame):
        return collect_domain_thresholds(table)
    return list(table)


def _two_threshold_map(spark, rows: list) -> DataFrame:
    """(source, __t_lo, __t_hi) as a LITERAL local relation from the
    collected two-quantile table rows."""
    qs = sorted({r["q"] for r in rows})
    if len(qs) != 2:
        raise ValueError(
            f"banding needs a table fit with exactly 2 quantiles "
            f"(got {qs})"
        )
    lo, hi = qs
    per_src: dict[str, dict[float, float]] = {}
    for r in rows:
        per_src.setdefault(r["source"], {})[r["q"]] = r["threshold"]
    return spark.createDataFrame(
        [(s, t[lo], t[hi]) for s, t in sorted(per_src.items())],
        "source string, __t_lo double, __t_hi double",
    )


def apply_domain_bands(
    df: DataFrame,
    table: DataFrame,
    *,
    source_col: str = "source",
    score_col: str = "avg_nll",
    out_col: str = "band",
) -> DataFrame:
    """CCNet banding: ``head`` (score <= t_lo — most fluent),
    ``middle`` (<= t_hi), ``tail`` (the rest) per domain, via ONE
    broadcast join on source. Lower score = lower perplexity = better,
    matching H25/H37's avg_nll orientation.

    A document from a domain ABSENT from the table fails fast at
    execution (the fit never saw that domain; banding it against
    another domain's thresholds would be silently wrong) — the
    ride-along pattern, no second corpus scan.

    ``table`` may be the fit DataFrame (collected here, once) or rows
    pre-collected with ``collect_domain_thresholds`` (so one collect
    can feed a manifest AND the apply).
    """
    if out_col in df.columns:
        raise ValueError(
            f"apply_domain_bands: {out_col!r} already exists — rename"
        )
    thr = _two_threshold_map(df.sparkSession, _rows_of(table))
    s = F.col(score_col)
    band = (
        F.when(
            F.col("__t_lo").isNull(),
            F.raise_error(
                F.lit(
                    "apply_domain_bands: document from a domain the "
                    "threshold table was never fit on"
                )
            ),
        )
        # same 1e-9 boundary tolerance as apply_domain_filter: a
        # quantile threshold IS some doc's score, and re-computed
        # scores reproduce only to summation-order noise — without
        # the tolerance the boundary doc flips bands per execution
        .when(s <= F.col("__t_lo") + F.lit(1e-9), F.lit("head"))
        .when(s <= F.col("__t_hi") + F.lit(1e-9), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    joined = df.join(
        F.broadcast(thr),
        df[source_col] == thr["source"],
        "left",
    ).drop(thr["source"])
    return joined.select(
        *[df[c] for c in df.columns], band.alias(out_col)
    )


def apply_domain_filter(
    df: DataFrame,
    table: DataFrame,
    q: float,
    *,
    source_col: str = "source",
    score_col: str = "avg_nll",
) -> DataFrame:
    """Keep documents with ``score <= `` their domain's threshold at
    quantile ``q`` (the one-cut CCNet variant: drop each domain's
    worst tail). Same broadcast-join + ride-along unknown-domain
    fail-fast as banding; returns ``df``'s columns unchanged.

    ``table`` may be the fit DataFrame (collected here, once) or rows
    pre-collected with ``collect_domain_thresholds``. The quantile is
    matched with a 1e-12 tolerance, not exact float equality — a q
    that round-tripped through a JSON manifest (or any path that
    perturbs the last bit) must still select its row rather than
    silently matching nothing (the r14 ADVICE finding).

    The score comparison itself carries a 1e-9 absolute tolerance
    (``score <= threshold + 1e-9``): a percentile threshold IS some
    document's score bit-for-bit, and a consumer that RE-computes
    scores in a different execution (the J12 streaming gate; any
    re-scoring against a persisted manifest) reproduces them only to
    summation-order noise (~1e-14 here), so the boundary document
    would otherwise flip in or out of the cut per execution. 1e-9 is
    the repo-wide score-comparison tolerance — far above float drift,
    far below any meaningful score gap. Even with the fit and filter
    reading the same materialized relation (the batch job), a SECOND
    document within 1e-9 of the threshold is now kept too — such a
    doc is a genuinely ambiguous tie (its score is
    indistinguishable from the threshold at the tolerance the whole
    repo compares scores at), not a behavior guarantee violation."""
    rows = [
        r for r in _rows_of(table) if abs(r["q"] - float(q)) < 1e-12
    ]
    if not rows:
        raise ValueError(
            f"apply_domain_filter: the table holds no quantile {q}"
        )
    one_q = df.sparkSession.createDataFrame(
        sorted((r["source"], r["threshold"]) for r in rows),
        "source string, threshold double",
    )
    s = F.col(score_col)
    keep = F.when(
        F.col("threshold").isNull(),
        F.raise_error(
            F.lit(
                "apply_domain_filter: document from a domain the "
                "threshold table was never fit on"
            )
        ),
    ).otherwise(s <= F.col("threshold") + F.lit(1e-9))
    joined = df.join(
        F.broadcast(one_q),
        df[source_col] == one_q["source"],
        "left",
    ).drop(one_q["source"])
    return joined.filter(keep).select(*[df[c] for c in df.columns])
