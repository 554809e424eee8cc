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


def unigram_oov_logp(lm: DataFrame) -> float:
    """The validated OOV-mass read: the LM table's single NULL-token
    row. ONE bounded collect — a long-lived consumer scoring many
    batches under one frozen table (the J12 streaming gate) calls
    this once and passes the scalar to the scorer, instead of paying
    the probe per micro-batch (r15 review catch)."""
    oov_rows = lm.filter(F.col("tok").isNull()).select("logp").collect()
    if len(oov_rows) != 1:
        raise ValueError(
            "the LM table must carry exactly one NULL-token OOV row "
            f"(got {len(oov_rows)}) — fit it with unigram_lm_table"
        )
    return float(oov_rows[0]["logp"])


def score_docs_under_lm(
    docs: DataFrame,
    lm: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_logp: float | None = None,
) -> DataFrame:
    """(id, n_toks, avg_nll) for every document with >= 1 token,
    under the reference LM: avg_nll = −mean(logp(tok)), OOV tokens
    taking the table's NULL-row mass. Token-less documents are
    DROPPED (the H25 convention — there is nothing to score; filter
    or handle them upstream, they would otherwise reach the
    domain-threshold fit as NULLs and fail it loudly).

    One explode + one equi-join on the token + one partial-aggregable
    groupBy(doc); the single OOV row rides in as a broadcast scalar.
    ``oov_logp``: pass ``unigram_oov_logp(lm)`` read once to skip the
    per-call probe when scoring many batches under one frozen table.
    """
    if oov_logp is None:
        oov_logp = unigram_oov_logp(lm)
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


def bigram_lm_table(
    ref: DataFrame,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Fit the bigram half of the target-conditioned LM on the
    reference corpus: pair counts plus context totals in ONE relation —

        (w1, w2,  n)   adjacent-pair count c(w1 w2)
        (w1, NULL, n)  context total c1(w1) = Σ_w2 c(w1 w2)

    The fit is pure counting (H37's in-row adjacent-pair build: one
    explode over a transform of the token array, no windows, no
    self-joins) — THIS relation has no fit-time smoothing parameter
    for a score-time knob to mismatch (the curve_bins lesson); note
    the unigram BACKOFF table is a separate fit that does bake its
    own alpha (see score_docs_under_bigram_lm). Context totals
    aggregate from the vocabulary-bounded pair counts, not from a
    second corpus pass, and make the smoothed conditional a proper
    distribution over V known types + one OOV bucket.

    CCNet proper uses a 5-gram KenLM (Wenzek et al. 2020); this is
    the order-2 member of that family the environment allows, sharing
    the unigram scorer's orientation so H48 consumes either.
    """
    toks = F.filter(F.split(text_col, " "), lambda x: x != "")
    pairs = (
        ref.select(toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2), i -> "
                    "named_struct('w1', t[i], 'w2', t[i + 1]))"
                )
            ).alias("u")
        )
        .select("u.w1", "u.w2")
    )
    pc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    # vocabulary-bounded; feeds the pair rows AND the context totals
    pc = pc.localCheckpoint(eager=True)
    if pc.isEmpty():  # cheap: reads the materialized checkpoint
        # fail like unigram_lm_table does on an empty reference: a
        # pair-less table would score every non-first token with the
        # constant uniform term — order-blind scoring silently
        # masquerading as lm_order=2 (review catch)
        raise ValueError(
            "bigram_lm_table: no document in the reference has >= 2 "
            "tokens — a bigram LM fit on it carries no order signal; "
            "use the unigram scorer or fix the reference corpus"
        )
    ctx = pc.groupBy("w1").agg(
        F.lit(None).cast("string").alias("w2"),
        F.sum("n").alias("n"),
    )
    return pc.unionByName(ctx)


def bigram_backoff_stats(
    bigram: DataFrame, unigram: DataFrame
) -> tuple[float, float]:
    """(V, oov_logp) for the interpolated scorer, with BOTH model
    validations: the unigram table's single-OOV-row contract and the
    same-reference guard (a bigram context word outside the unigram
    vocabulary proves the two tables were fit on different corpora —
    V and the OOV mass from one with pair counts from another would
    silently skew every conditional; the detectable direction — a
    unigram table fit on a SUPERSET corpus passes). Two bounded
    probes over vocabulary-sized model state — a long-lived consumer
    (the J12 streaming gate) calls this ONCE and passes the result
    to the scorer instead of paying both probes per micro-batch
    (r15 review catch)."""
    stats = unigram.groupBy().agg(
        F.count(F.col("tok")).alias("v"),
        F.max(F.when(F.col("tok").isNull(), F.col("logp"))).alias("oov"),
        F.count(F.when(F.col("tok").isNull(), 1)).alias("n_oov_rows"),
    ).collect()[0]
    if stats["n_oov_rows"] != 1:
        raise ValueError(
            "the unigram table must carry exactly one NULL-token OOV "
            f"row (got {stats['n_oov_rows']}) — fit it with "
            "unigram_lm_table"
        )
    stray = (
        bigram.filter(F.col("w2").isNull())
        .select(F.col("w1"))
        .join(
            unigram.filter(F.col("tok").isNotNull()).select(
                F.col("tok").alias("w1")
            ),
            "w1",
            "left_anti",
        )
        .limit(1)
        .collect()
    )
    if stray:
        raise ValueError(
            "bigram context "
            f"{stray[0]['w1']!r} is not in the unigram vocabulary — "
            "the two tables were fit on different references; fit "
            "bigram_lm_table and unigram_lm_table on the same corpus"
        )
    return float(stats["v"]), float(stats["oov"])


def score_docs_under_bigram_lm(
    docs: DataFrame,
    bigram: DataFrame,
    unigram: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    lam: float = 0.7,
    stats: tuple[float, float] | None = None,
) -> DataFrame:
    """(id, n_toks, avg_nll) under the interpolated bigram LM:

        p(w_i | w_{i-1}) = lam * (c(w_{i-1} w_i) + alpha)
                                 / (c1(w_{i-1}) + alpha * (V + 1))
                         + (1 - lam) * p_ug(w_i)

    with the document's FIRST token scored under the unigram backoff
    alone (no context exists). ``unigram`` is the
    ``unigram_lm_table`` fit on the SAME reference (guarded: a bigram
    context outside the unigram vocabulary raises) — its OOV row
    covers unseen w_i; an unseen context w_{i-1} degrades the bigram
    term to the uniform 1/(V+1) and the backoff carries the score.

    ``alpha`` here smooths only the BIGRAM conditional; the backoff
    term p_ug uses the logp baked into the unigram table at ITS fit
    (``unigram_lm_table(alpha=...)``). The two are independent
    smoothing knobs of two separately-normalized distributions — the
    interpolation is well-defined for any pair — but passing a
    different alpha than the unigram fit used means the two halves
    are smoothed differently; conventionally use one value for both
    (``run_ccnet_prefilter`` does). The baked alpha is not
    recoverable from the table, so this is a documented contract,
    not a guard.
    Lower avg_nll = closer to the reference's word ORDER, not just
    its vocabulary — the signal the unigram scorer cannot see; same
    output shape, so ``domain_filter`` consumes either unchanged.

    Plan: one explode carrying each token WITH its in-row context
    (no windows), three vocabulary-bounded left joins (pair, context,
    unigram — AQE broadcasts them), one partial-aggregable
    groupBy(doc). The V / OOV-mass scalars and the same-reference
    guard ride ``bigram_backoff_stats`` (two bounded model-state
    probes) — pass its result as ``stats`` to skip them when scoring
    many batches under one frozen model.
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam={lam}: interpolation weight is in [0, 1]")
    if alpha <= 0:
        raise ValueError(f"alpha={alpha}: add-alpha smoothing needs > 0")
    if stats is None:
        stats = bigram_backoff_stats(bigram, unigram)
    v, oov_logp = float(stats[0]), float(stats[1])

    toks = F.filter(F.split(text_col, " "), lambda x: x != "")
    pos = (
        docs.select(F.col(id_col), toks.alias("t"))
        .filter(F.size("t") >= 1)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 1), i -> "
                    "named_struct("
                    "'w', t[i], "
                    "'ctx', IF(i = 0, CAST(NULL AS STRING), t[i - 1])))"
                )
            ).alias("u"),
        )
        .select(id_col, F.col("u.w").alias("w"), F.col("u.ctx").alias("ctx"))
    )
    pair = bigram.filter(F.col("w2").isNotNull()).select(
        F.col("w1").alias("__p1"), F.col("w2").alias("__p2"),
        F.col("n").alias("__n12"),
    )
    ctx = bigram.filter(F.col("w2").isNull()).select(
        F.col("w1").alias("__c1"), F.col("n").alias("__n1"),
    )
    ug = unigram.filter(F.col("tok").isNotNull()).select(
        F.col("tok").alias("__ut"), F.col("logp").alias("__ulogp"),
    )
    j = (
        pos.join(
            pair,
            (F.col("ctx") == F.col("__p1")) & (F.col("w") == F.col("__p2")),
            "left",
        )
        .join(ctx, F.col("ctx") == F.col("__c1"), "left")
        .join(ug, F.col("w") == F.col("__ut"), "left")
    )
    p_ug = F.pow(F.lit(2.0), F.coalesce(F.col("__ulogp"), F.lit(oov_logp)))
    p_bg = (
        (F.coalesce(F.col("__n12"), F.lit(0)).cast("double") + alpha)
        / (
            F.coalesce(F.col("__n1"), F.lit(0)).cast("double")
            + alpha * (v + 1.0)
        )
    )
    p = F.when(F.col("ctx").isNull(), p_ug).otherwise(
        lam * p_bg + (1.0 - lam) * p_ug
    )
    return (
        j.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            (-F.sum(F.log2(p)) / F.count(F.lit(1))).alias("avg_nll"),
        )
    )


def trigram_lm_table(
    ref: DataFrame,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Fit the trigram half of the target-conditioned LM on the
    reference corpus (r16, the order-3 step toward CCNet's 5-gram
    KenLM): triple counts plus their context totals in ONE relation —

        (w1, w2, w3,   n)  adjacent-triple count c(w1 w2 w3)
        (w1, w2, NULL, n)  context total c2(w1 w2) = Σ_w3 c(w1 w2 w3)

    The same pure-counting shape as ``bigram_lm_table`` one order up
    (H37's in-row adjacent-tuple build: one explode over a transform
    of the token array, no windows, no self-joins; context totals
    aggregate from the vocabulary-bounded triple counts, not a second
    corpus pass) — no fit-time smoothing parameter, so no score-time
    knob can mismatch. Fails loudly on a reference with no 3-token
    document: a triple-less table would degrade every order-3 term to
    the uniform constant while the caller believes it scores order 3
    (the bigram_lm_table review-catch class).
    """
    toks = F.filter(F.split(text_col, " "), lambda x: x != "")
    triples = (
        ref.select(toks.alias("t"))
        .filter(F.size("t") >= 3)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 3), i -> "
                    "named_struct('w1', t[i], 'w2', t[i + 1], "
                    "'w3', t[i + 2]))"
                )
            ).alias("u")
        )
        .select("u.w1", "u.w2", "u.w3")
    )
    tc = triples.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("n")
    )
    # vocabulary-bounded; feeds the triple rows AND the context totals
    tc = tc.localCheckpoint(eager=True)
    if tc.isEmpty():  # cheap: reads the materialized checkpoint
        raise ValueError(
            "trigram_lm_table: no document in the reference has >= 3 "
            "tokens — a trigram LM fit on it carries no order-3 "
            "signal; use the bigram or unigram scorer, or fix the "
            "reference corpus"
        )
    ctx = tc.groupBy("w1", "w2").agg(
        F.lit(None).cast("string").alias("w3"),
        F.sum("n").alias("n"),
    )
    return tc.unionByName(ctx)


def trigram_backoff_stats(
    trigram: DataFrame, bigram: DataFrame, unigram: DataFrame
) -> tuple[float, float]:
    """(V, oov_logp) for the order-3 interpolated scorer, with the
    full same-reference validation chain: ``bigram_backoff_stats``'s
    two probes (single-OOV-row contract, bigram contexts ⊆ unigram
    vocabulary) plus the order-3 link — every trigram context
    (w1, w2) is an adjacent PAIR in the reference, so it must appear
    in the bigram pair table; a stray context proves the trigram and
    bigram tables were fit on different corpora (the detectable
    direction — a superset-corpus bigram table passes). Three bounded
    probes over vocabulary-sized model state; long-lived consumers
    call ONCE and pass the result to the scorer."""
    stats = bigram_backoff_stats(bigram, unigram)
    stray = (
        trigram.filter(F.col("w3").isNull())
        .select("w1", "w2")
        .join(
            bigram.filter(F.col("w2").isNotNull()).select("w1", "w2"),
            ["w1", "w2"],
            "left_anti",
        )
        .limit(1)
        .collect()
    )
    if stray:
        raise ValueError(
            "trigram context "
            f"({stray[0]['w1']!r}, {stray[0]['w2']!r}) is not a pair "
            "in the bigram table — the two tables were fit on "
            "different references; fit trigram_lm_table and "
            "bigram_lm_table on the same corpus"
        )
    return stats


def score_docs_under_trigram_lm(
    docs: DataFrame,
    trigram: DataFrame,
    bigram: DataFrame,
    unigram: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    lam: float = 0.7,
    stats: tuple[float, float] | None = None,
) -> DataFrame:
    """(id, n_toks, avg_nll) under the interpolated backoff CHAIN
    trigram → bigram → unigram, one ``lam`` applied per level (the
    Jelinek-Mercer recursion, so ONE knob generalizes to any order):

        p1(w)            = p_ug(w)                      (backoff base)
        p2(w | c1)       = lam * p2s + (1 - lam) * p1
        p3(w | c2 c1)    = lam * p3s + (1 - lam) * p2

    where pks = (c(ctx w) + alpha) / (c(ctx) + alpha * (V + 1)) is the
    add-alpha-smoothed order-k conditional. Token i scores under the
    deepest chain its position allows: first token p1, second token
    p2, the rest p3 — so ``lam=0`` degrades exactly to the unigram
    scorer and a pair/triple-less context degrades smoothly through
    the uniform term while the backoff carries the score. Same
    (id, n_toks, avg_nll) shape: ``domain_filter`` and the jobs
    consume any order unchanged.

    ``alpha`` smooths the bigram AND trigram conditionals (one value,
    the run_ccnet_prefilter convention); the unigram backoff keeps
    the logp baked at ITS fit — the same documented contract as
    ``score_docs_under_bigram_lm``. Lower avg_nll = closer to the
    reference's word order at RANGE 3: a corpus that preserves bigram
    statistics but scrambles triples separates here and nowhere
    below (test-pinned).

    Plan: one explode carrying each token WITH its two in-row
    contexts (no windows), five vocabulary-bounded left joins
    (triple, trigram-context, pair, bigram-context, unigram — AQE
    broadcasts them), one partial-aggregable groupBy(doc). The
    V/OOV scalars and the same-reference guards ride
    ``trigram_backoff_stats`` — pass its result as ``stats`` when
    scoring many batches under one frozen model.
    """
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam={lam}: interpolation weight is in [0, 1]")
    if alpha <= 0:
        raise ValueError(f"alpha={alpha}: add-alpha smoothing needs > 0")
    if stats is None:
        stats = trigram_backoff_stats(trigram, bigram, unigram)
    v, oov_logp = float(stats[0]), float(stats[1])

    toks = F.filter(F.split(text_col, " "), lambda x: x != "")
    pos = (
        docs.select(F.col(id_col), toks.alias("t"))
        .filter(F.size("t") >= 1)
        .select(
            id_col,
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 1), i -> "
                    "named_struct("
                    "'w', t[i], "
                    "'c1', IF(i >= 1, t[i - 1], CAST(NULL AS STRING)), "
                    "'c2', IF(i >= 2, t[i - 2], CAST(NULL AS STRING))))"
                )
            ).alias("u"),
        )
        .select(
            id_col,
            F.col("u.w").alias("w"),
            F.col("u.c1").alias("c1"),
            F.col("u.c2").alias("c2"),
        )
    )
    tri = trigram.filter(F.col("w3").isNotNull()).select(
        F.col("w1").alias("__t1"), F.col("w2").alias("__t2"),
        F.col("w3").alias("__t3"), F.col("n").alias("__n123"),
    )
    tctx = trigram.filter(F.col("w3").isNull()).select(
        F.col("w1").alias("__tc1"), F.col("w2").alias("__tc2"),
        F.col("n").alias("__n12c"),
    )
    pair = bigram.filter(F.col("w2").isNotNull()).select(
        F.col("w1").alias("__p1"), F.col("w2").alias("__p2"),
        F.col("n").alias("__n12"),
    )
    bctx = bigram.filter(F.col("w2").isNull()).select(
        F.col("w1").alias("__c1"), F.col("n").alias("__n1"),
    )
    ug = unigram.filter(F.col("tok").isNotNull()).select(
        F.col("tok").alias("__ut"), F.col("logp").alias("__ulogp"),
    )
    j = (
        pos.join(
            tri,
            (F.col("c2") == F.col("__t1"))
            & (F.col("c1") == F.col("__t2"))
            & (F.col("w") == F.col("__t3")),
            "left",
        )
        .join(
            tctx,
            (F.col("c2") == F.col("__tc1")) & (F.col("c1") == F.col("__tc2")),
            "left",
        )
        .join(
            pair,
            (F.col("c1") == F.col("__p1")) & (F.col("w") == F.col("__p2")),
            "left",
        )
        .join(bctx, F.col("c1") == F.col("__c1"), "left")
        .join(ug, F.col("w") == F.col("__ut"), "left")
    )
    p1 = F.pow(F.lit(2.0), F.coalesce(F.col("__ulogp"), F.lit(oov_logp)))
    p2s = (
        (F.coalesce(F.col("__n12"), F.lit(0)).cast("double") + alpha)
        / (
            F.coalesce(F.col("__n1"), F.lit(0)).cast("double")
            + alpha * (v + 1.0)
        )
    )
    p3s = (
        (F.coalesce(F.col("__n123"), F.lit(0)).cast("double") + alpha)
        / (
            F.coalesce(F.col("__n12c"), F.lit(0)).cast("double")
            + alpha * (v + 1.0)
        )
    )
    p2 = lam * p2s + (1.0 - lam) * p1
    p = (
        F.when(F.col("c1").isNull(), p1)
        .when(F.col("c2").isNull(), p2)
        .otherwise(lam * p3s + (1.0 - lam) * p2)
    )
    return (
        j.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            (-F.sum(F.log2(p)) / F.count(F.lit(1))).alias("avg_nll"),
        )
    )
