"""PII scrubbing — APPLYING the redaction, not just auditing it.

The A7 query (``pii_scrub_stats``, plans/events.py) measures per-class
match counts and chars-removed; this operator is its operational
sibling (the ``mask_duplicated_spans`` pattern from F16): it RETURNS
the corpus with the scrubbed text so a pipeline can write redacted
data, with the per-class counters optionally riding the very same
projection.

Reference parity: the reference has no scrub at all (its etl*.py
passes raw `props` through) — this is part of the LLM-curation
extension surface, following the CCNet/Dolma practice of redacting
emails/IPs before training. Patterns are deliberately simple,
auditable regexes, not an NER model: the goal is the Spark-side
contract (one JVM projection, no Python, order-pinned classes).

The regex constants here are THE one copy (the doc_tokens /
CHAR_SPLIT_RE rule): plans/events.py imports them for the A7 audit,
so the audit's counts and this scrub's removals can never drift.

Class order matters and is part of the contract: EMAIL before IPV4
before DIGITS — an email's local part may contain digits, so
digits-first would mutilate the address and the email pattern would
no longer match what the audit counted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: The scrub classes, in application order (see module docstring).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_DIGITS = r"\d+"

PII_CLASSES: dict[str, str] = {
    "email": PII_EMAIL,
    "ipv4": PII_IPV4,
    "digits": PII_DIGITS,
}
#: application order — a dict's insertion order is the contract, but
#: the explicit tuple makes the pin greppable and testable
PII_ORDER: tuple[str, ...] = ("email", "ipv4", "digits")


def scrub_expr(
    col: Column | str,
    classes: tuple[str, ...] = PII_ORDER,
    replacement: str = "",
) -> Column:
    """The scrubbed-text expression: nested ``regexp_replace`` in
    class order, pure JVM (whole-stage codegen keeps it in one
    projection; never a Python UDF). Exposed separately so SQL-side
    oracles and the A7 audit can build the identical expression."""
    out = F.col(col) if isinstance(col, str) else col
    for cls in classes:
        if cls not in PII_CLASSES:
            raise ValueError(
                f"unknown PII class {cls!r}: choose from "
                f"{sorted(PII_CLASSES)}"
            )
        out = F.regexp_replace(
            out, F.lit(PII_CLASSES[cls]), F.lit(replacement)
        )
    return out


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    *,
    out_col: str | None = None,
    classes: tuple[str, ...] = PII_ORDER,
    replacement: str = "",
    with_counts: bool = False,
) -> DataFrame:
    """Return ``df`` with ``text_col`` scrubbed of the named PII
    classes (email / ipv4 / digit runs, applied in that order).

    ``out_col=None`` replaces ``text_col`` in place (the common
    pipeline shape: downstream stages keep reading ``text``); a named
    ``out_col`` keeps the original and must not collide with an
    existing column (fail loud, the family convention).
    ``with_counts=True`` adds one ``n_<class>`` bigint per scrubbed
    class plus ``pii_chars_removed`` — all riding the SAME projection
    as the scrub itself, so the audit costs no extra scan.

    Scale: one stage, zero shuffles, zero Python — N regex passes per
    row inside whole-stage codegen, exactly the A7 audit's cost. The
    scrub is NOT guaranteed idempotent (removing a match can splice
    the remaining text into a new match), so pipelines that need a
    fixpoint must re-audit with ``pii_scrub_stats`` downstream.
    """
    if text_col not in df.columns:
        raise ValueError(f"scrub_pii: no column {text_col!r} in input")
    target = out_col or text_col
    if out_col is not None and out_col in df.columns:
        raise ValueError(
            f"scrub_pii: output column {out_col!r} already exists — "
            "rename it or scrub in place (out_col=None)"
        )
    count_cols = [f"n_{cls}" for cls in classes] + ["pii_chars_removed"]
    if with_counts:
        clash = set(count_cols) & set(df.columns)
        if clash:
            raise ValueError(
                f"scrub_pii: count column(s) {sorted(clash)} already "
                "exist — rename them or pass with_counts=False"
            )
    src = F.col(text_col)
    scrubbed = scrub_expr(src, classes, replacement)
    # in-place scrub keeps the original column ORDER (downstream
    # parquet schemas and tests depend on it); out_col appends
    cols = [
        scrubbed.alias(c) if c == target else F.col(c)
        for c in df.columns
    ]
    if target not in df.columns:
        cols.append(scrubbed.alias(target))
    if with_counts:
        # counts are over the ORIGINAL text (what the scrub saw), so
        # they reconcile with the A7 audit run on the raw corpus
        for cls in classes:
            cols.append(
                F.regexp_count(src, F.lit(PII_CLASSES[cls]))
                .cast("bigint")
                .alias(f"n_{cls}")
            )
        cols.append(
            (F.length(src) - F.length(scrubbed))
            .cast("bigint")
            .alias("pii_chars_removed")
        )
    return df.select(*cols)
