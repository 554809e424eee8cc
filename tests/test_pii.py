"""PII scrub APPLICATION (operators/pii.py) — the r13 verdict's
"apply it, don't just audit it" item.

Evidence pattern: a sequential Python ``re`` reference over the same
patterns (ASCII-only corpus — Java's ``\\d`` is ASCII-only by default
while Python's is Unicode, so the twin is exact only on ASCII, which
is what the patterns target), plan pins (one JVM projection, zero
Python, zero shuffles), the class-order pin, fail-loud column
collisions, and reconciliation with the A7 audit's arithmetic.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from drive_bc_datapipeline_spark.operators.pii import (
    PII_CLASSES,
    PII_ORDER,
    scrub_pii,
)

ROWS = [
    (1, "contact me at jane.doe+spam@example.co.uk or x@y.io today"),
    (2, "server 10.0.42.7 answered, fallback 192.168.0.1 timed out"),
    (3, "order #12345 shipped 2024 items to box 7"),
    (4, "mixed: a1b@c2.com from 8.8.8.8 cost 99 dollars"),
    (5, "no pii here at all"),
    (6, ""),
    (7, "123.456.789.012.345 not an ip but digit soup"),
]


def _seq_scrub(text: str, classes=PII_ORDER, repl: str = "") -> str:
    for cls in classes:
        text = re.sub(PII_CLASSES[cls], repl, text)
    return text


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_scrub_matches_sequential_reference(spark, docs):
    out = scrub_pii(docs)
    # in-place scrub preserves the schema, order included
    assert out.columns == docs.columns
    got = {
        r["doc_id"]: r["text"]
        for r in out.orderBy("doc_id").collect()
    }
    want = {i: _seq_scrub(t) for i, t in ROWS}
    assert got == want
    # no email / ip / digit survives anywhere
    for t in got.values():
        for pat in PII_CLASSES.values():
            assert not re.search(pat, t), (t, pat)


def test_scrub_class_order_is_load_bearing(spark, docs):
    """digits-first would eat the digits INSIDE an address, leaving a
    mutilated local part the email pattern no longer fully matches —
    the operator's email→ipv4→digits order must win."""
    wrong = ("digits", "ipv4", "email")
    # digit removal empties the local part, so the email pattern no
    # longer matches and "@.com" debris survives the wrong order
    t = "code 12@34.com end"
    assert _seq_scrub(t) != _seq_scrub(t, classes=wrong)
    got = scrub_pii(
        spark.createDataFrame([(1, t)], "doc_id long, text string")
    ).first()["text"]
    assert got == _seq_scrub(t)


def test_scrub_counts_ride_same_projection(spark, docs):
    out = scrub_pii(docs, with_counts=True)
    rows = {r["doc_id"]: r for r in out.collect()}
    for i, t in ROWS:
        r = rows[i]
        assert r["n_email"] == len(re.findall(PII_CLASSES["email"], t))
        assert r["n_ipv4"] == len(re.findall(PII_CLASSES["ipv4"], t))
        assert r["n_digits"] == len(re.findall(PII_CLASSES["digits"], t))
        assert r["pii_chars_removed"] == len(t) - len(_seq_scrub(t))
    # the counts rode the scrub's own projection: one stage, no
    # exchange, no Python anywhere
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan


def test_scrub_out_col_and_subset_classes(spark, docs):
    out = scrub_pii(docs, out_col="clean", classes=("email",))
    r = {x["doc_id"]: x for x in out.collect()}
    # original preserved, only emails removed in the copy
    assert r[1]["text"] == ROWS[0][1]
    assert r[1]["clean"] == _seq_scrub(ROWS[0][1], classes=("email",))
    assert r[3]["clean"] == _seq_scrub(ROWS[2][1], classes=("email",))


def test_scrub_fail_loud_guards(spark, docs):
    with pytest.raises(ValueError, match="no column"):
        scrub_pii(docs, text_col="body")
    with pytest.raises(ValueError, match="already exists"):
        scrub_pii(docs, out_col="doc_id")
    with pytest.raises(ValueError, match="unknown PII class"):
        scrub_pii(docs, classes=("email", "ssn"))
    clash = docs.withColumn("n_email", F.lit(1))
    with pytest.raises(ValueError, match="count column"):
        scrub_pii(clash, with_counts=True)


def test_scrub_reconciles_with_a7_audit(spark, docs):
    """The A7 audit (pii_scrub_stats) and this scrub share ONE
    expression builder — Σ per-class counts and Σ chars_removed from
    with_counts must equal a groupBy over the same relation computed
    the audit's way."""
    out = scrub_pii(docs, with_counts=True)
    agg = out.agg(
        F.sum("n_email").alias("e"),
        F.sum("n_ipv4").alias("i"),
        F.sum("n_digits").alias("d"),
        F.sum("pii_chars_removed").alias("c"),
    ).first()
    want_e = sum(len(re.findall(PII_CLASSES["email"], t)) for _i, t in ROWS)
    want_i = sum(len(re.findall(PII_CLASSES["ipv4"], t)) for _i, t in ROWS)
    want_d = sum(len(re.findall(PII_CLASSES["digits"], t)) for _i, t in ROWS)
    want_c = sum(len(t) - len(_seq_scrub(t)) for _i, t in ROWS)
    assert (agg["e"], agg["i"], agg["d"], agg["c"]) == (
        want_e, want_i, want_d, want_c,
    )
