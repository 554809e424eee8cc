"""Text column functions for the LLM-data-pipeline operators
(SURVEY §2 F/H): tokenization, shingling, counting — all pure Column
expressions over whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# BPE-ish pretokenizer: word pieces, numbers, or single non-space symbols
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_tokens(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def whitespace_token_count(text: Column | str) -> Column:
    return F.size(whitespace_tokens(text))


def regex_token_count(text: Column | str, pattern: str = BPE_TOKEN_RE) -> Column:
    """Count of BPE-style pretokens via regexp_extract_all."""
    text = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def word_shingles(tokens: Column | str, n: int) -> Column:
    """Array of word n-grams from a token array (empty when too short).

    Spark's sequence(1, 0) DESCENDS instead of being empty, hence the
    explicit short-document branch.
    """
    toks = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.expr("cast(array() as array<string>)"))


def char_shingles(text: Column | str, width: int) -> Column:
    """Array of rolling character w-grams (at least one, possibly short)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text) - (width - 1), F.lit(1))),
        lambda i: F.substring(text, i, width),
    )


def punct_ratio(text: Column | str, punct_re: str = "[.,!?;:]") -> Column:
    text = F.col(text) if isinstance(text, str) else text
    n_punct = F.length(text) - F.length(F.regexp_replace(text, punct_re, ""))
    return n_punct / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(tokens: Column | str, stopwords: tuple[str, ...]) -> Column:
    toks = F.col(tokens) if isinstance(tokens, str) else tokens
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))
