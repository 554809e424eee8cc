"""Vector column functions (array<numeric> → scalar/array).

Used by the similarity plans (SURVEY §2 G, F5) and available to users
composing their own queries. All builders are pure Column expressions —
JVM-evaluated, no Python in the hot path.

Determinism contract: ``dot``/``l2_norm`` fold left-to-right with a 0.0
seed, so cross-engine comparisons (DuckDB oracles, numpy loops that
accumulate dimension-wise) are bit-exact for IEEE doubles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-associated dot product of two equal-length numeric arrays."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def scale(a: Column | str, factor: Column | float) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.transform(a, lambda x: x.cast("double") * factor)


def add(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.zip_with(a, b, lambda x, y: x.cast("double") + y.cast("double"))


def normalize(a: Column | str) -> Column:
    """Unit-normalize; zero vectors pass through unchanged."""
    a = F.col(a) if isinstance(a, str) else a
    nrm = l2_norm(a)
    return F.when(nrm == 0.0, scale(a, 1.0)).otherwise(scale(a, F.lit(1.0) / nrm))
