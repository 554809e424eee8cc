"""Generic distributed as-of join (SURVEY §2 C7 generalized).

``asof_join(left, right, ...)`` attaches, to every left row, the
columns of the most recent right row at-or-before its timestamp
(direction="backward"; "forward" takes the earliest at-or-after),
optionally within a tolerance window — the temporal-join primitive
behind feature lookups ("latest price as of order time") that neither
equi- nor range-joins express well.

Implementation: the scalable union + ordered-window pattern — both
sides are unioned on the partition keys, right-side values ride along
as tagged columns, and one ``last(..., ignorenulls=True)`` (or
``first`` for forward) per value column resolves the match inside a
single shuffle on the keys. No pairwise candidate join at any point:
a naive ``left.ts >= right.ts`` range join is O(|L|·|R|) per key and
explodes at 100 TB, while this is O((|L|+|R|) log) via the window sort.
Skewed keys behave like any window partition (salt upstream if one key
dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join; right columns arrive suffixed, unmatched → NULL.

    ``on`` — exact-match key(s); ``direction`` — "backward" (right.ts <=
    left.ts, latest wins) or "forward" (right.ts >= left.ts, earliest
    wins); ``tolerance_seconds`` — matches farther than this in time are
    nulled out.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)

    if left_ts not in left.columns:
        raise ValueError(
            f"left_ts {left_ts!r} is not a column of left: {left.columns}"
        )
    if right_ts not in right.columns:
        raise ValueError(
            f"right_ts {right_ts!r} is not a column of right: {right.columns}"
        )
    right_vals = [c for c in right.columns if c not in keys]
    if tolerance_seconds is not None and right_ts in keys:
        # right_ts is a join key: every match has gap 0, so a tolerance
        # is meaningless — and silently returning unfiltered matches
        # would look like the tolerance was applied. Fail loudly.
        raise ValueError(
            f"tolerance_seconds requires right_ts ({right_ts!r}) to be a "
            "value column, but it is one of the join keys"
        )
    collisions = {f"{c}{suffix}" for c in right_vals} & set(left.columns)
    if collisions:
        raise ValueError(
            f"suffixed right columns collide with left columns: "
            f"{sorted(collisions)}; pass a different suffix"
        )
    lhs = left.withColumn("__t", F.col(left_ts)).withColumn(
        "__is_left", F.lit(True)
    )
    for c in right_vals:
        lhs = lhs.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    rhs = right.withColumn("__t", F.col(right_ts)).withColumn(
        "__is_left", F.lit(False)
    )
    # capture right values BEFORE nulling out columns that share a name
    # with the left side (e.g. both sides having `ts`)
    for c in right_vals:
        rhs = rhs.withColumn(f"__r_{c}", F.col(c))
    for c in left.columns:
        if c not in keys:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    cols = keys + [c for c in left.columns if c not in keys] + [
        f"__r_{c}" for c in right_vals
    ] + ["__t", "__is_left"]
    combined = lhs.select(*cols).unionByName(rhs.select(*cols))

    # At equal __t the right row must resolve first so "at-or-before"
    # (resp. at-or-after) is inclusive: sort right (False) before left.
    # Forward = the same latest-so-far scan over time reversed.
    t_order = F.asc("__t") if direction == "backward" else F.desc("__t")
    w = (
        Window.partitionBy(*keys)
        .orderBy(t_order, F.asc("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = combined
    for c in right_vals:
        matched = matched.withColumn(
            f"__m_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w)
        )
    matched = matched.filter(F.col("__is_left"))

    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_micros(F.col("__t")) - F.unix_micros(F.col(f"__m_{right_ts}"))
        ) / 1e6
        in_tol = F.col(f"__m_{right_ts}").isNotNull() & (gap <= tolerance_seconds)
        for c in right_vals:
            matched = matched.withColumn(
                f"__m_{c}", F.when(in_tol, F.col(f"__m_{c}"))
            )

    out_cols = keys + [c for c in left.columns if c not in keys] + [
        F.col(f"__m_{c}").alias(f"{c}{suffix}") for c in right_vals
    ]
    return matched.select(*out_cols)
