"""Distributed weighted sampling (SURVEY §2 K20).

Weighted reservoir sampling without replacement, Efraimidis-Spirakis
(A-Res): each row draws u ~ U(0,1] and keys itself by u^(1/w); the
sample is the global top-k under that key. On Spark the whole
algorithm therefore collapses to ONE expression + TakeOrdered — a
per-partition partial top-k and a k-row merge, no global sort, no
reservoir state, no driver loop. That IS the 100 TB path: the same
shape Spark uses for any top-k.

Determinism: u comes from xxhash64(id, seed) mapped into (0, 1], so a
given (seed, corpus) always draws the same sample on any cluster, any
partitioning — reproducible pipeline sampling (and testable against a
sequential reference, tests/test_ml_geo_operators.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_U64_SPAN = 18446744073709551616.0  # 2^64, uniform-map denominator
_U64_HALF = 9223372036854775808.0  # 2^63, signed-hash offset
_U_NUDGE = 2.0**-64  # post-division nudge keeping u strictly positive


def _hash_unit(col, seed: int):
    """u(id, seed) in (0, 1]: xxhash64 mapped through
    (h + 2^63) / 2^64 + 2^-64.

    The nudge is added AFTER the division: a pre-division "+1" (2^63+1)
    is not representable in double and silently rounds away, leaving
    u == 0 exactly for hash == -2^63 and a NULL log. Post-division,
    hash == -2^63 maps to 2^-64 > 0 (finite log); for u >= ~2^-11 the
    nudge is below double epsilon and a no-op, so the draw distribution
    is unchanged. The map is many-to-one at BOTH extremes: besides the
    low-end collisions, hashes within ~2^11 of +2^63 round up to
    u == 1.0 exactly (double has 53 mantissa bits), so their keys tie
    at log(1.0)/w == 0. Harmless for determinism — the callers'
    orderings all carry an id tiebreak — but u is not injective.
    """
    return (
        F.xxhash64(col, F.lit(seed)).cast("double") + F.lit(_U64_HALF)
    ) / F.lit(_U64_SPAN) + F.lit(_U_NUDGE)


def hash_unit_py(h: int) -> float:
    """Sequential twin of ``_hash_unit`` for reference implementations
    in tests: takes the already-computed signed xxhash64 value."""
    return (float(h) + _U64_HALF) / _U64_SPAN + _U_NUDGE


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str,
    seed: int = 0,
) -> DataFrame:
    """k-row weighted sample without replacement (A-Res / top-k form).

    Rows with weight <= 0 or NULL are excluded (zero mass). Inclusion
    is by descending u^(1/w) — heavier rows draw systematically larger
    keys, and P(row i in sample) follows the Efraimidis-Spirakis
    without-replacement law. Ordering/limit is deterministic: the key
    is a pure function of (id, seed, weight) and ties (measure-zero in
    doubles, but possible for identical (id-hash, w)) break on id.
    """
    w = F.col(weight_col).cast("double")
    # u in (0, 1] with a finite log for every hash value, including
    # the -2^63 corner — see _hash_unit.
    u = _hash_unit(F.col(id_col), seed)
    # rank by u^(1/w) via the monotone log form log(u)/w: identical
    # ordering, immune to double underflow for tiny weights.
    key = F.log(u) / w
    return (
        df.filter(w > 0)
        .withColumn("__ares_key", key)
        .orderBy(F.desc("__ares_key"), F.col(id_col))
        .limit(k)
        .drop("__ares_key")
    )


def seeded_shuffle(
    df: DataFrame,
    id_col: str,
    seed: int = 0,
    n_shards: int = 64,
) -> DataFrame:
    """Deterministic global permutation for reproducible training-data
    order (SURVEY §2 L13): every row gets a shard and an intra-shard
    sort key, both pure functions of (id, seed) — the SAME corpus and
    seed yield the SAME shard contents and the SAME within-shard order
    on any cluster, any partitioning, any run.

    Why not a global sort by random key: ``repartitionByRange`` samples
    its boundaries per run (the L4 determinism lesson), so shard = file
    boundaries drift run-to-run even though the total order doesn't.
    Fixed-width hash bucketing has no sampling anywhere:

      shard = pmod(xxhash64(id, seed), n_shards)       -- which shard
      pos_key = xxhash64(id, seed + 1)                  -- order inside

    Writers emit reproducible epochs with
    ``.repartition(n_shards, "shard").sortWithinPartitions("shard",
    "pos_key")`` + ``partitionBy("shard")`` — one hash shuffle, local
    sorts bounded by shard size, never a single-task global sort. At
    100 TB the shuffle moves each row once; shard skew is hash-uniform
    (±O(sqrt(n/shards))).

    Independence of the two keys: distinct literal seeds make the
    shard and position draws independent xxhash64 streams; a row's
    shard says nothing about its position. ``id_col`` must be unique —
    it defines the permutation.
    """
    sid = F.col(id_col)
    return df.select(
        "*",
        F.pmod(F.xxhash64(sid, F.lit(seed)), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        F.xxhash64(sid, F.lit(seed + 1)).alias("pos_key"),
    )


def temperature_resample(
    df: DataFrame,
    source_col: str,
    tau: float = 0.7,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based source mixing by deterministic repetition
    (SURVEY §2 H40): re-weights a multi-source corpus toward
    q_s ∝ p_s^tau (tau < 1 upweights rare sources — the standard
    multilingual/LLM mixing rule), keeping total size ≈ unchanged.

    Each row's multiplicity m_s = q_s / p_s is realized as
    floor(m_s) copies plus one more iff the row's uniform hash draw
    u(id, seed) < frac(m_s) — so per-source totals are exact up to the
    deterministic per-row draws (no RNG state, reproducible anywhere),
    and rows of downweighted sources drop with probability 1 - m_s.

    Plan shape: one scan for per-source counts (a |sources|-row
    aggregate broadcast back), one scan fanned out by
    explode(sequence(1, n_copies)) — no shuffle of the fact beyond the
    tiny count aggregate; the output carries a copy index so exact
    dedup downstream can distinguish intentional repetition.
    """
    p = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("__n_s"))
        .withColumn("__n_tot", F.sum("__n_s").over(Window.partitionBy()))
        .withColumn(
            "__q_raw", F.pow(F.col("__n_s") / F.col("__n_tot"), F.lit(tau))
        )
        .withColumn(
            "__m",
            (F.col("__q_raw") / F.sum("__q_raw").over(Window.partitionBy()))
            / (F.col("__n_s") / F.col("__n_tot")),
        )
        .select(source_col, "__m")
    )
    u = _hash_unit(F.col(id_col), seed)
    n_copies = (
        F.floor("__m") + F.when(u < F.col("__m") % 1.0, 1).otherwise(0)
    ).cast("int")
    return (
        df.join(F.broadcast(p), source_col)
        .withColumn("__copies", n_copies)
        .filter(F.col("__copies") > 0)
        .select(
            "*",
            F.explode(F.sequence(F.lit(1), F.col("__copies"))).alias(
                "copy_idx"
            ),
        )
        .drop("__m", "__copies")
    )


def group_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    eval_frac: float,
    seed: int = 0,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Leakage-safe train/eval split (SURVEY §2 F17): near-duplicate
    rows land on the SAME side, or the eval set silently contains
    paraphrases of training rows and overstates generalization — the
    dedup-aware split that large-corpus dedup work (Lee et al. 2022)
    prescribes and a per-row random split violates.

    ``pairs`` is any near-dup pair relation (src, dst) — MinHash-LSH,
    SimHash, embedding-LSH output all fit. Pair-graph components are
    resolved distributed (graph.connected_components, min-label
    O(diameter)); a row in no pair is its own group. ONE split draw
    per group: u = hash_unit(group_rep, seed) < eval_frac, so group
    membership is atomic and the assignment is a pure function of
    (ids, seed) — reproducible on any cluster, partitioning, or run.

    Scale: components run over near-dup pairs only (|pairs| ≪
    |corpus| after LSH banding); the group map joins back on the id
    (one shuffle on the join key); singletons take
    coalesce(component, own id) and never enter the CC iteration.

    Returns df + (group_rep, split) with split ∈ {'train', 'eval'}.
    ``df`` must not already carry the output columns (group_rep,
    split) or the reserved ``__component`` working name — raised
    rather than silently shadowed (r10, the temperature_resample
    __-prefix discipline).
    """
    from drive_bc_datapipeline_spark.operators.graph import (
        connected_components,
    )

    if not 0.0 <= eval_frac <= 1.0:
        raise ValueError(f"eval_frac must be in [0, 1], got {eval_frac}")
    clash = [c for c in df.columns if c in ("group_rep", "split", "__component")]
    if clash:
        raise ValueError(
            f"group_split writes columns {clash}; rename them in df first"
        )
    comp = (
        connected_components(pairs, src=src, dst=dst)
        .withColumnRenamed("node", id_col)
        .withColumnRenamed("component", "__component")
    )
    joined = df.join(comp, id_col, "left")
    rep = F.coalesce(F.col("__component"), F.col(id_col))
    u = _hash_unit(rep, seed)
    return joined.select(
        *df.columns,
        rep.alias("group_rep"),
        F.when(u < F.lit(float(eval_frac)), F.lit("eval"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )
