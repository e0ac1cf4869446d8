"""Skew-resistant aggregation (two-phase salted combine).

When a handful of grouping keys dominate (one country holds half the
observations, one feature is 100× the rest), the single-shuffle
``groupBy`` puts a whole hot key into one reducer task. AQE's skew-join
splitting doesn't help aggregations, so the classic fix is salting:

    phase 1: groupBy(keys + salt) — the hot key spreads over S tasks
    phase 2: groupBy(keys) re-combining the partials

Only algebraic aggregates decompose this way; this module implements the
common set (sum / count / min / max and mean via sum+count). Results are
identical to the direct aggregation (modulo float addition order, like
any shuffle-order change).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_expr(df: DataFrame, salt_buckets: int) -> Column:
    """Phase-1 salt with guaranteed entropy on identical rows.

    A content-only salt (``hash(*columns)``) is degenerate on the exact
    shape salting exists for: a hot key whose rows are *identical in
    every column* (dominant (feature, value) pairs in exact-dup-heavy
    corpora) would map to ONE bucket and stay in one reducer.  So the
    salt mixes three terms, each reduced mod ``salt_buckets`` BEFORE
    the final add (both addends sit in ``[0, salt_buckets)``, so the
    sum is at most ``2*salt_buckets - 2`` — no int64 overflow, and no
    ``ArithmeticException`` under ``spark.sql.ansi.enabled``, unlike a
    raw ``xxhash64 + monotonically_increasing_id`` long add):

    - ``xxhash64(row columns, spark_partition_id())`` — the PRIMARY
      mixer.  Row content is order-independent and the partition id is
      stable across task retries, so distinct-content rows rebucket
      identically on a partial stage retry;
    - ``monotonically_increasing_id() % salt_buckets`` — the
      per-partition row ordinal, which is what spreads a
      single-partition run of IDENTICAL rows across buckets.

    The ordinal term is row-ORDER dependent: if a shuffle feeds this
    operator and a partial stage retry replays input rows in a
    different order (the SPARK-23207 class of hazard), identical rows
    may land in different phase-1 buckets across attempts.  That is
    benign HERE — the salt never appears in the output and phase 2
    re-combines partials regardless of bucketing — but it is why this
    expression must never be reused as a persisted bucketing/split key
    (use a pure content hash for those, e.g. ``dedup.hash_split``).
    """
    content = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns], F.spark_partition_id()),
        F.lit(salt_buckets),
    )
    ordinal = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets))
    return F.pmod(content + ordinal, F.lit(salt_buckets)).cast("int")

#: (partial expr builder, final expr builder) per supported aggregate.
_ALGEBRAIC = {
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_aggregation(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name → (fn, column),
    fn ∈ {sum, count, min, max, mean}.

    ``mean`` decomposes into sum+count internally. The salt is an
    overflow-free mix of the row-content hash, the partition id, and
    the per-partition row ordinal (see ``_salt_expr``) — identical-row
    hot keys still spread across phase-1 buckets; the salt never
    appears in the output.
    """
    partials = []
    finals = []
    for out, (fn, col) in aggs.items():
        if fn == "mean":
            partials.append(F.sum(col).alias(f"__s_{out}"))
            partials.append(F.count(col).alias(f"__c_{out}"))
            finals.append(
                (F.sum(f"__s_{out}") / F.sum(f"__c_{out}")).alias(out)
            )
        elif fn in _ALGEBRAIC:
            part, final = _ALGEBRAIC[fn]
            partials.append(part(F.col(col)).alias(f"__p_{out}"))
            finals.append(final(F.col(f"__p_{out}")).alias(out))
        else:
            raise ValueError(f"{fn!r} is not an algebraic aggregate")

    salted = df.withColumn("__salt", _salt_expr(df, salt_buckets))
    phase1 = salted.groupBy(*keys, "__salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)


def skew_report(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Hot-key diagnostic: per column, the most frequent value, its
    count, and its share of all rows — the number that tells you whether
    a groupBy/join on that column needs salting (share ≈ 1/partitions is
    fine; share ≥ a few percent means one reducer owns that key).

    One pass: columns melt to (col_name, value) rows via ``stack``
    (values stringified to share a schema), ONE groupBy over
    (col_name, value), and a per-column top-1 window.  Ties break on the
    value string for cross-engine determinism.  NULLs count as a value —
    a mostly-NULL column is exactly the kind of skew this should
    surface.

    Returns (col_name, top_value, top_count, n_rows, share).
    """
    cols = list(cols or df.columns)
    pairs = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in cols
    )
    melted = df.selectExpr(
        f"stack({len(cols)}, {pairs}) as (col_name, value)"
    )
    counts = melted.groupBy("col_name", "value").agg(
        F.count("*").alias("cnt")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("col_name").orderBy(
        F.desc("cnt"), F.col("value").asc_nulls_first()
    )
    total = df.count()
    return (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "col_name",
            F.col("value").alias("top_value"),
            F.col("cnt").alias("top_count"),
            F.lit(total).alias("n_rows"),
            F.round(F.col("cnt") / F.lit(float(total)), 6).alias("share"),
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join by salting: the big side's rows spread
    over ``salt_buckets`` sub-keys (RNG-free ``_salt_expr`` — row hash
    mixed with the partition/row ordinal so identical rows still spread),
    the small side REPLICATES once per bucket, and the join runs on
    (key, salt).  A hot key's rows land in S different reducer tasks
    instead of one straggler — the manual fallback when AQE's skew
    splitting can't kick in (e.g. the skewed side feeds a cached or
    bucketed exchange AQE won't re-plan, or the join is part of a
    stream's static side).

    Result rows are EXACTLY the plain join's (every big row meets the
    one replica of its partner that carries its salt).  Cost: the small
    side shuffles ``salt_buckets``× its size — use for big⋈small with a
    hot big-side key, never for two large inputs.

    ``how`` ∈ {inner, left}: left-outer keeps unmatched big rows (each
    exists exactly once because a big row has exactly one salt).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left only")
    big_s = big.withColumn("_salt", _salt_expr(big, salt_buckets))
    # Replicate via explode(sequence): a pure map-side Generate.  The
    # previous literal-true join against range(salt_buckets) planned as
    # BroadcastNestedLoopJoin — a broadcast exchange build (one extra
    # job per run) plus per-row join machinery for what is just "emit
    # each row salt_buckets times" (guide §2.4: remove joins/shuffles
    # that move no information).
    small_s = small.withColumn(
        "_salt",
        F.explode(
            F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")
        ),
    )
    out = big_s.join(small_s, [key_col, "_salt"], how)
    return out.drop("_salt")
