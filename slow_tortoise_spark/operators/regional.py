"""Regional rollup family (reference ops P10, P12, R1–R2).

A "region" is the concatenation of admin levels down to a target depth:
``region_id = country__admin1__...`` with missing levels rendered as the
literal ``"None"`` (/root/reference/flows/common.py:473-497). The rollup
family aggregates temporal output per (feature, timestamp, region_id
[, qualifier]) at each admin level 0..3.

Scale note: the reference loops the four levels as four separate
aggregations. We expose both that shape (`regional_aggregation` per
level — simple, each a single shuffle) and a one-pass variant built on
``ROLLUP`` (`regional_aggregation_all_levels`) that computes every level
in a single shuffle via Catalyst's Expand — at 100 TB the one-pass form
reads the temporal output once instead of four times.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from slow_tortoise_spark.operators.spatial import spatial_aggregation
from slow_tortoise_spark.schema import (
    NULL_TOKEN,
    REGION_ID_DELIMITER,
    REGION_LEVELS,
)


def extract_region_columns(df: DataFrame) -> list[str]:
    """P10: region columns present in the frame, ordered country→admin3."""
    return [c for c in REGION_LEVELS if c in df.columns]


def join_region_columns(
    df: DataFrame, level: int, column_name: str = "region_id"
) -> DataFrame:
    """P12: add ``region_id`` = levels[0..level] joined with ``__``.

    Missing/null levels render as the literal "None" so every region_id has
    exactly ``level + 1`` segments.
    """
    present = extract_region_columns(df)
    parts: list[Column] = []
    for lvl in REGION_LEVELS[: level + 1]:
        if lvl in present:
            parts.append(F.coalesce(F.col(lvl), F.lit(NULL_TOKEN)))
        else:
            parts.append(F.lit(NULL_TOKEN))
    return df.withColumn(column_name, F.concat_ws(REGION_ID_DELIMITER, *parts))


def regional_aggregation(
    df_temporal: DataFrame,
    level: int,
    qualifier: str | None = None,
    aggs: list[str] = ("sum", "mean"),
    weight_column: str = "",
) -> DataFrame:
    """R1/R2 single level: aggregate per (feature, timestamp, region_id
    [, qualifier]) at one admin level."""
    keys = ["feature", "timestamp", "region_id"]
    if qualifier:
        keys.append(qualifier)
    df = join_region_columns(df_temporal, level)
    return spatial_aggregation(df, keys=keys, aggs=list(aggs),
                               weight_column=weight_column)


def regional_aggregation_all_levels(
    df_temporal: DataFrame,
    aggs: list[str] = ("sum", "mean"),
    weight_column: str = "",
    max_level: int | None = None,
    qualifier: str | None = None,
) -> DataFrame:
    """R1 one-pass variant: all admin levels in a single shuffle via ROLLUP.

    Emits one row per (feature, timestamp, level, region_id[, qualifier]):
    the ROLLUP over (country, admin1, admin2, admin3) produces every
    prefix grouping; we post-split by counting non-null grouping flags.
    The grand-total row (no region at all) is dropped — the reference has
    no level "-1".  With ``qualifier`` set, the qualifier column joins
    feature/timestamp as an always-grouped key, so the per-qualifier
    breakdown of every level still costs the same single shuffle
    (reference loops levels × qualifiers as separate aggregations:
    /root/reference/flows/data_pipeline.py:554-586).
    """
    present = extract_region_columns(df_temporal)
    if not present:
        raise ValueError("no region columns present")
    levels = REGION_LEVELS[: (max_level + 1) if max_level is not None else None]
    levels = [c for c in levels if c in present]

    t_cols = [c for c in ("t_sum", "t_mean", "t_wavg") if c in df_temporal.columns]
    exprs = []
    for g in aggs:
        fn = {"sum": F.sum, "mean": F.avg, "min": F.min, "max": F.max,
              "count": F.count}[g]
        for t in t_cols:
            exprs.append(fn(t).alias(f"s_{g}_t{t[1:]}"))
    if weight_column:
        w = F.col(weight_column)
        for t in t_cols:
            exprs.append((F.sum(F.col(t) * w) / F.sum(w)).alias(f"s_wavg_t{t[1:]}"))
    exprs.append(F.count("t_mean").alias("s_count"))

    fixed_keys = ["feature", "timestamp"] + ([qualifier] if qualifier else [])
    rolled = (
        df_temporal.rollup(*fixed_keys, *levels)
        .agg(*exprs, F.grouping_id().alias("_gid"))
        # keep rows where feature+timestamp are real groups and at least
        # country is grouped: grouping_id bit i set = column i NOT grouped.
        .filter(F.expr("_gid < " + str(2 ** len(levels))))
    )
    # ROLLUP drops columns from the right, so the only surviving gids are
    # 2^k - 1 (k region columns dropped) → level = n - k - 1; k = n means
    # no region columns at all (the grand total per feature+ts) → dropped.
    n = len(levels)
    mapping = F.create_map(
        *[x for k in range(n + 1) for x in (F.lit(2**k - 1), F.lit(n - k - 1))]
    )
    rolled = rolled.withColumn("level", mapping[F.col("_gid")]).filter(
        F.col("level") >= 0
    )
    # region_id only includes levels up to `level`: slice the parts array.
    parts = F.array(*[F.coalesce(F.col(c), F.lit(NULL_TOKEN)) for c in levels])
    rolled = rolled.withColumn(
        "region_id",
        F.array_join(F.slice(parts, 1, F.col("level") + 1), REGION_ID_DELIMITER),
    )
    return rolled.drop("_gid", *levels)
