"""Regional extrema (reference ops R3 + T1).

For each feature and each aggregate column, find the global min and max
value across all (region_id, timestamp) rows, emit **all tied rows**, and
cap the ties at 20 rows chosen by largest timestamp
(/root/reference/flows/common.py:500-541, nlargest(20, 'timestamp')).

Spark-first shape: one window min/max per feature (no self-join), a
filter for the tied rows, and a row_number cap — two window passes over
an already-aggregated (small) frame. The windows partition by feature,
so skew is bounded by per-feature row counts, not data volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def regional_extrema(
    df_regional: DataFrame,
    agg_columns: list[str],
    tie_cap: int = 20,
    keys: list[str] = ("feature",),
) -> DataFrame:
    """Return rows (*keys, kind, agg_col, region_id, timestamp, value).

    ``kind`` ∈ {'min','max'}; at most ``tie_cap`` tied rows per
    (*keys, kind, agg_col), preferring the largest timestamps.  ``keys``
    defaults to per-feature extrema; pass ``["feature", "level"]`` to get
    the reference's per-admin-level stats artifacts
    (/root/reference/flows/common.py:500-541 computes one extrema set per
    region level, not one across all levels).

    A row that is simultaneously the min AND the max (every value in the
    group equal — the degenerate case the reference's own comment calls
    out) is emitted under BOTH kinds, matching the reference's
    independent min/max row selections.
    """
    keys = list(keys)
    # Melt the agg columns into (agg_col, value) rows so one window pass
    # covers every column — N columns cost one shuffle, not N.
    melted = df_regional.select(
        *keys,
        "region_id",
        "timestamp",
        F.explode(
            F.array(*[
                F.struct(F.lit(c).alias("agg_col"), F.col(c).alias("value"))
                for c in agg_columns
            ])
        ).alias("m"),
    ).select(*keys, "region_id", "timestamp", "m.agg_col", "m.value")

    per_group_col = Window.partitionBy(*keys, "agg_col")
    flagged = melted.withColumn(
        "_min", F.min("value").over(per_group_col)
    ).withColumn("_max", F.max("value").over(per_group_col))
    # Independent min- and max-hit streams (not a mutually-exclusive
    # CASE): a value equal to both bounds explodes into both kinds.
    kinds = F.array_compact(
        F.array(
            F.when(F.col("value") == F.col("_min"), F.lit("min")),
            F.when(F.col("value") == F.col("_max"), F.lit("max")),
        )
    )
    hits = (
        flagged.withColumn("kind", F.explode(kinds))
        .drop("_min", "_max")
    )

    cap_window = Window.partitionBy(*keys, "kind", "agg_col").orderBy(
        F.col("timestamp").desc(), F.col("region_id")
    )
    return (
        hits.withColumn("_rn", F.row_number().over(cap_window))
        .filter(F.col("_rn") <= tie_cap)
        .drop("_rn")
        .select(*keys, "kind", "agg_col", "region_id", "timestamp", "value")
    )
