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
) -> DataFrame:
    """Return rows (feature, kind, agg_col, region_id, timestamp, value).

    ``kind`` ∈ {'min','max'}; at most ``tie_cap`` tied rows per
    (feature, kind, agg_col), preferring the largest timestamps.
    """
    # Melt the agg columns into (agg_col, value) rows so one window pass
    # covers every column — N columns cost one shuffle, not N.
    melted = df_regional.select(
        "feature",
        "region_id",
        "timestamp",
        F.explode(
            F.array(*[
                F.struct(F.lit(c).alias("agg_col"), F.col(c).alias("value"))
                for c in agg_columns
            ])
        ).alias("m"),
    ).select("feature", "region_id", "timestamp", "m.agg_col", "m.value")

    per_feature_col = Window.partitionBy("feature", "agg_col")
    flagged = melted.withColumn(
        "_min", F.min("value").over(per_feature_col)
    ).withColumn("_max", F.max("value").over(per_feature_col))
    hits = flagged.filter(
        (F.col("value") == F.col("_min")) | (F.col("value") == F.col("_max"))
    ).withColumn(
        "kind", F.when(F.col("value") == F.col("_min"), "min").otherwise("max")
    ).drop("_min", "_max")

    cap_window = Window.partitionBy("feature", "kind", "agg_col").orderBy(
        F.col("timestamp").desc(), F.col("region_id")
    )
    return (
        hits.withColumn("_rn", F.row_number().over(cap_window))
        .filter(F.col("_rn") <= tie_cap)
        .drop("_rn")
        .select("feature", "kind", "agg_col", "region_id", "timestamp", "value")
    )
