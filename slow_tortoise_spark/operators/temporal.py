"""Temporal aggregation (reference ops A1–A3).

The datacube keeps time as epoch-**milliseconds** int64 end-to-end. A
temporal aggregation truncates the timestamp to the start of its month /
year (UTC) — or to 0 for the "all-time" resolution — then groups by every
column except ``value`` and computes:

    t_sum  = sum(value)
    t_mean = mean(value)
    t_wavg = sum(value * w) / sum(w)          (only when weighted)
    <w>    = mean(w) per group                (weight carried forward)

Semantics match /root/reference/flows/common.py:37-91 (aggregation) and
:437-455 (truncation, UTC, NaT→0). Everything is native Column math —
``timestamp_millis``/``date_trunc``/``unix_millis`` plus one hash
aggregate — so the pass is one shuffle with map-side partial aggregation,
and whole-stage codegen covers the truncation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from slow_tortoise_spark.schema import TIME_RESOLUTIONS


def to_normalized_time(col: Column, time_res: str) -> Column:
    """A2: truncate an epoch-ms column to month/year start (UTC) or 0 for 'all'.

    Null timestamps normalize to 0, matching the reference's NaT→0 rule.
    Requires spark.sql.session.timeZone=UTC (set by session.get_spark).
    """
    if time_res not in TIME_RESOLUTIONS:
        raise ValueError(f"time_res must be one of {TIME_RESOLUTIONS}, got {time_res!r}")
    if time_res == "all":
        return F.lit(0).cast("long")
    truncated = F.unix_millis(F.date_trunc(time_res, F.timestamp_millis(col)))
    return F.coalesce(truncated, F.lit(0)).cast("long")


def temporal_aggregation(
    df: DataFrame,
    time_res: str,
    weight_column: str = "",
) -> DataFrame:
    """A1/A3: truncate time, then group by all non-value columns.

    Grouping by "all columns except value" means a (timestamp, regions,
    lat, lng, feature, qualifiers...) composite key — high cardinality but
    shrinking: at 100 TB this is the big shuffle of the pipeline, and it is
    exactly one shuffle with partial aggregation (HashAggregate partial →
    exchange → final), which AQE right-sizes.
    """
    df = df.withColumn("timestamp", to_normalized_time(F.col("timestamp"), time_res))

    exclude = {"value", weight_column} if weight_column else {"value"}
    keys = [c for c in df.columns if c not in exclude]

    aggs = [
        F.sum("value").alias("t_sum"),
        F.avg("value").alias("t_mean"),
    ]
    if weight_column:
        w = F.col(weight_column)
        aggs.append(
            (F.sum(F.col("value") * w) / F.sum(w)).alias("t_wavg")
        )
        # carry the weight forward so spatial wavg can reuse it
        aggs.append(F.avg(w).alias(weight_column))
    return df.groupBy(*keys).agg(*aggs)
