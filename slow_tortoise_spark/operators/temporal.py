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


def resample_timeseries(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "timestamp",
    value_col: str = "value",
    step_ms: int = 86_400_000,
    fill: str = "zero",
) -> DataFrame:
    """Regularize a sparse per-key timeseries onto a fixed grid: every
    key gets one row per ``step_ms`` tick from its own min to max
    timestamp, observed values land on their tick, and gaps fill with
    ``"zero"`` (0.0), ``"null"``, ``"ffill"`` (carry the last
    observation forward), or ``"linear"`` (interpolate between the
    bracketing observations) — the densification pass a downstream
    model/chart needs before windowed math on irregular data.

    Plan shape: one per-key (min, max) aggregate, an in-row
    ``sequence()`` explode (each key's grid generates inside its own
    task — no cross-key shuffle), one left join back onto the
    observations at (key, tick) grain, and — for ``ffill`` only — a
    per-key ordered window (``last(ignorenulls)`` over the unbounded
    preceding frame).  Keys partition the window, so the sort is
    per-key, not global; a pathologically long single series is the
    same single-task caveat as any per-key window (range-chunk the key
    if that ever bites).  Ticks snap DOWN to the grid origin (epoch 0),
    so observations between ticks aggregate onto their floor tick —
    multiple observations in one (key, tick) sum (zero/null modes) or
    take the tick's last value by original timestamp (ffill mode uses
    the summed tick value too; "last" semantics belong to as-of joins).

    Returns key_cols + (tick bigint, value double, observed int).
    """
    from pyspark.sql.window import Window

    if fill not in ("zero", "null", "ffill", "linear"):
        raise ValueError(f"unknown fill mode {fill!r}")
    # Integer FLOOR division: `(ts / step).cast("long")` truncates
    # toward zero, so pre-epoch (negative) timestamps would snap UP,
    # contradicting both the snap-DOWN contract and the oracle's
    # `epoch_ms // step` (round-5 ADVICE).
    tick = (F.floor(F.col(ts_col) / F.lit(step_ms)).cast("long") * step_ms)
    obs = (
        df.select(*key_cols, tick.alias("tick"),
                  F.col(value_col).cast("double").alias("v"))
        .groupBy(*key_cols, "tick")
        .agg(F.sum("v").alias("v"))
    )
    spans = obs.groupBy(*key_cols).agg(
        F.min("tick").alias("_lo"), F.max("tick").alias("_hi")
    )
    grid = spans.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step_ms))
        ).alias("tick"),
    )
    joined = grid.join(obs, [*key_cols, "tick"], "left")
    observed = F.when(F.col("v").isNotNull(), F.lit(1)).otherwise(F.lit(0))
    if fill == "zero":
        val = F.coalesce(F.col("v"), F.lit(0.0))
    elif fill == "null":
        val = F.col("v")
    elif fill == "ffill":
        w = (
            Window.partitionBy(*key_cols)
            .orderBy("tick")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        val = F.last("v", ignorenulls=True).over(w)
    else:  # linear: interpolate between the bracketing observations
        back = (
            Window.partitionBy(*key_cols)
            .orderBy("tick")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fwd = (
            Window.partitionBy(*key_cols)
            .orderBy("tick")
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        obs_tick = F.when(F.col("v").isNotNull(), F.col("tick"))
        v0 = F.last("v", ignorenulls=True).over(back)
        t0 = F.last(obs_tick, ignorenulls=True).over(back)
        v1 = F.first("v", ignorenulls=True).over(fwd)
        t1 = F.first(obs_tick, ignorenulls=True).over(fwd)
        # grid spans min..max tick per key, so every gap is bracketed
        val = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
            v0 + (v1 - v0) * (F.col("tick") - t0) / (t1 - t0)
        )
    return joined.select(
        *key_cols, "tick", val.alias("value"), observed.alias("observed")
    )
