"""Spatial aggregation (reference ops A4–A5).

Takes the output of temporal aggregation (columns ``t_sum``, ``t_mean``,
optionally ``t_wavg`` + a carried weight column) and aggregates over a
caller-supplied key set — (feature, timestamp) for global timeseries,
plus region_id / qualifier / subtile for the other families. For each
requested spatial function ``g`` and each temporal column ``t_X``:

    s_g_t_X     = g(t_X)
    s_wavg_t_X  = sum(t_X * w) / sum(w)       (only when weighted)
    s_count     = count(t_mean)               (always)

Naming contract from /root/reference/flows/common.py:97-160. One
``groupBy().agg()`` — a single shuffle with map-side combine; every
expression is codegen'd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from slow_tortoise_spark.schema import SPATIAL_AGGS, temporal_agg_columns

_AGG_FN = {
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
}


def spatial_aggregation(
    df: DataFrame,
    keys: list[str],
    aggs: list[str] = ("sum", "mean"),
    weight_column: str = "",
) -> DataFrame:
    """A4/A5: aggregate temporal outputs over ``keys``.

    ``aggs`` is the list of spatial functions (subset of
    ``{'sum','mean','min','max','count'}``); the reference's callers use
    ``['sum','mean']`` for timeseries/rollups, ``['sum']`` for tiling and
    ``['min','max','sum','mean']`` for the output summary.
    """
    bad = [a for a in aggs if a not in SPATIAL_AGGS]
    if bad:
        raise ValueError(f"unsupported spatial aggs {bad}; allowed: {SPATIAL_AGGS}")
    # 'count' is always emitted as the single s_count column, never as
    # s_count_t_* (reference strips it from the agg list the same way,
    # /root/reference/flows/common.py:111-113).
    aggs = [a for a in aggs if a != "count"]

    t_cols = [c for c in temporal_agg_columns(weight_column) if c in df.columns]
    exprs = []
    for g in aggs:
        for t in t_cols:
            exprs.append(_AGG_FN[g](t).alias(f"s_{g}_t{t[1:]}"))
    if weight_column:
        w = F.col(weight_column)
        for t in t_cols:
            exprs.append((F.sum(F.col(t) * w) / F.sum(w)).alias(f"s_wavg_t{t[1:]}"))
    exprs.append(F.count("t_mean").alias("s_count"))
    return df.groupBy(*keys).agg(*exprs)


def global_timeseries(
    df_temporal: DataFrame, weight_column: str = ""
) -> DataFrame:
    """Global (feature, timestamp) timeseries — the flagship artifact.

    Output columns: timestamp, s_sum_t_sum, s_mean_t_sum, s_sum_t_mean,
    s_mean_t_mean, s_count (+ wavg columns when weighted), per feature.
    """
    out = spatial_aggregation(
        df_temporal, keys=["feature", "timestamp"], aggs=["sum", "mean"],
        weight_column=weight_column,
    )
    ordered = ["feature", "timestamp", "s_sum_t_sum", "s_mean_t_sum",
               "s_sum_t_mean", "s_mean_t_mean"]
    extras = [c for c in out.columns if c not in ordered and c != "s_count"]
    return out.select(*ordered, *extras, "s_count")
