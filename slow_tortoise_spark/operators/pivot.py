"""Qualifier pivot (reference op V1).

The qualifier timeseries artifact is a wide table: one row per timestamp,
one column per qualifier value, cells holding one aggregate column
(/root/reference/flows/common.py:324-358 builds this manually with
groupby+zip; Spark's ``pivot`` is the native form).

Scale note: always pass explicit pivot values when known (the qualifier
value lists are computed anyway for the run summary) — that skips the
extra distinct-scan Spark otherwise runs, and bounds the column count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def qualifier_timeseries_pivot(
    df: DataFrame,
    qualifier: str,
    agg_column: str,
    values: list[str] | None = None,
    keys: list[str] = ("feature", "timestamp"),
) -> DataFrame:
    """Pivot (keys × qualifier) → wide columns of ``agg_column`` sums.

    Each (keys, qualifier value) pair is unique in the regional/global
    aggregation output, so ``first`` would equal ``sum``; ``sum`` keeps the
    operator total-preserving if callers pass pre-aggregation frames.
    """
    grouped = df.groupBy(*keys)
    pivoted = grouped.pivot(qualifier, values) if values else grouped.pivot(qualifier)
    return pivoted.agg(F.sum(agg_column))
