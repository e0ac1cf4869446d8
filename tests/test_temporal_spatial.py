"""Temporal + spatial aggregation semantics (reference A1–A5 golden cases:
monthly sum/mean, UTC truncation, weighted averages, s_*_t_* naming)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from slow_tortoise_spark.operators.spatial import global_timeseries, spatial_aggregation
from slow_tortoise_spark.operators.temporal import temporal_aggregation, to_normalized_time


def _ms(y, m, d):
    return int(dt.datetime(y, m, d, tzinfo=dt.timezone.utc).timestamp() * 1000)


def _cube(spark):
    # Two countries, one feature, observations inside the same months.
    rows = [
        Row(timestamp=_ms(2020, 1, 5), country="A", feature="f", value=1.0, w=1.0),
        Row(timestamp=_ms(2020, 1, 20), country="A", feature="f", value=3.0, w=3.0),
        Row(timestamp=_ms(2020, 1, 10), country="B", feature="f", value=10.0, w=1.0),
        Row(timestamp=_ms(2020, 2, 1), country="A", feature="f", value=5.0, w=1.0),
    ]
    return spark.createDataFrame(rows)


def test_to_normalized_time(spark):
    df = spark.createDataFrame(
        [Row(ts=_ms(2020, 3, 17)), Row(ts=None)]
    )
    out = df.select(
        to_normalized_time(F.col("ts"), "month").alias("m"),
        to_normalized_time(F.col("ts"), "year").alias("y"),
        to_normalized_time(F.col("ts"), "all").alias("a"),
    ).collect()
    assert out[0]["m"] == _ms(2020, 3, 1)
    assert out[0]["y"] == _ms(2020, 1, 1)
    assert out[0]["a"] == 0
    assert out[1]["m"] == 0  # NaT → 0


def test_temporal_aggregation_month(spark):
    t = temporal_aggregation(_cube(spark).drop("w"), "month")
    got = {(r["country"], r["timestamp"]): (r["t_sum"], r["t_mean"])
           for r in t.collect()}
    assert got[("A", _ms(2020, 1, 1))] == (4.0, 2.0)
    assert got[("B", _ms(2020, 1, 1))] == (10.0, 10.0)
    assert got[("A", _ms(2020, 2, 1))] == (5.0, 5.0)


def test_temporal_aggregation_weighted(spark):
    t = temporal_aggregation(_cube(spark), "month", weight_column="w")
    a_jan = [r for r in t.collect()
             if r["country"] == "A" and r["timestamp"] == _ms(2020, 1, 1)][0]
    # wavg = (1*1 + 3*3) / (1+3) = 2.5; carried weight = mean(1,3) = 2
    assert a_jan["t_wavg"] == 2.5 and a_jan["w"] == 2.0


def test_global_timeseries_contract(spark):
    t = temporal_aggregation(_cube(spark).drop("w"), "month")
    g = global_timeseries(t)
    assert g.columns == ["feature", "timestamp", "s_sum_t_sum", "s_mean_t_sum",
                         "s_sum_t_mean", "s_mean_t_mean", "s_count"]
    jan = [r for r in g.collect() if r["timestamp"] == _ms(2020, 1, 1)][0]
    # groups A(4,2) and B(10,10): s_sum_t_sum=14, s_mean_t_sum=7,
    # s_sum_t_mean=12, s_mean_t_mean=6, s_count=2
    assert (jan["s_sum_t_sum"], jan["s_mean_t_sum"], jan["s_sum_t_mean"],
            jan["s_mean_t_mean"], jan["s_count"]) == (14.0, 7.0, 12.0, 6.0, 2)


def test_spatial_weighted_and_summary_aggs(spark):
    t = temporal_aggregation(_cube(spark), "month", weight_column="w")
    s = spatial_aggregation(t, keys=["feature", "timestamp"],
                            aggs=["min", "max", "sum", "mean"],
                            weight_column="w")
    jan = [r for r in s.collect() if r["timestamp"] == _ms(2020, 1, 1)][0]
    assert jan["s_min_t_sum"] == 4.0 and jan["s_max_t_sum"] == 10.0
    # s_wavg_t_sum = (4*2 + 10*1) / (2+1) = 6.0
    assert jan["s_wavg_t_sum"] == 6.0
    assert jan["s_count"] == 2


def test_weighted_spatial_full_contract(spark):
    """Weighted spatial agg emits s_g_t_wavg for each spatial agg plus the
    three s_wavg_t_* columns computed against the carried weight — the
    rename/drop contract of the reference (flows/common.py:107-160)."""
    t = temporal_aggregation(_cube(spark), "month", weight_column="w")
    s = spatial_aggregation(t, keys=["feature", "timestamp"],
                            aggs=["sum", "mean", "count"], weight_column="w")
    cols = set(s.columns)
    assert {"s_sum_t_sum", "s_sum_t_mean", "s_sum_t_wavg",
            "s_mean_t_sum", "s_mean_t_mean", "s_mean_t_wavg",
            "s_wavg_t_sum", "s_wavg_t_mean", "s_wavg_t_wavg",
            "s_count"} <= cols
    # 'count' in the agg list must NOT produce s_count_t_* columns
    assert not any(c.startswith("s_count_t_") for c in cols)
    jan = [r for r in s.collect() if r["timestamp"] == _ms(2020, 1, 1)][0]
    # carried weights: A→mean(1,3)=2, B→1; t_wavg: A→2.5, B→10
    # s_wavg_t_wavg = (2.5*2 + 10*1)/(2+1) = 5.0
    assert jan["s_wavg_t_wavg"] == 5.0
    assert jan["s_count"] == 2


def test_resample_timeseries_fill_modes(spark):
    from slow_tortoise_spark.operators.temporal import resample_timeseries

    day = 86_400_000
    rows = [
        ("a", 0 * day, 1.0),
        ("a", 0 * day + 5, 2.0),   # same tick as above -> sums to 3.0
        ("a", 3 * day, 7.0),       # gap: days 1, 2 missing
        ("b", 10 * day, 4.0),      # single-point series
    ]
    df = spark.createDataFrame(rows, "k string, timestamp long, value double")

    def run(fill):
        out = resample_timeseries(df, ["k"], fill=fill)
        return {(r["k"], r["tick"] // day): (r["value"], r["observed"])
                for r in out.collect()}

    zero = run("zero")
    assert zero[("a", 0)] == (3.0, 1)       # same-tick observations sum
    assert zero[("a", 1)] == (0.0, 0)
    assert zero[("a", 2)] == (0.0, 0)
    assert zero[("a", 3)] == (7.0, 1)
    assert zero[("b", 10)] == (4.0, 1)
    assert len(zero) == 5                   # a: 4 ticks, b: 1 tick

    nul = run("null")
    assert nul[("a", 1)][0] is None and nul[("a", 1)][1] == 0

    ff = run("ffill")
    assert ff[("a", 1)] == (3.0, 0)         # carried forward
    assert ff[("a", 2)] == (3.0, 0)
    assert ff[("a", 3)] == (7.0, 1)

    import pytest

    with pytest.raises(ValueError):
        run("interpolate")


def test_resample_pre_epoch_timestamps_snap_down(spark):
    """Round-5 ADVICE: float division + truncation-toward-zero snapped
    NEGATIVE (pre-epoch) timestamps UP a tick; floor division must snap
    them DOWN like the oracle's integer `//`."""
    from slow_tortoise_spark.operators.temporal import resample_timeseries

    day = 86_400_000
    rows = [
        ("a", -1 * day, 5.0),        # exactly on the -1 tick
        ("a", -1 * day + 5, 6.0),    # inside (-1, 0): floor is tick -1
        ("a", -5, 1.0),              # just before epoch: tick -1, not 0
        ("a", 0, 2.0),               # epoch itself: tick 0
    ]
    df = spark.createDataFrame(rows, "k string, timestamp long, value double")
    out = {r["tick"] // day: (r["value"], r["observed"])
           for r in resample_timeseries(df, ["k"], fill="zero").collect()}
    assert out[-1] == (12.0, 1)      # 5 + 6 + 1 all land on tick -1
    assert out[0] == (2.0, 1)
    assert set(out) == {-1, 0}


def test_resample_linear_interpolation(spark):
    from slow_tortoise_spark.operators.temporal import resample_timeseries

    day = 86_400_000
    rows = [("a", 0 * day, 1.0), ("a", 4 * day, 9.0), ("a", 6 * day, 3.0)]
    df = spark.createDataFrame(rows, "k string, timestamp long, value double")
    out = {r["tick"] // day: r["value"]
           for r in resample_timeseries(df, ["k"], fill="linear").collect()}
    assert out[0] == 1.0 and out[4] == 9.0 and out[6] == 3.0
    assert out[1] == 3.0   # 1 + (9-1) * 1/4
    assert out[2] == 5.0
    assert out[3] == 7.0
    assert out[5] == 6.0   # midpoint of 9 and 3
