"""Golden parity with the reference's own unit-test expectations.

Inputs and expected numbers reproduced from
/root/reference/tests/unit/test_compute_global_timeseries.py:29-70 and
/root/reference/tests/unit/test_compute_regional_aggregation.py:30-120
(values only — the computation below is this engine's own operators)."""

from __future__ import annotations

from pyspark.sql import Row

from slow_tortoise_spark.operators.regional import (
    regional_aggregation,
    regional_aggregation_all_levels,
)
from slow_tortoise_spark.operators.spatial import global_timeseries


def test_global_timeseries_reference_golden(spark):
    rows = [
        Row(timestamp=0, country="Ethiopia", feature="feature1", t_sum=4.0, t_mean=2.0),
        Row(timestamp=0, country="South Sudan", feature="feature1", t_sum=60.0, t_mean=30.0),
        Row(timestamp=1, country="Ethiopia", feature="feature1", t_sum=6.0, t_mean=3.0),
        Row(timestamp=1, country="South Sudan", feature="feature1", t_sum=80.0, t_mean=0.8),
        Row(timestamp=1, country="Ethiopia", feature="feature2", t_sum=6.0, t_mean=3.0),
        Row(timestamp=1, country="South Sudan", feature="feature2", t_sum=180.0, t_mean=1.8),
    ]
    out = global_timeseries(spark.createDataFrame(rows))
    got = {
        (r["feature"], r["timestamp"]): (
            r["s_sum_t_sum"], r["s_mean_t_sum"], r["s_sum_t_mean"],
            r["s_mean_t_mean"], r["s_count"],
        )
        for r in out.collect()
    }
    # expected CSVs from the reference test, row by row
    assert got[("feature1", 0)] == (64.0, 32.0, 32.0, 16.0, 2)
    assert got[("feature1", 1)] == (86.0, 43.0, 3.8, 1.9, 2)
    assert got[("feature2", 1)] == (186.0, 93.0, 4.8, 2.4, 2)


_REGIONAL_ROWS = [
    # (timestamp, country, admin1, admin2, admin3, feature, t_sum, t_mean)
    (0, "A", "AA", "AAA", "AAAA", "F1", 4.0, 2.0),
    (0, "A", "AA", "AAA", "AAAA", "F1", 10.0, 5.0),
    (0, "A", "AA", "AAB", "AABD", "F1", 8.0, 4.0),
    (0, "A", "AA", "AAB", "AABE", "F1", 3.0, 1.0),
    (0, "B", "BA", "BAB", "BABB", "F1", 60.0, 30.0),
    (0, "B", "BB", "BBB", "BBBB", "F1", 10.0, 2.0),
    (1, "A", "AA", "AAA", "AAAA", "F1", 2.0, 1.0),
    (1, "A", "AA", "AAA", "AAAA", "F1", 4.0, 1.0),
    (1, "A", "AA", "AAB", "AABD", "F1", 8.0, 2.0),
    (1, "A", "AA", "AAB", "AABE", "F1", 10.0, 2.0),
    (1, "B", "BA", "BAB", "BABB", "F1", 90.0, 30.0),
    (1, "B", "BB", "BBB", "BBBB", "F1", 80.0, 20.0),
    (1, "A", "AA", "AAA", "AAAA", "F2", 4.0, 2.0),
    (1, "A", "AA", "AAA", "AAAA", "F2", 10.0, 5.0),
]

# expected: (feature, level, timestamp) → {region_id: (ssum, smean_tsum,
# ssum_tmean, smean_tmean, count)} — from the reference's golden CSVs
_GOLDEN = {
    ("F1", 0, 0): {"A": (25.0, 6.25, 12.0, 3.0, 4), "B": (70.0, 35.0, 32.0, 16.0, 2)},
    ("F1", 0, 1): {"A": (24.0, 6.0, 6.0, 1.5, 4), "B": (170.0, 85.0, 50.0, 25.0, 2)},
    ("F2", 0, 1): {"A": (14.0, 7.0, 7.0, 3.5, 2)},
    ("F1", 1, 1): {
        "A__AA": (24.0, 6.0, 6.0, 1.5, 4),
        "B__BA": (90.0, 90.0, 30.0, 30.0, 1),
        "B__BB": (80.0, 80.0, 20.0, 20.0, 1),
    },
    ("F1", 1, 0): {
        "A__AA": (25.0, 6.25, 12.0, 3.0, 4),
        "B__BA": (60.0, 60.0, 30.0, 30.0, 1),
        "B__BB": (10.0, 10.0, 2.0, 2.0, 1),
    },
    ("F1", 2, 1): {
        "A__AA__AAB": (18.0, 9.0, 4.0, 2.0, 2),
        "B__BA__BAB": (90.0, 90.0, 30.0, 30.0, 1),
        "A__AA__AAA": (6.0, 3.0, 2.0, 1.0, 2),
        "B__BB__BBB": (80.0, 80.0, 20.0, 20.0, 1),
    },
    ("F1", 3, 0): {
        "A__AA__AAB__AABD": (8.0, 8.0, 4.0, 4.0, 1),
        "A__AA__AAA__AAAA": (14.0, 7.0, 7.0, 3.5, 2),
        "B__BA__BAB__BABB": (60.0, 60.0, 30.0, 30.0, 1),
        "A__AA__AAB__AABE": (3.0, 3.0, 1.0, 1.0, 1),
        "B__BB__BBB__BBBB": (10.0, 10.0, 2.0, 2.0, 1),
    },
}


def _regional_df(spark):
    schema = ("timestamp long, country string, admin1 string, admin2 string, "
              "admin3 string, feature string, t_sum double, t_mean double")
    return spark.createDataFrame(_REGIONAL_ROWS, schema=schema)


def _check(rows, feature, level, ts):
    got = {
        r["region_id"]: (r["s_sum_t_sum"], r["s_mean_t_sum"], r["s_sum_t_mean"],
                         r["s_mean_t_mean"], r["s_count"])
        for r in rows
        if r["feature"] == feature and r["timestamp"] == ts
    }
    assert got == _GOLDEN[(feature, level, ts)], (feature, level, ts, got)


def test_regional_aggregation_reference_golden_per_level(spark):
    df = _regional_df(spark)
    for (feature, level, ts) in _GOLDEN:
        out = regional_aggregation(df, level=level).collect()
        _check(out, feature, level, ts)


def test_regional_rollup_reference_golden_one_pass(spark):
    rolled = regional_aggregation_all_levels(_regional_df(spark)).collect()
    for (feature, level, ts) in _GOLDEN:
        _check([r for r in rolled if r["level"] == level], feature, level, ts)


def test_qualifier_timeseries_reference_golden(spark):
    """Qualifier pivot goldens from the reference
    (test_compute_global_timeseries.py:80-147): spatial agg keyed
    (feature, timestamp, qualifier) over the fine temporal groups, then
    pivoted to one column per qualifier value."""
    from pyspark.sql import functions as F

    from slow_tortoise_spark.operators.pivot import qualifier_timeseries_pivot
    from slow_tortoise_spark.operators.spatial import spatial_aggregation

    rows = [
        (0, "Ethiopia", "feature1", "qa", "q1", 4.0, 2.0),
        (0, "South Sudan", "feature1", "qa", "q2", 60.0, 30.0),
        (0, "South Sudan", "feature1", "qb", "q2", 60.0, 30.0),
        (1, "Ethiopia", "feature1", "qa", "q1", 6.0, 3.0),
        (1, "South Sudan", "feature1", "qb", "q1", 80.0, 0.8),
        (1, "Ethiopia", "feature2", "qa", "q1", 6.0, 3.0),
        (1, "South Sudan", "feature2", "qa", "q2", 180.0, 1.8),
        (1, "Ethiopia", "feature3", "qa", "q1", 6.0, 3.0),
    ]
    schema = ("timestamp long, country string, feature string, qual1 string, "
              "qual2 string, t_sum double, t_mean double")
    t = spark.createDataFrame(rows, schema=schema)

    sq = spatial_aggregation(t, keys=["feature", "timestamp", "qual1"],
                             aggs=["sum", "mean"])
    f1 = sq.filter("feature = 'feature1'")

    def wide(agg_col):
        w = qualifier_timeseries_pivot(f1, "qual1", agg_col,
                                       values=["qa", "qb"],
                                       keys=["timestamp"])
        return {r["timestamp"]: (r["qa"], r["qb"]) for r in w.collect()}

    assert wide("s_count") == {0: (2, 1), 1: (1, 1)}
    assert wide("s_mean_t_mean") == {0: (16.0, 30.0), 1: (3.0, 0.8)}
    assert wide("s_sum_t_mean") == {0: (32.0, 30.0), 1: (3.0, 0.8)}

    sq2 = spatial_aggregation(t.filter("feature = 'feature1'"),
                              keys=["feature", "timestamp", "qual2"],
                              aggs=["sum", "mean"])
    w2 = qualifier_timeseries_pivot(sq2, "qual2", "s_mean_t_sum",
                                    values=["q1", "q2"], keys=["timestamp"])
    got2 = {r["timestamp"]: (r["q1"], r["q2"]) for r in w2.collect()}
    assert got2 == {0: (4.0, 60.0), 1: (43.0, None)}


def test_regional_qualifier_rollup_reference_golden(spark):
    """Per-qualifier regional aggregation golden values reproduced from
    /root/reference/tests/unit/test_compute_regional_aggregation.py:122-201
    (test_compute_regional_aggregation_with_qualifiers)."""
    rows = [
        # (timestamp, country, admin1, qual1, qual2, feature, t_sum, t_mean)
        (0, "A", "AA", "qa", "q1", "F1", 4.0, 2.0),
        (0, "A", "AB", "qa", "q1", "F1", 10.0, 5.0),
        (0, "A", "AA", "qa", "q2", "F1", 4.0, 2.0),
        (0, "A", "AB", "qa", "q2", "F1", 10.0, 5.0),
        (1, "A", "AA", "qa", "q1", "F1", 8.0, 2.0),
        (1, "A", "AB", "qa", "q1", "F1", 20.0, 10.0),
        (1, "A", "AA", "qa", "q2", "F1", 16.0, 4.0),
        (1, "A", "AB", "qa", "q2", "F1", 30.0, 15.0),
        (1, "A", "AB", "qa", "q2", "F2", 30.0, 15.0),
    ]
    df = spark.createDataFrame(
        [Row(timestamp=t, country=c, admin1=a1, qual1=q1, qual2=q2,
             feature=f, t_sum=ts, t_mean=tm)
         for t, c, a1, q1, q2, f, ts, tm in rows]
    )

    def agg(qualifier):
        out = regional_aggregation_all_levels(df, qualifier=qualifier)
        return {
            (r["feature"], r["level"], r["timestamp"], r["region_id"],
             r[qualifier]): (
                r["s_sum_t_sum"], r["s_mean_t_sum"], r["s_sum_t_mean"],
                r["s_mean_t_mean"], r["s_count"],
            )
            for r in out.collect()
        }

    got1 = agg("qual1")
    # country level by qual1 (expected CSVs qualifiers/qual1.csv)
    assert got1[("F1", 0, 0, "A", "qa")] == (28.0, 7.0, 14.0, 3.5, 4)
    assert got1[("F1", 0, 1, "A", "qa")] == (74.0, 18.5, 31.0, 7.75, 4)
    # admin1 level by qual1
    assert got1[("F1", 1, 0, "A__AA", "qa")] == (8.0, 4.0, 4.0, 2.0, 2)
    assert got1[("F1", 1, 0, "A__AB", "qa")] == (20.0, 10.0, 10.0, 5.0, 2)

    got2 = agg("qual2")
    # country level by qual2
    assert got2[("F1", 0, 0, "A", "q1")] == (14.0, 7.0, 7.0, 3.5, 2)
    assert got2[("F1", 0, 0, "A", "q2")] == (14.0, 7.0, 7.0, 3.5, 2)


def test_regional_extrema_per_level_reference_golden(spark):
    """Per-level extrema goldens reproduced from
    /root/reference/tests/unit/test_compute_regional_stats.py:28-90:
    one extrema set per admin level (country + admin1 checked), all tied
    rows kept, computed over the 4 spatial agg columns."""
    rows = [
        (0, "A", "AA", "AAA", "AAAA", "F1", 4.0, 2.0),
        (0, "A", "AA", "AAA", "AAAA", "F1", 10.0, 5.0),
        (0, "A", "AA", "AAB", "AABD", "F1", 8.0, 4.0),
        (0, "A", "AA", "AAB", "AABE", "F1", 3.0, 1.0),
        (0, "B", "BA", "BAB", "BABB", "F1", 60.0, 30.0),
        (0, "B", "BB", "BBB", "BBBB", "F1", 10.0, 2.0),
        (1, "A", "AA", "AAA", "AAAA", "F1", 2.0, 1.0),
        (1, "A", "AA", "AAA", "AAAA", "F1", 4.0, 1.0),
        (1, "A", "AA", "AAB", "AABD", "F1", 8.0, 2.0),
        (1, "A", "AA", "AAB", "AABE", "F1", 10.0, 2.0),
        (1, "B", "BA", "BAB", "BABB", "F1", 90.0, 30.0),
        (1, "B", "BB", "BBB", "BBBB", "F1", 80.0, 20.0),
        (2, "A", "AA", "AAA", "AAAA", "F1", 20.0, 10.0),
        (2, "A", "AA", "AAA", "AAAA", "F1", 40.0, 20.0),
        (2, "A", "AA", "AAB", "AABD", "F1", 4.0, 2.0),
        (2, "A", "AA", "AAB", "AABE", "F1", 6.0, 2.0),
        (2, "B", "BA", "BAB", "BABB", "F1", 40.0, 10.0),
        (2, "B", "BB", "BBB", "BBBB", "F1", 300.0, 10.0),
    ]
    from slow_tortoise_spark.operators.extrema import regional_extrema

    df = spark.createDataFrame(
        [Row(timestamp=t, country=c, admin1=a1, admin2=a2, admin3=a3,
             feature=f, t_sum=ts, t_mean=tm)
         for t, c, a1, a2, a3, f, ts, tm in rows]
    )
    rolled = regional_aggregation_all_levels(df)
    agg_cols = ["s_sum_t_sum", "s_mean_t_sum", "s_sum_t_mean", "s_mean_t_mean"]
    ex = regional_extrema(rolled, agg_cols, keys=["feature", "level"])
    got = {}
    for r in ex.collect():
        got.setdefault((r["level"], r["kind"], r["agg_col"]), set()).add(
            (r["region_id"], r["timestamp"], r["value"])
        )

    # country level (reference .../regional/country/stats/default/extrema.json)
    assert got[(0, "min", "s_sum_t_sum")] == {("A", 1, 24.0)}
    assert got[(0, "min", "s_mean_t_mean")] == {("A", 1, 1.5)}
    assert got[(0, "max", "s_sum_t_sum")] == {("B", 2, 340.0)}
    assert got[(0, "max", "s_sum_t_mean")] == {("B", 1, 50.0)}
    assert got[(0, "max", "s_mean_t_mean")] == {("B", 1, 25.0)}

    # admin1 level — incl. the two-way tie the reference keeps
    assert got[(1, "min", "s_sum_t_sum")] == {("B__BB", 0, 10.0)}
    assert got[(1, "max", "s_sum_t_sum")] == {("B__BB", 2, 300.0)}
    assert got[(1, "max", "s_mean_t_mean")] == {
        ("B__BA", 1, 30.0), ("B__BA", 0, 30.0)
    }
    assert got[(1, "min", "s_mean_t_mean")] == {("A__AA", 1, 1.5)}


def test_grid_stats_reference_golden(spark):
    """Grid-stats goldens reproduced from
    /root/reference/tests/unit/test_compute_stats.py:17-50: min/max of the
    four grid aggregates per zoom for F1/timestamp 0, constant across
    zooms 6–14 for its two-subtile fixture."""
    from slow_tortoise_spark.operators.tiles import grid_stats

    rows = [
        ("F1", 0, (14, 10041, 7726), 96.0, 48.0, 3),
        ("F1", 0, (14, 9632, 7755), 120.0, 60.0, 2),
        ("F1", 1, (14, 10041, 7726), 80.0, 40.0, 3),
        ("F1", 1, (14, 9632, 7755), 90.0, 1.8, 2),
        ("F2", 0, (14, 10041, 7726), 96.0, 48.0, 3),
        ("F2", 0, (14, 9632, 7755), 120.0, 60.0, 2),
    ]
    df = spark.createDataFrame(
        [Row(feature=f, timestamp=t,
             subtile=Row(z=s[0], x=s[1], y=s[2]),
             s_sum_t_sum=ss, s_sum_t_mean=sm, s_count=n)
         for f, t, s, ss, sm, n in rows]
    )
    out = grid_stats(df, min_level=6, max_level=14)
    got = {
        (r["feature"], r["timestamp"], r["zoom"]): (
            r["min_s_sum_t_sum"], r["max_s_sum_t_sum"],
            r["min_s_sum_t_mean"], r["max_s_sum_t_mean"],
            r["min_s_mean_t_sum"], r["max_s_mean_t_sum"],
            r["min_s_mean_t_mean"], r["max_s_mean_t_mean"],
        )
        for r in out.collect()
    }
    # the two subtiles never merge down to zoom 6 (different high bits),
    # so every zoom row carries the reference's constant extrema
    for zoom in range(6, 15):
        assert got[("F1", 0, zoom)] == (
            96.0, 120.0, 48.0, 60.0, 32.0, 60.0, 16.0, 30.0
        ), zoom
    # t=1 row from the same fixture (means: 80/3, 90/2, 40/3, 1.8/2)
    assert got[("F1", 1, 14)] == (80.0, 90.0, 1.8, 40.0,
                                  26.666666666666668, 45.0,
                                  0.9, 13.333333333333334)


def test_regional_timeseries_reference_golden(spark):
    """Per-region timeseries goldens reproduced from
    /root/reference/tests/unit/test_compute_regional_timeseries.py:31-80:
    the country-level default CSVs for regions A and B."""
    df = spark.createDataFrame(
        [Row(timestamp=t, country=c, admin1=a1, admin2=a2, admin3=a3,
             feature=f, t_sum=ts, t_mean=tm)
         for t, c, a1, a2, a3, f, ts, tm in _REGIONAL_ROWS]
    )
    rolled = regional_aggregation_all_levels(df)
    by_region = {}
    for r in rolled.filter("level = 0 AND feature = 'F1'").collect():
        by_region.setdefault(r["region_id"], {})[r["timestamp"]] = (
            r["s_sum_t_sum"], r["s_mean_t_sum"], r["s_sum_t_mean"],
            r["s_mean_t_mean"], r["s_count"],
        )
    assert by_region["A"][0] == (25.0, 6.25, 12.0, 3.0, 4)
    assert by_region["A"][1] == (24.0, 6.0, 6.0, 1.5, 4)
    assert by_region["B"][0] == (70.0, 35.0, 32.0, 16.0, 2)
    assert by_region["B"][1] == (170.0, 85.0, 50.0, 25.0, 2)


def test_output_summary_reference_golden(spark):
    """Output-summary goldens reproduced from
    /root/reference/tests/unit/test_compute_output_summary.py."""
    from slow_tortoise_spark.operators.summary import output_summary

    rows = [
        (0, "A", "Feature1", 6.3, 2.1),
        (0, "B", "Feature1", 12.0, 4.0),
        (0, "A", "Feature1", 3.3, 1.1),
        (0, "B", "Feature1", 10.2, 3.4),
        (0, "A", "Feature2", 8.3, 4.1),
        (0, "B", "Feature2", 14.0, 3.0),
        (0, "A", "Feature2", 6.3, 2.1),
        (0, "B", "Feature2", 20.2, 5.4),
    ]
    df = spark.createDataFrame(
        [Row(timestamp=t, country=c, feature=f, t_sum=ts, t_mean=tm)
         for t, c, f, ts, tm in rows]
    )
    got = {r["feature"]: r.asDict() for r in output_summary(df).collect()}
    f1 = got["Feature1"]
    assert (f1["s_min_t_sum"], f1["s_max_t_sum"]) == (3.3, 12.0)
    assert round(f1["s_sum_t_sum"], 6) == 31.8
    assert round(f1["s_mean_t_sum"], 6) == 7.95
    assert (f1["s_min_t_mean"], f1["s_max_t_mean"]) == (1.1, 4.0)
    assert round(f1["s_sum_t_mean"], 6) == 10.6
    assert round(f1["s_mean_t_mean"], 6) == 2.65
    f2 = got["Feature2"]
    assert (f2["s_min_t_sum"], f2["s_max_t_sum"]) == (6.3, 20.2)
    assert round(f2["s_sum_t_sum"], 6) == 48.8
    assert round(f2["s_mean_t_mean"], 6) == 3.65
