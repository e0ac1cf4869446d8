"""Regional rollups, extrema, pivot, summary — semantics pinned to the
reference's golden cases (FIXTURES.md F4/F6: region_id '__' concat with
"None" fills, all-levels rollup, extrema ties capped at 20)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from slow_tortoise_spark.operators.extrema import regional_extrema
from slow_tortoise_spark.operators.pivot import qualifier_timeseries_pivot
from slow_tortoise_spark.operators.regional import (
    join_region_columns,
    regional_aggregation,
    regional_aggregation_all_levels,
)
from slow_tortoise_spark.operators.summary import (
    apply_qualifier_count_limit,
    output_summary,
    qualifier_counts,
    region_lists,
    rows_per_feature,
)


def _temporal(spark):
    # Mirrors the 14-row fixture shape: timestamps 0/1, countries A/B,
    # nested admin levels, feature F1 (already temporally aggregated).
    rows = [
        Row(timestamp=0, country="A", admin1="AA", admin2="AAA", admin3="AAAA",
            feature="F1", t_sum=2.0, t_mean=1.0),
        Row(timestamp=0, country="A", admin1="AB", admin2="ABA", admin3="ABAA",
            feature="F1", t_sum=4.0, t_mean=2.0),
        Row(timestamp=0, country="B", admin1="BA", admin2="BAA", admin3="BAAA",
            feature="F1", t_sum=6.0, t_mean=3.0),
        Row(timestamp=1, country="A", admin1="AA", admin2="AAA", admin3="AAAA",
            feature="F1", t_sum=10.0, t_mean=5.0),
        Row(timestamp=1, country="B", admin1=None, admin2=None, admin3=None,
            feature="F1", t_sum=20.0, t_mean=10.0),
    ]
    schema = ("timestamp long, country string, admin1 string, admin2 string, "
              "admin3 string, feature string, t_sum double, t_mean double")
    return spark.createDataFrame(rows, schema=schema)


def test_join_region_columns(spark):
    df = join_region_columns(_temporal(spark), level=2)
    ids = {r["region_id"] for r in df.collect()}
    assert "A__AA__AAA" in ids
    assert "B__None__None" in ids  # null levels render as "None"


def test_regional_aggregation_level0(spark):
    out = regional_aggregation(_temporal(spark), level=0)
    got = {(r["region_id"], r["timestamp"]):
           (r["s_sum_t_sum"], r["s_mean_t_mean"], r["s_count"])
           for r in out.collect()}
    assert got[("A", 0)] == (6.0, 1.5, 2)
    assert got[("B", 1)] == (20.0, 10.0, 1)


def test_rollup_matches_per_level(spark):
    t = _temporal(spark)
    rolled = regional_aggregation_all_levels(t)
    for level in range(4):
        per = {(r["region_id"], r["timestamp"]): (r["s_sum_t_sum"], r["s_count"])
               for r in regional_aggregation(t, level=level).collect()}
        one = {(r["region_id"], r["timestamp"]): (r["s_sum_t_sum"], r["s_count"])
               for r in rolled.filter(f"level = {level}").collect()}
        assert per == one, f"level {level}: {per} != {one}"


def test_extrema_ties_and_cap(spark):
    rows = [Row(feature="F1", region_id=f"r{i}", timestamp=i,
                s_sum_t_sum=1.0 if i < 25 else 2.0) for i in range(30)]
    df = spark.createDataFrame(rows)
    out = regional_extrema(df, ["s_sum_t_sum"], tie_cap=20)
    mins = [r for r in out.collect() if r["kind"] == "min"]
    maxs = [r for r in out.collect() if r["kind"] == "max"]
    # 25 tied min rows → capped at 20, keeping the largest timestamps.
    assert len(mins) == 20
    assert min(r["timestamp"] for r in mins) == 5
    assert len(maxs) == 5


def test_qualifier_pivot(spark):
    rows = [
        Row(feature="F1", timestamp=0, qual="qa", s_sum_t_sum=1.0),
        Row(feature="F1", timestamp=0, qual="qb", s_sum_t_sum=2.0),
        Row(feature="F1", timestamp=1, qual="qa", s_sum_t_sum=3.0),
    ]
    df = spark.createDataFrame(rows)
    wide = qualifier_timeseries_pivot(df, "qual", "s_sum_t_sum",
                                      values=["qa", "qb"])
    got = {r["timestamp"]: (r["qa"], r["qb"]) for r in wide.collect()}
    assert got[0] == (1.0, 2.0)
    assert got[1] == (3.0, None)


def test_summaries(spark):
    t = _temporal(spark)
    s = output_summary(t).collect()[0]
    assert (s["s_min_t_sum"], s["s_max_t_sum"], s["s_sum_t_sum"]) == (2.0, 20.0, 42.0)

    r = region_lists(t, level=0).collect()[0]
    assert r["regions"] == ["A", "B"] and r["region_count"] == 2

    q = qualifier_counts(t.withColumnRenamed("admin1", "qual1"), ["qual1"]).collect()[0]
    assert q["qual1_count"] == 3  # AA, AB, BA; null not counted

    n = rows_per_feature(t).collect()[0]
    assert n["n_rows"] == 5

    assert apply_qualifier_count_limit({"q1": 3, "q2": 100}, 10) == ["q1"]


def test_extrema_all_equal_emits_both_kinds(spark):
    """min == max (all values equal) → every tied row appears under BOTH
    kinds, matching the reference's independent min/max selections
    (flows/common.py:519-537)."""
    rows = [Row(feature="F1", region_id=f"r{i}", timestamp=i, s_sum_t_sum=5.0)
            for i in range(3)]
    out = regional_extrema(spark.createDataFrame(rows), ["s_sum_t_sum"])
    got = {(r["kind"], r["region_id"]) for r in out.collect()}
    assert got == {(k, f"r{i}") for k in ("min", "max") for i in range(3)}


def test_extrema_per_level_keys(spark):
    """keys=['feature','level'] partitions the extrema per admin level so
    level-0 totals don't shadow admin1 extrema."""
    rows = [
        Row(feature="F1", level=0, region_id="A", timestamp=0, s_sum_t_sum=100.0),
        Row(feature="F1", level=0, region_id="B", timestamp=0, s_sum_t_sum=50.0),
        Row(feature="F1", level=1, region_id="A__x", timestamp=0, s_sum_t_sum=7.0),
        Row(feature="F1", level=1, region_id="A__y", timestamp=0, s_sum_t_sum=3.0),
    ]
    out = regional_extrema(spark.createDataFrame(rows), ["s_sum_t_sum"],
                           keys=["feature", "level"])
    got = {(r["level"], r["kind"]): r["region_id"] for r in out.collect()}
    assert got == {(0, "max"): "A", (0, "min"): "B",
                   (1, "max"): "A__x", (1, "min"): "A__y"}


def test_rollup_with_qualifier_matches_per_level(spark):
    """The single-shuffle qualifier ROLLUP equals per-level qualifier
    aggregation for every level."""
    t = _temporal(spark).withColumn(
        "qual1", F.when(F.col("t_sum") > 10, "hi").otherwise("lo")
    )
    rolled = regional_aggregation_all_levels(t, qualifier="qual1")
    for level in range(4):
        per = {(r["region_id"], r["timestamp"], r["qual1"]):
               (r["s_sum_t_sum"], r["s_count"])
               for r in regional_aggregation(t, level=level,
                                             qualifier="qual1").collect()}
        one = {(r["region_id"], r["timestamp"], r["qual1"]):
               (r["s_sum_t_sum"], r["s_count"])
               for r in rolled.filter(f"level = {level}").collect()}
        assert per == one, f"level {level}"


def test_apply_qualifier_thresholds_reference_golden():
    """Per-feature qualifier gate golden reproduced from
    /root/reference/tests/unit/test_apply_qualifier_thresholds.py."""
    from slow_tortoise_spark.operators.summary import apply_qualifier_thresholds

    q_map = {
        "f1": ["qual1", "qual2", "qual3"],
        "f2": ["qual1"],
        "f3": ["qual1"],
        "f_invalid": ["qual1"],
    }
    counts = {
        "f1": {"qual1": 10, "qual2": 8, "qual3": 10},
        "f2": {"qual1": 15, "qual2": 10},
        "f3": {"qual1": 5, "qual2": 10},
    }
    new_map, cols = apply_qualifier_thresholds(q_map, counts, max_count=9)
    assert new_map == {"f1": ["qual2"], "f2": [], "f3": ["qual1"]}
    assert cols == ["qual1", "qual2"]


def test_profile_table_stats(spark):
    """Null counts, exact distincts, stringified min/max; one row per
    profiled column from a single aggregate pass."""
    from pyspark.sql import Row

    from slow_tortoise_spark.operators.summary import profile_table

    df = spark.createDataFrame([
        Row(a=1, b="x"), Row(a=1, b=None), Row(a=3, b="y"),
    ])
    out = {r["col_name"]: r for r in profile_table(df).collect()}
    assert out["a"]["n_rows"] == 3 and out["a"]["n_null"] == 0
    assert out["a"]["n_distinct"] == 2
    assert (out["a"]["min_value"], out["a"]["max_value"]) == ("1", "3")
    assert out["b"]["n_null"] == 1 and out["b"]["n_distinct"] == 2
    assert out["b"]["min_value"] == "x" and out["b"]["max_value"] == "y"
    # approx tier returns the same shape
    approx = profile_table(df, exact_distinct=False).count()
    assert approx == 2


def test_skew_report_hot_key_and_nulls(spark):
    """The dominant value surfaces with its share; NULL counts as a
    value (a mostly-NULL column is skew); ties break on value."""
    from pyspark.sql import Row

    from slow_tortoise_spark.operators.skew import skew_report

    rows = ([Row(k="hot", v=None)] * 6
            + [Row(k="a", v="x"), Row(k="b", v="x"), Row(k="c", v="y"),
               Row(k="d", v="z")])
    out = {r["col_name"]: r for r in
           skew_report(spark.createDataFrame(rows)).collect()}
    assert out["k"]["top_value"] == "hot" and out["k"]["top_count"] == 6
    assert abs(out["k"]["share"] - 0.6) < 1e-9
    assert out["v"]["top_value"] is None and out["v"]["top_count"] == 6
