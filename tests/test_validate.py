"""Validation semantics pinned to the reference's cleansing edge cases
(see FIXTURES.md F2 / reference tests/unit/test_validate_and_fix.py)."""

from __future__ import annotations

from pyspark.sql import Row

from slow_tortoise_spark.operators.validate import (
    get_null_or_empty_cols,
    get_qualifier_columns,
    validate_and_fix,
)
from slow_tortoise_spark.schema import MAX_TIMESTAMP_MS


def _dirty_df(spark):
    rows = [
        Row(timestamp=1546300800000, country="Ethiopia//x", admin1="Afar",
            admin2=None, lat="10.17", lng="40.65", feature="f1", value="1.5",
            qual1="qa", blank="   ", w="2.0"),
        Row(timestamp=None, country="Kenya", admin1=None, admin2=None,
            lat="bad", lng=None, feature="f1", value="inf", qual1=None,
            blank=None, w=None),
        Row(timestamp=MAX_TIMESTAMP_MS + 5, country="Kenya", admin1="A",
            admin2=None, lat=None, lng=None, feature="f2", value="3.0",
            qual1="qb", blank=" ", w="oops"),
    ]
    schema = ("timestamp long, country string, admin1 string, admin2 string, "
              "lat string, lng string, feature string, value string, "
              "qual1 string, blank string, w string")
    return spark.createDataFrame(rows, schema=schema)


def test_null_empty_col_detection(spark):
    df = _dirty_df(spark)
    assert set(get_null_or_empty_cols(df)) == {"blank", "admin2"}


def test_validate_and_fix(spark):
    df, stats = validate_and_fix(_dirty_df(spark), weight_column="w",
                                 fill_timestamp=0)
    rows = df.collect()

    # P9: the out-of-range-timestamp row is dropped.
    assert len(rows) == 2 and stats.invalid_timestamp == 1
    # P2: all-null/whitespace columns dropped.
    assert "blank" not in df.columns and "admin2" not in df.columns
    # P5: null timestamp filled with fill_timestamp.
    assert stats.missing_timestamp == 1
    # P3: unparseable lat coerced to null, parseable one to double.
    r1 = [r for r in rows if r["country"].startswith("Ethiopia")][0]
    assert r1["lat"] == 10.17
    # P7: inf value → null; null ts filled with 0.
    kenya = [r for r in rows if r["timestamp"] == 0][0]
    assert kenya["value"] is None and kenya["lat"] is None
    # P4: null qualifier and region filled with "None".
    assert kenya["qual1"] == "None" and kenya["admin1"] == "None"
    # P6: weight coerced, null/unparseable → 0.
    assert kenya["w"] == 0.0 and r1["w"] == 2.0
    # P8: '//' stripped from region values.
    assert r1["country"] == "Ethiopiax"


def test_qualifier_columns(spark):
    df = _dirty_df(spark)
    assert set(get_qualifier_columns(df, weight_column="w")) == {"qual1", "blank"}


def test_mad_outliers_flags_planted_glitches(spark):
    from slow_tortoise_spark.operators.validate import mad_outliers

    rows = ([("a", float(v)) for v in [10, 11, 9, 10, 12, 10, 11, 9]]
            + [("a", 1000.0), ("a", -500.0)]          # glitches
            + [("b", 5.0)] * 6)                        # constant: MAD 0
    df = spark.createDataFrame(rows, "g string, value double")
    out = mad_outliers(df, ["g"], "value", k=3.0).collect()
    flagged = {(r["g"], r["value"]) for r in out if r["is_outlier"]}
    assert flagged == {("a", 1000.0), ("a", -500.0)}
    # the glitches did not poison the statistics (robustness)
    a = next(r for r in out if r["g"] == "a" and r["value"] == 10.0)
    assert 9.0 <= a["med"] <= 11.0 and a["mad"] <= 2.0
    # constant group: MAD 0, nothing beats 0 strictly -> no outliers
    assert all(not r["is_outlier"] for r in out if r["g"] == "b")
