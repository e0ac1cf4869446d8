"""Tiling semantics pinned to the reference golden cases (FIXTURES.md F5):
(lat 10.166.., lng 40.644..) → subtile (14,10041,7726); (9.55, 31.65) →
(14,9632,7755); bin indices 1959/1957 @ zoom 0, 3854/3851 @ zoom 1
(tile 1,0), 3001 @ zoom 8 (tile 156,120); plus proto round-trip and the
sum-invariance property across zoom levels."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from slow_tortoise_spark.operators.tiles import (
    bin_index_col,
    deg2num_cols,
    grid_stats,
    parent_tile_col,
    subtile_aggregation,
    tiles_all_levels,
    tiles_for_level,
)
from slow_tortoise_spark.sinks.tile_proto import decode_tile, encode_tile


def _points(spark):
    rows = [
        Row(feature="f", timestamp=0, lat=10.166, lng=40.644, t_sum=1.0, t_mean=1.0),
        Row(feature="f", timestamp=0, lat=10.168, lng=40.646, t_sum=3.0, t_mean=3.0),
        Row(feature="f", timestamp=0, lat=9.55, lng=31.65, t_sum=10.0, t_mean=10.0),
        Row(feature="f", timestamp=0, lat=None, lng=None, t_sum=99.0, t_mean=99.0),
    ]
    schema = ("feature string, timestamp long, lat double, lng double, "
              "t_sum double, t_mean double")
    return spark.createDataFrame(rows, schema=schema)


def test_deg2num_golden(spark):
    df = spark.createDataFrame(
        [Row(lat=10.166, lng=40.644), Row(lat=9.55, lng=31.65)]
    ).select(deg2num_cols(F.col("lat"), F.col("lng"), 14).alias("t"))
    got = [(r["t"]["z"], r["t"]["x"], r["t"]["y"]) for r in df.collect()]
    assert got == [(14, 10041, 7726), (14, 9632, 7755)]


def test_subtile_aggregation(spark):
    sub = subtile_aggregation(_points(spark))
    got = {(r["subtile"]["x"], r["subtile"]["y"]):
           (r["s_sum_t_sum"], r["s_sum_t_mean"], r["s_count"])
           for r in sub.collect()}
    # Null-coord row dropped; the two close points share subtile (10041,7726).
    assert got[(10041, 7726)] == (4.0, 4.0, 2)
    assert got[(9632, 7755)] == (10.0, 10.0, 1)


def test_parent_and_bin_index_golden(spark):
    sub = subtile_aggregation(_points(spark))

    def bins_at(level):
        level_idx = 14 - level
        df = sub.withColumn("subtile", parent_tile_col(F.col("subtile"), level_idx))
        df = df.withColumn("tile", parent_tile_col(F.col("subtile"), 6))
        df = df.withColumn("bin", bin_index_col(F.col("subtile"), F.col("tile")))
        return [((r["tile"]["z"], r["tile"]["x"], r["tile"]["y"]), r["bin"])
                for r in df.collect()]

    assert set(bins_at(6)) == {((0, 0, 0), 1959), ((0, 0, 0), 1957)}
    assert set(bins_at(7)) == {((1, 1, 0), 3854), ((1, 1, 0), 3851)}
    assert set(bins_at(14)) == {((8, 156, 120), 3001), ((8, 150, 121), 736)}


def test_tiles_for_level_accumulates_bins(spark):
    sub = subtile_aggregation(_points(spark))
    tiles = tiles_for_level(sub, level=6).collect()
    assert len(tiles) == 1
    t = tiles[0]
    assert (t["tile"]["z"], t["tile"]["x"], t["tile"]["y"]) == (0, 0, 0)
    assert t["total_bins"] == 4096
    bins = {b["bin"]: (b["s_sum_t_sum"], b["s_sum_t_mean"], b["weight"])
            for b in t["bins"]}
    assert bins == {1959: (4.0, 4.0, 2), 1957: (10.0, 10.0, 1)}


def test_tiles_all_levels_matches_loop(spark):
    sub = subtile_aggregation(_points(spark))
    alll = tiles_all_levels(sub)
    for level in (6, 10, 14):
        loop = {((r["tile"]["z"], r["tile"]["x"], r["tile"]["y"]),
                 tuple(sorted((b["bin"], b["s_sum_t_sum"]) for b in r["bins"])))
                for r in tiles_for_level(sub, level).collect()}
        one = {((r["tile"]["z"], r["tile"]["x"], r["tile"]["y"]),
                tuple(sorted((b["bin"], b["s_sum_t_sum"]) for b in r["bins"])))
               for r in alll.filter(f"level = {level}").collect()}
        assert loop == one, f"level {level}"


def test_sum_invariance_across_zooms(spark):
    # Property the reference never checks: total s_sum_t_sum is preserved
    # at every zoom level.
    sub = subtile_aggregation(_points(spark))
    alll = tiles_all_levels(sub)
    totals = (
        alll.select("level", F.explode("bins").alias("b"))
        .groupBy("level").agg(F.sum("b.s_sum_t_sum").alias("total"))
        .collect()
    )
    assert len(totals) == 9
    assert all(abs(r["total"] - 14.0) < 1e-9 for r in totals)


def test_grid_stats(spark):
    sub = subtile_aggregation(_points(spark))
    gs = grid_stats(sub)
    rows = {r["zoom"]: r for r in gs.collect()}
    assert set(rows) == set(range(6, 15))
    z14 = rows[14]
    assert z14["min_s_sum_t_sum"] == 4.0 and z14["max_s_sum_t_sum"] == 10.0
    # means divide by s_count: (4/2)=2 vs (10/1)=10
    assert z14["min_s_mean_t_sum"] == 2.0 and z14["max_s_mean_t_sum"] == 10.0


def test_proto_roundtrip():
    buf = encode_tile(8, 156, 120, 4096,
                      {3001: (10.0, 5.0, 2.0), 12: (1.5, 0.5, 1.0)})
    tile = decode_tile(buf)
    assert (tile["z"], tile["x"], tile["y"]) == (8, 156, 120)
    assert tile["total_bins"] == 4096
    assert tile["stats"] == {3001: (10.0, 5.0, 2.0), 12: (1.5, 0.5, 1.0)}


def test_proto_zero_coord_roundtrip():
    # proto3 omits zero scalars; decoder must default them.
    tile = decode_tile(encode_tile(0, 0, 0, 4096, {0: (1.0, 1.0, 1.0)}))
    assert (tile["z"], tile["x"], tile["y"]) == (0, 0, 0)
    assert 0 in tile["stats"]


def test_morton_code_known_values(spark):
    from pyspark.sql import functions as F

    from slow_tortoise_spark.operators.tiles import morton_code

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "x int, y int"
    )
    got = [r["m"] for r in df.select(
        morton_code(F.col("x"), F.col("y")).alias("m")).collect()]

    def ref(x, y):
        m = 0
        for b in range(16):
            m |= ((x >> b) & 1) << (2 * b)
            m |= ((y >> b) & 1) << (2 * b + 1)
        return m

    assert got == [ref(x, y) for x, y in
                   [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)]]


def test_zorder_write_files_own_disjoint_code_ranges(spark, tmp_path):
    import random

    from pyspark.sql import functions as F

    from slow_tortoise_spark.operators.tiles import zorder_write

    random.seed(7)
    rows = [(i, random.randrange(16384), random.randrange(16384))
            for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, x int, y int")
    path = str(tmp_path / "zordered")
    zorder_write(df, path, x_col="x", y_col="y", n_files=8)

    back = spark.read.parquet(path).withColumn(
        "file", F.input_file_name()
    )
    stats = back.groupBy("file").agg(
        F.min("zcode").alias("lo"), F.max("zcode").alias("hi"),
        F.count("*").alias("n"),
    ).collect()
    assert len(stats) >= 4  # range partitioner actually spread the data
    assert sum(r["n"] for r in stats) == 4000
    # disjoint intervals: sort by lo, every file's hi < next file's lo
    ordered = sorted(stats, key=lambda r: r["lo"])
    for a, b in zip(ordered, ordered[1:]):
        assert a["hi"] <= b["lo"]
    # scan pruning is observable in the plan: a zcode predicate reaches
    # the parquet scan as a pushed filter
    plan = (
        spark.read.parquet(path)
        .filter(F.col("zcode") < 1000)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters" in plan and "zcode" in plan


def test_zorder_layout_actually_prunes_files(spark, tmp_path):
    """The point of the layout: footer min/max stats prune a code-range
    query against the Z-ordered copy, while the same rows written in
    hash-shuffled order prune (almost) nothing."""
    import random

    from pyspark.sql import functions as F

    from slow_tortoise_spark.operators.tiles import morton_code, zorder_write
    from slow_tortoise_spark.sources.stats import pruning_report

    random.seed(11)
    rows = [(i, random.randrange(16384), random.randrange(16384))
            for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, x int, y int")

    zpath = str(tmp_path / "zordered")
    zorder_write(df, zpath, x_col="x", y_col="y", n_files=8)

    upath = str(tmp_path / "unordered")
    (
        df.withColumn("zcode", morton_code(F.col("x"), F.col("y")))
        .repartition(8)  # hash shuffle: every file spans the full domain
        .write.mode("overwrite").parquet(upath)
    )

    lo, hi = 0, (1 << 28) // 16  # one sixteenth of the code domain
    z = pruning_report(zpath, "zcode", lo, hi)
    u = pruning_report(upath, "zcode", lo, hi)
    assert z["files_total"] >= 4 and u["files_total"] >= 4
    assert z["pruned_fraction"] >= 0.5      # most z-files skipped
    assert u["pruned_fraction"] == 0.0      # unordered skips nothing
    assert z["files_scanned"] < u["files_scanned"]
