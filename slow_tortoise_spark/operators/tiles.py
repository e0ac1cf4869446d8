"""Web-mercator grid tiling (reference ops G1–G7).

Slippy-map geometry (public formulas:
https://wiki.openstreetmap.org/wiki/Slippy_map_tilenames): points are
binned into zoom-14 "subtiles"; each zoom-z main tile owns the 4^6 = 4096
zoom-(z+6) subtiles inside it, flattened to a bin index. Semantics pinned
to /root/reference/flows/common.py:166-215 and
/root/reference/flows/data_pipeline.py:591-668, with one deliberate
architectural change: the reference computes tile coords row-wise in
Python and accumulates bin stats inside a per-tile serializer; here every
coordinate is a native Column expression (whole-stage codegen, no UDFs)
and bin accumulation is a distributed ``groupBy(tile, bin).agg(sum)`` —
the per-tile Python step only serializes already-reduced structs.

Scale shape per zoom level: one hash aggregation keyed (feature,
timestamp, tile, bin). The one-pass variants explode the 9 ancestor
zooms from the zoom-14 aggregate (9× a much-reduced frame) so all levels
share a single shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from slow_tortoise_spark.operators.spatial import spatial_aggregation
from slow_tortoise_spark.schema import (
    LEVEL_DIFF,
    MAX_SUBTILE_PRECISION,
    MIN_SUBTILE_PRECISION,
)

# ---------------------------------------------------------------------------
# G1–G4: pure Column geometry
# ---------------------------------------------------------------------------


def deg2num_cols(lat: Column, lng: Column, zoom: int) -> Column:
    """G1: (lat, lng) → struct(z, x, y) at ``zoom``.

    Matches the reference's Python ``int()`` truncation (toward zero) —
    relevant only for the sliver above the mercator cutoff where the raw
    y fraction is negative; such tiles are dropped downstream anyway.
    """
    n = F.lit(float(2**zoom))
    lat_rad = F.radians(lat)
    x = ((lng + F.lit(180.0)) / F.lit(360.0) * n).cast("int")
    y = (
        (F.lit(1.0) - F.asinh(F.tan(lat_rad)) / F.lit(3.141592653589793))
        / F.lit(2.0)
        * n
    ).cast("int")
    return F.struct(
        F.lit(zoom).alias("z"), x.alias("x"), y.alias("y")
    )


def parent_tile_col(subtile: Column, level_diff: int) -> Column:
    """G2/G3: ancestor tile ``level_diff`` zooms up (x >> d, y >> d)."""
    return F.struct(
        (subtile["z"] - F.lit(level_diff)).alias("z"),
        F.shiftright(subtile["x"], level_diff).alias("x"),
        F.shiftright(subtile["y"], level_diff).alias("y"),
    )


def bin_index_col(subtile: Column, tile: Column) -> Column:
    """G4: subtile's flat bin index in its main tile's 2^d × 2^d grid.

    d = subtile.z - tile.z; bin = (sx - tx·2^d) + (sy - ty·2^d)·2^d.
    """
    zdiff = (subtile["z"] - tile["z"]).cast("double")
    cells = F.pow(F.lit(2.0), zdiff).cast("int")  # 2^d, exact for d < 31
    binx = subtile["x"] - tile["x"] * cells
    biny = subtile["y"] - tile["y"] * cells
    return (binx + biny * cells).cast("int")


# ---------------------------------------------------------------------------
# G5: subtile aggregation
# ---------------------------------------------------------------------------


def subtile_aggregation(
    df_temporal: DataFrame, zoom: int = MAX_SUBTILE_PRECISION
) -> DataFrame:
    """G5: bin points into max-precision subtiles and aggregate.

    Output: feature, timestamp, subtile struct, s_sum_t_sum, s_sum_t_mean,
    s_count. Weighting is disabled by design (the tile format carries
    s_count as its weight). Rows without usable coordinates are dropped.
    """
    df = df_temporal.filter(
        F.col("lat").isNotNull()
        & F.col("lng").isNotNull()
        & ~F.isnan("lat")
        & ~F.isnan("lng")
    ).withColumn("subtile", deg2num_cols(F.col("lat"), F.col("lng"), zoom))
    return spatial_aggregation(
        df, keys=["feature", "timestamp", "subtile"], aggs=["sum"]
    )


# ---------------------------------------------------------------------------
# G6: per-level tile assembly (bins pre-reduced distributively)
# ---------------------------------------------------------------------------


def tile_bins(subtile_df: DataFrame, level: int) -> DataFrame:
    """Aggregate zoom-14 subtile stats into (tile, bin) cells at ``level``.

    The subtile is coarsened to ``level``; its owning main tile sits
    LEVEL_DIFF zooms above. Bin stats accumulate additively (sum of sums;
    s_count becomes the bin weight) — exactly the reference's ``+=`` per
    bin, done as one distributed aggregation instead.
    """
    level_idx = MAX_SUBTILE_PRECISION - level
    sub = parent_tile_col(F.col("subtile"), level_idx)
    df = subtile_df.withColumn("subtile", sub)
    df = df.withColumn("tile", parent_tile_col(F.col("subtile"), LEVEL_DIFF))
    df = df.withColumn("bin", bin_index_col(F.col("subtile"), F.col("tile")))
    return df.groupBy("feature", "timestamp", "tile", "bin").agg(
        F.sum("s_sum_t_sum").alias("s_sum_t_sum"),
        F.sum("s_sum_t_mean").alias("s_sum_t_mean"),
        F.sum("s_count").alias("weight"),
    )


def tiles_for_level(subtile_df: DataFrame, level: int) -> DataFrame:
    """G6: one row per (feature, timestamp, tile) with its bin structs.

    ``total_bins`` is 4^LEVEL_DIFF. Tiles with any negative coordinate are
    dropped (reference to_proto returns None for them).
    """
    cells = tile_bins(subtile_df, level)
    cells = cells.filter(
        (F.col("tile.z") >= 0) & (F.col("tile.x") >= 0) & (F.col("tile.y") >= 0)
    )
    return cells.groupBy("feature", "timestamp", "tile").agg(
        F.collect_list(
            F.struct("bin", "s_sum_t_sum", "s_sum_t_mean", "weight")
        ).alias("bins"),
        F.lit(4**LEVEL_DIFF).alias("total_bins"),
    )


def tiles_all_levels(
    subtile_df: DataFrame,
    min_level: int = MIN_SUBTILE_PRECISION,
    max_level: int = MAX_SUBTILE_PRECISION,
) -> DataFrame:
    """One-pass G6: explode every zoom level, single (tile, bin) shuffle.

    Adds a ``level`` column; equivalent to looping ``tiles_for_level`` but
    reads + shuffles the zoom-14 aggregate once instead of 9 times.
    """
    levels = F.sequence(F.lit(min_level), F.lit(max_level))
    df = subtile_df.withColumn("level", F.explode(levels))
    # shiftright with a column bit count is SQL-only, hence F.expr.
    zshift = f"{MAX_SUBTILE_PRECISION} - level"
    sub = F.struct(
        F.expr(f"subtile.z - ({zshift})").alias("z"),
        F.expr(f"shiftright(subtile.x, {zshift})").alias("x"),
        F.expr(f"shiftright(subtile.y, {zshift})").alias("y"),
    )
    df = df.withColumn("subtile", sub)
    df = df.withColumn("tile", parent_tile_col(F.col("subtile"), LEVEL_DIFF))
    df = df.withColumn("bin", bin_index_col(F.col("subtile"), F.col("tile")))
    cells = (
        df.filter(
            (F.col("tile.z") >= 0) & (F.col("tile.x") >= 0) & (F.col("tile.y") >= 0)
        )
        .groupBy("feature", "timestamp", "level", "tile", "bin")
        .agg(
            F.sum("s_sum_t_sum").alias("s_sum_t_sum"),
            F.sum("s_sum_t_mean").alias("s_sum_t_mean"),
            F.sum("s_count").alias("weight"),
        )
    )
    return cells.groupBy("feature", "timestamp", "level", "tile").agg(
        F.collect_list(
            F.struct("bin", "s_sum_t_sum", "s_sum_t_mean", "weight")
        ).alias("bins"),
        F.lit(4**LEVEL_DIFF).alias("total_bins"),
    )


# ---------------------------------------------------------------------------
# G7: per-zoom grid stats
# ---------------------------------------------------------------------------


def grid_stats(
    subtile_df: DataFrame,
    min_level: int = MIN_SUBTILE_PRECISION,
    max_level: int = MAX_SUBTILE_PRECISION,
) -> DataFrame:
    """G7: min/max of the four grid aggregates per (feature, ts, zoom).

    One pass: explode ancestor zooms, re-aggregate subtile sums at each
    zoom, derive means, then min/max per zoom. Output columns follow the
    flattened ``min_s_sum_t_sum`` naming of the reference CSVs.
    """
    levels = F.sequence(F.lit(min_level), F.lit(max_level))
    df = subtile_df.withColumn("zoom", F.explode(levels))
    zshift = f"{MAX_SUBTILE_PRECISION} - zoom"
    df = df.select(
        "feature",
        "timestamp",
        "zoom",
        F.expr(f"shiftright(subtile.x, {zshift})").alias("sx"),
        F.expr(f"shiftright(subtile.y, {zshift})").alias("sy"),
        "s_sum_t_sum",
        "s_sum_t_mean",
        "s_count",
    )
    per_subtile = df.groupBy("feature", "timestamp", "zoom", "sx", "sy").agg(
        F.sum("s_sum_t_sum").alias("s_sum_t_sum"),
        F.sum("s_sum_t_mean").alias("s_sum_t_mean"),
        F.sum("s_count").alias("s_count"),
    )
    per_subtile = per_subtile.withColumn(
        "s_mean_t_sum", F.col("s_sum_t_sum") / F.col("s_count")
    ).withColumn("s_mean_t_mean", F.col("s_sum_t_mean") / F.col("s_count"))
    cols = ["s_sum_t_sum", "s_sum_t_mean", "s_mean_t_sum", "s_mean_t_mean"]
    exprs = [F.min(c).alias(f"min_{c}") for c in cols] + [
        F.max(c).alias(f"max_{c}") for c in cols
    ]
    return per_subtile.groupBy("feature", "timestamp", "zoom").agg(*exprs)


# ---------------------------------------------------------------------------
# Z-order (Morton) spatial layout: cluster rows so file min/max statistics
# prune 2-D regions — the storage-layout complement of the tile pyramid.
# ---------------------------------------------------------------------------

#: 16-bit → 32-bit bit-spread masks (classic Morton "magic numbers").
_SPREAD_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_bits(v: Column) -> Column:
    """Interleave-ready spread: bit i of a 16-bit int moves to bit 2i.
    Four shift-or-mask rounds, pure long arithmetic (codegen; identical
    `|`/`&`/`<<` semantics in SQL engines, so oracles replay it
    verbatim)."""
    out = v.cast("long")
    for sh, mask in _SPREAD_MASKS:
        out = (out.bitwiseOR(F.shiftleft(out, sh))).bitwiseAND(F.lit(mask))
    return out


def morton_code(x: Column, y: Column) -> Column:
    """Morton (Z-order) code of two 16-bit tile coordinates: x's bits on
    even positions, y's on odd.  Nearby (x, y) cells share long code
    prefixes, so sorting by the code linearizes 2-D locality — the
    basis of Z-ordered data layout."""
    return _spread_bits(x).bitwiseOR(F.shiftleft(_spread_bits(y), 1))


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str = "x",
    y_col: str = "y",
    n_files: int = 8,
    code_col: str = "zcode",
) -> None:
    """Write ``df`` parquet Z-ordered on (x_col, y_col): range-partition
    by Morton code, sort within partitions, keep the code column so
    scans can predicate on it.

    Why this is the 100 TB layout move: parquet row-group min/max
    statistics prune 1-D ranges for free, but a query region is 2-D —
    laid out row-major, every file spans the full x range and nothing
    prunes.  Z-ordering makes each file own a compact code interval
    (repartitionByRange gives DISJOINT intervals by construction), so a
    2-D region decomposes into a few code ranges and the scan skips
    every other file.  No shuffle beyond the one range exchange; the
    range boundaries come from Spark's own reservoir sampling.
    """
    coded = df.withColumn(
        code_col, morton_code(F.col(x_col), F.col(y_col))
    )
    (
        coded.repartitionByRange(n_files, F.col(code_col))
        .sortWithinPartitions(code_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_bucket_stats(
    df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    bucket_shift: int = 20,
) -> DataFrame:
    """Clustering diagnostics of the Z-order layout: bucket rows by the
    top Morton bits (bucket = code >> shift — what a range partitioner
    converges to on uniform data) and report, per bucket, the row
    count, the code interval, and how many distinct coarse tiles the
    bucket touches.  Low tile counts per bucket = high locality = file
    skipping will work.  All-integer output; the SQL oracle replays the
    bit arithmetic exactly.

    Returns (bucket, n_rows, min_code, max_code, n_tiles) sorted by
    bucket.
    """
    code = morton_code(F.col(x_col), F.col(y_col))
    tile_key = (
        F.shiftright(F.col(x_col), 6) * 1024 + F.shiftright(F.col(y_col), 6)
    )
    out = df.select(
        F.shiftright(code, bucket_shift).alias("bucket"),
        code.alias("code"),
        tile_key.alias("tile_key"),
    )
    return (
        out.groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("code").alias("min_code"),
            F.max("code").alias("max_code"),
            F.countDistinct("tile_key").alias("n_tiles"),
        )
        .orderBy("bucket")
    )
