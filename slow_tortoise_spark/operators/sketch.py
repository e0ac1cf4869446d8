"""Mergeable sketches for corpus-scale approximate statistics.

Count-min here is DETERMINISTIC (salted-md5 bucket hashes), so unlike
most sketch libraries it is exactly replayable by a SQL oracle: the
d x w counter table is a plain groupBy and estimates are integer MINs —
the whole path value-checks, while keeping the sketch's contract
(size-bounded state, never-underestimate).

Scale shape: a count-min build is ONE partially-aggregated shuffle
collapsing any corpus to d*w integers (fits in a broadcast at any corpus
size); estimates are a broadcast join.  This is the answer to "how many
times does each of these 10k phrases appear in 100 TB" without a
full-vocabulary shuffle.  For distinct counts, the HLL helpers lean on
Spark's built-in Apache DataSketches HLL (hll_sketch_agg), whose
sketches are mergeable across partitions/days — the property the tests
pin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cms_bucket(key: Column, row: int, width: int) -> Column:
    """Row ``row``'s bucket for ``key``: 16 bits of salted md5, mod w."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"cms{row}:"), key)), 1, 4),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch over a key column: ``depth`` hash rows of
    ``width`` counters.  Each input key increments one counter per row;
    the build is a single groupBy over (row, bucket) — map-side combine
    bounds the shuffle at d*w rows per task regardless of corpus size.

    Returns (row int, bucket long, cnt bigint), at most depth*width rows
    (absent counters are implicitly zero).
    """
    key = F.col(key_col).cast("string")
    w = (
        F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    )
    # One pass, in-row: each input row explodes into its depth (row,
    # bucket) entries.  The former unionAll of depth per-row selects
    # re-evaluated the input subtree depth times — when the key column
    # rides on an upstream tokenize/explode, that multiplied the whole
    # scan cost by depth.
    stacked = df.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    _cms_bucket(key, r, width).alias("bucket"),
                )
                for r in range(depth)
            ])
        ).alias("e"),
        w.alias("w"),
    ).select("e.row", "e.bucket", "w")
    return stacked.groupBy("row", "bucket").agg(F.sum("w").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-estimate counts for a frame of candidate keys: min over the
    key's ``depth`` counters.  Never underestimates (every counter the
    key touched contains its full count plus collisions); the estimate
    error is bounded by collision mass ~ N/width per row, and taking the
    min over d independent rows drives the overshoot probability down
    exponentially.

    The sketch side is d*w rows — broadcast by size; candidate keys
    stream past it without shuffling the corpus.

    Returns ``keys`` plus (est bigint).
    """
    key = F.col(key_col).cast("string")
    probes = keys.select(
        key_col,
        *[
            _cms_bucket(key, r, width).alias(f"b{r}")
            for r in range(depth)
        ],
    )
    out = probes
    for r in range(depth):
        side = cms.filter(F.col("row") == r).select(
            F.col("bucket").alias(f"b{r}"), F.col("cnt").alias(f"c{r}")
        )
        out = out.join(F.broadcast(side), f"b{r}", "left")
    est = F.least(
        *[F.coalesce(F.col(f"c{r}"), F.lit(0).cast("bigint"))
          for r in range(depth)]
    )
    return out.select(key_col, est.alias("est"))


def hll_sketch_by_group(
    df: DataFrame, group_col: str, key_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group HLL sketches (Apache DataSketches via Spark built-ins):
    the persistable form of a distinct count — store one binary sketch
    per group per ingest batch, and any later union of sketches yields
    the distinct count of the union WITHOUT revisiting the data.  This
    is how incremental pipelines keep "distinct users per day / month /
    all-time" at 100 TB: merge, never recount.

    Returns (group_col, sketch binary).
    """
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch")
    )


def hll_union_estimate(sketches: DataFrame, group_col: str) -> DataFrame:
    """Merge per-group sketches to one estimate of the UNION's distinct
    count (mergeability is the whole point: sketches from different
    partitions, files, or days combine losslessly)."""
    return sketches.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sketch"))
        ).alias("distinct_est")
    )
