"""Join-size reduction: Bloom-filtered equi-joins.

The expensive part of a big-to-small equi-join at 100 TB is shuffling
the big side; when the small side's key set is selective, most shuffled
rows are discarded by the join anyway.  A Bloom filter over the small
side's keys (bounded at 1 MiB no matter its size —
``operators/dedup.build_bloom_filter``) pre-filters the big side BEFORE
its exchange: no false negatives, so the join result is EXACTLY the
plain join's, but the shuffle carries only (matches + false positives).
Spark's own runtime row-level filtering does this opportunistically for
some plans; this operator makes it explicit, composable, and testable.

The membership probe is ``k`` chained BROADCAST left joins against the
word table (one per hash) — no explode (that would inflate the big side
k×) and no re-grouping shuffle; each probe is an in-memory hash lookup
inside the big side's scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from slow_tortoise_spark.operators.cachectl import tracked_cache
from slow_tortoise_spark.operators.dedup import (
    _bloom_positions,
    build_bloom_filter,
)


def bloom_prefilter(
    big: DataFrame,
    keys: DataFrame,
    key_col: str,
    k: int = 3,
) -> DataFrame:
    """Keep only ``big`` rows whose ``key_col`` might be in ``keys``
    (no false negatives; false-positive rate set by the 2^20-bit /
    ``k``-hash geometry).  Pure broadcast probes — adds no shuffle to
    the big side.

    The word table is cache()d: all ``k`` probe joins read it, and the
    differing per-probe column aliases prevent AQE's ReuseExchange from
    deduplicating the build (the same self-join recompute hazard as the
    LSH candidate generators — see NOTES) — uncached, the keys-side
    aggregation would run k times."""
    bloom = tracked_cache(build_bloom_filter(
        keys.select(key_col).distinct(), key_col, k
    ))
    pos = _bloom_positions(F.col(key_col).cast("string"), k)
    out = big
    cond = None
    for r in range(k):
        out = out.withColumn(f"_p{r}", F.element_at(pos, r + 1))
        side = bloom.select(
            F.col("word").alias(f"_w{r}"), F.col("bits").alias(f"_b{r}")
        )
        out = out.withColumn(
            f"_w{r}", F.shiftright(F.col(f"_p{r}"), 5).cast("int")
        ).join(F.broadcast(side), f"_w{r}", "left")
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(_p{r} & 31 AS INT))"
        )
        bit = (
            F.coalesce(F.col(f"_b{r}"), F.lit(0)).bitwiseAND(mask) != 0
        )
        cond = bit if cond is None else cond & bit
    return out.filter(cond).drop(
        *[f"_p{r}" for r in range(k)],
        *[f"_w{r}" for r in range(k)],
        *[f"_b{r}" for r in range(k)],
    )


def bloom_filtered_join(
    big: DataFrame,
    small: DataFrame,
    key_col: str,
    k: int = 3,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with Bloom semi-join reduction on the big side.
    Result is identical to ``big.join(small, key_col, how)`` for inner
    and left_semi joins (the filter never removes a true match)."""
    if how not in ("inner", "left_semi"):
        raise ValueError("bloom reduction is sound for inner/left_semi only")
    filtered = bloom_prefilter(big, small, key_col, k)
    return filtered.join(small, key_col, how)
