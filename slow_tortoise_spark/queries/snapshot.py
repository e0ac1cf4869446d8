"""Snapshot time travel, driver-checked (round 6).  Formerly
queries.py lines 5356-5431."""
from __future__ import annotations

from slow_tortoise_spark.queries._shared import (
    F,
    _t,
)
from slow_tortoise_spark.queries.catalog import ORACLE_SQL, QUERIES

# Snapshot time travel, driver-checked (round-5 verdict item 7: the
# merge-on-write layer was only ever tested against itself; this gives the
# commit protocol an INDEPENDENT-engine witness).  Two batch commits run
# through the exact foreachBatch merge streaming_upsert uses
# (streaming/pipeline.py _upsert_merge_fn — the streaming wrapper adds only
# the trigger); the query then time-travel-reads version 0 AFTER commit 1
# has rewritten the snapshot and flipped the manifest.  The oracle replays
# commit 0's change set in SQL — so a hash match proves the older version
# is byte-equivalent to an independent replay, i.e. commit 1 touched
# nothing it shouldn't have.
# ---------------------------------------------------------------------------


def q_snapshot_time_travel(spark, sf_dir):
    """Stage a two-commit upsert under a fresh temp root, then read the
    COMMIT-0 snapshot via read_snapshot_at.  Commit 0 inserts every
    third order (version 1); commit 1 updates every sixth (version 2,
    price zeroed) and tombstones every twelfth — so the live view and
    v0 genuinely diverge, and only time travel can reproduce v0.  The
    result is localCheckpoint-ed so the temp root can be removed before
    the driver evaluates the frame."""
    import shutil
    import tempfile

    from slow_tortoise_spark.streaming.pipeline import (
        _upsert_merge_fn,
        read_snapshot_at,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    b0 = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        "*", F.lit(1).alias("ver"), F.lit(False).alias("deleted")
    )
    b1 = (
        orders.filter(F.col("o_orderkey") % 6 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.lit(0.0).alias("o_totalprice"),
            F.lit(2).alias("ver"),
            (F.col("o_orderkey") % 12 == 0).alias("deleted"),
        )
    )
    root = tempfile.mkdtemp(prefix="snap_tt_")
    try:
        merge = _upsert_merge_fn(
            spark, root, ["o_orderkey"], ["ver"], "deleted"
        )
        merge(b0, 0)
        merge(b1, 1)
        v0 = read_snapshot_at(spark, root, "v0000000000")
        out = (
            v0.select("o_orderkey", "o_custkey", "o_orderstatus",
                      "o_totalprice")
            .orderBy("o_orderkey")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


_Q_SNAPSHOT_TIME_TRAVEL = """
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 = 0
  ORDER BY o_orderkey
"""


QUERIES["snapshot_time_travel"] = q_snapshot_time_travel
ORACLE_SQL["snapshot_time_travel"] = _Q_SNAPSHOT_TIME_TRAVEL




# Incremental aggregate snapshot, driver-checked (round-7 verdict item
# 6: the algebraic-state maintenance layer — streaming_agg_snapshot —
# was only ever tested against itself).  Three micro-batch commits,
# each a disjoint third of `orders`, run through the exact foreachBatch
# merge the stream uses (_agg_merge_fn; the streaming wrapper adds only
# the trigger), with one batch REPLAYED mid-sequence to exercise the
# no-double-count contract.  The oracle is DuckDB's one-shot aggregate
# over all of `orders` — a hash match proves three incremental
# (previous snapshot + batch partial) merges plus a replay are
# byte-equivalent to aggregating the whole table at once.  Sums run in
# integer cents: float addition is order-sensitive, bigint addition is
# exact in any merge order, so the equivalence is bit-level.
# ---------------------------------------------------------------------------


def q_agg_snapshot_incremental(spark, sf_dir):
    """Stage three agg-snapshot commits (orders thirds by o_orderkey%3,
    batch 1 replayed once after commit) under a fresh temp root, then
    read the final snapshot: per-status lifetime totals in cents plus
    the maintained _n row count.  localCheckpoint-ed so the temp root
    can be removed before the driver evaluates the frame."""
    import shutil
    import tempfile

    from slow_tortoise_spark.streaming.pipeline import (
        _agg_merge_fn,
        read_snapshot,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    root = tempfile.mkdtemp(prefix="snap_agg_")
    try:
        merge = _agg_merge_fn(spark, root, ["o_orderstatus"], ["cents"])
        for b in range(3):
            merge(orders.filter(F.col("o_orderkey") % 3 == b), b)
            if b == 1:
                # committed replay — must no-op, not double-count
                merge(orders.filter(F.col("o_orderkey") % 3 == 1), 1)
        snap = read_snapshot(spark, root, live_only=False)
        out = (
            snap.select(
                "o_orderstatus",
                F.col("cents").alias("total_cents"),
                F.col("_n").alias("n_orders"),
            )
            .orderBy("o_orderstatus")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


_Q_AGG_SNAPSHOT_INCREMENTAL = """
  SELECT o_orderstatus,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS total_cents,
         COUNT(*) AS n_orders
  FROM orders
  GROUP BY o_orderstatus
  ORDER BY o_orderstatus
"""


QUERIES["agg_snapshot_incremental"] = q_agg_snapshot_incremental
ORACLE_SQL["agg_snapshot_incremental"] = _Q_AGG_SNAPSHOT_INCREMENTAL
