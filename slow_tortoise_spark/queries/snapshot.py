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


