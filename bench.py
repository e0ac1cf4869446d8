"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with a noop-format write (df.write.format
("noop")), which computes EVERY output column and row without collecting
to the driver. A count() action is deliberately not used: Catalyst prunes
everything count doesn't need, so map-only projections, window expressions
and sorts would be deleted from the measured plan (round-4 verdict:
window_running measured 0.58s as a count vs 4.5s fully computed). The
session is warmed with a trivial job first so JVM startup isn't attributed
to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Headline set: one per operator family, weighted toward the heavy ones.
BENCH_QUERIES = [
    "pricing_summary",      # scan + hash agg
    "top_orders",           # fact-fact join + topk
    "region_revenue",       # 6-table join
    "window_running",       # big window
    "global_timeseries",    # two-stage datacube agg
    "regional_rollup",      # ROLLUP all levels
    "regional_extrema",     # window min/max + ties
    "qualifier_pivot",      # pivot
    "tile_rollup",          # tile geometry + agg
    "grid_stats",           # exploded zooms
    "minhash_lsh_pairs",    # dedup scale path
    "jaccard_pairs",        # dedup exact path
    "simhash",              # bit-math fingerprints
    "ann_cosine_topk",      # similarity scan
    "token_stats",          # text metrics
    "asof_join",            # union+window as-of join
    "rolling_window",       # time-range window frames
    "salted_agg",           # two-phase skew aggregation
]


def main() -> None:
    from slow_tortoise_spark.queries import QUERIES, VERIFIER_QUERIES
    from slow_tortoise_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="slow_tortoise_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    # Warm up the JVM, codegen compiler, and parquet reader paths so
    # one-time costs aren't attributed to the first query. (Data still
    # flows from files on every query; only process state is warmed.)
    spark.range(1000).selectExpr("sum(id)").collect()
    from slow_tortoise_spark.sources.reader import read_table

    for t in ("lineitem", "orders", "customer", "events", "documents",
              "embeddings", "nation", "region", "supplier"):
        read_table(spark, f"{sf_dir}/{t}.parquet").limit(1).collect()

    timings: dict[str, float] = {}
    # The bench set is held stable round-over-round; catalog↔verifier
    # rotations (round 3) don't change what gets measured.
    catalog = {**VERIFIER_QUERIES, **QUERIES}
    for name in BENCH_QUERIES:
        fn = catalog[name]
        best, n = None, 0
        # min-of-3: the first iteration absorbs cold page-cache + codegen
        # for this query's tables (measured: first isolated suite run 15.0s
        # vs 11.4s steady state), the min over the rest damps shared-
        # machine jitter — the round-3 18.1s record was contention, not a
        # plan regression (same code measured 11.4s alone).
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, sf_dir)
            # noop write: computes every column (windows, regexes, sorts
            # survive in the plan — count() would prune them) yet ships
            # nothing to the driver and writes nothing to disk.
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
        n = df.count()  # row count for the report only — untimed
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
