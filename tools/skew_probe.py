"""Skew-stress probe (round-8 verdict item 7): measure the salted tiers
against their unsalted shapes on a planted hot-key dataset — the salt
operators were correctness-tested but had no measured skew datapoint.

Dataset (built under ``/tmp/sfdata/skew`` from sf0.1, ``copies``×):
* ``events_hot``  — events replicated; the second half of the copies
  force ``event_type`` to one hot value, so ~60% of all rows share it.
* ``orders_hot``  — orders replicated; the second half force
  ``o_custkey`` to one hot customer (~60% of rows on one join key).
Dimensions (customer) stay unscaled, as on any real star schema.

Probes (each min-of-``reps`` wall, result-equality asserted):
* ``agg``  — plain ``groupBy(event_type)`` vs ``salted_aggregation``.
  Expectation to verify, not assume: for algebraic aggregates Spark's
  partial aggregation already collapses the hot key map-side, so the
  salted tier's second shuffle should cost MORE here — the tier exists
  for the shapes partial agg can't save (documented in skew.py).
* ``join`` — orders_hot ⋈ customer three ways: AQE skew-join on
  (default), AQE skew-join OFF (the "cached/bucketed exchange AQE
  won't re-plan" shape salted_join documents), and ``salted_join``.
* ``temporal`` — the A1 datacube aggregation over the hot feature
  (keys = feature × month; partial-agg shape at scale).

Writes a ``skew_probe`` section into BENCH_SWEEP.json and prints one
JSON line.

Usage: python tools/skew_probe.py [copies] [reps] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = "/tmp/sfdata/skew"
HOT_TYPE = "signup"


def _build(spark, sf_dir: str, copies: int) -> dict[str, float]:
    from pyspark.sql import functions as F

    from slow_tortoise_spark.sources.reader import read_table

    os.makedirs(OUT_DIR, exist_ok=True)
    stats = {}

    ev = read_table(spark, f"{sf_dir}/events.parquet")
    parts = []
    for i in range(copies):
        c = ev.withColumn("event_id", F.col("event_id") + F.lit(i * (10 ** 9)))
        if i >= copies // 2:
            c = c.withColumn("event_type", F.lit(HOT_TYPE))
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{OUT_DIR}/events_hot.parquet")
    got = spark.read.parquet(f"{OUT_DIR}/events_hot.parquet")
    stats["events_rows"] = got.count()
    stats["events_hot_share"] = round(
        got.filter(F.col("event_type") == HOT_TYPE).count()
        / stats["events_rows"], 3
    )

    orders = read_table(spark, f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    hot_cust = orders.agg(F.min("o_custkey")).first()[0]
    parts = []
    for i in range(copies):
        c = orders.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * (10 ** 9))
        )
        if i >= copies // 2:
            c = c.withColumn("o_custkey", F.lit(hot_cust).cast("long"))
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(f"{OUT_DIR}/orders_hot.parquet")
    stats["orders_rows"] = spark.read.parquet(
        f"{OUT_DIR}/orders_hot.parquet"
    ).count()
    stats["hot_custkey"] = int(hot_cust)

    read_table(spark, f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    ).write.mode("overwrite").parquet(f"{OUT_DIR}/customer.parquet")
    return stats


def _timed(build_df, reps: int) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        build_df().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> int:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from slow_tortoise_spark.operators.skew import (
        salted_aggregation,
        salted_join,
    )
    from slow_tortoise_spark.operators.temporal import temporal_aggregation
    from slow_tortoise_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="skew_probe", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    stats = _build(spark, sf_dir, copies)
    events = spark.read.parquet(f"{OUT_DIR}/events_hot.parquet")
    orders = spark.read.parquet(f"{OUT_DIR}/orders_hot.parquet")
    cust = spark.read.parquet(f"{OUT_DIR}/customer.parquet").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )

    results: dict[str, dict] = {"dataset": stats}

    # --- aggregation ------------------------------------------------------
    base = events.select(
        "event_type", F.col("value").cast("decimal(25,6)").alias("v")
    )
    aggs = {"total": ("sum", "v"), "n": ("count", "v"),
            "vmin": ("min", "v"), "vmax": ("max", "v")}

    def plain_agg():
        return base.groupBy("event_type").agg(
            F.sum("v").alias("total"), F.count("v").alias("n"),
            F.min("v").alias("vmin"), F.max("v").alias("vmax"),
        )

    def salted_agg():
        return salted_aggregation(base, keys=["event_type"], aggs=aggs,
                                  salt_buckets=int(cpus))

    eq = sorted(map(tuple, plain_agg().collect())) == sorted(
        map(tuple, salted_agg().collect())
    )
    results["agg"] = {
        "plain_sec": _timed(plain_agg, reps),
        "salted_sec": _timed(salted_agg, reps),
        "equal": eq,
    }

    # --- join -------------------------------------------------------------
    def plain_join():
        return orders.join(cust, "o_custkey")

    def salted():
        return salted_join(orders, cust, "o_custkey", salt_buckets=int(cpus))

    # equality on aggregates (the full result is copies× orders rows);
    # cast to decimal BEFORE summing — a double sum is accumulation-order
    # dependent across join strategies and would flake the equality
    def sig(df):
        r = df.agg(
            F.count("*"),
            F.sum(F.col("o_totalprice").cast("decimal(25,6)")),
            F.countDistinct("c_mktsegment"),
        ).first()
        return tuple(r)

    jeq = sig(plain_join()) == sig(salted())
    results["join"] = {"equal": jeq}
    # With the 15k-row dim under the broadcast threshold, every variant
    # is a broadcast hash join and skew is invisible (BHJ has no shuffle
    # to skew) — which is itself the first-line answer at scale: keep
    # dims broadcastable.  The probe's question is the CLUSTER shape
    # where the dim exceeds the threshold (or feeds an exchange AQE
    # won't re-plan), so the shuffle path is forced for all variants.
    results["join"]["broadcast_sec"] = _timed(plain_join, reps)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        results["join"]["smj_aqe_skew_sec"] = _timed(plain_join, reps)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        try:
            results["join"]["smj_noskewjoin_sec"] = _timed(plain_join, reps)
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        results["join"]["salted_sec"] = _timed(salted, reps)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )

    # --- temporal (A1 datacube shape over the hot feature) ---------------
    cube = events.select(
        F.col("event_type").alias("feature"),
        F.unix_millis(F.col("ts")).alias("timestamp"),
        F.col("value").alias("value"),
    )

    def temporal():
        return temporal_aggregation(cube, "month")

    results["temporal"] = {"month_sec": _timed(temporal, reps)}

    sweep_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SWEEP.json",
    )
    sweep = json.load(open(sweep_path)) if os.path.exists(sweep_path) else {}
    sweep["skew_probe"] = {"copies": copies, "reps": reps, **results}
    with open(sweep_path, "w") as f:
        json.dump(sweep, f, indent=1)
    print(json.dumps({"skew_probe": sweep["skew_probe"]}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
