"""Streaming operators: availableNow file-source runs must converge to
the batch-equivalent results on complete inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from slow_tortoise_spark.sources.reader import read_table
from slow_tortoise_spark.streaming.pipeline import (
    run_to_memory,
    running_user_state,
    sessionize,
    stream_datacube,
    windowed_temporal_agg,
)

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("feature", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream") / "events")
    (
        read_table(spark, f"{sf_dir}/events.parquet")
        .select(
            "event_id",
            F.col("ts").alias("event_time"),
            "user_id",
            F.col("event_type").alias("feature"),
            "value",
        )
        .repartition(4)
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def test_windowed_agg_matches_batch(spark, stream_dir):
    sdf = stream_datacube(spark, stream_dir, schema=EVENTS_STREAM_SCHEMA)
    # complete mode: append would hold back windows the watermark hasn't
    # passed, and a bounded run ends before that happens.
    out = run_to_memory(
        windowed_temporal_agg(sdf, window="1 hour"), "win_counts", spark,
        output_mode="complete",
    )
    batch = (
        spark.read.parquet(stream_dir)
        .groupBy(F.window("event_time", "1 hour").alias("w"), "feature")
        .agg(F.count("value").alias("t_count"), F.sum("value").alias("t_sum"))
    )
    got = {(r["window_start"], r["feature"]): (r["t_count"], r["t_sum"])
           for r in out.collect()}
    want = {(r["w"]["start"], r["feature"]): (r["t_count"], r["t_sum"])
            for r in batch.collect()}
    assert set(got) == set(want)
    for k, (n, s) in want.items():
        assert got[k][0] == n and got[k][1] == pytest.approx(s)


def test_sessionize(spark, stream_dir):
    sdf = stream_datacube(spark, stream_dir, schema=EVENTS_STREAM_SCHEMA)
    out = run_to_memory(sessionize(sdf, gap="30 minutes"), "sessions", spark,
                        output_mode="complete")
    rows = out.collect()
    assert rows, "no sessions produced"
    # session invariants: end > start, totals positive, per-user coverage
    assert all(r["session_end"] > r["session_start"] for r in rows)
    total_events = sum(r["n_events"] for r in rows)
    assert total_events == spark.read.parquet(stream_dir).count()


def test_running_user_state(spark, stream_dir):
    sdf = stream_datacube(spark, stream_dir, schema=EVENTS_STREAM_SCHEMA)
    out = run_to_memory(
        running_user_state(sdf), "running_state", spark, output_mode="update"
    )
    # single micro-batch → one row per user with the full totals
    batch = (
        spark.read.parquet(stream_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
    )
    got = {r["user_id"]: (r["n_events"], r["total"]) for r in out.collect()}
    for r in batch.collect():
        assert got[r["user_id"]][0] == r["n"]
        assert got[r["user_id"]][1] == pytest.approx(r["total"])


def test_streaming_dedup(spark, stream_dir, tmp_path):
    from slow_tortoise_spark.streaming.pipeline import streaming_dedup

    # duplicate the stream dir contents → every event arrives twice
    dup_dir = str(tmp_path / "dup")
    base = spark.read.parquet(stream_dir)
    base.write.mode("overwrite").parquet(dup_dir)
    base.write.mode("append").parquet(dup_dir)

    sdf = stream_datacube(spark, dup_dir, schema=EVENTS_STREAM_SCHEMA)
    out = run_to_memory(
        streaming_dedup(sdf, ["event_id"]), "dedup_out", spark
    )
    n_unique = base.count()
    assert spark.read.parquet(dup_dir).count() == 2 * n_unique
    assert out.count() == n_unique
    assert out.select("event_id").distinct().count() == n_unique
