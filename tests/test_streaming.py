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


def test_watermark_advances_across_batches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): the watermark advances
    from batch 1's max event time, and every closed window is emitted
    exactly once in append mode. (Dropping sub-watermark late rows is
    best-effort in Spark — observed: a late row whose window is already
    past the watermark is admitted and its window emitted immediately —
    so this pins the advancement + exactly-once contract instead.)"""
    import os
    import time as _time

    import pandas as pd

    src = str(tmp_path / "late_src")
    os.makedirs(src, exist_ok=True)

    def write_file(name, ts_list, mtime):
        pdf = pd.DataFrame(
            {
                "event_id": range(len(ts_list)),
                "event_time": pd.to_datetime(ts_list),
                "user_id": [1] * len(ts_list),
                "feature": ["f"] * len(ts_list),
                "value": [1.0] * len(ts_list),
            }
        )
        path = os.path.join(src, name)
        # μs precision: ns parquet would surface as long under the
        # session's nanosAsLong conf and clash with the stream schema
        pdf.to_parquet(path, coerce_timestamps="us",
                       allow_truncated_timestamps=True)
        os.utime(path, (mtime, mtime))

    now = _time.time()
    # batch 1: events through 10:00 → watermark becomes 10:00 − 1h = 09:00
    write_file("a.parquet", ["2024-01-01 08:30:00", "2024-01-01 10:00:00"], now - 100)
    # batch 2: one on-time event (09:30) and one too-late event (07:00)
    write_file("b.parquet", ["2024-01-01 09:30:00", "2024-01-01 07:00:00"], now - 50)

    sdf = (
        spark.readStream.schema(
            "event_id long, event_time timestamp, user_id long, "
            "feature string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = windowed_temporal_agg(sdf, window="1 hour", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    watermarks = [p["eventTime"].get("watermark") for p in q.recentProgress]
    assert len(watermarks) >= 2  # maxFilesPerTrigger=1 → one batch per file
    # batch 1 runs with the watermark derived from batch 0: 10:00 − 1h
    assert watermarks[1] == "2024-01-01T09:00:00.000Z"

    rows = spark.table("late_out").collect()
    emitted = [r["window_start"].isoformat() for r in rows]
    # every closed window emitted exactly once (no duplicates across
    # batches), incl. the 08:00 window closed by the watermark advance
    assert len(emitted) == len(set(emitted))
    assert "2024-01-01T08:00:00" in emitted
    # windows not yet below the watermark (09:00, 10:00) are withheld
    assert "2024-01-01T10:00:00" not in emitted


def test_streaming_dedup_state_evicted_past_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark semantics pinned: a duplicate key
    arriving within the watermark is suppressed, while a duplicate whose
    original fell behind the advanced watermark passes through (its state
    was evicted) — the documented at-scale trade-off."""
    import os
    import time as _time

    import pandas as pd

    from slow_tortoise_spark.streaming.pipeline import streaming_dedup

    d = str(tmp_path / "evict")
    os.makedirs(d)

    def write(name, rows, mtime):
        # μs precision: ns parquet would surface as long under the
        # session's nanosAsLong conf and clash with the stream schema
        path = os.path.join(d, name)
        pd.DataFrame(rows).to_parquet(
            path, coerce_timestamps="us", allow_truncated_timestamps=True,
        )
        os.utime(path, (mtime, mtime))  # order batches by mtime

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    hours = pd.Timedelta

    # batch 1: key 1 at t0 (+ a dup within the same batch), plus a
    # high-watermark row pushing the watermark past t0 + 1h.
    now = _time.time()
    # batch 1: key 1 at t0 (+ a same-batch dup, suppressed), plus a
    # high-watermark row pushing the watermark to 09:00.
    write("b1.parquet", [
        {"event_id": 1, "event_time": t0, "user_id": 1,
         "feature": "f", "value": 1.0},
        {"event_id": 1, "event_time": t0 + hours("10 minutes"), "user_id": 1,
         "feature": "f", "value": 2.0},
        {"event_id": 9, "event_time": t0 + hours("10 hours"), "user_id": 9,
         "feature": "f", "value": 9.0},
    ], now - 100)
    # batch 2: an unrelated key whose batch lets the 09:00 watermark take
    # effect for state eviction (cleanup runs with the watermark set at
    # the END of the previous batch — observed Spark behavior); key 9
    # re-arrives within its watermark window → suppressed.
    write("b2.parquet", [
        {"event_id": 5, "event_time": t0 + hours("11 hours"), "user_id": 5,
         "feature": "f", "value": 5.0},
        {"event_id": 9, "event_time": t0 + hours("10 hours"), "user_id": 9,
         "feature": "f", "value": 9.0},
    ], now - 50)
    # batch 3: key 1 again, far beyond the 1h watermark → its state was
    # evicted → passes through as a fresh row.
    write("b3.parquet", [
        {"event_id": 1, "event_time": t0 + hours("20 hours"), "user_id": 1,
         "feature": "f", "value": 3.0},
    ], now - 10)

    sdf = stream_datacube(spark, d, schema=EVENTS_STREAM_SCHEMA,
                          max_files_per_trigger=1)
    out = run_to_memory(
        streaming_dedup(sdf, ["event_id"], watermark="1 hour"),
        "dedup_evict", spark,
    )
    got = sorted((r["event_id"], r["value"]) for r in out.collect())
    # key 1: original + past-watermark re-arrival; keys 5/9: once each.
    assert got == [(1, 1.0), (1, 3.0), (5, 5.0), (9, 9.0)]


def test_checkpoint_recovery_preserves_dedup_state(spark, tmp_path):
    """Stop/restart against the same checkpoint: run 2 must recover run
    1's dedup state (duplicate of an already-seen key stays suppressed)
    and process only the newly-arrived file."""
    import os

    import pandas as pd

    from slow_tortoise_spark.streaming.pipeline import streaming_dedup

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    t0 = pd.Timestamp("2024-01-01 00:00:00")

    def write(name, rows):
        pd.DataFrame(rows).to_parquet(
            os.path.join(src, name), coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )

    def run_once():
        sdf = stream_datacube(spark, src, schema=EVENTS_STREAM_SCHEMA)
        q = (
            streaming_dedup(sdf, ["event_id"], watermark="1 day")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    write("a.parquet", [
        {"event_id": 1, "event_time": t0, "user_id": 1, "feature": "f",
         "value": 1.0},
        {"event_id": 2, "event_time": t0, "user_id": 2, "feature": "f",
         "value": 2.0},
    ])
    run_once()
    assert spark.read.parquet(sink).count() == 2

    # new file after the stream stopped: one dup (suppressed via recovered
    # state) + one genuinely new key
    write("b.parquet", [
        {"event_id": 1, "event_time": t0, "user_id": 1, "feature": "f",
         "value": 1.0},
        {"event_id": 3, "event_time": t0, "user_id": 3, "feature": "f",
         "value": 3.0},
    ])
    run_once()
    got = sorted(r["event_id"] for r in spark.read.parquet(sink).collect())
    assert got == [1, 2, 3]


def test_stream_stream_join_funnel(spark, tmp_path):
    """Watermarked stream-stream inner join: only right events within
    the window AFTER a left event match; same-user-out-of-window and
    other-user events don't."""
    import os

    import pandas as pd

    from slow_tortoise_spark.streaming.pipeline import stream_stream_join

    t0 = pd.Timestamp("2024-01-01 12:00:00")

    def mk(name, rows):
        d = str(tmp_path / name)
        os.makedirs(d)
        pd.DataFrame(rows).to_parquet(
            os.path.join(d, "part.parquet"), coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        return stream_datacube(spark, d, schema=EVENTS_STREAM_SCHEMA)

    clicks = mk("clicks", [
        {"event_id": 1, "event_time": t0, "user_id": 1, "feature": "c",
         "value": 0.0},
        {"event_id": 2, "event_time": t0, "user_id": 2, "feature": "c",
         "value": 0.0},
    ])
    purchases = mk("purchases", [
        # in-window, same user → match
        {"event_id": 10, "event_time": t0 + pd.Timedelta("30 min"),
         "user_id": 1, "feature": "p", "value": 9.99},
        # BEFORE the click → no match
        {"event_id": 11, "event_time": t0 - pd.Timedelta("5 min"),
         "user_id": 1, "feature": "p", "value": 1.0},
        # past the 1h window → no match
        {"event_id": 12, "event_time": t0 + pd.Timedelta("2 hours"),
         "user_id": 2, "feature": "p", "value": 2.0},
        # other user → no match
        {"event_id": 13, "event_time": t0 + pd.Timedelta("10 min"),
         "user_id": 9, "feature": "p", "value": 3.0},
    ])
    out = run_to_memory(
        stream_stream_join(clicks, purchases, within="1 hour"),
        "ssj_unit", spark,
    )
    got = [(r["l_event_id"], r["r_event_id"]) for r in out.collect()]
    assert got == [(1, 10)]


def test_kill_mid_batch_recovery_exactly_once(spark, tmp_path):
    """Hard failure MID-batch — after some artifact writes of that batch
    already hit the store — then restart from the same checkpoint: the
    failed batch replays under the SAME batch id, the partial artifacts
    are overwritten, and the final artifact set is exactly-once (every
    input row exactly one artifact, no orphans, no duplicates).

    This is the crash-recovery contract of the foreachBatch bridge: the
    source offsets for a batch are committed to the checkpoint WAL before
    processing, so a replay sees identical data, and deterministic
    artifact paths make the rewrite idempotent."""
    import json
    import os

    import pandas as pd

    from slow_tortoise_spark.sinks.writers import FileWriter

    src = str(tmp_path / "src")
    art = str(tmp_path / "artifacts")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    poison = str(tmp_path / "poison.marker")
    batch_log = str(tmp_path / "batches.jsonl")

    t0 = pd.Timestamp("2024-01-01 00:00:00")

    def write(name, rows):
        pd.DataFrame(rows).to_parquet(
            os.path.join(src, name), coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )

    write("a.parquet", [
        {"event_id": 1, "event_time": t0, "user_id": 1, "feature": "f",
         "value": 1.0},
        {"event_id": 2, "event_time": t0, "user_id": 2, "feature": "f",
         "value": 2.0},
    ])
    write("b.parquet", [
        {"event_id": 3, "event_time": t0, "user_id": 3, "feature": "f",
         "value": 3.0},
        {"event_id": 4, "event_time": t0, "user_id": 4, "feature": "f",
         "value": 4.0},
    ])
    open(poison, "w").write("arm")

    writer = FileWriter(art)

    def batch_fn(df, batch_id):
        # driver-side foreachBatch: one artifact per input row,
        # deterministic path — the idempotence the replay relies on
        rows = sorted(df.collect(), key=lambda r: r["event_id"])
        with open(batch_log, "a") as f:
            f.write(json.dumps({"batch": batch_id,
                                "ids": [r["event_id"] for r in rows]}) + "\n")
        for i, r in enumerate(rows):
            writer.write(f"{r['event_id']},{r['value']},batch={batch_id}\n",
                         f"events/{r['event_id']}.csv")
            if os.path.exists(poison) and batch_id > 0 and i == 0:
                os.remove(poison)  # fail once, succeed on replay
                raise RuntimeError("simulated mid-batch crash")

    def run():
        sdf = stream_datacube(spark, src, schema=EVENTS_STREAM_SCHEMA,
                              max_files_per_trigger=1)
        q = (
            sdf.writeStream.foreachBatch(batch_fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="mid-batch crash"):
        run()

    # the crash left a PARTIAL batch on disk: the poisoned batch wrote
    # its first artifact before dying
    n_after_crash = len(os.listdir(os.path.join(art, "events")))
    assert 2 < n_after_crash < 6

    run()  # restart from the same checkpoint

    # exactly-once: every input row has exactly one artifact
    files = sorted(os.listdir(os.path.join(art, "events")))
    assert files == ["1.csv", "2.csv", "3.csv", "4.csv"]
    log = [json.loads(line) for line in open(batch_log)]
    attempts = {}
    for e in log:
        attempts.setdefault(e["batch"], []).append(e["ids"])
    # the failed batch replayed under the SAME id with IDENTICAL rows
    replayed = [b for b, runs in attempts.items() if len(runs) > 1]
    assert replayed, f"no batch replayed: {attempts}"
    for b in replayed:
        assert len(set(map(tuple, attempts[b]))) == 1
    # and each artifact's content records the batch that owns it —
    # replay overwrote the partial write with the same bytes
    for f in files:
        body = open(os.path.join(art, "events", f)).read()
        eid = int(f.split(".")[0])
        owner = next(b for b, runs in sorted(attempts.items())
                     if eid in runs[0])
        assert body.endswith(f"batch={owner}\n")


def test_write_stream_artifacts_bridge(spark, stream_dir, tmp_path):
    """foreachBatch bridge: a streaming run emits the same artifact family
    (per-feature CSVs via write_grouped_csv) as a batch run."""
    import glob
    import os

    from slow_tortoise_spark.sinks.writers import FileWriter, write_grouped_csv
    from slow_tortoise_spark.streaming.pipeline import write_stream_artifacts

    out = str(tmp_path / "stream_artifacts")
    ckpt = str(tmp_path / "ckpt")
    writer = FileWriter(out)

    def batch_fn(df, batch_id):
        write_grouped_csv(
            df.groupBy("feature").count(),
            group_cols=["feature"],
            path_fn=lambda k, b=batch_id: f"counts/{b}/{k['feature']}.csv",
            writer=writer,
        )

    sdf = stream_datacube(spark, stream_dir, schema=EVENTS_STREAM_SCHEMA)
    q = write_stream_artifacts(sdf, batch_fn, ckpt)
    q.awaitTermination()

    files = glob.glob(f"{out}/counts/*/*.csv")
    assert files
    feats = {os.path.basename(f)[:-4] for f in files}
    want = {r["feature"] for r in
            spark.read.parquet(stream_dir).select("feature").distinct().collect()}
    assert feats == want


def test_streaming_index_dedup_stream_static_anti(spark, tmp_path):
    """Streamed docs already present in the static corpus index (by
    normalized-text fingerprint) are suppressed; fresh docs pass.  The
    streaming result equals the batch incremental-dedup exact tier over
    the same inputs."""
    import json

    from pyspark.sql import types as T

    from slow_tortoise_spark.operators.dedup import build_dedup_index
    from slow_tortoise_spark.streaming.pipeline import streaming_index_dedup

    corpus = spark.createDataFrame([
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "pack my box with five dozen liquor jugs now"),
    ], "doc_id long, text string")
    index = build_dedup_index(corpus, k=8, bands=4)

    src = tmp_path / "incoming"
    src.mkdir()
    batch = [
        {"doc_id": 10, "text": "  THE quick brown fox jumps over the lazy dog"},
        {"doc_id": 11, "text": "entirely new material for the stream"},
        {"doc_id": 12, "text": "pack my box with five dozen liquor jugs now"},
    ]
    (src / "b0.json").write_text("\n".join(json.dumps(r) for r in batch))

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    sdf = spark.readStream.schema(schema).json(str(src))
    out = run_to_memory(
        streaming_index_dedup(sdf, index), "index_dedup", spark
    )
    assert {r["doc_id"] for r in out.collect()} == {11}


def test_streaming_upsert_converges_to_batch_merge(spark, tmp_path):
    """Three change files drained one micro-batch at a time
    (maxFilesPerTrigger=1): the maintained snapshot must equal a single
    batch compaction of all changes, tombstones must stay dead even
    when an older version of the deleted key arrives in a LATER batch,
    and the manifest must point at the newest committed version."""
    import os

    from slow_tortoise_spark.operators.cdc import latest_by_key
    from slow_tortoise_spark.streaming.pipeline import (
        read_snapshot,
        streaming_upsert,
    )

    src = tmp_path / "changes"
    src.mkdir()
    schema = "k long, v long, payload string, deleted boolean"
    batches = [
        [(1, 1, "a1", False), (2, 1, "b1", False)],
        [(1, 2, "a2", False), (3, 5, None, True), (4, 1, "d1", False)],
        [(3, 2, "c-late", False), (2, 3, "b3", False)],  # 3 stays dead
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).json(str(src / f"b{i}.json"))

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "*"))
    )
    root = str(tmp_path / "snapshot")
    os.makedirs(root, exist_ok=True)
    q = streaming_upsert(
        sdf, root, key_cols=["k"], order_cols=["v"],
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()

    live = {r["k"]: r for r in read_snapshot(spark, root).collect()}
    assert live[1]["payload"] == "a2"
    assert live[2]["payload"] == "b3"
    assert 3 not in live  # tombstone beat the late, older version
    assert live[4]["payload"] == "d1"

    # snapshot == one-shot batch compaction of the same change set
    all_changes = spark.createDataFrame(
        [r for rows in batches for r in rows], schema
    )
    expect = {
        r["k"]: r
        for r in latest_by_key(all_changes, ["k"], ["v"]).collect()
        if not r["deleted"]
    }
    assert set(live) == set(expect)
    for k in expect:
        assert live[k]["payload"] == expect[k]["payload"]
        assert live[k]["v"] == expect[k]["v"]

    # stored snapshot retains the tombstone; manifest points at it and
    # records the last committed batch id (replay-idempotence contract)
    from slow_tortoise_spark.streaming.pipeline import _load_latest

    full = read_snapshot(spark, root, live_only=False)
    assert full.filter("k = 3").first()["deleted"] is True
    version, committed = _load_latest(root)
    assert os.path.isdir(os.path.join(root, version))
    assert committed == 2  # three batches → last committed id is 2


def test_upsert_and_agg_merge_replay_is_noop(spark, tmp_path):
    """Round-5 ADVICE (medium): a crash between the manifest flip and
    the streaming checkpoint commit replays the SAME batch id.  The old
    code resolved ``prev`` via the manifest to ``v{batch_id}`` itself
    and overwrote a directory it was reading from (wedging the stream);
    the agg snapshot would instead double-count.  The merge must detect
    ``batch_id <= committed`` and no-op."""
    import os

    from slow_tortoise_spark.streaming.pipeline import (
        _agg_merge_fn,
        _bucketed_merge_fn,
        _load_latest,
        _upsert_merge_fn,
        read_bucketed_snapshot,
        read_snapshot,
    )

    schema = "k long, v long, payload string, deleted boolean"
    b0 = spark.createDataFrame(
        [(1, 1, "a1", False), (2, 1, "b1", False)], schema
    )
    b1 = spark.createDataFrame([(1, 2, "a2", False)], schema)

    # --- unbucketed upsert ---
    root = str(tmp_path / "up")
    os.makedirs(root)
    merge = _upsert_merge_fn(spark, root, ["k"], ["v"], "deleted")
    merge(b0, 0)
    merge(b1, 1)
    snap = sorted(tuple(r) for r in read_snapshot(spark, root).collect())
    # replay batch 1 (manifest already flipped to v1): must no-op, not
    # raise "Cannot overwrite a path that is also being read from"
    merge(b1, 1)
    assert sorted(
        tuple(r) for r in read_snapshot(spark, root).collect()
    ) == snap
    assert _load_latest(root)[1] == 1

    # --- bucketed upsert ---
    broot = str(tmp_path / "upb")
    os.makedirs(broot)
    bmerge = _bucketed_merge_fn(spark, broot, ["k"], ["v"], 4, "deleted")
    bmerge(b0, 0)
    bmerge(b1, 1)
    bsnap = sorted(
        tuple(r) for r in
        read_bucketed_snapshot(spark, broot).drop("_bucket").collect()
    )
    bmerge(b1, 1)  # replay → no-op
    assert sorted(
        tuple(r) for r in
        read_bucketed_snapshot(spark, broot).drop("_bucket").collect()
    ) == bsnap

    # --- agg snapshot: replay must NOT double-count ---
    aroot = str(tmp_path / "agg")
    os.makedirs(aroot)
    amerge = _agg_merge_fn(spark, aroot, ["k"], ["v"])
    amerge(b0, 0)
    amerge(b1, 1)
    totals = {
        r["k"]: (r["v"], r["_n"])
        for r in read_snapshot(spark, aroot, live_only=False).collect()
    }
    assert totals == {1: (3, 2), 2: (1, 1)}
    amerge(b1, 1)  # replay
    after = {
        r["k"]: (r["v"], r["_n"])
        for r in read_snapshot(spark, aroot, live_only=False).collect()
    }
    assert after == totals  # no double-count


def test_streaming_upsert_bucketed_rewrites_only_touched_buckets(
    spark, tmp_path
):
    """Bucket-level merge-on-write: converges to the batch compaction
    like the unbucketed writer, AND a batch whose keys miss a bucket
    leaves that bucket's files untouched (its manifest entry still
    points at the old version directory)."""
    import json
    import os

    from slow_tortoise_spark.operators.cdc import latest_by_key
    from slow_tortoise_spark.streaming.pipeline import (
        read_bucketed_snapshot,
        streaming_upsert_bucketed,
    )

    src = tmp_path / "changes"
    src.mkdir()
    schema = "k long, v long, payload string, deleted boolean"
    batches = [
        [(i, 1, f"p{i}.1", False) for i in range(40)],   # seed all buckets
        [(3, 2, "p3.2", False), (3 + 16, 1, None, True)],  # touch few keys
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).json(str(src / f"b{i}.json"))

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "*"))
    )
    root = str(tmp_path / "snap")
    os.makedirs(root, exist_ok=True)
    q = streaming_upsert_bucketed(
        sdf, root, key_cols=["k"], order_cols=["v"],
        checkpoint=str(tmp_path / "ckpt"), n_buckets=8,
    )
    q.awaitTermination()

    live = {r["k"]: r for r in read_bucketed_snapshot(spark, root).collect()}
    all_rows = [r for rows in batches for r in rows]
    expect = {
        r["k"]: r
        for r in latest_by_key(
            spark.createDataFrame(all_rows, schema), ["k"], ["v"]
        ).collect()
        if not r["deleted"]
    }
    assert set(live) == set(expect)
    assert live[3]["payload"] == "p3.2"
    assert 19 not in live  # tombstoned in batch 1
    for k in expect:
        assert live[k]["v"] == expect[k]["v"]

    # manifest: batch 1's untouched buckets still point at version 0
    with open(os.path.join(root, "_BUCKETS")) as fh:
        manifest = {b: v for b, v in json.load(fh).items()
                    if not b.startswith("_")}
    versions = set(manifest.values())
    assert len(versions) == 2  # v0 for untouched buckets, v1 for touched
    v0 = min(versions)
    untouched = [b for b, v in manifest.items() if v == v0]
    assert untouched  # most buckets were not rewritten by batch 1
    # and version 0's directory was not modified by the second commit:
    # batch 1's touched buckets exist under v1 only
    v1 = max(versions)
    v1_buckets = {d for d in os.listdir(os.path.join(root, v1))
                  if d.startswith("_bucket=")}
    assert len(v1_buckets) <= 2  # only the buckets of keys 3 and 19


def test_snapshot_time_travel_and_vacuum(spark, tmp_path):
    import os

    from slow_tortoise_spark.streaming.pipeline import (
        read_snapshot,
        read_snapshot_at,
        snapshot_versions,
        streaming_upsert,
        vacuum_snapshot,
    )

    src = tmp_path / "changes"
    src.mkdir()
    schema = "k long, v long, payload string, deleted boolean"
    batches = [
        [(1, 1, "a1", False), (2, 1, "b1", False)],
        [(1, 2, "a2", False)],
        [(2, 2, None, True)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).json(str(src / f"b{i}.json"))
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "*"))
    )
    root = str(tmp_path / "snap")
    os.makedirs(root, exist_ok=True)
    streaming_upsert(
        sdf, root, key_cols=["k"], order_cols=["v"],
        checkpoint=str(tmp_path / "ckpt"),
    ).awaitTermination()

    versions = snapshot_versions(root)
    assert len(versions) == 3
    # time travel: version 0 predates the update and the delete
    v0 = {r["k"]: r["payload"]
          for r in read_snapshot_at(spark, root, versions[0]).collect()}
    assert v0 == {1: "a1", 2: "b1"}
    v1 = {r["k"]: r["payload"]
          for r in read_snapshot_at(spark, root, versions[1]).collect()}
    assert v1 == {1: "a2", 2: "b1"}
    now = {r["k"]: r["payload"]
           for r in read_snapshot(spark, root).collect()}
    assert now == {1: "a2"}

    # vacuum: keep current + 1 of history; the oldest goes
    removed = vacuum_snapshot(root, keep=2)
    assert removed == [versions[0]]
    assert snapshot_versions(root) == versions[1:]
    # current read unaffected; vacuum is idempotent
    assert {r["k"] for r in read_snapshot(spark, root).collect()} == {1}
    assert vacuum_snapshot(root, keep=2) == []

    import pytest

    with pytest.raises(ValueError):
        read_snapshot_at(spark, root, versions[0])  # vacuumed away


def test_streaming_agg_snapshot_converges_to_batch_aggregate(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from slow_tortoise_spark.streaming.pipeline import (
        read_snapshot,
        streaming_agg_snapshot,
    )

    src = tmp_path / "events"
    src.mkdir()
    schema = "k string, x double"
    batches = [
        [("a", 1.0), ("a", 2.0), ("b", 10.0)],
        [("a", 4.0), ("c", 7.0)],
        [("b", -10.0)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).json(str(src / f"b{i}.json"))
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "*"))
    )
    root = str(tmp_path / "aggsnap")
    os.makedirs(root, exist_ok=True)
    streaming_agg_snapshot(
        sdf, root, key_cols=["k"], sum_cols=["x"],
        checkpoint=str(tmp_path / "ckpt"),
    ).awaitTermination()

    got = {r["k"]: (r["x"], r["_n"])
           for r in read_snapshot(spark, root, live_only=False).collect()}
    all_rows = [r for rows in batches for r in rows]
    expect = {
        r["k"]: (r["x"], r["n"])
        for r in spark.createDataFrame(all_rows, schema)
        .groupBy("k").agg(F.sum("x").alias("x"), F.count("*").alias("n"))
        .collect()
    }
    assert got == expect
    assert got["a"] == (7.0, 3) and got["b"] == (0.0, 2) and got["c"] == (7.0, 1)


def test_streaming_ivf_append_is_replay_safe(spark, tmp_path):
    """Streamed vectors land in the persisted IVF index exactly once:
    a replayed batch id (post-append crash simulation) must not
    double-insert, and the appended vectors are findable via the
    partition-pruned probe path."""
    import numpy as np

    from slow_tortoise_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_from_path,
        read_ivf_index,
        write_ivf_index,
    )
    from slow_tortoise_spark.streaming.pipeline import _ivf_append_merge_fn

    rng = np.random.default_rng(11)
    base = [(i, [float(x) for x in rng.normal(size=6)]) for i in range(32)]
    df = spark.createDataFrame(base, "vec_id long, embedding array<double>")
    indexed, centroids = build_ivf_index(df, n_cells=4)
    path = str(tmp_path / "ivf")
    write_ivf_index(indexed, centroids, path)

    q = [float(x) for x in rng.normal(size=6)]
    b0 = spark.createDataFrame(
        [(100, q)], "vec_id long, embedding array<double>"
    )
    b1 = spark.createDataFrame(
        [(101, [float(x) for x in rng.normal(size=6)])],
        "vec_id long, embedding array<double>",
    )
    merge = _ivf_append_merge_fn(spark, path)
    merge(b0, 0)
    merge(b1, 1)
    assert read_ivf_index(spark, path)[0].count() == 34
    merge(b1, 1)  # committed replay → manifest fast-path no-op
    assert read_ivf_index(spark, path)[0].count() == 34
    hits = ivf_topk_from_path(spark, path, q, k=1, nprobe=4).collect()
    assert hits[0]["vec_id"] == 100


def test_streaming_ivf_append_replay_inside_crash_window(spark, tmp_path):
    """Regression (round-7 verdict): a crash BETWEEN the parquet write
    and the ``_IVF_COMMITTED`` manifest flip used to double-insert the
    batch's vectors on replay (the manifest still named the previous
    batch, so the replay re-appended).  With the deterministic
    ``batch={id}`` overwrite layout the replay must REPLACE the
    uncommitted batch directory — same final count, no duplicates."""
    import numpy as np

    from slow_tortoise_spark.operators.similarity import (
        build_ivf_index,
        ivf_append,
        read_ivf_index,
        write_ivf_index,
    )
    from slow_tortoise_spark.streaming.pipeline import _ivf_append_merge_fn

    rng = np.random.default_rng(23)
    base = [(i, [float(x) for x in rng.normal(size=6)]) for i in range(32)]
    df = spark.createDataFrame(base, "vec_id long, embedding array<double>")
    indexed, centroids = build_ivf_index(df, n_cells=4)
    path = str(tmp_path / "ivf")
    write_ivf_index(indexed, centroids, path)

    b0 = spark.createDataFrame(
        [(200, [float(x) for x in rng.normal(size=6)]),
         (201, [float(x) for x in rng.normal(size=6)])],
        "vec_id long, embedding array<double>",
    )
    # simulate the crash window: the batch-0 data is fully written but
    # the process dies before the manifest flip records batch 0
    ivf_append(spark, path, b0, batch_id=0)
    assert read_ivf_index(spark, path)[0].count() == 34

    # restart replays batch 0 through the merge fn (manifest says -1,
    # so it does NOT take the committed fast path) — the overwrite must
    # leave exactly one copy of each vector
    merge = _ivf_append_merge_fn(spark, path)
    merge(b0, 0)
    idx = read_ivf_index(spark, path)[0]
    assert idx.count() == 34
    assert idx.filter("vec_id >= 200").count() == 2
    # and the manifest now records the commit, so a second replay no-ops
    merge(b0, 0)
    assert read_ivf_index(spark, path)[0].count() == 34


def test_streaming_sources_read_directory_layout(spark, sf_dir, tmp_path):
    """Layout invariance for the streaming sources (the layout-sweep
    find): a table re-staged as a multi-file parquet DIRECTORY — the
    layout every cluster writer produces — must stream the same rows
    as the single-file testdata layout.  The original pathGlobFilter
    scoping matched FILENAMES only, so a directory-layout table
    streamed EMPTY (zero part files matched) while staying green on
    testdata.  Also pins the footer-probe branches: the re-staged
    copy is legacy INT96 (arrow reports timestamp[ns]), which must
    NOT be classified as int64-nanos."""
    from slow_tortoise_spark.queries.extended import _events_ts_encoding
    from slow_tortoise_spark.queries.verifier_base import (
        q_stream_stream_join,
    )
    from slow_tortoise_spark.queries.verifier_core import (
        q_streaming_index_dedup,
    )
    from slow_tortoise_spark.sources.reader import (
        _nanos_timestamp_columns,
        read_table,
    )

    staged = str(tmp_path / "staged")
    for t in ("events", "documents"):
        (
            read_table(spark, f"{sf_dir}/{t}.parquet")
            .repartition(3)
            .write.mode("overwrite")
            .parquet(f"{staged}/{t}.parquet")
        )

    # INT96 probe: re-staged ts is INT96 (timestamp[ns] to arrow) and
    # must be detected as such, not as the nanosAsLong int64 encoding
    assert _events_ts_encoding(f"{staged}/events.parquet") == "int96"
    assert _nanos_timestamp_columns(f"{staged}/events.parquet") == []

    def rows(fn, d):
        return sorted(tuple(r) for r in fn(spark, d).collect())

    base = rows(q_stream_stream_join, sf_dir)
    assert rows(q_stream_stream_join, staged) == base
    assert len(base) > 0  # the guard that makes the equality meaningful

    base = rows(q_streaming_index_dedup, sf_dir)
    assert rows(q_streaming_index_dedup, staged) == base
    assert len(base) > 0


def test_compact_snapshot_layout_only(spark, tmp_path):
    """Compaction shrinks the file count, changes NO row (tombstones
    included), keeps time travel to the pre-compaction version, keeps
    replayed batches no-ops, lets the next live batch commit on top,
    and vacuums the fat version once unreferenced."""
    import glob
    import os

    from slow_tortoise_spark.streaming.pipeline import (
        _load_latest,
        _upsert_merge_fn,
        compact_snapshot,
        read_snapshot,
        read_snapshot_at,
        snapshot_versions,
        vacuum_snapshot,
    )

    schema = "k long, v long, payload string, deleted boolean"
    b0 = spark.createDataFrame(
        [(i, 1, f"p{i}", False) for i in range(40)] + [(99, 1, "x", True)],
        schema,
    )
    b1 = spark.createDataFrame([(1, 2, "p1b", False)], schema)
    root = str(tmp_path / "snap")
    os.makedirs(root)
    merge = _upsert_merge_fn(spark, root, ["k"], ["v"], "deleted")
    merge(b0, 0)
    merge(b1, 1)
    before_version, committed = _load_latest(root)
    live_before = sorted(
        tuple(r) for r in read_snapshot(spark, root).collect())
    all_before = sorted(tuple(r) for r in read_snapshot(
        spark, root, live_only=False).collect())
    # widen to 5 files first (AQE coalesces this tiny corpus to one
    # file on its own), then compact to 1 — both directions are layout
    # control through the same code path
    wide = compact_snapshot(spark, root, target_files=5)
    assert wide == f"{before_version}c0001"
    assert len(glob.glob(os.path.join(root, wide, "*.parquet"))) == 5
    new_version = compact_snapshot(spark, root, target_files=1)
    assert new_version == f"{before_version}c0002"
    assert _load_latest(root) == (new_version, committed)
    assert len(
        glob.glob(os.path.join(root, new_version, "*.parquet"))) == 1
    # rows identical, tombstone retained
    assert sorted(
        tuple(r) for r in read_snapshot(spark, root).collect()
    ) == live_before
    assert sorted(tuple(r) for r in read_snapshot(
        spark, root, live_only=False).collect()) == all_before
    assert any(r[0] == 99 for r in all_before)
    # version order: base version still time-travels; order is commit order
    assert snapshot_versions(root)[-1] == new_version
    assert sorted(tuple(r) for r in read_snapshot_at(
        spark, root, before_version, live_only=False).collect()
    ) == all_before
    # replayed batch still no-ops against the compacted manifest
    merge(b1, 1)
    assert _load_latest(root) == (new_version, committed)
    # next live batch commits on top
    b2 = spark.createDataFrame([(2, 3, "p2c", False)], schema)
    merge(b2, 2)
    v2, c2 = _load_latest(root)
    assert c2 == 2 and v2 > new_version
    live = {r["k"]: r["payload"] for r in read_snapshot(spark, root).collect()}
    assert live[2] == "p2c" and live[1] == "p1b"
    # vacuum drops the fat pre-compaction version once out of keep range
    removed = vacuum_snapshot(root, keep=1)
    assert before_version in removed
    assert not os.path.exists(os.path.join(root, before_version))


def test_compact_snapshot_crash_retry_reuses_name(spark, tmp_path):
    """A crash between the compaction write and the manifest flip must
    not poison the table: the dangling directory never shows up in
    snapshot_versions (staged under a hidden tmp name or fully written
    but pre-flip), and the retry recomputes the SAME deterministic
    c-suffix from the MANIFEST — overwriting the dangling attempt
    instead of committing a possibly-partial sibling.  Suffixes are
    zero-padded so the 10th compaction still sorts after the 2nd."""
    import os
    import shutil

    from slow_tortoise_spark.streaming.pipeline import (
        _load_latest,
        _upsert_merge_fn,
        compact_snapshot,
        read_snapshot,
        snapshot_versions,
    )

    schema = "k long, v long, deleted boolean"
    root = str(tmp_path / "snap")
    os.makedirs(root)
    merge = _upsert_merge_fn(spark, root, ["k"], ["v"], "deleted")
    merge(spark.createDataFrame(
        [(i, 1, False) for i in range(20)], schema), 0)
    base_version, committed = _load_latest(root)
    live = sorted(tuple(r) for r in read_snapshot(spark, root).collect())

    # Simulate crash AFTER the rename but BEFORE the flip: write a
    # dangling (empty ⇒ corrupt-to-read) dir under the name the next
    # compaction will pick.  The old counting logic would have skipped
    # to c0002 and left this garbage as a "committed" version.
    dangling = os.path.join(root, f"{base_version}c0001")
    os.makedirs(dangling)
    v1 = compact_snapshot(spark, root, target_files=1)
    assert v1 == f"{base_version}c0001"  # same name, overwritten
    assert _load_latest(root) == (v1, committed)
    assert sorted(
        tuple(r) for r in read_snapshot(spark, root).collect()) == live

    # Simulate crash DURING the staged write: a leftover _compact.tmp
    # is invisible to snapshot_versions and silently replaced.
    tmp = os.path.join(root, "_compact.tmp")
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "part-junk.parquet"), "wb") as fh:
        fh.write(b"\x00garbage")
    assert not any("_compact" in v for v in snapshot_versions(root))
    v2 = compact_snapshot(spark, root, target_files=1)
    assert v2 == f"{base_version}c0002"
    assert not os.path.exists(tmp)
    # zero-padding: drive to c0010 and check order stays commit order
    for _ in range(8):
        last = compact_snapshot(spark, root, target_files=1)
    assert last == f"{base_version}c0010"
    vs = snapshot_versions(root)
    assert vs[-1] == last and vs.index(f"{base_version}c0002") < vs.index(
        f"{base_version}c0009")
    assert sorted(
        tuple(r) for r in read_snapshot(spark, root).collect()) == live
    shutil.rmtree(root)


def test_snapshot_versions_orders_legacy_and_deep_suffixes(spark, tmp_path):
    """Commit order must survive BOTH suffix generations in one root
    (legacy unpadded c1/c2 from pre-zero-padding builds, then padded
    c0003+) and compaction counts past the padding width — the sort is
    (base, NUMERIC suffix), never raw lexicographic ('c0002' < 'c1'
    and 'c10000' < 'c9999' as strings)."""
    import os

    from slow_tortoise_spark.streaming.pipeline import (
        _flip_latest,
        compact_snapshot,
        snapshot_versions,
    )

    root = str(tmp_path / "snap")
    os.makedirs(root)
    names = ["v0000000000", "v0000000000c1", "v0000000000c2",
             "v0000000000c9999", "v0000000000c10000", "v0000000001"]
    for d in names:
        os.makedirs(os.path.join(root, d))
    assert snapshot_versions(root) == names  # numeric-suffix order
    # a legacy-suffix manifest still compacts to the right next name
    spark.range(3).write.mode("overwrite").parquet(
        os.path.join(root, "v0000000002"))
    _flip_latest(root, "v0000000002c7", -1)
    os.rename(os.path.join(root, "v0000000002"),
              os.path.join(root, "v0000000002c7"))
    nxt = compact_snapshot(spark, root, target_files=1)
    assert nxt == "v0000000002c0008"
    vs = snapshot_versions(root)
    assert vs.index("v0000000002c7") < vs.index("v0000000002c0008")


def test_ivfpq_append_grows_index_idempotently(spark, sf_dir, tmp_path):
    """IVFADC incremental growth mirrors ivf_append's contract: appended
    vectors are queryable from the path with cell pruning intact, codes
    match a batch encode under the frozen codebooks, a replayed batch id
    REPLACES its directory (row count unchanged), and the committed
    manifest fast-path no-ops."""
    import os

    from pyspark.sql import functions as F

    from slow_tortoise_spark.operators.similarity import (
        ivfpq_append,
        ivfpq_build,
        pq_encode,
        read_ivfpq_index,
        write_ivfpq_index,
        _assign_cells_join,
        _residual_expr,
    )
    from slow_tortoise_spark.sources.reader import read_table
    from slow_tortoise_spark.streaming.pipeline import _ivfpq_append_merge_fn

    emb = read_table(spark, f"{sf_dir}/embeddings.parquet")
    base = emb.filter("vec_id < 400")
    extra = emb.filter("vec_id >= 400").withColumn(
        "vec_id", F.col("vec_id") + 10_000
    )
    enc, cents, books = ivfpq_build(
        base, n_cells=4, kmeans_iters=1, m=4, ksub=4, pq_iters=1
    )
    path = str(tmp_path / "idx")
    write_ivfpq_index(enc, cents, books, path)

    n = ivfpq_append(spark, path, extra)
    assert n == extra.count()
    idx, icents, ibooks = read_ivfpq_index(spark, path)
    assert icents == cents and ibooks == books  # frozen under append
    assert idx.count() == base.count() + extra.count()
    # appended codes == batch encode of residuals under the same books
    want_enc = pq_encode(
        _assign_cells_join(extra, cents, "embedding").withColumn(
            "_res", _residual_expr("embedding", cents)),
        books, vec_col="_res").drop("_res")
    want = {r["vec_id"]: (r["cell"], list(r["pq_codes"]))
            for r in want_enc.select("vec_id", "cell", "pq_codes").collect()}
    got = {r["vec_id"]: (r["cell"], list(r["pq_codes"]))
           for r in idx.filter("vec_id >= 10000")
           .select("vec_id", "cell", "pq_codes").collect()}
    assert got == want
    # manual auto-id descends below the base build (-2): disjoint from
    # streaming foreachBatch ids, so a later stream's batch 0 can never
    # silently overwrite this manual append
    existing = [int(d.split("=")[1])
                for d in os.listdir(path) if d.startswith("batch=")]
    assert sorted(existing) == [-2, -1]
    # replay of the SAME batch id replaces, never duplicates
    ivfpq_append(spark, path, extra, batch_id=-2)
    idx2, _, _ = read_ivfpq_index(spark, path)
    assert idx2.count() == base.count() + extra.count()
    # streaming merge: batch 0 lands in its own directory (no clash
    # with the manual append) and the committed manifest no-ops replays
    merge = _ivfpq_append_merge_fn(spark, path)
    merge(extra, 0)
    n_after = read_ivfpq_index(spark, path)[0].count()
    assert n_after == base.count() + 2 * extra.count()
    merge(extra, 0)  # replay — fast-path no-op
    assert read_ivfpq_index(spark, path)[0].count() == n_after


def test_streaming_pack_manifest_converges_to_batch_append(spark, tmp_path):
    """availableNow over 3 files (maxFilesPerTrigger=1 → one
    micro-batch each) must produce EXACTLY the manifest three
    batch-mode pack_sequences_append calls produce (batch ids 0,1,2),
    and committed batch directories must be bit-immutable — batch 0's
    rows re-read after batch 2 committed are unchanged."""
    from slow_tortoise_spark.operators.packing import (
        pack_sequences_append,
    )
    from slow_tortoise_spark.streaming.pipeline import (
        read_pack_manifest,
        streaming_pack_manifest,
    )

    src = tmp_path / "docs"
    src.mkdir()
    schema = "doc_id long, text string"
    batches = [
        [(i, " ".join(["tok"] * ((i * 7) % 23))) for i in range(15)],
        [(i, " ".join(["tok"] * ((i * 7) % 23))) for i in range(40, 70)],
        [(i, " ".join(["tok"] * ((i * 7) % 23))) for i in range(90, 100)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).json(str(src / f"b{i}.json"))

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "*"))
    )
    root = str(tmp_path / "pack")
    q = streaming_pack_manifest(
        sdf, root, checkpoint=str(tmp_path / "ckpt"),
        max_tokens=16, n_buckets=4,
    )
    q.awaitTermination()

    got = {tuple(r) for r in read_pack_manifest(spark, root).collect()}

    # batch-mode comparator: the oracle-verified append, three times
    man = spark.createDataFrame(
        [], schema=("doc_id long, bucket int, tokens bigint, "
                    "seq_first bigint, seq_last bigint, "
                    "offset_in_first bigint, batch bigint"))
    for bno, rows in enumerate(batches):
        man = pack_sequences_append(
            man, spark.createDataFrame(rows, schema),
            max_tokens=16, n_buckets=4, batch_no=bno)
    want = {tuple(r) for r in man.collect()}
    assert got == want
    assert {r[-1] for r in got} == {0, 1, 2}

    # committed dirs are immutable: batch 0 re-read == its slice
    import os

    b0 = {tuple(r) for r in spark.read.parquet(
        os.path.join(root, "batch=0")).collect()}
    assert b0 == {r for r in want if r[-1] == 0}


def test_streaming_pack_manifest_replay_inside_crash_window(
        spark, tmp_path):
    """A replay in the crash window (batch written, marker not yet
    flipped) must recompute the SAME rows and overwrite — never
    double-append: high-water marks come from committed directories
    only, so the replayed batch sees the identical placement input."""
    import json
    import os

    from slow_tortoise_spark.streaming.pipeline import (
        _pack_manifest_merge_fn,
        read_pack_manifest,
        streaming_pack_manifest,
    )

    src = tmp_path / "docs"
    src.mkdir()
    schema = "doc_id long, text string"
    batches = [
        [(i, " ".join(["tok"] * ((i * 5) % 13))) for i in range(10)],
        [(i, " ".join(["tok"] * ((i * 5) % 13))) for i in range(30, 50)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).json(str(src / f"b{i}.json"))
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "*"))
    )
    root = str(tmp_path / "pack")
    q = streaming_pack_manifest(
        sdf, root, checkpoint=str(tmp_path / "ckpt"),
        max_tokens=16, n_buckets=4,
    )
    q.awaitTermination()
    before = {tuple(r) for r in read_pack_manifest(spark, root).collect()}

    # crash window: batch 1's dir exists but the marker says batch 0
    marker = os.path.join(root, "_PACK_COMMITTED")
    with open(marker, "w") as fh:
        json.dump({"batch_id": 0}, fh)
    merge = _pack_manifest_merge_fn(
        spark, root, 16, 4, "doc_id", None, "text", False, "packshuf")
    merge(spark.createDataFrame(batches[1], schema), 1)
    after = {tuple(r) for r in read_pack_manifest(spark, root).collect()}
    assert after == before  # replay replaced, never double-appended
    with open(marker) as fh:
        assert json.load(fh)["batch_id"] == 1

    # committed replay is a no-op fast path (marker already at 1)
    merge(spark.createDataFrame(batches[1], schema), 1)
    assert {tuple(r)
            for r in read_pack_manifest(spark, root).collect()} == before


def test_compact_pack_manifest_layout_only_and_append_continues(
        spark, tmp_path):
    """Compaction is a LAYOUT change: rows identical (batch column
    included), singleton dirs replaced by one range dir — and a batch
    committing AFTER the compaction appends off the range dir's
    high-water marks exactly as it would have off the singletons."""
    import os

    from slow_tortoise_spark.operators.packing import (
        pack_sequences_append,
    )
    from slow_tortoise_spark.streaming.pipeline import (
        compact_pack_manifest,
        read_pack_manifest,
        streaming_pack_manifest,
    )

    src = tmp_path / "docs"
    src.mkdir()
    schema = "doc_id long, text string"
    batches = [
        [(i, " ".join(["tok"] * ((i * 7) % 23))) for i in range(15)],
        [(i, " ".join(["tok"] * ((i * 7) % 23))) for i in range(40, 70)],
        [(i, " ".join(["tok"] * ((i * 7) % 23))) for i in range(90, 100)],
    ]
    for i, rows in enumerate(batches[:2]):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).json(str(src / f"b{i}.json"))
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "*"))
    )
    root = str(tmp_path / "pack")
    ckpt = str(tmp_path / "ckpt")
    streaming_pack_manifest(
        sdf, root, checkpoint=ckpt, max_tokens=16, n_buckets=4,
    ).awaitTermination()
    before = {tuple(r) for r in read_pack_manifest(spark, root).collect()}

    final = compact_pack_manifest(spark, root)
    assert os.path.basename(final) == "batch=0-1"
    dirs = [d for d in os.listdir(root) if d.startswith("batch=")]
    assert dirs == ["batch=0-1"]  # singletons collected
    after = {tuple(r) for r in read_pack_manifest(spark, root).collect()}
    assert after == before
    # idempotent re-run
    assert compact_pack_manifest(spark, root) == final
    assert {tuple(r)
            for r in read_pack_manifest(spark, root).collect()} == before

    # a third batch arrives AFTER compaction: appends as batch=2 next
    # to the range dir, placed off the range dir's high-water marks
    spark.createDataFrame(batches[2], schema).coalesce(1).write.mode(
        "overwrite"
    ).json(str(src / "b2.json"))
    sdf2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "*"))
    )
    streaming_pack_manifest(
        sdf2, root, checkpoint=ckpt, max_tokens=16, n_buckets=4,
    ).awaitTermination()
    got = {tuple(r) for r in read_pack_manifest(spark, root).collect()}
    man = spark.createDataFrame(
        [], schema=("doc_id long, bucket int, tokens bigint, "
                    "seq_first bigint, seq_last bigint, "
                    "offset_in_first bigint, batch bigint"))
    for bno, rows in enumerate(batches):
        man = pack_sequences_append(
            man, spark.createDataFrame(rows, schema),
            max_tokens=16, n_buckets=4, batch_no=bno)
    assert got == {tuple(r) for r in man.collect()}
    assert sorted(d for d in os.listdir(root)
                  if d.startswith("batch=")) == ["batch=0-1", "batch=2"]


def test_compact_pack_manifest_crash_windows(spark, tmp_path):
    """Both compaction crash windows recover: a dangling partial range
    dir (no _SUCCESS) is cleared and redone; a stale singleton left by
    a crash between rename and cleanup is invisible to readers (the
    range subsumes it) and collected by the next compaction."""
    import os
    import shutil

    from slow_tortoise_spark.streaming.pipeline import (
        compact_pack_manifest,
        read_pack_manifest,
        streaming_pack_manifest,
    )

    src = tmp_path / "docs"
    src.mkdir()
    schema = "doc_id long, text string"
    batches = [
        [(i, " ".join(["tok"] * ((i * 5) % 13))) for i in range(10)],
        [(i, " ".join(["tok"] * ((i * 5) % 13))) for i in range(30, 50)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).json(str(src / f"b{i}.json"))
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "*"))
    )
    root = str(tmp_path / "pack")
    streaming_pack_manifest(
        sdf, root, checkpoint=str(tmp_path / "ckpt"),
        max_tokens=16, n_buckets=4,
    ).awaitTermination()
    before = {tuple(r) for r in read_pack_manifest(spark, root).collect()}
    b1_backup = str(tmp_path / "b1_backup")
    shutil.copytree(os.path.join(root, "batch=1"), b1_backup)

    # window (a): a partial final dir with no _SUCCESS
    partial = os.path.join(root, "batch=0-1")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-junk.parquet"), "w") as fh:
        fh.write("not parquet")
    final = compact_pack_manifest(spark, root)
    assert {tuple(r)
            for r in read_pack_manifest(spark, root).collect()} == before

    # window (b): stale singleton restored next to the range dir —
    # readers must NOT double-count batch 1
    shutil.copytree(b1_backup, os.path.join(root, "batch=1"))
    assert {tuple(r)
            for r in read_pack_manifest(spark, root).collect()} == before
    compact_pack_manifest(spark, root)  # collects the stale dir
    assert sorted(d for d in os.listdir(root)
                  if d.startswith("batch=")) == ["batch=0-1"]
    assert {tuple(r)
            for r in read_pack_manifest(spark, root).collect()} == before


def test_streaming_pack_manifest_marks_are_o1_state(spark, tmp_path):
    """The commit marker CARRIES the per-bucket high-water marks, and
    they are exactly the committed manifest's per-bucket token totals;
    appending the next batch reads NO committed directory (pinned by
    physically moving them away before a manual merge) — the O(batch)
    append contract."""
    import json
    import os
    import shutil

    from slow_tortoise_spark.operators.packing import (
        pack_sequences_append,
    )
    from slow_tortoise_spark.streaming.pipeline import (
        _pack_manifest_merge_fn,
        read_pack_manifest,
        streaming_pack_manifest,
    )

    src = tmp_path / "docs"
    src.mkdir()
    schema = "doc_id long, text string"
    batches = [
        [(i, " ".join(["tok"] * ((i * 7) % 23))) for i in range(15)],
        [(i, " ".join(["tok"] * ((i * 7) % 23))) for i in range(40, 70)],
        [(i, " ".join(["tok"] * ((i * 7) % 23))) for i in range(90, 100)],
    ]
    for i, rows in enumerate(batches[:2]):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).json(str(src / f"b{i}.json"))
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "*"))
    )
    root = str(tmp_path / "pack")
    streaming_pack_manifest(
        sdf, root, checkpoint=str(tmp_path / "ckpt"),
        max_tokens=16, n_buckets=4,
    ).awaitTermination()

    # marker marks == manifest per-bucket totals
    with open(os.path.join(root, "_PACK_COMMITTED")) as fh:
        st = json.load(fh)
    assert st["batch_id"] == 1
    man_totals = {
        int(r["bucket"]): int(r["t"])
        for r in read_pack_manifest(spark, root)
        .groupBy("bucket").sum("tokens")
        .withColumnRenamed("sum(tokens)", "t").collect()
    }
    assert {int(b): t for b, t in st["hw"].items()} == man_totals

    # move the committed dirs AWAY: batch 2 must still append purely
    # off the marker state
    hidden = tmp_path / "hidden"
    hidden.mkdir()
    for d in ("batch=0", "batch=1"):
        shutil.move(os.path.join(root, d), str(hidden / d))
    merge = _pack_manifest_merge_fn(
        spark, root, 16, 4, "doc_id", None, "text", False, "packshuf")
    merge(spark.createDataFrame(batches[2], schema), 2)
    for d in ("batch=0", "batch=1"):
        shutil.move(str(hidden / d), os.path.join(root, d))

    got = {tuple(r) for r in read_pack_manifest(spark, root).collect()}
    man = spark.createDataFrame(
        [], schema=("doc_id long, bucket int, tokens bigint, "
                    "seq_first bigint, seq_last bigint, "
                    "offset_in_first bigint, batch bigint"))
    for bno, rows in enumerate(batches):
        man = pack_sequences_append(
            man, spark.createDataFrame(rows, schema),
            max_tokens=16, n_buckets=4, batch_no=bno)
    assert got == {tuple(r) for r in man.collect()}


def test_streaming_pack_manifest_legacy_marker_migrates(spark, tmp_path):
    """A marker written by the pre-"hw" build (batch id only) is
    migrated on the next merge: marks rebuild once from the committed
    directories, the appended batch places identically, and the new
    marker carries the marks."""
    import json
    import os

    from slow_tortoise_spark.operators.packing import (
        pack_sequences_append,
    )
    from slow_tortoise_spark.streaming.pipeline import (
        _pack_manifest_merge_fn,
        read_pack_manifest,
        streaming_pack_manifest,
    )

    src = tmp_path / "docs"
    src.mkdir()
    schema = "doc_id long, text string"
    batches = [
        [(i, " ".join(["tok"] * ((i * 5) % 13))) for i in range(10)],
        [(i, " ".join(["tok"] * ((i * 5) % 13))) for i in range(30, 50)],
    ]
    spark.createDataFrame(batches[0], schema).coalesce(1).write.mode(
        "overwrite"
    ).json(str(src / "b0.json"))
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src / "*"))
    )
    root = str(tmp_path / "pack")
    streaming_pack_manifest(
        sdf, root, checkpoint=str(tmp_path / "ckpt"),
        max_tokens=16, n_buckets=4,
    ).awaitTermination()

    # rewrite the marker in the legacy shape (no "hw")
    marker = os.path.join(root, "_PACK_COMMITTED")
    with open(marker, "w") as fh:
        json.dump({"batch_id": 0}, fh)
    merge = _pack_manifest_merge_fn(
        spark, root, 16, 4, "doc_id", None, "text", False, "packshuf")
    merge(spark.createDataFrame(batches[1], schema), 1)

    got = {tuple(r) for r in read_pack_manifest(spark, root).collect()}
    man = spark.createDataFrame(
        [], schema=("doc_id long, bucket int, tokens bigint, "
                    "seq_first bigint, seq_last bigint, "
                    "offset_in_first bigint, batch bigint"))
    for bno, rows in enumerate(batches):
        man = pack_sequences_append(
            man, spark.createDataFrame(rows, schema),
            max_tokens=16, n_buckets=4, batch_no=bno)
    assert got == {tuple(r) for r in man.collect()}
    with open(marker) as fh:
        st = json.load(fh)
    assert st["batch_id"] == 1 and "hw" in st
