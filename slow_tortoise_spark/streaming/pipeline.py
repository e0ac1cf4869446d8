"""Structured Streaming surface for the datacube engine.

The reference is batch-only (time is a data column, SURVEY.md §2.8); this
module is the Spark-native extension for continuously-arriving datacube
shards and event streams:

* ``stream_datacube``       — file-source ingest with an explicit schema
* ``windowed_temporal_agg`` — event-time tumbling windows + watermark
                              (the streaming analogue of A1/A2)
* ``sessionize``            — session windows per key (gap-based)
* ``running_user_state``    — custom stateful operator via
                              ``applyInPandasWithState`` (running per-key
                              counters that survive across micro-batches)
* ``write_stream_artifacts``— foreachBatch bridge into the batch sink
                              layer so streaming runs emit the same
                              artifact families as batch runs

Late data: watermarks bound state; with ``availableNow`` triggers over
complete inputs the results converge to the batch equivalents (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from slow_tortoise_spark.schema import DATACUBE_SCHEMA


def stream_datacube(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DATACUBE_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source streaming ingest of datacube parquet shards."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def windowed_temporal_agg(
    sdf: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 day",
    time_col: str = "event_time",
) -> DataFrame:
    """Streaming A1: per (feature, window) sum/mean/count of value.

    ``time_col`` must be a TimestampType column (use
    ``F.timestamp_millis(col('timestamp'))`` for epoch-ms cubes). The
    watermark bounds both late data and state size.
    """
    return (
        sdf.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("w"), "feature")
        .agg(
            F.sum("value").alias("t_sum"),
            F.avg("value").alias("t_mean"),
            F.count("value").alias("t_count"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "feature",
            "t_sum",
            "t_mean",
            "t_count",
        )
    )


def sessionize(
    sdf: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 day",
    key_col: str = "user_id",
    time_col: str = "event_time",
) -> DataFrame:
    """Gap-based session windows per key (native session_window)."""
    return (
        sdf.withWatermark(time_col, watermark)
        .groupBy(F.session_window(F.col(time_col), gap).alias("s"), key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            F.col(key_col),
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)

_RUNNING_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_user_state(sdf: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Custom stateful operator: running per-key count + value total.

    ``applyInPandasWithState`` keeps (n_events, total) per key across
    micro-batches and emits the updated row every time the key appears.
    The pattern to copy for bespoke streaming operators the built-in
    aggregations can't express.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, batches, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total": [total]}
        )

    return sdf.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=_RUNNING_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(
    sdf: DataFrame,
    key_cols: list[str],
    watermark: str = "1 day",
    time_col: str = "event_time",
) -> DataFrame:
    """Streaming exact dedup: first occurrence per key wins; state is
    evicted once the watermark passes a key's event time, so a duplicate
    arriving later than the watermark passes through — the documented
    at-scale trade-off of streaming dedup.

    Uses ``dropDuplicatesWithinWatermark``: plain ``dropDuplicates(keys)``
    only evicts state when the event-time column is *itself* one of the
    dedup keys, so with business keys alone its state grows without bound
    and late duplicates are still suppressed; the WithinWatermark variant
    ties eviction to the watermark for any key set, which is the behavior
    documented here.
    """
    return sdf.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    time_col: str = "event_time",
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream inner join: right-side events within
    ``within`` AFTER the matching left event (the funnel/attribution
    shape — click → purchase).

    Both sides carry watermarks and the join condition bounds the two
    event times relative to each other, which is what lets Spark evict
    buffered state: a left row can be dropped once the right watermark
    passes its time + ``within``.  Without the time bound the state
    grows without limit — Spark would accept the query but never clean
    up.  Output columns are prefixed l_/r_ to stay unambiguous.
    """
    lw = left.withWatermark(time_col, watermark)
    rw = right.withWatermark(time_col, watermark)
    lsel = lw.select([F.col(c).alias(f"l_{c}") for c in lw.columns])
    rsel = rw.select([F.col(c).alias(f"r_{c}") for c in rw.columns])
    cond = (
        (F.col(f"l_{key_col}") == F.col(f"r_{key_col}"))
        & (F.col(f"r_{time_col}") >= F.col(f"l_{time_col}"))
        & (
            F.col(f"r_{time_col}")
            <= F.col(f"l_{time_col}") + F.expr(f"INTERVAL {within}")
        )
    )
    return lsel.join(rsel, cond)


def streaming_index_dedup(
    stream_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Streaming ingest-time EXACT dedup against a static corpus index:
    admit only stream documents whose normalized-text fingerprint is
    absent from the index — a stream-static LEFT ANTI join, the join
    mode Spark allows precisely because the static side needs no
    streaming state (each micro-batch probes the index as a plain batch
    join; the index can be a bucketed table so probes are shuffle-free
    on the static side).

    This is :func:`operators.dedup.incremental_dedup`'s exact tier in
    streaming form.  The NEAR tier (LSH bucket probe + signature
    agreement) is the same stream-static inner-join shape; it is kept
    out of the default path because candidate explosion makes
    per-micro-batch latency data-dependent.  Dedup WITHIN the stream is
    :func:`streaming_dedup`'s job (compose: within-stream first, then
    this probe).

    ``index`` needs only a ``fp`` column (:func:`operators.dedup.
    build_dedup_index` output works as-is).
    """
    from slow_tortoise_spark.operators.text import fingerprint

    fp = fingerprint(stream_docs, text_col, "_fp")
    # No broadcast hint: at corpus scale the index dwarfs a micro-batch
    # (the BATCH side is the small one) — the static plan re-resolves
    # per micro-batch, so cache the index's fp projection for repeated
    # probes and let the optimizer pick the join strategy.
    probe = index.select(F.col("fp").alias("_fp")).distinct()
    return fp.join(probe, "_fp", "left_anti").drop("_fp")


def run_to_memory(sdf: DataFrame, table: str, spark: SparkSession,
                  output_mode: str = "append") -> DataFrame:
    """Drain a (bounded) stream into an in-memory table with availableNow
    and return the materialized result — used by tests and the query
    catalog's rows-only streaming entries."""
    q = (
        sdf.writeStream.format("memory")
        .queryName(table)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)


def write_stream_artifacts(sdf: DataFrame, batch_fn, checkpoint: str):
    """foreachBatch bridge: reuse the batch sink layer per micro-batch.

    ``batch_fn(df, batch_id)`` receives a normal DataFrame — call the
    batch pipeline writers from it.
    """
    return (
        sdf.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Streaming CDC: merge-on-write snapshot maintenance
# ---------------------------------------------------------------------------


def _load_latest(root: str) -> tuple[str | None, int]:
    """Resolve the ``_LATEST`` manifest → (version dir, committed
    batch id).  The manifest is JSON ``{"version": ..., "batch_id": N}``;
    a legacy plain-string manifest (pre-idempotence format) reads as
    (version, -1).  Returns (None, -1) before the first commit."""
    import json
    import os

    manifest = os.path.join(root, "_LATEST")
    if not os.path.exists(manifest):
        return None, -1
    with open(manifest) as fh:
        text = fh.read().strip()
    try:
        doc = json.loads(text)
        if isinstance(doc, dict):
            return doc["version"], int(doc.get("batch_id", -1))
    except ValueError:
        pass
    return text, -1


def _flip_latest(root: str, version: str, batch_id: int) -> None:
    """Atomically commit (version, batch_id) to ``_LATEST``.  Recording
    the batch id in the SAME atomic flip is what makes micro-batch
    replay detectable: a crash between this flip and Spark's streaming
    checkpoint commit replays the batch, and the merge sees
    ``batch_id <= committed`` and no-ops instead of reading its own
    output directory while overwriting it (the foreachBatch
    idempotence pattern)."""
    import json
    import os

    tmp = os.path.join(root, "_LATEST.tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": version, "batch_id": batch_id}, fh)
    os.replace(tmp, os.path.join(root, "_LATEST"))


def read_snapshot(
    spark: SparkSession, root: str, live_only: bool = True,
    delete_col: str = "deleted",
) -> DataFrame | None:
    """Read the current compacted snapshot maintained by
    :func:`streaming_upsert`, or None before the first commit.
    ``live_only`` hides tombstone rows (the read view); the stored
    snapshot RETAINS them so late-arriving stale versions can never
    resurrect a deleted key."""
    import os

    version_dir, _ = _load_latest(root)
    if version_dir is None:
        return None
    df = spark.read.parquet(os.path.join(root, version_dir))
    if live_only and delete_col in df.columns:
        df = df.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
    return df


def _upsert_merge_fn(
    spark: SparkSession,
    root: str,
    key_cols: list[str],
    order_cols: list[str],
    delete_col: str,
):
    """Build the foreachBatch merge for :func:`streaming_upsert`
    (module-level so the replay/no-op contract is directly testable)."""
    import os

    from slow_tortoise_spark.operators.cdc import latest_by_key

    def merge(batch_df: DataFrame, batch_id: int):
        _, committed = _load_latest(root)
        if batch_id <= committed:
            return  # replayed after a post-flip crash — already applied
        prev = read_snapshot(spark, root, live_only=False,
                             delete_col=delete_col)
        both = (
            prev.unionByName(batch_df, allowMissingColumns=True)
            if prev is not None else batch_df
        )
        payload_cols = [
            c for c in both.columns
            if c not in key_cols and c not in order_cols
        ]
        merged = latest_by_key(both, key_cols, order_cols, payload_cols)
        vdir = f"v{batch_id:010d}"
        merged.write.mode("overwrite").parquet(os.path.join(root, vdir))
        _flip_latest(root, vdir, batch_id)

    return merge


def streaming_upsert(
    stream_changes: DataFrame,
    root: str,
    key_cols: list[str],
    order_cols: list[str],
    checkpoint: str,
    delete_col: str = "deleted",
):
    """Maintain a latest-version-per-key snapshot from a stream of
    change rows — a minimal merge-on-write table: each micro-batch
    merges into the previous snapshot with the single-shuffle
    ``max_by`` compaction (operators/cdc.py latest_by_key) and commits
    a NEW versioned directory, then flips a one-line ``_LATEST``
    manifest (write-temp + atomic rename).  Readers never observe a
    partial snapshot: they always resolve the manifest to a fully
    written version — the same commit-protocol shape a transactional
    table format uses, reduced to its essentials.

    Tombstones (``delete_col`` true) are RETAINED in the snapshot and
    win version resolution like any row, so late-arriving older
    versions of a deleted key stay dead; :func:`read_snapshot` hides
    them from the live view.  Retries of a failed micro-batch are
    idempotent at BOTH crash points: a crash mid-write replays into the
    same ``v{batch_id}`` directory (overwrite, manifest still points at
    the previous version); a crash AFTER the manifest flip but before
    the streaming checkpoint commit replays a batch id the manifest
    already records — the merge detects ``batch_id <= committed`` and
    no-ops, instead of resolving ``prev`` to its own output directory
    and overwriting a path it is reading from.

    At scale: each commit is one shuffle over (previous snapshot +
    micro-batch); for a huge snapshot, partition both sides by key
    bucket so only touched buckets rewrite — the natural extension,
    same operator.
    """
    merge = _upsert_merge_fn(
        stream_changes.sparkSession, root, key_cols, order_cols, delete_col
    )
    return (
        stream_changes.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_bucketed_snapshot(
    spark: SparkSession, root: str, live_only: bool = True,
    delete_col: str = "deleted",
) -> DataFrame | None:
    """Read the current state of a bucket-level snapshot maintained by
    :func:`streaming_upsert_bucketed`: the manifest maps each key
    bucket to the version directory that last rewrote it, so the
    snapshot is the union of per-version reads, each pruned to its own
    buckets (partition pruning on ``_bucket``)."""
    import json
    import os

    manifest = os.path.join(root, "_BUCKETS")
    if not os.path.exists(manifest):
        return None
    with open(manifest) as fh:
        bucket_version = {
            int(b): v for b, v in json.load(fh).items()
            if not b.startswith("_")  # "_committed_batch" bookkeeping key
        }
    by_version: dict[str, list[int]] = {}
    for b, v in bucket_version.items():
        by_version.setdefault(v, []).append(b)
    df = None
    for v, bs in sorted(by_version.items()):
        part = spark.read.parquet(os.path.join(root, v)).filter(
            F.col("_bucket").isin(bs)
        )
        df = part if df is None else df.unionByName(part)
    if df is not None and live_only and delete_col in df.columns:
        df = df.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
    return df


def _bucketed_merge_fn(
    spark: SparkSession,
    root: str,
    key_cols: list[str],
    order_cols: list[str],
    n_buckets: int,
    delete_col: str,
):
    """foreachBatch merge for :func:`streaming_upsert_bucketed`
    (module-level so the replay/no-op contract is directly testable)."""
    import json
    import os

    from slow_tortoise_spark.operators.cdc import latest_by_key

    bucket_of = F.pmod(
        F.xxhash64(*[F.col(c).cast("string") for c in key_cols]),
        F.lit(n_buckets),
    ).cast("int")

    def merge(batch_df: DataFrame, batch_id: int):
        manifest_path = os.path.join(root, "_BUCKETS")
        current: dict = {}
        if os.path.exists(manifest_path):
            with open(manifest_path) as fh:
                current = json.load(fh)
        if batch_id <= int(current.get("_committed_batch", -1)):
            return  # replayed after a post-flip crash — already applied
        batch_b = batch_df.withColumn("_bucket", bucket_of)
        touched = sorted(
            r["_bucket"]
            for r in batch_b.select("_bucket").distinct().collect()
        )
        if not touched:
            return
        prev = read_bucketed_snapshot(
            spark, root, live_only=False, delete_col=delete_col
        )
        both = batch_b
        if prev is not None:
            both = prev.filter(F.col("_bucket").isin(touched)).unionByName(
                batch_b, allowMissingColumns=True
            )
        payload_cols = [
            c for c in both.columns
            if c not in key_cols and c not in order_cols and c != "_bucket"
        ]
        merged = latest_by_key(
            both, [*key_cols, "_bucket"], order_cols, payload_cols
        )
        vdir = f"v{batch_id:010d}"
        merged.write.mode("overwrite").partitionBy("_bucket").parquet(
            os.path.join(root, vdir)
        )
        for b in touched:
            current[str(b)] = vdir
        current["_committed_batch"] = batch_id
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(current, fh)
        os.replace(tmp, manifest_path)

    return merge


def streaming_upsert_bucketed(
    stream_changes: DataFrame,
    root: str,
    key_cols: list[str],
    order_cols: list[str],
    checkpoint: str,
    n_buckets: int = 16,
    delete_col: str = "deleted",
):
    """Bucket-level merge-on-write: like :func:`streaming_upsert`, but
    the snapshot is hash-bucketed on the key and each micro-batch
    rewrites ONLY the buckets its changes touch — at a 100 TB snapshot
    with localized change sets, a commit costs O(touched buckets), not
    a full-table rewrite.  The ``_BUCKETS`` manifest maps bucket →
    owning version directory and flips atomically, so readers always
    resolve a consistent bucket set; untouched buckets keep serving
    from their old version directories (verified by test: prior
    version dirs are never modified).

    Each commit: derive the batch's touched buckets (a bounded
    distinct), read ONLY those buckets from the current snapshot
    (partition-pruned), compact with the same single-shuffle ``max_by``,
    write them under ``v{batch}/_bucket=...``, then flip the manifest
    entries for exactly those buckets.  Tombstones are retained, as in
    the unbucketed writer.  The manifest also records the committed
    batch id (reserved ``"_committed_batch"`` key) in the same atomic
    flip, so a batch replayed after a post-flip crash no-ops instead of
    merging its own output again (see :func:`streaming_upsert`).
    """
    merge = _bucketed_merge_fn(
        stream_changes.sparkSession, root, key_cols, order_cols,
        n_buckets, delete_col,
    )
    return (
        stream_changes.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _version_sort_key(name: str) -> tuple[int, int] | None:
    """Commit-order sort key for version dir names: (NUMERIC base batch
    id, NUMERIC compaction suffix), or None for names that are not
    version dirs at all.  Both components sort numerically so commit
    order survives legacy unpadded ``c1``/``c2`` dirs (lexicographically
    ``c0002`` < ``c1``, numerically 2 > 1), counts past the padding
    width (``c10000`` vs ``c9999``), and — the same hazard on the base
    id — batch ids past the manifest's zero-pad width.  Non-matching
    names return None so :func:`snapshot_versions` SKIPS them and
    :func:`compact_snapshot` (which raises on an unparseable MANIFEST
    version) never sees one from a listing — one policy, not two."""
    import re

    m = re.fullmatch(r"v(\d+)(?:c(\d+))?", name)
    if m is None:
        return None
    return (int(m.group(1)), int(m.group(2)) if m.group(2) else 0)


def snapshot_versions(root: str) -> list[str]:
    """All committed version directories under a snapshot root, oldest
    first — base batch ids and compaction suffixes both order
    NUMERICALLY via :func:`_version_sort_key` (robust to legacy
    unpadded suffixes and to counts past any zero-pad width).  Foreign
    directory names that don't parse as ``v{n}[c{m}]`` are skipped —
    they were never committed by this layer (the manifest flip is the
    only committer) and including them under an arbitrary sort would
    hand time travel a dir it can't read."""
    import os

    keyed = []
    for d in os.listdir(root):
        k = _version_sort_key(d)
        if k is not None and os.path.isdir(os.path.join(root, d)):
            keyed.append((k, d))
    return [d for _, d in sorted(keyed)]


def read_snapshot_at(
    spark: SparkSession, root: str, version: str,
    live_only: bool = True, delete_col: str = "deleted",
) -> DataFrame:
    """Time-travel read of an unbucketed snapshot: every committed
    version directory is a COMPLETE compacted state (the merge rewrites
    the whole snapshot), so any historical version reads directly —
    the manifest only marks which one is current.  Audits, diffs
    between ingest points, and reproducing a training run's exact
    input all read an old version with zero extra bookkeeping."""
    import os

    if version not in snapshot_versions(root):
        raise ValueError(
            f"unknown version {version!r}; have {snapshot_versions(root)}"
        )
    df = spark.read.parquet(os.path.join(root, version))
    if live_only and delete_col in df.columns:
        df = df.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
    return df


def vacuum_snapshot(root: str, keep: int = 1) -> list[str]:
    """Delete version directories no longer reachable: everything
    except the manifest's current version(s) and the ``keep`` most
    recent versions (time-travel depth).  Returns the removed names.
    Readers resolving the manifest are never affected — only strictly
    older, unreferenced versions go."""
    import json
    import os
    import shutil

    referenced: set[str] = set()
    latest_version, _ = _load_latest(root)
    if latest_version is not None:
        referenced.add(latest_version)
    m2 = os.path.join(root, "_BUCKETS")
    if os.path.exists(m2):
        with open(m2) as fh:
            referenced.update(
                v for b, v in json.load(fh).items()
                if not b.startswith("_")  # skip bookkeeping keys
            )
    versions = snapshot_versions(root)
    protected = referenced | set(versions[-keep:] if keep > 0 else [])
    removed = []
    for v in versions:
        if v not in protected:
            shutil.rmtree(os.path.join(root, v))
            removed.append(v)
    return removed


def _agg_merge_fn(
    spark: SparkSession, root: str, key_cols: list[str], sum_cols: list[str]
):
    """foreachBatch merge for :func:`streaming_agg_snapshot`
    (module-level so the replay/no-op contract is directly testable —
    a replayed batch must NOT double-count)."""
    import os

    def merge(batch_df: DataFrame, batch_id: int):
        _, committed = _load_latest(root)
        if batch_id <= committed:
            return  # replayed after a post-flip crash — already summed
        partial = batch_df.groupBy(*key_cols).agg(
            *[F.sum(c).alias(c) for c in sum_cols],
            F.count("*").alias("_n"),
        )
        prev = read_snapshot(spark, root, live_only=False)
        merged = partial
        if prev is not None:
            merged = (
                prev.unionByName(partial)
                .groupBy(*key_cols)
                .agg(
                    *[F.sum(c).alias(c) for c in sum_cols],
                    F.sum("_n").alias("_n"),
                )
            )
        vdir = f"v{batch_id:010d}"
        merged.write.mode("overwrite").parquet(os.path.join(root, vdir))
        _flip_latest(root, vdir, batch_id)

    return merge


def streaming_agg_snapshot(
    stream: DataFrame,
    root: str,
    key_cols: list[str],
    sum_cols: list[str],
    checkpoint: str,
):
    """Incrementally maintained aggregate table: each micro-batch
    partial-aggregates its rows and MERGES BY SUMMING with the previous
    snapshot (plus a ``_n`` row count, so averages derive as sum/_n) —
    the other maintenance pattern next to latest-wins upsert: algebraic
    state, where a commit costs one bounded merge over (previous
    aggregate + batch partial) instead of re-scanning history.  This is
    how "lifetime totals per key over years of data" stays O(batch)
    per ingest at 100 TB.  Commit protocol identical to
    :func:`streaming_upsert` (versioned dirs + atomic ``_LATEST``
    flip), so :func:`read_snapshot`, :func:`read_snapshot_at`,
    :func:`snapshot_versions`, and :func:`vacuum_snapshot` all apply
    (pass ``live_only=False`` — aggregate rows carry no tombstones).

    Only algebraically mergeable state belongs here (sums/counts; min/
    max would merge the same way; medians would not) — which also makes
    replay detection load-bearing: re-merging an already-committed
    batch would double-count, so the merge no-ops when the manifest's
    committed batch id already covers this batch (same contract as
    :func:`streaming_upsert`).
    """
    merge = _agg_merge_fn(stream.sparkSession, root, key_cols, sum_cols)
    return (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _ivf_append_merge_fn(spark: SparkSession, path: str):
    """foreachBatch merge for :func:`streaming_ivf_append` (module-level
    so the replay/no-op contract is directly testable).  Idempotency is
    structural: :func:`operators.similarity.ivf_append` writes each
    batch to its own deterministic ``batch={batch_id}`` directory with
    mode=overwrite, so a replay after a crash AT ANY POINT — including
    between the parquet write and the manifest flip, the window the old
    append-mode protocol left open (round-7 verdict) — replaces the
    batch's directory instead of double-inserting its vectors.  The
    ``_IVF_COMMITTED`` manifest is kept as a fast-path no-op for
    already-committed replays (skips the assignment job entirely) and
    as the recorded high-water mark for observability."""
    import json
    import os

    from slow_tortoise_spark.operators.similarity import ivf_append

    manifest = os.path.join(path, "_IVF_COMMITTED")

    def merge(batch_df: DataFrame, batch_id: int):
        committed = -1
        if os.path.exists(manifest):
            with open(manifest) as fh:
                committed = int(json.load(fh)["batch_id"])
        if batch_id <= committed:
            return  # committed replay — nothing to redo
        # uncommitted replay falls through: the deterministic overwrite
        # under batch={batch_id} replaces any partial earlier attempt
        ivf_append(spark, path, batch_df, batch_id=batch_id)
        tmp = manifest + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"batch_id": batch_id}, fh)
        os.replace(tmp, manifest)

    return merge


def streaming_ivf_append(
    stream_vectors: DataFrame,
    path: str,
    checkpoint: str,
):
    """Continuously grow a persisted IVF ANN index from a vector
    stream: each micro-batch runs :func:`operators.similarity.
    ivf_append` (broadcast centroid argmax → deterministic overwrite of
    the batch's own ``batch={id}/cell=…`` directory, so crash replays
    replace rather than re-append; the committed-batch-id manifest is a
    fast-path no-op on top).  The index must already exist (built once via
    ``build_ivf_index`` + ``write_ivf_index``); queries through
    ``ivf_topk_from_path`` see new vectors after each commit and keep
    partition-pruned scans.  This is the ingest half of a streaming
    ANN service — centroid re-clustering stays an offline rebuild
    (see ivf_append's docstring).
    """
    merge = _ivf_append_merge_fn(stream_vectors.sparkSession, path)
    return (
        stream_vectors.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _ivfpq_append_merge_fn(spark: SparkSession, path: str):
    """foreachBatch merge for :func:`streaming_ivfpq_append` — the
    compressed-index mirror of :func:`_ivf_append_merge_fn`, with the
    identical idempotence structure (deterministic ``batch={id}``
    overwrite; ``_IVFPQ_COMMITTED`` manifest as the fast-path no-op and
    observability high-water mark)."""
    import json
    import os

    from slow_tortoise_spark.operators.similarity import ivfpq_append

    manifest = os.path.join(path, "_IVFPQ_COMMITTED")

    def merge(batch_df: DataFrame, batch_id: int):
        committed = -1
        if os.path.exists(manifest):
            with open(manifest) as fh:
                committed = int(json.load(fh)["batch_id"])
        if batch_id <= committed:
            return  # committed replay — nothing to redo
        ivfpq_append(spark, path, batch_df, batch_id=batch_id)
        tmp = manifest + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"batch_id": batch_id}, fh)
        os.replace(tmp, manifest)

    return merge


def streaming_ivfpq_append(
    stream_vectors: DataFrame,
    path: str,
    checkpoint: str,
):
    """Continuously grow a persisted IVFADC index from a vector stream:
    per micro-batch, assignment to the frozen centroids + residual
    encode under the frozen codebooks + deterministic batch-directory
    overwrite (see :func:`operators.similarity.ivfpq_append`).  Queries
    through ``ivfpq_topk_from_path`` see new vectors after each commit
    with partition-pruned, codes-only scans.  Re-clustering/re-training
    stays an offline rebuild, exactly like the uncompressed tier."""
    merge = _ivfpq_append_merge_fn(stream_vectors.sparkSession, path)
    return (
        stream_vectors.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def compact_snapshot(
    spark: SparkSession, root: str, target_files: int = 1
) -> str | None:
    """Rewrite the CURRENT snapshot version into ``target_files``
    parquet files and atomically re-point the manifest — the
    small-files compaction every merge-on-write table needs at scale
    (a long-running upsert stream leaves each version with one file
    per shuffle partition; scans then pay per-file open/footer cost
    that dwarfs the bytes).

    Contract:

    * Content is row-identical INCLUDING tombstones — compaction is a
      layout change, never a semantic one (``read_snapshot`` before ==
      after, pinned by test).
    * The new version directory is ``{base}c{n:04d}`` — the ``c``
      suffix sorts AFTER its base version, AFTER every earlier
      compaction of the same base, and BEFORE the next batch id under
      ``snapshot_versions``' (base, numeric-suffix) ordering — which
      also keeps legacy unpadded ``c1`` dirs and >4-digit compaction
      counts in commit order — so time travel to pre-compaction
      versions still works.
    * The manifest flip reuses :func:`_flip_latest` with the SAME
      committed batch id, so a concurrently-replayed micro-batch still
      no-ops (``batch_id <= committed``) and the next live batch
      simply commits the next id on top.
    * Crash-safe: ``n`` derives from the MANIFEST's current version
      (its ``c``-suffix + 1), never from a directory listing, so a
      retry after a crash recomputes the SAME name and overwrites the
      dangling attempt.  The parquet write itself goes to a hidden
      ``_compact.tmp.{new_version}`` staging dir and renames into
      place, so a partially-written compaction is never visible to
      ``snapshot_versions`` / ``read_snapshot_at`` in the crash
      window.  The staging name carries the TARGET version, so a
      retry of the same compaction reuses (and first clears) its own
      deterministic staging dir while a compaction racing toward a
      DIFFERENT version can never rmtree this one's in-flight files.
      Staging dirs whose target version is ≤ the one being written
      are dead (that compaction either committed or was superseded)
      and are collected on entry, including the legacy un-suffixed
      ``_compact.tmp`` name from older builds.
    * Writer contract: at most ONE compaction may target a given
      version at a time (the manifest flip is last-writer-wins, so
      two compactions racing toward the SAME new_version could flip a
      partially-overwritten dir).  Snapshot roots are single-writer
      by construction — the upsert stream owns the manifest — and
      compaction belongs to that same maintenance lane.
    * The pre-compaction version stays on disk for time travel until
      :func:`vacuum_snapshot` collects it.

    Returns the new version name, or None if there is no snapshot yet.
    """
    import os
    import re
    import shutil

    version, committed = _load_latest(root)
    if version is None:
        return None
    m = re.fullmatch(r"(v\d+)(?:c(\d+))?", version)
    if m is None:  # pragma: no cover - foreign version naming
        raise ValueError(f"unrecognized snapshot version {version!r}")
    base, suffix = m.group(1), m.group(2)
    n = (int(suffix) + 1) if suffix is not None else 1
    new_version = f"{base}c{n:04d}"
    df = spark.read.parquet(os.path.join(root, version))
    staging = os.path.join(root, f"_compact.tmp.{new_version}")
    new_key = _version_sort_key(new_version)
    for d in os.listdir(root):  # dead staging dirs: ours + superseded
        if d == "_compact.tmp":
            shutil.rmtree(os.path.join(root, d))
        elif d.startswith("_compact.tmp."):
            k = _version_sort_key(d[len("_compact.tmp."):])
            if k is None or k <= new_key:
                shutil.rmtree(os.path.join(root, d))
    df.repartition(target_files).write.mode("overwrite").parquet(staging)
    final = os.path.join(root, new_version)
    if os.path.exists(final):  # dangling dir from a crashed prior attempt
        shutil.rmtree(final)
    os.rename(staging, final)
    _flip_latest(root, new_version, committed)
    return new_version


def _pack_manifest_dirs(path: str, upto: int) -> list:
    """The committed batch directories of a pack-manifest root covering
    batches ``<= upto``, RANGE-AWARE and crash-dedup'd: live roots hold
    singleton ``batch=N`` dirs plus (after compaction) range
    ``batch=0-M`` dirs, and a compaction crash window can leave a stale
    singleton alongside the range that subsumes it — this helper picks
    the widest directory at each start point and skips every directory
    a chosen range already covers, so readers never double-count a
    batch.  (Ranges always start at 0 — :func:`compact_pack_manifest`
    compacts the full committed prefix — so coverage never partially
    overlaps; the sort handles the general nesting anyway.)"""
    import os

    ents = []
    for d in os.listdir(path):
        if not d.startswith("batch="):
            continue
        spec = d.split("=", 1)[1]
        try:
            if "-" in spec:
                lo_s, hi_s = spec.split("-", 1)
                lo, hi = int(lo_s), int(hi_s)
            else:
                lo = hi = int(spec)
        except ValueError:
            continue
        if lo <= hi <= upto:
            ents.append((lo, hi, os.path.join(path, d)))
    ents.sort(key=lambda e: (e[0], -e[1]))
    out, covered_hi = [], -1
    for lo, hi, p in ents:
        if hi <= covered_hi:
            continue  # fully inside an already-chosen range — stale
        out.append(p)
        covered_hi = hi
    return out


def _pack_manifest_merge_fn(
    spark: SparkSession,
    path: str,
    max_tokens: int,
    n_buckets: int,
    id_col: str,
    token_count_col: str | None,
    text_col: str,
    order_by_hash: bool,
    shuffle_salt: str,
):
    """foreachBatch merge for :func:`streaming_pack_manifest`
    (module-level so the crash-replay contract is directly testable —
    the ``_ivf_append_merge_fn`` discipline).

    Idempotency is structural: each micro-batch's manifest rows land
    in their own deterministic ``batch={batch_id}`` directory with
    mode=overwrite, and the high-water marks that place the batch
    come from the COMMITTED marker state only — never from a possibly
    partial directory of the batch being (re)played.  A replay after
    a crash at any point therefore recomputes the SAME rows (the
    placement inputs are identical) and replaces the dangling
    directory instead of double-appending.  The ``_PACK_COMMITTED``
    marker is the fast-path no-op for already-committed replays and
    the recorded high-water mark ``read_pack_manifest`` trusts.

    Scale shape: the marker CARRIES the ≤ ``n_buckets`` per-bucket
    token totals (``"hw"``), so appending batch N costs one window
    over batch N alone plus one bounded read-back aggregate of the
    rows just written — O(batch), NEVER a scan of the N−1 committed
    directories (the naive marks-from-manifest design is O(total
    history) per batch and quadratic over the stream's life).  A
    legacy marker without ``"hw"`` is migrated once by rebuilding the
    marks from the committed directories.
    """
    import json
    import os

    from slow_tortoise_spark.operators.packing import (
        pack_sequences_append_rows,
    )

    marker = os.path.join(path, "_PACK_COMMITTED")

    def _load_marker():
        if os.path.exists(marker):
            with open(marker) as fh:
                st = json.load(fh)
            hw = st.get("hw")
            return int(st["batch_id"]), (
                {int(b): int(t) for b, t in hw.items()}
                if hw is not None else None
            )
        return -1, {}

    def merge(batch_df: DataFrame, batch_id: int):
        committed, hw = _load_marker()
        if batch_id <= committed:
            return  # committed replay — nothing to redo
        if hw is None:
            # legacy marker (pre-"hw"): rebuild the marks ONCE from
            # the committed directories
            dirs = (_pack_manifest_dirs(path, committed)
                    if os.path.isdir(path) else [])
            hw = {}
            if dirs:
                hw = {
                    int(r["bucket"]): int(r["t"])
                    for r in spark.read.parquet(*dirs)
                    .groupBy("bucket").agg(F.sum("tokens").alias("t"))
                    .collect()
                }
        out_dir = os.path.join(path, f"batch={batch_id}")
        (pack_sequences_append_rows(
            batch_df, hw, batch_id,
            max_tokens=max_tokens, n_buckets=n_buckets, id_col=id_col,
            token_count_col=token_count_col, text_col=text_col,
            order_by_hash=order_by_hash, shuffle_salt=shuffle_salt,
        ).write.mode("overwrite").parquet(out_dir))
        # advance the marks from the rows JUST WRITTEN (read-back, so
        # the delta is exactly what a future rebuild would see):
        # ≤ n_buckets rows — bounded collect
        for r in (spark.read.parquet(out_dir)
                  .groupBy("bucket").agg(F.sum("tokens").alias("t"))
                  .collect()):
            b = int(r["bucket"])
            hw[b] = hw.get(b, 0) + int(r["t"])
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"batch_id": batch_id,
                       "hw": {str(b): t for b, t in hw.items()}}, fh)
        os.replace(tmp, marker)

    return merge


def streaming_pack_manifest(
    stream_docs: DataFrame,
    path: str,
    checkpoint: str,
    max_tokens: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
    order_by_hash: bool = False,
    shuffle_salt: str = "packshuf",
):
    """Continuously grow a persisted training-sequence packing
    manifest from a document stream: each micro-batch appends after
    the committed buckets' high-water marks via
    ``packing.pack_sequences_append`` (batch id = micro-batch id, so
    crash replays recompute the same placement) and lands in its own
    ``batch={id}`` overwrite directory — committed rows are
    bit-immutable forever, which is exactly the loader contract
    (already-trained-on sequence ids never move).  The ingest half of
    a continuous-pretraining data service: corpus shards stream in,
    the loader polls :func:`read_pack_manifest` and keeps consuming
    from sequence id high-water marks it has already seen.  The
    append-≡-union-repack associativity (pytest + the
    pack_sequences_append oracle row) is what makes micro-batch
    granularity semantically invisible.
    """
    merge = _pack_manifest_merge_fn(
        stream_docs.sparkSession, path, max_tokens, n_buckets, id_col,
        token_count_col, text_col, order_by_hash, shuffle_salt,
    )
    return (
        stream_docs.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_pack_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Loader-side view of a :func:`streaming_pack_manifest` root: the
    union of all COMMITTED batch directories (``batch=N`` for
    ``N <= _PACK_COMMITTED``) — a directory a crashed batch left
    behind is invisible until its replay commits.  Feed the result to
    ``packing.sequence_index`` for the per-sequence slice view."""
    import json
    import os

    marker = os.path.join(path, "_PACK_COMMITTED")
    if not os.path.exists(marker):
        raise FileNotFoundError(
            f"read_pack_manifest: no _PACK_COMMITTED marker under "
            f"{path} (no batch has committed yet)")
    with open(marker) as fh:
        committed = int(json.load(fh)["batch_id"])
    return spark.read.parquet(*_pack_manifest_dirs(path, committed))


def compact_pack_manifest(
    spark: SparkSession, path: str, target_files: int = 1
) -> str:
    """Rewrite a :func:`streaming_pack_manifest` root's committed
    batch directories into ONE ``batch=0-{committed}`` range directory
    of ``target_files`` parquet files — the small-files compaction a
    long-running ingest stream needs (a year of micro-batches is tens
    of thousands of ``batch=N`` dirs; loader scans then pay per-file
    open/footer cost that dwarfs the bytes — the
    :func:`compact_snapshot` problem, at the packing root).

    Contract (the snapshot-compaction discipline):

    * Content is row-identical INCLUDING the ``batch`` column —
      compaction is a layout change, never a semantic one; high-water
      marks and batch numbering off the compacted root are unchanged,
      so the merge function appends exactly as before (pinned by
      test).
    * Crash-safe: the rewrite lands in a hidden ``_pack_compact.tmp``
      staging dir and renames into place (a partially-written range
      dir is never visible — :func:`_pack_manifest_dirs` only ever
      sees a fully renamed one); a dangling FINAL dir without Spark's
      ``_SUCCESS`` marker is cleared and redone; a crash AFTER the
      rename but before old-dir cleanup leaves stale singletons the
      range subsumes — readers skip them (range-aware dedup) and the
      next compaction collects them.
    * Batches that commit AFTER this compaction append as new
      ``batch=N`` singletons next to the range dir; compact again
      whenever the singleton count hurts.

    Returns the range directory's path.
    """
    import json
    import os
    import shutil

    marker = os.path.join(path, "_PACK_COMMITTED")
    if not os.path.exists(marker):
        raise FileNotFoundError(
            f"compact_pack_manifest: no _PACK_COMMITTED marker under "
            f"{path} (nothing committed to compact)")
    if target_files <= 0:
        raise ValueError(
            "compact_pack_manifest: target_files must be positive")
    with open(marker) as fh:
        committed = int(json.load(fh)["batch_id"])
    final = os.path.join(path, f"batch=0-{committed}")
    if (os.path.isdir(final)
            and not os.path.exists(os.path.join(final, "_SUCCESS"))):
        shutil.rmtree(final)  # dangling partial from a crashed attempt
    if not os.path.isdir(final):
        dirs = _pack_manifest_dirs(path, committed)
        staging = os.path.join(path, "_pack_compact.tmp")
        if os.path.isdir(staging):
            shutil.rmtree(staging)
        (spark.read.parquet(*dirs)
            .coalesce(target_files)
            .write.mode("overwrite").parquet(staging))
        os.rename(staging, final)
    # collect everything the range now subsumes (incl. stale leftovers
    # of an earlier crashed cleanup)
    for d in list(os.listdir(path)):
        if not d.startswith("batch=") or d == f"batch=0-{committed}":
            continue
        spec = d.split("=", 1)[1]
        try:
            hi = int(spec.split("-", 1)[1]) if "-" in spec else int(spec)
        except ValueError:
            continue
        if hi <= committed:
            shutil.rmtree(os.path.join(path, d))
    return final
