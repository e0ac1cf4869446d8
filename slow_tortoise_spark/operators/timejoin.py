"""Temporal join operators Spark's API lacks as primitives: as-of join,
range join, and time-based rolling windows.

All three are compositions of existing DataFrame ops (SURVEY §2.8 —
option (a) before reaching for Pandas UDFs):

* **as-of join** — the union+window trick: stack left and right rows on
  the shared key/time axis, carry the most recent right-row values
  forward with ``last(ignorenulls)`` over an ordered window, keep left
  rows. One shuffle on (key), no per-row Python, no O(n·m) pair blow-up.
* **range join** — a plain join with an interval predicate; bucketing
  both sides to coarse time buckets turns it into an equi-join on
  (bucket) with a residual filter, which is the scale path (Spark would
  otherwise nested-loop it).
* **rolling window** — native ``rangeBetween`` over an epoch-numeric
  ordering column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tolerance_ms: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_time <= left_time`` for the same ``on`` key.

    Ties on time resolve to the right row that sorts last among the tied
    group (stable given unique (key, time) pairs; add a tiebreaker column
    to ``right`` and include it in ``value_cols`` when times can tie).
    ``tolerance_ms`` drops matches older than the given gap.

    Implementation: union both sides tagged by origin; within each key,
    order by (time, origin) so a right row at time T precedes a left row
    at the same T; ``last(value, ignorenulls=True)`` carries right values
    forward; filter back to left rows. Cost: one shuffle on ``on``.
    """
    # Single batched selects/withColumns instead of per-column
    # withColumn loops: each withColumn is its own driver round trip and
    # stacks one Project node (profiled r14: ~0.14 s of construction per
    # bench iteration for the 6-column events case).  Column order and
    # types are unchanged — r_tagged is built directly in l_tagged's
    # column order (the old code reordered it with a second select), and
    # untyped NULL fills coerce to the left side's types in the union
    # exactly as before.
    lt = F.col(left_time).cast("long")
    rt = F.col(right_time).cast("long")
    l_tagged = left.select(
        "*",
        lt.alias("__t"),
        F.lit(1).alias("__is_left"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
            for c in value_cols
        ],
        F.lit(None).cast("long").alias("__rt"),
    )
    r_cols = {
        on: F.col(on),
        "__t": rt.alias("__t"),
        "__is_left": F.lit(0).alias("__is_left"),
        "__rt": rt.alias("__rt"),
        **{f"__r_{c}": F.col(c).alias(f"__r_{c}") for c in value_cols},
    }
    r_tagged = right.select(
        *[r_cols.get(c, F.lit(None).alias(c)) for c in l_tagged.columns]
    )

    stacked = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = stacked.withColumns({
        **{
            f"__r_{c}": F.last(f"__r_{c}", ignorenulls=True).over(w)
            for c in value_cols
        },
        "__rt": F.last("__rt", ignorenulls=True).over(w),
    })

    out = carried.filter(F.col("__is_left") == 1)
    if tolerance_ms is not None:
        keep = F.col("__t") - F.col("__rt") <= F.lit(tolerance_ms)
        out = out.withColumns({
            **{
                f"__r_{c}": F.when(keep, F.col(f"__r_{c}"))
                for c in value_cols
            },
            "__rt": F.when(keep, F.col("__rt")),
        })
    out = out.withColumnsRenamed(
        {f"__r_{c}": f"right_{c}" for c in value_cols}
    )
    return out.withColumnRenamed("__rt", "right_time_ms").drop("__t", "__is_left")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_time: Column,
    right_time: Column,
    lower_ms: int,
    upper_ms: int,
    bucket_ms: int | None = None,
) -> DataFrame:
    """Join rows where ``right_time - left_time ∈ [lower_ms, upper_ms]``.

    With ``bucket_ms`` set, both sides get coarse bucket keys and the
    join becomes an equi-join on candidate buckets plus a residual
    filter — the shape that scales (Spark plans raw interval predicates
    as broadcast nested loop). Bucket span must cover the interval:
    right rows explode to ceil((upper-lower)/bucket)+1 candidate buckets.
    """
    lt = left_time.cast("long")
    rt = right_time.cast("long")
    cond_lo = rt - lt >= F.lit(lower_ms)
    cond_hi = rt - lt <= F.lit(upper_ms)
    if bucket_ms is None:
        return left.join(right, cond_lo & cond_hi)

    n_buckets = (upper_ms - lower_ms) // bucket_ms + 1
    l_b = left.withColumn("__lb", F.floor((lt + F.lit(lower_ms)) / F.lit(bucket_ms)))
    r_b = right.withColumn(
        "__rb",
        F.explode(
            F.sequence(
                F.floor(rt / F.lit(bucket_ms)) - F.lit(n_buckets),
                F.floor(rt / F.lit(bucket_ms)),
            )
        ),
    )
    joined = l_b.join(r_b, F.col("__lb") == F.col("__rb"))
    return joined.filter(cond_lo & cond_hi).drop("__lb", "__rb")


def batch_sessionize(
    df: DataFrame,
    key: str,
    time_col: str,
    gap_us: int,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based session assignment over a BATCH table (the streaming
    ``sessionize``'s offline counterpart — same semantics on complete
    input, but as two plain window passes instead of state).

    A new session starts whenever the gap to the previous event of the
    same key exceeds ``gap_us`` microseconds; the session id is the
    running count of session starts (classic lag + cumulative sum —
    both windows share ONE partitioning on the key, so Catalyst plans a
    single sort+exchange, not two).  ``order_tiebreak`` column breaks
    equal-timestamp ordering deterministically (required for an exact
    SQL oracle).  Output adds ``session_id`` (1-based per key).
    """
    order = [F.unix_micros(F.col(time_col))]
    if order_tiebreak:
        order.append(F.col(order_tiebreak))
    w = Window.partitionBy(key).orderBy(*order)
    t = F.unix_micros(F.col(time_col))
    gap = t - F.lag(t).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def rolling_time_agg(
    df: DataFrame,
    key: str,
    time_col: str,
    value_col: str,
    window_ms: int,
) -> DataFrame:
    """Per-key rolling aggregates over the trailing ``window_ms``:
    count + sum of ``value_col`` for rows within (t − window, t]."""
    t = F.col(time_col).cast("long")
    w = (
        Window.partitionBy(key)
        .orderBy(t)
        .rangeBetween(-(window_ms - 1), 0)
    )
    # Both aggregates in ONE select: chained withColumn calls insert a
    # Project re-aliasing the ordering expression between the two Window
    # operators, which blocks Spark's CollapseWindow rule and pays a
    # second Sort+Window pass over the full frame (guide §2.4).
    return df.select(
        "*",
        F.count(value_col).over(w).alias("rolling_n"),
        F.sum(value_col).over(w).alias("rolling_sum"),
    )


def assemble_sequences(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    value_col: str = "event_type",
    max_len: int = 50,
) -> DataFrame:
    """Per-key time-ordered event sequences — the assembly step that
    turns a behavioral event log into training examples (one row per
    key: the first ``max_len`` event values in time order, plus the
    true length).

    One shuffle (groupBy key).  Ordering happens INSIDE the row:
    ``collect_list`` of (ts, tiebreak, value) structs is unordered and
    partitioning-dependent, so the array is ``sort_array``-ed by the
    struct's (ts, tiebreak) prefix before truncation — making the
    result deterministic on any cluster layout, with no window sort of
    the full log.  Per-key state is bounded by that key's event count;
    truncation to ``max_len`` caps the OUTPUT, not the aggregation —
    for keys with millions of events, pre-filter by time range first.

    Returns (key, seq_len, seq) with ``seq`` a comma-joined string of
    values (string form keeps cross-engine comparison trivial).
    """
    packed = df.groupBy(key_col).agg(
        F.count("*").alias("seq_len"),
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(ts_col).alias("_t"),
                    F.col(order_tiebreak).alias("_i"),
                    F.col(value_col).cast("string").alias("_v"),
                )
            )
        ).alias("_events"),
    )
    seq = F.array_join(
        F.transform(F.slice("_events", 1, max_len), lambda s: s["_v"]), ","
    )
    return packed.select(
        key_col, "seq_len", seq.alias("seq")
    )
