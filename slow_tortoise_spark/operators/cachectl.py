"""Operator-owned cache registry (caller-releasable).

Several operators cache an intermediate frame that their RETURNED (lazy)
result consumes on multiple subtrees — e.g. a shingle frame feeding both
sides of a self-join, where AQE never ReuseExchange's across a DataFrame
self-join, so without the cache the expensive upstream pipeline runs
once per subtree.  The operator cannot unpersist before returning (the
cache must still be live when the CALLER evaluates the result — round-5
ADVICE showed an unpersist-before-evaluation turning a documented
two-aggregation plan into four), so the lifecycle has to be the
caller's.

This module makes that contract explicit and cheap to honor:

- operators route every such cache through :func:`tracked_cache`;
- a long-lived driver calls :func:`release_operator_caches` at stage
  boundaries (after the consuming action — a write, collect, or count)
  to drop every operator-pinned block at once;
- short-lived sessions may skip the call: Spark's LRU block eviction
  bounds the cost, which is the pre-existing behavior, now opt-out
  instead of unavoidable.

``corpus_pipeline`` releases at its final write; the oracle/bench
harnesses release between queries only if memory pressure ever demands
it (sf0.1 frames are small).  Re-caching an identical logical plan is a
CacheManager no-op, so double-registration of the same plan just means
two harmless unpersist calls at release time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: Strong refs to every operator-cached frame not yet released.  A
#: registry, not a leak: one release_operator_caches() call empties it.
_TRACKED: list[DataFrame] = []


def tracked_cache(frame: DataFrame) -> DataFrame:
    """``frame.cache()`` + registration for bulk release."""
    out = frame.cache()
    _TRACKED.append(out)
    return out


def release_operator_caches() -> int:
    """Unpersist every tracked operator cache; returns how many frames
    were released.  Safe to call at any time — results computed from a
    released cache stay correct (the plan recomputes), only reuse speed
    is affected — but the intended call site is AFTER the action that
    consumed the operator results (stage boundary / final write)."""
    n = 0
    for f in _TRACKED:
        try:
            f.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing left to pin
    _TRACKED.clear()
    return n


def tracked_count() -> int:
    """How many operator caches are currently registered (test hook)."""
    return len(_TRACKED)


# ---------------------------------------------------------------------------
# Checkpoints (lineage-truncating, NOT recomputable after release)
# ---------------------------------------------------------------------------

#: (frame, parquet_path_or_None) for every checkpoint not yet freed.
_TRACKED_CHECKPOINTS: list[tuple[DataFrame, str | None]] = []

#: "local" (localCheckpoint: executor block store — fast, but LOST on
#: executor failure, so a long cluster soak restarts from zero) or
#: "parquet" (write/read through ``_CKPT_DIR``: one extra scan per
#: boundary, survives any executor loss — the mode to run on a real
#: cluster where a multi-hour pipeline cannot afford a restart).
_CKPT_MODE: str = "local"
_CKPT_DIR: str | None = None
_CKPT_SEQ: int = 0


def set_checkpoint_mode(mode: str, directory: str | None = None) -> tuple[str, str | None]:
    """Select how :func:`tracked_local_checkpoint` truncates lineage.

    ``mode="local"`` is the default (executor-memory/disk blocks via
    ``localCheckpoint`` — cheapest, not durable).  ``mode="parquet"``
    makes every checkpoint a parquet write + read under ``directory``
    (any Hadoop-reachable URI: HDFS, S3A, local path): durable across
    executor loss, the documented cluster mode for long soaks.  Returns
    the previous (mode, directory) so callers can restore it."""
    global _CKPT_MODE, _CKPT_DIR
    if mode not in ("local", "parquet"):
        raise ValueError(f"checkpoint mode must be local|parquet, got {mode!r}")
    if mode == "parquet" and not directory:
        raise ValueError("parquet checkpoint mode needs a directory")
    prev = (_CKPT_MODE, _CKPT_DIR)
    _CKPT_MODE, _CKPT_DIR = mode, directory
    return prev


def checkpoint_mode() -> tuple[str, str | None]:
    """Current (mode, directory) — test/diagnostic hook."""
    return (_CKPT_MODE, _CKPT_DIR)


def _delete_path(frame: DataFrame, path: str) -> None:
    """Recursive delete through the session's Hadoop FS (works for any
    scheme the cluster can write — local, HDFS, S3A)."""
    spark = frame.sparkSession
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(hpath, True)


def tracked_local_checkpoint(frame: DataFrame, eager: bool = True) -> DataFrame:
    """Lineage-truncating checkpoint + registration for explicit release.

    In "local" mode this is ``frame.localCheckpoint(eager)``;
    ``unpersist()`` on the returned DataFrame has no handle on
    checkpoint blocks — without this registry they linger until the JVM
    garbage-collects the internal RDD (the residual ~28 MB a
    corpus-pipeline run used to leave behind).  In "parquet" mode (see
    :func:`set_checkpoint_mode`) the frame is written to a fresh
    directory and read back — always eager, durable across executor
    loss; release deletes the directory."""
    global _CKPT_SEQ
    if _CKPT_MODE == "parquet":
        path = f"{_CKPT_DIR}/ckpt_{_CKPT_SEQ:05d}"
        _CKPT_SEQ += 1
        frame.write.mode("overwrite").parquet(path)
        out = frame.sparkSession.read.parquet(path)
        _TRACKED_CHECKPOINTS.append((out, path))
        return out
    out = frame.localCheckpoint(eager=eager)
    _TRACKED_CHECKPOINTS.append((out, None))
    return out


def _free_one(frame: DataFrame, path: str | None) -> bool:
    if path is not None:
        try:
            _delete_path(frame, path)
            return True
        except Exception:
            return False  # session stopped — nothing left to free
    try:
        frame._jdf.queryExecution().logical().rdd().unpersist(False)
        return True
    except Exception:
        return False  # non-LogicalRDD plan or stopped session


def free_local_checkpoint(frame: DataFrame) -> bool:
    """Free ONE checkpointed frame's storage immediately (blocks or
    parquet directory) and deregister it.  For iterative operators:
    round N's checkpoint can be freed as soon as round N+1 is
    materialized and the convergence check has consumed both — keeping
    live checkpoint storage O(1) in rounds instead of O(iterations).

    CONTRACT — stronger than a cache release: a checkpoint truncates
    lineage, so the frame is NOT recomputable afterwards.  Only free a
    frame every consumer is finished with."""
    for i, (f, path) in enumerate(_TRACKED_CHECKPOINTS):
        if f is frame:
            del _TRACKED_CHECKPOINTS[i]
            return _free_one(f, path)
    return _free_one(frame, None)


def release_local_checkpoints() -> int:
    """Free every tracked checkpoint's storage; returns how many frames
    were released.  Same call site as :func:`release_operator_caches`
    (stage boundary, AFTER the consuming action) but a harder contract:
    released frames cannot be recomputed — callers must be done with
    every result derived from them."""
    n = 0
    for f, path in list(_TRACKED_CHECKPOINTS):
        if _free_one(f, path):
            n += 1
    _TRACKED_CHECKPOINTS.clear()
    return n


def tracked_checkpoint_count() -> int:
    """How many checkpoints are currently registered (test hook)."""
    return len(_TRACKED_CHECKPOINTS)
