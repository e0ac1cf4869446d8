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
# Local checkpoints (lineage-truncating, NOT recomputable after release)
# ---------------------------------------------------------------------------

#: Checkpointed frames whose blocks have not been explicitly freed yet.
_TRACKED_CHECKPOINTS: list[DataFrame] = []


def tracked_local_checkpoint(frame: DataFrame, eager: bool = True) -> DataFrame:
    """``frame.localCheckpoint(eager)`` + registration for explicit
    block release.  ``unpersist()`` on the returned DataFrame has no
    handle on checkpoint blocks — without this registry they linger
    until the JVM garbage-collects the internal RDD (the residual
    ~28 MB a corpus-pipeline run used to leave behind)."""
    out = frame.localCheckpoint(eager=eager)
    _TRACKED_CHECKPOINTS.append(out)
    return out


def free_local_checkpoint(frame: DataFrame) -> bool:
    """Free ONE checkpointed frame's blocks immediately (and deregister
    it).  For iterative operators: round N's checkpoint can be freed as
    soon as round N+1 is materialized and the convergence check has
    consumed both — keeping live checkpoint storage O(1) in rounds
    instead of O(iterations).

    CONTRACT — stronger than a cache release: a localCheckpoint
    truncates lineage, so the frame is NOT recomputable afterwards.
    Only free a frame every consumer is finished with."""
    try:
        frame._jdf.queryExecution().logical().rdd().unpersist(False)
        ok = True
    except Exception:
        ok = False  # non-LogicalRDD plan or stopped session
    for i, f in enumerate(_TRACKED_CHECKPOINTS):
        if f is frame:
            del _TRACKED_CHECKPOINTS[i]
            break
    return ok


def release_local_checkpoints() -> int:
    """Free every tracked checkpoint's blocks; returns how many frames
    were released.  Same call site as :func:`release_operator_caches`
    (stage boundary, AFTER the consuming action) but a harder contract:
    released frames cannot be recomputed — callers must be done with
    every result derived from them."""
    n = 0
    for f in list(_TRACKED_CHECKPOINTS):
        try:
            f._jdf.queryExecution().logical().rdd().unpersist(False)
            n += 1
        except Exception:
            pass  # session stopped — nothing left to free
    _TRACKED_CHECKPOINTS.clear()
    return n


def tracked_checkpoint_count() -> int:
    """How many checkpoints are currently registered (test hook)."""
    return len(_TRACKED_CHECKPOINTS)
