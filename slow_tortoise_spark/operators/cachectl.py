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
