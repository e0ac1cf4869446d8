"""Change-data-capture compaction: latest-version-per-key views and
batch upsert/merge — the maintenance operators a mutable table needs
when the storage is append-only parquet (the reference pipeline
re-materializes whole runs, `/root/reference/flows/data_pipeline.py`
run-id folders; these operators are the incremental-scale counterpart).

Scale notes: both operators are ONE partial-aggregated shuffle on the
key via ``max_by(payload, version)`` — no window, so no per-group sort
and no single-task hot group: map-side combine collapses every
partition to at most one candidate row per key before the exchange.
A window ``row_number() = 1`` computes the same answer but sorts each
group in one task; at 100 TB a hot key becomes a straggler there,
while max_by stays O(1) state per key per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Latest row per key: the compacted read view of an append-only
    change log.  ``order_cols`` is the version vector (compared
    lexicographically, ascending — the max wins); make it total (e.g.
    add a unique id as the last element) for deterministic output.

    Returns one row per key: key_cols + payload_cols.
    """
    if payload_cols is None:
        payload_cols = [
            c for c in df.columns if c not in key_cols and c not in order_cols
        ]
    version = F.struct(*[F.col(c) for c in order_cols])
    payload = F.struct(*[F.col(c) for c in order_cols + payload_cols])
    agg = df.groupBy(*key_cols).agg(
        F.max_by(payload, version).alias("_latest")
    )
    return agg.select(
        *key_cols,
        *[F.col(f"_latest.{c}").alias(c) for c in order_cols + payload_cols],
    )


def upsert(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Batch merge of a change set into a base snapshot: union both
    sides, keep the latest version per key, then drop rows whose
    winning version is a delete marker (``delete_col`` boolean).  The
    union is by name with missing columns allowed, so a change set may
    omit the delete column (pure upserts) or carry extra audit columns
    (ignored unless selected).

    One shuffle total — the same ``max_by`` aggregation as
    :func:`latest_by_key`; deletes are filtered AFTER version
    resolution so an older live row can never resurrect past a newer
    tombstone.
    """
    both = base.unionByName(changes, allowMissingColumns=True)
    if delete_col is not None and delete_col not in both.columns:
        delete_col = None
    payload_cols = [
        c for c in both.columns if c not in key_cols and c not in order_cols
    ]
    merged = latest_by_key(both, key_cols, order_cols, payload_cols)
    if delete_col is not None:
        merged = merged.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    return merged
