"""Bucketed-table layout: shuffle-free co-located joins at write time.

SCALE.md promises "for repeated co-located joins at 100 TB, bucket both
tables on the join key at write time"; this module is that promise made
executable.  ``bucketBy`` hashes rows into a fixed number of bucket files
per partition at WRITE time, so a later equi-join (or aggregation) on the
bucket key needs no exchange at READ time: Spark zips matching buckets
and sort-merge-joins them in place.  For a fact table joined on the same
key by every nightly run, this converts the dominant per-query shuffle —
at 100 TB, re-hashing the whole fact table over the network every time —
into a one-time cost paid at ingest.

Spark-side mechanics (all public semantics, no reference equivalent —
the reference engine is single-node and never shuffles):

* Bucketed tables must live in a catalog (``saveAsTable``), because the
  bucket spec is table metadata; a bare ``parquet(path)`` write ignores
  ``bucketBy``.
* Both join sides need the SAME bucket count and key for full exchange
  elimination; with ``sortBy`` the per-bucket sort is also pre-paid,
  letting the join skip its Sort nodes entirely.
* One task reads one bucket per table — bucket count bounds read
  parallelism, so pick roughly (cluster cores × small multiple) at the
  target scale, not the local-test value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet table bucketed (and per-bucket sorted)
    on ``key``.

    The write itself shuffles once to co-locate keys; every subsequent
    join/groupBy on ``key`` against a same-spec table is exchange-free.
    """
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format("parquet").mode(mode).bucketBy(
        buckets, keys[0], *keys[1:]
    )
    if sort:
        writer = writer.sortBy(keys[0], *keys[1:])
    writer.saveAsTable(table)


def cogrouped_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-spec bucketed tables on their bucket key.

    Declarative on purpose: Catalyst sees both sides' bucket specs and
    plans a SortMergeJoin with NO exchange (and, for sorted buckets, no
    sort) — tests assert the exchange-free plan rather than trusting
    this docstring.
    """
    return spark.table(left_table).join(spark.table(right_table), on, how)


def is_exchange_free_join(df: DataFrame) -> bool:
    """True when the physical plan contains a join but no shuffle.

    Plan-audit helper (mirrors the plan assertions in tests/test_plans.py):
    a bucketed co-located join must not re-partition either side.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    has_join = "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    return has_join and "Exchange" not in plan
