"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship datacube query (global timeseries over
the events table mapped onto the datacube shape) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the full operator catalog from
slow_tortoise_spark.queries — one Spark callable + one DuckDB oracle per
operator from SURVEY.md §2 plus the training-data extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from slow_tortoise_spark.queries import ORACLE_SQL, QUERIES
from slow_tortoise_spark.session import pin_process_utc

# The driver builds its own SparkSession, so the engine's bootstrap never
# runs — pin the process timezone at this entry boundary instead (collected
# TimestampType rows go through datetime.fromtimestamp in the DRIVER
# process tz; parity with the DuckDB oracle is defined in UTC).
pin_process_utc()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from slow_tortoise_spark.queries import q_global_timeseries

    return q_global_timeseries(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable equivalents; omissions get a rows-only check."""
    return dict(ORACLE_SQL)
