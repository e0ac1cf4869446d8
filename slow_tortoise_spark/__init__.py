"""slow_tortoise_spark — a PySpark-native geotemporal datacube analytics engine.

A brand-new implementation (not a port) of the query and data-processing
capabilities of the reference pipeline (uncharted-causemos/slow-tortoise):
long-format geotemporal "datacube" ingestion, normalization, temporal and
spatial group-by aggregation (with weighted variants), regional rollups,
extrema, qualifier pivots, web-mercator grid tiling, plus a training-data
toolbox (dedup, similarity search, text analysis) — all expressed as
idiomatic Spark DataFrame operations so Catalyst/Tungsten pick the
physical strategy.

Layout:
    schema        datacube column contract + constants
    session       SparkSession factory tuned for the engine
    sources/      parquet readers (single + harmonized multi-file)
    operators/    the operator library (aggregation, regional, tiles, ...)
    sinks/        pluggable artifact writers (file/s3/null) + tile protobuf
    pipeline      batch orchestrator replacing the reference's Prefect DAG
"""

__version__ = "0.1.0"
