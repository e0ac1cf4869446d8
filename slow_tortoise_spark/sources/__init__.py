from slow_tortoise_spark.sources.reader import read_datacube, read_star_schema

__all__ = ["read_datacube", "read_star_schema"]
