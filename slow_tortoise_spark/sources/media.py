"""Media ingest from raw files — Spark's ``binaryFile`` source mapped
onto the MEDIA_SCHEMA contract.

Batch: one distributed directory scan; every file becomes a row of
(path-derived media_id, kind from extension, content, mime, length).
Streaming: ``readStream.format("binaryFile")`` with the same projection
— new files landing in the watched directory flow incrementally into
the media pipeline (``availableNow`` for batch-shaped backfills).

Scale notes: binaryFile is splittable at FILE granularity — parallelism
is the file count, and ``pathGlobFilter`` prunes listings before any
bytes are read.  ``spark.sql.files.maxPartitionBytes`` does not split
single blobs; for multi-GB media shard the objects upstream (the
WebDataset sink is the writer-side counterpart).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension → (kind, mime); everything else ingests as kind="binary"
_EXT_KINDS = {
    "png": ("image", "image/png"),
    "bmp": ("image", "image/bmp"),
    "jpg": ("image", "image/jpeg"),
    "jpeg": ("image", "image/jpeg"),
    "gif": ("image", "image/gif"),
    "wav": ("audio", "audio/wav"),
    "avi": ("video", "video/x-msvideo"),
    "mp4": ("video", "video/mp4"),
}


def _media_projection():
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    kind = F.lit("binary")
    mime = F.lit("application/octet-stream")
    for e, (k, m) in _EXT_KINDS.items():
        kind = F.when(ext == e, k).otherwise(kind)
        mime = F.when(ext == e, m).otherwise(mime)
    return [
        # stable id from the file path (not listing order): keyed hash
        F.xxhash64(F.col("path")).alias("media_id"),
        F.col("path"),
        kind.alias("kind"),
        F.col("content"),
        mime.alias("mime"),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").alias("modified_at"),
    ]


def read_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Batch-ingest a directory of media files as MEDIA-shaped rows."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path).select(*_media_projection())


def stream_media_dir(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Streaming ingest of the same directory — new files flow
    incrementally (pair with ``trigger(availableNow=True)`` for
    backfills).  binaryFile streams require an explicit schema; it is
    fixed by the source format."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("path", T.StringType(), False),
            T.StructField("modificationTime", T.TimestampType(), False),
            T.StructField("length", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    reader = spark.readStream.format("binaryFile").schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path).select(*_media_projection())
