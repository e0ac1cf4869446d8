"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns plus typed metadata — the
schema, partitioning, and Arrow-batched UDF shape are the real,
production-grade part; the actual codec calls are stubbed because no
image/audio libraries exist in this environment. Replace the marked
``_decode_*_stub`` internals with PIL/ffmpeg calls without touching any
Spark plumbing.

Batch-shape rules encoded here (the part that matters at 100 TB):
* ``mapInPandas`` streams Arrow record batches — media bytes never
  round-trip through Python row objects.
* ``spark.sql.execution.arrow.maxRecordsPerBatch`` should be lowered
  (e.g. 64) for large blobs so a batch stays ≪ executor memory.
* Feature extraction emits fixed-size float arrays → downstream joins/
  ANN reuse the similarity operators unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_image_stub(content: bytes) -> dict:
    """STUB — replace with a real decoder (PIL etc.).

    Deterministic fake: derives pseudo-features from the byte content so
    the full pipeline (schema, batching, downstream ANN) is testable.
    """
    import hashlib

    if content is None:
        raise NotImplementedError("real image decode requires an image library")
    digest = hashlib.sha256(content).digest()
    features = [b / 255.0 for b in digest[:16]]
    return {"sha": digest.hex()[:16], "features": features}


def extract_image_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary image content.

    ``mapInPandas`` so each Python invocation sees a whole Arrow batch;
    per-batch loop only touches the blob column.
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [_decode_image_stub(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "sha": [f["sha"] for f in feats],
                    "features": [f["features"] for f in feats],
                }
            )

    return df.select("media_id", "content").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame offset.

    The offsets come from native column math (sequence over duration);
    only the (stubbed) frame decode would run in Python.
    """
    frames = df.withColumn(
        "frame_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )
    return frames.select("media_id", "frame_ms", "content")
