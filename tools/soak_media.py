"""Media-pipeline scale soak — the multimodal counterpart of
``soak_corpus.py``: generate N synthetic 24-bit BMP blobs EXECUTOR-SIDE
(no driver bottleneck; deterministic per media_id), with planted
exact duplicates and near-duplicates per base-image group, then run
``run_media_pipeline`` (real stdlib BMP decode → features → exact +
LSH near dedup) end to end and report wall time, peak executor
storage, and the stage manifest.

Each group of ``variants`` media ids shares one base image: variant 0
and 1 are byte-identical (exact-dup tier must collapse them), variants
2+ perturb a few pixels (near-dup tier sees high-cosine neighbors).

Expected accounting at the defaults (hand-verifiable): base images are
deterministic per (band, mix) PROFILE — 16 bands x 3 mixes = 48
distinct bases — so the exact tier keeps 48 bases + every perturbed
variant, and the LSH tier collapses each profile to one survivor MINUS
the 16 profile pairs that legitimately share a 0.9-mass dominant
histogram bin (cosine 0.9878 > the 0.98 threshold; verified by direct
numpy cosine of the 48 profile histograms) → 32 survivors.  The soak
thereby witnesses all three behaviors at scale: byte-exact collapse,
within-profile near-dup collapse, and cross-profile merges exactly at
the cosine boundary.

Usage: python tools/soak_media.py [n_media] [variants]
Prints one JSON summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIDE = 32  # 32x32 px, 24-bit → ~3 KB per blob


def main() -> int:
    n_media = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    variants = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from slow_tortoise_spark.media_pipeline import (
        MediaParams,
        run_media_pipeline,
    )
    from slow_tortoise_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Single-JVM heap sizing (the soak_corpus rule applied to blobs):
    # local mode runs driver + all 32 executor threads in ONE heap, so
    # n blobs × ~3 KB × in-flight Arrow copies all land together — at
    # 400k blobs the default 8g heap starved even the 32-row survivor
    # broadcast build ("Not enough memory to build and broadcast").  A
    # real cluster spreads the same batches over many executors and the
    # driver holds only the tiny broadcast.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(app_name="soak_media", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    peak = {"mb": 0.0, "rdds": 0}
    stop = threading.Event()

    def sample():
        while not stop.is_set():
            infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
            mb = sum(i.memSize() for i in infos) / 1e6
            peak["mb"] = max(peak["mb"], mb)
            peak["rdds"] = max(peak["rdds"], len(infos))
            stop.wait(0.5)

    def gen(batches):
        """Executor-side BMP synthesis: deterministic per media_id."""
        import struct

        import numpy as np
        import pandas as pd

        row_bytes = SIDE * 3
        pad = (4 - row_bytes % 4) % 4
        img_bytes = (row_bytes + pad) * SIDE
        header = (
            b"BM"
            + struct.pack("<IHHI", 54 + img_bytes, 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, SIDE, SIDE, 1, 24, 0,
                          img_bytes, 2835, 2835, 0, 0)
        )

        # Each group gets a two-band LUMA PROFILE (the features are a
        # 16-bin luma histogram): base band b1 = group % 16, partner
        # band b1+7, mix fraction p in {0.1, 0.5, 0.9}.  Distinct
        # profiles sit well below the 0.98 cosine threshold (adjacent
        # 0.1-step mixes would NOT — cos([.1,.9],[.2,.8]) ≈ 0.99);
        # within a group, 3 perturbed pixels keep cosine ≈ 1, so the
        # LSH tier collapses each profile to one survivor.
        idx = np.arange(SIDE * SIDE, dtype=np.int64)
        frac = ((idx * 2654435761) % 1000) / 1000.0

        for pdf in batches:
            out = []
            for mid in pdf["id"]:
                group, variant = divmod(int(mid), variants)
                b1 = group % 16
                b2 = (b1 + 7) % 16
                p = (0.1, 0.5, 0.9)[(group // 16) % 3]
                band = np.where(frac < p, b1, b2)
                # gray pixel value inside the band: luma(v,v,v) == v
                val = band * 16 + (idx % 14) + 1
                if variant >= 2:  # near-dup: shunt 3 pixels off-band
                    vr = np.random.RandomState(
                        (group * 1_000_003 + variant) % (2**31)
                    )
                    for pos in vr.randint(0, SIDE * SIDE, 3):
                        val[pos] = (val[pos] + 128) % 256
                px = val.reshape(SIDE, SIDE)
                rows = []
                for y in range(SIDE):  # BMP stores bottom-up BGR
                    row = np.repeat(
                        px[SIDE - 1 - y].astype(np.uint8), 3
                    )
                    rows.append(row.tobytes() + b"\x00" * pad)
                out.append(header + b"".join(rows))
            yield pd.DataFrame(
                {"media_id": pdf["id"].astype("int64"), "content": out}
            )

    # Partition count scales with blob count (the corpus-soak sizing
    # rule): a fixed cpus-wide layout puts n/cpus blobs in ONE task's
    # Arrow batches — at 200k blobs that is ~6 k blobs × (bytes +
    # decode buffers) per task, × cpus concurrent tasks in local
    # mode's single shared heap.  ~1.5 k blobs per task keeps every
    # batch a few MB; real multi-file inputs arrive pre-split anyway.
    parts = max(cpus, n_media // 1500)
    media = (
        spark.range(n_media)
        .repartition(parts)
        .mapInPandas(gen, schema="media_id long, content binary")
        .withColumn("path", F.concat(F.lit("mem://bmp/"),
                                     F.col("media_id").cast("string")))
    )

    out_dir = "/tmp/soak_media_out"
    shutil.rmtree(out_dir, ignore_errors=True)
    sampler = threading.Thread(target=sample, daemon=True)
    sampler.start()
    t0 = time.time()
    manifest = run_media_pipeline(
        spark, media, MediaParams(out_dir=out_dir, dedup="lsh")
    )
    wall = round(time.time() - t0, 1)
    stop.set()
    sampler.join(timeout=2)

    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    residual = round(sum(i.memSize() for i in infos) / 1e6, 1)
    summary = {
        "n_media": n_media,
        "variants_per_group": variants,
        "blob_bytes": 54 + (SIDE * 3 + (4 - SIDE * 3 % 4) % 4) * SIDE,
        "wall_sec": wall,
        "peak_storage_mb": round(peak["mb"], 1),
        "peak_cached_rdds": peak["rdds"],
        "residual_storage_mb": residual,
        "manifest": manifest,
    }
    print(json.dumps(summary, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
