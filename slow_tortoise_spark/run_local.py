"""Local pipeline runner — the Spark equivalent of the reference's
``flows/run_flow_local.py`` (parameter sets executed against local data
instead of a Prefect server).

Usage::

    python -m slow_tortoise_spark.run_local [param_set_index] [dest_root]

Parameter sets mirror the reference's shapes: a full tiling run, a
selected-tasks run, a weighted run, and a qualifier-threshold run — all
against the driver-generated testdata (events table mapped onto the
datacube contract), so a reference user's ``run_flow_local`` workflow has
a direct counterpart here.
"""

from __future__ import annotations

import sys

from slow_tortoise_spark.pipeline import PipelineParams, run_pipeline
from slow_tortoise_spark.session import get_spark

TESTDATA = "/root/testdata/sf0.001"


def _datacube_from_events(spark, sf_dir: str, out_path: str) -> str:
    """Map the events table onto the datacube column contract and stage
    it as parquet (the reference's param sets point at prepared datacube
    parquet; this builds one from the synthetic testdata)."""
    from pyspark.sql import functions as F

    from slow_tortoise_spark.sources.reader import read_table

    ev = read_table(spark, f"{sf_dir}/events.parquet")
    cube = ev.select(
        F.unix_millis(F.col("ts")).alias("timestamp"),
        F.concat(F.lit("c"), (F.col("user_id") % 5).cast("string")).alias(
            "country"
        ),
        F.concat(F.lit("a"), (F.col("user_id") % 25).cast("string")).alias(
            "admin1"
        ),
        ((F.col("user_id") % 180) - 90 + 0.5).cast("double").alias("lat"),
        ((F.col("user_id") % 360) - 180 + 0.5).cast("double").alias("lng"),
        F.col("event_type").alias("feature"),
        F.col("value"),
        F.col("event_type").alias("qual1"),
        (F.col("value") * 0 + 1.0).alias("w"),
    )
    cube.write.mode("overwrite").parquet(out_path)
    return out_path


def _drifted_cube_files(spark, base_cube_path: str, out_root: str) -> list[str]:
    """Stage the cube as TWO parquet files with drifting schemas (the
    reference's multi-file sets 3/4: later shards add qualifier columns).
    File 1 lacks ``qual2``; file 2 adds it — the harmonized union pads
    the gap with empty strings."""
    from pyspark.sql import functions as F

    cube = spark.read.parquet(base_cube_path)
    half1 = cube.filter(F.col("timestamp") % 2 == 0)
    half2 = cube.filter(F.col("timestamp") % 2 == 1).withColumn(
        "qual2", F.concat(F.lit("x"), (F.col("timestamp") % 3).cast("string"))
    )
    p1 = f"{out_root}/_drift_1.parquet"
    p2 = f"{out_root}/_drift_2.parquet"
    half1.write.mode("overwrite").parquet(p1)
    half2.write.mode("overwrite").parquet(p2)
    return [p1, p2]


def _invalid_ts_cube(spark, base_cube_path: str, out_root: str) -> str:
    """Stage a cube with null + beyond-ns-range timestamps (reference set
    5 'Invalid timestamps' and the fill_timestamp=0 sets 9/10): nulls are
    filled with ``fill_timestamp``, extreme rows must be dropped (P9)."""
    from pyspark.sql import functions as F

    from slow_tortoise_spark.schema import MAX_TIMESTAMP_MS

    cube = spark.read.parquet(base_cube_path)
    staged = cube.withColumn(
        "timestamp",
        F.when(F.col("timestamp") % 7 == 0, None)
        .when(F.col("timestamp") % 11 == 0, F.lit(MAX_TIMESTAMP_MS + 1))
        .otherwise(F.col("timestamp")),
    )
    path = f"{out_root}/_invalid_ts.parquet"
    staged.write.mode("overwrite").parquet(path)
    return path


def _regionless_cube(spark, base_cube_path: str, out_root: str) -> str:
    """Stage a cube with NO region columns (reference set 12: datasets
    that ship only lat/lng) — regional families must degrade gracefully
    while global timeseries and tiles still run."""
    cube = spark.read.parquet(base_cube_path)
    path = f"{out_root}/_regionless.parquet"
    cube.drop("country", "admin1").write.mode("overwrite").parquet(path)
    return path


def _sharded_cube_files(spark, base_cube_path: str, out_root: str) -> list[str]:
    """Stage the cube as THREE same-schema parquet shards totalling ~30K
    rows (reference set 9: a 30K-record indicator split across 3 files —
    the multi-file read path with NO schema drift). Each shard is the
    base cube day-shifted so rows stay distinct across shards."""
    from pyspark.sql import functions as F

    cube = spark.read.parquet(base_cube_path)
    paths = []
    for i in range(3):
        shard = cube.withColumn(
            "timestamp", F.col("timestamp") + F.lit(i * 86_400_000)
        )
        p = f"{out_root}/_shard_{i}.parquet"
        shard.write.mode("overwrite").parquet(p)
        paths.append(p)
    return paths


def parameter_sets(data_path: str, dest_root: str) -> list[PipelineParams]:
    """Mirrors the reference's run_flow_local.py parameter-set shapes."""
    return [
        # 0: full run incl. tiling (reference set 0: geo-test-data)
        PipelineParams(
            data_id="geo-test-data",
            run_id="test-run-1",
            data_paths=[data_path],
            dest_root=dest_root,
            time_resolutions=("month",),
        ),
        # 1: selected output tasks only — a PROPER subset (tiles and
        # regional timeseries left out) so this set exercises the
        # partial-run gating: results.json must NOT be written.
        PipelineParams(
            data_id="geo-test-data",
            run_id="selected-tasks",
            data_paths=[data_path],
            dest_root=dest_root,
            time_resolutions=("month",),
            selected_output_tasks=(
                "compute_global_timeseries",
                "compute_regional_stats",
                "compute_regional_aggregation",
            ),
        ),
        # 2: weighted run (reference's acled-style weight_column sets)
        PipelineParams(
            data_id="weighted-test",
            run_id="weighted-run-1",
            data_paths=[data_path],
            dest_root=dest_root,
            weight_column="w",
            time_resolutions=("month",),
            compute_tiles=False,
        ),
        # 3: qualifier thresholds (reference set 3: qualifier_thresholds)
        PipelineParams(
            data_id="qualifier-test",
            run_id="threshold-run-1",
            data_paths=[data_path],
            dest_root=dest_root,
            qualifier_max_count=3,
            regional_timeseries_count=2,
            time_resolutions=("month",),
            compute_tiles=False,
        ),
    ]


def main() -> int:
    idx = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    dest_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/slow_tortoise_local"
    spark = get_spark(app_name="run_flow_local")
    if idx in (6, 7, 8, 9, 11, 12):
        # Reference parity sets beyond the 0-5 core (run_flow_local.py
        # sets 3/4 drift, 5 invalid-ts, 8 weighted-selected, 9 30K-row
        # multi-file indicator, 11 raw-threshold, 12 regionless).
        base = _datacube_from_events(
            spark, TESTDATA, f"{dest_root}/_staged_cube.parquet"
        )
        if idx == 6:  # multi-file schema drift (harmonized union read)
            params = PipelineParams(
                data_id="drift-test",
                run_id="multi-file-1",
                data_paths=_drifted_cube_files(spark, base, dest_root),
                dest_root=dest_root,
                time_resolutions=("month",),
                compute_tiles=False,
            )
        elif idx == 7:  # invalid timestamps + fill_timestamp=0
            params = PipelineParams(
                data_id="invalid-ts-test",
                run_id="fill-ts-1",
                data_paths=[_invalid_ts_cube(spark, base, dest_root)],
                dest_root=dest_root,
                fill_timestamp=0,
                time_resolutions=("month",),
                compute_tiles=False,
            )
        elif idx == 8:  # raw_count_threshold gating (reference set 11)
            params = PipelineParams(
                data_id="raw-threshold-test",
                run_id="raw-gate-1",
                data_paths=[base],
                dest_root=dest_root,
                raw_count_threshold=0,
                time_resolutions=("month",),
                compute_tiles=False,
            )
        elif idx == 9:  # no region columns at all (reference set 12)
            params = PipelineParams(
                data_id="regionless-test",
                run_id="no-regions-1",
                data_paths=[_regionless_cube(spark, base, dest_root)],
                dest_root=dest_root,
                time_resolutions=("month",),
            )
        elif idx == 11:
            # weighted run with a selected-task subset (reference set 8:
            # weight_column=HAREA_TOT + the four non-tile output tasks —
            # weighted avgs flow through every family, tiles skipped, and
            # the partial-run gate withholds results.json).
            params = PipelineParams(
                data_id="weighted-selected-test",
                run_id="weighted-selected-1",
                data_paths=[base],
                dest_root=dest_root,
                weight_column="w",
                time_resolutions=("month",),
                selected_output_tasks=(
                    "compute_global_timeseries",
                    "compute_regional_stats",
                    "compute_regional_timeseries",
                    "compute_regional_aggregation",
                ),
            )
        else:  # 12: multi-file indicator at ~30K records (reference set 9)
            base10 = _datacube_from_events(
                spark, "/root/testdata/sf0.01",
                f"{dest_root}/_staged_cube_10k.parquet",
            )
            params = PipelineParams(
                data_id="indicator-30k-test",
                run_id="indicator",
                data_paths=_sharded_cube_files(spark, base10, dest_root),
                dest_root=dest_root,
                fill_timestamp=0,
                time_resolutions=("month",),
                compute_tiles=False,
            )
        results = run_pipeline(spark, params)
        print({k: v for k, v in results.items() if k != "output_agg_values"})
        return 0
    if idx == 14:
        # media curation flagship: synthesize a directory of PNGs (with
        # planted exact and near duplicates) + a stray WAV, ingest via
        # the binaryFile source, and run the media pipeline's two dedup
        # tiers (sha exact + hyperplane-LSH near) end-to-end.
        import struct
        import zlib

        import numpy as np
        from pyspark.sql import functions as F

        from slow_tortoise_spark.media_pipeline import (
            MediaParams,
            run_media_pipeline,
        )
        from slow_tortoise_spark.sources.media import read_media_dir

        def chunk(ctype, data):
            body = ctype + data
            return (struct.pack(">I", len(data)) + body
                    + struct.pack(">I", zlib.crc32(body)))

        def png_of(px):
            h, wb = px.shape
            raw = b"".join(b"\x00" + bytes(int(v) for v in px[y])
                           for y in range(h))
            return (b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR",
                            struct.pack(">IIBBBBB", wb // 3, h, 8, 2, 0, 0, 0))
                    + chunk(b"IDAT", zlib.compress(raw))
                    + chunk(b"IEND", b""))

        import os

        src_dir = f"{dest_root}/media_incoming"
        os.makedirs(src_dir, exist_ok=True)
        rng = np.random.default_rng(7)
        base = rng.integers(0, 256, size=(16, 48), dtype="uint8")
        near = base.copy()
        near[0, :6] = (near[0, :6].astype(int) + 5) % 256
        blobs = {"img_000.png": png_of(base),
                 "img_copy.png": png_of(base),
                 "img_near.png": png_of(near)}
        for i in range(12):
            # distinct brightness bands per image: luma HISTOGRAMS must
            # differ (uniform noise would make every histogram flat and
            # near-identical in feature space — a correct near-match,
            # but a useless demo)
            lo = (i * 19) % 196
            blobs[f"img_{i + 1:03d}.png"] = png_of(
                rng.integers(lo, lo + 60, size=(16, 48), dtype="uint8"))
        blobs["stray.wav"] = b"RIFF\x00\x00\x00\x00WAVEjunk"
        for name, data in blobs.items():
            with open(f"{src_dir}/{name}", "wb") as fh:
                fh.write(data)

        media = read_media_dir(spark, src_dir)
        manifest = run_media_pipeline(
            spark,
            media.filter(F.col("kind") == "image"),
            MediaParams(out_dir=f"{dest_root}/media-curated",
                        dedup="lsh", near_dup_threshold=0.98),
        )
        print(manifest)
        return 0
    if idx == 13:
        # curation v3: EVERY optional stage at once — NFC normalization,
        # blocklist, line dedup, span dedup, learned logistic gate,
        # MinHash near-dedup, Bloom decontamination against a held-out
        # benchmark slice, DSIR importance selection toward the src0
        # slice, and temperature mixing — the full training-data
        # flagship run.  (The Gopher gate stays off HERE only because
        # the synthetic vocabulary lacks the rule set's required stop
        # words — every doc would fail bit 6 by construction; the gate
        # is e2e-covered on realistic text in test_corpus_pipeline.)
        from pyspark.sql import functions as F

        from slow_tortoise_spark.corpus_pipeline import (
            CorpusParams,
            run_corpus_pipeline,
        )
        from slow_tortoise_spark.sources.reader import read_table

        docs = read_table(spark, f"{TESTDATA}/documents.parquet").select(
            "doc_id", "text", "source"
        )
        bench = docs.filter("doc_id % 25 = 0").select("doc_id", "text")
        corpus = docs.filter("doc_id % 25 != 0")
        staged = corpus.select(
            "doc_id",
            F.concat(
                F.lit("Subscribe to our newsletter!\n"),
                F.col("text"),
                F.when(
                    F.col("doc_id") % 10 == 0,
                    F.lit("\nvisit http://spam.example.net/deals"),
                ).otherwise(F.lit("")),
            ).alias("text"),
            "source",
        )
        manifest = run_corpus_pipeline(
            spark,
            staged,
            CorpusParams(
                out_dir=f"{dest_root}/corpus-curated-v2",
                blocklist_domains=("spam.example.net",),
                line_dedup_min_docs=2,
                span_dedup_ngram=10,
                model_gate_weights=(0.0, -40.0, 0.0, 0.0, 0.0, 4.0),
                decontaminate_against=bench,
                normalize_form="NFC",
                dsir_target=corpus.filter("source = 'src0'").select(
                    "doc_id", "text"
                ),
                dsir_keep_fraction=0.8,
                ppl_lm_reference=corpus.select("doc_id", "text"),
                mix_budget=300.0,
                # export stage: hash-shuffled concat-and-chunk packing
                # manifest per split — curated corpus to training-ready
                # sequence map in the same run
                pack_max_tokens=256,
                pack_n_buckets=8,
            ),
        )
        print(manifest)
        return 0
    if idx == 10:
        # corpus pipeline with the round-4 curation stages: every 10th
        # doc cites a blocklisted domain (dropped whole), every doc
        # carries a shared banner line (stripped as boilerplate).
        from pyspark.sql import functions as F

        from slow_tortoise_spark.corpus_pipeline import (
            CorpusParams,
            run_corpus_pipeline,
        )
        from slow_tortoise_spark.sources.reader import read_table

        docs = read_table(spark, f"{TESTDATA}/documents.parquet").select(
            "doc_id", "text", "source"
        )
        did = F.col("doc_id")
        staged = docs.select(
            "doc_id",
            F.concat(
                F.lit("Subscribe to our newsletter!\n"),
                F.col("text"),
                F.when(
                    did % 10 == 0,
                    F.lit("\nvisit http://spam.example.net/deals"),
                ).otherwise(F.lit("")),
            ).alias("text"),
            "source",
        )
        manifest = run_corpus_pipeline(
            spark,
            staged,
            CorpusParams(
                out_dir=f"{dest_root}/corpus-curated-run",
                blocklist_domains=("spam.example.net",),
                line_dedup_min_docs=2,
            ),
        )
        print(manifest)
        return 0
    if idx in (4, 5):
        # training-data corpus pipeline over the documents table;
        # set 5 adds the temperature-mixing stage (α=0.5, half the
        # post-dedup rows as budget — exercises the optional stage +
        # after_mix manifest entry)
        from slow_tortoise_spark.corpus_pipeline import (
            CorpusParams,
            run_corpus_pipeline,
        )
        from slow_tortoise_spark.sources.reader import read_table

        docs = read_table(spark, f"{TESTDATA}/documents.parquet").select(
            "doc_id", "text", "source"
        )
        params = (
            CorpusParams(out_dir=f"{dest_root}/corpus-run")
            if idx == 4
            else CorpusParams(
                out_dir=f"{dest_root}/corpus-mixed-run",
                mix_budget=docs.count() / 2.0,
            )
        )
        manifest = run_corpus_pipeline(spark, docs, params)
        print(manifest)
        return 0
    data_path = _datacube_from_events(
        spark, TESTDATA, f"{dest_root}/_staged_cube.parquet"
    )
    params = parameter_sets(data_path, dest_root)[idx]
    results = run_pipeline(spark, params)
    print({k: v for k, v in results.items() if k != "output_agg_values"})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
