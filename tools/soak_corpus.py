"""Scale soak for the curation DAG (round-5 verdict item 6).

Runs ``run_corpus_pipeline`` with EVERY optional stage enabled (the
run_local set-13 shape: blocklist → line dedup → span dedup → learned
model gate → NFC normalize → minhash near-dedup → Bloom decontamination
→ DSIR selection → splits → temperature mix) over a corpus ~10× the
sf0.1 documents table, built by unioning salted copies (each copy gets
a distinct doc_id range and a per-copy text perturbation so dedup tiers
see realistic near-duplicate structure instead of 10 exact clones of
everything).

What this exercises that the e2e tests don't: lineage depth × data
volume together — the plan-explosion and cache-memory paths.  A
background thread samples executor storage memory so the manifest
records PEAK storage, not just the end state (which the unpersist
contract drives back to ~0).

Usage: python tools/soak_corpus.py [copies] [sf_dir] [--checkpoint-mode local|parquet]
Writes /tmp/soak_corpus_out/, prints one JSON summary line (also
recorded in SCALE.md).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    ckpt_mode = "local"
    if "--checkpoint-mode" in args:
        i = args.index("--checkpoint-mode")
        ckpt_mode = args[i + 1]
        del args[i:i + 2]
    # Optional: exercise the round-13 budget-capped selection stage at
    # soak scale.  OFF by default so the default soak's stage counts
    # stay comparable with the r8–r12 records (identity fields).
    token_budget = None
    if "--token-budget" in args:
        i = args.index("--token-budget")
        token_budget = int(args[i + 1])
        del args[i:i + 2]
    # Per-source dict budget ("src0=40000,src1=20000") — the
    # token_budget_mix path through the pipeline's budget stage
    # (round-14 soak datapoint; sources not named are DROPPED).
    if "--token-budget-dict" in args:
        i = args.index("--token-budget-dict")
        token_budget = {
            k: int(v)
            for k, v in (kv.split("=") for kv in args[i + 1].split(","))
        }
        del args[i:i + 2]
    # Packing regime for the export stage (round-14): "nosplit" soaks
    # the next-fit applyInPandas path at scale.
    pack_style = "chunk"
    if "--pack-style" in args:
        i = args.index("--pack-style")
        pack_style = args[i + 1]
        del args[i:i + 2]
    copies = int(args[0]) if len(args) > 0 else 10
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from slow_tortoise_spark.corpus_pipeline import (
        CorpusParams,
        run_corpus_pipeline,
    )
    from slow_tortoise_spark.session import get_spark
    from slow_tortoise_spark.sources.reader import read_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Shuffle partitions scale WITH the soak factor (then AQE coalesces
    # what turns out small): at 100x, 32 partitions put ~1M exploded
    # span/line rows in each task and the single-JVM heap OOMs at the
    # gate checkpoint — exactly the partition-sizing rule SCALE.md
    # prescribes for real clusters, applied to the soak harness.  The
    # heap default also rises for this one-JVM 100x case (a cluster
    # would spread the same partitions over many executors).
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark(app_name="soak_corpus", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 2 * copies))

    base = read_table(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "source"
    )
    n_base = base.count()

    # N salted copies.  Each copy substitutes the alphabet through its
    # own SEEDED PERMUTATION (translate is a cheap per-copy bijection),
    # so copies are DISTINCT documents to the span/line dedup tiers — a
    # first attempt that only prefixed a copy tag left every 10-gram
    # duplicated 10×, span dedup removed ~all text, and the whole
    # corpus gated out (a useful robustness find, now handled in
    # run_corpus_pipeline, but an empty soak exercises nothing).  A
    # second attempt used Caesar shifts — only 26 distinct bijections,
    # so the 100-copy soak made copies i and i+26 byte-IDENTICAL,
    # line-dedup (shared-by-≥2) stripped every line of every doc, and
    # the whole corpus again gated to zero (the pipeline handled it
    # gracefully; the soak measured nothing downstream).  Seeded
    # permutations give 26! distinct bijections — any copy count stays
    # distinct.  Within each copy the base corpus's own duplicate
    # structure survives, so dedup tiers still do real work.
    import random

    alpha = "abcdefghijklmnopqrstuvwxyz"
    parts = []
    for i in range(copies):
        letters = list(alpha)
        random.Random(i).shuffle(letters)
        perm = "".join(letters)
        c = base.select(
            (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
            (F.translate(F.col("text"), alpha, perm)
             if i else F.col("text")).alias("text"),
            "source",
        )
        parts.append(c)
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)

    bench = base.filter("doc_id % 25 = 0").select("doc_id", "text")
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

    # Peak storage-memory sampler (the unpersist contract empties storage
    # by the end — the peak is the number that matters for sizing).
    jsc = spark.sparkContext._jsc.sc()
    peak = {"bytes": 0, "rdds": 0}
    stop = threading.Event()

    def sample():
        while not stop.is_set():
            infos = jsc.getRDDStorageInfo()
            used = sum(i.memSize() for i in infos)
            if used > peak["bytes"]:
                peak["bytes"] = used
                peak["rdds"] = len(infos)
            time.sleep(1.0)

    t = threading.Thread(target=sample, daemon=True)
    t.start()

    out_dir = "/tmp/soak_corpus_out"
    t0 = time.time()
    manifest = run_corpus_pipeline(
        spark,
        staged,
        CorpusParams(
            out_dir=out_dir,
            blocklist_domains=("spam.example.net",),
            line_dedup_min_docs=2,
            span_dedup_ngram=10,
            model_gate_weights=(0.0, -40.0, 0.0, 0.0, 0.0, 4.0),
            decontaminate_against=bench,
            normalize_form="NFC",
            dsir_target=base.filter("source = 'src0'").select(
                "doc_id", "text"
            ),
            dsir_keep_fraction=0.8,
            ppl_lm_reference=base.select("doc_id", "text"),
            mix_budget=float(n_base * copies) * 0.06,
            token_budget=token_budget,
            checkpoint_mode=ckpt_mode,
            # export stage (round 12): curated corpus straight to the
            # per-split training-sequence packing manifest — the soak
            # now exercises the pipeline end to end INCLUDING the
            # loader-facing artifact
            pack_max_tokens=2048,
            pack_n_buckets=64,
            pack_style=pack_style,
        ),
    )
    wall = time.time() - t0
    stop.set()
    t.join(timeout=3)

    residual = sum(i.memSize() for i in jsc.getRDDStorageInfo())
    summary = {
        "input_docs": n_base * copies,
        "copies": copies,
        "checkpoint_mode": ckpt_mode,
        "wall_sec": round(wall, 1),
        "peak_storage_mb": round(peak["bytes"] / 1048576, 1),
        "peak_cached_rdds": peak["rdds"],
        "residual_storage_mb": round(residual / 1048576, 2),
        "output_docs": manifest.get("output_docs"),
        "packing": manifest.get("packing"),
        "stage_counts": {k: v for k, v in manifest.items()
                         if isinstance(v, (int, float))},
        "stage_seconds": manifest.get("stage_seconds", {}),
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
