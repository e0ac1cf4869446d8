"""ANN scale soak — the similarity-tier counterpart of soak_media.py.

Generates N clustered 64-dim float32 vectors EXECUTOR-SIDE (deterministic
per (vec_id, dim): every component is an xxhash64 mix, cluster centers
are hash-derived, so any two runs and any partitioning produce the same
corpus), builds a persisted IVFADC index (IVF cells × residual-PQ codes,
cell-partitioned parquet), and measures at scale:

* build wall (IVF k-means + residual PQ train + encode + write),
* query wall: brute-force cosine top-10 over the raw float corpus vs
  ivfpq_topk_from_path at two nprobe settings,
* recall@10 of IVFPQ against the brute-force ranking (mean over Q
  query vectors),
* bytes: raw-vector parquet vs code-only index parquet on disk.

The recall number is an honest small-code report (m=8 subspaces ×
ksub=16 codes is 8 B/vector — 32× compression vs float32), not a tuned
benchmark; the soak's job is proving wall/bytes scale shape: the
IVFPQ scan must read ~nprobe/C of the FILES (PartitionFilters) at
~1/32 the bytes per row, while build cost stays linear in N.

Usage: python tools/soak_ann.py [n_vectors] [n_cells] [queries]
Prints one JSON summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
N_CLUSTERS = 100


def _dir_mb(path: str) -> float:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return round(total / 1e6, 2)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_cells = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_queries = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from pyspark.sql import functions as F

    from slow_tortoise_spark.operators.similarity import (
        brute_force_topk,
        ivfpq_build,
        ivfpq_rerank_topk,
        ivfpq_topk,
        read_ivfpq_index,
        write_ivfpq_index,
    )
    from slow_tortoise_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="soak_ann_")
    raw_path = os.path.join(work, "raw")
    idx_path = os.path.join(work, "ivfpq")

    # --- corpus: cluster center + noise, every term a deterministic
    # hash mix in [-0.5, 0.5); centers dominate (×4) so nearest
    # neighbors are genuinely intra-cluster ---------------------------
    def _unit(*cols):
        return (F.pmod(F.xxhash64(*cols), F.lit(100_000)) / 1e5) - 0.5

    ids = spark.range(n).repartition(64).withColumn(
        "cl", F.pmod(F.col("id"), F.lit(N_CLUSTERS))
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda d: (
            _unit(F.lit("center"), F.col("cl"), d) * F.lit(4.0)
            + _unit(F.lit("noise"), F.col("id"), d)
        ).cast("float"),
    )
    t0 = time.time()
    ids.select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    ).write.mode("overwrite").parquet(raw_path)
    gen_s = round(time.time() - t0, 1)

    emb = spark.read.parquet(raw_path)

    # --- build + persist the IVFADC index ----------------------------
    t0 = time.time()
    enc, cents, books = ivfpq_build(
        emb, n_cells=n_cells, kmeans_iters=1, m=8, ksub=256, pq_iters=1
    )
    write_ivfpq_index(enc, cents, books, idx_path)
    build_s = round(time.time() - t0, 1)

    # load ONCE (sidecar parse + file listing amortized across queries —
    # the per-query cost below is the marginal scan, which is what a
    # serving layer pays)
    idx, icents, ibooks = read_ivfpq_index(spark, idx_path)

    # --- queries: the first vector of every  n//n_queries stride ------
    qids = [i * (n // n_queries) for i in range(n_queries)]
    qvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }

    def timed(fn):
        t = time.time()
        out = fn()
        return out, time.time() - t

    bf_wall = 0.0
    ivf_wall = {4: 0.0, 16: 0.0}
    recall = {4: 0, 16: 0}
    precision = {4: 0, 16: 0}  # same-cluster fraction of returned ids
    # production-shape two-stage retrieval: ADC proposes RERANK
    # candidates (past the 4096-literal threshold, so this exercises
    # the broadcast semi-join dispatch), exact cosine re-ranks them
    RERANK = 10_000
    rr_wall = 0.0
    rr_recall = 0
    for qid in qids:
        q = qvecs[qid]
        exact, w = timed(
            lambda: [r["vec_id"]
                     for r in brute_force_topk(emb, q, k=10).collect()]
        )
        bf_wall += w
        for nprobe in (4, 16):
            approx, w = timed(
                lambda: [r["vec_id"] for r in ivfpq_topk(
                    idx, icents, ibooks, q, k=10, nprobe=nprobe).collect()]
            )
            ivf_wall[nprobe] += w
            recall[nprobe] += len(set(exact) & set(approx))
            precision[nprobe] += sum(
                1 for i in approx if i % N_CLUSTERS == qid % N_CLUSTERS
            )
        rr, w = timed(
            lambda: [r["vec_id"] for r in ivfpq_rerank_topk(
                emb, idx, icents, ibooks, q,
                k=10, nprobe=16, rerank=RERANK).collect()]
        )
        rr_wall += w
        rr_recall += len(set(exact) & set(rr))

    out = {
        "soak": "ann_ivfpq",
        "n_vectors": n,
        "dim": DIM,
        "n_cells": n_cells,
        "pq": {"m": 8, "ksub": 256},
        "gen_s": gen_s,
        "build_s": build_s,
        "raw_mb": _dir_mb(raw_path),
        "index_mb": _dir_mb(idx_path),
        "queries": n_queries,
        "brute_force_s_per_q": round(bf_wall / n_queries, 3),
        "ivfpq_s_per_q": {
            str(p): round(w / n_queries, 3) for p, w in ivf_wall.items()
        },
        "recall_at_10": {
            str(p): round(r / (10 * n_queries), 3)
            for p, r in recall.items()
        },
        # recall@10 on this corpus is bounded by within-cluster
        # exchangeability (the ~N/100 cluster members differ only by
        # noise, so exact-vs-quantized top-10 overlap is low even when
        # every returned vector is a true near neighbor); cluster
        # precision is the useful-retrieval metric
        "cluster_precision_at_10": {
            str(p): round(r / (10 * n_queries), 3)
            for p, r in precision.items()
        },
        "rerank": RERANK,
        "rerank_s_per_q": round(rr_wall / n_queries, 3),
        "rerank_recall_at_10": round(rr_recall / (10 * n_queries), 3),
    }
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
