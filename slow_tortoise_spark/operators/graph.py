"""Link-analysis operators over edge-list DataFrames.

Web-corpus curation ranks hosts before it ranks documents: CCNet-style
pipelines gate crawl data on a link-graph centrality score (PageRank /
harmonic centrality over the host graph) long before any text model
sees a byte.  This module gives that tier the same treatment as the
rest of the engine: pure DataFrame power iteration, per-round
checkpoints through the cachectl registry, and a deterministic
convention a SQL oracle can replay round by round.

Reference scope note: the reference pipeline (uncharted-causemos/
slow-tortoise) has no graph tier — this is part of the LLM-training
extension surface, same as the dedup/similarity families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from slow_tortoise_spark.operators.cachectl import (
    free_local_checkpoint,
    tracked_local_checkpoint,
)


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank) after ``iters`` PageRank power iterations.

    Conventions (all replayable in SQL):

    * Edge multiplicity counts — a node linking twice sends twice the
      share.  Callers wanting a simple graph pass ``edges.distinct()``.
    * Nodes = distinct endpoints of either side.
    * r₀ = 1/N; each round
      r'(v) = (1−d)/N + d·(Σ_{u→v} r(u)/outdeg(u) + dangling/N),
      where ``dangling`` is the summed rank of nodes with no out-edges
      (their mass redistributes uniformly — the standard fix; without
      it rank leaks every round).

    Shape per round: ONE shuffle joining ranks onto the edge list by
    source + ONE partially-aggregated groupBy on destination, both over
    frames the size of the RANK/EDGE sets (never a corpus scan); the
    dangling mass is a single-value action (the nature of iterative
    algorithms on Spark — same as the CC loop's convergence count); the
    round result is checkpointed and the previous round freed, so
    lineage and storage stay O(1) in ``iters``.  The edge/out-degree
    frames are cached across rounds.

    Floats: ranks are binary64 sums whose accumulation order differs
    across engines — consumers wanting engine-exact comparison round to
    micros (the verifier row does).
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).cache()
    deg = e.groupBy("src").agg(F.count("*").alias("_d")).cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    if n == 0:
        out = nodes.withColumn("rank", F.lit(0.0))
        # the early return must not leak the three (empty) caches
        e.unpersist()
        deg.unpersist()
        nodes.unpersist()
        return out

    ranks = tracked_local_checkpoint(
        nodes.withColumn("rank", F.lit(1.0 / n))
    )
    for _ in range(iters):
        dangling = (
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("s"))
            .first()["s"]
        )
        contrib = (
            e.join(deg, "src")
            .join(
                ranks.select(F.col("node").alias("src"),
                             F.col("rank").alias("_r")),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum(F.col("_r") / F.col("_d")).alias("_c"))
        )
        new_ranks = tracked_local_checkpoint(
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_c"), F.lit(0.0))
                       + F.lit(float(dangling) / n))
                ).alias("rank"),
            )
        )
        free_local_checkpoint(ranks)
        ranks = new_ranks
    e.unpersist()
    deg.unpersist()
    nodes.unpersist()
    return ranks
