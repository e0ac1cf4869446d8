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


def harmonic_centrality(
    edges: DataFrame,
    radius: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, harmonic) — truncated harmonic centrality
    H_R(v) = Σ_{1 ≤ r ≤ R} |{u : d(u→v) = r}| / r, the other
    curation-standard link score next to :func:`pagerank` (it rewards
    being NEAR many nodes rather than being linked BY important ones,
    and handles disconnected graphs without PageRank's teleport).

    Exact bounded-radius multi-source BFS on the REVERSED edges: the
    frontier frame holds (v, u) pairs meaning d(u→v) = r; each round is
    ONE join of the frontier onto the edge list by ``u = dst`` + a
    distinct + an anti-join against the visited set (first sighting =
    shortest distance), checkpointed with the previous visited freed —
    the CC-loop / pagerank skeleton, O(1) live rounds.  State is the
    visited pair set (Σ over nodes of ball(v, R) sizes): that is the
    exact algorithm's inherent price, which the radius bounds.  For
    UNBOUNDED radius at web scale the standard answer is the HyperBall
    sketch construction (Boldi & Vigna, "In-Core Computation of
    Geometric Centralities with HyperBall", 2013) — approximate
    per-node ball sizes via merged HLL registers; this operator keeps
    the exact semantics a SQL oracle can replay round by round.

    Conventions: edge multiplicity and self-loops are ignored (distance
    is a simple-graph notion); nodes = distinct endpoints; unreached
    pairs contribute 0.  Floats: harmonic is assembled in FIXED round
    order — 0.0 + d₁/1 + d₂/2 + … + d_R/R over per-round integer counts
    — so an engine replaying the identical expression matches bitwise
    (each dᵣ/r is one IEEE division, the fold order is written down).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .cache()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    visited = tracked_local_checkpoint(
        nodes.select(F.col("node").alias("v"), F.col("node").alias("u"))
    )
    frontier = visited  # distance-0 pairs seed the expansion
    frontiers: list[DataFrame] = []  # kept live: the count frames read them
    for _ in range(radius):
        nxt = (
            frontier.join(e, frontier["u"] == e["dst"])
            .select(frontier["v"].alias("v"), e["src"].alias("u"))
            .distinct()
        )
        frontier = tracked_local_checkpoint(
            nxt.join(visited, ["v", "u"], "left_anti")
        )
        frontiers.append(frontier)
        new_visited = tracked_local_checkpoint(
            visited.unionByName(frontier)
        )
        free_local_checkpoint(visited)
        visited = new_visited
    out = nodes
    harmonic = F.lit(0.0)
    for r, fr in enumerate(frontiers, start=1):
        cnt = fr.groupBy("v").agg(F.count(F.lit(1)).alias(f"_d{r}"))
        out = out.join(cnt, out["node"] == cnt["v"], "left").drop("v")
        harmonic = harmonic + (
            F.coalesce(F.col(f"_d{r}"), F.lit(0)).cast("double")
            / F.lit(float(r))
        )
    result = tracked_local_checkpoint(
        out.select("node", harmonic.alias("harmonic"))
    )
    for fr in frontiers:
        free_local_checkpoint(fr)
    free_local_checkpoint(visited)
    e.unpersist()
    nodes.unpersist()
    return result
