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


def _symmetrized_simple(
    edges: DataFrame, src_col: str, dst_col: str
) -> DataFrame:
    """The UNDIRECTED SIMPLE adjacency every degree-based operator
    shares (k_core / core_number / label_propagation /
    triangle_counts): self-loops dropped, both directions emitted,
    duplicates collapsed.  One definition so the operators documented
    to share these semantics can never desync; callers apply their own
    cache/checkpoint."""
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    return sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def _edge_weight(weight_col: str):
    """Edge weight as double with a loud NULL guard: F.sum silently
    SKIPS nulls, so a null weight would mark its source non-dangling
    while sending less than full rank — mass leaks with no error.
    Fail the job at the first null instead (zero/negative weights
    remain the caller's documented contract)."""
    w = F.col(weight_col).cast("double")
    return F.when(
        w.isNull(),
        F.raise_error(F.lit(
            "graph: NULL edge weight (weights must be strictly "
            "positive and non-null)"
        )),
    ).otherwise(w)


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """(node, rank) after ``iters`` PageRank power iterations.

    Conventions (all replayable in SQL):

    * Edge multiplicity counts — a node linking twice sends twice the
      share.  Callers wanting a simple graph pass ``edges.distinct()``.
    * ``weight_col`` names an optional STRICTLY POSITIVE edge weight —
      the real host-graph shape, where an edge carries its link count
      instead of being replicated: each round u sends r(u)·w(u→v)/W(u)
      along u→v, W(u) = Σ of u's out-weights.  Replicating an edge n
      times and weighting it n are the same distribution (pinned by
      property test, equal to float tolerance — n additions of r/d vs
      one r·n/d differ in accumulation only).  Zero/negative weights
      are the caller's bug: w = 0 still marks the source non-dangling
      while sending nothing, leaking rank by construction.
    * Nodes = distinct endpoints of either side.
    * r₀ = 1/N; each round
      r'(v) = (1−d)/N + d·(Σ_{u→v} r(u)·w/W(u) + dangling/N),
      where ``dangling`` is the summed rank of nodes with no out-edges
      (their mass redistributes uniformly — the standard fix; without
      it rank leaks every round).

    Shape per round: ONE shuffle joining ranks onto the edge list by
    source + ONE partially-aggregated groupBy on destination, both over
    frames the size of the RANK/EDGE sets (never a corpus scan); the
    dangling mass is a single-value action (the nature of iterative
    algorithms on Spark — same as the CC loop's convergence count); the
    round result is checkpointed and the previous round freed, so
    lineage and storage stay O(1) in ``iters``.  Two costs are hoisted
    OUT of the loop (r15, guide §2.4/§1.2 — they were paid per round):
    the edge⋈out-degree attach is loop-invariant, so the loop joins
    ranks onto ONE cached (src, dst, degree) frame instead of
    re-joining deg every round; and the dangling-node SET is
    loop-invariant, so each round's dangling mass is a filter+sum scan
    over the already-materialized rank checkpoint (a ``_dang`` flag
    carried on the node frame) instead of a per-round anti-join.  The
    per-term share arithmetic (``r/d``, ``r·w/d``) is unchanged — only
    join placement moved, so every summand the oracle replays is the
    identical IEEE operation.  The weighted path adds one double column
    to the edge cache and nothing else — same joins, same aggregates,
    same exchange count.

    Floats: ranks are binary64 sums whose accumulation order differs
    across engines — consumers wanting engine-exact comparison round to
    micros (the verifier row does).
    """
    cols = [F.col(src_col).alias("src"), F.col(dst_col).alias("dst")]
    if weight_col is not None:
        cols.append(_edge_weight(weight_col).alias("_w"))
    e = edges.select(*cols).cache()
    deg = e.groupBy("src").agg(
        (F.count("*") if weight_col is None else F.sum("_w")).alias("_d")
    ).cache()
    # loop-invariant: the edge list with its source's out-degree
    # attached ONCE (previously re-joined every round)
    ed = e.join(deg, "src").cache()
    # loop-invariant: which nodes are dangling (no out-edges) — carried
    # as a flag so each round's dangling mass is a scan of the
    # materialized rank checkpoint, not an anti-join job
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(deg.select(F.col("src").alias("node"),
                         F.lit(False).alias("_dang")),
              "node", "left")
        .select("node", F.coalesce(F.col("_dang"), F.lit(True))
                .alias("_dang"))
        .cache()
    )
    n = nodes.count()
    if n == 0:
        out = nodes.select("node").withColumn("rank", F.lit(0.0))
        # the early return must not leak the four (empty) caches
        e.unpersist()
        deg.unpersist()
        ed.unpersist()
        nodes.unpersist()
        return out

    ranks = tracked_local_checkpoint(
        nodes.withColumn("rank", F.lit(1.0 / n))
    )
    for _ in range(iters):
        dangling = (
            ranks.filter(F.col("_dang"))
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("s"))
            .first()["s"]
        )
        share = (
            F.col("_r") / F.col("_d") if weight_col is None
            else F.col("_r") * F.col("_w") / F.col("_d")
        )
        contrib = (
            ed.join(
                ranks.select(F.col("node").alias("src"),
                             F.col("rank").alias("_r")),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum(share).alias("_c"))
        )
        new_ranks = tracked_local_checkpoint(
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                "_dang",
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
    ed.unpersist()
    nodes.unpersist()
    return ranks.select("node", "rank")


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
    # Each round reduces its frontier to the (≤ |V|-row) per-node count
    # frame IMMEDIATELY and frees the previous big pair frame — only
    # the current frontier + current visited are ever live, not all R
    # frontiers at once (peak storage halves on dense graphs, exactly
    # where the pair set is the binding cost).
    counts: list[DataFrame] = []
    for r in range(1, radius + 1):
        nxt = (
            frontier.join(e, frontier["u"] == e["dst"])
            .select(frontier["v"].alias("v"), e["src"].alias("u"))
            .distinct()
        )
        new_frontier = tracked_local_checkpoint(
            nxt.join(visited, ["v", "u"], "left_anti")
        )
        counts.append(tracked_local_checkpoint(
            new_frontier.groupBy("v").agg(F.count(F.lit(1)).alias(f"_d{r}"))
        ))
        new_visited = tracked_local_checkpoint(
            visited.unionByName(new_frontier)
        )
        if frontier is not visited:
            free_local_checkpoint(frontier)
        free_local_checkpoint(visited)
        frontier, visited = new_frontier, new_visited
    if frontier is not visited:
        free_local_checkpoint(frontier)
    free_local_checkpoint(visited)
    out = nodes
    harmonic = F.lit(0.0)
    for r, cnt in enumerate(counts, start=1):
        out = out.join(cnt, out["node"] == cnt["v"], "left").drop("v")
        harmonic = harmonic + (
            F.coalesce(F.col(f"_d{r}"), F.lit(0)).cast("double")
            / F.lit(float(r))
        )
    result = tracked_local_checkpoint(
        out.select("node", harmonic.alias("harmonic"))
    )
    for cnt in counts:
        free_local_checkpoint(cnt)
    e.unpersist()
    nodes.unpersist()
    return result


# HyperBall constants: 16 registers (b=4) keyed by md5 nibble 1; the
# rank field reads nibbles 2-7 (24 bits), so register values live in
# [0, 25].  alpha_16 = 0.673 (Flajolet et al. 2007, Table 1).
_HB_M = 16
_HB_ALPHA = 0.673
_HB_RANK_BITS = 24

# core_number's per-step removal set is broadcast explicitly when its
# EXACT cardinality (known from the step's degree histogram — no stats
# guessing) is at most this many node ids: 1M short strings is a
# ~20-30 MB broadcast relation, safe on ordinary executors and
# strictly wider than the ~500k-row ceiling AQE's 10 MB post-shuffle
# threshold used to allow.  Above it, the cached shuffle join.
_CORE_BROADCAST_LIMIT = 1_000_000


def _hb_nibble(h, i: int):
    """Hex nibble i (1-based) of an md5 string as an int — the same
    value DuckDB's ``strpos('0123456789abcdef', substr(h, i, 1)) - 1``
    parses (the simhash oracle pattern)."""
    return F.conv(F.substring(h, i, 1), 16, 10).cast("int")


def _hb_estimate(prefix: str = ""):
    """HLL cardinality estimate over register columns ``{prefix}r0`` …
    ``{prefix}r15`` as ONE fixed-shape expression: S folds
    pow(2, -M_j) left-to-right in register order, E_raw =
    0.673 * 256.0 / S, and the small-range branch switches to linear
    counting 16·ln(16/V) when E_raw ≤ 2.5m and zero registers exist —
    the classic HyperLogLog estimator, written so a SQL engine
    replaying the identical expression text matches bit-for-bit (pow
    of 2 to integer exponents is exact; ln is the one library call,
    shared formula shape)."""
    regs = [F.col(f"{prefix}r{k}") for k in range(_HB_M)]
    s = F.lit(0.0)
    for rk in regs:
        s = s + F.pow(F.lit(2.0), -rk.cast("double"))
    v = sum(
        (F.when(rk == 0, F.lit(1)).otherwise(F.lit(0)) for rk in regs),
        start=F.lit(0),
    )
    e_raw = F.lit(_HB_ALPHA) * F.lit(256.0) / s
    return F.when(
        (e_raw <= F.lit(2.5 * _HB_M)) & (v > 0),
        F.lit(float(_HB_M)) * F.log(F.lit(float(_HB_M)) / v.cast("double")),
    ).otherwise(e_raw)


def hyperball_harmonic(
    edges: DataFrame,
    radius: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, harmonic_est) — HyperBall approximate harmonic
    centrality, the SCALE path :func:`harmonic_centrality`'s docstring
    points at (Boldi & Vigna, "In-Core Computation of Geometric
    Centralities with HyperBall", 2013).

    Where the exact operator carries the visited PAIR set (Σ ball
    sizes — quadratic on dense graphs), this one carries a fixed
    16-register HLL sketch of each node's in-ball: state is exactly
    |V| × 17 small ints regardless of density, and each round is ONE
    partially-aggregated shuffle — edges join the sketch frame on
    ``src``, route registers to ``dst``, and ``groupBy(node).max`` per
    register merges map-side (register max is algebraic, so the hot
    hub node that makes power iteration skew is combined before the
    exchange).  Per-round checkpoint + free, same as :func:`pagerank`.

    H_est(v) = Σ_r max(0, |B̂(v,r)| − |B̂(v,r−1)|)/r over the HLL ball
    estimates.  With m = 16 the per-ball standard error is
    1.04/√16 ≈ 26% — HyperBall is a RANKING instrument (hubs vs
    periphery over billions of nodes), not a counter; use the exact
    operator when the radius-bounded pair set fits.  Determinism:
    register placement hashes md5(node) nibbles (engine-portable), so
    the estimate is bit-reproducible across runs, partitionings, and
    replaying engines — max() and the fixed-order estimate fold have
    no accumulation-order freedom.
    """
    out, ests, cleanup = _hyperball_ball_estimates(
        edges, radius, src_col, dst_col
    )
    harmonic = F.lit(0.0)
    for r in range(1, radius + 1):
        harmonic = harmonic + (
            F.greatest(F.lit(0.0), F.col(f"_e{r}") - F.col(f"_e{r - 1}"))
            / F.lit(float(r))
        )
    result = tracked_local_checkpoint(
        out.select("node", harmonic.alias("harmonic_est"))
    )
    cleanup()
    return result


def _hyperball_ball_estimates(
    edges: DataFrame, radius: int, src_col: str, dst_col: str
):
    """Shared HyperBall register evolution: returns ``(out, ests,
    cleanup)`` where ``out`` is the node frame left-joined with the
    per-round ball estimates ``_e0 … _e{radius}`` (one column per
    round, the fixed-shape :func:`_hb_estimate` fold over the merged
    registers after round r), ``ests`` the per-round checkpointed
    estimate frames, and ``cleanup()`` frees them plus the edge/node
    caches once the caller has checkpointed its own fold.  Both
    geometric centralities (:func:`hyperball_harmonic`,
    :func:`hyperball_closeness`) are fixed-order folds over these same
    estimates — the register loop, the expensive part, is written
    once."""
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
    h = F.md5(F.col("node").cast("string"))
    j = _hb_nibble(h, 1)
    w = sum(
        (_hb_nibble(h, i).cast("long") * F.lit(16 ** (7 - i))
         for i in range(3, 8)),
        start=_hb_nibble(h, 2).cast("long") * F.lit(16 ** 5),
    )
    rank = F.when(w == 0, F.lit(_HB_RANK_BITS + 1)).otherwise(
        F.lit(_HB_RANK_BITS + 1) - F.length(F.bin(w))
    )
    sketches = tracked_local_checkpoint(
        nodes.select(
            "node",
            *[
                F.when(j == k, rank).otherwise(F.lit(0)).alias(f"r{k}")
                for k in range(_HB_M)
            ],
        )
    )
    # Each round reduces its sketch frame to the 2-column per-node
    # estimate IMMEDIATELY and frees the previous 17-column frame —
    # only one full register frame is ever live (same discipline as
    # the exact tier's frontier reduction).
    ests: list[DataFrame] = []
    for r in range(radius + 1):
        if r > 0:
            contrib = e.join(sketches, e["src"] == sketches["node"]).select(
                e["dst"].alias("node"), *[f"r{k}" for k in range(_HB_M)]
            )
            merged = tracked_local_checkpoint(
                sketches.unionByName(contrib)
                .groupBy("node")
                .agg(*[F.max(f"r{k}").alias(f"r{k}") for k in range(_HB_M)])
            )
            free_local_checkpoint(sketches)
            sketches = merged
        ests.append(tracked_local_checkpoint(
            sketches.select(
                F.col("node").alias("_v"), _hb_estimate().alias(f"_e{r}")
            )
        ))
    free_local_checkpoint(sketches)
    out = nodes
    for r, est in enumerate(ests):
        out = out.join(est, out["node"] == est["_v"], "left").drop("_v")

    def cleanup() -> None:
        for est in ests:
            free_local_checkpoint(est)
        e.unpersist()
        nodes.unpersist()

    return out, ests, cleanup


def hyperball_closeness(
    edges: DataFrame,
    radius: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, closeness_est) — HyperBall truncated closeness
    centrality, the second geometric centrality the HyperBall sketches
    buy for free (Boldi & Vigna 2013 compute exactly this family:
    once per-round ball estimates exist, any Σ f(r)·Δball fold is a
    map-only pass).  Where harmonic folds Σ Δ_r/r, closeness needs the
    total DISTANCE mass Σ r·Δ_r — so the two operators share the
    register loop (:func:`_hyperball_ball_estimates`, one partial-agg
    shuffle per round, |V| × 17 small-int state) and differ only in
    the final fixed-order expression:

        sumdist(v) = Σ_{1≤r≤R} r · max(0, ê_r(v) − ê_{r−1}(v))
        closeness(v) = (ê_R(v) − 1) / sumdist(v)   (0 when sumdist = 0)

    i.e. reachable-within-R divided by the summed distances to them —
    the standard truncated closeness normalization: isolated-ish nodes
    score 0 instead of dividing by zero, and a node reaching many
    nodes cheaply scores near 1.  Same determinism claim as the
    harmonic sibling: md5 register placement, max merges, and both
    folds have zero accumulation-order freedom, so a replaying engine
    matches bit for bit.
    """
    out, ests, cleanup = _hyperball_ball_estimates(
        edges, radius, src_col, dst_col
    )
    sumdist = F.lit(0.0)
    for r in range(1, radius + 1):
        sumdist = sumdist + F.lit(float(r)) * F.greatest(
            F.lit(0.0), F.col(f"_e{r}") - F.col(f"_e{r - 1}")
        )
    closeness = F.when(
        sumdist > F.lit(0.0),
        (F.col(f"_e{radius}") - F.lit(1.0)) / sumdist,
    ).otherwise(F.lit(0.0))
    result = tracked_local_checkpoint(
        out.select("node", closeness.alias("closeness_est"))
    )
    cleanup()
    return result


def label_propagation(
    edges: DataFrame,
    iters: int = 4,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """(node, label) after ``iters`` rounds of SYNCHRONOUS label
    propagation — the standard cheap community signal for host/link
    graphs (Raghavan, Albert, Kumara, "Near linear time algorithm to
    detect community structures in large-scale networks", 2007):
    mirror/doorway clusters and template farms collapse onto one
    label, which corpus curation then caps or down-weights the same
    way it caps a source domain.

    Determinism (the property that makes an independent engine replay
    exact, where classic LP is run-order chaos): updates are
    synchronous (round r reads only round r−1's labels), every node
    starts with its own id as label, and each node adopts the label
    most frequent among its neighbors with ties broken by MINIMUM
    label — no RNG, no visit order.  The graph is treated as
    UNDIRECTED and SIMPLE (symmetrized + distinct, self-loops
    dropped); label comparisons are plain string ordering.

    ``weight_col`` names an optional STRICTLY POSITIVE, NON-NULL edge
    weight: each neighbor's vote counts w instead of 1 (the real
    host-graph shape — a cluster connected by one heavy link-count
    edge should out-vote three incidental ones), a label's score is
    the SUM of the weights carrying it, and duplicate (src, dst) rows
    sum their weights during symmetrization.  Integer-valued weights
    keep the vote sums exact, so the min-tie-break replay stays
    bit-deterministic; fractional weights work but reintroduce the
    binary64 summation-order hazard the unweighted path doesn't have.

    Shape per round: ONE shuffle joining labels onto the symmetrized
    edge list by neighbor + a two-level aggregation — count per
    (node, label), then ``min(struct(-count, label))`` per node — both
    partially aggregated map-side (the argmin-by-struct avoids a
    window sort entirely: no per-partition ordering, just algebraic
    min).  Per-round checkpoint + free, O(1) live rounds — the
    :func:`pagerank` skeleton.  State is |V| × 2 strings at any
    density.  Convergence note: synchronous LP can 2-cycle on
    bipartite-ish structure, which is WHY ``iters`` is a bounded
    parameter and not a fixpoint loop — rank stability across rounds
    is the caller's check, same as pagerank's.
    """
    if weight_col is None:
        adj = _symmetrized_simple(edges, src_col, dst_col).cache()
    else:
        pairs = edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst"),
            _edge_weight(weight_col).alias("_w"),
        ).filter(F.col("src") != F.col("dst"))
        adj = (
            pairs.unionByName(
                pairs.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst"), "_w")
            )
            .groupBy("src", "dst")
            .agg(F.sum("_w").alias("_w"))
            .cache()
        )
    labels = tracked_local_checkpoint(
        adj.select(F.col("src").alias("node")).distinct()
        .select("node", F.col("node").alias("label"))
    )
    vote = F.count(F.lit(1)) if weight_col is None else F.sum("_w")
    for _ in range(iters):
        votes = (
            adj.join(
                labels.select(F.col("node").alias("src"),
                              F.col("label").alias("_l")),
                "src",
            )
            .groupBy(F.col("dst").alias("node"), F.col("_l").alias("label"))
            .agg(vote.alias("_c"))
        )
        new_labels = tracked_local_checkpoint(
            votes.groupBy("node")
            .agg(
                F.min(F.struct((-F.col("_c")).alias("_nc"), "label"))
                .getField("label")
                .alias("label")
            )
        )
        free_local_checkpoint(labels)
        labels = new_labels
    adj.unpersist()
    return labels


def k_core(
    edges: DataFrame,
    k: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, degree) of the k-core: the unique maximal subgraph in
    which every node keeps ≥ k distinct neighbors — the standard
    degeneracy-based cleanup for host/link graphs (peel leaves and
    near-leaves before computing centralities or mining communities;
    spam farms and crawl frontier fuzz live in the low cores).

    Semantics: the graph is treated as UNDIRECTED and SIMPLE (edges
    symmetrized + distinct, self-loops dropped); ``degree`` is the
    surviving distinct-neighbor count.  Peeling converges to the SAME
    subgraph regardless of removal order (the k-core is unique), which
    is what makes an independent engine replay exact: extra peeling
    rounds after the fixpoint are no-ops, so an oracle that unrolls a
    generous fixed round count matches the engine's run-to-fixpoint
    loop bit for bit.

    Shape per round: one partially-aggregated degree count + two
    anti-joins against the (≤ nodes-sized) removal set, checkpointed
    with the previous round freed (the CC-loop skeleton); the
    convergence test is one count action per round — the nature of
    iterative fixpoints on Spark.  Rounds are bounded by the longest
    peeling chain (≤ |V| worst case, tiny in practice: each round
    removes EVERY currently-underdegree node at once)."""
    adj = tracked_local_checkpoint(
        _symmetrized_simple(edges, src_col, dst_col)
    )
    while True:
        # cache + count the removal set: the degree aggregation runs
        # ONCE per round (the count materializes it; both anti-joins
        # read the cache), and the InMemoryRelation carries REAL size
        # stats so AQE still broadcasts the anti-join side when it
        # fits — a localCheckpoint here reports the default (huge)
        # size and silently demoted both anti-joins to full shuffles
        # (measured: 1.6× the round wall at 10M edges).
        bad = (
            adj.groupBy("src")
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") < k)
            .select(F.col("src").alias("_bad"))
            .cache()
        )
        n_bad = bad.count()
        if n_bad == 0:
            bad.unpersist()
            break
        new_adj = tracked_local_checkpoint(
            adj.join(bad, adj["src"] == bad["_bad"], "left_anti")
            .join(bad, adj["dst"] == bad["_bad"], "left_anti")
        )
        free_local_checkpoint(adj)
        bad.unpersist()
        adj = new_adj
    result = tracked_local_checkpoint(
        adj.groupBy(F.col("src").alias("node"))
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    free_local_checkpoint(adj)
    return result


def core_number(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, core) — every node's core NUMBER: the maximum k for which
    it survives in the k-core.  Where :func:`k_core` answers "give me
    the cleaned subgraph at threshold k", this is the full degeneracy
    decomposition — the curation-standard per-host signal (rank hosts
    by coreness, gate the crawl at a percentile) that doesn't require
    choosing k up front.

    Semantics match :func:`k_core` (UNDIRECTED, SIMPLE); the core
    number is a graph invariant — the unique value produced by ANY
    min-degree-first peeling — which is what lets an independent
    engine replay this loop step for step and also what makes the
    level-jump below safe.

    Algorithm (distributed bucket peeling): maintain the surviving
    adjacency and a threshold k.  Each step computes distinct-neighbor
    degrees ONCE (one partially-aggregated shuffle); if the minimum
    surviving degree m has risen to ≥ k, jump k to m + 1 (levels
    1..m remove nobody — skipping them is exactly the sequential
    min-degree-first order, and it peels the ENTIRE occupied level
    below the next occupied one in a single step; batching more than
    one occupied level would be WRONG, because a level-m removal can
    cascade a higher-degree node down to core m); every node with
    degree < k is removed with ``core = k − 1`` — its
    degree-at-removal under min-degree peeling.  Cascades stay at the
    same k across steps (a removal can drop a neighbor under the
    threshold), so a node removed in a level-k cascade still gets
    core k − 1.  Steps are bounded by the number of distinct degree
    levels plus cascade lengths — O(√E) worst case, dozens in
    practice at web skew.

    At 1M nodes / 10M edges the wall is STEP-LATENCY-bound (~25 cheap
    steps each paying fixed job latency), so the loop spends driver
    actions frugally: ONE small degree-HISTOGRAM job per step (≤
    #distinct-degree-levels rows) yields the minimum degree, the
    survivor count, AND the exact removal-set cardinality — replacing
    the separate min/count aggregate and the cache+count that
    previously fed AQE's broadcast decision.  The removal set is
    broadcast EXPLICITLY when its known size is bounded (deterministic
    plan, no stats guessing; the two anti-join broadcast subtrees are
    identical, so ReuseExchange ships it once); above the bound it
    falls back to the cached shuffle join.

    Output covers every node that has at least one non-self edge
    (isolated nodes have no core), ``core ≥ 1``.
    """
    adj = tracked_local_checkpoint(
        _symmetrized_simple(edges, src_col, dst_col)
    )
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("_d")).cache()
    removed: list[DataFrame] = []
    k = 1
    while True:
        # one job per step: the degree histogram carries the minimum,
        # the survivor count, and (once k is fixed) the exact removal
        # cardinality for the explicit-broadcast decision below
        hist = {
            int(r["_d"]): int(r["c"])
            for r in deg.groupBy("_d").agg(
                F.count(F.lit(1)).alias("c")).collect()
        }
        if not hist:  # adjacency exhausted — every node assigned
            deg.unpersist()
            break
        m = min(hist)
        if m >= k:  # stable at k: jump to the next removing level
            k = m + 1
        n_bad = sum(c for d, c in hist.items() if d < k)
        bad = deg.filter(F.col("_d") < k).select(
            F.col("src").alias("_bad"))
        if n_bad <= _CORE_BROADCAST_LIMIT:
            bad = F.broadcast(bad)
        else:
            bad = bad.cache()
            bad.count()  # real stats under the join decision
        new_adj = tracked_local_checkpoint(
            adj.join(bad, adj["src"] == bad["_bad"], "left_anti")
            .join(bad, adj["dst"] == bad["_bad"], "left_anti")
        )
        new_deg = (
            new_adj.groupBy("src").agg(F.count(F.lit(1)).alias("_d")).cache()
        )
        # The step's removal set is a NODE-SET difference, not just
        # ``bad``: a survivor whose every edge left with a removed
        # neighbor (a star's center once its leaves go) vanishes from
        # the adjacency in the same step — its degree dropped below k
        # mid-cascade, so it too carries core = k − 1.
        removed.append(tracked_local_checkpoint(
            deg.select(F.col("src").alias("node"))
            .join(new_deg.select(F.col("src").alias("node")),
                  "node", "left_anti")
            .select("node", F.lit(k - 1).cast("int").alias("core"))
        ))
        free_local_checkpoint(adj)
        deg.unpersist()
        bad.unpersist()
        adj, deg = new_adj, new_deg
    free_local_checkpoint(adj)
    if not removed:
        return edges.sparkSession.createDataFrame([], "node string, core int")
    out = removed[0]
    for r in removed[1:]:
        out = out.unionByName(r)
    result = tracked_local_checkpoint(out)
    for r in removed:
        free_local_checkpoint(r)
    return result


def neighborhood_function(
    edges: DataFrame,
    radius: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(r, ball_sum_micros, effective_diameter) for r = 0..radius —
    the approximate neighborhood function N(r) = Σ_v |B̂(v, r)| (how
    many (source, target) pairs are within distance r) and the
    EFFECTIVE DIAMETER it implies: the smallest r whose pair coverage
    reaches 90% of N(radius).  This is the classic ANF / HyperANF
    analysis (Palmer, Gibbons, Faloutsos, "ANF: a fast and scalable
    tool for data mining in massive graphs", KDD 2002; Boldi, Rosa,
    Vigna's HyperANF ran it on the full Facebook graph) — the
    one-number connectivity health check a crawl snapshot gets before
    anything per-node: a shattered or suddenly-shallow crawl moves
    the curve immediately.

    Free off the graph tier's shared register loop
    (:func:`_hyperball_ball_estimates`): the per-round ball estimates
    already exist, so the curve is one aggregation over the per-node
    estimate frame.  Each node contributes its RUNNING MAXIMUM
    max(ê_0 … ê_r), not the raw round estimate: balls only grow, but
    the HLL estimator can shrink across the linear-counting→raw
    regime switch (a node at 16·ln16 ≈ 44.4 can drop to ~41 when its
    last zero register fills), and an unguarded sum would let N(r)
    dip below N(r−1) and anchor the 90% rule to an inflated mid-curve
    value — the same regime hazard the harmonic/closeness folds guard
    with max(0, Δ).  The running max is per-NODE, which is why the
    curve aggregates the joined estimate frame rather than each round
    frame independently.  Determinism at any partitioning: per-node
    running maxes round to integer MICROS before the sum (binary64
    summation order would otherwise wiggle the last ulp across
    engines — the dsir pattern), so ``ball_sum_micros`` is an exact
    monotone BIGINT curve and the 90% rule is integer
    cross-multiplication (10·N(r) ≥ 9·N(R), the gopher pattern) — no
    float comparison anywhere in the output.
    """
    out, ests, cleanup = _hyperball_ball_estimates(
        edges, radius, src_col, dst_col
    )

    def _runmax(r: int):
        cols = [F.col(f"_e{k}") for k in range(r + 1)]
        return cols[0] if r == 0 else F.greatest(*cols)

    sums = out.agg(*[
        F.sum(F.round(_runmax(r) * 1e6, 0).cast("long")).alias(f"_n{r}")
        for r in range(radius + 1)
    ])
    eff = F.lit(radius).cast("int")
    for r in range(radius, -1, -1):
        eff = F.when(
            F.lit(10) * F.col(f"_n{r}") >= F.lit(9) * F.col(f"_n{radius}"),
            F.lit(r).cast("int"),
        ).otherwise(eff)
    curve = sums.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).cast("int").alias("r"),
                    F.col(f"_n{r}").alias("ball_sum_micros"),
                )
                for r in range(radius + 1)
            ])
        ).alias("_s"),
        eff.alias("effective_diameter"),
    ).select("_s.r", "_s.ball_sum_micros", "effective_diameter")
    result = tracked_local_checkpoint(curve)
    cleanup()
    return result


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, degree, triangles, clustering) — per-node triangle count
    and local clustering coefficient over the UNDIRECTED SIMPLE graph,
    the third standard host-graph curation signal next to centrality
    and coreness (link farms show pathological clustering: a spam ring
    is near-cliquish, a doorway fan is near-zero; Gyöngyi et al.'s
    spam-mass line of work gates on exactly these local densities).

    clustering(v) = 2·T(v) / (d(v)·(d(v)−1)) for d(v) ≥ 2, else 0.0 —
    T(v) the number of triangles through v, d(v) the distinct-neighbor
    degree.  Both T and d are exact integers; the one float division
    is a fixed expression an independent engine replays bitwise.

    Algorithm (degree-ordered orientation — Cohen's MapReduce triangle
    counting / the "forward" algorithm family): orient every edge from
    the (degree, id)-SMALLER endpoint to the larger; each triangle
    then has exactly ONE representation as an oriented path u→v→w
    closed by the oriented edge u→w, so counting path-closures counts
    triangles once.  The orientation is what makes this scale: any
    node's ORIENTED out-degree is O(√E) regardless of its raw degree
    (a hub's million in-links contribute nothing to its out-list), so
    the path self-join fans out as Σ_v in⁺(v)·out⁺(v) = O(E^{3/2})
    where the unoriented wedge join is Σ deg² — which the hub alone
    blows up.  Shape: one degree agg, one orientation join, one path
    self-join keyed on the middle vertex, one closing hash join
    against the oriented edge list, then one explode + partial-agg
    count per corner.  No iteration, no window.
    """
    adj = _symmetrized_simple(edges, src_col, dst_col).cache()
    deg = adj.groupBy("src").agg(F.count(F.lit(1)).alias("_d")).cache()
    # (degree, id) total order; keep each undirected edge once, low→high
    ranked = (
        adj.join(deg.select(F.col("src").alias("src"),
                            F.col("_d").alias("_ds")), "src")
        .join(deg.select(F.col("src").alias("dst"),
                         F.col("_d").alias("_dd")), "dst")
        .filter(
            (F.col("_ds") < F.col("_dd"))
            | ((F.col("_ds") == F.col("_dd")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst")
        .cache()
    )
    paths = (
        ranked.select(F.col("src").alias("_u"), F.col("dst").alias("_v"))
        .join(
            ranked.select(F.col("src").alias("_v"), F.col("dst").alias("_w")),
            "_v",
        )
    )
    tris = paths.join(
        ranked.select(F.col("src").alias("_u"), F.col("dst").alias("_w")),
        ["_u", "_w"],
    )
    corner_counts = (
        tris.select(
            F.explode(F.array("_u", "_v", "_w")).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("_t"))
    )
    out = (
        deg.select(F.col("src").alias("node"), F.col("_d").alias("degree"))
        .join(corner_counts, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce(F.col("_t"), F.lit(0)).alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.lit(2.0)
                * F.coalesce(F.col("_t"), F.lit(0)).cast("double")
                / (F.col("degree").cast("double")
                   * (F.col("degree").cast("double") - F.lit(1.0))),
            ).otherwise(F.lit(0.0)).alias("clustering"),
        )
    )
    result = tracked_local_checkpoint(out)
    adj.unpersist()
    deg.unpersist()
    ranked.unpersist()
    return result


def transitivity(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """One-row (triangles, wedges, transitivity_micros) — the GLOBAL
    clustering coefficient 3·T/W (closed wedges over all wedges,
    W = Σ_v d(v)(d(v)−1)/2), the single-number density companion to
    :func:`triangle_counts`' per-node signal: track it across crawl
    snapshots and a link-farm injection moves the global ratio before
    any per-host score is computed.

    Derived FROM :func:`triangle_counts` (one extra aggregation —
    Σ per-node triangles is exactly 3T since each triangle has three
    corners, and Σ d(d−1) is exactly 2W): triangles and wedges are
    exact BIGINTs, and the one float division 2·(3T)/(2W) = 3T/W is a
    fixed expression an independent engine replays bitwise.
    """
    tc = triangle_counts(edges, src_col, dst_col)
    agg = tc.agg(
        F.coalesce(F.sum("triangles"), F.lit(0)).alias("_c3"),
        F.coalesce(
            F.sum(F.col("degree") * (F.col("degree") - F.lit(1))),
            F.lit(0),
        ).alias("_dd"),
    )
    out = agg.select(
        # integer `div`, never double-divide-and-truncate: both sums
        # are exact BIGINTs and must stay exact past 2^53 (the same
        # discipline pack_sequences documents for its cumsums)
        F.expr("_c3 div 3").alias("triangles"),
        F.expr("_dd div 2").alias("wedges"),
        F.round(
            F.when(
                F.col("_dd") > 0,
                F.lit(2.0) * F.col("_c3").cast("double")
                / F.col("_dd").cast("double"),
            ).otherwise(F.lit(0.0)) * 1e6,
            0,
        ).cast("bigint").alias("transitivity_micros"),
    )
    result = tracked_local_checkpoint(out)
    free_local_checkpoint(tc)
    return result


def personalized_pagerank(
    edges: DataFrame,
    seeds: list[str],
    iters: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """(node, rank) — personalized PageRank / TrustRank: the teleport
    mass (and the dangling mass) returns to a SEED set instead of the
    whole graph, so rank measures proximity-to-trusted rather than
    global importance (Gyöngyi, Garcia-Molina, Pedersen, "Combating Web
    Spam with TrustRank", VLDB 2004 — the standard crawl-gating
    companion to :func:`pagerank`: seed a few hundred vetted hosts,
    demote everything the trust doesn't flow to).

    Conventions mirror :func:`pagerank` exactly (edge multiplicity
    counts, optional strictly-positive ``weight_col`` turning each
    edge into a link count, nodes = distinct endpoints,
    micros-rounding for engine comparison) except r₀ = 1/|S| on seeds
    and 0 elsewhere, and each round
    r'(v) = d·(Σ_{u→v} r(u)·w/W(u)) + [v ∈ S]·((1−d) +
    d·dangling)/|S|.  ``seeds`` is a driver-side list (bounded — seed
    sets are curated by hand); seeds absent from the graph still
    receive teleport mass, the TrustRank convention.  Same per-round
    shape and checkpoint discipline as :func:`pagerank`: one rank⋈edge
    shuffle + one partial agg per round, O(1) live rounds."""
    if not seeds:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    s = sorted(set(seeds))
    cols = [F.col(src_col).alias("src"), F.col(dst_col).alias("dst")]
    if weight_col is not None:
        cols.append(_edge_weight(weight_col).alias("_w"))
    e = edges.select(*cols).cache()
    deg = e.groupBy("src").agg(
        (F.count("*") if weight_col is None else F.sum("_w")).alias("_d")
    ).cache()
    # loop-invariant hoists, mirroring :func:`pagerank` (r15): the
    # edge⋈out-degree attach and the dangling-node flag are computed
    # once, not per round
    ed = e.join(deg, "src").cache()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .unionByName(
            e.sparkSession.createDataFrame(
                [(x,) for x in s], "node string"
            )
        )
        .distinct()
        .join(deg.select(F.col("src").alias("node"),
                         F.lit(False).alias("_dang")),
              "node", "left")
        .select("node", F.coalesce(F.col("_dang"), F.lit(True))
                .alias("_dang"))
        .cache()
    )
    is_seed = F.col("node").isin(s)
    ranks = tracked_local_checkpoint(
        nodes.withColumn(
            "rank",
            F.when(is_seed, F.lit(1.0 / len(s))).otherwise(F.lit(0.0)),
        )
    )
    for _ in range(iters):
        dangling = (
            ranks.filter(F.col("_dang"))
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("s"))
            .first()["s"]
        )
        share = (
            F.col("_r") / F.col("_d") if weight_col is None
            else F.col("_r") * F.col("_w") / F.col("_d")
        )
        contrib = (
            ed.join(
                ranks.select(F.col("node").alias("src"),
                             F.col("rank").alias("_r")),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum(share).alias("_c"))
        )
        new_ranks = tracked_local_checkpoint(
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                "_dang",
                (
                    F.lit(damping)
                    * F.coalesce(F.col("_c"), F.lit(0.0))
                    + F.when(
                        is_seed,
                        (F.lit(1.0 - damping)
                         + F.lit(damping) * F.lit(float(dangling)))
                        / F.lit(float(len(s))),
                    ).otherwise(F.lit(0.0))
                ).alias("rank"),
            )
        )
        free_local_checkpoint(ranks)
        ranks = new_ranks
    e.unpersist()
    deg.unpersist()
    ed.unpersist()
    nodes.unpersist()
    return ranks.select("node", "rank")
