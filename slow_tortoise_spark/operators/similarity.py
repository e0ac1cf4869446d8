"""Similarity search over embedding columns (array<float>).

Two tiers:

* **Brute-force cosine top-k** — exact; the embedding column stays
  JVM-side (``F.zip_with`` products + ``F.aggregate`` sum, codegen'd).
  Cost: one scan per query. Fine for ad-hoc queries and as the recall
  oracle for the approximate tier.
* **IVF (inverted-file) top-k** — the scale path: vectors are assigned
  once to their nearest centroid (a broadcast of C centroids); a query
  probes only the ``nprobe`` nearest cells, scanning ~nprobe/C of the
  data. Centroid selection here is deterministic k-seed (every
  ``stride``-th vector) — swap in k-means iterations for production
  quality without changing the query path.

An LSH variant (random-hyperplane signs) is the other classic scale
path; IVF was chosen because the partition-pruning structure maps
directly onto Spark partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from slow_tortoise_spark.operators.cachectl import tracked_cache


def dot_col(a: Column, b: Column) -> Column:
    """Dot product of two float arrays (JVM-side, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``query`` against every vector.

    The query is a literal array (broadcast in the plan, not a join).
    Ordering ties break by id for determinism.
    """
    # One parsed SQL literal instead of len(query) F.lit round trips
    # (repr() round-trips doubles exactly; the D suffix keeps the
    # literal DoubleType, not decimal).
    q = F.expr(
        "array(" + ", ".join(f"{float(x)!r}D" for x in query) + ")"
    )
    scored = df.select(
        F.col(id_col),
        cosine_col(F.col(vec_col).cast("array<double>"), q).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


#: above this centroid count, cell assignment switches from plan-literal
#: arrays to a broadcast centroid-table join (literal plans grow with
#: C×dim and blow up compilation/serialization in the tens of thousands
#: of cells a 100 TB corpus wants).
LITERAL_CENTROID_LIMIT = 256


def _assign_cells(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str,
    strategy: str = "auto",
) -> DataFrame:
    """Add a ``cell`` column: index of the max-cosine centroid.

    Two physical strategies, identical results (pytest parity-pinned):

    * ``literal`` (small C): the centroid matrix (and each centroid's
      norm — a Python-side constant) is one literal array of structs; a
      single ``transform`` computes all C cosines sharing ONE
      vector-norm subexpression, and ``array_position(·, array_max(·))``
      picks the argmax with first-wins (= lowest cell id) tie-breaking —
      the same order a SQL ``row_number() OVER (ORDER BY cos DESC,
      cell)`` oracle produces.  Zero shuffle, but the plan grows with
      C×dim.
    * ``join`` (large C): centroids become a broadcast DataFrame; the
      vector side joins it (broadcast nested-loop — C rows per vector),
      ``max_by(cell, struct(cos, -cell))`` picks the argmax per vector
      (partial map-side agg, so the shuffle carries one row per vector),
      and the assignment joins back onto the input by id.  Plans stay
      O(1) size no matter how large C grows; centroid bytes ship once
      per executor via the broadcast.

    ``auto`` picks by ``LITERAL_CENTROID_LIMIT``.
    """
    import math

    if strategy == "auto":
        strategy = (
            "join" if len(centroids) > LITERAL_CENTROID_LIMIT else "literal"
        )
    if strategy == "join":
        return _assign_cells_join(df, centroids, vec_col)

    v = F.col(vec_col).cast("array<double>")
    vnorm = norm_col(v)
    mat = F.array(*[
        F.struct(
            F.array(*[F.lit(float(x)) for x in cvec]).alias("c"),
            F.lit(math.sqrt(sum(x * x for x in cvec)) or 1.0).alias("n"),
        )
        for _, cvec in centroids
    ])
    cosines = F.transform(mat, lambda s: dot_col(v, s["c"]) / (vnorm * s["n"]))
    cell = (F.array_position(cosines, F.array_max(cosines)) - 1).cast("int")
    # map positional index back to the caller's centroid ids (they are
    # 0..C-1 in practice, but stay faithful to the contract)
    ids = F.array(*[F.lit(cid) for cid, _ in centroids])
    return df.withColumn("cell", F.element_at(ids, cell + 1))


def _assign_cells_join(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str,
) -> DataFrame:
    """Broadcast-join cell assignment (the large-C strategy).

    Ties break to the lowest cell id — ``max_by`` maximizes the struct
    (cosine, −cell), matching the literal strategy's first-wins argmax
    exactly.  The per-vector argmax groups on a synthetic dense row id
    (``monotonically_increasing_id``); the id-bearing subtree is
    evaluated exactly ONCE — the group carries the full row payload via
    ``first()`` instead of joining the tagged frame back to itself,
    because a self-join would re-evaluate the nondeterministic ids on
    each side and could silently mis-assign or drop rows whenever the
    input's row order isn't stable across re-evaluation (post-shuffle
    frames, cache eviction).  Cost: the shuffle carries each row's
    payload once (map-side combine collapses the C candidate copies per
    mapper).  Norms: argmax over cos = argmax over dot/‖c‖ because the
    vector's own norm is a positive constant within its group — dividing
    by it is skipped, which also sidesteps 0/0 for zero vectors.
    """
    import math

    spark = df.sparkSession
    cdf = spark.createDataFrame(
        [(int(cid), [float(x) for x in cvec],
          math.sqrt(sum(x * x for x in cvec)) or 1.0)
         for cid, cvec in centroids],
        "cell int, _c array<double>, _cn double",
    )
    tagged = df.withColumn("_row", F.monotonically_increasing_id())
    v = F.col(vec_col).cast("array<double>")
    exploded = tagged.join(F.broadcast(cdf), on=F.lit(True))
    score = dot_col(v, F.col("_c")) / F.col("_cn")
    assign = exploded.groupBy("_row").agg(
        *[F.first(c).alias(c) for c in df.columns],
        F.max_by("cell", F.struct(score.alias("_s"),
                                  (-F.col("cell")).alias("_t")))
        .alias("cell"),
    )
    return assign.drop("_row")


def build_ivf_index(
    df: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Assign every vector to its nearest of ``n_cells`` centroids.

    Returns (indexed DataFrame with a ``cell`` column, centroid list).
    Centroids start as deterministic seeds (the first vector of every
    stride); ``kmeans_iters`` Lloyd iterations refine them — each
    iteration is one assignment scan plus one (cell, dim) average
    (posexplode + groupBy; the collected result is n_cells × dim values,
    driver-tiny). Persist the result partitioned by ``cell`` for
    repeated queries.
    """
    # Deterministic distributed seed pick: top-n_cells ids by md5(id).
    # orderBy+limit plans as TakeOrderedAndProject (per-partition top-K
    # then a driver merge of n_cells rows) — no global sort, no
    # unpartitioned window, and the same seeds on any cluster layout.
    # md5 over the stringified id is a portable pseudo-random order that
    # a SQL oracle can reproduce verbatim.
    seeds = (
        df.select(id_col, vec_col, F.md5(F.col(id_col).cast("string")).alias("_h"))
        .orderBy("_h", id_col)
        .limit(n_cells)
        .collect()
    )
    centroids = [(i, [float(x) for x in r[vec_col]]) for i, r in enumerate(seeds)]

    for _ in range(kmeans_iters):
        assigned = _assign_cells(df, centroids, vec_col)
        means = (
            assigned.select(
                "cell", F.posexplode(F.col(vec_col).cast("array<double>"))
            )
            .groupBy("cell", "pos")
            .agg(F.avg("col").alias("v"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["v"]
        centroids = [
            (cid, [dims[i] for i in sorted(dims)])
            for cid, dims in sorted(by_cell.items())
        ]

    indexed = _assign_cells(df, centroids, vec_col)
    return indexed, centroids


def ivf_topk(
    indexed: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: scan only the ``nprobe`` cells nearest to query."""
    import math

    qn = math.sqrt(sum(x * x for x in query))

    def cos(c):
        cn = math.sqrt(sum(x * x for x in c))
        return sum(a * b for a, b in zip(query, c)) / (qn * cn or 1.0)

    probe = [cid for cid, c in sorted(centroids, key=lambda t: -cos(t[1]))[:nprobe]]
    return brute_force_topk(
        indexed.filter(F.col("cell").isin(probe)), query, k, id_col, vec_col
    )


def _sign_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Per-plane sign bits (int 0/1 array) of ``vec`` against the literal
    plane matrix — ONE transform, one pass over the planes.  The single
    shared ``dot > 0`` convention is load-bearing: the star-collapse
    pre-pass's drops-are-a-subset-of-pairwise-drops guarantee holds only
    while :func:`hyperplane_signature` and
    :func:`hyperplane_band_buckets` derive bits identically."""
    v = vec.cast("array<double>")
    mat = F.array(*[
        F.array(*[F.lit(float(x)) for x in p]) for p in planes
    ])
    return F.transform(mat, lambda p: F.when(dot_col(v, p) > 0, 1).otherwise(0))


def hyperplane_band_buckets(
    df: DataFrame,
    planes: list[list[float]],
    bands: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, bucket) rows: sign-bit LSH bucket per band.

    ``planes`` is split into ``bands`` contiguous groups; within a band,
    bit r of the bucket is sign(v · plane[band*rows + r]).  All planes are
    literal arrays, so every bucket is one codegen'd projection — no UDF,
    no shuffle until the caller groups or joins on (band, bucket).
    """
    rows = len(planes) // bands
    if rows * bands != len(planes):
        raise ValueError("len(planes) must be divisible by bands")
    bits = _sign_bits(F.col(vec_col), planes)
    with_bits = df.select(F.col(id_col), bits.alias("_bits"))
    entries = [
        F.struct(
            F.lit(b).alias("band"),
            sum(
                F.element_at("_bits", b * rows + r + 1) * F.lit(2**r)
                for r in range(rows)
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return with_bits.select(
        F.col(id_col), F.explode(F.array(*entries)).alias("_bb")
    ).select(id_col, F.col("_bb.band").alias("band"), F.col("_bb.bucket").alias("bucket"))


def hyperplane_signature(
    df: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "_sig",
) -> DataFrame:
    """Append the FULL sign-bit signature (every plane, one '0'/'1' string)
    to ``df``.  Two vectors share the signature iff they share EVERY band
    bucket of any banding of the same planes, so a signature group is
    exactly the id set that would meet in ALL of the pairwise tier's band
    joins — the worst-case Σ|bucket|² contributors.  String packing (not a
    bigint) sidesteps the bit-63 sign hazard for any plane count.
    """
    bits = F.transform(
        _sign_bits(F.col(vec_col), planes), lambda b: b.cast("string")
    )
    return df.withColumn(out_col, F.array_join(bits, ""))


def star_collapse_drops(
    df: DataFrame,
    planes: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hot-family pre-pass for the pairwise LSH tier: one (id_col) row per
    vector verified near-duplicate of its full-signature group's min-id
    representative.

    The pairwise tier pays Σ|bucket|² candidates; a family of m
    near-identical vectors shares EVERY band bucket, so m² candidates per
    band — 1.7G pairs at a 200k-blob soak with ~4.2k-member families.
    Here each full-signature group is verified against ONE representative
    (the group's min id) by exact cosine: an equi-join on the signature,
    O(|group|) comparisons per group, O(n) total, one shuffle.  Members
    scoring ≥ ``threshold`` against the representative are returned as
    drops; survivors (representatives + below-threshold members) are few
    enough for the pairwise tier.

    Keep policy (pinned): a star-dropped member does NOT transitively
    vote.  On a boundary triangle rep < m < x with cos(rep,m) ≥ θ,
    cos(m,x) ≥ θ but cos(rep,x) < θ, the pure pairwise DROP policy
    drops x (via the (m,x) pair, even though m is itself dropped) while
    the star pre-pass keeps x — every survivor here is within θ of NO
    surviving vector, which is the keep-set a curator actually wants
    (pytest pins both the equality on triangle-free data and the
    planted-triangle divergence).  Drops are always a subset of the
    pairwise tier's: rep is the group minimum, so for every drop m the
    pair (rep, m) exists in the pairwise tier with rep < m and the same
    cosine.
    """
    sig = tracked_cache(
        hyperplane_signature(df, planes, id_col, vec_col)
        .select(
            F.col(id_col),
            "_sig",
            F.col(vec_col).cast("array<double>").alias("_v"),
        )
        .withColumn("_n", norm_col(F.col("_v")))
    )
    # min-id per signature group, then the representative's vector back —
    # both sides of this join are one row per group/vector (never pairs).
    reps = sig.groupBy("_sig").agg(F.min(id_col).alias("_rep_id"))
    rep_vecs = reps.join(
        sig.select(
            F.col(id_col).alias("_rep_id"),
            F.col("_v").alias("_rv"),
            F.col("_n").alias("_rn"),
        ),
        "_rep_id",
    ).select("_sig", "_rep_id", "_rv", "_rn")
    return (
        sig.join(rep_vecs, "_sig")
        .filter(F.col(id_col) != F.col("_rep_id"))
        .filter(
            dot_col(F.col("_v"), F.col("_rv")) / (F.col("_n") * F.col("_rn"))
            >= F.lit(threshold)
        )
        .select(id_col)
    )


#: admit-only slack for the BLAS candidate prune: a float64 dot of d≤4k
#: terms carries relative error ≤ ~d·2⁻⁵³ ≈ 4.5e-13 under ANY summation
#: order (pairwise, SIMD-blocked, sequential — standard γ_n bound), and
#: the norms/division add a few more ulps; 1e-6 dwarfs all of it, so a
#: pair whose BLAS cosine reads below (bound − slack) provably has
#: exact cosine < bound and can never survive the caller's filter.
_BLAS_PRUNE_SLACK = 1e-6


def _blas_bound_pairs(
    side: DataFrame,
    group_cols: list[str],
    bound: float,
    id_col: str,
    emit_group_cols: bool = False,
) -> DataFrame:
    """Per-group candidate pairs whose cosine can reach ``bound``:
    id pairs (id_a < id_b) within each ``group_cols`` bucket whose
    float64 BLAS cosine is ≥ bound − :data:`_BLAS_PRUNE_SLACK`.

    ``side`` must carry ``group_cols``, ``id_col``, ``_v``
    (array<double>) and ``_n`` (the precomputed L2 norm).  One grouped
    Arrow batch per bucket, one (blocked) ``X @ X.T`` per group — the
    guide-§4.2 shape: Spark does distribution and the join bookkeeping,
    BLAS does the per-pair arithmetic, and the group shuffle moves each
    VECTOR once instead of materializing Σ|group|² candidate rows for
    the interpreted per-pair fold.  This is a PRUNE, not a rescore: the
    caller re-scores every returned pair with the exact JVM fold
    (identical IEEE sequence to the unpruned tier), so results are
    bit-identical — the bound is admit-only (see slack note), and rows
    the bound cannot reason about (zero/non-finite norm, non-finite or
    odd-length vectors — whose exact cosine is NaN and therefore passes
    Spark's NaN-is-greatest ``>= t`` filter) are admitted against every
    group member rather than scored.

    Memory per task is O(|group|·d + block·|group|) — the score matrix
    is computed in row blocks of ≤ ~4M doubles; the 100 TB calling
    convention bounds |group| itself (semdedup auto-scaling pins the
    expected cell size; see ``semantic_dedup_pairs``).
    """
    import pandas as pd  # noqa: F401  (executor-side import)

    keep = float(bound) - _BLAS_PRUNE_SLACK
    id_t = side.schema[id_col].dataType.simpleString()
    out_cols = [f"id_a {id_t}", f"id_b {id_t}"]
    if emit_group_cols:
        out_cols += [
            f"{g} {side.schema[g].dataType.simpleString()}"
            for g in group_cols
        ]
    schema = ", ".join(out_cols)
    gcols = list(group_cols)

    def prune(pdf):
        import numpy as np
        import pandas as pd

        cols = ["id_a", "id_b"] + (gcols if emit_group_cols else [])

        def empty():
            return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})

        m = len(pdf)
        if m < 2:
            return empty()
        ids = pdf.iloc[:, pdf.columns.get_loc(id_col)].to_numpy()
        norms = pdf["_n"].to_numpy(dtype=np.float64)
        vs = pdf["_v"].to_numpy()
        d0 = 0
        for v in vs:
            if v is not None:
                d0 = len(v)
                break
        V = np.zeros((m, d0), dtype=np.float64)
        ok = np.isfinite(norms) & (norms > 0.0)
        for i, v in enumerate(vs):
            if not ok[i]:
                continue
            a = np.asarray(v, dtype=np.float64)
            if a.shape != (d0,) or not np.isfinite(a).all():
                ok[i] = False
            else:
                V[i] = a / norms[i]
        out_a, out_b = [], []
        idx = np.flatnonzero(ok)
        gids = ids[idx]
        Xn = V[idx]
        mm = len(idx)
        blk = max(1, 4_000_000 // max(mm, 1))
        for s in range(0, mm, blk):
            S = Xn[s:s + blk] @ Xn.T
            mask = (S >= keep) & (gids[s:s + blk, None] < gids[None, :])
            r, c = np.nonzero(mask)
            if r.size:
                out_a.append(gids[s:s + blk][r])
                out_b.append(gids[c])
        bad = ids[~ok]
        dedup = bad.size > 0
        for x in bad:
            lo = np.minimum(x, ids)
            hi = np.maximum(x, ids)
            ne = lo != hi
            out_a.append(lo[ne])
            out_b.append(hi[ne])
        if not out_a:
            return empty()
        res = pd.DataFrame({
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b),
        })
        if dedup:  # (bad, bad) pairs are emitted from both sides
            res = res.drop_duplicates()
        if emit_group_cols:
            for g in gcols:
                res[g] = pdf[g].iloc[0]
        return res[cols]

    return side.groupBy(*gcols).applyInPandas(prune, schema)


def lsh_near_duplicates(
    df: DataFrame,
    planes: list[list[float]],
    bands: int = 4,
    threshold: float | None = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prune_below: float | None = None,
) -> DataFrame:
    """Bucket-then-rescore near-dup pairs — the 100 TB tier.

    Candidate pairs are ids sharing any band's LSH bucket (an equi-join on
    (band, bucket) — never an all-pairs comparison); candidates are then
    rescored with the exact cosine, and only pairs ≥ ``threshold`` are
    kept (pass ``threshold=None`` to get every scored candidate, e.g. for
    a caller that filters on a rounded score).  Recall is the standard
    banded-LSH tradeoff: P(candidate) = 1−(1−p^r)^b for per-plane
    collision p = 1−θ/π.  Tune (rows, bands) to the threshold: high
    thresholds (0.9+, the realistic near-dup regime) support long bands
    (r=4–8) that prune candidates aggressively; low thresholds near the
    random-pair expectation need short bands (r=2) and more of them, and
    candidate volume stays a large fraction of all pairs — no LSH scheme
    can prune hard when the threshold barely separates signal from noise.
    The exact O(n²) ``embedding_near_duplicates`` below is the verifier
    tier.

    ``prune_below`` is the caller's promise that pairs scoring under it
    are discarded downstream (e.g. a later rounded-score filter): with
    it (or a non-None ``threshold``) the candidate set is pre-pruned by
    a per-bucket BLAS bound (:func:`_blas_bound_pairs`) before the
    exact rescore, so the Σ|bucket|² candidate explosion happens inside
    one blocked ``X @ X.T`` per bucket instead of as materialized rows
    feeding the interpreted per-pair fold.  Returned pairs and their
    cosines are bit-identical to the unpruned tier (the prune is
    admit-only and the rescore below is the same IEEE sequence); only
    pairs that provably cannot reach the bound are absent.
    """
    bound = threshold if threshold is not None else prune_below
    if threshold is not None and prune_below is not None:
        bound = min(threshold, prune_below)
    # cache(): the self-join reads this frame on both sides and AQE does
    # not ReuseExchange across it — uncached, the plane dot-products run
    # twice. bands rows per vector.
    bk = tracked_cache(hyperplane_band_buckets(df, planes, bands, id_col, vec_col))
    if bound is not None:
        vecs = df.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ).withColumn("_n", norm_col(F.col("_v")))
        cand = _blas_bound_pairs(
            bk.join(vecs, id_col), ["band", "bucket"], bound, id_col
        ).distinct()
    else:
        a, b = bk.alias("a"), bk.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .distinct()
        )
    # Cast + norm are hoisted to the n-row vector sides — the rescore
    # projection previously re-ran both interpreted array loops per
    # CANDIDATE.  sqrt(Σv²) per vector then na·nb per pair is the same
    # float-op sequence cosine_col emits: rounded parity is unchanged.
    va = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("_va"),
    ).withColumn("_na", norm_col(F.col("_va")))
    vb = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("_vb"),
    ).withColumn("_nb", norm_col(F.col("_vb")))
    scored = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            (dot_col(F.col("_va"), F.col("_vb"))
             / (F.col("_na") * F.col("_nb"))).alias("cosine"),
        )
    )
    if threshold is None:
        return scored
    return scored.filter(F.col("cosine") >= threshold)


def semantic_dedup_pairs(
    df: DataFrame,
    n_cells: int | None = 16,
    threshold: float | None = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
    target_cell_rows: int = 256,
    prune_below: float | None = None,
) -> DataFrame:
    """Cluster-bucketed semantic near-dup pairs (SemDeDup-style, public
    method: Abbas et al. 2023, arXiv:2303.09540 — cluster embeddings,
    compare only within a cluster).

    Vectors are assigned to their nearest of ``n_cells`` centroids (the
    deterministic IVF build — broadcastable centroids, one scan), then
    candidate pairs are an EQUI-join on the cell id with an exact cosine
    rescore: cost is Σ|cell|² instead of n², and the join never
    degenerates to all-pairs as long as cells stay balanced
    (``kmeans_iters`` Lloyd rounds rebalance; a pathological mega-cell
    is the documented failure mode of every clustering bucketer —
    :func:`lsh_near_duplicates` is the alternative bucketing with the
    complementary tradeoff).  Cross-cell near-dups are missed by
    construction — that recall loss vs the exact tier is the method's
    published tradeoff, bounded in pytest on clustered fixtures.

    Returns (id_a, id_b, cell, cosine) with ``id_a < id_b``;
    ``threshold=None`` returns every within-cell scored pair (for
    callers filtering on a rounded score, e.g. the SQL-parity query).
    ``n_cells=1`` degenerates to the exact all-pairs tier (pytest pins
    equality with :func:`embedding_near_duplicates`).

    ``n_cells=None`` auto-scales the cell count to
    ``ceil(n / target_cell_rows)`` (one count() scan).  A FIXED cell
    count is quadratic in corpus growth — at 10× the vectors each cell
    holds 10× the rows and Σ|cell|² pays 100× (measured: the sf0.1→sf1
    probe scored 250k→25M candidate pairs at n_cells=8).  Auto-scaling
    pins the expected cell size instead, so candidate cost grows
    linearly (Σ|cell|² ≈ n · target_cell_rows) — the default to reach
    for at 100 TB, where any hardcoded cell count is wrong.

    ``prune_below`` is the caller's promise that pairs scoring under it
    are discarded downstream: with it (or a non-None ``threshold``) the
    within-cell candidates are pre-pruned by a per-cell BLAS bound
    (:func:`_blas_bound_pairs`) before the exact rescore — Σ|cell|²
    interpreted per-pair folds become one blocked ``X @ X.T`` per cell.
    Returned pairs and cosines are bit-identical to the unpruned tier
    (admit-only prune, same IEEE rescore); only pairs that provably
    cannot reach the bound are absent.
    """
    if n_cells is None:
        n = df.count()
        n_cells = max(1, -(-n // max(1, target_cell_rows)))
    indexed, _ = build_ivf_index(
        df, n_cells=n_cells, id_col=id_col, vec_col=vec_col,
        kmeans_iters=kmeans_iters,
    )
    # cache(): same self-join double-execution hazard — the IVF cell
    # assignment (centroid argmax per vector) would otherwise run twice.
    # The double cast and the vector NORM are hoisted to the n-row side
    # (they were previously re-evaluated per PAIR — Σ|cell|² times); the
    # pair projection pays one interpreted-HOF dot instead of three
    # array loops.  sqrt(Σv²) per vector then na·nb per pair is the
    # same float-op sequence cosine_col emits, so rounded oracle
    # parity is preserved bit-for-bit.
    side = tracked_cache(
        indexed.select(
            id_col, "cell", F.col(vec_col).cast("array<double>").alias("_v")
        ).withColumn("_n", norm_col(F.col("_v")))
    )
    bound = threshold if threshold is not None else prune_below
    if threshold is not None and prune_below is not None:
        bound = min(threshold, prune_below)
    if bound is not None:
        cand = _blas_bound_pairs(
            side, ["cell"], bound, id_col, emit_group_cols=True
        )
        va = side.select(
            F.col(id_col).alias("id_a"),
            F.col("_v").alias("_va"), F.col("_n").alias("_na"),
        )
        vb = side.select(
            F.col(id_col).alias("id_b"),
            F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
        )
        pairs = (
            cand.join(va, "id_a")
            .join(vb, "id_b")
            .select(
                "id_a", "id_b", "cell",
                (dot_col(F.col("_va"), F.col("_vb"))
                 / (F.col("_na") * F.col("_nb"))).alias("cosine"),
            )
        )
        if threshold is None:
            return pairs
        return pairs.filter(F.col("cosine") >= threshold)
    # The pair output explodes Σ|cell|²/n-fold relative to its ~KB-sized
    # input, so AQE's byte-based coalescing collapses the streamed side
    # of the broadcast join to one task and the whole rescore runs on a
    # single core (measured: 7.7 s serial at sf0.1).  An explicit
    # numPartitions repartition (REPARTITION_BY_NUM is exempt from AQE
    # coalescing) spreads the n-row stream — cheap at any scale — and
    # the compute-heavy projection parallelizes with it.
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    a = side.repartition(n_parts, F.col(id_col)).alias("a")
    b = side.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cell") == F.col("b.cell"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col("a.cell").alias("cell"),
        (dot_col(F.col("a._v"), F.col("b._v"))
         / (F.col("a._n") * F.col("b._n"))).alias("cosine"),
    )
    if threshold is None:
        return pairs
    return pairs.filter(F.col("cosine") >= threshold)


def semantic_dedup_drop(
    df: DataFrame,
    n_cells: int | None = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 0,
    target_cell_rows: int = 256,
) -> DataFrame:
    """Rows surviving semantic dedup: drop a vector iff a LOWER-id
    vector in its cell is cosine-similar above ``threshold``.

    Same single-pass drop policy (and the same star-shape caveat) as the
    MinHash greedy tier: a chain a~b~c with a≁c drops both b and c even
    though c's only similar survivor was itself dropped.  For the
    transitive-closure-correct variant, feed :func:`semantic_dedup_pairs`
    into ``operators.dedup.connected_components`` /
    ``drop_by_components`` — the pair frame is policy-agnostic.
    """
    pairs = semantic_dedup_pairs(
        df, n_cells, threshold, id_col, vec_col, kmeans_iters,
        target_cell_rows,
    )
    doomed = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(doomed, id_col, "left_anti")


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact, O(n²) — baseline tier).

    At scale, bucket by IVF cell (or hyperplane-LSH signature) first and
    compare only within buckets.
    """
    # Same hoist as the bucketed tiers: cast + norm on the n-row sides,
    # one dot per pair — identical float-op sequence to cosine_col.
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
    ).withColumn("_na", norm_col(F.col("va")))
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    ).withColumn("_nb", norm_col(F.col("vb")))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            (dot_col(F.col("va"), F.col("vb"))
             / (F.col("_na") * F.col("_nb"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# Distributed linear algebra: gramian + PCA over embedding columns
# ---------------------------------------------------------------------------


def embedding_gramian(
    df: DataFrame, vec_col: str = "embedding", method: str = "explode"
) -> DataFrame:
    """Gramian G = sum(x xT) of an ``array<float>`` column as a long
    (i, j, g) frame — the building block for PCA / whitening / covariance
    over a corpus too large to collect.

    ``method="explode"`` (default, oracle-checkable): two nested in-row
    generates emit (i, j, vi*vj) and one partially-aggregated groupBy
    sums them.  The shuffle carries at most d^2 rows PER MAP TASK no
    matter the corpus size (map-side combine collapses each partition to
    one partial gramian), so at 100 TB the cost is pure embarrassingly
    parallel CPU; the exchange stays tiny.  ``method="pandas"`` computes
    per-batch ``X.T @ X`` with BLAS inside ``mapInPandas`` — same
    shuffle shape, far fewer instructions per element; the justified
    Arrow path when d is large.  Both return bit-comparable doubles up
    to float-sum ordering (parity-tested to 1e-6).

    Returns (i, j, g) with 0-based dimensions, d^2 rows.
    """
    if method == "pandas":
        return _gramian_pandas(df, vec_col)
    v = F.col(vec_col)
    ex = df.select(
        F.posexplode(v).alias("i", "vi"), v.alias("vec")
    ).select("i", F.col("vi").cast("double").alias("vi"), "vec")
    pairs = ex.select(
        "i",
        F.posexplode(
            F.transform("vec", lambda x: x.cast("double") * F.col("vi"))
        ).alias("j", "p"),
    )
    return pairs.groupBy("i", "j").agg(F.sum("p").alias("g"))


def _gramian_pandas(df: DataFrame, vec_col: str) -> DataFrame:
    """Arrow-batched gramian: one d x d partial per batch, summed by the
    same tiny groupBy as the explode path."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        G = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            G = X.T @ X if G is None else G + X.T @ X
        if G is not None:
            d = G.shape[0]
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "g": G.ravel()}
            )

    out = df.select(vec_col).mapInPandas(partials, "i int, j int, g double")
    return out.groupBy("i", "j").agg(F.sum("g").alias("g"))


def embedding_mean(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension mean of an embedding column: (i, mu), d rows, one
    partially-aggregated shuffle."""
    return (
        df.select(F.posexplode(vec_col).alias("i", "v"))
        .groupBy("i")
        .agg(F.avg(F.col("v").cast("double")).alias("mu"))
    )


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 8,
    method: str = "pandas",
):
    """Fit a k-component PCA on the driver from the distributed gramian
    (+ mean + count): covariance = G/n - mu muT is d x d — tiny — so the
    eigendecomposition is a numpy ``eigh`` on the driver, the classic
    tall-skinny split (cluster does the O(rows d^2) work, driver the
    O(d^3)).  Deterministic sign: each component's
    largest-|coefficient| entry is made positive.

    Returns (components: list[list[float]] k x d ordered by variance
    desc, explained_variance: list[float]).
    """
    import numpy as np

    d = len(df.select(vec_col).first()[0])
    n = df.count()
    G = np.zeros((d, d))
    for r in embedding_gramian(df, vec_col, method=method).collect():
        G[r["i"], r["j"]] = r["g"]
    mu = np.zeros(d)
    for r in embedding_mean(df, vec_col).collect():
        mu[r["i"]] = r["mu"]
    cov = G / n - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        c = vecs[:, idx]
        if c[np.argmax(np.abs(c))] < 0:
            c = -c
        comps.append([float(x) for x in c])
    return comps, [float(vals[i]) for i in order]


def pca_project(
    df: DataFrame,
    components: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project embeddings onto fitted components — in-row zip_with dot
    products against the broadcast-literal component matrix (k x d
    doubles in the plan; no UDF, no shuffle, map-only)."""
    comp_lit = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in c]).cast("array<double>")
            for c in components
        ]
    )
    proj = F.transform(comp_lit, lambda c: dot_col(F.col(vec_col), c))
    return df.withColumn(out_col, proj)


def logreg_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "y",
    dim: int = 8,
    iters: int = 5,
    lr: float = 0.5,
) -> list[float]:
    """Distributed logistic regression by full-batch gradient descent —
    the quality-classifier trainer of a curation pipeline (score docs
    with a linear model over embedding/quality features).  Weights live
    on the driver (dim+1 floats); every iteration is ONE aggregate job:
    sigmoid(x·w) is an in-row expression over the literal weights and
    the gradient is dim+1 SUM expressions (map-side combined, so the
    shuffle carries dim+1 doubles per partition — corpus size only
    affects scan CPU).  The classic driver-loop split: cluster does
    O(rows·dim) per round, driver does O(dim).

    Returns [w_0..w_{dim-1}, bias] after ``iters`` rounds from w=0.
    """
    from functools import reduce

    n = df.count()
    w = [0.0] * (dim + 1)
    v = F.col(vec_col)
    y = F.col(label_col).cast("double")
    for _ in range(iters):
        z = reduce(
            lambda acc, j: acc
            + F.element_at(v, j + 1).cast("double") * F.lit(w[j]),
            range(dim),
            F.lit(w[dim]),
        )
        err = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - y
        aggs = [
            F.sum(err * F.element_at(v, j + 1).cast("double")).alias(f"g{j}")
            for j in range(dim)
        ] + [F.sum(err).alias("gb")]
        row = df.agg(*aggs).first()
        w = [w[j] - lr * row[f"g{j}"] / n for j in range(dim)] + [
            w[dim] - lr * row["gb"] / n
        ]
    return w


def logreg_score(
    df: DataFrame,
    weights: list[float],
    vec_col: str = "embedding",
    out_col: str = "score",
) -> DataFrame:
    """Apply a fitted linear model in-row: sigmoid(x·w + b)."""
    from functools import reduce

    dim = len(weights) - 1
    v = F.col(vec_col)
    z = reduce(
        lambda acc, j: acc
        + F.element_at(v, j + 1).cast("double") * F.lit(weights[j]),
        range(dim),
        F.lit(weights[dim]),
    )
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


# ---------------------------------------------------------------------------
# Scalar quantization (int8 SQ): compressed-domain similarity search
# ---------------------------------------------------------------------------


def sq_minmax(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension global min/max over an embedding column — the SQ
    "codebook" (2·d doubles).  One partially-aggregated shuffle of at
    most d rows per map task; corpus size only affects scan CPU.  Min
    and max are order-independent, so the result is bit-exact no matter
    the partitioning — safe to replay in a SQL oracle.

    Returns (pos, mn, mx) with 0-based ``pos``, d rows.
    """
    x = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x")
    )
    return x.groupBy("pos").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )


def sq_quantize(
    df: DataFrame,
    minmax: list[tuple[int, float, float]],
    vec_col: str = "embedding",
    out_col: str = "codes",
    bits: int = 8,
) -> DataFrame:
    """Quantize ``array<float>`` embeddings to small-int codes in
    [0, 2^bits - 1] against per-dimension (mn, mx) ranges — 4x memory
    compression at bits=8, the standard trick to keep a 100 TB vector
    corpus scannable (codes + codebook instead of float32).

    The codebook ships as a literal struct array in the plan (2·d
    doubles — driver-bounded like the IVF centroid matrix), so
    quantization is map-only, zero shuffle, fully codegen'd:
    ``code = floor((x - mn) * levels / (mx - mn) + 0.5)`` clamped to
    [0, levels]; degenerate dimensions (mx == mn) map to 0.
    ``floor(v + 0.5)`` is used instead of round() deliberately: both the
    JVM and SQL engines define floor identically on binary64, while
    round() tie-breaking is engine-specific — the formula replays
    bit-exactly in a DuckDB oracle.
    """
    levels = (1 << bits) - 1
    mm = F.array(*[
        F.struct(F.lit(float(mn)).alias("mn"), F.lit(float(mx)).alias("mx"))
        for _, mn, mx in sorted(minmax)
    ])
    v = F.col(vec_col).cast("array<double>")
    codes = F.zip_with(
        v,
        mm,
        lambda x, m: F.when(m["mx"] == m["mn"], F.lit(0)).otherwise(
            F.least(
                F.lit(levels),
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (x - m["mn"]) * F.lit(float(levels)) / (m["mx"] - m["mn"])
                        + F.lit(0.5)
                    ).cast("int"),
                ),
            )
        ),
    )
    return df.withColumn(out_col, codes)


def sq_topk(
    df: DataFrame,
    k: int = 10,
    query_id: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Symmetric scalar-quantized top-k: quantize the corpus AND the
    query to int codes, rank by squared L2 distance IN CODE SPACE —
    the compressed-domain scan of an SQ index (FAISS
    ``IndexScalarQuantizer`` with symmetric L2 distance).  Code-space
    L2 is per-dimension range-normalized L2, so it is self-match-exact
    (identical vectors quantize to identical codes, distance 0) and
    integer end-to-end: scores are engine-portable with NO float
    ordering hazard, and the scan reads 1/4 the bytes of a float32
    scan.  (A raw code DOT product would NOT work: codes are offset by
    the per-dimension min, so uncentered IP rankings are dominated by
    the offset — measured top-1 != self on real embeddings.)

    Plan shape: one tiny d-row min/max aggregate (codebook), a map-only
    quantize, one bounded collect of the query row's codes (ints —
    exact), then a TakeOrdered top-k.  No join, no full-width shuffle.

    Returns (id_col, dist) — dist is the BIGINT squared code distance,
    ascending, ties broken by id.
    """
    minmax = [
        (r["pos"], r["mn"], r["mx"]) for r in sq_minmax(df, vec_col).collect()
    ]
    codes = sq_quantize(df, minmax, vec_col, bits=bits)
    qrow = codes.filter(F.col(id_col) == query_id).select("codes").first()
    if qrow is None:
        raise ValueError(f"query id {query_id} not found in {id_col}")
    qarr = F.array(*[F.lit(int(c)) for c in qrow["codes"]]).cast("array<bigint>")
    dist = F.aggregate(
        F.zip_with(F.col("codes").cast("array<bigint>"), qarr,
                   lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return (
        codes.select(F.col(id_col), dist.alias("dist"))
        .orderBy(F.asc("dist"), F.col(id_col))
        .limit(k)
    )


def logreg_score_cols(
    df: DataFrame,
    weights: list[float],
    feature_cols: list[Column],
    out_col: str = "score",
) -> DataFrame:
    """Apply a fitted linear model over plain feature COLUMNS:
    sigmoid(sum(w_j * col_j) + b).  Same math as :func:`logreg_score`
    without packing an array first — use this form when the features
    are scalar expressions rather than a stored vector column: wrapping
    CASE WHEN expressions in array()+element_at() trips a janino
    codegen bug ("isNull_N is not an rvalue") that silently drops the
    whole predicate to interpreted mode; the flat sum compiles clean
    (measured: 32 per-task fallbacks → 0 in the corpus pipeline's
    learned gate)."""
    from functools import reduce

    dim = len(weights) - 1
    if len(feature_cols) != dim:
        raise ValueError(f"{len(feature_cols)} features for {dim} weights")
    z = reduce(
        lambda acc, p: acc + p[0].cast("double") * F.lit(p[1]),
        zip(feature_cols, weights[:dim]),
        F.lit(weights[dim]),
    )
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def write_ivf_index(
    indexed: DataFrame,
    centroids: list[tuple[int, list[float]]],
    path: str,
) -> None:
    """Persist an IVF index with CELL AS A PARTITION COLUMN plus a
    centroids JSON sidecar.  This turns ``ivf_topk``'s cell pruning
    from an in-memory filter into DISK-level partition pruning: a query
    that probes ``nprobe`` of C cells lists and reads only those
    directories — at 100 TB the scan touches nprobe/C of the files
    before a single row is deserialized (the plan shows the cell
    predicate under PartitionFilters, pinned by test).

    Layout is ``batch=…/cell=…``: the base build writes ``batch=-1``
    and every :func:`ivf_append` batch owns its own ``batch={id}``
    directory, written with mode=overwrite — which is what makes a
    crash-replayed streaming append IDEMPOTENT (the replay replaces
    the batch's directory instead of appending next to a partial
    write).  ``batch`` is an ingest-bookkeeping column only; readers
    drop it, and cell pruning is unaffected (``cell`` stays a
    partition column at the inner level)."""
    import json
    import os

    indexed.withColumn("batch", F.lit(-1)).write.mode(
        "overwrite"
    ).partitionBy("batch", "cell").parquet(path)
    with open(os.path.join(path, "_centroids.json"), "w") as fh:
        json.dump([[cid, cvec] for cid, cvec in centroids], fh)


def read_ivf_index(
    spark, path: str
) -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Load a persisted IVF index (lazy frame + centroid list)."""
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as fh:
        centroids = [(int(cid), [float(x) for x in cvec])
                     for cid, cvec in json.load(fh)]
    # ``batch`` is ingest bookkeeping (see write_ivf_index) — dropping
    # it here keeps the query surface identical to the in-memory index
    return spark.read.parquet(path).drop("batch"), centroids


def ivf_topk_from_path(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`ivf_topk` against a persisted partitioned index — the
    cell filter becomes a partition filter, so unprobed cells are never
    even listed into the scan."""
    indexed, centroids = read_ivf_index(spark, path)
    return ivf_topk(indexed, centroids, query, k, nprobe, id_col, vec_col)


def _next_manual_batch_id(path: str) -> int:
    """Next manual (non-streaming) append batch id for a persisted
    IVF/IVFADC index: ids DESCEND below the base build's -1 (-2, -3,
    …), a namespace disjoint from Spark's foreachBatch ids (0, 1, …),
    so a manual append followed by a stream on the SAME index path can
    never silently overwrite.  Single-sourced here so the two index
    flavors cannot drift apart on the invariant."""
    import os
    import re

    existing = [
        int(m.group(1))
        for d in os.listdir(path)
        if (m := re.fullmatch(r"batch=(-?\d+)", d))
    ]
    return min(existing, default=-1) - 1


def ivf_append(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: int | None = None,
) -> int:
    """Incrementally grow a persisted IVF index: assign ``new_vectors``
    to the EXISTING centroids (same broadcast argmax as the build) and
    write them under ``batch={batch_id}/cell=…``.  Returns the number
    of vectors written.

    This is the streaming-ingest path for ANN at scale: a batch of new
    embeddings costs one broadcast assignment plus a write of O(batch)
    files into its own batch directory — the existing index bytes are
    never rewritten, and queries through :func:`ivf_topk_from_path`
    keep their PartitionFilters pruning (``cell`` is still a partition
    column inside every batch directory).

    IDEMPOTENT BY CONSTRUCTION (round-7 verdict): the batch directory
    path is deterministic and written with mode=overwrite, so replaying
    the same ``batch_id`` — including after a crash that left a partial
    or complete-but-uncommitted write — REPLACES the directory instead
    of appending a second copy of the vectors.  Assignment is also
    deterministic (same centroids, same argmax), so a replay touches
    exactly the cells the first attempt did.  When ``batch_id`` is None
    (ad-hoc non-streaming use) ids DESCEND from the base build's -1
    (first manual append -2, then -3, …) — a namespace disjoint from
    Spark's foreachBatch ids (0, 1, 2, …), so a manual append followed
    by a stream on the SAME index path can never silently overwrite
    (streaming batch 0 used to collide with the first manual auto-id).
    Callers passing an explicit non-negative ``batch_id`` own that
    invariant themselves.

    Centroids are deliberately NOT updated: IVF semantics tolerate
    assignment drift (recall degrades gracefully as the data
    distribution moves off the trained centroids), and mutating the
    sidecar under readers would be a consistency hazard this layer
    doesn't need.  Re-cluster by rebuilding into a fresh path and
    flipping a manifest (the streaming/pipeline.py commit pattern)
    when drift warrants — the diagnostic is the mean assignment
    cosine, which this function returns the ingredients for via the
    appended rows themselves.
    """
    import os

    if batch_id is None:
        batch_id = _next_manual_batch_id(path)
    _, centroids = read_ivf_index(spark, path)
    assigned = _assign_cells_join(new_vectors, centroids, vec_col)
    n = assigned.count()
    assigned.select(*new_vectors.columns, "cell").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(os.path.join(path, f"batch={batch_id}"))
    return n


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-compression tier beyond int8 SQ
# ---------------------------------------------------------------------------
#
# Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
# Search" (TPAMI 2011): split each d-dim vector into m subvectors of
# d/m dims, learn a ksub-centroid codebook PER SUBSPACE (k-means, L2),
# store each vector as m small-int codes (log2(ksub) bits each), and
# answer queries by Asymmetric Distance Computation (ADC): precompute
# the m×ksub table of squared L2 distances from the RAW query subvectors
# to every centroid, then score a database vector as the sum of m table
# lookups.  At bits=8/m=16 a 1024-dim float32 corpus compresses 256×
# (4 KB → 16 B per vector) — the standard way a 100 TB vector corpus
# becomes scannable, complementary to IVF (which prunes WHICH vectors
# are scanned; PQ shrinks WHAT is read per vector).
#
# Engine portability: training is deterministic (md5-ordered seed pick,
# Lloyd rounds with argmin ties to the LOWEST code, empty clusters carry
# the previous centroid forward), so a SQL oracle can replay every round
# — the same contract as build_ivf_index/_kmeans_sql.


def _l2sq_col(a: Column, b: Column) -> Column:
    """Squared L2 distance between two array<double> columns.

    ``F.aggregate`` sums IN ARRAY ORDER (sequential fold), so the same
    inputs produce bit-identical doubles on every executor."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _mk_l2_to(sub: Column):
    """One-parameter HOF lambda factory: distance from ``sub`` to the
    lambda's element (arity matters — see note in _pq_codes_expr)."""
    return lambda c: _l2sq_col(sub, c)


def _pq_codes_expr(
    vec_col: str, codebooks: list[list[list[float]]]
) -> Column:
    """``array<int>`` of per-subspace argmin-L2 codes (literal strategy).

    The full codebook ships in the plan as m×ksub literal double arrays
    — fine for the m·ksub·dsub ≤ ~10k values of a parity fixture or a
    small index, but a production 16×256×64 book belongs in a broadcast
    join (:func:`_pq_encode_join`, dispatched by ``pq_encode``'s
    ``auto`` strategy).  Argmin ties break first-wins = lowest code
    (``array_position`` of the min), matching a SQL
    ``row_number() OVER (ORDER BY dist, code)`` replay."""
    v = F.col(vec_col).cast("array<double>")
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    codes = []
    for s in range(m):
        sub = F.slice(v, s * dsub + 1, dsub)
        cents = F.array(*[
            F.array(*[F.lit(float(x)) for x in c]) for c in codebooks[s]
        ])
        # NB: no default-arg capture (``lambda c, _s=sub``) — PySpark
        # reads a 2-arity lambda as the (element, index) HOF form and
        # would bind the subvector name to the INT index
        dists = F.transform(cents, _mk_l2_to(sub))
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        )
    return F.array(*codes)


# literal-strategy bound, in total codebook doubles (m * ksub * dsub);
# beyond it pq_encode auto-dispatches to the broadcast-join path
PQ_LITERAL_VALUE_LIMIT = 16384

# literal distance-table bound for ivfpq_topk (nprobe * m * ksub doubles);
# beyond it the tables ship as an nprobe-row broadcast instead of plan
# literals
IVFPQ_LITERAL_VALUE_LIMIT = 4096


def pq_train(
    df: DataFrame,
    m: int = 4,
    ksub: int = 4,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Train PQ codebooks: ``codebooks[s][j]`` = centroid j of subspace s.

    Seeding is the IVF convention (top-``ksub`` ids by md5(id), each
    seed's m subvectors seeding code j of every subspace — one
    TakeOrderedAndProject job, replayable in SQL verbatim).  Each Lloyd
    round is ONE map-only assignment (the codes expression) plus ONE
    partially-aggregated shuffle of at most m·ksub·dsub rows per map
    task (posexplode → groupBy(subspace, code, dim) avg) — corpus size
    only affects scan CPU, and the collected result is driver-tiny.
    Empty clusters keep their previous centroid (never renumbered, so
    code identity is stable across rounds — the property the SQL replay
    relies on)."""
    dim_row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if dim_row is None:
        raise ValueError("pq_train: empty input")
    d = int(dim_row["d"])
    if d % m != 0:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    dsub = d // m

    seeds = (
        df.select(id_col, vec_col,
                  F.md5(F.col(id_col).cast("string")).alias("_h"))
        .orderBy("_h", id_col)
        .limit(ksub)
        .collect()
    )
    codebooks = [
        [[float(x) for x in r[vec_col]][s * dsub:(s + 1) * dsub]
         for r in seeds]
        for s in range(m)
    ]

    v = F.col(vec_col).cast("array<double>")
    for _ in range(iters):
        assigned = df.withColumn("_pqc", _pq_codes_expr(vec_col, codebooks))
        pos = F.col("_pos")
        s_expr = F.floor(pos / F.lit(dsub)).cast("int")
        means = (
            assigned.select("_pqc", F.posexplode(v).alias("_pos", "_x"))
            .select(
                s_expr.alias("s"),
                F.element_at("_pqc", s_expr + 1).alias("j"),
                (pos % F.lit(dsub)).cast("int").alias("p"),
                F.col("_x"),
            )
            .groupBy("s", "j", "p")
            .agg(F.avg("_x").alias("x"))
            .collect()
        )
        mu: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            mu.setdefault((r["s"], r["j"]), {})[r["p"]] = r["x"]
        codebooks = [
            [
                [mu[(s, j)][p] for p in range(dsub)]
                if (s, j) in mu else codebooks[s][j]
                for j in range(ksub)
            ]
            for s in range(m)
        ]
    return codebooks


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
    strategy: str = "auto",
) -> DataFrame:
    """Add ``out_col``: the vector's m PQ codes (``array<int>``).

    ``literal`` is map-only / zero-shuffle (codebook in the plan);
    ``join`` broadcasts the codebook as a DataFrame and keeps the plan
    O(1) size for production-scale books (see :func:`_pq_encode_join`).
    ``auto`` dispatches on total codebook values — both strategies are
    parity-pinned bit-identical in pytest."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    dsub = len(codebooks[0][0])
    if strategy == "auto":
        strategy = ("join" if m * ksub * dsub > PQ_LITERAL_VALUE_LIMIT
                    else "literal")
    if strategy == "join":
        return _pq_encode_join(df, codebooks, vec_col, out_col)
    return df.withColumn(out_col, _pq_codes_expr(vec_col, codebooks))


def _pq_encode_join(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_codes",
) -> DataFrame:
    """Broadcast-join PQ encode (the large-codebook strategy).

    Each row posexplodes into its m subvectors (ONE Generate), joins the
    broadcast (_s, _j, centroid) codebook rows (ksub candidates per
    subvector; underscore-prefixed so user columns named s/j survive), and two partially-aggregated shuffles reduce back: the
    per-(row, subspace) ``min_by`` argmin (ties to lowest code, matching
    the literal strategy's first-wins), then a per-row
    ``array_sort(collect_list(struct(_s, code)))`` reassembly.  The row
    payload rides through both aggregates via ``first()`` on a
    ``monotonically_increasing_id`` group key — never a self-join, which
    would re-evaluate the nondeterministic ids on each side (the
    _assign_cells_join hazard)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    spark = df.sparkSession
    # internal columns are underscore-prefixed (module convention) so a
    # user frame that already has columns named "s"/"j" can't collide
    cdf = spark.createDataFrame(
        [(s, j, [float(x) for x in c])
         for s, book in enumerate(codebooks) for j, c in enumerate(book)],
        "_s int, _j int, _c array<double>",
    )
    v = F.col(vec_col).cast("array<double>")
    tagged = df.withColumn("_row", F.monotonically_increasing_id())
    subs = tagged.select(
        *df.columns, "_row",
        F.posexplode(
            F.array(*[F.slice(v, s * dsub + 1, dsub) for s in range(m)])
        ).alias("_s", "_sub"),
    )
    cand = subs.join(F.broadcast(cdf), "_s")
    dist = _l2sq_col(F.col("_sub"), F.col("_c"))
    per = cand.groupBy("_row", "_s").agg(
        *[F.first(c).alias(c) for c in df.columns],
        F.min_by("_j", F.struct(dist.alias("_d"), F.col("_j").alias("_t")))
        .alias("_code"),
    )
    out = per.groupBy("_row").agg(
        *[F.first(c).alias(c) for c in df.columns],
        F.transform(
            F.array_sort(F.collect_list(F.struct("_s", "_code"))),
            lambda x: x["_code"],
        ).alias(out_col),
    )
    return out.drop("_row")


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Asymmetric-distance top-k over a PQ-encoded corpus.

    The m×ksub distance table (RAW query subvector → each centroid,
    squared L2, summed in subvector order — the same sequential fold the
    engine-side ``_l2sq_col`` uses) is computed driver-side (bounded:
    m·ksub doubles) and ships as one literal nested array; scoring is a
    map-only ``zip_with`` table lookup + sequential sum over the m
    codes, then a TakeOrdered top-k.  No join, no full-width shuffle —
    the scan reads codes (m small ints), never the float vectors.

    Returns (id_col, adc_dist_micros): BIGINT micro-distance
    (``round(d*1e6)``), ascending, ties by id — the engine-portable
    integer convention the other float-scoring queries use."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if len(query) != m * dsub:
        raise ValueError(f"query dim {len(query)} != {m * dsub}")
    q = [float(x) for x in query]
    dtab = [
        [
            sum((q[s * dsub + p] - c[p]) ** 2 for p in range(dsub))
            for c in codebooks[s]
        ]
        for s in range(m)
    ]
    lit_dtab = F.array(*[
        F.array(*[F.lit(float(x)) for x in row]) for row in dtab
    ])
    score = F.aggregate(
        F.zip_with(F.col(codes_col), lit_dtab,
                   lambda c, t: F.element_at(t, c + 1)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        encoded.select(
            F.col(id_col),
            F.round(score * F.lit(1e6), 0).cast("bigint")
            .alias("adc_dist_micros"),
        )
        .orderBy("adc_dist_micros", id_col)
        .limit(k)
    )


def pq_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    m: int = 4,
    ksub: int = 4,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """End-to-end PQ ANN: train → encode → ADC top-k for one corpus row
    as the query (asymmetric: the query side stays un-quantized)."""
    codebooks = pq_train(df, m=m, ksub=ksub, iters=iters,
                         id_col=id_col, vec_col=vec_col)
    qrow = df.filter(F.col(id_col) == query_id).select(vec_col).first()
    if qrow is None:
        raise ValueError(f"query id {query_id} not found in {id_col}")
    encoded = pq_encode(df, codebooks, vec_col)
    return pq_adc_topk(encoded, codebooks, [float(x) for x in qrow[vec_col]],
                       k=k, id_col=id_col)


# ---------------------------------------------------------------------------
# IVFADC — IVF cell pruning × residual PQ (Jégou et al. 2011, §IV.B)
# ---------------------------------------------------------------------------
#
# The composition is the standard production ANN layout: IVF decides
# WHICH vectors a query reads (nprobe of C cells → at disk level,
# partition pruning); PQ decides HOW MANY BYTES each read vector costs
# (m code bytes instead of 4·d float bytes).  Encoding quantizes the
# RESIDUAL x − centroid(cell): residuals concentrate near zero, so the
# same ksub codes quantize far finer than raw-vector PQ — the reason
# IVFADC beats IVF-then-PQ-on-raw at equal bits.  Scoring follows the
# ADC convention per probed cell: the query's residual against THAT
# cell's centroid builds the cell's own m×ksub distance table.


def _residual_expr(
    vec_col: str, centroids: list[tuple[int, list[float]]],
    cell_col: str = "cell",
) -> Column:
    """``array<double>`` residual x − centroid[cell] (map-only; the C×d
    centroid matrix ships as one literal, same budget note as
    ``_assign_cells``).  The lookup is keyed by CELL ID, not list
    position — a Lloyd round can drop an empty cell from the centroid
    list, after which positional indexing would subtract the wrong
    centroid."""
    v = F.col(vec_col).cast("array<double>")
    cmap = F.map_from_arrays(
        F.array(*[F.lit(int(cid)) for cid, _ in centroids]),
        F.array(*[
            F.array(*[F.lit(float(x)) for x in cvec])
            for _, cvec in centroids
        ]),
    )
    return F.zip_with(
        v, F.element_at(cmap, F.col(cell_col)), lambda a, b: a - b
    )


def ivfpq_build(
    df: DataFrame,
    n_cells: int = 16,
    kmeans_iters: int = 0,
    m: int = 4,
    ksub: int = 4,
    pq_iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[tuple[int, list[float]]], list[list[list[float]]]]:
    """Build an IVFADC index: IVF assignment (cosine, md5-seeded k-means)
    → residuals → PQ codebooks trained ON the residuals → encoded frame
    (id, cell, pq_codes).  Returns (encoded, centroids, codebooks).

    Costs: the IVF build's jobs, plus one map-only residual projection,
    plus pq_train's one-shuffle-per-round — nothing quadratic, nothing
    collected beyond the two driver-bounded codebooks."""
    indexed, centroids = build_ivf_index(
        df, n_cells=n_cells, id_col=id_col, vec_col=vec_col,
        kmeans_iters=kmeans_iters,
    )
    with_res = indexed.withColumn(
        "_res", _residual_expr(vec_col, centroids)
    )
    codebooks = pq_train(with_res, m=m, ksub=ksub, iters=pq_iters,
                         id_col=id_col, vec_col="_res")
    encoded = pq_encode(with_res, codebooks, vec_col="_res").drop("_res")
    return encoded, centroids, codebooks


def ivfpq_topk(
    encoded: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """IVFADC query: rank the ``nprobe`` cosine-nearest cells (the
    ivf_topk probe convention — driver-side over the bounded centroid
    list, ties to the lower cell id), build each probed cell's OWN
    m×ksub distance table from the query's residual against that cell's
    centroid (driver-side: nprobe·m·ksub doubles), and scan ONLY the
    probed cells' codes — the cell filter is a partition filter when the
    index is read from a cell-partitioned path.  Map-only scoring
    (literal cell→dtab map, zip_with lookup, sequential sum) + one
    TakeOrdered.

    Returns (id_col, adc_dist_micros) ascending, ties by id."""
    import math

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    qn = math.sqrt(sum(x * x for x in query))

    def cos(c):
        cn = math.sqrt(sum(x * x for x in c))
        return sum(a * b for a, b in zip(query, c)) / (qn * cn or 1.0)

    probe = [
        cid for cid, c in sorted(centroids, key=lambda t: -cos(t[1]))[:nprobe]
    ]
    cent = dict(centroids)
    dtabs = []
    for cid in probe:
        qres = [q - c for q, c in zip(query, cent[cid])]
        dtabs.append([
            [
                sum((qres[s * dsub + p] - cb[p]) ** 2 for p in range(dsub))
                for cb in codebooks[s]
            ]
            for s in range(m)
        ])
    pruned = encoded.filter(F.col("cell").isin([int(c) for c in probe]))
    if nprobe * m * len(codebooks[0]) <= IVFPQ_LITERAL_VALUE_LIMIT:
        # small tables: one literal cell→table map, zero joins
        dtab_col = F.element_at(
            F.map_from_arrays(
                F.array(*[F.lit(int(c)) for c in probe]),
                F.array(*[
                    F.array(*[
                        F.array(*[F.lit(float(x)) for x in row])
                        for row in tab
                    ])
                    for tab in dtabs
                ]),
            ),
            F.col("cell"),
        )
        scored = pruned
    else:
        # production codebooks (ksub=256): nprobe·m·ksub literals would
        # bloat analysis/codegen past the scan cost (measured: 18 s/query
        # at 32k literals) — ship the tables once via a broadcast of
        # nprobe rows instead
        ddf = encoded.sparkSession.createDataFrame(
            [(int(c), [[float(x) for x in row] for row in tab])
             for c, tab in zip(probe, dtabs)],
            "cell int, _dtab array<array<double>>",
        )
        scored = pruned.join(F.broadcast(ddf), "cell")
        dtab_col = F.col("_dtab")
    score = F.aggregate(
        F.zip_with(F.col(codes_col), dtab_col,
                   lambda c, t: F.element_at(t, c + 1)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        scored.select(
            F.col(id_col),
            F.round(score * F.lit(1e6), 0).cast("bigint")
            .alias("adc_dist_micros"),
        )
        .orderBy("adc_dist_micros", id_col)
        .limit(k)
    )


def write_ivfpq_index(
    encoded: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    path: str,
    files_per_write: int = 32,
    vec_col: str = "embedding",
) -> None:
    """Persist an IVFADC index cell-partitioned (the write_ivf_index
    layout — ``batch=-1/cell=…`` so :func:`ivf_append`-style batch
    growth stays available) with BOTH codebooks in the JSON sidecar.
    The parquet rows carry only (ids, cell, pq_codes) — at bits=8/m=4 a
    64-dim float corpus stores 16× smaller than the raw-vector IVF
    index, and a query reads nprobe/C of THAT.

    Three storage details matter at scale (all measured by
    tools/soak_ann.py — the naive write was LARGER than the raw floats):
    ``vec_col`` is DROPPED if still present (the whole point of the
    index is that the float vectors stay behind), codes store as
    ``array<smallint>`` (2 B elements; ksub ≤ 32768 — parquet dict/RLE
    shrinks them further), and the frame is repartitioned BY CELL into
    ``files_per_write`` shuffle partitions before the partitioned
    write, so each cell directory holds ~1 file per overlapping
    partition instead of one file per (task × cell) — footer overhead
    was dominating the index bytes."""
    import json
    import os

    (
        encoded.drop(vec_col)
        .withColumn("batch", F.lit(-1))
        .withColumn("pq_codes", F.col("pq_codes").cast("array<smallint>"))
        .repartition(files_per_write, F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("batch", "cell")
        .parquet(path)
    )
    with open(os.path.join(path, "_ivfpq.json"), "w") as fh:
        json.dump(
            {"centroids": [[cid, cvec] for cid, cvec in centroids],
             "codebooks": codebooks},
            fh,
        )


def read_ivfpq_index(
    spark, path: str
) -> tuple[DataFrame, list[tuple[int, list[float]]], list[list[list[float]]]]:
    """Load a persisted IVFADC index (lazy frame + both codebooks)."""
    import json
    import os

    with open(os.path.join(path, "_ivfpq.json")) as fh:
        meta = json.load(fh)
    centroids = [(int(cid), [float(x) for x in cvec])
                 for cid, cvec in meta["centroids"]]
    codebooks = [[[float(x) for x in c] for c in book]
                 for book in meta["codebooks"]]
    df = (
        spark.read.parquet(path).drop("batch")
        .withColumn("pq_codes", F.col("pq_codes").cast("array<int>"))
    )
    return df, centroids, codebooks


def ivfpq_topk_from_path(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """:func:`ivfpq_topk` against a persisted index — the probed-cell
    filter lands in PartitionFilters, so unprobed cells are never listed
    into the scan (pinned by test, same property as ivf_topk_from_path)."""
    encoded, centroids, codebooks = read_ivfpq_index(spark, path)
    return ivfpq_topk(encoded, centroids, codebooks, query,
                      k=k, nprobe=nprobe, id_col=id_col)


def ivfpq_rerank_topk(
    raw: DataFrame,
    encoded: DataFrame,
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 10,
    nprobe: int = 2,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_col: str = "pq_codes",
) -> DataFrame:
    """Two-stage retrieval: ADC over the compressed index proposes
    ``rerank`` candidates (default 10·k), then ONLY those rows' raw
    vectors are read for an exact cosine re-rank — the standard fix for
    per-rank parity where quantized distances can't separate
    near-equidistant neighbors (measured in tools/soak_ann.py: ADC
    recall@10 collapses inside huge clusters; exact re-rank of the ADC
    candidate set restores it at the cost of reading rerank/N of the
    raw corpus).

    The candidate ids collect to the driver (bounded: ``rerank`` longs).
    Up to ``IVFPQ_LITERAL_VALUE_LIMIT`` ids they push into the raw scan
    as a literal IN filter — on an id-partitioned or stats-clustered
    corpus that is file-level pruning.  Past the limit (production
    rerank ≈ 10k) a literal IN list would recreate the analysis/codegen
    blow-up measured at 32k dtab literals (18 s/query before any data
    moved), so the ids ship ONCE as a broadcast frame and the raw scan
    is LEFT-SEMI joined against it — same thresholded dispatch as the
    ADC distance tables and the PQ encode strategies; runtime filters /
    DPP keep file pruning available on clustered layouts.  Either way
    vectors are read for ~rerank rows instead of N.

    Returns (id_col, cosine) descending, ties by id."""
    if rerank is None:
        rerank = 10 * k
    cand = ivfpq_topk(
        encoded, centroids, codebooks, query,
        k=rerank, nprobe=nprobe, id_col=id_col, codes_col=codes_col,
    )
    ids = [r[id_col] for r in cand.select(id_col).collect()]
    if len(ids) <= IVFPQ_LITERAL_VALUE_LIMIT:
        filtered = raw.filter(F.col(id_col).isin(ids))
    else:
        from pyspark.sql.types import StructField, StructType

        idf = raw.sparkSession.createDataFrame(
            [(i,) for i in ids],
            StructType([StructField(id_col, raw.schema[id_col].dataType)]),
        )
        filtered = raw.join(F.broadcast(idf), id_col, "left_semi")
    return brute_force_topk(
        filtered, query, k=k, id_col=id_col, vec_col=vec_col,
    )


def ivfpq_append(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_id: int | None = None,
) -> int:
    """Incrementally grow a persisted IVFADC index: assign new vectors
    to the EXISTING centroids, encode their residuals under the
    EXISTING codebooks, and write codes under ``batch={id}/cell=…`` —
    the compressed-index mirror of :func:`ivf_append`, with the same
    idempotence-by-construction (deterministic batch directory +
    mode=overwrite: a crash-replayed batch REPLACES itself) and the
    same immutability contract (neither centroids nor codebooks move
    under readers; quantization error drifts gracefully as the data
    distribution moves off the training sample — re-train by rebuilding
    into a fresh path and flipping a manifest when drift warrants).

    Cells keep partition-pruned reads through
    :func:`ivfpq_topk_from_path`; appended rows store codes-only
    smallints exactly like the base build.  Manual auto-ids DESCEND
    from the base build's -1 (-2, -3, …) so they can never collide
    with Spark streaming foreachBatch ids (0, 1, …) on the same index
    path — see :func:`ivf_append`.  Returns rows written."""
    import os

    if batch_id is None:
        batch_id = _next_manual_batch_id(path)
    _, centroids, codebooks = read_ivfpq_index(spark, path)
    assigned = _assign_cells_join(new_vectors, centroids, vec_col)
    with_res = assigned.withColumn(
        "_res", _residual_expr(vec_col, centroids)
    )
    encoded = pq_encode(with_res, codebooks, vec_col="_res").drop("_res")
    n = encoded.count()
    (
        encoded.drop(vec_col)
        .withColumn("pq_codes", F.col("pq_codes").cast("array<smallint>"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(path, f"batch={batch_id}"))
    )
    return n
