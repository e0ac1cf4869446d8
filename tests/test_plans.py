"""Physical-plan regression tests: the optimizations the engine relies on
must actually appear in the executed plans (scale behavior is decided
here, not in the row counts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from slow_tortoise_spark.queries import (
    q_pricing_summary,
    q_semi_join,
    q_temporal_agg_month,
    q_top_orders,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_prunes_columns_and_pushes_filter(spark, sf_dir):
    plan = _plan(q_pricing_summary(spark, sf_dir))
    scan = [ln for ln in plan.splitlines() if "FileScan parquet" in ln][0]
    # column pruning: only the 6 needed lineitem columns are read
    assert "l_quantity" in scan and "l_orderkey" not in scan
    # the shipdate predicate reaches the parquet reader itself
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in scan


def test_top_orders_joins_left_to_aqe(spark, sf_dir):
    """orders/customer scale with sf, so q_top_orders must NOT force a
    broadcast on them — AQE picks broadcast when they fit (they do at
    test scale) and falls back to a shuffled join at 100×."""
    import inspect

    assert "F.broadcast" not in inspect.getsource(q_top_orders)
    df = q_top_orders(spark, sf_dir)
    df.collect()  # materialize AQE's final plan
    plan = _plan(df)
    # at test scale AQE still chooses broadcast joins on its own
    assert "BroadcastHashJoin" in plan


def test_small_dims_broadcast_in_regional(spark, sf_dir):
    """nation/region (fixed-size dims) keep explicit broadcast hints;
    customer (fact-scale) must not carry one."""
    from slow_tortoise_spark.queries import q_regional_rollup

    df = q_regional_rollup(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan  # nation/region hints survive
    import inspect

    src = inspect.getsource(q_regional_rollup)
    assert "F.broadcast(cust" not in src and "F.broadcast(orders" not in src


def test_semi_join_stays_semi(spark, sf_dir):
    plan = _plan(q_semi_join(spark, sf_dir))
    assert "LeftSemi" in plan


def test_aggregation_has_partial_combine(spark, sf_dir):
    plan = _plan(q_temporal_agg_month(spark, sf_dir))
    # partial → exchange → final hash aggregation (map-side combine)
    assert plan.count("HashAggregate") >= 2
    assert "Exchange hashpartitioning" in plan


def test_whole_stage_codegen_covers_agg(spark, sf_dir):
    df = q_pricing_summary(spark, sf_dir)
    df.collect()  # AQE only materializes codegen spans in the final plan
    plan = _plan(df)
    # '*(N)' prefixes mark WholeStageCodegen stages in the final plan;
    # the aggregate must sit inside one.
    assert "*(" in plan and ") HashAggregate" in plan


def test_tile_math_has_no_python_udf(spark, sf_dir):
    from slow_tortoise_spark.queries import q_tile_rollup

    plan = _plan(q_tile_rollup(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_rollup_uses_expand_single_shuffle(spark, sf_dir):
    """All-levels rollup must be one Expand + one aggregation exchange,
    not one shuffle per admin level."""
    from slow_tortoise_spark.queries import q_regional_rollup

    plan = _plan(q_regional_rollup(spark, sf_dir))
    assert "Expand" in plan
    # exactly one hash-partitioned exchange feeds the aggregation
    agg_exchanges = [ln for ln in plan.splitlines()
                     if "Exchange hashpartitioning" in ln]
    assert len(agg_exchanges) == 1, agg_exchanges


def test_simhash_near_dup_candidates_are_equi_joined(spark, sf_dir):
    """The 64-bit banded near-dup plan must form candidates via a hash
    equi-join on band values — never a nested-loop/cartesian pairing —
    and stay entirely JVM-side."""
    from slow_tortoise_spark.operators.dedup import simhash_near_duplicates
    from slow_tortoise_spark.sources.reader import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = (
        simhash_near_duplicates(docs, max_hamming=2, n_bits=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "band" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_unigram_logprob_vocab_join_no_nested_loop(spark, sf_dir):
    """The unigram-LM scoring joins the token stream to the vocab on an
    equi-key (hash or broadcast-hash under AQE) — a nested loop here
    would be quadratic in the corpus."""
    from slow_tortoise_spark.operators.text import unigram_logprob
    from slow_tortoise_spark.sources.reader import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = (
        unigram_logprob(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_jaccard_prefix_plan_uses_array_rescore(spark, sf_dir):
    """With the naive tier priced out (budget 0), the dispatched plan is
    the PPJoin prefix form: slice'd prefixes feed the candidate join and
    the rescore is a JVM-side array_intersect — the full shingle
    self-join never appears a second time."""
    from slow_tortoise_spark.operators.dedup import jaccard_pairs_auto
    from slow_tortoise_spark.sources.reader import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    df = jaccard_pairs_auto(docs, threshold=0.7, naive_budget=0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "array_intersect" in plan
    assert "slice" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dedup_lines_is_equi_joined_and_jvm_side(spark, sf_dir):
    """Line-level dedup joins lines to the duplicate-line table on the
    line-hash equi-key (nested loop would be quadratic in lines) and
    runs no Python in the plan; the rebuild is native array_sort."""
    from slow_tortoise_spark.operators.dedup import dedup_lines
    from slow_tortoise_spark.sources.reader import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = (
        dedup_lines(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "lhash" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bigram_logprob_no_nested_loop(spark, sf_dir):
    """Bigram LM scoring joins doc bigrams to the conditional-count
    tables on equi-keys only — a nested loop would be corpus-quadratic."""
    from slow_tortoise_spark.operators.text import bigram_logprob
    from slow_tortoise_spark.sources.reader import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = bigram_logprob(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_url_blocklist_filter_is_jvm_side_equi_join(spark, sf_dir):
    """Blocklist filtering: semi-join on domain + anti-join on doc_id,
    no Python stages, no nested loops."""
    from slow_tortoise_spark.operators.text import filter_blocklisted_domains
    from slow_tortoise_spark.sources.reader import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    bl = spark.createDataFrame([("spam.example.net",)], "domain string")
    plan = (
        filter_blocklisted_domains(docs, bl)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_cap_per_group_single_partial_window(spark, sf_dir):
    """The per-group cap is one window over the group partition — no
    global sort, no join, no Python."""
    from slow_tortoise_spark.operators.dedup import cap_per_group
    from slow_tortoise_spark.sources.reader import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    plan = (
        cap_per_group(docs, "source", cap=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Window") >= 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bucketed_join_is_exchange_free(spark, sf_dir, tmp_path_factory):
    """Two tables bucketed on the join key with the same bucket count
    join WITHOUT any exchange: the write-time layout replaces the
    read-time shuffle (the 100 TB repeated-join path). The same join
    over plain parquet must show exchanges — proving the elimination
    comes from the bucket spec, not from the data being small."""
    from slow_tortoise_spark.sources.bucketed import (
        cogrouped_join,
        is_exchange_free_join,
        write_bucketed,
    )
    from slow_tortoise_spark.sources.reader import read_table

    wh = tmp_path_factory.mktemp("bucketed_wh")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{wh}'")
    li = read_table(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = read_table(spark, f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    write_bucketed(li.withColumnRenamed("l_orderkey", "k"),
                   "bkt.li_b", "k", buckets=4)
    write_bucketed(orders.withColumnRenamed("o_orderkey", "k"),
                   "bkt.ord_b", "k", buckets=4)

    old = {c: spark.conf.get(c, None) for c in
           ("spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold")}
    try:
        # force a non-broadcast join so the exchange question is real
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        joined = cogrouped_join(spark, "bkt.li_b", "bkt.ord_b", "k")
        assert is_exchange_free_join(joined)
        # row parity with the plain shuffled join
        plain = li.join(orders,
                        li.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == plain
        plain_plan = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" in plain_plan  # control: unbucketed DOES shuffle
    finally:
        for c, v in old.items():
            spark.conf.set(c, v) if v is not None else spark.conf.unset(c)
        spark.sql("DROP TABLE IF EXISTS bkt.li_b")
        spark.sql("DROP TABLE IF EXISTS bkt.ord_b")
        spark.sql("DROP DATABASE IF EXISTS bkt")


def test_dup_span_removal_jvm_side_skew_safe_count(spark, sf_dir):
    """Span removal must stay JVM-side (no Python eval) and count window
    occurrences with a PARTIALLY-AGGREGATED groupBy — never a
    Window.partitionBy(w), whose hot key would pin an entire partition
    to one task that AQE cannot split."""
    from slow_tortoise_spark.operators.dedup import remove_duplicate_spans
    from slow_tortoise_spark.sources.reader import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet")
    plan = _plan(remove_duplicate_spans(docs, n=10))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan  # the skew-unsafe shape is banned
    # the exchange keys on the 128-bit IN-ROW window fingerprint (h1,
    # h2) — the window's raw text must never be a shuffle key (round-8
    # soak: string keys shuffled ~10x corpus bytes twice)
    assert "Exchange hashpartitioning(w" not in plan
    # partial aggregate below the count exchange (map-side combine)
    below = plan.split("Exchange hashpartitioning(h1", 1)[1]
    assert "HashAggregate" in below and "partial_count" in below


def test_winnow_fingerprints_is_map_only(spark, sf_dir):
    """Winnowing is a pure per-row computation: its plan must contain no
    exchange at all — grams, windows, argmin, distinct and sort all
    happen in-row, so the stage scales with input splits."""
    from slow_tortoise_spark.operators.text import winnow_fingerprints
    from slow_tortoise_spark.sources.reader import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet")
    plan = _plan(winnow_fingerprints(docs, k=5, w=4))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_probe_is_broadcast_join_with_bounded_build(spark, sf_dir):
    """The Bloom probe must broadcast the bits frame (<= 32768 rows by
    construction, never the corpus) and stay JVM-side; the build side's
    groupBy carries partial aggregation so each map task emits at most
    one word set."""
    from slow_tortoise_spark.operators.dedup import bloom_contamination
    from slow_tortoise_spark.sources.reader import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)
    df = bloom_contamination(train, test, n=5)
    plan = _plan(df)
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_gramian_shuffle_is_dimension_bounded(spark, sf_dir):
    """The explode gramian's exchange must sit ABOVE a partial
    HashAggregate: map-side combine collapses every partition to at most
    d^2 cells, so the shuffle never scales with row count."""
    from slow_tortoise_spark.operators.similarity import embedding_gramian
    from slow_tortoise_spark.sources.reader import read_table

    emb = read_table(spark, f"{sf_dir}/embeddings.parquet")
    plan = _plan(embedding_gramian(emb, method="explode"))
    # plans print top-down, so the partial HashAggregate (below the
    # exchange) must appear AFTER the exchange line in the text
    assert "Exchange hashpartitioning(i" in plan
    below = plan.split("Exchange hashpartitioning(i", 1)[1]
    assert "HashAggregate" in below and "partial_sum" in below
    assert "BatchEvalPython" not in plan


def test_headline_query_exchange_budgets(spark, sf_dir):
    """Shuffle-count regression pins for the headline bench queries:
    every Exchange (shuffle or broadcast) in these plans was audited in
    round 5; a future edit that silently adds one fails here and has to
    justify itself.  Budgets are the audited counts, not aspirations —
    lower is fine, higher is a review flag."""
    from slow_tortoise_spark import queries as Q
    from slow_tortoise_spark.operators.cachectl import (
        release_operator_caches,
    )

    # Deterministic baseline: frames cached by EARLIER tests substitute
    # into these plans via CacheManager logical-plan matching, and
    # explain() re-prints each cached subtree (its exchanges included)
    # under every InMemoryTableScan — inflating the TEXTUAL count for
    # reasons that are actually runtime wins.  Audit against a clean
    # cache state, as the driver's fresh session would.
    release_operator_caches()
    spark.catalog.clearCache()

    budgets = {
        "pricing_summary": 2,
        "top_orders": 3,
        "region_revenue": 7,
        "global_timeseries": 3,
        "regional_rollup": 5,
        "regional_extrema": 3,
        "qualifier_pivot": 3,
        "tile_rollup": 2,
        "grid_stats": 3,
        "minhash_lsh_pairs": 7,
        "ann_cosine_topk": 0,
        "token_stats": 1,
        "asof_join": 2,
        "rolling_window": 2,
        "salted_agg": 3,
        # Round-6 rotation wave — audited when these earned driver
        # CORRECTNESS rows (broadcast exchanges count too: e.g.
        # cms_token_counts broadcasts one counter table per sketch row,
        # mad_outliers pairs two bounded percentile aggs with a join).
        # +2 round-8: fan_out round-robins before the vocab and encode
        # tokenize/explode passes (no-ops on multi-file real inputs;
        # on the single-row-group test parquet they buy 32x scan
        # parallelism for the CPU-heavy stages)
        "bpe_encode": 7,
        "zorder_stats": 3,
        "latest_orders": 2,
        # 15 TEXTUAL round-8: the build is now cached (<=d*w rows) so
        # cms_estimate's four broadcast sides stop re-running the corpus
        # scan — but explain() re-prints the cached build subtree (its
        # fan_out + groupBy exchanges) under each InMemoryTableScan, so
        # the text count rises while executed exchanges fall to 9
        # (build 2, candidate fan_out+distinct 2, 4 broadcasts, sort 1)
        "cms_token_counts": 15,
        "nfc_normalize": 1,
        "strip_html": 1,
        "psi_drift": 4,
        "mad_outliers": 8,
        "resample_ffill": 4,
        "resample_linear": 4,
        "weighted_sample": 0,
        "negative_pairs": 5,
        "grouping_sets": 2,
        "salted_join": 3,
        # Round-9 additions, audited at first landing.  pq_topk /
        # ivfpq_topk are ZERO-exchange: training/probing collect their
        # driver-bounded codebooks eagerly, then the ranked scan is
        # map-only scoring + TakeOrderedAndProject.  pq_codes' one
        # exchange is the output posexplode ordering; pagerank's one is
        # the final orderBy (rounds are pre-materialized checkpoints);
        # bm25's seven: fan_out, tf/dfreq/score groupBys, the |query|-row
        # broadcast, the top-k sort.
        "pq_codes": 1,
        "pq_topk": 0,
        "ivfpq_topk": 0,
        # the returned frame is the exact re-rank over the collected
        # ADC candidate ids: an IN-filtered scan + TakeOrdered
        "ivfpq_rerank": 0,
        "pagerank_graph": 1,
        "bm25_rank": 7,
        # Round-10: like pagerank, the BFS rounds are pre-materialized
        # checkpoints — the returned plan's one exchange is the output
        # orderBy (per-round joins/anti-joins ran inside the operator)
        "harmonic_centrality": 1,
        "hyperball_harmonic": 1,
        "k_core": 1,
        "trustrank": 1,
        # Round-11: same skeleton — LP rounds, register rounds, and
        # peeling steps are pre-materialized checkpoints; the returned
        # plan's one exchange is the output orderBy.  pagerank_weighted
        # counts 3: the weight-building groupBy + its exchange feed the
        # edge frame (built inside the QUERY, not the operator) before
        # the operator's checkpointed rounds.
        "label_propagation": 1,
        "hyperball_closeness": 1,
        "core_number": 1,
        "pagerank_weighted": 3,
        # triangle_counts checkpoints its result inside the operator
        # (the join pyramid runs there); the returned plan is the
        # checkpointed frame + the query's orderBy
        "triangle_counts": 1,
        # the 4-row ANF curve is checkpointed inside the operator
        "neighborhood_function": 1,
        # transitivity's one row is checkpointed inside the operator;
        # no output sort, so the returned plan is exchange-free
        "transitivity": 0,
        # pack_sequences: one bucket-partitioned window shuffle + the
        # query's output orderBy — packing is a single-pass transform,
        # not an iterative operator
        "pack_sequences": 2,
        # hashed within-bucket order is one more SORT KEY, not an
        # extra exchange — same budget as the doc_id-ordered form
        "pack_sequences_shuffled": 2,
        # the loader-side index is MAP-ONLY on top of the manifest
        # (explode + integer overlap arithmetic): same 2 exchanges as
        # pack_sequences itself (window shuffle + output orderBy)
        "sequence_index": 2,
        # incremental packing: batch-0 pack window + new-batch pack
        # window + the broadcast of the <=n_buckets high-water rows +
        # the output orderBy; the high-water aggregate itself is a
        # bounded driver collect that runs before the plan is built
        "pack_sequences_append": 4,
        # budget selection's RETURNED plan: one single-partition
        # exchange feeding the exact window over ONLY the boundary
        # bucket + the output orderBy; the two driver aggregates
        # (min/max/total, bucket sums) run before the plan is built.
        # At this sf the r14 measured dispatch routes to the naive
        # single-window plan (1 exchange) — 2 stays the bounded-shape
        # ceiling
        "token_budget_select": 2,
        # grouped-histogram mix (r14): broadcast of the <=k meta rows,
        # the grouped boundary window's partitionBy(group) exchange,
        # and the output orderBy across the keep/boundary union; the
        # two grouped driver jobs (stats, histogram) run before the
        # plan is built
        "token_budget_mix": 4,
        # full tier is a map-only explode; the partial tier pays the
        # budget pass's window exchange + the output orderBy
        "token_budget_epochs": 2,
        # epoch plan (budget window at this sf: 1) + ONE bucket-
        # partitioned pack window + the output orderBy — epoch is a
        # sort key inside the pack window, not an extra exchange
        "pack_sequences_epochs": 3,
        # next-fit scan: ONE groupBy(bucket) exchange behind
        # applyInPandas + the output orderBy
        "pack_sequences_nosplit": 2,
        # weighted LP: rounds pre-materialized; 1 = the output orderBy;
        # +2 for the in-query weight build (groupBy + its exchange)
        "label_propagation_weighted": 3,
    }
    merged = dict(Q.QUERIES)
    merged.update(Q.VERIFIER_QUERIES)
    over = {}
    for name, budget in budgets.items():
        plan = _plan(merged[name](spark, sf_dir))
        n = plan.count("Exchange")
        if n > budget:
            over[name] = (n, budget)
    assert not over, f"exchange budget exceeded: {over}"


def test_exact_dedup_is_skew_safe(spark, sf_dir):
    """drop_exact_duplicates must find representatives via a partial
    groupBy + composite-key join-back — never a row_number window over
    the fingerprint, whose hot group would pin one task."""
    from slow_tortoise_spark.operators.dedup import drop_exact_duplicates
    from slow_tortoise_spark.sources.reader import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    plan = _plan(drop_exact_duplicates(docs))
    assert "Window" not in plan
    assert "partial_min" in plan  # map-side combine on the keeper agg


def test_cms_build_is_single_shuffle_with_partial_combine(spark, sf_dir):
    """The sketch build must collapse the corpus map-side: one hash
    exchange keyed (row, bucket), partial aggregation before it."""
    from slow_tortoise_spark.operators.sketch import cms_build
    from slow_tortoise_spark.operators.text import tokens_col
    from slow_tortoise_spark.sources.reader import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(tokens_col(F.lower(F.col("text")))).alias("tok")
    )
    plan = _plan(cms_build(toks, "tok", width=64, depth=4))
    shuffles = [ln for ln in plan.splitlines()
                if "Exchange hashpartitioning" in ln]
    assert len(shuffles) == 1
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_cms_estimate_broadcasts_the_sketch(spark, sf_dir):
    """Candidate keys must stream past broadcast counter tables — the
    corpus-sized side never shuffles for the probe."""
    from slow_tortoise_spark.operators.sketch import cms_build, cms_estimate
    from slow_tortoise_spark.operators.text import tokens_col
    from slow_tortoise_spark.sources.reader import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.explode(tokens_col(F.lower(F.col("text")))).alias("tok")
    )
    cms = cms_build(toks, "tok", width=64, depth=4)
    plan = _plan(cms_estimate(cms, toks.distinct(), "tok",
                              width=64, depth=4))
    assert plan.count("BroadcastExchange") >= 4  # one sketch row-table each
    assert "SortMergeJoin" not in plan


def test_dsir_ratio_join_is_broadcast(spark, sf_dir):
    """The buckets-row ratio frame must broadcast to the per-doc count
    side; the token stream itself joins nothing corpus-sized."""
    from slow_tortoise_spark.operators.text import dsir_weights
    from slow_tortoise_spark.sources.reader import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet")
    target = docs.filter(F.col("source") == "src0")
    plan = _plan(dsir_weights(docs, target, buckets=64))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sq_quantize_is_map_only(spark, sf_dir):
    """Quantization against the literal codebook must add no exchange:
    the codes column is computed inside the scan's codegen stage."""
    from slow_tortoise_spark.operators.similarity import sq_minmax, sq_quantize
    from slow_tortoise_spark.sources.reader import read_table

    emb = read_table(spark, f"{sf_dir}/embeddings.parquet")
    minmax = [(r["pos"], r["mn"], r["mx"])
              for r in sq_minmax(emb).collect()]
    plan = _plan(sq_quantize(emb, minmax))
    assert "Exchange" not in plan
    assert "pythonUDF" not in plan.lower()


def test_bloom_prefilter_adds_no_shuffle_to_big_side(spark, sf_dir):
    """Every Bloom probe must be a BroadcastHashJoin; the big side's
    only exchange (if any) belongs to the final equi-join, and the
    pre-filter demonstrably shrinks what that exchange carries."""
    from slow_tortoise_spark.operators.joins import bloom_prefilter
    from slow_tortoise_spark.sources.reader import read_table

    orders = read_table(spark, f"{sf_dir}/orders.parquet")
    keys = read_table(spark, f"{sf_dir}/customer.parquet").filter(
        "c_acctbal > 9000"
    ).select(F.col("c_custkey").alias("o_custkey"))
    pre = bloom_prefilter(orders, keys, "o_custkey", k=3)
    plan = _plan(pre)
    assert plan.count("BroadcastHashJoin") == 3  # one per hash
    # the bloom build executes ONCE: every probe reads the cached word
    # table (differing probe aliases defeat ReuseExchange, so without
    # the cache the keys-side aggregation would run k times)
    assert plan.count("InMemoryTableScan") == 3
    # and the big (orders) side never hash-partitions for the probes:
    # exchanges appear only inside the cached build's own subtree
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln and "o_orderkey" in ln:
            raise AssertionError(f"big side shuffled: {ln}")


def test_ivf_partitioned_index_prunes_at_the_scan(spark, sf_dir, tmp_path):
    """Persisted-IVF queries must push the cell probe into
    PartitionFilters: unprobed cells are skipped at file-listing time,
    not filtered after deserialization."""
    from slow_tortoise_spark.operators.similarity import (
        build_ivf_index,
        brute_force_topk,
        ivf_topk_from_path,
        write_ivf_index,
    )
    from slow_tortoise_spark.sources.reader import read_table

    emb = read_table(spark, f"{sf_dir}/embeddings.parquet")
    indexed, cents = build_ivf_index(emb, n_cells=8)
    path = str(tmp_path / "ivf")
    write_ivf_index(indexed, cents, path)

    query = [float(x) for x in emb.filter("vec_id = 0").first()["embedding"]]
    top = ivf_topk_from_path(spark, path, query, k=5, nprobe=3)
    plan = _plan(top)
    assert "PartitionFilters" in plan and "cell" in plan.split(
        "PartitionFilters", 1)[1].split("]", 1)[0]
    # and the persisted probe returns the same rows as the in-memory one
    got = [r["vec_id"] for r in top.collect()]
    assert got[0] == 0
    exact = [r["vec_id"] for r in brute_force_topk(emb, query, k=5).collect()]
    assert len(set(got) & set(exact)) >= 3


def test_text_tier_fans_out_narrow_scans(spark, sf_dir):
    """The CPU-heavy tokenize/explode passes must spread a narrow
    (single-row-group) scan across the cluster before the explode: the
    plan carries a round-robin exchange on the test parquet (a no-op
    guard on real multi-file inputs).  Round-8 find: without it the
    whole bigram-LM pass ran as ONE task."""
    from slow_tortoise_spark.operators.text import bigram_logprob
    from slow_tortoise_spark.sources.reader import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet")
    plan = _plan(bigram_logprob(docs))
    assert "RoundRobinPartitioning" in plan


def test_hof_token_arrays_are_materialized(spark, sf_dir):
    """HOF lambdas are interpreted with no subexpression elimination, so
    a tokenizer captured from outside the lambda re-runs per ELEMENT
    (per-row cost O(tokens x text length)).  The bigram and shingle
    builders must index a PRE-PROJECTED token-array attribute instead:
    the split() tokenizer may appear in the plan's projections but
    never inside a LambdaFunction body."""
    from slow_tortoise_spark.operators.dedup import doc_shingles
    from slow_tortoise_spark.operators.text import bigram_logprob
    from slow_tortoise_spark.sources.reader import read_table

    docs = read_table(spark, f"{sf_dir}/documents.parquet")
    # the bad shape indexes the INLINE tokenizer (filter(split(...)))
    # per element; the good shape indexes a projected attribute, so the
    # tokenizer only ever appears as a projection alias
    for df in (bigram_logprob(docs), doc_shingles(docs)):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        for bad in ("element_at(filter(split(", "slice(filter(split("):
            assert bad not in plan, (
                "tokenizer captured inside an HOF lambda "
                f"(re-evaluates per element): {bad}"
            )


def test_blanket_plan_audit_is_clean():
    """Repo-wide sweep: EVERY catalog + verifier query plan must be free
    of CartesianProduct, row-at-a-time Python, and undocumented Arrow
    Python stages (tools/plan_audit.py; the per-query pins above catch
    known shapes — this catches a NEW query regressing the blanket
    guarantees)."""
    import json
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "plan_audit.py")],
        capture_output=True, text=True, timeout=900, cwd=root,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    audit = json.loads(line)
    assert audit["queries"] >= 100  # both tiers actually enumerated
    assert audit["flagged"] == {}, audit["flagged"]


def test_gate_stage_single_tokenizer_eval(spark, sf_dir, tmp_path,
                                          monkeypatch):
    """The corpus gate (quality + repetition + language + Gopher) must
    evaluate the whitespace tokenizer EXACTLY once per row: one
    projected raw token array, a per-token lowercased sibling, and every
    gate operator indexing the attributes.  Before round 9 each operator
    re-tokenized (~4 split(trim(...)) per row in the gate plan)."""
    import re

    import slow_tortoise_spark.corpus_pipeline as cp
    from slow_tortoise_spark.corpus_pipeline import (
        CorpusParams,
        run_corpus_pipeline,
    )
    from slow_tortoise_spark.sources.reader import read_table

    plans = []
    orig = cp.tracked_local_checkpoint

    def spy(frame, eager=True):
        plans.append(frame._jdf.queryExecution().optimizedPlan().toString())
        return orig(frame, eager=eager)

    monkeypatch.setattr(cp, "tracked_local_checkpoint", spy)
    docs = read_table(spark, f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).limit(100)
    run_corpus_pipeline(
        spark, docs,
        CorpusParams(out_dir=str(tmp_path / "gate"), dedup="exact",
                     gopher_gate=True),
    )
    # first checkpoint boundary = the gate stage (no pre-gate stages on)
    gate_plan = plans[0]
    assert len(re.findall(r"split\(trim", gate_plan)) == 1, gate_plan[:4000]


def test_sequence_index_is_map_only_on_materialized_manifest(
    spark, tmp_path
):
    """On a MATERIALIZED manifest (the pipeline's {out_dir}/packing
    parquet — the 100 TB calling convention, where packing ran once
    and loaders derive views), sequence_index is exchange-FREE: one
    explode + integer overlap arithmetic, no shuffle/window/join.
    The catalog row's 2 exchanges both belong to the in-query
    manifest build + output sort, not to the index itself."""
    from pyspark.sql import Row

    from slow_tortoise_spark.operators.packing import (
        pack_sequences,
        sequence_index,
    )

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(["tok"] * (5 + i % 7)))
         for i in range(40)])
    path = str(tmp_path / "manifest.parquet")
    pack_sequences(docs, max_tokens=16, n_buckets=4).write.parquet(path)
    idx = sequence_index(spark.read.parquet(path), max_tokens=16)
    plan = _plan(idx)
    assert "Exchange" not in plan, plan
    assert idx.count() > 0
