"""Catalog rotations, replayed in commit order.  The driver hash-checks
at most 50 catalog queries per round; rotating proven verifier-tier
queries in (and multi-round-green catalog entries out, with sibling
coverage) is how every operator eventually earns a driver-side
CORRECTNESS row.  Each block preserves its original in-file comment;
the package applies them LAST so every name exists before its pop.
"""
from __future__ import annotations

from slow_tortoise_spark.queries.catalog import ORACLE_SQL, QUERIES
from slow_tortoise_spark.queries.verifier_core import (
    VERIFIER_ORACLE_SQL,
    VERIFIER_QUERIES,
)

# Round-5 rotation.  The driver catalog is capped at 50 entries, so the only
# way the driver ever hash-checks a verifier-tier query is to rotate it in.
# Twelve proven verifier queries move into the catalog; twelve multi-round-
# green catalog entries move out to the verifier tier, each leaving a sibling
# driver row covering its operator family:
#
#   out temporal_agg_month  -> weighted_agg / weighted_timeseries (A1-A3)
#   out region_id           -> regional_rollup / regional_timeseries (P12,R*)
#   out qualifier_counts    -> qualifier_pivot / output_summary (A8,V1)
#   out anti_join           -> window_topn + incoming stream_stream_join
#   out cube_agg            -> regional_rollup (grouping-sets family)
#   out event_sequences     -> asof_join + incoming sessionize_batch
#   out dedup_exact_docs    -> dedup_components + incoming incremental_dedup
#   out contamination       -> incoming containment_pairs (cross-corpus ngram)
#   out embedding_near_dups -> semdedup_pairs / ivf_topk / ann_cosine_topk
#   out bpe_pairs           -> token_stats + incoming tfidf_terms/doc_chunks
#   out tile_binning        -> tile_rollup / grid_stats (G1-G5)
#   out temperature_mix     -> incoming source_cap (corpus-composition family)
#
# Every query keeps its full-value DuckDB oracle on whichever tier it sits;
# bench.py reads the merged dict, so the measured set is rotation-invariant.
_ROTATE_IN = [
    "unigram_logprob", "xcorpus_logprob", "incremental_dedup",
    "sessionize_batch", "stream_stream_join", "tfidf_terms", "doc_chunks",
    "containment_pairs", "lsh_edit_funnel", "dedup_lines", "source_cap",
    "blocklist_filter",
]
_ROTATE_OUT = [
    "temporal_agg_month", "region_id", "qualifier_counts", "anti_join",
    "cube_agg", "event_sequences", "dedup_exact_docs", "contamination",
    "embedding_near_dups", "bpe_pairs", "tile_binning", "temperature_mix",
]
for _name in _ROTATE_IN:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name




# Round-5 late rotation (second batch).  The four late-round showpiece
# operators earn driver hash rows THIS round; four multi-round-green
# catalog entries step down to the verifier tier, each leaving a sibling
# driver row covering its family:
#
#   out pii_redact      -> token_stats / lang_id (text-scan family)
#   out range_join      -> asof_join (timejoin family)
#   out rolling_window  -> window_topn + verifier window_running/lag_lead
#   out approx_distinct -> percentiles (approximate/statistical aggregates)
#
# bench.py reads the merged dict, so the measured set stays invariant.
_ROTATE_IN_2 = [
    "dup_span_removal", "bloom_contamination", "kmeans_assign",
    "logreg_weights",
]
_ROTATE_OUT_2 = [
    "pii_redact", "range_join", "rolling_window", "approx_distinct",
]
for _name in _ROTATE_IN_2:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_2:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name




# Round-5 late rotation (third batch).  This session's showpiece
# operators earn driver hash rows; four extension-tier dedup rows step
# down to the verifier tier — the dedup family keeps nine driver rows
# (minhash_lsh_pairs, jaccard_pairs, simhash_near_dups, dedup_components,
# dedup_lines, dup_ngram_stats, dup_span_removal, streaming_index_dedup,
# bloom_contamination), so every out-rotated family stays driver-covered:
#
#   out containment_pairs -> jaccard_pairs / dup_span_removal (shingle
#                            containment family)
#   out lsh_edit_funnel    -> minhash_lsh_pairs (LSH candidate family)
#   out incremental_dedup  -> streaming_index_dedup (index-probe family)
#   out source_cap         -> temperature_mix-style keyed-hash family
#                             (hash_split verifier + dedup_lines driver)
#
# bench.py's measured set is untouched.
_ROTATE_IN_3 = ["sq_topk", "dsir_weights", "gopher_rules", "bloom_join"]
_ROTATE_OUT_3 = [
    "containment_pairs", "lsh_edit_funnel", "incremental_dedup",
    "source_cap",
]
for _name in _ROTATE_IN_3:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_3:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name




# Round-6 rotation.  The driver catalog is capped at 50, so the queries the
# round-5 judge listed as "never driver-hash-checked" rotate IN (14 of them,
# plus the new snapshot_time_travel above = 15 incoming); 15 multi-round-
# green catalog entries step down to the verifier tier, each leaving sibling
# driver coverage for its operator family:
#
#   out pricing_summary       -> grouping_sets (IN; lineitem one-pass agg)
#                                + regional_rollup
#   out top_orders            -> region_revenue (multi-join + agg + top-k)
#   out harmonized_union      -> global_timeseries (same harmonized reader)
#   out weighted_agg          -> weighted_timeseries (A3/A5 weighted path)
#   out qualifier_pivot       -> output_summary (qualifier family)
#   out regional_timeseries   -> regional_rollup (R1/R2 regional grains)
#   out regional_extrema      -> window_topn (ranked top-k w/ ties)
#                                + regional_rollup
#   out grid_stats            -> tile_rollup + zorder_stats (IN; tiles)
#   out lang_id               -> token_stats + nfc_normalize/strip_html (IN)
#   out minhash_lsh_pairs     -> jaccard_pairs + simhash_near_dups (near-dup)
#   out ann_cosine_topk       -> ivf_topk + sq_topk (embedding top-k)
#   out streaming_window_counts -> stream_stream_join + streaming_index_dedup
#   out sessionize_batch      -> asof_join (event-time join family)
#   out unigram_logprob       -> bigram_logprob + xcorpus_logprob (LM scoring)
#   out doc_chunks            -> tfidf_terms (document-structure family)
#
# salted_agg deliberately stays IN: its salt derivation changed this round
# (identical-row entropy fix) and the verdict requires a green driver row
# proving the fix.  Every query keeps its full-value DuckDB oracle on
# whichever tier it sits; bench.py's BENCH_QUERIES reads the merged dict,
# so the measured set is rotation-invariant.
_ROTATE_IN_4 = [
    "bpe_encode", "zorder_stats", "latest_orders", "cms_token_counts",
    "nfc_normalize", "strip_html", "psi_drift", "mad_outliers",
    "resample_ffill", "resample_linear", "weighted_sample",
    "negative_pairs", "grouping_sets", "salted_join",
]
_ROTATE_OUT_4 = [
    "pricing_summary", "top_orders", "harmonized_union", "weighted_agg",
    "qualifier_pivot", "regional_timeseries", "regional_extrema",
    "grid_stats", "lang_id", "minhash_lsh_pairs", "ann_cosine_topk",
    "streaming_window_counts", "sessionize_batch", "unigram_logprob",
    "doc_chunks",
]
for _name in _ROTATE_IN_4:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_4:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# Round-8 rotation (round-6/7 verdict item 1, two rounds overdue).  The
# twenty verifier-tier queries the judge listed as never driver-hash-
# checked rotate IN, alongside the new agg_snapshot_incremental (which
# registers directly in queries/snapshot.py and brings the pre-rotation
# catalog to 51).  Twenty-one multi-round-green catalog entries step
# down to the verifier tier, each leaving sibling driver coverage for
# its operator family:
#
#   out bigram_logprob     -> xcorpus_logprob + incoming kn_logprob (LM
#                             scoring — kn is the freshest code)
#   out blocklist_filter   -> incoming semi_join (filter-join family)
#   out bloom_contamination-> bloom_join (Bloom family)
#   out cms_token_counts   -> percentiles (approx/statistical aggs)
#   out dedup_components   -> dedup_lines / dup_span_removal /
#                             simhash_near_dups (dedup family keeps 5+
#                             driver rows)
#   out dsir_weights       -> xcorpus_logprob (cross-corpus weighting)
#   out global_timeseries  -> weighted_timeseries (A4/A5 spatial-agg)
#   out gopher_rules       -> incoming quality_score +
#                             repetition_ratio (quality-rule family)
#   out grouping_sets      -> regional_rollup (ROLLUP/sets family)
#   out dup_ngram_stats    -> dup_span_removal + incoming
#                             doc_fingerprints (n-gram stats family)
#   out latest_orders      -> window_topn + snapshot_time_travel
#                             (latest-wins family)
#   out logreg_weights     -> kmeans_assign + incoming
#                             embedding_gramian (linear-algebra family)
#   out mad_outliers       -> incoming skew_report + percentiles
#                             (robust-stats family)
#   out negative_pairs     -> weighted_sample + incoming
#                             stratified_sample / shuffle_rows /
#                             hash_split (keyed-hash sampling family)
#   out nfc_normalize      -> strip_html + incoming string_funcs
#                             (string-scalar family)
#   out psi_drift          -> incoming profile_table (distribution
#                             stats family)
#   out resample_ffill     -> resample_linear (gap-fill family)
#   out bpe_encode         -> token_stats (tokenizer family)
#   out tfidf_terms        -> token_stats (term-stats family)
#   out sq_topk            -> ivf_topk (embedding top-k family)
#   out stream_stream_join -> streaming_index_dedup (streaming tier)
#
# salted_agg/salted_join deliberately stay IN (the salt expression was
# hardened this round — ANSI-safe pmod mix — and needs a green driver
# row proving it), as do ppl_buckets-adjacent kn_logprob (rotating in)
# and snapshot_time_travel.  Every query keeps its full-value DuckDB
# oracle on whichever tier it sits; bench.py reads the merged dict, so
# the measured set is rotation-invariant.
_ROTATE_IN_8 = [
    "ppl_buckets", "kn_logprob", "winnow_fp", "embedding_gramian",
    "shuffle_rows", "stratified_sample", "edit_distance_verify",
    "domain_counts", "quality_score", "repetition_ratio",
    "doc_fingerprints", "hash_split", "profile_table", "skew_report",
    "window_lag_lead", "semi_join", "set_ops", "unpivot_melt",
    "string_funcs", "date_parts",
]
_ROTATE_OUT_8 = [
    "bigram_logprob", "blocklist_filter", "bloom_contamination",
    "cms_token_counts", "dedup_components", "dsir_weights",
    "global_timeseries", "gopher_rules", "grouping_sets",
    "dup_ngram_stats", "latest_orders", "logreg_weights",
    "mad_outliers", "negative_pairs", "nfc_normalize", "psi_drift",
    "resample_ffill", "bpe_encode", "tfidf_terms", "sq_topk",
    "stream_stream_join",
]
for _name in _ROTATE_IN_8:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_8:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# Round-8 late rotation: bucketed_merge_upsert (new this round — the
# bucket-level merge-on-write layer's first independent-engine witness)
# earns its driver hash row THIS round instead of waiting out a
# rotation cycle.  strip_html steps down after two green driver rounds
# (r6–r7); the string-scalar family keeps the string_funcs driver row
# (rotated in above) with nfc_normalize oracle-green in the verifier
# tier.  bench.py reads the merged dict, so the measured set is
# unchanged.
_ROTATE_IN_8L = ["bucketed_merge_upsert"]
_ROTATE_OUT_8L = ["strip_html"]
for _name in _ROTATE_IN_8L:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_8L:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# Round-9 rotation (round-8 verdict item 1).  The eight queries the judge
# cross-checked as never having had a driver-side CORRECTNESS row in ANY
# of r01-r08 rotate IN; after this round every query in the engine has a
# driver row on record.  Eight multi-round-green catalog entries step
# down to the verifier tier, each leaving sibling driver coverage for
# its operator family:
#
#   out resample_linear -> weighted_timeseries (temporal gap-fill family;
#                          resample_ffill oracle-green in verifier tier)
#   out weighted_sample -> stratified_sample / shuffle_rows / hash_split
#                          (keyed-hash sampling family, all driver-green r8)
#   out zorder_stats    -> tile_rollup (tile/layout family)
#   out kmeans_assign   -> ivf_topk (kmeans is IVF's training pass) +
#                          embedding_gramian (linear-algebra family)
#   out dedup_lines     -> dup_span_removal + incoming containment_pairs
#                          (line/span dedup family keeps 2 driver rows)
#   out bloom_join      -> semi_join (filter-join family; bloom_contamination
#                          oracle-green in verifier tier)
#   out json_extract    -> string_funcs (string-scalar family)
#   out percentiles     -> profile_table + skew_report (statistical-agg
#                          family, both driver-green r8)
#
# salted_agg/salted_join stay IN one more round (second driver row on the
# ANSI-hardened salt).  Every query keeps its full-value DuckDB oracle on
# whichever tier it sits; bench.py reads the merged dict, so the measured
# set is rotation-invariant.
_ROTATE_IN_9 = [
    "bpe_train", "containment_pairs", "incremental_dedup",
    "jaccard_pairs_naive", "lsh_edit_funnel", "simhash16", "source_cap",
    "window_rank_surface",
]
_ROTATE_OUT_9 = [
    "resample_linear", "weighted_sample", "zorder_stats", "kmeans_assign",
    "dedup_lines", "bloom_join", "json_extract", "percentiles",
]
for _name in _ROTATE_IN_9:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_9:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name

# --- Round-9 second-session wave: the SEVEN operators built this session
# (PQ codes/topk, IVFADC topk + exact re-rank, BM25, PageRank) plus
# semdedup_auto (built earlier in round 9) rotate IN immediately so
# CORRECTNESS_r09 witnesses every new operator in the round it landed —
# no new query waits a round for its first driver row.  Out: seven
# round-8 rotate-ins, each holding a driver-green r08 row and an
# in-catalog family sibling:
#   out shuffle_rows         -> hash_split (keyed-hash sampling family)
#   out stratified_sample    -> source_cap + hash_split (sampling family)
#   out edit_distance_verify -> lsh_edit_funnel (the funnel RUNS the
#                               banded edit-distance verify as its
#                               final stage)
#   out window_lag_lead      -> window_rank_surface + window_topn
#   out semi_join            -> set_ops (set-op/join-shape family)
#   out date_parts           -> validate_coercion + weighted_timeseries
#                               (temporal-scalar family)
#   out quality_score        -> token_stats + repetition_ratio
#                               (text-feature family)
_ROTATE_IN_9B = [
    "semdedup_auto", "pq_codes", "pq_topk", "ivfpq_topk", "ivfpq_rerank",
    "bm25_rank", "pagerank_graph",
]
_ROTATE_OUT_9B = [
    "shuffle_rows", "stratified_sample", "edit_distance_verify",
    "window_lag_lead", "semi_join", "date_parts", "quality_score",
]
for _name in _ROTATE_IN_9B:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_9B:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# --- Round-10 rotation: STALENESS-FIRST.  Previous rotations chased the
# judge's never-driver-checked lists; this round formalizes the policy
# (tests/test_catalog_contract.py::test_rotation_staleness_invariant):
# every query must either sit in the current catalog or carry a driver
# CORRECTNESS row within the last 5 recorded rounds.  IN: the 27 stalest
# verifier queries — the two NEVER driver-checked textio rows
# (csv_roundtrip / jsonl_roundtrip, round-9 verdict item 1) plus every
# query whose last driver row is r04 or older (rotated out in the r05/r06
# generations and resting since).  OUT: 27 of the 35 multi-row catalog
# entries (every one driver-green in BOTH r08 and r09, or longer); the 15
# round-9 rotate-ins keep their single row one more round per the r9
# plan.  Kept in catalog for family continuity: media_features (sole
# multimodal row), streaming_index_dedup (streaming index), salted_join
# (skew witness), xcorpus_logprob (LM family), dup_span_removal
# (span dedup), snapshot_time_travel (snapshot tier), token_stats
# (text features), weighted_timeseries (weighted temporal A3/A5).
# Sibling coverage for every OUT:
#   region_revenue/regional_rollup -> cube_agg, temporal_agg_*, region_id
#   tile_rollup        -> tile_binning
#   validate_coercion  -> region_id + qualifier_counts (P-family)
#   output_summary     -> rows_per_feature/region_lists/qualifier_counts
#   window_topn        -> window_running/rolling_window/window_rank_surface
#   asof_join          -> range_join + anti_join + event_sequences
#   jaccard_pairs      -> jaccard_pairs_naive/containment_pairs (in) +
#                         contamination (incoming)
#   salted_agg/skew_report -> salted_join (kept)
#   ivf_topk           -> ivfpq_topk/ivfpq_rerank/pq_topk (r9 singles) +
#                         embedding_near_dups/hyperplane_lsh_buckets (in)
#   semdedup_pairs     -> semdedup_auto; simhash_near_dups -> simhash16 +
#                         simhash (incoming)
#   doc_fingerprints/winnow_fp -> minhash_signatures (incoming)
#   set_ops            -> anti_join; hash_split -> source_cap +
#                         temperature_mix; string_funcs -> pii_redact
#   agg_snapshot_incremental/bucketed_merge_upsert -> snapshot_time_travel
#   domain_counts      -> qualifier_counts; embedding_gramian ->
#                         embedding_near_dups; profile_table ->
#                         approx_distinct; kn_logprob/ppl_buckets ->
#                         xcorpus_logprob (kept); repetition_ratio ->
#                         token_stats (kept); unpivot_melt -> cube_agg
# bench.py reads the merged dict, so the measured set stays invariant.
_ROTATE_IN_10 = [
    "csv_roundtrip", "jsonl_roundtrip",
    "hyperplane_lsh_buckets", "minhash_signatures", "temporal_agg_all",
    "dedup_drop", "region_lists", "rows_per_feature", "temporal_agg_year",
    "window_running", "simhash",
    "anti_join", "approx_distinct", "bpe_pairs", "contamination",
    "cube_agg", "dedup_exact_docs", "embedding_near_dups",
    "event_sequences", "pii_redact", "qualifier_counts", "range_join",
    "region_id", "rolling_window", "temperature_mix",
    "temporal_agg_month", "tile_binning",
]
_ROTATE_OUT_10 = [
    "region_revenue", "regional_rollup", "tile_rollup",
    "validate_coercion", "output_summary", "window_topn", "asof_join",
    "jaccard_pairs", "salted_agg", "ivf_topk", "semdedup_pairs",
    "simhash_near_dups", "doc_fingerprints", "set_ops", "hash_split",
    "string_funcs", "agg_snapshot_incremental", "bucketed_merge_upsert",
    "domain_counts", "embedding_gramian", "kn_logprob", "ppl_buckets",
    "profile_table", "repetition_ratio", "skew_report", "unpivot_melt",
    "winnow_fp",
]
for _name in _ROTATE_IN_10:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_10:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# --- Round-10 in-round wave: harmonic_centrality (NEW this round — the
# graph tier's second operator, round-9 verdict item 6) rotates in
# immediately so CORRECTNESS_r10 witnesses it the round it was built
# (contract rule 1: a new query never waits for its first driver row).
# Out: token_stats (driver-green r01–r09, the longest-tenured text row;
# the text-feature family keeps pii_redact + bpe_pairs, both rotated in
# above, with repetition_ratio/quality_score oracle-green in the
# verifier tier).
_ROTATE_IN_10B = ["harmonic_centrality"]
_ROTATE_OUT_10B = ["token_stats"]
for _name in _ROTATE_IN_10B:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_10B:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# --- Round-10 second wave: hyperball_harmonic (NEW — the sketch-based
# scale path for the exact harmonic operator; |V|x17 small-int state
# and one partial-agg shuffle per round where the exact tier carries
# the visited pair set) rotates in the round it was built (contract
# rule 1).  Out: streaming_index_dedup (driver-green r04-r09; the
# persisted-index dedup family keeps incremental_dedup, rotated in with
# the r9 wave, and the streaming writers keep csv/jsonl_roundtrip +
# snapshot_time_travel rows this round).
_ROTATE_IN_10C = ["hyperball_harmonic"]
_ROTATE_OUT_10C = ["streaming_index_dedup"]
for _name in _ROTATE_IN_10C:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_10C:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# --- Round-10 third wave: k_core (NEW — graph-tier degeneracy cleanup;
# unique order-independent fixpoint, oracle unrolls generous peeling
# rounds that no-op past convergence) rotates in the round it was
# built.  Out: dup_span_removal (driver-green r05-r09; the span/line
# dedup family keeps containment_pairs in the catalog with dedup_lines
# oracle-green in the verifier tier).
_ROTATE_IN_10D = ["k_core"]
_ROTATE_OUT_10D = ["dup_span_removal"]
for _name in _ROTATE_IN_10D:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_10D:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# --- Round-10 fourth wave: trustrank (NEW — personalized PageRank with
# seed-restricted teleport, the TrustRank crawl-gating score; completes
# the host-quality toolkit next to pagerank/harmonic/hyperball/k_core)
# rotates in the round it was built.  Out: xcorpus_logprob
# (driver-green r05-r09; the LM family keeps kn_logprob/ppl_buckets
# r08+r09 rows with bigram/unigram_logprob oracle-green in the
# verifier tier).
_ROTATE_IN_10E = ["trustrank"]
_ROTATE_OUT_10E = ["xcorpus_logprob"]
for _name in _ROTATE_IN_10E:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_10E:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# --- Round-11 rotation: STALENESS-FIRST, second application of the
# test_catalog_contract policy.  With CORRECTNESS_r10 recorded the
# 5-round window slides: the 15 queries whose last driver row is r05
# (the round-10 verdict's mandatory list) trip the staleness invariant
# NOW, and the 22 whose last row is r07 trip it next round — both
# groups rotate IN together so r12 starts with a clean two-round
# horizon (r08 group of 15 becomes binding only at r13).  OUT: 37
# catalog entries, every one driver-green in r10 (the r10 staleness
# wave's rotate-ins after their row landed, the r9 doubles holding
# r09+r10 rows, and salted_join after five straight green rounds
# r06–r10).  Kept in catalog AT THIS WAVE: the six single-row r10
# entries (csv/jsonl_roundtrip + the four new graph operators, each
# earning a second row per the r9 precedent) and the three
# long-tenure anchors media_features (sole multimodal row),
# weighted_timeseries, snapshot_time_travel — of which the in-round
# waves BELOW later rest weighted_timeseries (wave F, replaced by the
# incoming triangle_counts) and snapshot_time_travel (wave G,
# replaced by neighborhood_function); media_features stays, still the
# sole multimodal row.  Read the LAST wave for the catalog the driver
# actually sees.
#
# Sibling coverage for every OUT (family -> driver row in the r11
# catalog unless noted):
#   temporal_agg_month/year/all, region_id -> weighted_timeseries
#       (kept) + regional_timeseries/global_timeseries (in)
#   qualifier_counts, region_lists, rows_per_feature -> qualifier_pivot
#       (in) + weighted_agg (in); output_summary r09-green in verifier
#   anti_join, range_join, event_sequences -> sessionize_batch (in);
#       asof_join r09-green in verifier
#   cube_agg -> grouping_sets (in)
#   window_running, rolling_window, window_rank_surface ->
#       regional_extrema + latest_orders (in, window min/max + ties and
#       window latest-wins); window_topn r09-green in verifier
#   tile_binning -> grid_stats (in, exploded-zoom tile family)
#   approx_distinct -> cms_token_counts (in, approx-agg family)
#   simhash, simhash16 -> minhash_lsh_pairs (in, near-dup family)
#   hyperplane_lsh_buckets, minhash_signatures, embedding_near_dups ->
#       minhash_lsh_pairs + ann_cosine_topk (in)
#   dedup_drop, dedup_exact_docs, incremental_dedup ->
#       dedup_components (in); streaming_index_dedup r09 verifier
#   contamination, containment_pairs -> bloom_contamination (in)
#   jaccard_pairs_naive, lsh_edit_funnel -> minhash_lsh_pairs (in);
#       jaccard_pairs r09-green in verifier
#   bpe_pairs, bpe_train -> bpe_encode (in, tokenizer family)
#   pii_redact -> lang_id + strip_html (in, text-scan family)
#   temperature_mix, source_cap -> negative_pairs (in, keyed-hash
#       sampling family); hash_split/stratified_sample r08+ verifier
#   ivfpq_topk, ivfpq_rerank -> ann_cosine_topk + sq_topk (in,
#       embedding top-k); pq_topk holds its slot until the in-round
#       waves below
#   pagerank_graph -> harmonic_centrality / hyperball_harmonic /
#       k_core / trustrank (kept — the graph tier keeps four rows)
#   salted_join -> skew family rests on r09 (salted_agg) + r10
#       (salted_join) rows; tools/skew_probe.py + ANSI-salt tests
#       stay the regression guard
# bench.py reads the merged dict, so the measured set is invariant.
_ROTATE_IN_11 = [
    # last driver row r05 — binding now
    "ann_cosine_topk", "doc_chunks", "grid_stats", "harmonized_union",
    "lang_id", "minhash_lsh_pairs", "pricing_summary", "qualifier_pivot",
    "regional_extrema", "regional_timeseries", "sessionize_batch",
    "streaming_window_counts", "top_orders", "unigram_logprob",
    "weighted_agg",
    # last driver row r07 — binding at r12
    "bigram_logprob", "blocklist_filter", "bloom_contamination",
    "bpe_encode", "cms_token_counts", "dedup_components", "dsir_weights",
    "dup_ngram_stats", "global_timeseries", "gopher_rules",
    "grouping_sets", "latest_orders", "logreg_weights", "mad_outliers",
    "negative_pairs", "nfc_normalize", "psi_drift", "resample_ffill",
    "sq_topk", "stream_stream_join", "strip_html", "tfidf_terms",
]
_ROTATE_OUT_11 = [
    "anti_join", "approx_distinct", "bpe_pairs", "bpe_train",
    "containment_pairs", "contamination", "cube_agg", "dedup_drop",
    "dedup_exact_docs", "embedding_near_dups", "event_sequences",
    "hyperplane_lsh_buckets", "incremental_dedup", "ivfpq_rerank",
    "ivfpq_topk", "jaccard_pairs_naive", "lsh_edit_funnel",
    "minhash_signatures", "pagerank_graph", "pii_redact",
    "qualifier_counts", "range_join", "region_id", "region_lists",
    "rolling_window", "rows_per_feature", "salted_join", "simhash",
    "simhash16", "source_cap", "temperature_mix", "temporal_agg_all",
    "temporal_agg_month", "temporal_agg_year", "tile_binning",
    "window_rank_surface", "window_running",
]
for _name in _ROTATE_IN_11:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_11:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# --- Round-11 in-round waves: contract rule 1 (a new query never waits
# a round for its first driver row) — each operator built this round
# rotates in immediately; each OUT holds r09+r10 driver rows and named
# family siblings.
#
# Wave B: label_propagation (NEW — synchronous min-tie-break community
# labels, the graph tier's clustering signal next to its centralities).
# Out: bm25_rank (r09+r10 rows; the ranking/term family keeps
# tfidf_terms, rotated in above, with token_stats r01–r09 in the
# verifier tier).
_ROTATE_IN_11B = ["label_propagation"]
_ROTATE_OUT_11B = ["bm25_rank"]
for _name in _ROTATE_IN_11B:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_11B:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# Wave C: hyperball_closeness (NEW — the second geometric centrality
# off the shared HyperBall register loop).  Out: pq_codes (r09+r10
# rows; the PQ family keeps ivfpq_topk/ivfpq_rerank oracle-green in
# the verifier tier and pq_topk's slot goes in wave D).
_ROTATE_IN_11C = ["hyperball_closeness"]
_ROTATE_OUT_11C = ["pq_codes"]
for _name in _ROTATE_IN_11C:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_11C:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# Wave D: pagerank_weighted (NEW — link-count edge weights, the real
# host-graph shape; property-pinned equal to integer edge
# replication).  Out: pq_topk (r09+r10 rows; ADC scoring stays
# verifier-covered by pq_codes/ivfpq_topk oracles).
_ROTATE_IN_11D = ["pagerank_weighted"]
_ROTATE_OUT_11D = ["pq_topk"]
for _name in _ROTATE_IN_11D:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_11D:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# Wave E: core_number (NEW — full degeneracy decomposition; k_core
# answers one threshold, this ranks every node by coreness).  Out:
# semdedup_auto (r09+r10 rows; the semantic-dedup family keeps
# semdedup_pairs + embedding_near_dups oracle-green in the verifier
# tier and ann_cosine_topk in the catalog).
_ROTATE_IN_11E = ["core_number"]
_ROTATE_OUT_11E = ["semdedup_auto"]
for _name in _ROTATE_IN_11E:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_11E:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# Wave F: triangle_counts (NEW — per-node triangle counts + local
# clustering coefficient via degree-ordered path closure, the local-
# density spam-ring signal next to centrality/coreness/communities).
# Out: weighted_timeseries (driver-green r01–r10, the longest-tenured
# row in the catalog; the weighted temporal family keeps
# regional_timeseries/global_timeseries, rotated in this round, with
# weighted_agg also in the catalog).
_ROTATE_IN_11F = ["triangle_counts"]
_ROTATE_OUT_11F = ["weighted_timeseries"]
for _name in _ROTATE_IN_11F:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_11F:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# Wave G: neighborhood_function (NEW — ANF curve + 90% effective
# diameter, the whole-graph connectivity health check; Palmer et al.
# 2002 / HyperANF).  Out: snapshot_time_travel (driver-green r06–r10,
# five straight rounds; the snapshot tier keeps csv/jsonl_roundtrip
# rows in catalog with agg_snapshot_incremental / bucketed_merge_upsert
# oracle-green in the verifier tier).
_ROTATE_IN_11G = ["neighborhood_function"]
_ROTATE_OUT_11G = ["snapshot_time_travel"]
for _name in _ROTATE_IN_11G:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_11G:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# Wave H: transitivity (NEW — global clustering coefficient 3T/W, the
# one-number density companion to triangle_counts).  Out:
# harmonic_centrality (r10+r11-pending single... holds its r10 row
# through r14 under the staleness contract; the geometric-centrality
# family keeps hyperball_harmonic + hyperball_closeness +
# neighborhood_function rows in the catalog, and the exact tier stays
# pytest/property-pinned).
_ROTATE_IN_11H = ["transitivity"]
_ROTATE_OUT_11H = ["harmonic_centrality"]
for _name in _ROTATE_IN_11H:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_11H:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# Wave I: label_propagation_weighted (NEW — LP with link-count vote
# weights; integer sums keep the tie-break replay exact).  Out: k_core
# (r10 row holds through r14; core_number — the full decomposition
# that SUBSUMES k_core — is in the catalog, and the peeling loop stays
# pinned by the hand-cascade/hypothesis/margin tests).
_ROTATE_IN_11I = ["label_propagation_weighted"]
_ROTATE_OUT_11I = ["k_core"]
for _name in _ROTATE_IN_11I:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_11I:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# Wave J: pack_sequences (NEW — concat-and-chunk training-sequence
# packing manifest, the LM batching prep step; md5-bucketed so the
# inherently-sequential cumsum parallelizes per shard).  Out:
# jsonl_roundtrip (r10 row holds through r14; the textio family keeps
# csv_roundtrip in the catalog for its second-row witness).
_ROTATE_IN_11J = ["pack_sequences"]
_ROTATE_OUT_11J = ["jsonl_roundtrip"]
for _name in _ROTATE_IN_11J:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_11J:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# ---------------------------------------------------------------------------
# Round-12 rotation (wave A): staleness-first, one round AHEAD of the
# contract.  IN (21): the full last-row-r08 group (15 queries — they
# would bind test_rotation_staleness_invariant at r13; rotating at r12
# keeps the ledger a round ahead, the r10/r11 discipline), five of the
# last-row-r09 group (asof_join jaccard_pairs regional_rollup
# salted_agg output_summary — lightening the 31-query group that binds
# at r14), and the NEW pack_sequences_shuffled (contract rule 1: a
# never-driver-checked query enters the catalog the round it is
# built).  The nine round-11 operators (label_propagation ±weights,
# core_number, hyperball_closeness, neighborhood_function,
# triangle_counts, transitivity, pagerank_weighted, pack_sequences)
# deliberately STAY for their second consecutive driver row (the
# r9/r10 precedent for resting new operators).
#
# OUT (21), every one r11-green (row holds through r16) with family
# coverage remaining in the catalog or arriving this wave:
#   media_features        — 11 consecutive rows (r01–r11), the longest
#                           tenure in the engine; multimodal stays
#                           pytest + media-soak pinned
#   global_timeseries     — 8 rows; spatial agg keeps weighted_agg +
#                           incoming regional_rollup
#   ann_cosine_topk       — 6 rows; ANN keeps sq_topk (ivfpq_* r10)
#   top_orders            — 6 rows; star keeps pricing_summary +
#                           latest_orders
#   qualifier_pivot       — 6 rows; pivot/grouping keeps grouping_sets
#   regional_extrema      — 6 rows; incoming regional_rollup +
#                           window_lag_lead cover extrema/window
#   regional_timeseries   — 6 rows; same family
#   lang_id               — 6 rows; text keeps tfidf_terms +
#                           nfc_normalize + bpe_encode + incoming
#                           quality_score
#   minhash_lsh_pairs     — 6 rows; dedup keeps incoming jaccard_pairs
#                           + dedup_lines
#   streaming_window_counts — 5 rows; streaming keeps
#                           stream_stream_join + sessionize_batch
#   dup_ngram_stats       — 6 rows; ngram family: incoming
#                           jaccard_pairs
#   dedup_components      — 5 rows; CC family: incoming dedup_lines +
#                           jaccard_pairs feed the same component loop
#   bigram_logprob        — 5 rows; LM tier keeps unigram_logprob
#   blocklist_filter      — 4 rows; gating: incoming quality_score
#   bloom_contamination   — 4 rows; bloom family: incoming bloom_join
#   dsir_weights          — 4 rows; importance weighting: keeps
#                           unigram_logprob (same token-distribution
#                           machinery)
#   gopher_rules          — 4 rows; quality gates: incoming
#                           quality_score
#   logreg_weights        — 4 rows; model scoring: keeps sq_topk +
#                           incoming kmeans_assign
#   psi_drift             — 3 rows; drift family keeps mad_outliers
#   negative_pairs        — 3 rows; sampling: incoming
#                           stratified_sample + weighted_sample +
#                           shuffle_rows
#   strip_html            — 3 rows; text cleanup: keeps nfc_normalize
_ROTATE_IN_12A = [
    "bloom_join", "date_parts", "dedup_lines", "edit_distance_verify",
    "json_extract", "kmeans_assign", "percentiles", "quality_score",
    "resample_linear", "semi_join", "shuffle_rows", "stratified_sample",
    "weighted_sample", "window_lag_lead", "zorder_stats",
    "asof_join", "jaccard_pairs", "regional_rollup", "salted_agg",
    "output_summary",
    "pack_sequences_shuffled",
]
_ROTATE_OUT_12A = [
    "media_features", "global_timeseries", "ann_cosine_topk",
    "top_orders", "qualifier_pivot", "regional_extrema",
    "regional_timeseries", "lang_id", "minhash_lsh_pairs",
    "streaming_window_counts", "dup_ngram_stats", "dedup_components",
    "bigram_logprob", "blocklist_filter", "bloom_contamination",
    "dsir_weights", "gopher_rules", "logreg_weights", "psi_drift",
    "negative_pairs", "strip_html",
]
for _name in _ROTATE_IN_12A:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_12A:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# Wave B: sequence_index (NEW — the loader-side inverse of the packing
# manifest: which document token slices fill each training sequence;
# map-only explode + integer overlap arithmetic on top of
# pack_sequences, replayed by a generate_series oracle).  Contract
# rule 1: a never-driver-checked query enters the catalog the round it
# is built.  Out: hyperball_harmonic (r10+r11 rows — the second-row
# precedent satisfied; the geometric-centrality family keeps
# hyperball_closeness + neighborhood_function driver rows in the
# catalog, and the register loop is shared code with both).
_ROTATE_IN_12B = ["sequence_index"]
_ROTATE_OUT_12B = ["hyperball_harmonic"]
for _name in _ROTATE_IN_12B:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_12B:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# Wave C: token_budget_select (NEW — budget-capped quality selection:
# keep the best docs until a token budget is spent, the data-mixing
# primitive; engine = bounded bucketed-threshold passes, oracle = the
# naive global-window cumsum the distributed plan replaces).  Contract
# rule 1.  Out: csv_roundtrip (r10+r11 rows — second-row precedent
# satisfied; the textio family's jsonl_roundtrip sibling holds its r10
# row and both stay oracle-checked in the verifier tier).
_ROTATE_IN_12C = ["token_budget_select"]
_ROTATE_OUT_12C = ["csv_roundtrip"]
for _name in _ROTATE_IN_12C:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_12C:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# ---------------------------------------------------------------------------
# Round-13 rotation (wave A).  IN (27): the FULL last-row-r09 group
# (26 queries — they bind test_rotation_staleness_invariant once
# CORRECTNESS_r13 lands; named in NOTES §round-13 #1 and in the r12
# verdict as the round's mandatory item) plus the NEW
# pack_sequences_append (contract rule 1: a never-driver-checked
# query enters the catalog the round it is built).  The three
# round-12 operators (pack_sequences_shuffled, sequence_index,
# token_budget_select) deliberately STAY for their second consecutive
# driver row — the r9–r12 precedent for resting new operators.
#
# OUT (27), every one holding a fresh r12 row (holds through r16):
# the 20 round-12A staleness-refresher rotate-ins (they came in
# precisely to refresh their r08/r09 ledger rows — done) and 7 of the
# 9 round-11 operators, now resting on r11+r12 consecutive rows.
# core_number and triangle_counts stay a third round: core_number
# witnesses the r12 single-histogram rewrite with one more driver row,
# and triangle_counts keeps the triangle/clustering family
# driver-covered while transitivity rests.  Family coverage:
#   bloom_join           — bloom pruning stays pytest-pinned;
#                          bloom_contamination verifier-checked;
#                          incoming streaming_index_dedup covers the
#                          index-probe shape
#   semi_join            — incoming set_ops (join/set family)
#   asof_join            — sessionize_batch + resample_ffill stay
#                          (temporal-join family)
#   window_lag_lead      — incoming window_topn
#   date_parts, json_extract — incoming string_funcs (scalar tier)
#   percentiles          — incoming profile_table (stats summary)
#   resample_linear      — resample_ffill stays
#   kmeans_assign        — incoming ivf_topk; sq_topk stays (ANN)
#   quality_score        — incoming repetition_ratio (quality gates)
#   dedup_lines, jaccard_pairs — incoming dup_span_removal,
#                          simhash_near_dups, semdedup_pairs,
#                          doc_fingerprints (dedup family keeps 5+
#                          driver rows)
#   edit_distance_verify — incoming winnow_fp + simhash_near_dups
#                          (verify/fingerprint family)
#   shuffle_rows, stratified_sample, weighted_sample — incoming
#                          hash_split (keyed-hash sampling family)
#   zorder_stats         — grid_stats stays; incoming tile_rollup
#                          (layout/spatial family)
#   regional_rollup      — incoming region_revenue + tile_rollup;
#                          grouping_sets stays
#   salted_agg           — incoming skew_report (skew family)
#   output_summary       — incoming profile_table + validate_coercion
#   label_propagation (±weighted), hyperball_closeness,
#   neighborhood_function, pagerank_weighted, transitivity —
#                          graph family keeps core_number,
#                          triangle_counts, trustrank driver rows;
#                          every rested op r11+r12 green
#   pack_sequences       — packing family keeps
#                          pack_sequences_shuffled + sequence_index
#                          + incoming pack_sequences_append (whose
#                          oracle replays the base operator's window
#                          verbatim on the union)
_ROTATE_IN_13A = [
    "agg_snapshot_incremental", "bucketed_merge_upsert",
    "doc_fingerprints", "domain_counts", "dup_span_removal",
    "embedding_gramian", "hash_split", "ivf_topk", "kn_logprob",
    "ppl_buckets", "profile_table", "region_revenue",
    "repetition_ratio", "semdedup_pairs", "set_ops",
    "simhash_near_dups", "skew_report", "streaming_index_dedup",
    "string_funcs", "tile_rollup", "token_stats", "unpivot_melt",
    "validate_coercion", "window_topn", "winnow_fp",
    "xcorpus_logprob",
    "pack_sequences_append",
]
_ROTATE_OUT_13A = [
    "bloom_join", "date_parts", "dedup_lines",
    "edit_distance_verify", "json_extract", "kmeans_assign",
    "percentiles", "quality_score", "resample_linear", "semi_join",
    "shuffle_rows", "stratified_sample", "weighted_sample",
    "window_lag_lead", "zorder_stats", "asof_join", "jaccard_pairs",
    "regional_rollup", "salted_agg", "output_summary",
    "label_propagation", "label_propagation_weighted",
    "hyperball_closeness", "neighborhood_function",
    "pagerank_weighted", "transitivity", "pack_sequences",
]
for _name in _ROTATE_IN_13A:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_13A:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# Wave B: token_budget_mix (NEW — the data-mixing recipe primitive:
# per-source budget-capped greedy prefixes, unnamed sources dropped;
# one bounded token_budget_select pass per named source, NEVER the
# per-group window whose hot source is one straggler task).  Contract
# rule 1: a never-driver-checked query enters the catalog the round
# it is built.  Out: trustrank (r10+r11+r12 consecutive rows — past
# the second-row precedent; the graph family keeps core_number and
# triangle_counts driver rows, and the seed-normalized teleport loop
# stays pinned by the trustrank replay oracle in the verifier tier).
_ROTATE_IN_13B = ["token_budget_mix"]
_ROTATE_OUT_13B = ["trustrank"]
for _name in _ROTATE_IN_13B:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_13B:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# Wave C: token_budget_epochs (NEW — the data-constrained epoch plan:
# full corpus repeats up to min(budget div total, max_epochs) plus one
# partial epoch holding the budget remainder's greedy prefix; map-only
# full tier + the bounded budget pass).  Contract rule 1.  Out:
# doc_chunks (r5+r11+r12 rows — past the second-row precedent; the
# chunking/packing family keeps pack_sequences_shuffled,
# sequence_index, and the incoming pack_sequences_append driver rows,
# and doc_chunks stays oracle-checked in the verifier tier).
_ROTATE_IN_13C = ["token_budget_epochs"]
_ROTATE_OUT_13C = ["doc_chunks"]
for _name in _ROTATE_IN_13C:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_13C:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name


# --- Round 14 ---------------------------------------------------------------
# Wave A: the last-row-r10 staleness group (46 queries — bigger than
# one wave) binds test_rotation_staleness_invariant when
# CORRECTNESS_r15 lands (latest 15 ⇒ stale if last driver row < 11).
# NOTES planned the split: ~24 rotate in here, the remaining 22 rotate
# at r15 (they are IN the r15 catalog when r15 lands, so rule 2 never
# sees them stale).  This wave takes the alphabetical front of the
# group — a cross-section of the join, sketch, BPE, dedup, ANN, graph,
# and IO families — plus pack_sequences_epochs (contract rule 1: a
# never-driver-checked query enters the catalog the round it is
# built; it is the r13-verdict epochs→packing e2e wiring).
#
# The four r13 newcomers (pack_sequences_append, token_budget_mix,
# token_budget_epochs) HOLD for their second consecutive driver rows
# (the r9–r13 precedent), and token_budget_select holds for a THIRD
# row as the post-rewrite witness of this round's naive/bounded
# dispatch (the core_number r12 precedent); token_budget_mix's r14 row
# doubles as the witness of its grouped-histogram rewrite.
#
# OUT (25), every one holding a fresh r13 row (holds through r17):
# core_number + triangle_counts (r11+r12+r13 — past the second-row
# precedent; graph coverage passes to incoming harmonic_centrality,
# k_core, pagerank_graph), pack_sequences_shuffled + sequence_index
# (r12+r13 — packing keeps pack_sequences_append + incoming
# pack_sequences_epochs, whose oracle replays the same window shape
# over the epoch plan), and 21 of the 26 r13A staleness refreshers
# (they came in to refresh r09/r10 ledger rows — done).  Five
# refreshers STAY for family coverage alongside the incoming wave:
# validate_coercion (validation tier), token_stats (text stats),
# skew_report (skew family — no incoming sibling), profile_table
# (stats summary), region_revenue (star joins).  Other family notes:
#   doc_fingerprints, winnow_fp — incoming minhash_signatures +
#                          lsh_edit_funnel (fingerprint/verify)
#   dup_span_removal, semdedup_pairs, simhash_near_dups — incoming
#                          containment_pairs, dedup_drop,
#                          dedup_exact_docs, jaccard_pairs_naive,
#                          incremental_dedup, embedding_near_dups
#   ivf_topk, embedding_gramian — incoming ivfpq_topk, ivfpq_rerank;
#                          sq_topk stays
#   kn_logprob, ppl_buckets, xcorpus_logprob — unigram_logprob,
#                          bpe_encode stay; incoming bpe_pairs,
#                          bpe_train
#   set_ops, string_funcs, unpivot_melt, window_topn — incoming
#                          anti_join, cube_agg, approx_distinct;
#                          grouping_sets, mad_outliers stay
#   streaming_index_dedup — stream_stream_join stays; incoming
#                          incremental_dedup covers the index-probe
#                          shape
#   tile_rollup          — grid_stats stays; tile_binning rotates at
#                          r15
#   agg_snapshot_incremental, bucketed_merge_upsert — latest_orders
#                          stays (snapshot/CDC); snapshot_time_travel
#                          rotates at r15
#   domain_counts, repetition_ratio, hash_split — incoming pii_redact,
#                          bm25_rank; token_stats stays
_ROTATE_IN_14A = [
    "anti_join", "approx_distinct", "bm25_rank", "bpe_pairs",
    "bpe_train", "containment_pairs", "contamination", "cube_agg",
    "dedup_drop", "dedup_exact_docs", "embedding_near_dups",
    "event_sequences", "harmonic_centrality",
    "hyperplane_lsh_buckets", "incremental_dedup", "ivfpq_rerank",
    "ivfpq_topk", "jaccard_pairs_naive", "jsonl_roundtrip", "k_core",
    "lsh_edit_funnel", "minhash_signatures", "pagerank_graph",
    "pii_redact",
    "pack_sequences_epochs",
    # contract rule 1, built mid-round-14: no-split (next-fit) packing
    # enters the catalog the round it is built; grouping_sets makes
    # room (fresh r13 row, holds through r17; incoming cube_agg covers
    # the grouping family, mad_outliers stays for robust stats).
    "pack_sequences_nosplit",
]
_ROTATE_OUT_14A = [
    "core_number", "triangle_counts", "pack_sequences_shuffled",
    "sequence_index",
    "agg_snapshot_incremental", "bucketed_merge_upsert",
    "doc_fingerprints", "domain_counts", "dup_span_removal",
    "embedding_gramian", "hash_split", "ivf_topk", "kn_logprob",
    "ppl_buckets", "repetition_ratio", "semdedup_pairs", "set_ops",
    "simhash_near_dups", "streaming_index_dedup", "string_funcs",
    "tile_rollup", "unpivot_melt", "window_topn", "winnow_fp",
    "xcorpus_logprob",
    "grouping_sets",
]
for _name in _ROTATE_IN_14A:
    QUERIES[_name] = VERIFIER_QUERIES.pop(_name)
    ORACLE_SQL[_name] = VERIFIER_ORACLE_SQL.pop(_name)
for _name in _ROTATE_OUT_14A:
    VERIFIER_QUERIES[_name] = QUERIES.pop(_name)
    VERIFIER_ORACLE_SQL[_name] = ORACLE_SQL.pop(_name)
del _name
