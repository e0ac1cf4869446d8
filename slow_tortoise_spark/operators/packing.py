"""Training-sequence packing: assign documents to fixed-length LM
context windows (the "concatenate everything, cut every max_tokens"
batching that GPT-style training uses) as a pure DataFrame transform.

Reference scope note: the reference pipeline (uncharted-causemos/
slow-tortoise) has no training-batch tier — this is part of the
LLM-training extension surface, same as the dedup/similarity/graph
families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F



def _doc_tokens(token_count_col: str | None, text_col: str, opname: str):
    """Token-count Column shared by the packing family: the explicit
    count column (NULLs RAISE — the ``graph._edge_weight`` discipline;
    ``greatest(NULL, 0)`` would silently pack a doc as 0 tokens) or a
    whitespace-split count of ``text_col``."""
    if token_count_col is not None:
        c = F.col(token_count_col).cast("long")
        return F.when(
            c.isNull(),
            F.raise_error(F.lit(
                f"{opname}: NULL token count in "
                f"'{token_count_col}' (counts must be non-null; pass "
                "0 explicitly for zero-token docs)"
            )),
        ).otherwise(c)
    return F.size(
        F.filter(
            F.split(F.trim(F.col(text_col)), r"\s+"),
            lambda t: t != "",
        )
    ).cast("long")


def _pack_bucket(id_col: str, n_buckets: int):
    """Shard assignment: first 16 bits of md5('pack:' || id) mod
    n_buckets — md5-keyed (no RNG, no engine-specific hash), capping
    ``n_buckets`` at 65536.  NULL ids RAISE (the token-budget family's
    loud-guard discipline): md5(NULL) would silently shard every
    unnamed doc into one NULL bucket — and a NULL id cannot be
    addressed by a loader-side manifest lookup at all."""
    idc = F.col(id_col).cast("string")
    idc = F.when(
        idc.isNull(),
        F.raise_error(F.lit(
            f"packing: NULL document id in '{id_col}' (a manifest "
            "row must be addressable; filter or key NULL-id docs "
            "upstream)"
        )),
    ).otherwise(idc)
    h16 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("pack:"), idc)),
            1, 4,
        ),
        16, 10,
    ).cast("long")
    return F.pmod(h16, F.lit(n_buckets)).cast("int")


def _pack_order(order_by_hash: bool, shuffle_salt: str):
    """Within-bucket packing order: doc_id, or the keyed-hash
    permutation (md5(salt:id), doc_id tie-break — the shuffle_rows
    idiom) when ``order_by_hash``.  Returns (extra_cols, order_cols)."""
    if not order_by_hash:
        return [], [F.col("doc_id")]
    ord_col = F.md5(F.concat_ws(
        ":", F.lit(shuffle_salt), F.col("doc_id").cast("string")
    )).alias("_ord")
    return [ord_col], [F.col("_ord"), F.col("doc_id")]


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
    order_by_hash: bool = False,
    shuffle_salt: str = "packshuf",
) -> DataFrame:
    """(doc_id, bucket, tokens, seq_first, seq_last, offset_in_first)
    — where each document's tokens land once the corpus is
    concatenated and cut into ``max_tokens`` training sequences: the
    deterministic packing manifest an LM data loader consumes (doc d
    contributes to sequences ``seq_first..seq_last`` of its bucket,
    starting ``offset_in_first`` tokens into the first one).

    Concat-and-chunk packing is inherently SEQUENTIAL — each
    document's placement depends on the running token total before
    it — which is why this operator BUCKETS first: documents shard by
    the first 16 bits of ``md5('pack:' || doc_id) mod n_buckets``
    (md5-keyed, no RNG and no engine-specific hash — the convention
    every replayable keyed-hash operator here uses; the 16-bit parse
    caps ``n_buckets`` at 65536, plenty for shard manifests) and the
    running total is a window cumulative sum WITHIN each bucket,
    ordered by ``doc_id``.  One
    shuffle, ``n_buckets``-way parallel sort; at corpus scale the
    bucket count bounds every window's size, and each bucket's
    packing is independently reproducible — shard-local manifests, no
    global coordination, no driver-side loop.  Padding waste is the
    per-bucket remainder (< max_tokens per bucket, amortized to
    nothing at real corpus sizes).

    ``order_by_hash=True`` packs each bucket in KEYED-HASH order
    (``md5(shuffle_salt || ':' || doc_id)``, doc_id tie-break — the
    same deterministic-permutation idiom as ``dedup.shuffle_rows``)
    instead of ``doc_id`` order: real LM loaders shuffle documents
    before packing so a sequence doesn't concatenate corpus-adjacent
    docs, and a changed ``shuffle_salt`` is a fresh epoch permutation.
    Same ONE-shuffle plan — the hash is another sort key inside the
    per-bucket window, not an extra exchange.

    Everything in the output is an exact integer (token counts,
    cumulative sums, div/mod arithmetic) — bit-identical under any
    partitioning and trivially replayable by a SQL window.  Token
    counts come from ``token_count_col`` if given (the real pipeline
    passes its tokenizer's counts), else a whitespace-split count of
    ``text_col`` — the count is an INPUT here, not a tokenization
    opinion.  A NULL in ``token_count_col`` RAISES (the
    ``graph._edge_weight`` discipline: ``greatest(NULL, 0)`` would
    silently zero the doc's tokens, so a tokenizer bug feeding null
    counts would drop documents from the manifest with no error —
    pass 0 explicitly for zero-token docs).  Zero-token documents
    occupy no positions: they report
    ``seq_first = seq_last`` = the sequence at their cut point and
    ``tokens = 0`` (a loader skips them; they must not shift
    neighbors, and the cumsum arithmetic guarantees they don't).
    """
    if max_tokens <= 0:
        raise ValueError("pack_sequences: max_tokens must be positive")
    if not 0 < n_buckets <= 65536:
        raise ValueError("pack_sequences: n_buckets must be in 1..65536")
    toks = _doc_tokens(token_count_col, text_col, "pack_sequences")
    extra, order_cols = _pack_order(order_by_hash, shuffle_salt)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        _pack_bucket(id_col, n_buckets).alias("bucket"),
        F.greatest(toks, F.lit(0)).alias("tokens"),
        *extra,
    )
    w = Window.partitionBy("bucket").orderBy(*order_cols)
    cum_end = F.sum("tokens").over(w)
    cum_start = (cum_end - F.col("tokens")).alias("_cs")
    return base.select(
        "doc_id",
        "bucket",
        "tokens",
        cum_start,
        cum_end.alias("_ce"),
    ).select(
        "doc_id",
        "bucket",
        "tokens",
        # integer `div`, never double-divide-and-truncate: cumulative
        # token totals are longs and must stay exact past 2^53
        F.expr(f"_cs div {max_tokens}").alias("seq_first"),
        F.when(
            F.col("tokens") > 0,
            F.expr(f"(_ce - 1) div {max_tokens}"),
        )
        .otherwise(F.expr(f"_cs div {max_tokens}"))
        .alias("seq_last"),
        F.pmod(F.col("_cs"), F.lit(max_tokens)).cast("long")
        .alias("offset_in_first"),
    )


def sequence_index(
    manifest: DataFrame,
    max_tokens: int = 2048,
) -> DataFrame:
    """(bucket, seq, doc_id, doc_offset, seq_offset, n_tokens) — the
    LOADER-side inverse of :func:`pack_sequences`: for every training
    sequence, exactly which token slices of which documents fill it.
    A data loader reads its shard's index rows for sequence ``seq``
    and materializes ``doc_id[doc_offset : doc_offset + n_tokens]``
    at position ``seq_offset`` — the manifest answers "where does doc
    d land", this answers "what does sequence s contain".

    ``manifest`` is :func:`pack_sequences` output (doc_id, bucket,
    tokens, seq_first, seq_last, offset_in_first) with the SAME
    ``max_tokens``.  Pure integer arithmetic off the manifest row —
    the doc's global cut position is ``seq_first·max_tokens +
    offset_in_first``, and each spanned sequence takes the overlap of
    [cut, cut+tokens) with its own [s·max_tokens, (s+1)·max_tokens):

    * ``doc_offset``  = max(s·mt, cut) − cut   (where in the doc)
    * ``seq_offset``  = max(s·mt, cut) − s·mt  (where in the sequence)
    * ``n_tokens``    = min((s+1)·mt, cut+tokens) − max(s·mt, cut)

    Zero-token documents contribute no index rows (a loader skips
    them; their manifest rows exist only to witness placement).

    Scale shape: MAP-ONLY — one ``explode(sequence(seq_first,
    seq_last))`` per doc (a doc yields ⌈tokens/mt⌉+1 rows at most) and
    Column arithmetic; no shuffle, no window, no join.  Output size is
    Σ_docs (spanned sequences) ≈ |docs| + total_tokens/max_tokens —
    linear in the corpus.  Every value is an exact integer, replayable
    by a SQL ``generate_series`` — tiling invariants (each sequence
    sums to ``max_tokens`` except a bucket's last; each doc's slices
    tile [0, tokens) contiguously) are pinned by test.
    """
    if max_tokens <= 0:
        raise ValueError("sequence_index: max_tokens must be positive")
    mt = F.lit(max_tokens)
    cut = (F.col("seq_first") * mt + F.col("offset_in_first")).alias("_cut")
    s_lo = F.col("seq") * mt
    lo = F.greatest(s_lo, F.col("_cut"))
    hi = F.least(s_lo + mt, F.col("_cut") + F.col("tokens"))
    return (
        manifest.filter(F.col("tokens") > 0)
        .select(
            "doc_id",
            "bucket",
            "tokens",
            cut,
            F.explode(
                F.sequence(F.col("seq_first"), F.col("seq_last"))
            ).alias("seq"),
        )
        .select(
            "bucket",
            "seq",
            "doc_id",
            (lo - F.col("_cut")).cast("long").alias("doc_offset"),
            (lo - s_lo).cast("long").alias("seq_offset"),
            (hi - lo).cast("long").alias("n_tokens"),
        )
    )


def pack_sequences_epochs(
    epoch_plan: DataFrame,
    max_tokens: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    epoch_col: str = "epoch",
    token_count_col: str | None = None,
    text_col: str = "text",
    order_by_hash: bool = False,
    shuffle_salt: str = "packshuf",
) -> DataFrame:
    """Pack a multi-epoch plan (``token_budget_epochs`` output — one
    row per (doc, epoch)) into training sequences: the loader-ready
    manifest for the DATA-CONSTRAINED regime, where the corpus repeats
    and the last (partial) epoch holds only the budget remainder's
    best docs.  Output is :func:`pack_sequences`' manifest plus the
    ``epoch`` column: (doc_id, epoch, bucket, tokens, seq_first,
    seq_last, offset_in_first).

    ``epoch`` is the LEADING within-bucket sort key (the batch-id
    discipline of :func:`pack_sequences_append`): inside every bucket,
    epoch e's tokens sit entirely AFTER epoch e-1's, so a training run
    consumes full passes in order and the partial epoch last — and
    each epoch's sequence range per bucket is contiguous, which is
    what lets a loader (or a resume) address "epoch e of shard b" as
    one [first, last] slice.  A document keeps the SAME bucket in
    every epoch (the hash key is the id alone), so shard-local token
    streams repeat shard-locally — no cross-shard traffic when the
    plan repeats the corpus.

    ``order_by_hash=True`` shuffles WITHIN each (bucket, epoch) by
    ``md5(shuffle_salt || ':' || epoch || ':' || id)`` — the epoch
    joins the salt so every epoch is a FRESH permutation (real loaders
    reshuffle between epochs; without the epoch in the key, each
    repeat would replay the same document order and adjacent-doc
    co-occurrence statistics).  doc_id breaks hash ties.

    Same ONE-shuffle plan as :func:`pack_sequences` — epoch and the
    hash are sort keys inside the per-bucket window, not extra
    exchanges — and the same exact-integer ``div``/``pmod``
    arithmetic, replayable by one SQL window over (bucket) ordered by
    (epoch, id).  NULL epochs raise (a loader cannot place them);
    NULL token counts raise; the ``epoch_col`` must exist (this
    operator consumes a PLAN, not a bare corpus — pack a single-epoch
    corpus with :func:`pack_sequences`).
    """
    if max_tokens <= 0:
        raise ValueError(
            "pack_sequences_epochs: max_tokens must be positive")
    if not 0 < n_buckets <= 65536:
        raise ValueError(
            "pack_sequences_epochs: n_buckets must be in 1..65536")
    if epoch_col not in epoch_plan.columns:
        raise ValueError(
            f"pack_sequences_epochs: input lacks epoch column "
            f"'{epoch_col}' (pack a single-epoch corpus with "
            "pack_sequences)")
    toks = _doc_tokens(token_count_col, text_col,
                       "pack_sequences_epochs")
    ec = F.col(epoch_col).cast("long")
    epoch_guard = F.when(
        ec.isNull(),
        F.raise_error(F.lit(
            f"pack_sequences_epochs: NULL epoch in '{epoch_col}' "
            "(a loader cannot place an unnumbered pass)"
        )),
    ).otherwise(ec)
    if order_by_hash:
        # epoch in the salt: every repeat is a fresh permutation
        extra = [F.md5(F.concat_ws(
            ":", F.lit(shuffle_salt), F.col("epoch").cast("string"),
            F.col("doc_id").cast("string"),
        )).alias("_ord")]
        order_cols = [F.col("_ord"), F.col("doc_id")]
    else:
        extra, order_cols = [], [F.col("doc_id")]
    base = epoch_plan.select(
        F.col(id_col).alias("doc_id"),
        epoch_guard.alias("epoch"),
        _pack_bucket(id_col, n_buckets).alias("bucket"),
        F.greatest(toks, F.lit(0)).alias("tokens"),
    ).select("*", *extra)
    w = Window.partitionBy("bucket").orderBy(F.col("epoch"), *order_cols)
    cum_end = F.sum("tokens").over(w)
    return base.select(
        "doc_id",
        "epoch",
        "bucket",
        "tokens",
        (cum_end - F.col("tokens")).alias("_cs"),
        cum_end.alias("_ce"),
    ).select(
        "doc_id",
        "epoch",
        "bucket",
        "tokens",
        F.expr(f"_cs div {max_tokens}").alias("seq_first"),
        F.when(
            F.col("tokens") > 0,
            F.expr(f"(_ce - 1) div {max_tokens}"),
        )
        .otherwise(F.expr(f"_cs div {max_tokens}"))
        .alias("seq_last"),
        F.pmod(F.col("_cs"), F.lit(max_tokens)).cast("long")
        .alias("offset_in_first"),
    )


def pack_sequences_nosplit(
    docs: DataFrame,
    max_tokens: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
    order_by_hash: bool = False,
    shuffle_salt: str = "packshuf",
    oversize: str = "error",
) -> DataFrame:
    """(doc_id, bucket, tokens, seq, seq_offset) — NO-SPLIT packing:
    every document lands WHOLLY inside one ``max_tokens`` training
    sequence (greedy next-fit within its md5 bucket), the regime used
    when cross-document attention contamination matters — a sequence
    never continues a document cut mid-stream, so no attention-mask
    surgery and no document straddles a training example boundary
    (the concat-and-chunk manifest of :func:`pack_sequences` is the
    throughput regime; this is the isolation regime, cf. the
    "sequence packing without cross-contamination" literature).

    Placement is greedy NEXT-FIT in the within-bucket order (doc_id,
    or the ``order_by_hash`` keyed-hash permutation — same
    ``_pack_order`` idiom as :func:`pack_sequences`): a doc that fits
    the current sequence's remaining capacity is placed at its fill
    offset; one that doesn't closes the sequence and opens the next.
    Next-fit (not first-fit-decreasing) is deliberate: it is the
    variant whose state is a single (seq, fill) scan — deterministic,
    order-respecting (curriculum/epoch orders survive), and exactly
    replayable by a SQL recursive CTE, which is what the DuckDB
    oracle does.  FFD packs tighter but reorders docs and needs a
    bin search per doc — a different operator if ever needed.

    Running-capacity-reset is the one packing computation a window
    CANNOT express (the cumsum resets at a data-dependent boundary,
    so it is not prefix-sum decomposable) — this is the documented
    ``applyInPandas`` case: docs shard by the same
    ``md5('pack:' || id)`` bucket key, and each bucket's scan runs as
    one Arrow-batched pandas group over NARROW rows only (id, bucket,
    token count, optional order hash — never the text), so a 1.5B-doc
    corpus at 65536 buckets is ~23k rows / ~1 MB per group.  ONE
    bucket-partitioned exchange, same budget as
    :func:`pack_sequences`; the per-group loop is O(rows) over int64
    arrays.

    ``oversize`` policy for docs with tokens > max_tokens (they fit
    no sequence): ``"error"`` (default) RAISES JVM-side on first
    touch — the loud-guard discipline; ``"isolate"`` gives the doc a
    sequence of its own (``seq_offset`` 0, its true token count
    recorded — the loader truncates or windows it) and marks that
    sequence full.  Zero-token docs occupy no capacity: they report
    the current (seq, fill) without shifting neighbors — ``seq_offset``
    may equal ``max_tokens`` when the current sequence is exactly
    full, the same witness-only convention as :func:`pack_sequences`'
    zero-token rows.  NULL token counts raise (pass 0 explicitly).

    Every output is an exact integer; per-sequence fill stats
    (padding waste = mt − Σ tokens per open sequence) are one groupBy
    away downstream.
    """
    if max_tokens <= 0:
        raise ValueError(
            "pack_sequences_nosplit: max_tokens must be positive")
    if not 0 < n_buckets <= 65536:
        raise ValueError(
            "pack_sequences_nosplit: n_buckets must be in 1..65536")
    if oversize not in ("error", "isolate"):
        raise ValueError(
            "pack_sequences_nosplit: oversize must be 'error' or "
            "'isolate'")
    toks = _doc_tokens(token_count_col, text_col,
                       "pack_sequences_nosplit")
    toks = F.greatest(toks, F.lit(0))
    if oversize == "error":
        toks = F.when(
            toks > max_tokens,
            F.raise_error(F.concat(
                F.lit("pack_sequences_nosplit: document "),
                F.col(id_col).cast("string"),
                F.lit(f" has more than max_tokens={max_tokens} tokens "
                      "and cannot be packed whole (oversize='isolate' "
                      "to give it a sequence of its own)"),
            )).cast("long"),
        ).otherwise(toks)
    extra, order_cols = _pack_order(order_by_hash, shuffle_salt)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        _pack_bucket(id_col, n_buckets).alias("bucket"),
        toks.alias("tokens"),
        *extra,
    )
    sort_keys = (["_ord", "doc_id"] if order_by_hash else ["doc_id"])
    id_type = base.schema["doc_id"].dataType.simpleString()
    out_schema = (f"doc_id {id_type}, bucket int, tokens bigint, "
                  "seq bigint, seq_offset bigint")
    mt = max_tokens

    def _pack_group(pdf):
        import numpy as np

        pdf = pdf.sort_values(sort_keys, kind="mergesort")
        t = pdf["tokens"].to_numpy(dtype="int64")
        seq = np.empty(len(t), dtype="int64")
        off = np.empty(len(t), dtype="int64")
        cur, fill = 0, 0
        for i, ti in enumerate(t):
            if ti > mt:  # isolate (error mode raised JVM-side)
                if fill > 0:
                    cur += 1
                seq[i], off[i], fill = cur, 0, mt
            elif ti == 0:  # witness row: no capacity consumed
                seq[i], off[i] = cur, fill
            elif fill + ti <= mt:
                seq[i], off[i] = cur, fill
                fill += ti
            else:
                cur += 1
                seq[i], off[i], fill = cur, 0, ti
        out = pdf[["doc_id", "bucket", "tokens"]].copy()
        out["seq"] = seq
        out["seq_offset"] = off
        return out

    return base.groupBy("bucket").applyInPandas(_pack_group, out_schema)


def pack_sequences_append(
    manifest: DataFrame,
    new_docs: DataFrame,
    max_tokens: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
    order_by_hash: bool = False,
    shuffle_salt: str = "packshuf",
    batch_no: int | None = None,
) -> DataFrame:
    """Incremental packing: extend an existing manifest with a new
    BATCH of documents WITHOUT repacking the corpus.  A growing corpus
    can't just re-run :func:`pack_sequences` on the union — cumulative
    sums shift on any insert, so every already-trained-on sequence id
    would be invalidated.  Instead, new docs hash to their buckets
    with the same ``md5('pack:' || id)`` key and append AFTER each
    bucket's recorded high-water mark (the bucket's total token count
    off the existing manifest), with the batch id as the LEADING sort
    key.  Existing manifest rows pass through BIT-UNCHANGED (a loader
    keeps serving old sequence ids); appending is associative — the
    result is identical to one :func:`pack_sequences` run over the
    union ordered by (batch, within-batch order), because a per-bucket
    cumsum over (batch ASC, order) is exactly the old bucket total
    plus the new batch's local cumsum.  The same discipline as
    ``similarity.ivf_append`` / the streaming-ingest tier: index once,
    extend forever.

    ``manifest`` is :func:`pack_sequences` (or a previous append's)
    output with the SAME ``max_tokens`` / ``n_buckets`` /
    ``order_by_hash`` / ``shuffle_salt`` — the caller's contract, not
    checkable from the rows.  A ``batch`` column is added as batch 0
    if absent; the new rows get ``max(batch) + 1``, or the explicit
    ``batch_no`` when given (must be strictly greater than every
    recorded batch — raises otherwise; the streaming ingest tier
    passes the micro-batch id here so a crash REPLAY writes the same
    batch number instead of inventing a fresh one).  Duplicate doc_ids
    across batches are not detected here (dedup is its own tier and
    runs before packing).

    Scale shape: one partially-aggregated groupBy over the manifest
    yields ≤ ``n_buckets`` (bucket, high-water, max-batch) rows — a
    bounded driver collect, same budget as token_budget_select's
    histogram — rebroadcast as a literal frame; the new batch pays
    pack_sequences' ONE bucket-partitioned window shuffle; the old
    manifest is untouched pass-through.  All arithmetic stays exact
    integer (``div``/``pmod`` on longs).
    """
    if max_tokens <= 0:
        raise ValueError("pack_sequences_append: max_tokens must be "
                         "positive")
    if not 0 < n_buckets <= 65536:
        raise ValueError("pack_sequences_append: n_buckets must be in "
                         "1..65536")
    missing = {"doc_id", "bucket", "tokens", "seq_first", "seq_last",
               "offset_in_first"} - set(manifest.columns)
    if missing:
        raise ValueError(
            f"pack_sequences_append: manifest lacks columns {sorted(missing)}"
        )
    man = (
        manifest if "batch" in manifest.columns
        else manifest.withColumn("batch", F.lit(0).cast("long"))
    )
    # High-water marks: ≤ n_buckets rows — bounded collect, rebroadcast
    # as a literal frame so the join side is driver-known and tiny.
    hw_rows = man.groupBy("bucket").agg(
        F.sum("tokens").alias("base_toks"),
        F.max("batch").alias("mb"),
    ).collect()
    max_batch = max((int(r["mb"]) for r in hw_rows), default=-1)
    if batch_no is None:
        next_batch = max_batch + 1
    else:
        if batch_no <= max_batch:
            raise ValueError(
                f"pack_sequences_append: batch_no={batch_no} is not "
                f"past the manifest's max batch {max_batch} (batches "
                "must be appended in increasing order; a replayed "
                "batch must be dropped before re-appending)")
        next_batch = batch_no
    appended = pack_sequences_append_rows(
        new_docs,
        {int(r["bucket"]): int(r["base_toks"]) for r in hw_rows},
        next_batch,
        max_tokens=max_tokens, n_buckets=n_buckets, id_col=id_col,
        token_count_col=token_count_col, text_col=text_col,
        order_by_hash=order_by_hash, shuffle_salt=shuffle_salt,
    )
    return man.unionByName(appended)


def pack_sequences_append_rows(
    new_docs: DataFrame,
    high_water: dict,
    batch_no: int,
    max_tokens: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    text_col: str = "text",
    order_by_hash: bool = False,
    shuffle_salt: str = "packshuf",
) -> DataFrame:
    """The placement core of :func:`pack_sequences_append`, taking the
    per-bucket high-water marks DIRECTLY (``{bucket: base token
    total}``) and returning ONLY the new batch's manifest rows — no
    manifest scan at all.  This is the O(1)-state append the streaming
    ingest tier runs: the marks are ≤ ``n_buckets`` integers a caller
    can persist (``streaming_pack_manifest`` carries them in its
    commit marker), so appending batch N costs one window over batch N
    alone, never a read of the N−1 batches already on disk.  The
    caller owns the contract that ``high_water`` equals the committed
    manifest's per-bucket token totals and ``batch_no`` is past every
    committed batch — :func:`pack_sequences_append` derives both from
    the manifest and delegates here.
    """
    if max_tokens <= 0:
        raise ValueError("pack_sequences_append_rows: max_tokens must "
                         "be positive")
    if not 0 < n_buckets <= 65536:
        raise ValueError("pack_sequences_append_rows: n_buckets must "
                         "be in 1..65536")
    toks = _doc_tokens(token_count_col, text_col, "pack_sequences_append")
    extra, order_cols = _pack_order(order_by_hash, shuffle_salt)
    base = new_docs.select(
        F.col(id_col).alias("doc_id"),
        _pack_bucket(id_col, n_buckets).alias("bucket"),
        F.greatest(toks, F.lit(0)).alias("tokens"),
        *extra,
    )
    w = Window.partitionBy("bucket").orderBy(*order_cols)
    cum = base.select(
        "doc_id", "bucket", "tokens",
        F.sum("tokens").over(w).alias("_lce"),
    )
    if high_water:
        spark = new_docs.sparkSession
        hw = spark.createDataFrame(
            [(int(b), int(t)) for b, t in high_water.items()],
            schema="bucket int, _hw bigint",
        )
        cum = cum.join(F.broadcast(hw), "bucket", "left")
    else:
        cum = cum.withColumn("_hw", F.lit(None).cast("long"))
    return cum.select(
        "doc_id",
        "bucket",
        "tokens",
        (F.coalesce(F.col("_hw"), F.lit(0)) + F.col("_lce"))
        .alias("_ce"),
    ).select(
        "doc_id",
        "bucket",
        "tokens",
        (F.col("_ce") - F.col("tokens")).alias("_cs"),
        "_ce",
    ).select(
        "doc_id",
        "bucket",
        "tokens",
        F.expr(f"_cs div {max_tokens}").alias("seq_first"),
        F.when(
            F.col("tokens") > 0,
            F.expr(f"(_ce - 1) div {max_tokens}"),
        )
        .otherwise(F.expr(f"_cs div {max_tokens}"))
        .alias("seq_last"),
        F.pmod(F.col("_cs"), F.lit(max_tokens)).cast("long")
        .alias("offset_in_first"),
        F.lit(batch_no).cast("long").alias("batch"),
    )
