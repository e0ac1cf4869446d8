"""Property-based checks (hypothesis) — invariants the reference's golden
tests never cover: truncation idempotence, tile-parent consistency, mass
conservation through aggregation, proto codec round-trip."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from slow_tortoise_spark.sinks.tile_proto import decode_tile, encode_tile

# ---------------------------------------------------------------------------
# Pure-Python properties (cheap — hammer them)
# ---------------------------------------------------------------------------

_stats = st.tuples(
    st.floats(-1e12, 1e12, allow_nan=False),
    st.floats(-1e12, 1e12, allow_nan=False),
    st.floats(0, 1e9, allow_nan=False),
)


@given(
    z=st.integers(0, 8),
    x=st.integers(0, 2**8),
    y=st.integers(0, 2**8),
    bins=st.dictionaries(st.integers(0, 4095), _stats, max_size=64),
)
@settings(max_examples=200, deadline=None)
def test_proto_roundtrip_property(z, x, y, bins):
    tile = decode_tile(encode_tile(z, x, y, 4096, bins))
    assert (tile["z"], tile["x"], tile["y"]) == (z, x, y)
    assert set(tile["stats"]) == {k for k, v in bins.items() if any(v)} | {
        k for k, v in bins.items() if not any(v)
    }
    for k, (a, b, c) in bins.items():
        ra, rb, rc = tile["stats"][k]
        assert ra == a and rb == b and rc == c


@given(
    lat=st.floats(-85.0, 85.0, allow_nan=False),
    lng=st.floats(-179.999, 179.999, allow_nan=False),
    zoom=st.integers(1, 14),
)
@settings(max_examples=200, deadline=None)
def test_tile_parent_consistency_python(lat, lng, zoom):
    """deg2num(z) coarsened one level == deg2num(z-1) directly.

    Mirrors the Column math in operators/tiles.py with the same formulas;
    guards the shiftright-based parent derivation.
    """
    def deg2num(lat_deg, lon_deg, z):
        lat_rad = math.radians(lat_deg)
        n = 2.0**z
        xt = int((lon_deg + 180.0) / 360.0 * n)
        yt = int((1.0 - math.asinh(math.tan(lat_rad)) / math.pi) / 2.0 * n)
        return xt, yt

    x, y = deg2num(lat, lng, zoom)
    px, py = deg2num(lat, lng, zoom - 1)
    assert (x >> 1, y >> 1) == (px, py)


# ---------------------------------------------------------------------------
# Spark properties (fewer examples — each is a job)
# ---------------------------------------------------------------------------

_rows = st.lists(
    st.tuples(
        st.integers(0, 2_000_000_000_000),  # epoch ms ≈ up to 2033
        st.sampled_from(["A", "B", "C"]),
        st.sampled_from(["f1", "f2"]),
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
    ),
    min_size=1,
    max_size=30,
)


@given(rows=_rows)
@settings(max_examples=8, deadline=None)
def test_temporal_agg_conserves_mass(spark_session, rows):
    """Σ t_sum == Σ value for every resolution, and truncation is
    idempotent (truncating the truncated timestamp is a no-op)."""
    from pyspark.sql import functions as F

    from slow_tortoise_spark.operators.temporal import (
        temporal_aggregation,
        to_normalized_time,
    )

    df = spark_session.createDataFrame(
        rows, "timestamp long, country string, feature string, value double"
    )
    total = sum(r[3] for r in rows)
    for res in ("month", "year", "all"):
        t = temporal_aggregation(df, res)
        got = t.agg(F.sum("t_sum")).first()[0]
        assert abs(got - total) < 1e-6 * max(1.0, abs(total))
        twice = t.select(
            (to_normalized_time(F.col("timestamp"), res)
             == F.col("timestamp")).alias("fixed")
        )
        assert all(r["fixed"] for r in twice.collect())


@given(rows=_rows)
@settings(max_examples=5, deadline=None)
def test_rollup_levels_nest(spark_session, rows):
    """Level-0 totals equal the sum of their level-1 children."""
    from pyspark.sql import functions as F

    from slow_tortoise_spark.operators.regional import (
        regional_aggregation_all_levels,
    )

    df = spark_session.createDataFrame(
        rows, "timestamp long, country string, feature string, value double"
    ).withColumn("admin1", F.concat(F.col("country"), F.lit("-a")))
    t = df.withColumnRenamed("value", "t_sum").withColumn(
        "t_mean", F.col("t_sum")
    )
    rolled = regional_aggregation_all_levels(t, aggs=["sum"], max_level=1)
    l0 = {(r["feature"], r["timestamp"], r["region_id"]): r["s_sum_t_sum"]
          for r in rolled.filter("level = 0").collect()}
    from collections import defaultdict

    children = defaultdict(float)
    for r in rolled.filter("level = 1").collect():
        parent = r["region_id"].split("__")[0]
        children[(r["feature"], r["timestamp"], parent)] += r["s_sum_t_sum"]
    for k, v in l0.items():
        assert abs(children[k] - v) < 1e-6 * max(1.0, abs(v))


# session-scoped fixture alias usable inside @given (function-scoped
# fixtures don't mix with hypothesis)
import pytest


@pytest.fixture(scope="session")
def spark_session(spark):
    return spark


_texts = st.lists(
    st.text(alphabet="ab cd", min_size=0, max_size=40),
    min_size=1, max_size=12,
)


@given(texts=_texts)
@settings(max_examples=8, deadline=None)
def test_jaccard_dispatch_paths_agree_property(spark_session, texts):
    """Naive and prefix Jaccard plans agree on arbitrary corpora
    (including empty docs, whitespace-only docs, repeated shingles)."""
    from pyspark.sql import Row

    from slow_tortoise_spark.operators.dedup import jaccard_pairs_auto

    docs = spark_session.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )

    def pairs(budget):
        return sorted(
            (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
            for r in jaccard_pairs_auto(docs, threshold=0.3,
                                        naive_budget=budget).collect()
        )

    assert pairs(10**12) == pairs(0)


@given(values=st.lists(st.floats(min_value=-100, max_value=100, width=32),
                       min_size=1, max_size=15))
@settings(max_examples=8, deadline=None)
def test_extrema_kind_invariants_property(spark_session, values):
    """Every min-kind row carries the global min value, every max-kind row
    the global max; both kinds are always present (all-equal groups emit
    rows under both)."""
    from pyspark.sql import Row

    from slow_tortoise_spark.operators.extrema import regional_extrema

    df = spark_session.createDataFrame(
        [Row(feature="F", region_id=f"r{i}", timestamp=i, s_sum_t_sum=float(v))
         for i, v in enumerate(values)]
    )
    out = regional_extrema(df, ["s_sum_t_sum"]).collect()
    lo, hi = min(values), max(values)
    kinds = {r["kind"] for r in out}
    assert kinds == {"min", "max"}
    for r in out:
        assert r["value"] == (lo if r["kind"] == "min" else hi)


_edges = st.lists(
    st.tuples(st.integers(min_value=0, max_value=14),
              st.integers(min_value=0, max_value=14)),
    min_size=1, max_size=25,
)


@given(edges=_edges)
@settings(max_examples=8, deadline=None)
def test_connected_components_match_union_find(spark_session, edges):
    """Min-label propagation over arbitrary pair graphs (self-loops,
    duplicate edges, reversed duplicates, chains, stars) must produce
    exactly the partition a reference union-find produces, with the
    minimum node id as every component's label."""
    from slow_tortoise_spark.operators.dedup import connected_components

    pairs = [(min(a, b), max(a, b)) for a, b in edges if a != b]
    if not pairs:
        return
    df = spark_session.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r["doc_id"]: r["component"]
           for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert got == want


@given(
    texts=st.lists(st.text(alphabet="ab cd", min_size=0, max_size=40),
                   min_size=2, max_size=10),
    split=st.integers(1, 9),
)
@settings(max_examples=8, deadline=None)
def test_incremental_dedup_invariants_property(spark_session, texts, split):
    """On arbitrary corpora (empty docs, whitespace-only, repeats):
    admitted ⊆ batch; an exact copy of any indexed doc is never
    admitted; a batch doc whose normalized text matches nothing indexed
    and that shares no shingle with the corpus is always admitted."""
    import re

    from pyspark.sql import Row

    from slow_tortoise_spark.operators.dedup import (
        build_dedup_index,
        incremental_dedup,
    )

    corpus_rows = [Row(doc_id=i, text=t)
                   for i, t in enumerate(texts[:split])]
    batch_rows = [Row(doc_id=100 + i, text=t)
                  for i, t in enumerate(texts[split:])]
    if not corpus_rows or not batch_rows:
        return
    corpus = spark_session.createDataFrame(
        corpus_rows, "doc_id long, text string")
    batch = spark_session.createDataFrame(
        batch_rows, "doc_id long, text string")
    index = build_dedup_index(corpus)
    admitted = {r["doc_id"] for r in
                incremental_dedup(batch, index, threshold=0.5).collect()}
    assert admitted <= {r.doc_id for r in batch_rows}

    def norm(t):
        return re.sub(r"\s+", " ", t.strip()).lower()

    corpus_norms = {norm(r.text) for r in corpus_rows}
    for r in batch_rows:
        if norm(r.text) in corpus_norms:
            assert r.doc_id not in admitted  # exact tier must fire

    def shingles(t):
        toks = [x for x in re.split(r"\s+", t.strip().lower()) if x]
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    corpus_shingles = set().union(*(shingles(r.text) for r in corpus_rows))
    for r in batch_rows:
        if (norm(r.text) not in corpus_norms
                and not (shingles(r.text) & corpus_shingles)):
            assert r.doc_id in admitted  # nothing to collide with


@given(
    masses=st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(1, 60),
        min_size=1, max_size=4,
    ),
    budget=st.integers(1, 200),
)
@settings(max_examples=8, deadline=None)
def test_temperature_mix_budget_property(spark_session, masses, budget):
    """Keep fractions are in (0, 1]; expected kept rows Σ frac·m never
    exceed the budget by more than one stratum's rounding; alpha=1
    fractions are equal across strata (natural proportions)."""
    from pyspark.sql import Row

    from slow_tortoise_spark.operators.dedup import temperature_mix_plan

    rows = [Row(doc_id=i + 1000 * si, source=s)
            for si, (s, m) in enumerate(sorted(masses.items()))
            for i in range(m)]
    df = spark_session.createDataFrame(rows, "doc_id long, source string")
    plan = temperature_mix_plan(df, "source", alpha=0.5, budget=float(budget))
    assert set(plan) == set(masses)
    expected = 0.0
    for s, (m, frac) in plan.items():
        assert m == masses[s] and 0.0 < frac <= 1.0
        expected += frac * m
    assert expected <= max(budget, max(masses.values())) + 1e-6

    plan1 = temperature_mix_plan(df, "source", alpha=1.0,
                                 budget=float(budget))
    fracs = {round(f, 12) for _, f in plan1.values()}
    assert len(fracs) == 1


_edges = st.lists(
    st.tuples(st.integers(0, 24), st.integers(0, 24)).filter(
        lambda e: e[0] != e[1]
    ),
    min_size=1,
    max_size=30,
)


@given(edges=_edges)
@settings(max_examples=6, deadline=None)
def test_star_cc_matches_label_prop_and_python_oracle(spark_session, edges):
    """Both CC algorithms agree with each other AND with a pure-Python
    union-find on arbitrary random graphs (self-loops excluded)."""
    from slow_tortoise_spark.operators.dedup import connected_components

    parent = list(range(25))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {v for e in edges for v in e}
    want = {n: find(n) for n in nodes}

    pairs = spark_session.createDataFrame(edges, "doc_a long, doc_b long")
    lp = {r["doc_id"]: r["component"]
          for r in connected_components(pairs).collect()}
    star = {r["doc_id"]: r["component"]
            for r in connected_components(pairs, algorithm="star").collect()}
    assert lp == want
    assert star == want


@given(texts=_texts)
@settings(max_examples=8, deadline=None)
def test_span_removal_matches_python_reference(spark_session, texts):
    """remove_duplicate_spans agrees with a direct python reference on
    arbitrary corpora (tiny alphabet -> plenty of duplicated windows,
    empty docs, whitespace-only docs, in-doc repeats)."""
    from slow_tortoise_spark.operators.dedup import remove_duplicate_spans

    n = 2
    toks = {i: [t for t in txt.lower().split() if t]
            for i, txt in enumerate(texts)}
    counts: dict[str, int] = {}
    for ts in toks.values():
        for i in range(len(ts) - n + 1):
            w = " ".join(ts[i:i + n])
            counts[w] = counts.get(w, 0) + 1
    expect = {}
    for d, ts in toks.items():
        cov: set[int] = set()
        for i in range(len(ts) - n + 1):
            if counts[" ".join(ts[i:i + n])] > 1:
                cov.update(range(i, i + n))
        kept = [t for j, t in enumerate(ts) if j not in cov]
        expect[d] = (" ".join(kept), len(ts), len(ts) - len(kept))

    df = spark_session.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
           for r in remove_duplicate_spans(df, n=n).collect()}
    assert got == expect


@given(texts=_texts)
@settings(max_examples=8, deadline=None)
def test_winnow_matches_python_reference(spark_session, texts):
    """winnow_fingerprints agrees with a direct python winnowing
    reference (same md5-prefix hashes, min-hash rightmost tie-break)."""
    import hashlib

    from slow_tortoise_spark.operators.text import winnow_fingerprints

    k, w = 2, 3

    def md5_16(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()[:16]

    expect = {}
    for d, txt in enumerate(texts):
        ts = [t for t in txt.lower().split() if t]
        grams = [(i + 1, md5_16(" ".join(ts[i:i + k])))
                 for i in range(len(ts) - k + 1)]
        sel = set()
        for j in range(len(grams) - w + 1):
            sel.add(min(grams[j:j + w], key=lambda t: (t[1], -t[0])))
        expect[d] = (len(grams), sorted(sel))

    df = spark_session.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (
            r["n_grams"],
            sorted((s["pos"], s["h"]) for s in r["fingerprints"]),
        )
        for r in winnow_fingerprints(df, k=k, w=w).collect()
    }
    assert got == expect


@given(texts=_texts)
@settings(max_examples=5, deadline=None)
def test_bloom_contamination_never_false_negative_property(
    spark_session, texts
):
    """On arbitrary corpora (split even/odd), every exact contamination
    hit is also a Bloom hit — the no-false-negative guarantee holds for
    ANY input, not just the curated fixtures."""
    from slow_tortoise_spark.operators.dedup import (
        bloom_contamination,
        cross_corpus_contamination,
    )

    df = spark_session.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    train = df.filter("doc_id % 2 = 0")
    test = df.filter("doc_id % 2 = 1")
    bloom = {r["doc_id"]: r["n_bloom_hits"]
             for r in bloom_contamination(train, test, n=2).collect()}
    exact = {r["doc_id"]: r["n_hits"]
             for r in cross_corpus_contamination(
                 train, test, n=2, min_common=0).collect()}
    for d, hits in exact.items():
        assert bloom.get(d, 0) >= hits


@given(ids=st.lists(st.integers(min_value=-10**9, max_value=10**9),
                    min_size=1, max_size=60, unique=True))
@settings(max_examples=6, deadline=None)
def test_shuffle_rows_total_order_property(spark_session, ids):
    """(bucket, bucket_rank) is a collision-free total order for any id
    set (negative, sparse, huge) and is permutation-stable."""
    from slow_tortoise_spark.operators.dedup import shuffle_rows

    df = spark_session.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = shuffle_rows(df).collect()
    keys = {(r["bucket"], r["bucket_rank"]) for r in rows}
    assert len(keys) == len(ids)
    assert all(0 <= r["bucket"] < 256 and r["bucket_rank"] >= 1
               for r in rows)
    again = shuffle_rows(df).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def _py_morton(x: int, y: int) -> int:
    m = 0
    for b in range(16):
        m |= ((x >> b) & 1) << (2 * b)
        m |= ((y >> b) & 1) << (2 * b + 1)
    return m


@given(
    coords=st.lists(
        st.tuples(st.integers(0, 65535), st.integers(0, 65535)),
        min_size=1, max_size=30,
    )
)
@settings(max_examples=25, deadline=None)
def test_morton_matches_python_reference_property(spark_session, coords):
    """The shift-or-mask spread equals bit-by-bit interleaving for any
    16-bit pair, and Z-order preserves equality/prefix structure."""
    from pyspark.sql import functions as F

    from slow_tortoise_spark.operators.tiles import morton_code

    df = spark_session.createDataFrame(coords, "x int, y int")
    got = [r["m"] for r in
           df.select(morton_code(F.col("x"), F.col("y")).alias("m")).collect()]
    assert got == [_py_morton(x, y) for x, y in coords]
    # interleave is a bijection: distinct pairs -> distinct codes
    assert len(set(got)) == len(set(coords))


def _py_gopher_mask(text: str) -> int:
    toks = [t for t in text.split() if t]
    n = len(toks)
    sum_len = sum(len(t) for t in toks)
    hashes = text.count("#")
    ellipses = (len(text) - len(text.replace("...", ""))) // 3
    lines = text.split("\n")
    bullets = sum(1 for l in lines if l.lstrip()[:1] in ("-", "*", "•"))
    ell_lines = sum(1 for l in lines
                    if len(l.rstrip()) >= 3 and l.rstrip().endswith("..."))
    alpha = sum(1 for t in toks if any(c.isalpha() and c.isascii() for c in t))
    stops = sum(1 for w in ("the", "be", "to", "of", "and", "that",
                            "have", "with")
                if w in [t.lower() for t in toks])
    mask = 0
    if n < 50 or n > 100000:
        mask |= 1
    if sum_len < 3 * n or sum_len > 10 * n:
        mask |= 2
    if 10 * (hashes + ellipses) > n:
        mask |= 4
    if 10 * bullets > 9 * len(lines):
        mask |= 8
    if 10 * ell_lines > 3 * len(lines):
        mask |= 16
    if 5 * alpha < 4 * n:
        mask |= 32
    if stops < 2:
        mask |= 64
    return mask


_gopher_word = st.sampled_from(
    ["the", "of", "and", "be", "#tag", "word...", "-", "*", "abc",
     "1234", "x", "...", "verylongwordhere", "Zork"]
)


@given(
    docs=st.lists(
        st.lists(_gopher_word, min_size=0, max_size=70).map(" ".join),
        min_size=1, max_size=12,
    ),
    newline_every=st.integers(3, 9),
)
@settings(max_examples=25, deadline=None)
def test_gopher_mask_matches_python_reference_property(
    spark_session, docs, newline_every
):
    """The integer cross-multiplied Column bitmask equals a direct
    python implementation of the rules on arbitrary word-soup docs
    (bullet lines, ellipses, hashes, no-alpha tokens, stopword mixes)."""
    from slow_tortoise_spark.operators.text import gopher_rules

    def with_newlines(t: str) -> str:
        ws = t.split(" ")
        out = []
        for i, w in enumerate(ws):
            out.append(w)
            out.append("\n" if (i + 1) % newline_every == 0 else " ")
        return "".join(out).rstrip(" ")

    staged = [(i, with_newlines(t)) for i, t in enumerate(docs)]
    df = spark_session.createDataFrame(staged, "doc_id long, text string")
    got = {r["doc_id"]: r["rule_mask"]
           for r in gopher_rules(df).collect()}
    for i, t in staged:
        assert got[i] == _py_gopher_mask(t), (i, t)


@given(
    data=st.lists(
        st.tuples(st.integers(0, 10_000),
                  st.floats(0.01, 100.0, allow_nan=False)),
        min_size=1, max_size=60, unique_by=lambda t: t[0],
    ),
    n=st.integers(1, 20),
)
@settings(max_examples=20, deadline=None)
def test_weighted_sample_matches_python_reference_property(
    spark_session, data, n
):
    """The keyed-hash ES sample equals a direct python evaluation of the
    same priorities — the determinism claim verified end to end."""
    import hashlib
    import math

    from slow_tortoise_spark.operators.dedup import weighted_sample

    df = spark_session.createDataFrame(data, "doc_id long, w double")
    got = sorted(r["doc_id"] for r in weighted_sample(df, n, "w").collect())

    def pri(doc_id, w):
        h = int(hashlib.md5(f"wsample:{doc_id}".encode()).hexdigest()[:12],
                16)
        u = (h + 1.0) / float(16 ** 12)
        return math.log(u) / w

    ref = sorted(
        doc_id
        for doc_id, _ in sorted(
            data, key=lambda t: (-pri(t[0], t[1]), t[0])
        )[:n]
    )
    assert got == ref


_bkt_batches = st.lists(  # batches of (key, payload, deleted)
    st.lists(
        st.tuples(
            st.integers(0, 12),  # small key space → bucket collisions
            st.integers(-100, 100),
            st.booleans(),
        ),
        min_size=0, max_size=8,
    ),
    min_size=1, max_size=4,
)


@given(batches=_bkt_batches, replay=st.integers(0, 3))
@settings(max_examples=5, deadline=None)
def test_bucketed_merge_matches_dict_replay(spark_session, batches, replay):
    """Bucket-level merge-on-write == a Python dict replay: any batch
    sequence (random keys/payloads/tombstones, versions globally unique
    by construction so resolution is total), with one batch REPLAYED
    after commit, must produce the same live view as last-version-wins
    over the once-applied stream — tombstones retained for resolution,
    hidden from the live read."""
    import shutil
    import tempfile

    from slow_tortoise_spark.streaming.pipeline import (
        _bucketed_merge_fn,
        read_bucketed_snapshot,
    )

    spark = spark_session
    root = tempfile.mkdtemp(prefix="prop_bkt_")
    try:
        merge = _bucketed_merge_fn(spark, root, ["k"], ["ver"], 4, "deleted")
        state: dict[int, tuple[int, int, bool]] = {}
        ver = 0
        for bid, rows in enumerate(batches):
            data = []
            for (k, payload, deleted) in rows:
                ver += 1
                data.append((k, ver, payload, deleted))
                state[k] = (ver, payload, deleted)
            df = spark.createDataFrame(
                data, "k int, ver int, payload int, deleted boolean"
            )
            merge(df, bid)
            if bid == replay:
                merge(df, bid)  # committed replay — must no-op
        snap = read_bucketed_snapshot(spark, root, live_only=True)
        got = (
            {r["k"]: (r["ver"], r["payload"]) for r in snap.collect()}
            if snap is not None else {}
        )
        want = {
            k: (v, p) for k, (v, p, deleted) in state.items() if not deleted
        }
        assert got == want
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Banded Levenshtein: the band is a safe overestimate of the keep cutoff
# ---------------------------------------------------------------------------

def _lev(a: str, b: str) -> int:
    """Reference edit distance — full O(len²) DP, no banding."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


_edit_ops = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 59),
              st.sampled_from("abcde ")),
    max_size=18,
)


@given(
    base=st.text(alphabet="abcde ", min_size=0, max_size=60),
    ops=_edit_ops,
    ratio=st.sampled_from([0.1, 0.2, 0.3]),
)
@settings(max_examples=10, deadline=None)
def test_banded_edit_distance_matches_python_dp(
    spark_session, base, ops, ratio
):
    """verify_pairs_edit_distance must agree with an UNBANDED Python DP
    at and around the ratio cutoff: a pair survives iff its exact
    distance ratio is ≤ max_ratio, and every surviving pair carries the
    EXACT distance — i.e. the banded JVM DP (cap ceil(r·maxlen)+1) and
    the length-gap prune never abandon a pair that could pass, on
    arbitrary edit scripts whose true distance straddles the band."""
    from slow_tortoise_spark.operators.dedup import verify_pairs_edit_distance

    other = base
    for op, pos, ch in ops:
        if not other and op != 1:
            continue
        p = pos % max(len(other), 1)
        if op == 0:      # substitute
            other = other[:p] + ch + other[p + 1:]
        elif op == 1:    # insert
            p = pos % (len(other) + 1)
            other = other[:p] + ch + other[p:]
        else:            # delete
            other = other[:p] + other[p + 1:]

    dist = _lev(base, other)
    maxlen = max(len(base), len(other), 1)

    docs = spark_session.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    )
    pairs = spark_session.createDataFrame(
        [(1, 2)], "doc_a long, doc_b long"
    )
    got = verify_pairs_edit_distance(docs, pairs,
                                     max_ratio=ratio).collect()
    if dist / maxlen <= ratio:
        assert len(got) == 1
        assert got[0]["edit_distance"] == dist
        assert got[0]["edit_ratio"] == dist / maxlen
    else:
        assert got == []


_edge_graphs = st.lists(
    st.tuples(st.integers(min_value=0, max_value=9),
              st.integers(min_value=0, max_value=9)),
    min_size=1, max_size=25,
)


def _py_balls(edges, radius):
    """Reverse-BFS reference: {v: [count at distance 1..radius]} over
    the simple digraph (self-loops/multiplicity ignored)."""
    es = {(a, b) for a, b in edges if a != b}
    nodes = {x for e in es for x in e}
    preds = {}
    for a, b in es:
        preds.setdefault(b, set()).add(a)
    out = {}
    for v in nodes:
        seen = {v}
        frontier = {v}
        counts = []
        for _ in range(radius):
            frontier = {
                p for u in frontier for p in preds.get(u, ())
            } - seen
            counts.append(len(frontier))
            seen |= frontier
        out[v] = counts
    return out


@given(edges=_edge_graphs)
@settings(max_examples=8, deadline=None)
def test_harmonic_centrality_matches_python_bfs_property(
        spark_session, edges):
    """Exact harmonic centrality equals a pure-Python reverse-BFS
    reference on arbitrary small digraphs (cycles, self-loops,
    multi-edges, disconnected parts)."""
    from pyspark.sql import Row

    from slow_tortoise_spark.operators.graph import harmonic_centrality

    df = spark_session.createDataFrame(
        [Row(src=f"n{a}", dst=f"n{b}") for a, b in edges],
        "src string, dst string",
    )
    got = {r["node"]: r["harmonic"]
           for r in harmonic_centrality(df, radius=3).collect()}
    want = {
        f"n{v}": counts[0] / 1.0 + counts[1] / 2.0 + counts[2] / 3.0
        for v, counts in _py_balls(edges, 3).items()
    }
    if not want:  # all edges were self-loops → empty simple graph
        assert got == {}
        return
    assert got == want


@given(edges=_edge_graphs, k=st.integers(min_value=1, max_value=4))
@settings(max_examples=8, deadline=None)
def test_k_core_matches_python_peeling_property(spark_session, edges, k):
    """k_core equals a pure-Python peel-to-fixpoint reference on
    arbitrary small graphs (the fixpoint is unique, so any removal
    order agrees)."""
    from pyspark.sql import Row

    from slow_tortoise_spark.operators.graph import k_core

    df = spark_session.createDataFrame(
        [Row(src=f"n{a}", dst=f"n{b}") for a, b in edges],
        "src string, dst string",
    )
    got = {r["node"]: r["degree"] for r in k_core(df, k=k).collect()}
    adj = {}
    for a, b in {(a, b) for a, b in edges if a != b}:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    while True:
        bad = [v for v, nb in adj.items() if len(nb) < k]
        if not bad:
            break
        for v in bad:
            for nb in adj.pop(v):
                adj[nb].discard(v)
    assert got == {f"n{v}": len(nb) for v, nb in adj.items()}


@given(edges=_edge_graphs)
@settings(max_examples=6, deadline=None)
def test_hyperball_estimate_is_register_function_property(
        spark_session, edges):
    """The HyperBall estimate is a deterministic function of EXACT ball
    membership: recomputing every register in Python from the reference
    balls and applying the same HLL fold reproduces the engine's
    harmonic_est to micros on arbitrary graphs (ln is the one libm
    call in the fold; JVM StrictMath and CPython libm may differ in
    the last ulp, which micros rounding absorbs — the same contract
    the DuckDB oracle row checks at)."""
    import hashlib
    import math

    from pyspark.sql import Row

    from slow_tortoise_spark.operators.graph import hyperball_harmonic

    df = spark_session.createDataFrame(
        [Row(src=f"n{a}", dst=f"n{b}") for a, b in edges],
        "src string, dst string",
    )
    got = {r["node"]: r["harmonic_est"]
           for r in hyperball_harmonic(df, radius=3).collect()}

    def jr(name):
        h = hashlib.md5(name.encode()).hexdigest()
        j = int(h[0], 16)
        w = int(h[1:7], 16)
        rank = 25 if w == 0 else 25 - w.bit_length()
        return j, rank

    def estimate(members):
        regs = [0] * 16
        for m in members:
            j, rank = jr(f"n{m}")  # engine hashes the node STRING
            regs[j] = max(regs[j], rank)
        s = 0.0
        for rk in regs:
            s = s + 2.0 ** (-float(rk))
        v = sum(1 for rk in regs if rk == 0)
        e_raw = 0.673 * 256.0 / s
        if e_raw <= 40.0 and v > 0:
            return 16.0 * math.log(16.0 / float(v))
        return e_raw

    es = {(a, b) for a, b in edges if a != b}
    nodes = {x for e in es for x in e}
    preds = {}
    for a, b in es:
        preds.setdefault(b, set()).add(a)
    want = {}
    for v in nodes:
        seen = {v}
        frontier = {v}
        ests = [estimate(seen)]
        for _ in range(3):
            frontier = {
                p for u in frontier for p in preds.get(u, ())
            } - seen
            seen |= frontier
            ests.append(estimate(seen))
        h = 0.0
        for r in range(1, 4):
            h = h + max(0.0, ests[r] - ests[r - 1]) / float(r)
        want[f"n{v}"] = h
    assert {k: round(x * 1e6) for k, x in got.items()} == {
        k: round(x * 1e6) for k, x in want.items()}


@given(edges=_edge_graphs, iters=st.integers(min_value=1, max_value=3))
@settings(max_examples=8, deadline=None)
def test_label_propagation_matches_python_replay_property(
        spark_session, edges, iters):
    """Synchronous min-tie-break LP equals a pure-Python replay on
    arbitrary small graphs (multi-edges and self-loops collapse to the
    simple graph; labels are exact strings, so equality is exact)."""
    import collections

    from pyspark.sql import Row

    from slow_tortoise_spark.operators.graph import label_propagation

    df = spark_session.createDataFrame(
        [Row(src=f"n{a}", dst=f"n{b}") for a, b in edges],
        "src string, dst string",
    )
    got = {r["node"]: r["label"]
           for r in label_propagation(df, iters=iters).collect()}
    adj = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[f"n{a}"].add(f"n{b}")
            adj[f"n{b}"].add(f"n{a}")
    lab = {v: v for v in adj}
    for _ in range(iters):
        new = {}
        for v in adj:
            cnt = collections.Counter(lab[u] for u in adj[v])
            new[v] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        lab = new
    assert got == lab


@given(edges=_edge_graphs)
@settings(max_examples=8, deadline=None)
def test_core_number_matches_python_reference_property(
        spark_session, edges):
    """Core numbers equal a pure-Python peel-per-level reference on
    arbitrary small graphs — the decomposition is a graph invariant,
    so the engine's bucket peeling with level jumps and the naive
    level-by-level reference must agree exactly."""
    from pyspark.sql import Row

    from slow_tortoise_spark.operators.graph import core_number

    df = spark_session.createDataFrame(
        [Row(src=f"n{a}", dst=f"n{b}") for a, b in edges],
        "src string, dst string",
    )
    got = {r["node"]: r["core"] for r in core_number(df).collect()}
    adj = {}
    for a, b in {(a, b) for a, b in edges if a != b}:
        adj.setdefault(f"n{a}", set()).add(f"n{b}")
        adj.setdefault(f"n{b}", set()).add(f"n{a}")
    cores = {}
    k = 1
    while adj:
        while True:
            bad = [v for v, ns in adj.items() if len(ns) < k]
            if not bad:
                break
            for v in bad:
                cores[v] = k - 1
                for u in adj.pop(v):
                    if u in adj:
                        adj[u].discard(v)
        k += 1
    assert got == cores


@given(edges=_edge_graphs)
@settings(max_examples=6, deadline=None)
def test_hyperball_closeness_is_register_function_property(
        spark_session, edges):
    """Closeness is the SAME deterministic register function as the
    harmonic sibling with a different fold: rebuilding every register
    from exact ball membership and applying (ê_R − 1)/Σ r·Δ_r
    reproduces the engine to micros on arbitrary graphs."""
    import hashlib
    import math

    from pyspark.sql import Row

    from slow_tortoise_spark.operators.graph import hyperball_closeness

    df = spark_session.createDataFrame(
        [Row(src=f"n{a}", dst=f"n{b}") for a, b in edges],
        "src string, dst string",
    )
    got = {r["node"]: r["closeness_est"]
           for r in hyperball_closeness(df, radius=3).collect()}

    def jr(name):
        h = hashlib.md5(name.encode()).hexdigest()
        j = int(h[0], 16)
        w = int(h[1:7], 16)
        rank = 25 if w == 0 else 25 - w.bit_length()
        return j, rank

    def estimate(members):
        regs = [0] * 16
        for m in members:
            j, rank = jr(f"n{m}")
            regs[j] = max(regs[j], rank)
        s = 0.0
        for rk in regs:
            s = s + 2.0 ** (-float(rk))
        v = sum(1 for rk in regs if rk == 0)
        e_raw = 0.673 * 256.0 / s
        if e_raw <= 40.0 and v > 0:
            return 16.0 * math.log(16.0 / float(v))
        return e_raw

    es = {(a, b) for a, b in edges if a != b}
    nodes = {x for e in es for x in e}
    preds = {}
    for a, b in es:
        preds.setdefault(b, set()).add(a)
    want = {}
    for v in nodes:
        seen = {v}
        frontier = {v}
        ests = [estimate(seen)]
        for _ in range(3):
            frontier = {
                p for u in frontier for p in preds.get(u, ())
            } - seen
            seen |= frontier
            ests.append(estimate(seen))
        sumd = 0.0
        for r in range(1, 4):
            sumd = sumd + float(r) * max(0.0, ests[r] - ests[r - 1])
        want[f"n{v}"] = (ests[3] - 1.0) / sumd if sumd > 0.0 else 0.0
    assert {k: round(x * 1e6) for k, x in got.items()} == {
        k: round(x * 1e6) for k, x in want.items()}


@given(edges=_edge_graphs)
@settings(max_examples=8, deadline=None)
def test_triangle_counts_matches_python_reference_property(
        spark_session, edges):
    """Per-node triangle counts and clustering equal a brute-force
    Python reference on arbitrary small graphs — the degree-ordered
    path-closure enumeration must count every triangle exactly once,
    including under ties in the (degree, id) order."""
    from pyspark.sql import Row

    from slow_tortoise_spark.operators.graph import triangle_counts

    df = spark_session.createDataFrame(
        [Row(src=f"n{a}", dst=f"n{b}") for a, b in edges],
        "src string, dst string",
    )
    got = {r["node"]: (r["degree"], r["triangles"],
                       round(r["clustering"] * 1e6))
           for r in triangle_counts(df).collect()}
    adj = {}
    for a, b in {(a, b) for a, b in edges if a != b}:
        adj.setdefault(f"n{a}", set()).add(f"n{b}")
        adj.setdefault(f"n{b}", set()).add(f"n{a}")
    want = {}
    for v, ns in adj.items():
        t = sum(
            1 for x in ns for y in ns
            if x < y and y in adj.get(x, ())
        )
        d = len(ns)
        c = 2.0 * t / (d * (d - 1.0)) if d >= 2 else 0.0
        want[v] = (d, t, round(c * 1e6))
    assert got == want


@given(
    toks=st.lists(st.integers(0, 40), min_size=1, max_size=30),
    mt=st.integers(1, 24),
)
@settings(max_examples=8, deadline=None)
def test_nosplit_packing_invariants_property(spark_session, toks, mt):
    """Next-fit no-split packing on arbitrary token-count corpora
    (zero-token docs, exact fits, oversize docs): the Spark manifest
    equals the single-scan (seq, fill) state machine replayed in pure
    Python, and no non-oversize doc ever crosses its sequence end."""
    import hashlib

    from pyspark.sql import Row

    from slow_tortoise_spark.operators.packing import (
        pack_sequences_nosplit,
    )

    docs = spark_session.createDataFrame(
        [Row(doc_id=i, n=n) for i, n in enumerate(toks)],
        "doc_id long, n long",
    )
    got = {
        r["doc_id"]: (r["bucket"], r["tokens"], r["seq"], r["seq_offset"])
        for r in pack_sequences_nosplit(
            docs, max_tokens=mt, n_buckets=4, token_count_col="n",
            oversize="isolate",
        ).collect()
    }
    by_bucket: dict[int, list] = {}
    for i, n in enumerate(toks):
        h = hashlib.md5(f"pack:{i}".encode()).hexdigest()
        by_bucket.setdefault(int(h[:4], 16) % 4, []).append((i, n))
    want = {}
    for b, items in by_bucket.items():
        cur, fill = 0, 0
        for i, n in sorted(items):
            if n > mt:
                if fill > 0:
                    cur += 1
                want[i] = (b, n, cur, 0)
                fill = mt
            elif n == 0:
                want[i] = (b, n, cur, fill)
            elif fill + n <= mt:
                want[i] = (b, n, cur, fill)
                fill += n
            else:
                cur += 1
                want[i] = (b, n, cur, 0)
                fill = n
    assert got == want
    for i, (b, n, s, off) in got.items():
        if 0 < n <= mt:
            assert off + n <= mt
