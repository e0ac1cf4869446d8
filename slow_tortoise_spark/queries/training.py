"""Training-data ops: dedup / text / similarity on documents +
embeddings (catalog-core portion).  Formerly queries.py lines 921-1339."""
from __future__ import annotations

from slow_tortoise_spark.queries._shared import (
    F,
    _t,
    brute_force_topk,
    build_ivf_index,
    cosine_col,
    fingerprint,
    ivf_topk,
    jaccard_pairs,
    language_id,
    minhash_lsh_candidates,
    minhash_signature,
    simhash16,
)

# ---------------------------------------------------------------------------
# Training-data ops: dedup / text / similarity on documents + embeddings
# ---------------------------------------------------------------------------

_SHINGLES_SQL = """
  toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                       x -> x <> '') AS l
    FROM documents
  ),
  flat AS (
    SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM toks
  ),
  grams AS (
    SELECT doc_id,
           tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
    FROM flat
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    QUALIFY lead(tok, 2) OVER w IS NOT NULL
  ),
  shingles AS (SELECT DISTINCT doc_id, shingle FROM grams)
"""


def q_doc_fingerprints(spark, sf_dir):
    """Exact-dedup fingerprint: md5 of normalized text."""
    docs = _t(spark, sf_dir, "documents")
    return fingerprint(docs).select("doc_id", "fingerprint").orderBy("doc_id")


_Q_DOC_FINGERPRINTS = """
  SELECT doc_id,
         md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
  FROM documents ORDER BY doc_id
"""


def q_token_stats(spark, sf_dir):
    """Text quality metrics: token/char counts, punctuation, digit ratio."""
    docs = _t(spark, sf_dir, "documents")
    text = F.col("text")
    toks = F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(text, r"[0-9]", ""))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        n_chars.alias("n_chars"),
        n_punct.alias("n_punct"),
        F.round(n_digit.cast("double") / F.greatest(n_chars, F.lit(1)), 6).alias(
            "digit_ratio"
        ),
    ).orderBy("doc_id")


_Q_TOKEN_STATS = """
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '')) AS n_tokens,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct,
         round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
               / greatest(length(text), 1), 6) AS digit_ratio
  FROM documents ORDER BY doc_id
"""


def q_lang_id(spark, sf_dir):
    """Stopword-hit language heuristic (library operator)."""
    docs = _t(spark, sf_dir, "documents")
    return language_id(docs).select("doc_id", "lang_pred").orderBy("doc_id")


def _lang_id_sql():
    from slow_tortoise_spark.operators.text import LANG_STOPWORDS

    hits = []
    for lang in sorted(LANG_STOPWORDS):
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        hits.append(
            f"len(list_filter(toks, x -> x IN ({words}))) AS hits_{lang}"
        )
    langs = sorted(LANG_STOPWORDS)
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN hits_{lang} = best THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
      WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           x -> x <> '') AS toks
        FROM documents
      ),
      h AS (SELECT doc_id, {', '.join(hits)} FROM t),
      b AS (SELECT *, {best} AS best FROM h)
      SELECT doc_id, CASE WHEN best > 0 THEN {case} ELSE 'und' END AS lang_pred
      FROM b ORDER BY doc_id
    """


def q_minhash_signatures(spark, sf_dir):
    """MinHash signatures (k=8) — portable lexicographic min-md5."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_signature(docs, k=8).orderBy("doc_id")


# Family member i = 64-bit half i%2 of md5((i//2) || ':' || shingle)
# — mirrors operators/dedup.py::minhash_signature exactly.
_MH_COLS = ", ".join(
    f"MIN(substr(md5('{i // 2}:' || shingle), {1 + 16 * (i % 2)}, 16))"
    f" AS mh{i}"
    for i in range(8)
)
_Q_MINHASH_SIGNATURES = f"""
  WITH {_SHINGLES_SQL}
  SELECT doc_id, {_MH_COLS} FROM shingles GROUP BY doc_id ORDER BY doc_id
"""


def q_minhash_lsh_pairs(spark, sf_dir):
    """Banded LSH candidate pairs (k=8, bands=4)."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_candidates(docs, k=8, bands=4).orderBy("doc_a", "doc_b")


_Q_MINHASH_LSH_PAIRS = f"""
  WITH {_SHINGLES_SQL},
  sig AS (SELECT doc_id, {_MH_COLS} FROM shingles GROUP BY doc_id),
  bands AS (
    SELECT doc_id, '0:' || md5(mh0 || '|' || mh1) AS bucket FROM sig
    UNION ALL SELECT doc_id, '1:' || md5(mh2 || '|' || mh3) FROM sig
    UNION ALL SELECT doc_id, '2:' || md5(mh4 || '|' || mh5) FROM sig
    UNION ALL SELECT doc_id, '3:' || md5(mh6 || '|' || mh7) FROM sig
  )
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
  ORDER BY doc_a, doc_b
"""


def q_jaccard_pairs(spark, sf_dir):
    """Exact n-gram Jaccard pairs ≥ 0.7 (ratio of exact ints → portable).

    Catalog entry runs the cost-based ``jaccard_pairs_auto``: one
    aggregate prices the naive self-join's Σ df² intermediate exactly and
    the PPJoin prefix plan runs whenever that exceeds the budget — so the
    plan is scale-safe by construction (the quadratic tier can only run
    when its intermediate is provably bounded).  Both plans return
    identical results (pytest asserts it); the oracle below is the
    straightforward all-pairs SQL.
    """
    from slow_tortoise_spark.operators.dedup import jaccard_pairs_auto

    docs = _t(spark, sf_dir, "documents")
    out = jaccard_pairs_auto(docs, threshold=0.7)
    return out.select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("doc_a", "doc_b")


_Q_JACCARD_PAIRS = f"""
  WITH {_SHINGLES_SQL},
  sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingles GROUP BY doc_id),
  inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
    FROM shingles a JOIN shingles b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
  )
  SELECT doc_a, doc_b,
         round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE n_common / (sa.n + sb.n - n_common) >= 0.7
  ORDER BY doc_a, doc_b
"""


def q_simhash(spark, sf_dir):
    """64-bit SimHash fingerprints (md5 nibble bits, portable) — the
    corpus-scale width whose hamming bands stay selective (operators/
    dedup.py simhash64 docstring; 16-bit is the verifier tier)."""
    from slow_tortoise_spark.operators.dedup import simhash64

    docs = _t(spark, sf_dir, "documents")
    return simhash64(docs).orderBy("doc_id")


def _simhash_sql(n_bits: int = 64):
    """DuckDB replay of the n-bit SimHash. Bit 63 is the BIGINT sign
    bit: ``1 << 63`` overflows ANSI engines, so it is added as the
    literal −2^63 (same two's-complement pattern — mirrored in the
    Spark packing, operators/dedup.py:_simhash_bits)."""
    votes = []
    for i in range(n_bits):
        nib = f"(strpos('0123456789abcdef', substr(h, {1 + i // 4}, 1)) - 1)"
        votes.append(
            f"SUM(CASE WHEN ({nib} >> {i % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
        )
    packed = " + ".join(
        f"(CASE WHEN v{i} > 0 THEN CAST({-(2**63) if i == 63 else 2**i} AS BIGINT)"
        f" ELSE 0 END)"
        for i in range(n_bits)
    )
    return f"""
      WITH t AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                                  x -> x <> '')) AS tok
        FROM documents
      ),
      hashed AS (SELECT doc_id, md5(tok) AS h FROM t),
      sums AS (SELECT doc_id, {', '.join(votes)} FROM hashed GROUP BY doc_id)
      SELECT doc_id, CAST({packed} AS BIGINT) AS simhash
      FROM sums ORDER BY doc_id
    """


#: collected query-vector memo, keyed like the reader memo (session,
#: path stat signature, vec_id): fetching the 64-float query parameter
#: is a driver job (~80 ms) paid on every query (re)construction — the
#: same query-construction-statistics role as dedup's price memo.  The
#: stat signature invalidates on file rewrite; the top-k RESULT is
#: still computed from parquet on every run.
_QUERY_VEC_MEMO: dict[tuple, list[float]] = {}


def _query_vec(spark, sf_dir: str, vec_id: int) -> list[float]:
    import os

    path = f"{sf_dir}/embeddings.parquet"
    try:
        st = os.stat(path)
        key = (id(spark), path, st.st_mtime_ns, st.st_size, vec_id)
    except OSError:
        key = None
    if key is not None and key in _QUERY_VEC_MEMO:
        return _QUERY_VEC_MEMO[key]
    emb = _t(spark, sf_dir, "embeddings")
    vec = [
        float(x)
        for x in emb.filter(f"vec_id = {vec_id}").first()["embedding"]
    ]
    if key is not None:
        if len(_QUERY_VEC_MEMO) > 256:
            _QUERY_VEC_MEMO.clear()
        _QUERY_VEC_MEMO[key] = vec
    return vec


def q_ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-10 against the vec_id=0 embedding."""
    emb = _t(spark, sf_dir, "embeddings")
    top = brute_force_topk(emb, _query_vec(spark, sf_dir, 0), k=10)
    return top.select("vec_id", F.round("cosine", 6).alias("cosine"))


_Q_ANN_COSINE_TOPK = """
  WITH q AS (
    SELECT unnest(embedding)::DOUBLE AS x,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings WHERE vec_id = 0
  ),
  v AS (
    SELECT vec_id, unnest(embedding)::DOUBLE AS x,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings
  ),
  dots AS (
    SELECT v.vec_id,
           SUM(v.x * q.x) AS dot,
           sqrt(SUM(v.x * v.x)) AS nv
    FROM v JOIN q ON v.i = q.i
    GROUP BY v.vec_id
  ),
  qn AS (SELECT sqrt(SUM(x * x)) AS nq FROM q)
  SELECT vec_id, round(dot / (nv * qn.nq), 6) AS cosine
  FROM dots, qn
  ORDER BY cosine DESC, vec_id
  LIMIT 10
"""


def _hyperplanes(n: int = 4) -> list[list[float]]:
    """n deterministic pseudo-random hyperplanes (seed 42, 6dp literals so
    the SQL oracle embeds the identical values).  The first 4 rows are
    stable for any n (row-major fill), so the bucket query and the banded
    near-dup query share planes 0–3."""
    import numpy as np

    rs = np.random.RandomState(42)
    return [[float(x) for x in row] for row in np.round(rs.randn(n, 64), 6)]


def _planes_values_sql(planes: list[list[float]]) -> str:
    """VALUES-table SQL for a plane list: (plane, i, x) rows."""
    rows = []
    for p, plane in enumerate(planes):
        vals = ", ".join(f"({j + 1}, {x!r})" for j, x in enumerate(plane))
        rows.append(f"SELECT {p} AS plane, i, x FROM (VALUES {vals}) t(i, x)")
    return " UNION ALL ".join(rows)


def q_embedding_near_dups(spark, sf_dir):
    """Banded-LSH bucket → exact cosine rescore (the scale tier).

    Candidates are pairs sharing any of 4 two-plane band buckets (an
    equi-join on (band, bucket) — the plan contains no nested-loop /
    all-pairs join); candidates are rescored with the exact cosine and
    kept at round(cos, 6) ≥ 0.4.  The oracle replicates the identical
    deterministic planes, so the bucketing itself is value-checked.
    Recall vs the exact O(n²) verifier tier is asserted in pytest.
    """
    from slow_tortoise_spark.operators.similarity import lsh_near_duplicates

    emb = _t(spark, sf_dir, "embeddings")
    # prune_below: the filter below keeps round(cos, 6) >= 0.4, i.e.
    # exact cos >= 0.3999995; 0.3999 is strictly under that boundary
    # (margin ~1e-4 >> every float hazard), so the BLAS prune can only
    # drop pairs the filter would drop anyway — output identical.
    scored = lsh_near_duplicates(
        emb, planes=_hyperplanes(8), bands=4, threshold=None,
        prune_below=0.3999,
    )
    return (
        scored.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
        .filter(F.round(F.col("cosine"), 6) >= 0.4)
        .orderBy("id_a", "id_b")
    )


def _embedding_near_dups_sql() -> str:
    planes_sql = _planes_values_sql(_hyperplanes(8))
    return f"""
  WITH planes AS ({planes_sql}),
  v AS (
    SELECT vec_id, unnest(embedding)::DOUBLE AS x,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings
  ),
  dots AS (
    SELECT v.vec_id, p.plane, SUM(v.x * p.x) AS dot
    FROM v JOIN planes p ON v.i = p.i
    GROUP BY 1, 2
  ),
  buckets AS (
    SELECT vec_id, plane // 2 AS band,
           SUM(CASE WHEN dot > 0 THEN CAST(pow(2, plane % 2) AS INT)
                    ELSE 0 END) AS bucket
    FROM dots GROUP BY 1, 2
  ),
  cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM buckets a
    JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
                  AND a.vec_id < b.vec_id
  ),
  pairs AS (
    SELECT c.id_a, c.id_b, SUM(a.x * b.x) AS dot
    FROM cand c
    JOIN v a ON a.vec_id = c.id_a
    JOIN v b ON b.vec_id = c.id_b AND a.i = b.i
    GROUP BY 1, 2
  ),
  norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS n FROM v GROUP BY vec_id)
  SELECT id_a, id_b, round(dot / (na.n * nb.n), 6) AS cosine
  FROM pairs
  JOIN norms na ON id_a = na.vec_id
  JOIN norms nb ON id_b = nb.vec_id
  WHERE round(dot / (na.n * nb.n), 6) >= 0.4
  ORDER BY id_a, id_b
"""


def q_ivf_topk(spark, sf_dir):
    """IVF approximate top-k, fully oracle-checked.

    Seeding is deterministic (top-8 ids by md5(id) — a distributed
    TakeOrderedAndProject, no global sort), so cell assignment, probe
    choice, and the final top-k are all reproducible in SQL: the oracle
    replays the identical index build and probe.  Recall vs the exact
    brute-force tier is asserted in pytest.
    """
    emb = _t(spark, sf_dir, "embeddings")
    query = _query_vec(spark, sf_dir, 7)
    indexed, centroids = build_ivf_index(emb, n_cells=8)
    return ivf_topk(indexed, centroids, query, k=10, nprobe=4).select(
        "vec_id", F.round("cosine", 6).alias("cosine")
    )


_Q_IVF_TOPK = """
  WITH v AS (
    SELECT vec_id, unnest(embedding)::DOUBLE AS x,
           generate_subscripts(embedding, 1) AS i
    FROM embeddings
  ),
  norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS n FROM v GROUP BY vec_id),
  seeds AS (
    SELECT vec_id AS seed_id,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
             - 1 AS cell
    FROM embeddings
    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
    LIMIT 8
  ),
  sv AS (SELECT s.cell, v.i, v.x FROM seeds s JOIN v ON v.vec_id = s.seed_id),
  snorm AS (SELECT cell, sqrt(SUM(x * x)) AS n FROM sv GROUP BY cell),
  vc AS (
    SELECT v.vec_id, sv.cell, SUM(v.x * sv.x) AS dot
    FROM v JOIN sv ON v.i = sv.i
    GROUP BY 1, 2
  ),
  assign AS (
    SELECT vec_id, cell FROM (
      SELECT vc.vec_id, vc.cell,
             row_number() OVER (
               PARTITION BY vc.vec_id
               ORDER BY vc.dot / (nv.n * sn.n) DESC, vc.cell) AS rn
      FROM vc
      JOIN norms nv ON vc.vec_id = nv.vec_id
      JOIN snorm sn ON vc.cell = sn.cell
    ) WHERE rn = 1
  ),
  q AS (SELECT x, i FROM v WHERE vec_id = 7),
  qn AS (SELECT sqrt(SUM(x * x)) AS n FROM q),
  qc AS (
    SELECT sv.cell, SUM(q.x * sv.x) AS dot
    FROM q JOIN sv ON q.i = sv.i GROUP BY 1
  ),
  probe AS (
    SELECT qc.cell
    FROM qc JOIN snorm sn ON qc.cell = sn.cell, qn
    ORDER BY qc.dot / (sn.n * qn.n) DESC, qc.cell
    LIMIT 4
  ),
  dots AS (
    SELECT v.vec_id, SUM(v.x * q.x) AS dot
    FROM v JOIN q ON v.i = q.i
    WHERE v.vec_id IN (
      SELECT a.vec_id FROM assign a JOIN probe p ON a.cell = p.cell)
    GROUP BY 1
  )
  SELECT d.vec_id, round(d.dot / (nv.n * qn.n), 6) AS cosine
  FROM dots d JOIN norms nv ON d.vec_id = nv.vec_id, qn
  ORDER BY cosine DESC, d.vec_id
  LIMIT 10
"""


# ---------------------------------------------------------------------------
