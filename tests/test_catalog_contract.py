"""Catalog-contract guards: the driver consumes queries()/oracle_sql()
blindly, so structural drift (a query without an oracle, a duplicate
key across tiers, an oracle emitting int128) must fail HERE, not in the
driver's correctness run."""

from __future__ import annotations


def test_driver_catalog_is_complete_and_capped():
    import __spark_entry__ as e
    from slow_tortoise_spark.queries import (
        VERIFIER_ORACLE_SQL,
        VERIFIER_QUERIES,
    )

    q = e.queries()
    o = e.oracle_sql()
    assert len(q) == 50  # the driver's hard cap — exactly filled
    assert set(q) == set(o), (
        set(q) ^ set(o)
    )  # every driver query is hash-checked
    assert set(VERIFIER_QUERIES) == set(VERIFIER_ORACLE_SQL)
    # the tiers never overlap (a key in both would shadow silently)
    assert not set(q) & set(VERIFIER_QUERIES)
    # every entry is callable / SQL text
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_no_oracle_emits_int128(spark):
    """DuckDB widens SUM(BIGINT) to HUGEINT, which hash-mismatches
    Spark's BIGINT even for identical values (the dup_ngram_stats
    lesson).  Describe every oracle against empty views and reject
    int128 output columns outright."""
    import duckdb

    import __spark_entry__ as e
    from slow_tortoise_spark.queries import VERIFIER_ORACLE_SQL

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    bad = {}
    for name, sql in {**e.oracle_sql(), **VERIFIER_ORACLE_SQL}.items():
        try:
            cols = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception:
            continue  # non-describable oracles fail louder elsewhere
        hug = [c[0] for c in cols if "HUGEINT" in (c[1] or "").upper()]
        if hug:
            bad[name] = hug
    assert not bad, f"int128 oracle columns: {bad}"
