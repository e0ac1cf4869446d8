"""Replicate the driver's sf0.1 testdata N× (default 10×, i.e. an sf1
equivalent: 6 M lineitem rows) for BENCH scaling runs only — correctness
always runs on the driver-generated parquet untouched.

Each copy i shifts every surrogate key by ``i * (max_key + 1)`` of its
key DOMAIN, so referential joins stay consistent copy-by-copy (copy i's
lineitem rows join copy i's orders, orders join copy i's customers, …)
and key cardinalities genuinely grow 10× — the shape that stresses
shuffle sizing, not just scan width.  Dimension tables region/nation
stay unscaled (5/25 rows, exactly like real TPC-H at any SF), so the
broadcast-dim assumptions the query plans make remain honest.
`documents.text` gets a per-copy marker token appended: dedup operators
then see each document with 9 near-duplicates instead of 9 byte-exact
twins, keeping MinHash/SimHash candidate generation busy rather than
degenerate.  `user_id` in events is a natural key and keeps its value
range (10× the events over the same users — hot-key realism).

Usage:  python tools/make_sf_scale.py [out_dir] [copies] [src_dir]
Defaults: /tmp/sfdata/sf1  10  /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: key column -> key domain (columns sharing a domain shift together)
_KEY_DOMAINS = {
    "o_orderkey": "order",
    "l_orderkey": "order",
    "o_custkey": "cust",
    "c_custkey": "cust",
    "l_partkey": "part",
    "p_partkey": "part",
    "l_suppkey": "supp",
    "s_suppkey": "supp",
    "event_id": "event",
    "doc_id": "doc",
    "vec_id": "vec",
}

#: tables copied through unscaled (true dimensions)
_UNSCALED = ("region", "nation")

_TABLES = ("region nation customer supplier part orders lineitem events "
           "documents embeddings").split()


def scale(out_dir: str, copies: int, src_dir: str) -> None:
    from pyspark.sql import functions as F

    from slow_tortoise_spark.session import get_spark
    from slow_tortoise_spark.sources.reader import read_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="make_sf_scale",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    os.makedirs(out_dir, exist_ok=True)

    # one max per key DOMAIN so e.g. l_orderkey and o_orderkey shift by
    # the same stride and the join keys stay aligned within a copy
    strides: dict[str, int] = {}
    frames = {t: read_table(spark, f"{src_dir}/{t}.parquet")
              for t in _TABLES}
    for t, df in frames.items():
        for col, dom in _KEY_DOMAINS.items():
            if col in df.columns:
                m = df.agg(F.max(col)).first()[0] or 0
                strides[dom] = max(strides.get(dom, 0), int(m) + 1)

    for t, df in frames.items():
        dest = os.path.join(out_dir, f"{t}.parquet")
        if t in _UNSCALED:
            df.write.mode("overwrite").parquet(dest)
            continue
        parts = []
        for i in range(copies):
            c = df
            for col, dom in _KEY_DOMAINS.items():
                if col in c.columns:
                    c = c.withColumn(
                        col, (F.col(col) + F.lit(i * strides[dom]))
                        .cast(dict(df.dtypes)[col])
                    )
            if t == "documents" and i > 0:
                c = c.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" copymark{i}"))
                )
            parts.append(c)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(dest)
        n = spark.read.parquet(dest).count()
        print(f"{t}: {n} rows -> {dest}")
    spark.stop()


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfdata/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    scale(out, copies, src)
