"""sf1 relational probe: run the two flagships plus the heaviest
relational queries against a ~10x-scaled TPC-H-ish dataset (lineitem
~6M rows) — the relational tier has only ever executed at sf0.1, and
this checks AQE behavior and the absence of driver-side surprises one
order of magnitude up.

The scaled tables are built by replication with CONSISTENT key offsets
(orders/lineitem share the orderkey offset, orders/customer the custkey
offset, …), so join fan-outs and group cardinalities scale the way a
real sf1 would: 10x facts, 10x customers, fixed nation/region dims.

Usage: python tools/sf1_probe.py [--mult 10] [--queries a,b,c]
Prints one JSON line per query; paste the summary into SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/sf1_probe"
DOCS_MULT = 10  # overridden by --docs-mult

QUERIES = [
    "eligibility_flagship",
    "resubmission_flagship",
    "pricing_summary_sql",
    "latest_order_dense_rank",
    "percentile_stats",
    "salted_join_skew",
    "grouped_multi_agg",
    # text/dedup tier (r9, verdict #6): runs against documents scaled by
    # --docs-mult IN THE SAME SESSION as the 10x relational tables — the
    # combined executor memory pressure is exactly what had never been
    # probed
    "duplicate_text_spans",
    "dedup_span_removal",
    "dedup_minhash_lsh",
    "set_similarity_pairs",
]


def build(spark, mult: int) -> str:
    out = os.path.join(WORK, f"sf{mult}x")
    os.makedirs(out, exist_ok=True)
    offs = {  # per-table replica key offsets (consistent across FKs)
        "c": 1_000_000, "o": 10_000_000, "p": 1_000_000,
        "s": 100_000, "e": 10_000_000, "u": 1_000_000,
    }
    for t in ("region", "nation"):  # fixed dims
        spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"{t}.parquet"))
    specs = {
        "customer": lambda df, r: df.withColumn(
            "c_custkey", F.col("c_custkey") + F.lit(r * offs["c"])
        ),
        "orders": lambda df, r: df.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(r * offs["o"])
        ).withColumn("o_custkey", F.col("o_custkey") + F.lit(r * offs["c"])),
        "lineitem": lambda df, r: df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(r * offs["o"])
        )
        .withColumn("l_partkey", F.col("l_partkey") + F.lit(r * offs["p"]))
        .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(r * offs["s"])),
        "supplier": lambda df, r: df.withColumn(
            "s_suppkey", F.col("s_suppkey") + F.lit(r * offs["s"])
        ),
        "part": lambda df, r: df.withColumn(
            "p_partkey", F.col("p_partkey") + F.lit(r * offs["p"])
        ),
        "events": lambda df, r: df.withColumn(
            "event_id", F.col("event_id") + F.lit(r * offs["e"])
        ).withColumn("user_id", F.col("user_id") + F.lit(r * offs["u"])),
    }
    # embeddings stay 1x (the ANN tier has its own 1/5/20x probe);
    # documents replicate by --docs-mult with doc_id offsets AND a
    # per-replica token re-hash: identical replicated text would hand
    # the pair operators an artificial 10-clique per document (a
    # pathological corpus, not a scale-up), while token-rehashed
    # replicas keep doc lengths / within-replica near-dup structure and
    # are shingle-disjoint ACROSS replicas — pair counts then scale
    # linearly, the honest 10x.
    for t in ("embeddings",):
        src = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(src):
            spark.read.parquet(src).write.mode("overwrite").parquet(
                os.path.join(out, f"{t}.parquet")
            )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    doc_parts = [docs]
    for r in range(1, DOCS_MULT):
        salt = F.lit(f"|r{r}")
        doc_parts.append(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(r * 10_000_000))
            .withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda w: F.substring(F.md5(F.concat(w, salt)), 1, 7),
                    ),
                ),
            )
        )
    drel = doc_parts[0]
    for p in doc_parts[1:]:
        drel = drel.unionByName(p)
    drel.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    for t, bump in specs.items():
        base = spark.read.parquet(os.path.join(SF_DIR, f"{t}.parquet"))
        parts = [bump(base, r) for r in range(mult)]
        rel = parts[0]
        for p in parts[1:]:
            rel = rel.unionByName(p)
        rel.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    return out


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mult", type=int, default=10, help="table replica multiplier")
    ap.add_argument(
        "--docs-mult",
        type=int,
        default=10,
        help="documents replica multiplier (token-rehashed per replica)",
    )
    ap.add_argument(
        "--queries",
        default=",".join(QUERIES),
        help="comma-separated registered query names",
    )
    opts = ap.parse_args()
    mult = opts.mult
    global DOCS_MULT
    DOCS_MULT = opts.docs_mult
    names = opts.queries.split(",")
    from eligibility_etl_airflow_spark import registry

    registry.load_all()
    spark = get_spark("sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = build(spark, mult)
    for name in names:
        fn = registry.QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        print(
            json.dumps({"op": name, "mult": mult, "sec": round(dt, 2)}),
            flush=True,
        )
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
