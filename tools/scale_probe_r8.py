"""Round-8 scale probe: cost curves for the retrieval / ANN tier at
1x / 5x / 20x — the families the round-7 probe did not cover
(bm25, tfidf, LSH/IVF/PQ top-k, semantic dedup, brute-force baseline).

Scaling is plain replication for the text side (bm25/tfidf have no
pair-explosion term: postings and term dictionaries grow linearly, and
the fixed 4-term query's matched postings must KEEP growing with the
corpus or the probe would measure a constant-size join). The embedding
side replicates with a per-(replica, dimension) perturbation so vectors
stay distinct and clusters keep their spread — identical replicas would
pile into degenerate LSH buckets / k-means cells and measure the cap
logic instead of the scaling. Embedding replicas run at 10x the doc
multiplier (the base table is only 2k rows).

Usage: python tools/scale_probe_r8.py [--scales 1,5,20]
Prints one JSON line per (operator, scale); paste the summary into
SCALING.md. Times are noop-sink executions on a quiet box; ANN queries
are a FIXED 16-vector set at every scale, so curves isolate corpus-side
cost.
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
WORK = "/tmp/scale_probe_r8"


def build_docs(spark, k: int, path: str) -> None:
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
            "text",
        )
        for r in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(path)


def build_embeddings(spark, k: int, path: str) -> None:
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    reps = 10 * k
    parts = []
    for r in range(reps):
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
                # distinct-per-replica vectors: a deterministic small
                # rotation keeps the distribution near the original
                F.transform(
                    "embedding",
                    lambda x, i: x + F.lit(r * 0.0017) * F.cos(i.cast("double")),
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(path)


def timed(label: str, k: int, thunk) -> None:
    t0 = time.perf_counter()
    thunk().write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    print(json.dumps({"op": label, "scale": k, "sec": round(dt, 2)}), flush=True)


def tfidf_top3(docs):
    from pyspark.sql.window import Window

    toks = docs.select(
        "doc_id", F.explode_outer(F.split(F.lower("text"), "[^a-z]+")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score", F.col("tf") * F.log(F.col("n_docs") / F.col("dfreq")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 3)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--scales",
        default="1,5,20",
        help="comma-separated replica multipliers (default 1,5,20)",
    )
    scales = [int(x) for x in ap.parse_args().scales.split(",")]
    spark = get_spark("scale-probe-r8")
    spark.sparkContext.setLogLevel("ERROR")
    from eligibility_etl_airflow_spark.operators import search, semdedup, similarity

    # fixed query terms (present in the testdata vocabulary) and a
    # fixed 16-vector ANN query set reused at every scale
    q_terms = ["data", "model", "learning", "system"]

    os.makedirs(WORK, exist_ok=True)
    for k in scales:
        dpath = os.path.join(WORK, f"docs_{k}x")
        epath = os.path.join(WORK, f"emb_{k}x")
        build_docs(spark, k, dpath)
        build_embeddings(spark, k, epath)
        docs = spark.read.parquet(dpath)
        emb = spark.read.parquet(epath)
        queries = emb.filter(F.col("vec_id") < 16)

        timed(
            "bm25_topk(4 terms, k=10)",
            k,
            lambda: search.bm25_topk(docs, "doc_id", "text", q_terms, k=10),
        )
        timed("tfidf_top3", k, lambda: tfidf_top3(docs))
        timed(
            "brute_force_topk(16 q)",
            k,
            lambda: similarity.brute_force_topk(emb, queries, k=5),
        )
        timed(
            "lsh_topk(16 q, 8 tables)",
            k,
            lambda: similarity.lsh_topk(
                emb, queries, dim=64, k=5, n_planes=10, n_tables=8
            ),
        )
        timed(
            "ivf_topk(16 q, 64 cells)",
            k,
            lambda: similarity.ivf_topk(emb, queries, k=5, n_cells=64, nprobe=4),
        )
        timed(
            "pq_topk(16 q, m=16)",
            k,
            lambda: similarity.pq_topk(
                emb, queries, k=5, m=16, codes_k=32, refine=20
            ),
        )
        timed(
            "semantic_dedup_drops(k=64)",
            k,
            lambda: semdedup.semantic_dedup_drops(
                emb, "vec_id", "embedding", k=64, eps=0.99
            ),
        )
        # the linearity knob: k scaled with the corpus keeps expected
        # cluster size constant, so the quadratic-within-cluster compare
        # stays bounded and total cost grows ~linearly (vs the fixed-k
        # line above, which measured 7.7x cost at 20x data)
        timed(
            "semantic_dedup_drops(k=auto)",
            k,
            lambda: semdedup.semantic_dedup_drops(
                emb, "vec_id", "embedding", k="auto",
                target_cluster_size=300, eps=0.99
            ),
        )
        spark.catalog.clearCache()
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
