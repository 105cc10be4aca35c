"""Round-7 scale probe: cost curves for the five most expensive
operator families at 1x / 5x / 20x the sf0.1 documents corpus
(and a 1x/5x/20x synthetic link graph for PageRank).

Corpus scaling is REPLICA-UNIQUE: every replica prefixes every token
with a replica tag, so no window/shingle duplicates across replicas —
pair yield and duplication structure scale linearly with k and the
measured curve isolates the engine's shuffle/agg scaling, not a planted
quadratic pair explosion. (The round-6 probe already measured the
planted-duplication direction: a 4x corpus with cross-doc duplication
ran FASTER than 1x clean because duplicated windows collapse in the
map-side partial aggregate.)

Usage: python tools/scale_probe_r7.py [--scales 1,5,20]
Prints one JSON line per (operator, scale) with wall seconds; paste the
summary into SCALING.md. Times are noop-sink executions (nothing
collected to the driver) on a quiet box.
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
WORK = "/tmp/scale_probe_r7"


def build_scaled(spark, k: int, path: str) -> None:
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n = docs.count()
    parts = []
    for r in range(k):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                # replica-unique tokens: prefix every token with r<r>z
                F.regexp_replace("text", r"(\S+)", f"r{r}z$1").alias("text"),
                "lang",
                "source",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(path)
    print(f"# built {k}x corpus ({n * k} docs) at {path}", flush=True)


def build_edges(spark, k: int, path: str) -> None:
    # deterministic power-law-ish multigraph: k * 200k edges over
    # k * 5k nodes; same generator at every scale so density is constant.
    # Destinations span the FULL node range with a hub skew: squaring a
    # uniform [0,1) hash draws low ids quadratically more often (a
    # Zipf-ish in-degree tail) while the support still grows with k —
    # the round-7 formula (hash % (id % 97 + 3)) capped every dst at
    # <= 98 regardless of scale, so the "constant density" claim and the
    # PageRank curve interpretation were wrong (round-7 advice).
    n_nodes = 5_000 * k
    n_edges = 200_000 * k
    u = (F.abs(F.xxhash64(F.col("id"))) % 1_000_003) / 1_000_003.0
    edges = spark.range(n_edges).select(
        (F.col("id") % n_nodes).cast("long").alias("src"),
        F.floor(u * u * n_nodes).cast("long").alias("dst"),
    )
    edges.write.mode("overwrite").parquet(path)


def timed(label: str, k: int, thunk) -> None:
    # thunk, not DataFrame: pagerank checkpoints per iteration during
    # CONSTRUCTION, so construction must sit inside the timing window
    t0 = time.perf_counter()
    thunk().write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    print(json.dumps({"op": label, "scale": k, "sec": round(dt, 2)}), flush=True)


def main() -> None:
    scales = [1, 5, 20]
    for a in sys.argv[1:]:
        if a.startswith("--scales"):
            scales = [int(x) for x in a.split("=", 1)[1].split(",")]
    spark = get_spark("scale-probe-r7")
    spark.sparkContext.setLogLevel("ERROR")
    from eligibility_etl_airflow_spark.operators import dedup, linkgraph, neardup

    os.makedirs(WORK, exist_ok=True)
    for k in scales:
        dpath = os.path.join(WORK, f"docs_{k}x")
        epath = os.path.join(WORK, f"edges_{k}x")
        build_scaled(spark, k, dpath)
        build_edges(spark, k, epath)
        docs = spark.read.parquet(dpath)
        edges = spark.read.parquet(epath)

        timed(
            "duplicate_spans(hashed)",
            k,
            lambda: dedup.duplicate_spans(docs, min_tokens=16, hashed=True),
        )
        timed(
            "remove_duplicate_spans(hashed)",
            k,
            lambda: dedup.remove_duplicate_spans(docs, min_tokens=16, hashed=True),
        )
        timed(
            "set_similarity_join(t=0.5,k=5)",
            k,
            lambda: neardup.set_similarity_join(
                docs, "doc_id", "text", threshold=0.5, shingle_k=5
            ),
        )
        timed(
            "containment_join(t=0.8,k=3)",
            k,
            lambda: neardup.containment_join(
                docs, "doc_id", "text", threshold=0.8, shingle_k=3
            ),
        )
        timed(
            "minhash_lsh_pairs(64perm,16band)",
            k,
            lambda: neardup.minhash_lsh_pairs(
                docs, "doc_id", "text", num_perm=64, bands=16
            ),
        )
        timed(
            "pagerank(5 iter)",
            k,
            lambda: linkgraph.pagerank(edges, iterations=5),
        )
        spark.catalog.clearCache()
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
