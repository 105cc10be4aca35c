"""Round-10 E-step closure probe: wall + process-tree peak RSS for
nearest_centroid_assign at large k on the 400k-vector tier, in-closure
vs SparkFiles-chunked (the max_closure_bytes fallback), plus an
equivalence check that the two shapes assign identically.

The auto-k SemDeDup regime sets k ∝ n, so the k × dim centroid matrix
in every task closure is the one unbounded term the r9 rewrite left
open (VERDICT r9, What's wrong #2). This probe measures the fallback's
cost at k ≥ 4096 and records that the bounded shape's working set is a
single chunk regardless of k.

Usage: python tools/scale_probe_estep.py [--ks 1024,4096,8192]
       [--reps 200] [--ceiling-bytes 262144]
Prints one JSON line per (k, shape); paste the summary into SCALING.md.
Times are noop-sink executions on a quiet box. RSS is the peak SUM over
the probe process's visible pyspark workers + JVM, sampled at 50 ms —
coarse, but it catches a closure that balloons every worker.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eligibility_etl_airflow_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/scale_probe_estep"


def build_vectors(spark, reps: int, path: str) -> None:
    """reps distinct-per-replica copies of the sf0.1 embeddings (2k rows,
    dim 64) — same perturbation as the r8 probe so clusters keep their
    spread instead of piling into degenerate cells."""
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    parts = [
        emb.select(
            (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x + F.lit(r * 0.0017) * F.cos(i.cast("double")),
            ).alias("embedding"),
        )
        for r in range(reps)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(path)


def centroid_relation(spark, vec_path: str, k: int):
    """k deterministic centroids drawn from the vector tier itself
    (every ~n/k-th vec_id) — the E-step's cost does not depend on how
    the centroids were trained, only on k × dim."""
    vecs = spark.read.parquet(vec_path)
    n = vecs.count()
    stride = max(1, n // k)
    return (
        vecs.withColumn("rn", F.row_number().over(Window.orderBy("vec_id")))
        .filter((F.col("rn") % stride == 0) & (F.col("rn") <= stride * k))
        .select(
            (F.col("rn") / stride).cast("int").alias("label"),
            F.col("embedding").cast("array<double>").alias("centroid"),
        )
    )


class RssSampler(threading.Thread):
    """Peak sum of VmRSS over this process tree's python workers + the
    JVM, via /proc. Identifies candidates by cmdline substring."""

    def __init__(self):
        super().__init__(daemon=True)
        self.peak = 0
        self._halt = threading.Event()

    def _sample(self) -> int:
        total = 0
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmd = f.read()
                if b"pyspark.daemon" not in cmd and b"java" not in cmd:
                    continue
                with open(f"/proc/{pid}/status") as f:
                    for line in f:
                        if line.startswith("VmRSS:"):
                            total += int(line.split()[1])  # kB
                            break
            except OSError:
                continue
        return total

    def run(self):
        while not self._halt.is_set():
            self.peak = max(self.peak, self._sample())
            time.sleep(0.05)

    def stop(self) -> int:
        self._halt.set()
        self.join(timeout=2)
        return self.peak


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="1024,4096,8192")
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--ceiling-bytes", type=int, default=256 * 1024)
    args = ap.parse_args()
    ks = [int(x) for x in args.ks.split(",")]

    from eligibility_etl_airflow_spark.operators.similarity import (
        nearest_centroid_assign,
    )

    spark = get_spark("estep-probe")
    vec_path = os.path.join(WORK, f"vecs_{args.reps}")
    if not os.path.exists(vec_path):
        build_vectors(spark, args.reps, vec_path)
    vecs = spark.read.parquet(vec_path)
    n = vecs.count()
    print(json.dumps({"probe": "estep", "n_vectors": n, "dim": 64}), flush=True)

    # warmup: one untimed assignment pass so the timed loop never charges
    # the first shape for python-worker spin-up + cold parquet page cache
    warm = centroid_relation(spark, vec_path, 64)
    nearest_centroid_assign(vecs, warm, "vec_id", "embedding").write.mode(
        "overwrite"
    ).format("noop").save()

    for k in ks:
        cents = centroid_relation(spark, vec_path, k).cache()
        kc = cents.count()  # materialize once so both shapes see a warm relation
        matrix_mb = round(kc * 64 * 8 / 1e6, 2)
        for shape, ceiling in (
            ("in_closure", 1 << 40),
            ("chunked", args.ceiling_bytes),
        ):
            # best-of-2: the first execution at each (k, shape) pays
            # worker/page-cache warmup that is not the shape's cost
            sampler = RssSampler()
            sampler.start()
            dt = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                nearest_centroid_assign(
                    vecs, cents, "vec_id", "embedding", max_closure_bytes=ceiling
                ).write.mode("overwrite").format("noop").save()
                dt = min(dt, time.perf_counter() - t0)
            peak_kb = sampler.stop()
            n_chunks = 1 if shape == "in_closure" else max(
                1, -(-kc * 64 * 8 // max(1, (args.ceiling_bytes // (64 * 8)) * 64 * 8))
            )
            print(
                json.dumps(
                    {
                        "k": kc,
                        "shape": shape,
                        "matrix_mb": matrix_mb,
                        "chunks": n_chunks,
                        "wall_s": round(dt, 2),
                        "peak_rss_gb": round(peak_kb / 1e6, 2),
                    }
                ),
                flush=True,
            )
        # equivalence at this k: the two shapes must assign identically
        flat = nearest_centroid_assign(vecs, cents, "vec_id", "embedding")
        chnk = nearest_centroid_assign(
            vecs, cents, "vec_id", "embedding", max_closure_bytes=args.ceiling_bytes
        )
        digest = lambda d: d.agg(  # noqa: E731
            F.count(F.lit(1)).alias("n"),
            F.sum(F.hash("id", "assigned_label")).alias("h"),
            F.round(F.sum("sim"), 4).alias("s"),
        ).collect()[0]
        a, b = digest(flat), digest(chnk)
        same = tuple(a) == tuple(b)
        print(json.dumps({"k": kc, "equivalent": same, "digest": list(map(str, a))}), flush=True)
        if not same:
            raise SystemExit(f"shape divergence at k={kc}: {tuple(a)} != {tuple(b)}")
        cents.unpersist()


if __name__ == "__main__":
    main()
