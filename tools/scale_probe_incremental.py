"""Round-8 scale probe: the INCREMENTAL curation loop at 1x / 5x / 20x
batch sizes — the operational tier the query-family probes (r7 dedup/
graph, r8 retrieval/ANN) did not cover. The crash/soak tests prove the
state protocol is CORRECT; this probe measures whether its per-cycle
cost stays proportional to the BATCH (not the accumulated state) as
both grow, which is the property that makes the design viable at
100 TB: a loop whose cycle cost tracks state size re-reads the corpus
and dies at scale.

Per scale k the probe runs four cycles against one state directory:

  1. cold start     — k x 5k fresh docs; builds all five indexes
  2. all fresh      — same size, disjoint content (per-cycle suffix)
  3. mixed          — 30% exact re-ingest of cycle-2 content under NEW
                      doc ids (must be caught by the hash index, not
                      accepted) + 70% fresh
  4. replay         — cycle 3's batch verbatim (idempotency: zero new
                      acceptances, zero index growth)

drift_report=True so the token-index fold (the heaviest per-cycle
state maintenance) is inside the measurement. Recorded per cycle:
wall, accepted counts, per-index parquet file counts, compactions.

Usage: python tools/scale_probe_incremental.py [--scales 1,5,20]
Prints one JSON line per (scale, cycle); paste the summary into
SCALING.md. Quiet box, local[32].
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.session import get_spark
from eligibility_etl_airflow_spark import pipelines

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/scale_probe_incremental"

INDEXES = (
    "accepted_docs",
    "index_hashes",
    "index_bands",
    "index_shingles",
    "index_tokens",
)


def file_counts(state_dir: str) -> dict[str, int]:
    return {
        name: len(glob.glob(os.path.join(state_dir, name, "*.parquet")))
        for name in INDEXES
        if os.path.exists(os.path.join(state_dir, name))
    }


def build_batch(spark, k: int, cycle_tag: str, id_base: int, reingest_of=None):
    """k x 5k docs with content fully distinct per (doc, replica, cycle).

    Distinctness must hold at the SHINGLE level, not just the hash: a
    suffix-perturbed real document keeps ~95% of its 5-gram shingles, so
    every replica/cycle would be dropped by the fuzzy-vs-state tier as a
    near-dup and the state would never grow with k. Each doc is instead
    40 md5-derived 8-char tokens seeded by (doc_id, cycle, replica) —
    ~same length as the real corpus rows (~300 chars), zero shared
    shingles across docs, replicas, or cycles.

    ``reingest_of`` mixes in 30% of another batch's TEXT under fresh
    doc ids — the re-ingested-duplicate shape the hash index must catch.
    """
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    parts = []
    for r in range(k):
        seed = F.concat(
            F.col("doc_id").cast("string"), F.lit(f"|{cycle_tag}|r{r}|")
        )
        synth = F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.substring(
                    F.md5(F.concat(seed, i.cast("string"))), 1, 8
                ),
            ),
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(id_base + r * 10_000_000)).alias("doc_id"),
                synth.alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if reingest_of is not None:
        fresh = out.filter(F.col("doc_id") % 10 >= 3)
        dup = (
            reingest_of.filter(F.col("doc_id") % 10 < 3)
            # new identity, identical content — the hash-index case
            .select(
                (F.col("doc_id") + F.lit(10_000_000_000)).alias("doc_id"), "text"
            )
        )
        out = fresh.unionByName(dup)
    return out


def main() -> None:
    # argparse (ADVICE r8): the old positional scan read sys.argv[i+1]
    # unchecked — `--scales` with no value died with IndexError after
    # the Spark session was already up
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--scales",
        default="1,5,20",
        help="comma-separated replica multipliers (default 1,5,20)",
    )
    opts = ap.parse_args()
    scales = [int(x) for x in opts.scales.split(",")]

    spark = get_spark(app_name="scale_probe_incremental")
    summary = []
    for k in scales:
        state_dir = os.path.join(WORK, f"state_{k}x")
        shutil.rmtree(state_dir, ignore_errors=True)
        os.makedirs(state_dir, exist_ok=True)

        # cycle id bases must clear the replica span (k x 10M) at EVERY
        # scale: at 20x a 100M base collided with the cold batch's
        # replicas 10-19, and the engine correctly treated the id-reused
        # rows as replays (doc_id is the identity key), which read as a
        # false idempotency failure in the probe's stats
        batches = {
            "cold": build_batch(spark, k, "c1", 0),
            "fresh": build_batch(spark, k, "c2", 1_000_000_000),
        }
        batches["mixed"] = build_batch(
            spark, k, "c3", 2_000_000_000, reingest_of=batches["fresh"]
        )
        batches["replay"] = batches["mixed"]

        for cycle, batch in batches.items():
            batch = batch.persist()
            batch.count()  # isolate batch construction from the loop cost
            t0 = time.perf_counter()
            stats = pipelines.run_incremental_curation(
                spark, batch, state_dir, drift_report=True
            )
            dt = time.perf_counter() - t0
            batch.unpersist()
            line = {
                "scale": k,
                "cycle": cycle,
                "sec": round(dt, 2),
                "n_batch": stats["n_batch"],
                "n_accepted": stats["n_accepted"],
                # docs the hash index rejected (re-ingested content
                # under new ids): internal-dedup survivors minus the
                # anti-join-vs-state survivors
                "dropped_exact_vs_state": (
                    stats["n_after_internal_exact"]
                    - stats["n_after_exact_vs_state"]
                ),
                "compacted": stats.get("compacted_indexes"),
                "files": file_counts(state_dir),
            }
            print(json.dumps(line), flush=True)
            summary.append(line)

        # invariants asserted PER SCALE, right after its replay cycle
        # (ADVICE r8: a failure at 1x must not wait for 20x to finish):
        # replay accepted zero; mixed caught its re-ingests
        by = {s["cycle"]: s for s in summary if s["scale"] == k}
        assert by["replay"]["n_accepted"] == 0, by["replay"]
        assert by["mixed"]["dropped_exact_vs_state"] > 0, by["mixed"]
    print(json.dumps({"ok": True, "scales": scales}))


if __name__ == "__main__":
    main()
