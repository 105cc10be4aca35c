"""Streaming throughput soak (r8 verdict item #5): sustained-throughput
numbers for the stateful foreachBatch tier, which until round 9 had
crash-CORRECTNESS evidence (the closed-loop soak in tests/
test_pipelines.py) but no rows/s or latency-trend measurements.

Drives ``stream_crawl_ingest`` and ``stream_incremental_curation``
(streaming/ops.py) through >= ``--batches`` real micro-batches
(file-source stream, maxFilesPerTrigger=1, AvailableNow) and records:

  * per-batch wall seconds and rows/s (JSON line per batch);
  * the latency TREND — mean of the last 3 batches vs the first 3:
    a flat trend means per-batch cost does not creep with state size
    (the state-shuffle-free join shapes + clustered compaction);
  * recovery from a mid-stream kill: a crash is injected INSIDE
    foreachBatch (after the state writes, before the checkpoint
    commit — the worst window) at ``--kill-at``; the restarted query
    replays that batch, and the soak measures the recovery wall time
    and asserts the replay re-accepted NOTHING (the idempotent-append
    contract) while every later batch accepted normally.

Usage: python tools/stream_soak.py [--batches 12] [--rows 2000]
       [--kill-at 6] [--pipeline ingest|curation|both]
Prints one JSON line per batch plus a summary line per pipeline;
paste the summary into SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.session import get_spark

WORK = "/tmp/stream_soak"


def build_batches(spark, kind: str, n_batches: int, rows: int) -> str:
    """One parquet file per micro-batch. ~20% of each batch's content
    duplicates the PREVIOUS batch under new ids (the vs-state dedup has
    real work every batch), the rest is fresh synthetic text."""
    src = os.path.join(WORK, f"src_{kind}")
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src, exist_ok=True)
    for b in range(n_batches):
        base = spark.range(rows).select(
            (F.col("id") + b * 1_000_000).alias("doc_id"),
            F.concat(
                F.lit(f"batch {b} document "),
                F.col("id").cast("string"),
                F.lit(" "),
                # ~120 pseudo-words per doc, content keyed by (batch, id)
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(120)),
                        lambda i: F.substring(
                            F.md5(
                                F.concat_ws(
                                    "|",
                                    # 20% of rows (id mod 5 == 0) reuse
                                    # content that REALLY existed in the
                                    # previous batch: its row id+1, which
                                    # was fresh there (id+1 mod 5 == 1)
                                    F.when(
                                        (F.col("id") % 5 == 0) & (F.lit(b) > 0),
                                        F.lit(b - 1),
                                    )
                                    .otherwise(F.lit(b))
                                    .cast("string"),
                                    F.when(
                                        (F.col("id") % 5 == 0) & (F.lit(b) > 0),
                                        F.col("id") + 1,
                                    )
                                    .otherwise(F.col("id"))
                                    .cast("string"),
                                    i.cast("string"),
                                )
                            ),
                            1,
                            6,
                        ),
                    ),
                ),
            ).alias("text"),
        )
        if kind == "ingest":
            out = base.select(
                "doc_id",
                F.concat(
                    F.lit("https://site-"),
                    (F.col("doc_id") % 50).cast("string"),
                    F.lit(".example.com/page/"),
                    F.col("doc_id").cast("string"),
                ).alias("url"),
                F.concat(
                    F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")
                ).alias("html"),
            )
        else:
            out = base
        out.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, f"b{b:03d}")
        )
        # file source streams FILES; move the part file up so each batch
        # is exactly one file in the source dir
        bdir = os.path.join(src, f"b{b:03d}")
        part = next(f for f in os.listdir(bdir) if f.endswith(".parquet"))
        os.rename(os.path.join(bdir, part), os.path.join(src, f"batch_{b:03d}.parquet"))
        shutil.rmtree(bdir)
    return src


class _InjectedCrash(Exception):
    pass


def soak(spark, kind: str, n_batches: int, rows: int, kill_at: int | None) -> dict:
    from eligibility_etl_airflow_spark import pipelines

    src = build_batches(spark, kind, n_batches, rows)
    state = os.path.join(WORK, f"state_{kind}")
    ckpt = os.path.join(WORK, f"ckpt_{kind}")
    shutil.rmtree(state, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    os.makedirs(state, exist_ok=True)

    lines: list[dict] = []
    crashed = {"done": False}

    def handle(batch_df, batch_id):
        t0 = time.perf_counter()
        if kind == "ingest":
            s = pipelines.run_incremental_crawl_ingest(
                batch_df.sparkSession, batch_df, state
            )
        else:
            s = pipelines.run_incremental_curation(
                batch_df.sparkSession, batch_df, state
            )
        dt = time.perf_counter() - t0
        line = {
            "pipeline": kind,
            "batch_id": int(batch_id),
            "sec": round(dt, 2),
            "rows": s["n_batch"],
            "rows_per_s": round(s["n_batch"] / dt, 1),
            "n_accepted": s["n_accepted"],
        }
        lines.append(line)
        print(json.dumps(line), flush=True)
        if kill_at is not None and not crashed["done"] and len(lines) == kill_at:
            # crash in the WORST window: state writes landed, checkpoint
            # commit has not — the restart must replay this batch as a
            # verified no-op
            crashed["done"] = True
            raise _InjectedCrash(f"injected kill after batch {batch_id}")

    def run_stream():
        q = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t_start = time.perf_counter()
    recovery_sec = None
    replay_accepted = None
    try:
        run_stream()
    except Exception as e:  # noqa: BLE001 - the injected crash surfaces as StreamingQueryException
        if "injected kill" not in str(e):
            raise
        t_kill = time.perf_counter()
        n_before = len(lines)
        run_stream()  # restart: replays the killed batch, then drains
        # recovery = wall time from kill to the replayed batch's completion
        recovery_sec = round(lines[n_before]["sec"], 2)
        replay_accepted = lines[n_before]["n_accepted"]
        print(
            json.dumps(
                {
                    "pipeline": kind,
                    "event": "recovered",
                    "recovery_first_batch_sec": recovery_sec,
                    "restart_to_drain_sec": round(time.perf_counter() - t_kill, 2),
                    "replay_accepted": replay_accepted,
                }
            ),
            flush=True,
        )
    total = time.perf_counter() - t_start

    secs = [ln["sec"] for ln in lines]
    head = sum(secs[:3]) / max(len(secs[:3]), 1)
    tail = sum(secs[-3:]) / max(len(secs[-3:]), 1)
    summary = {
        "pipeline": kind,
        "batches": len(lines),
        "rows_per_batch": rows,
        "total_sec": round(total, 2),
        "rows_per_s_overall": round(rows * n_batches / total, 1),
        "first3_mean_sec": round(head, 2),
        "last3_mean_sec": round(tail, 2),
        "latency_trend": round(tail / head, 2) if head else None,
        "recovery_first_batch_sec": recovery_sec,
        "replay_accepted": replay_accepted,
    }
    if kill_at is not None:
        assert replay_accepted == 0, (
            "replayed batch re-accepted rows — idempotent-append contract broken: "
            f"{replay_accepted}"
        )
    print(json.dumps(summary), flush=True)
    return summary


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--rows", type=int, default=2000)
    ap.add_argument("--kill-at", type=int, default=6)
    ap.add_argument(
        "--pipeline", choices=["ingest", "curation", "both"], default="both"
    )
    opts = ap.parse_args()
    spark = get_spark("stream-soak")
    spark.sparkContext.setLogLevel("ERROR")
    kinds = ["ingest", "curation"] if opts.pipeline == "both" else [opts.pipeline]
    for kind in kinds:
        soak(spark, kind, opts.batches, opts.rows, opts.kill_at)
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
