"""Stage-level profile of one or more registered queries (guide §7.1).

Runs each named query once (noop sink) in a session with the UI enabled,
then reads the local REST API to print per-stage wall/task time, shuffle
bytes, and Python-boundary presence — the empirical loop the guide's §1.1
describes, minus a browser.

Usage: python tools/opt_stageprof.py q1 [q2 ...] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eligibility_etl_airflow_spark import registry
from eligibility_etl_airflow_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def rest(base: str, path: str):
    with urllib.request.urlopen(base + path) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=1)
    args = ap.parse_args()

    registry.load_all()
    spark = get_spark("stageprof", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    warm = registry.QUERIES["eligibility_flagship"]
    warm(spark, SF_DIR).write.mode("overwrite").format("noop").save()

    for name in args.queries:
        fn = registry.QUERIES[name]
        for rep in range(args.reps):
            spark.catalog.clearCache()
            jobs_before = {j["jobId"] for j in rest(base, "/jobs")}
            spark.sparkContext.setJobDescription(f"prof:{name}:{rep}")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            print(
                f"\n=== {name} rep{rep}: build {t1-t0:.2f}s exec {t2-t1:.2f}s"
            )
            jobs = [
                j for j in rest(base, "/jobs") if j["jobId"] not in jobs_before
            ]
            stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
            print(f"{len(jobs)} jobs, {len(stage_ids)} stages")
            infos = []
            for sid in stage_ids:
                try:
                    sl = rest(base, f"/stages/{sid}")
                except Exception:
                    continue
                for s in sl:
                    if s["status"] == "COMPLETE":
                        dur = (
                            time.mktime(
                                time.strptime(
                                    s["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"
                                )
                            )
                            - time.mktime(
                                time.strptime(
                                    s["firstTaskLaunchedTime"][:19],
                                    "%Y-%m-%dT%H:%M:%S",
                                )
                            )
                        )
                        infos.append(
                            (
                                s.get("executorRunTime", 0),
                                sid,
                                s["numCompleteTasks"],
                                s.get("shuffleWriteBytes", 0),
                                s.get("shuffleReadBytes", 0),
                                dur,
                                s["name"].split("\n")[0][:70],
                            )
                        )
            infos.sort(reverse=True)
            print(
                f"{'taskTime_ms':>11} {'stage':>5} {'tasks':>5} "
                f"{'shufW':>9} {'shufR':>9}  name"
            )
            for rt, sid, nt, sw, sr, dur, nm in infos[:14]:
                print(f"{rt:11d} {sid:5d} {nt:5d} {sw:9d} {sr:9d}  {nm}")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
