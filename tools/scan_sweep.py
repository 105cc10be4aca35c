"""Sweep every registered query's executed plan for repeated scans of
one table — the single-consumption audit that found the round-8 fixes
(contrastive one-pass, bm25/tfidf window-dfreq, the vocab-model and
top-k persists): an expensive lineage consumed by 2+ branches re-executes
wherever exchange reuse does not cover the differing subtrees, and the
DataFrame code reads as if the intermediate were materialized.

Caveat on reading the output: scan counts come from the PLAN TEXT, and a
persisted subtree prints its full lineage under InMemoryRelation while
executing it once (to fill the cache). So a flagged query with
inmem > 0 is usually fine — its true scan count is roughly
(scans under no cache) + (one fill per cached relation). A flagged query
with inmem == 0 re-executes every printed scan; those are the ones to
inspect. Legitimate inmem == 0 multi-scanners exist too: set operations
and funnels scan per branch BY SEMANTICS, and recomputing a corpus-sized
intermediate is often cheaper than materializing it (the token-stream
trade in operators/lm.py) — the sweep locates candidates, the plan
decides.

Usage: python tools/scan_sweep.py [--sf DIR] [--min-scans N]
Prints one line per flagged query.
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eligibility_etl_airflow_spark.session import get_spark
from eligibility_etl_airflow_spark import registry


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    min_scans = 3
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--sf":
            sf = args[i + 1]
        if a == "--min-scans":
            min_scans = int(args[i + 1])

    registry.load_all()
    spark = get_spark(app_name="scan_sweep")
    flagged = 0
    for name, fn in registry.QUERIES.items():
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # a broken query is a finding too
            print(f"{name}: ERROR {str(exc)[:80]}")
            flagged += 1
            continue
        tables = Counter(re.findall(r"file:[^\s,\]]*/(\w+)\.parquet", plan))
        multi = {t: n for t, n in tables.items() if n >= min_scans}
        if multi:
            inmem = plan.count("InMemoryRelation")
            print(f"{name}: scans={multi} inmem={inmem}")
            flagged += 1
        spark.catalog.clearCache()
    print(f"flagged {flagged} of {len(registry.QUERIES)} queries")


if __name__ == "__main__":
    main()
