"""Input-parallelism staging for CPU-heavy Python (Arrow) stages.

A small single-file parquet input scans as ONE partition, so any
mapInPandas / pandas_udf stage fed directly by it runs as a single
single-threaded Python task — the other cores idle and one scheduler
stall blocks the whole stage (the round-8 ``dedup_simhash`` watch item:
43.8 s cold on the 1-partition plan vs 2.3 s at 32 on the same data).
``ensure_parallelism`` spreads such inputs before the Python stage and
is a no-op passthrough wherever the scan already provides enough
partitions — which at 100 TB is everywhere, so the repartition never
appears in a production-scale plan.

Home of the helper formerly private to operators/neardup.py; neardup
re-exports it as ``_ensure_parallelism`` for its original call sites.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def parse_byte_size(raw: str) -> int:
    """Spark byte-size conf strings: bare bytes ('134217728') or a unit
    suffix ('512m', '1g', '128MB') — mis-parsing must not silently fall
    back to a default, or the partition estimate diverges 4× from the
    scan's real behavior on clusters that tune this conf."""
    s = raw.strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if s.endswith("b"):
        s = s[:-1]
    mult = 1
    if s and s[-1] in units:
        mult = units[s[-1]]
        s = s[:-1]
    return int(s) * mult


def jvm_local_row(spark, row, schema) -> DataFrame:
    """One-row DataFrame from an already-collected Row, built JVM-ONLY.

    ``spark.createDataFrame([row], schema)`` routes through
    ``sc.parallelize`` — a PYTHON-RDD-backed relation that fans out to
    ``defaultParallelism`` partitions, each of which spawns a Python
    worker just to unpickle (mostly nothing): 32 pointless Python tasks
    (~46 s of task time measured on corpus_pair_drift's one-row result
    pre-r10). ``range(1).select(lit(...).cast(...))`` produces the same
    row as a pure JVM local relation — one task, no Python anywhere."""
    from pyspark.sql import functions as F

    return spark.range(1).select(
        *(
            F.lit(row[f.name]).cast(f.dataType).alias(f.name)
            for f in schema.fields
        )
    )


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Spread a narrow input (e.g. one small parquet file) across the
    cluster before CPU-heavy per-row work; inputs that already have
    enough partitions pass through untouched (no shuffle at 100 TB,
    where the scan itself provides thousands of partitions).

    The partition estimate comes from the input files' total size vs
    ``spark.sql.files.maxPartitionBytes`` (``inputFiles`` is an
    analysis-only call) — NOT ``df.rdd.getNumPartitions()``, which
    builds the physical RDD DAG on every invocation. Non-file inputs
    (in-memory test relations) estimate 0 and get repartitioned, which
    is correct for them too."""
    import urllib.parse
    import urllib.request

    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    max_bytes = parse_byte_size(raw)
    files = df.inputFiles()
    total = 0
    for uri in files:
        p = urllib.request.url2pathname(urllib.parse.urlparse(uri).path)
        try:
            total += os.path.getsize(p)
        except OSError:
            return df  # non-local storage: trust the scan's own splitting
    est = max(len(files), -(-total // max_bytes) if total else 0)
    if est < target:
        return df.repartition(target)
    return df
