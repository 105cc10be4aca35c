"""Structured Streaming operators — the proper replacements for the
reference's cron-emulated streaming (SURVEY.md §2.11).

The reference "streams" by re-running a 4-hour cron with a 30-minute
overlap window (dags/eligibilty_etl.py:55, sql/eligibility_enhanced.sql:74-75)
and removing the overlap duplicates downstream with pandas
``drop_duplicates`` (dags/eligibilty_etl.py:137-147). Here each of those
hacks becomes the real streaming primitive:

- overlap + downstream dedup     → watermark + stateful ``dropDuplicates``
- "yesterday's rejections" cron  → 1-day tumbling window
- 270-min window / 240-min cron  → sliding window(270m, 240m)
- (new capability)               → session windows per user
- checkpoint-file resume loops   → ``foreachBatch`` + checkpointLocation

Every aggregation is declared on the *streaming* DataFrame; the same
builder functions are reused by the batch twins in
``plans/streaming_batch.py`` so the driver's DuckDB oracle certifies the
window semantics, and the streaming tests assert stream == batch on the
same input (exactly-once replay via ``Trigger.AvailableNow``).

Scale note: watermark + dropDuplicates keeps state only for the lateness
horizon (30 min) instead of the reference's unbounded processed-key sets;
windowed aggregations are partial-aggregated map-side before the shuffle
on (window, key) — both hold at 1000-executor scale.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

from eligibility_etl_airflow_spark.catalog import nanos_timestamp_columns


def _as_source_dir(path: str) -> str:
    """The file stream source requires a directory; the testdata ships a
    single parquet file, so stage a stable symlink directory for it.

    The staging dir name is a content-independent *stable* digest of the
    absolute path (not Python's salt-randomized ``hash()``), so a restarted
    process resumes a checkpointed query against the same source dir.
    """
    if os.path.isdir(path):
        return path
    digest = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:16]
    staged = os.path.join(tempfile.gettempdir(), f"stream_src_{digest}")
    os.makedirs(staged, exist_ok=True)
    link = os.path.join(staged, os.path.basename(path))
    target = os.path.abspath(path)
    # lexists, not exists: a dangling symlink from a prior run (source file
    # deleted) must be detected and replaced, not silently re-created over.
    if os.path.lexists(link):
        if os.path.islink(link) and os.readlink(link) == target:
            return staged
        os.unlink(link)
    os.symlink(target, link)
    return staged


def _sample_parquet(path: str) -> str:
    """One representative parquet file under ``path`` (file or directory)
    to sniff the schema from."""
    if not os.path.isdir(path):
        return path
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(root, f)
    raise FileNotFoundError(f"no parquet file under {path}")


def stream_from_dir(spark: SparkSession, path: str, **reader_options) -> DataFrame:
    """A parquet file/directory as a file-source stream with the same
    nanos-column handling as the batch ``Catalog`` (one shared helper, one
    place the testdata format is interpreted): TIMESTAMP(NANOS) columns
    are declared LongType in the stream schema and restored to timestamps
    with the identical ns→us conversion.

    ``reader_options`` pass through to the stream reader (e.g.
    ``maxFilesPerTrigger=1`` for multi-micro-batch replays).
    """
    sample = _sample_parquet(path)
    nanos_cols = set(nanos_timestamp_columns(sample))
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Derive the stream schema from a footer-only batch read (stable public
    # API) instead of pyspark.sql.pandas.types.from_arrow_type, a private
    # module whose signature drifts between pyspark versions. With the
    # nanosAsLong conf set, nanos columns already surface as LongType.
    # TIMESTAMP_NTZ columns (Spark 4 infers NTZ for tz-less parquet) are
    # declared TIMESTAMP instead: watermarks/windows require event-time to
    # be TIMESTAMP, and with the session tz at UTC the values are identical.
    schema = StructType(
        [
            StructField(
                f.name,
                TimestampType()
                if isinstance(f.dataType, TimestampNTZType)
                else f.dataType,
                f.nullable,
            )
            for f in spark.read.parquet(sample).schema.fields
        ]
    )
    for col in nanos_cols:
        assert schema[col].dataType == LongType(), (
            f"nanos column {col} expected LongType, got {schema[col].dataType}"
        )
    reader = spark.readStream.schema(schema).format("parquet")
    for k, v in reader_options.items():
        reader = reader.option(k, v)
    raw = reader.load(_as_source_dir(path))
    for col in nanos_cols:
        raw = raw.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return raw


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table replayed as a file-source stream.

    One parquet file == one micro-batch replay of history; in production
    the same plan binds to a Kafka/file-drop source unchanged.
    """
    return stream_from_dir(spark, os.path.join(sf_dir, "events.parquet"))


# --------------------------------------------------------------------------
# Transformations — shared by streaming and batch twins
# --------------------------------------------------------------------------


def dedup_under_watermark(events: DataFrame, lateness: str = "30 minutes") -> DataFrame:
    """Stateful dedup on event_id, bounded by the ``lateness`` horizon.

    Contract: the streaming side only removes duplicates that arrive within
    ``lateness`` of each other (``dropDuplicatesWithinWatermark`` evicts
    dedup state past the watermark); re-deliveries spaced farther apart than
    ``lateness`` are re-emitted by the stream but removed by the batch twin's
    global ``dropDuplicates``. The stream==batch oracle equivalence is
    therefore valid only for inputs whose duplicates are within-horizon —
    which is the reference's own re-delivery model (a 30-minute cron overlap,
    sql/eligibility_enhanced.sql:74-75).

    Replaces the reference's overlap-window hack. Streaming uses
    ``dropDuplicatesWithinWatermark``: plain ``dropDuplicates`` without the
    event-time column in its keys never evicts state (Spark only expires
    dedup state when the watermark column is part of the subset), so the
    within-watermark variant is what actually bounds state to the lateness
    horizon — vs the unbounded processed-key JSON sets of
    lch_eligibility.py:58-80 that never evict. The batch twin (where the
    operator is unsupported and a global dedup is exact anyway) uses
    ``dropDuplicates``."""
    if events.isStreaming:
        return events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.withWatermark("ts", lateness).dropDuplicates(["event_id"])


def tumbling_daily(events: DataFrame, lateness: str = "30 minutes") -> DataFrame:
    """1-day tumbling window per event_type — the streaming form of the
    resubmission DAG's "yesterday's rejections" daily cron
    (sql/resubmission.sql:7,21)."""
    return (
        events.withWatermark("ts", lateness)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_270_240(events: DataFrame, lateness: str = "30 minutes") -> DataFrame:
    """Sliding window(270 min, slide 240 min) — the exact extraction
    geometry of sql/eligibility_enhanced.sql:74-75 (4-h cron reading the
    last 4.5 h), expressed as a real sliding window so rows land in the
    overlap deterministically instead of duplicating."""
    return (
        events.withWatermark("ts", lateness)
        .groupBy(F.window("ts", "270 minutes", "240 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", lateness: str = "30 minutes"
) -> DataFrame:
    """Per-user session windows (gap-based) — a capability the reference
    lacks entirely; sessions close when a user is idle for ``gap``."""
    return (
        events.withWatermark("ts", lateness)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def interval_join_error_clicks(
    errors: DataFrame,
    clicks: DataFrame,
    tolerance_s: int = 120,
    lateness: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join: for every error event, the click events
    by the SAME user within ±``tolerance_s``.

    Both sides carry watermarks and the join predicate includes an
    explicit event-time range — the two conditions Spark needs to bound
    join state: buffered rows on each side are evicted once the other
    side's watermark passes the end of their possible match range
    (without the range predicate, stream-stream join state grows
    forever). Works identically under batch execution (withWatermark is
    a no-op), which is what the oracle certifies.
    """
    e = errors.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        F.col("user_id"),
        F.col("ts").alias("e_ts"),
    )
    c = clicks.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    if errors.isStreaming:
        e = e.withWatermark("e_ts", lateness)
        c = c.withWatermark("c_ts", lateness)
    tol = f"INTERVAL {tolerance_s} SECONDS"
    joined = e.join(
        c,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") >= F.expr(f"e_ts - {tol}"))
        & (F.col("c_ts") <= F.expr(f"e_ts + {tol}")),
        "inner",
    )
    return joined.select("error_id", "user_id", "e_ts", "c_ts", "c_value")


# --------------------------------------------------------------------------
# Sinks / execution helpers
# --------------------------------------------------------------------------


def static_enrich(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static broadcast enrichment — the micro-batch analog of the
    reference's per-batch dimension lookups. The static side is marked
    ``broadcast``: Structured Streaming re-plans it per micro-batch (a
    changed dimension table is picked up on the next trigger) and the
    join never shuffles the stream. Works identically under batch
    execution, which is what the registered oracle query certifies;
    stream == batch is asserted in tests/test_streaming.py."""
    if dim_key != on and on in dim.columns:
        raise ValueError(
            f"dimension already has a column named {on!r} alongside its key "
            f"{dim_key!r}; renaming the key would create two {on!r} columns "
            "and an ambiguous join — drop or rename the conflicting column "
            "first"
        )
    d = dim.withColumnRenamed(dim_key, on) if dim_key != on else dim
    from pyspark.sql import functions as F

    return events.join(F.broadcast(d), on, how)


def run_available_now(stream_df: DataFrame, name: str, output_mode: str = "append") -> DataFrame:
    """Drain the stream with Trigger.AvailableNow into a memory sink and
    return the materialized result (test/driver helper: bounded replay of
    all available input, then stop — the batch-equivalence harness)."""
    spark = stream_df.sparkSession
    with tempfile.TemporaryDirectory(prefix=f"ckpt_{name}_") as ckpt:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def foreach_batch_parquet_sink(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    dedup_keys: list[str] | None = None,
) -> None:
    """Checkpointed ``foreachBatch`` parquet sink with idempotent restart.

    Replaces the reference's manual checkpoint files + anti-join resume
    (§2.10 G9): each micro-batch writes to a batchId-named subdirectory,
    so a replayed batch (restart after failure between write and commit)
    overwrites its own output instead of appending duplicates.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = os.path.join(out_dir, f"batch_id={batch_id}")
        if dedup_keys:
            batch_df = batch_df.dropDuplicates(dedup_keys)
        batch_df.write.mode("overwrite").parquet(out)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def kafka_options(
    bootstrap_servers: str,
    topics: str | list[str],
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
) -> dict[str, str]:
    """Option map for the Kafka structured-streaming source, as a pure
    testable builder (same treatment as ``sources.readers.jdbc_options``;
    this environment ships no Kafka connector jar, so only the plumbing
    is exercised here). Every streaming plan in this module binds to
    ``spark.readStream.format("kafka").options(**kafka_options(...))``
    unchanged — the file-drop source used by the tests and the Kafka
    source expose the same micro-batch DataFrame surface.

    ``max_offsets_per_trigger`` is the backpressure lever (bounds each
    micro-batch; without it one huge backlog batch can blow executor
    memory on restart — the 100 TB footgun)."""
    if isinstance(topics, list):
        topics = ",".join(topics)
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_connector_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka connector jar is on the session's
    classpath. The engine gates real Kafka consumption on this (same
    import-gate discipline as the Excel shim) instead of failing deep
    inside stream start."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def stream_from_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str | list[str],
    value_schema: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
) -> DataFrame:
    """Kafka topic → typed micro-batch DataFrame, the streaming source
    the reference's cron-plus-overlap extractions map onto at scale.

    The raw Kafka surface is (key, value: binary, topic, partition,
    offset, timestamp); the payload is decoded as JSON into
    ``value_schema`` and flattened alongside the event timestamp, so
    every downstream operator in this module (watermark dedup, tumbling/
    sliding/session windows, stateful running aggregates, foreachBatch
    sinks) composes unchanged — they see the same shape the file-drop
    source produces.

    Gated: raises RuntimeError with setup instructions when the
    connector jar is absent (this environment ships none, so tests
    assert the gate and the plan shape only; against a real broker the
    same call is production-ready). Parallelism note: one Kafka
    partition maps to one Spark task — topic partition count, not
    executor count, bounds source parallelism; ``maxOffsetsPerTrigger``
    bounds each micro-batch for restart safety."""
    if not kafka_connector_available(spark):
        raise RuntimeError(
            "spark-sql-kafka connector not on the classpath; launch with "
            "--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> "
            "to consume Kafka"
        )
    raw = (
        spark.readStream.format("kafka")
        .options(
            **kafka_options(
                bootstrap_servers,
                topics,
                starting_offsets=starting_offsets,
                max_offsets_per_trigger=max_offsets_per_trigger,
                fail_on_data_loss=fail_on_data_loss,
            )
        )
        .load()
    )
    parsed = raw.select(
        F.col("timestamp").alias("kafka_ts"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
    )
    return parsed.select("kafka_ts", "v.*")


def stream_incremental_curation(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    **curation_kwargs,
) -> list[dict]:
    """Run the incremental-curation shape (``run_incremental_curation``,
    pipelines.py) under a REAL checkpointed stream: each micro-batch is
    curated against the persisted corpus index inside ``foreachBatch``,
    so new documents flow continuously through exact-vs-state,
    fuzzy-vs-state, and within-batch dedup as they arrive.

    Restart safety is layered, which is the point of the composition:
    the stream checkpoint gives at-least-once micro-batch replay, and
    the curation's index appends are doc_id-keyed ``append_dedup``
    upserts — so a batch replayed after a crash between the index write
    and the checkpoint commit is a verified NO-OP (the G9 discipline
    end-to-end over the corpus index, not just over a parquet sink).
    Returns the per-batch funnel stats in processing order.

    ``Trigger.AvailableNow`` drains the backlog then stops — the
    bounded-replay harness shape; a production deployment swaps the
    trigger for a processing-time one and keeps everything else."""
    stats: list[dict] = []

    def curate_batch(batch_df: DataFrame, batch_id: int) -> None:
        from eligibility_etl_airflow_spark import pipelines

        s = pipelines.run_incremental_curation(
            batch_df.sparkSession, batch_df, state_dir, **curation_kwargs
        )
        stats.append({"batch_id": batch_id, **s})

    q = (
        stream_df.writeStream.foreachBatch(curate_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats


def stream_crawl_ingest(
    stream_df: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    **ingest_kwargs,
) -> list[dict]:
    """Continuous crawl ingestion: each micro-batch of raw (doc_id, url,
    html) records runs ``run_incremental_crawl_ingest`` (pipelines.py)
    inside ``foreachBatch`` — canonical-URL and content-hash vs-state
    dedup against the persisted crawl indexes, preprocessing, idempotent
    appends. Same layered restart-safety as stream_incremental_curation:
    the stream checkpoint replays at-least-once, and the ingest's
    appends are key-upserts, so a replayed batch is a verified no-op.
    Returns per-batch funnel stats in processing order.
    ``Trigger.AvailableNow`` drains the backlog then stops (bounded
    harness shape; swap the trigger for production)."""
    stats: list[dict] = []

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        from eligibility_etl_airflow_spark import pipelines

        s = pipelines.run_incremental_crawl_ingest(
            batch_df.sparkSession, batch_df, state_dir, **ingest_kwargs
        )
        stats.append({"batch_id": batch_id, **s})

    q = (
        stream_df.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats


def stream_crawl_frontier(
    stream_df: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    **frontier_kwargs,
) -> list[dict]:
    """Continuous frontier scheduling: each micro-batch of fetched
    (doc_id, url, html) pages runs ``run_incremental_frontier``
    (pipelines.py) inside ``foreachBatch`` — the batch's domain-grain
    link edges merge idempotently into the persisted edge state,
    PageRank warm-starts from the previous cycle's persisted ranks, and
    ``out_dir/frontier.parquet`` is rewritten with the next fetch list.
    Restart-safety is the same layering as stream_crawl_ingest: the
    stream checkpoint replays at-least-once, edge appends are
    (src, dst)-keyed upserts (a replayed batch adds nothing), the ranks
    persist is a staged whole-relation swap, and the frontier output is
    an overwrite — so a replay converges to the same ranks and rewrites
    the same schedule. Share ``state_dir`` with stream_crawl_ingest and
    the crawl-history anti-join reads the ingest url index
    automatically. Per-batch stats (n_candidates, n_scheduled,
    warm_start, ...) return in processing order; pass
    ``edge_stats=True`` for a per-cycle ``n_state_edges`` count (an
    extra full-relation action that serves only telemetry)."""
    stats: list[dict] = []

    def frontier_batch(batch_df: DataFrame, batch_id: int) -> None:
        from eligibility_etl_airflow_spark import pipelines

        s = pipelines.run_incremental_frontier(
            batch_df.sparkSession, batch_df, state_dir, out_dir,
            **frontier_kwargs,
        )
        stats.append({"batch_id": batch_id, **s})

    q = (
        stream_df.writeStream.foreachBatch(frontier_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats
