"""Structured Streaming tests: the real readStream plans must produce the
same results as their oracle-certified batch twins, dedup must survive
re-delivery across micro-batches, and the foreachBatch sink must be
idempotent under restart."""

from __future__ import annotations

import os
import shutil

import pytest

from eligibility_etl_airflow_spark.catalog import Catalog
from eligibility_etl_airflow_spark.streaming import ops


def _rows(df, cols):
    return sorted(tuple(str(v) for v in r) for r in df.select(*cols).collect())


def test_stream_tumbling_equals_batch(spark, sf_dir):
    stream = ops.tumbling_daily(ops.events_stream(spark, sf_dir))
    got = ops.run_available_now(stream, "t_tumbling", output_mode="complete")
    want = ops.tumbling_daily(Catalog(spark, sf_dir).events)
    cols = ["window_start", "window_end", "event_type", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_sliding_equals_batch(spark, sf_dir):
    stream = ops.sliding_270_240(ops.events_stream(spark, sf_dir))
    got = ops.run_available_now(stream, "t_sliding", output_mode="complete")
    want = ops.sliding_270_240(Catalog(spark, sf_dir).events)
    cols = ["window_start", "window_end", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_session_equals_batch(spark, sf_dir):
    stream = ops.session_windows(ops.events_stream(spark, sf_dir))
    got = ops.run_available_now(stream, "t_session", output_mode="complete")
    want = ops.session_windows(Catalog(spark, sf_dir).events)
    cols = ["session_start", "session_end", "user_id", "n_events", "session_value"]
    assert _rows(got, cols) == _rows(want, cols)


@pytest.fixture
def redelivery_dir(tmp_path, sf_dir):
    """Two copies of the events file in one source dir — the same rows
    delivered twice, as the reference's overlap window re-extracts them."""
    d = tmp_path / "events_redelivered"
    d.mkdir()
    src = os.path.join(sf_dir, "events.parquet")
    shutil.copy(src, d / "part-0.parquet")
    shutil.copy(src, d / "part-1.parquet")
    return str(tmp_path)


def test_stream_dedup_survives_redelivery(spark, sf_dir, redelivery_dir):
    events = ops.stream_from_dir(
        spark, os.path.join(redelivery_dir, "events_redelivered")
    )
    got = ops.run_available_now(ops.dedup_under_watermark(events), "t_dedup")
    n_distinct = Catalog(spark, sf_dir).events.select("event_id").distinct().count()
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct


def test_foreach_batch_sink_idempotent_restart(spark, sf_dir, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = ops.events_stream(spark, sf_dir)
    ops.foreach_batch_parquet_sink(stream, out, ckpt, dedup_keys=["event_id"])
    first = spark.read.parquet(out).count()
    assert first == Catalog(spark, sf_dir).events.count()
    # restart with the same checkpoint: no new input → no duplicate output
    stream2 = ops.events_stream(spark, sf_dir)
    ops.foreach_batch_parquet_sink(stream2, out, ckpt, dedup_keys=["event_id"])
    assert spark.read.parquet(out).count() == first


def test_watermark_drops_late_rows_in_windowed_agg(spark, tmp_path):
    """Append-mode windowed aggregation: rows arriving after the
    watermark has passed their window are dropped, emitted windows are
    final. The reference has no late-data story at all (README
    acknowledges gaps); this pins the engine's."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import time as _time

    src = tmp_path / "late_src"
    src.mkdir()

    def write_file(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[ns]")
        table = pa.Table.from_pandas(pdf, preserve_index=False)
        pq.write_table(table, src / name)

    # batch 1: two on-time events on day 1 and day 3 (watermark → day3 - 30min)
    write_file("a.parquet", [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-03 10:00:00", 1, "click", 1.0, "{}"),
    ])
    events = ops.stream_from_dir(spark, str(src), maxFilesPerTrigger=1)
    agg = ops.tumbling_daily(events, lateness="30 minutes")

    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "late_out")
    q = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    _time.sleep(0.2)
    # batch 2: a LATE event for day 1 (already far behind the watermark)
    # plus an on-time day-3 event
    write_file("b.parquet", [
        (3, "2024-01-01 11:00:00", 2, "click", 5.0, "{}"),
        (4, "2024-01-03 11:00:00", 2, "click", 1.0, "{}"),
    ])
    q2 = (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    out = spark.read.parquet(out_dir).toPandas()
    day1 = out[out.window_start.astype(str).str.startswith("2024-01-01")]
    # day-1 window was finalized by the watermark before the late row:
    # it must contain ONLY the on-time event (n=1), the late row dropped
    assert not day1.empty
    assert int(day1.n_events.sum()) == 1


def test_kafka_options_plumbing():
    from eligibility_etl_airflow_spark.streaming.ops import kafka_options

    opts = kafka_options(
        "broker1:9092,broker2:9092",
        ["events", "events_dlq"],
        starting_offsets="earliest",
        max_offsets_per_trigger=100_000,
    )
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "events,events_dlq",
        "startingOffsets": "earliest",
        "failOnDataLoss": "true",
        "maxOffsetsPerTrigger": "100000",
    }


def test_stream_from_kafka_gates_without_connector(spark):
    """No Kafka jar in this environment: the gate must raise with setup
    instructions BEFORE any stream is constructed, and the availability
    probe must report False (Excel-shim discipline)."""
    if ops.kafka_connector_available(spark):  # pragma: no cover - jar present
        pytest.skip("kafka connector on classpath; gate inactive")
    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        ops.stream_from_kafka(
            spark, "broker:9092", "events", "event_id long, value double"
        )


def test_stream_stream_interval_join_equals_batch(spark, sf_dir):
    """A REAL two-stream watermarked join (append mode) must reproduce
    the batch join exactly on a bounded replay."""
    s1 = ops.events_stream(spark, sf_dir)
    s2 = ops.events_stream(spark, sf_dir)
    stream = ops.interval_join_error_clicks(s1, s2, tolerance_s=1800)
    assert stream.isStreaming
    got = ops.run_available_now(stream, "t_ssjoin", output_mode="append")
    want = ops.interval_join_error_clicks(
        Catalog(spark, sf_dir).events, Catalog(spark, sf_dir).events, tolerance_s=1800
    )
    cols = ["error_id", "user_id", "e_ts", "c_ts", "c_value"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() > 0


def test_stream_static_enrich_equals_batch(spark, sf_dir):
    dim = Catalog(spark, sf_dir).customer.select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    stream = ops.static_enrich(
        ops.events_stream(spark, sf_dir), dim, on="user_id", dim_key="c_custkey"
    )
    got = ops.run_available_now(stream, "t_static_enrich")
    want = ops.static_enrich(
        Catalog(spark, sf_dir).events, dim, on="user_id", dim_key="c_custkey"
    )
    cols = ["event_id", "user_id", "c_mktsegment", "c_nationkey"]
    assert _rows(got, cols) == _rows(want, cols)
    # unmatched stream keys survive with null dimension columns (restrict
    # the dim so some events can't match)
    partial = dim.filter("c_custkey >= 10")
    sparse = ops.static_enrich(
        Catalog(spark, sf_dir).events, partial, on="user_id", dim_key="c_custkey"
    )
    assert sparse.filter("c_mktsegment IS NULL").count() > 0
    assert sparse.count() == Catalog(spark, sf_dir).events.count()


@pytest.mark.slow
def test_stream_incremental_curation_replay_is_noop(spark, tmp_path):
    """Incremental curation under a real checkpointed stream: batches
    dedup against the persisted index as they arrive, and a forced full
    replay (checkpoint wiped, same source) leaves the index unchanged —
    the layered restart-safety contract (stream checkpoint + doc_id-keyed
    idempotent index appends)."""
    src = tmp_path / "incoming"
    src.mkdir()
    state = str(tmp_path / "state")
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon"
    )
    fresh = "completely different words spark parquet shuffle broadcast join window"
    import pyarrow as pa
    import pyarrow.parquet as pq

    # single FILES (not spark output dirs): the file stream source lists
    # top-level files of the source directory, one file per micro-batch
    pq.write_table(
        pa.table({"doc_id": [1, 2], "text": [base, fresh]}),
        str(src / "b1.parquet"),
    )
    near = base + " extra"
    pq.write_table(  # exact re-ingest + near-dup, both vs state
        pa.table({"doc_id": [10, 11], "text": [base, near]}),
        str(src / "b2.parquet"),
    )
    # the file source orders micro-batches by modification time; fast
    # test runs give both files the same mtime, so pin distinct ones to
    # make b1 deterministically the first batch
    os.utime(str(src / "b1.parquet"), (1_700_000_000, 1_700_000_000))
    os.utime(str(src / "b2.parquet"), (1_700_000_100, 1_700_000_100))

    stream = ops.stream_from_dir(spark, str(src), maxFilesPerTrigger=1)
    stats = ops.stream_incremental_curation(
        stream, state, str(tmp_path / "ckpt1")
    )
    assert sum(s["n_batch"] for s in stats) == 4
    docs = spark.read.parquet(f"{state}/accepted_docs")
    accepted = sorted(r.doc_id for r in docs.collect())
    assert accepted == [1, 2]  # 10 exact-vs-state, 11 fuzzy-vs-state

    # restart-mid-stream: wipe the checkpoint so EVERY micro-batch
    # replays against the already-built index — must be a no-op
    stream2 = ops.stream_from_dir(spark, str(src), maxFilesPerTrigger=1)
    stats2 = ops.stream_incremental_curation(
        stream2, state, str(tmp_path / "ckpt2")
    )
    assert all(s["n_accepted"] == 0 for s in stats2)
    docs_after = spark.read.parquet(f"{state}/accepted_docs")
    assert sorted(r.doc_id for r in docs_after.collect()) == accepted


@pytest.mark.slow
def test_stream_incremental_curation_semantic_passthrough(spark, tmp_path):
    """curation kwargs flow through the stream wrapper: the semantic
    vector index builds under foreachBatch and drops a batch-2
    paraphrase-of-state."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "incoming"
    src.mkdir()
    state = str(tmp_path / "state")
    pq.write_table(
        pa.table(
            {
                "doc_id": [1, 2],
                "text": ["alpha beta gamma delta epsilon zeta", "one two three four"],
                "embedding": [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
            }
        ),
        str(src / "b1.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": [10, 11],
                # 10: byte-fresh but embedding ~ state doc 1 -> semantic drop
                "text": ["totally different words here", "spark parquet shuffle join"],
                "embedding": [[1.0, 0.001, 0.0], [0.0, 0.0, 1.0]],
            }
        ),
        str(src / "b2.parquet"),
    )
    # pin distinct mtimes: micro-batch order must be b1 then b2
    os.utime(str(src / "b1.parquet"), (1_700_000_000, 1_700_000_000))
    os.utime(str(src / "b2.parquet"), (1_700_000_100, 1_700_000_100))
    stream = ops.stream_from_dir(spark, str(src), maxFilesPerTrigger=1)
    stats = ops.stream_incremental_curation(
        stream, state, str(tmp_path / "ckpt"), semantic_eps=0.99, semantic_k=2
    )
    assert sum(s["n_accepted"] for s in stats) == 3
    docs = spark.read.parquet(f"{state}/accepted_docs")
    assert sorted(r.doc_id for r in docs.collect()) == [1, 2, 11]


@pytest.mark.slow
def test_stream_crawl_ingest_vs_state_and_replay(spark, tmp_path):
    """Continuous crawl ingestion: re-crawled canonical URLs and
    same-content-new-URL mirrors skip against the persisted indexes;
    a forced full replay (checkpoint wiped) is a no-op."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "crawl"
    src.mkdir()
    state = str(tmp_path / "cstate")
    body_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    body_b = "totally different words one two three four five six seven"
    body_c = "third page content red orange yellow green blue indigo violet"
    pq.write_table(
        pa.table(
            {
                "doc_id": [1, 2],
                "url": [
                    "https://www.a.example.com/page",
                    "https://www.b.example.com/other",
                ],
                "html": [
                    f"<html><body><p>{body_a}</p></body></html>",
                    f"<html><body><p>{body_b}</p></body></html>",
                ],
            }
        ),
        str(src / "b1.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": [10, 11, 12],
                "url": [
                    # re-crawl of doc 1's page: tracking variant, SAME canonical
                    "https://www.a.example.com/page?utm_source=feed",
                    # mirror: doc 2's CONTENT at a brand-new URL
                    "https://mirror.example.net/copy",
                    # genuinely new
                    "https://www.c.example.com/new",
                ],
                "html": [
                    f"<html><body><p>{body_a} refreshed</p></body></html>",
                    f"<html><body><p>{body_b}</p></body></html>",
                    f"<html><body><p>{body_c}</p></body></html>",
                ],
            }
        ),
        str(src / "b2.parquet"),
    )
    os.utime(str(src / "b1.parquet"), (1_700_000_000, 1_700_000_000))
    os.utime(str(src / "b2.parquet"), (1_700_000_100, 1_700_000_100))

    stream = ops.stream_from_dir(spark, str(src), maxFilesPerTrigger=1)
    stats = ops.stream_crawl_ingest(stream, state, str(tmp_path / "ck1"))
    assert [s["n_batch"] for s in stats] == [2, 3]
    # batch 2: doc 10 skipped at URL index (despite changed content —
    # canonical identity wins), doc 11 skipped at content index, 12 in
    assert stats[1]["n_accepted"] == 1
    docs = spark.read.parquet(f"{state}/accepted_docs")
    assert sorted(r.doc_id for r in docs.collect()) == [1, 2, 12]
    # indexes carry one row per accepted doc
    assert spark.read.parquet(f"{state}/index_urls").count() == 3
    assert spark.read.parquet(f"{state}/index_hashes").count() == 3

    # full replay against built state: no-op
    stream2 = ops.stream_from_dir(spark, str(src), maxFilesPerTrigger=1)
    stats2 = ops.stream_crawl_ingest(stream2, state, str(tmp_path / "ck2"))
    assert all(s["n_accepted"] == 0 for s in stats2)
    assert sorted(
        r.doc_id for r in spark.read.parquet(f"{state}/accepted_docs").collect()
    ) == [1, 2, 12]


@pytest.mark.slow
def test_stream_crawl_frontier_warm_start_and_replay(spark, tmp_path):
    """Continuous frontier under checkpointed foreachBatch: the first
    micro-batch cold-starts PageRank and persists ranks + edge state,
    the second warm-starts over the ACCUMULATED graph, and a full
    replay (checkpoint wiped) leaves the edge state unchanged while
    converging to the same schedule."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = tmp_path / "pages"
    src.mkdir()
    state = str(tmp_path / "fstate")
    out = str(tmp_path / "front")
    pq.write_table(
        pa.table(
            {
                "doc_id": [1, 2],
                "url": ["https://site1.org/a", "https://site4.org/b"],
                "html": [
                    '<p><a href="https://site2.org/x">l</a>'
                    '<a href="https://site3.org/y">l</a></p>',
                    '<p><a href="https://site2.org/x">l</a></p>',
                ],
            }
        ),
        str(src / "b1.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "doc_id": [3],
                "url": ["https://site5.org/c"],
                "html": [
                    '<p><a href="https://site2.org/z">l</a>'
                    '<a href="https://site6.org/w">l</a></p>'
                ],
            }
        ),
        str(src / "b2.parquet"),
    )
    os.utime(str(src / "b1.parquet"), (1_700_000_000, 1_700_000_000))
    os.utime(str(src / "b2.parquet"), (1_700_000_100, 1_700_000_100))

    stream = ops.stream_from_dir(spark, str(src), maxFilesPerTrigger=1)
    stats = ops.stream_crawl_frontier(
        stream, state, out, str(tmp_path / "ck1"), edge_stats=True
    )
    assert [s["warm_start"] for s in stats] == [False, True]
    assert [s["n_state_edges"] for s in stats] == [3, 5]
    sched = {
        r["url"]: r["priority"]
        for r in spark.read.parquet(f"{out}/frontier.parquet").collect()
    }
    assert set(sched) == {"https://site2.org/z", "https://site6.org/w"}

    # replay from a wiped checkpoint: edge appends are keyed, ranks are
    # a staged overwrite — the state converges and nothing accumulates
    stream2 = ops.stream_from_dir(spark, str(src), maxFilesPerTrigger=1)
    stats2 = ops.stream_crawl_frontier(
        stream2, state, out, str(tmp_path / "ck2"), edge_stats=True
    )
    assert all(s["warm_start"] for s in stats2)
    assert stats2[-1]["n_state_edges"] == 5
    sched2 = {
        r["url"]: r["priority"]
        for r in spark.read.parquet(f"{out}/frontier.parquet").collect()
    }
    assert set(sched2) == set(sched)
    for u in sched:
        assert abs(sched2[u] - sched[u]) < 1e-6, u


@pytest.mark.slow
def test_stream_incremental_curation_drift_per_batch_and_restart(spark, tmp_path):
    """drift_report flows through the stream wrapper: every micro-batch
    after the first surfaces batch_js_divergence computed against the
    persisted token index, and the numbers survive a restart (checkpoint
    wiped, same source: replays accept nothing, so no drift stat and no
    index movement)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from eligibility_etl_airflow_spark.operators import drift

    src = tmp_path / "incoming"
    src.mkdir()
    state = str(tmp_path / "state")
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "alpha beta gamma delta epsilon additional words here",
        "totally disjoint vocabulary spark shuffle broadcast window",
    ]
    for i, t in enumerate(texts, start=1):
        p = str(src / f"b{i}.parquet")
        pq.write_table(pa.table({"doc_id": [i], "text": [t]}), p)
        os.utime(p, (1_700_000_000 + 100 * i,) * 2)

    stream = ops.stream_from_dir(spark, str(src), maxFilesPerTrigger=1)
    stats = ops.stream_incremental_curation(
        stream, state, str(tmp_path / "ck1"), drift_report=True
    )
    assert len(stats) == 3
    assert "batch_js_divergence" not in stats[0]  # nothing to diverge from
    assert "batch_js_divergence" in stats[1]
    assert "batch_js_divergence" in stats[2]
    # the disjoint batch diverges more than the overlapping one
    assert stats[1]["batch_js_divergence"] < stats[2]["batch_js_divergence"]
    # index equals a from-scratch recount of the accepted corpus
    docs = spark.read.parquet(f"{state}/accepted_docs").select("text")
    want = {r["tok"]: r["c"] for r in drift.unigram_counts(docs).collect()}
    got = {
        r["tok"]: r["c"]
        for r in spark.read.parquet(f"{state}/index_tokens").collect()
    }
    assert got == want

    # restart: full replay accepts nothing, emits no drift stat, and
    # leaves the token index untouched
    stream2 = ops.stream_from_dir(spark, str(src), maxFilesPerTrigger=1)
    stats2 = ops.stream_incremental_curation(
        stream2, state, str(tmp_path / "ck2"), drift_report=True
    )
    assert all(s["n_accepted"] == 0 for s in stats2)
    assert all("batch_js_divergence" not in s for s in stats2)
    got2 = {
        r["tok"]: r["c"]
        for r in spark.read.parquet(f"{state}/index_tokens").collect()
    }
    assert got2 == want


@pytest.mark.slow
def test_stream_crawl_ingest_drift_per_batch(spark, tmp_path):
    """drift_report flows through the crawl stream wrapper too: batches
    after the first surface batch_js_divergence against the persisted
    token index, and the index tracks the accepted corpus across the
    whole stream."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from eligibility_etl_airflow_spark.operators import drift

    src = tmp_path / "crawl"
    src.mkdir()
    state = str(tmp_path / "cstate")
    pages = [
        (1, "https://s1.example.com/a",
         "<p>alpha beta gamma delta epsilon zeta</p>"),
        (2, "https://s1.example.com/b",
         "<p>alpha beta gamma with extra words</p>"),
        (3, "https://s1.example.com/c",
         "<p>disjoint vocabulary spark shuffle broadcast</p>"),
    ]
    for i, (doc_id, url, html) in enumerate(pages, start=1):
        p = str(src / f"b{i}.parquet")
        pq.write_table(
            pa.table({"doc_id": [doc_id], "url": [url], "html": [html]}), p
        )
        os.utime(p, (1_700_000_000 + 100 * i,) * 2)

    stream = ops.stream_from_dir(spark, str(src), maxFilesPerTrigger=1)
    stats = ops.stream_crawl_ingest(
        stream, state, str(tmp_path / "ck"), drift_report=True
    )
    assert len(stats) == 3
    assert "batch_js_divergence" not in stats[0]
    assert "batch_js_divergence" in stats[1]
    assert "batch_js_divergence" in stats[2]
    assert stats[1]["batch_js_divergence"] < stats[2]["batch_js_divergence"]
    got = {
        r["tok"]: r["c"]
        for r in spark.read.parquet(f"{state}/index_tokens").collect()
    }
    want = {
        r["tok"]: r["c"]
        for r in drift.unigram_counts(
            spark.read.parquet(f"{state}/accepted_docs").select("text")
        ).collect()
    }
    assert got == want
