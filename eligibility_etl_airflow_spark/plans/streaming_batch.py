"""Batch twins of the streaming operators (SURVEY.md §2.11).

Each registered query runs the SAME transformation builder as the real
Structured Streaming plan in ``streaming/ops.py`` — on the batch events
table (``withWatermark`` is a no-op under batch execution) — so the
driver's DuckDB oracle certifies the window semantics, and
``tests/test_streaming.py`` separately asserts stream == batch on the
same input. Window epochs are UTC-aligned in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.catalog import Catalog
from eligibility_etl_airflow_spark.registry import query
from eligibility_etl_airflow_spark.streaming import ops

# --------------------------------------------------------------------------
# Watermark dedup (overlap-redelivery removal)
# --------------------------------------------------------------------------

DEDUP_ORACLE = """
SELECT event_id, ts, user_id, event_type, value, props FROM events
"""


@query("stream_dedup_overlap", oracle=DEDUP_ORACLE)
def stream_dedup_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-delivered rows (the reference's 30-min extraction overlap,
    sql/eligibility_enhanced.sql:74-75) removed by keyed dedup: the input
    is events ∪ a 10% resample of itself; dropDuplicates(event_id)
    restores exactly the original relation."""
    e = Catalog(spark, sf_dir).events
    redelivered = e.unionByName(e.filter(F.col("event_id") % 10 == 0))
    return ops.dedup_under_watermark(redelivered)


# --------------------------------------------------------------------------
# Tumbling 1-day window
# --------------------------------------------------------------------------

TUMBLING_ORACLE = """
SELECT date_trunc('day', ts) AS window_start,
       date_trunc('day', ts) + INTERVAL 1 DAY AS window_end,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS total_value
FROM events
GROUP BY 1, 2, 3
"""


@query("stream_tumbling_daily", oracle=TUMBLING_ORACLE)
def stream_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day tumbling window per event_type (resubmission's "yesterday"
    cron, generalized to every day)."""
    return ops.tumbling_daily(Catalog(spark, sf_dir).events)


# --------------------------------------------------------------------------
# Sliding window(270 min, 240 min)
# --------------------------------------------------------------------------

# Spark assigns an event at t to window start s0 = floor(epoch/240min)*240min
# always, and additionally to s0 - 240min iff t < s0 + 30min.
SLIDING_ORACLE = """
WITH e AS (
  SELECT ts, value,
         CAST(floor(epoch(ts) / 14400) AS BIGINT) * 14400 AS s0
  FROM events
),
cand AS (
  SELECT make_timestamp((s0 - k * 14400) * 1000000) AS window_start, ts, value
  FROM e, (SELECT unnest([0, 1]) AS k)
  WHERE epoch(ts) >= s0 - k * 14400
    AND epoch(ts) <  s0 - k * 14400 + 16200
)
SELECT window_start,
       window_start + INTERVAL 270 MINUTE AS window_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS total_value
FROM cand
GROUP BY 1, 2
"""


@query("stream_sliding_270_240", oracle=SLIDING_ORACLE)
def stream_sliding_270_240(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window(270 min, slide 240 min) — the eligibility DAG's
    exact extraction geometry as a real sliding window."""
    return ops.sliding_270_240(Catalog(spark, sf_dir).events)


# --------------------------------------------------------------------------
# Session windows (30-min gap per user)
# --------------------------------------------------------------------------

# Gaps-and-islands twin: a new session starts when the gap to the previous
# event is >= 30 min (Spark sessions span [ts, ts+gap); an event landing
# exactly at the previous end starts a new session).
SESSION_ORACLE = """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT *, sum(new_sess) OVER (
    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
  ) AS sess_id
  FROM o
)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS session_value
FROM s
GROUP BY user_id, sess_id
"""


@query("stream_session_windows", oracle=SESSION_ORACLE)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 30-min-gap session windows (new capability vs reference)."""
    return ops.session_windows(Catalog(spark, sf_dir).events)


# --------------------------------------------------------------------------
# Custom stateful operator (applyInPandasWithState) — batch twin
# --------------------------------------------------------------------------

STATEFUL_ORACLE = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 4) AS total_value,
       max(ts) AS last_ts
FROM events
GROUP BY user_id
"""


@query("stream_stateful_running_spend", oracle=STATEFUL_ORACLE)
def stream_stateful_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the applyInPandasWithState per-user running-spend
    monitor (streaming/stateful.py); tests/test_stateful.py asserts the
    stream's final state equals this aggregate on the same input."""
    from eligibility_etl_airflow_spark.streaming import stateful

    return stateful.running_spend_batch(Catalog(spark, sf_dir).events)


# --------------------------------------------------------------------------
# Stream-stream interval join (watermarked both sides)
# --------------------------------------------------------------------------

INTERVAL_JOIN_ORACLE = """
SELECT e.event_id AS error_id,
       e.user_id AS user_id,
       e.ts AS e_ts,
       c.ts AS c_ts,
       c.value AS c_value
FROM events e JOIN events c
  ON e.event_type = 'error' AND c.event_type = 'click'
 AND e.user_id = c.user_id
 AND c.ts >= e.ts - INTERVAL 1800 SECOND
 AND c.ts <= e.ts + INTERVAL 1800 SECOND
"""


@query("stream_interval_join", oracle=INTERVAL_JOIN_ORACLE)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (errors × same-user clicks within
    ±30 min) — the same builder runs as a real watermarked two-stream
    join in streaming/ops.py (state bounded by the event-time range
    predicate); tests/test_streaming.py asserts stream == batch."""
    e = Catalog(spark, sf_dir).events
    return ops.interval_join_error_clicks(e, e, tolerance_s=1800)


# --------------------------------------------------------------------------
# Stream-static broadcast enrichment
# --------------------------------------------------------------------------

STATIC_ENRICH_ORACLE = """
SELECT e.event_id, e.user_id, e.event_type,
       c.c_mktsegment AS mktsegment,
       CAST(c.c_nationkey AS BIGINT) AS nationkey
FROM events e
LEFT JOIN customer c ON c.c_custkey = e.user_id
"""


@query("stream_static_enrich", oracle=STATIC_ENRICH_ORACLE)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join (streaming/ops.py::static_enrich):
    each event picks up its customer dimension row; the static side
    broadcasts and is re-planned per micro-batch, the stream side never
    shuffles. Left join — events keep flowing when the dimension has no
    row (the null arm is exercised with a restricted dim in
    tests/test_streaming.py)."""
    e = Catalog(spark, sf_dir).events
    dim = Catalog(spark, sf_dir).customer.select(
        "c_custkey",
        F.col("c_mktsegment").alias("mktsegment"),
        F.col("c_nationkey").cast("long").alias("nationkey"),
    )
    return ops.static_enrich(e, dim, on="user_id", dim_key="c_custkey").select(
        "event_id", "user_id", "event_type", "mktsegment", "nationkey"
    )
