"""Reshaping + sessionization analytics: PIVOT/UNPIVOT, CUBE grouping
sets, batch gap-sessionization, and the Bloom-pruned semi join.

The reference's analysis notebook pivots its KPI frame in pandas
(analysis layer) and its DAGs re-query per business dimension; a
complete engine expresses those as single shuffled plans. Every query
here is oracle-backed (DuckDB twin) and registers past the driver's
50-slot window (see registry._DEFERRED) because the window is already
saturated with the reference-derived surface; tests/test_oracle_parity.py
grades them locally on every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eligibility_etl_airflow_spark.catalog import Catalog
from eligibility_etl_airflow_spark.operators.bloom import bloom_semi_join
from eligibility_etl_airflow_spark.registry import query

# --------------------------------------------------------------------------
# PIVOT — long→wide conditional aggregation
# --------------------------------------------------------------------------

PIVOT_ORACLE = """
SELECT o_orderpriority,
       round(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0), 2) AS rev_f,
       round(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0), 2) AS rev_o,
       round(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0), 2) AS rev_p,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


@query("pivot_status_matrix", oracle=PIVOT_ORACLE)
def pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: revenue per priority × status as a wide matrix.

    The value list is pinned (``pivot(col, values)``) — with an explicit
    list Spark skips the extra distinct-values job AND the output schema
    is stable regardless of which statuses a given partition of data
    contains; an unpinned pivot at 100 TB pays a full distinct scan just
    to discover column names. With MULTIPLE pivot aggregates Spark plans
    two phases — a (priority, status) aggregate, then the pivot fold on
    priority — so the second shuffle moves only the already-aggregated
    cell grid (|priorities × statuses| rows), never the data. A
    single-aggregate pivot (or hand-written conditional sums) is one
    shuffle; plan pinned in tests/test_plan_shape.py.
    """
    o = Catalog(spark, sf_dir).orders
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("rev"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # a (priority, status) combo with zero rows is an absent pivot CELL —
    # Spark emits NULL for it regardless of any coalesce inside agg (the
    # agg never ran for that cell), so the zero-fill must happen here to
    # match the oracle's coalesced conditional sums
    zf = lambda c: F.coalesce(F.col(c), F.lit(0.0))  # noqa: E731
    return wide.select(
        "o_orderpriority",
        F.round(zf("F_rev"), 2).alias("rev_f"),
        F.round(zf("O_rev"), 2).alias("rev_o"),
        F.round(zf("P_rev"), 2).alias("rev_p"),
        (
            F.coalesce(F.col("F_n"), F.lit(0))
            + F.coalesce(F.col("O_n"), F.lit(0))
            + F.coalesce(F.col("P_n"), F.lit(0))
        ).cast("long").alias("n_orders"),
    )


# --------------------------------------------------------------------------
# UNPIVOT (melt) — wide→long
# --------------------------------------------------------------------------

UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT o_orderstatus,
         round(sum(o_totalprice), 2) AS revenue,
         round(avg(o_totalprice), 4) AS avg_price,
         round(max(o_totalprice), 2) AS max_price
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, 'revenue'  AS metric, revenue  AS value FROM wide
UNION ALL
SELECT o_orderstatus, 'avg_price', avg_price FROM wide
UNION ALL
SELECT o_orderstatus, 'max_price', max_price FROM wide
"""


@query("unpivot_measures", oracle=UNPIVOT_ORACLE)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: per-status KPI columns to (metric, value) rows —
    the inverse reshape of the pivot. ``DataFrame.unpivot`` expands each
    input row to one row per value column *inside the same stage* (a
    Generate node, no shuffle beyond the feeding aggregate); the pandas
    equivalent (analysis-layer ``melt``) materializes the whole frame.
    """
    o = Catalog(spark, sf_dir).orders
    wide = o.groupBy("o_orderstatus").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
    return wide.unpivot(
        ids=["o_orderstatus"],
        values=["revenue", "avg_price", "max_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# --------------------------------------------------------------------------
# CUBE grouping sets — every dimension combination in one shuffle
# --------------------------------------------------------------------------

CUBE_ORACLE = """
SELECT o_orderstatus,
       o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("cube_revenue", oracle=CUBE_ORACLE)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all four grouping sets (status×priority, status, priority,
    grand total) in one Expand + single hash-aggregate shuffle — the
    completion of the ROLLUP hierarchy in extras.rollup_revenue. At
    100 TB the Expand multiplies scan rows by the grouping-set count
    *after* column pruning, and partial aggregation collapses them
    map-side before the shuffle."""
    o = Catalog(spark, sf_dir).orders
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


# --------------------------------------------------------------------------
# Batch gap-sessionization — lag-gap flags + running-sum session ids
# --------------------------------------------------------------------------

SESSION_GAP_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM marked
)
SELECT user_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       round(sum(value), 2) AS session_value
FROM sess
GROUP BY user_id, session_seq
"""


@query("session_gap_events", oracle=SESSION_GAP_ORACLE)
def session_gap_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by inactivity gap (30 min): lag-gap flag →
    running-sum session id → per-session aggregate. The batch twin of
    streaming/ops.py's session_window query — same session boundaries,
    derived relationally so it is DuckDB-gradable. Two window passes
    share one (user_id, ts, event_id) sort: Catalyst plans a single
    Exchange+Sort feeding both.

    At 100 TB: the shuffle is per-user (the session key), so skewed
    power users dominate a partition — the streaming variant bounds that
    with watermark eviction; batch-side the mitigation is the same
    salting used in plans/extras.salted_join_skew.
    """
    e = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = e.select(
        "user_id",
        "ts",
        "value",
        # interval comparison (not unix_timestamp, which truncates to
        # seconds and would mis-place a boundary straddling 1800 s at
        # sub-second scale; also works on TIMESTAMP_NTZ, where
        # unix_micros does not) — microsecond-exact on both engines
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.col("ts") - F.lag("ts").over(w)) > F.expr("INTERVAL 30 MINUTE")),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
        F.col("event_id"),
    )
    sess = marked.withColumn(
        "session_seq",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


# --------------------------------------------------------------------------
# Bloom-pruned semi join — map-side pruning ahead of the shuffle
# --------------------------------------------------------------------------

BLOOM_SEMI_ORACLE = """
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
)
"""


@query("bloom_semi_join_scan", oracle=BLOOM_SEMI_ORACLE)
def bloom_semi_join_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join of lineitem against the urgent-order key set through a
    Bloom prefilter (operators/bloom.py). The sketch is built with one
    distributed pass over the keys; the fact side drops ≈99% of
    non-matching rows in its scan stage before the left_semi shuffle;
    the follow-up exact join removes Bloom false positives, so the
    result is hash-identical to the plain IN-subquery oracle."""
    cat = Catalog(spark, sf_dir)
    keys = cat.orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    fact = cat.lineitem.select(
        "l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price")
    )
    # size from the footer-only total-orders count (an upper bound on the
    # filtered key set) instead of bloom_build's approx_count_distinct
    # pass — overestimating n only lowers fpp, and it skips one job
    return bloom_semi_join(
        fact, "l_orderkey", keys, "o_orderkey", fpp=0.01,
        expected_items=cat.orders.count(),
    )


# --------------------------------------------------------------------------
# Deterministic per-group sampling — exact k per group, run-stable
# --------------------------------------------------------------------------

GROUP_SAMPLE_ORACLE = """
SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('s1|' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= 5
"""


@query("group_sample_deterministic", oracle=GROUP_SAMPLE_ORACLE)
def group_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly k rows per group, chosen pseudo-randomly but
    DETERMINISTICALLY: rank by md5(seed || id) within the group. The
    ``rand()``-based alternative is partition-order-dependent (a rerun
    or repartition changes the sample); hashing the key makes the draw a
    pure function of (seed, id) — same run-stability argument as
    assign_split, and the per-group twin of sampleBy's Bernoulli draw
    when you need exact counts (per-domain eval sets)."""
    d = Catalog(spark, sf_dir).documents
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("s1|"), F.col("doc_id").cast("string"))), "doc_id"
    )
    return (
        d.select("lang", "doc_id", F.row_number().over(w).cast("long").alias("rn"))
        .filter(F.col("rn") <= 5)
    )


# --------------------------------------------------------------------------
# Fixed-bound histogram — map-only binning + one aggregate
# --------------------------------------------------------------------------

HISTOGRAM_ORACLE = """
SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY 1
"""


@query("price_histogram", oracle=HISTOGRAM_ORACLE)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bound histogram: data-independent bucket edges make the
    binning a map-only projection + one partial-aggregated shuffle — the
    scale-safe form (an ntile/equal-population binning needs a global
    range partition; the quantile-edge variant is extras.percentile_stats
    feeding these same fixed buckets)."""
    o = Catalog(spark, sf_dir).orders
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 25000).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# Correlation / dispersion statistics per group
# --------------------------------------------------------------------------

CORR_ORACLE = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
       round(stddev_samp(l_extendedprice), 2) AS stddev_price
FROM lineitem
GROUP BY l_returnflag
"""


@query("feature_correlations", oracle=CORR_ORACLE)
def feature_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation / sample covariance / stddev per group — the
    feature-analysis statistics (all partial-aggregatable co-moment
    sketches: one shuffle of constant-size state per group)."""
    li = Catalog(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("stddev_price"),
    )


# --------------------------------------------------------------------------
# Rank-family windows — ntile / percent_rank / cume_dist
# --------------------------------------------------------------------------

RANKS_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
"""


@query("rank_family_windows", oracle=RANKS_ORACLE)
def rank_family_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining rank-family window functions (rank, ntile,
    percent_rank, cume_dist) over one shared partition sort — completes
    the window surface beyond W1/W2's dense_rank/row_number and the
    frame-spec aggregates. The orderBy includes the key as tiebreaker so
    every function is deterministic."""
    o = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# --------------------------------------------------------------------------
# INTERSECT / EXCEPT set operations
# --------------------------------------------------------------------------

SET_OPS_ORACLE = """
WITH urgent AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
), finished AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
SELECT 'both' AS bucket, CAST(count(*) AS BIGINT) AS n
FROM (SELECT o_custkey FROM urgent INTERSECT SELECT o_custkey FROM finished)
UNION ALL
SELECT 'urgent_only', CAST(count(*) AS BIGINT)
FROM (SELECT o_custkey FROM urgent EXCEPT SELECT o_custkey FROM finished)
UNION ALL
SELECT 'finished_only', CAST(count(*) AS BIGINT)
FROM (SELECT o_custkey FROM finished EXCEPT SELECT o_custkey FROM urgent)
"""


@query("set_ops_customers", oracle=SET_OPS_ORACLE)
def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set algebra over two filtered key sets — the
    two set operators the U-family queries don't cover (union and
    exceptAll are graded elsewhere). Both compile to aggregate-style
    joins on the key: one shuffle each, broadcastable when one side is
    small."""
    o = Catalog(spark, sf_dir).orders
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()

    def one(bucket: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("long").alias("n")).select(
            F.lit(bucket).alias("bucket"), "n"
        )

    return (
        one("both", urgent.intersect(finished))
        .unionByName(one("urgent_only", urgent.exceptAll(finished)))
        .unionByName(one("finished_only", finished.exceptAll(urgent)))
    )


# --------------------------------------------------------------------------
# Time-series gap fill + LOCF
# --------------------------------------------------------------------------

GAP_FILL_ORACLE = """
WITH bucketed AS (
  SELECT user_id,
         make_timestamp(CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 * 1000000)
           AS bucket_start,
         ts, value,
         row_number() OVER (
           PARTITION BY user_id,
                        CAST(floor(epoch(ts) / 900) AS BIGINT)
           ORDER BY ts DESC, value DESC) AS rn
  FROM events
), observed AS (
  SELECT user_id, bucket_start, round(value, 4) AS value
  FROM bucketed WHERE rn = 1
), grid AS (
  SELECT user_id,
         unnest(generate_series(min(bucket_start), max(bucket_start),
                                INTERVAL 15 MINUTE)) AS bucket_start
  FROM observed GROUP BY user_id
)
SELECT g.user_id, g.bucket_start,
       o.value,
       last_value(o.value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.bucket_start
         ROWS UNBOUNDED PRECEDING) AS filled_value,
       o.value IS NULL AS is_gap
FROM grid g LEFT JOIN observed o USING (user_id, bucket_start)
"""


@query("gap_fill_timeseries", oracle=GAP_FILL_ORACLE)
def gap_fill_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize the events stream (operators/timeseries.py): 15-minute
    buckets per user, full grid between each user's first and last
    event, gaps carried forward (LOCF). Deterministic last-in-bucket via
    (ts, value) ordering."""
    from eligibility_etl_airflow_spark.operators import timeseries

    e = Catalog(spark, sf_dir).events.select(
        "user_id", "ts", F.round("value", 4).alias("value")
    )
    return timeseries.gap_fill_locf(
        e, "user_id", "ts", "value", interval="15 minutes"
    )


# --------------------------------------------------------------------------
# Funnel analysis — ordered event-sequence progression per user
# --------------------------------------------------------------------------

FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, min(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS click_ts
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.signup_ts
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS purchase_ts
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.click_ts
  GROUP BY e.user_id
)
SELECT s1.user_id, s1.signup_ts, s2.click_ts, s3.purchase_ts,
       CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                 WHEN s2.user_id IS NOT NULL THEN 2
                 ELSE 1 END AS BIGINT) AS stage_reached
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


@query("funnel_signup_click_purchase", oracle=FUNNEL_ORACLE)
def funnel_signup_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: first signup → first click AFTER it → first
    purchase AFTER that. The ordering constraint is what distinguishes
    a funnel from three independent mins — each stage's events must
    strictly follow the previous stage's timestamp. Three conditional
    min-aggregates, each joined back (all on the user key, so the
    shuffles co-partition; AQE broadcasts the shrinking stage tables)."""
    e = Catalog(spark, sf_dir).events
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            "signup_ts",
            "click_ts",
            "purchase_ts",
            F.when(F.col("purchase_ts").isNotNull(), 3)
            .when(F.col("click_ts").isNotNull(), 2)
            .otherwise(1)
            .cast("long")
            .alias("stage_reached"),
        )
    )


# --------------------------------------------------------------------------
# Cohort retention — signup week × activity week matrix
# --------------------------------------------------------------------------

RETENTION_ORACLE = """
WITH cohort AS (
  SELECT user_id,
         CAST(floor(epoch(min(ts)) / 604800) AS BIGINT) AS cohort_week
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 604800) AS BIGINT) AS active_week
  FROM events
)
SELECT c.cohort_week,
       a.active_week - c.cohort_week AS weeks_since,
       CAST(count(DISTINCT c.user_id) AS BIGINT) AS n_users
FROM cohort c JOIN activity a USING (user_id)
GROUP BY 1, 2
"""


@query("cohort_retention", oracle=RETENTION_ORACLE)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    in each later week they were active. Epoch-week buckets (UTC,
    604800 s) keep both engines' week boundaries identical — calendar
    weekofyear would couple the result to locale week rules. Two
    aggregates + one join, all on user_id."""
    e = Catalog(spark, sf_dir).events
    # timestamp_ntz has no unix_timestamp — epoch seconds via date + time
    # component arithmetic (exact at second resolution, mirrors epoch())
    epoch_s = F.unix_date(F.col("ts").cast("date")) * 86400 + (
        F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")
    )
    wk = F.floor(epoch_s / 604800).cast("long")
    cohort = e.groupBy("user_id").agg(F.min("ts").alias("first_ts")).select(
        "user_id",
        F.floor(
            (F.unix_date(F.col("first_ts").cast("date")) * 86400
             + F.hour("first_ts") * 3600 + F.minute("first_ts") * 60
             + F.second("first_ts"))
            / 604800
        ).cast("long").alias("cohort_week"),
    )
    activity = e.select("user_id", wk.alias("active_week")).distinct()
    return (
        cohort.join(activity, "user_id")
        .groupBy("cohort_week", (F.col("active_week") - F.col("cohort_week")).alias("weeks_since"))
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


# --------------------------------------------------------------------------
# Rolling z-score anomaly detection
# --------------------------------------------------------------------------

ANOMALY_ORACLE = """
WITH scaled AS (
  SELECT user_id, ts, event_id, value,
         CAST(round(value * 10000) AS BIGINT) AS xs
  FROM events
), scored AS (
  SELECT user_id, ts, value, xs,
         sum(xs) OVER w AS s1,
         sum(xs * xs) OVER w AS s2,
         count(*) OVER w AS n
  FROM scaled
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, ts, round(value, 4) AS value,
       CASE WHEN n > 0 THEN s1 / (n * 10000.0) END AS rolling_mean,
       CAST(n AS BIGINT) AS n_window,
       CASE WHEN n >= 4 AND n * s2 - s1 * s1 > 0
                 AND (xs * n - s1) * (xs * n - s1) * (n - 1)
                     > 9 * n * (n * s2 - s1 * s1)
            THEN TRUE ELSE FALSE END AS is_anomaly
FROM scored
"""


@query("rolling_zscore_anomalies", oracle=ANOMALY_ORACLE)
def rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags: each event scored against its own
    trailing window (8 PRECEDING .. 1 PRECEDING — excluding the current
    row, or a spike would inflate the very baseline it is judged
    against). Flag |value − μ| > 3σ with ≥4 prior points and σ > 0.

    All statistics run in SCALED-INTEGER arithmetic (value × 10⁴ as
    long): floating windowed sums differ between engines in the last
    ULP (summation order) and a rounded mean or a σ comparison can sit
    exactly on the boundary — integer sums are order-independent, the
    reported mean is the UNROUNDED double division of identical exact
    integers (bit-identical on both engines; rounding it would re-
    introduce half-tie divergence, measured at 4 dp), and
    the 3σ test becomes the exact integer inequality
    (x·n − Σ)²·(n−1) > 9·n·(n·Σx² − Σ²). Magnitudes stay far below
    2⁶³ for the 8-row window. One shuffle on the series key."""
    e = Catalog(spark, sf_dir).events
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-8, -1)
    )
    xs = F.round(F.col("value") * 10000).cast("long")
    base = e.select("user_id", "ts", "event_id", "value", xs.alias("xs"))
    s1 = F.sum("xs").over(w)
    s2 = F.sum(F.col("xs") * F.col("xs")).over(w)
    n = F.count(F.lit(1)).over(w)
    var_num = n * s2 - s1 * s1
    dev = F.col("xs") * n - s1
    return base.select(
        "user_id",
        "ts",
        F.round("value", 4).alias("value"),
        F.when(n > 0, s1 / (n * F.lit(10000.0))).alias("rolling_mean"),
        n.cast("long").alias("n_window"),
        ((n >= 4) & (var_num > 0) & (dev * dev * (n - 1) > 9 * n * var_num)).alias(
            "is_anomaly"
        ),
    )


SKEW_PROFILE_ORACLE = """
WITH counts AS (
  SELECT user_id, count(*) AS cnt FROM events GROUP BY 1
), total AS (SELECT count(*) AS total FROM events)
SELECT user_id,
       CAST(cnt AS BIGINT) AS cnt,
       round(cnt * 1.0 / total, 6) AS share,
       CAST(row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS BIGINT) AS rnk
FROM counts CROSS JOIN total
QUALIFY rnk <= 10
"""


@query("skew_profile_events", oracle=SKEW_PROFILE_ORACLE)
def skew_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key profile of events.user_id (operators/skew.py::hot_keys):
    the pre-flight diagnostic for join strategy — plain vs AQE skew
    splitting vs salted_join. Partial-aggregated count; the top-k window
    runs over the per-key relation, never the rows."""
    from eligibility_etl_airflow_spark.operators import skew

    e = Catalog(spark, sf_dir).events
    return skew.hot_keys(e, "user_id", k=10)
