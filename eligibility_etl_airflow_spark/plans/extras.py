"""Coverage-completing queries: dropna variants (P11), frame-spec window
aggregates (the capability SURVEY.md §2.5 notes "comes free" of
Window.rowsBetween), and analytics the reference lacks but a complete
engine needs (ROLLUP grouping sets, exact percentiles)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eligibility_etl_airflow_spark.catalog import Catalog
from eligibility_etl_airflow_spark.registry import query

# --------------------------------------------------------------------------
# P11 — dropna row/column filters
# --------------------------------------------------------------------------

DROPNA_ORACLE = """
WITH base AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderpriority END AS clerk,
         CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderstatus END AS comment
  FROM orders
)
SELECT CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN clerk IS NOT NULL AND comment IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_any,
       CAST(sum(CASE WHEN clerk IS NOT NULL OR comment IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_all,
       CAST(sum(CASE WHEN clerk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_clerk
FROM base
"""


@query("dropna_filters", oracle=DROPNA_ORACLE)
def dropna_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: na.drop("any") / na.drop("all") row filters plus the
    null-count aggregate that drives column-wise drops (pandas
    ``dropna(axis=1)`` becomes: aggregate null counts once, then drop
    columns above a threshold — src/resubmission.py:146)."""
    o = Catalog(spark, sf_dir).orders
    base = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 != 0, F.col("o_orderpriority")).alias("clerk"),
        F.when(F.col("o_orderkey") % 5 != 0, F.col("o_orderstatus")).alias("comment"),
    )
    totals = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(F.when(F.col("clerk").isNull(), 1).otherwise(0)).cast("long").alias("n_null_clerk"),
    )
    drop_any = base.na.drop("any", subset=["clerk", "comment"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_drop_any")
    )
    drop_all = base.na.drop("all", subset=["clerk", "comment"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_drop_all")
    )
    return totals.crossJoin(drop_any).crossJoin(drop_all).select(
        "n_total", "n_drop_any", "n_drop_all", "n_null_clerk"
    )


# --------------------------------------------------------------------------
# Frame-spec windows — running totals / moving averages / lead-lag
# --------------------------------------------------------------------------

RUNNING_ORACLE = """
SELECT o_custkey,
       o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS UNBOUNDED PRECEDING), 2) AS running_spend,
       round(avg(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3,
       lag(o_orderkey) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order
FROM orders
"""


@query("running_total_window", oracle=RUNNING_ORACLE)
def running_total_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec windows (rowsBetween running sum, 3-row moving average,
    lag) — beyond the reference's two top-1-per-group windows."""
    o = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2
        ).alias("running_spend"),
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg_3"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
    )


# --------------------------------------------------------------------------
# ROLLUP grouping sets
# --------------------------------------------------------------------------

ROLLUP_ORACLE = """
SELECT o_orderstatus,
       o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@query("rollup_revenue", oracle=ROLLUP_ORACLE)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (status → priority → grand total) — one
    shuffle computes every grouping set with partial aggregation."""
    o = Catalog(spark, sf_dir).orders
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


# --------------------------------------------------------------------------
# Exact percentiles / distribution stats
# --------------------------------------------------------------------------

PERCENTILE_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price,
       round(avg(l_extendedprice), 4) AS avg_price
FROM lineitem
GROUP BY l_returnflag
"""


@query("percentile_stats", oracle=PERCENTILE_ORACLE)
def percentile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``); at 100 TB swap in approx_percentile —
    same plan shape, sketch-mergeable.

    Both quantiles come from ONE ``percentile(col, array(...))`` call
    (r10, guide §2.3): two scalar calls each build their own
    full-value-list aggregation buffer and ship it through the
    exchange — one array-form call halves the buffer and the shuffled
    bytes, with bit-identical interpolation. (A round-robin
    parallelism stage was tried and reverted — r10 A/B: the repartition
    shuffle of the raw rows cost more than the single-task partial
    aggregate it parallelized; columnar agg work is ~cheap per row,
    unlike the FHIR JSON synth where the same staging won 6×.)"""
    li = Catalog(spark, sf_dir).lineitem
    pcts = F.expr("percentile(l_extendedprice, array(0.5D, 0.95D))")
    return (
        li.groupBy("l_returnflag")
        .agg(
            pcts.alias("_p"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("_p").getItem(0), 4).alias("p50"),
            F.round(F.col("_p").getItem(1), 4).alias("p95"),
            "min_price",
            "max_price",
            "avg_price",
        )
    )


@query("percentile_stats_approx")
def percentile_stats_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of ``percentile_stats``: ``approx_percentile``
    (KLL-family sketch — bounded-memory, partial-aggregatable, one
    shuffle of constant-size sketches instead of a full sort buffer per
    group). Registered rows-only because the sketch result is
    rank-error-bounded, not value-exact; tests/test_extras.py pins the
    error bound against the exact query. ``accuracy=10000`` bounds rank
    error at 1/accuracy = 0.01% of rows per group. Both quantiles come
    from ONE sketch via the array form (r10, guide §2.3 — the scalar
    form builds and shuffles two identical KLL sketches)."""
    li = Catalog(spark, sf_dir).lineitem
    pcts = F.expr(
        "approx_percentile(l_extendedprice, array(0.5D, 0.95D), 10000)"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            pcts.alias("_p"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("_p").getItem(0), 4).alias("p50"),
            F.round(F.col("_p").getItem(1), 4).alias("p95"),
            "min_price",
            "max_price",
            "avg_price",
        )
    )


# --------------------------------------------------------------------------
# Pure-SQL surface: ONE ANSI string runs on both engines
# --------------------------------------------------------------------------

PRICING_SUMMARY_SQL = """
SELECT l_returnflag,
       l_linestatus,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@query("pricing_summary_sql", oracle=PRICING_SUMMARY_SQL)
def pricing_summary_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql(...) surface: the exact oracle string runs through
    Spark's SQL parser over registered views — users of the engine can
    submit ANSI SQL directly, not just DataFrame code."""
    Catalog(spark, sf_dir).register_views()
    return spark.sql(PRICING_SUMMARY_SQL)


# --------------------------------------------------------------------------
# Salted skew join — identical semantics to the plain join
# --------------------------------------------------------------------------

SALTED_JOIN_ORACLE = """
SELECT o.o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l.l_extendedprice), 2) AS total_price
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
"""


@query("salted_join_skew", oracle=SALTED_JOIN_ORACLE)
def salted_join_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key salting (operators/skew.py): big side salted into 8
    sub-keys, small side replicated ×8 — result provably identical to
    the plain join (this oracle IS the plain join)."""
    from eligibility_etl_airflow_spark.operators.skew import salted_join

    c = Catalog(spark, sf_dir)
    big = c.lineitem.select(F.col("l_orderkey").alias("okey"), "l_extendedprice")
    small = c.orders.select(F.col("o_orderkey").alias("okey"), "o_orderstatus")
    return (
        salted_join(big, small, "okey")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


# --------------------------------------------------------------------------
# HLL sketch distinct counting — the 100 TB form of COUNT(DISTINCT)
# --------------------------------------------------------------------------


# --------------------------------------------------------------------------
# As-of join — purchase events enriched with the latest prior click
# --------------------------------------------------------------------------

ASOF_ORACLE = """
SELECT p.event_id AS purchase_id,
       p.user_id AS user_id,
       p.ts AS purchase_ts,
       c.ts AS click_ts,
       c.value AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id AND c.ts <= p.ts
"""


@query("asof_join_events", oracle=ASOF_ORACLE)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (capability beyond the reference — SURVEY.md §2.3 notes
    it has no as-of/range joins): each purchase event picks up the most
    recent click by the same user at or before the purchase timestamp.
    Implemented via the union + ordered-window pattern in
    operators/asof.py (one shuffle + one sort, no pairwise expansion);
    the oracle is DuckDB's native ASOF JOIN."""
    from eligibility_etl_airflow_spark.operators.asof import asof_join

    e = Catalog(spark, sf_dir).events
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="ts",
        right_cols=["ts", "value"],
        how="inner",
        suffix="",
    )
    return joined.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )


# --------------------------------------------------------------------------
# Range (interval) join — no equality key, bucketized
# --------------------------------------------------------------------------

RANGE_JOIN_ORACLE = """
SELECT e.event_id AS error_id,
       CAST(count(*) AS BIGINT) AS n_nearby_clicks,
       ROUND(sum(c.value), 4) AS sum_click_value
FROM events e
JOIN events c
  ON e.event_type = 'error' AND c.event_type = 'click'
 AND abs(epoch(e.ts) - epoch(c.ts)) <= 120
GROUP BY e.event_id
"""


@query("range_join_events", oracle=RANGE_JOIN_ORACLE)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join with no equi key (beyond the reference): for each
    error event, aggregate the click events within ±120 s regardless of
    user. A raw inequality join is a BroadcastNestedLoopJoin (corpus²);
    operators/rangejoin.py rewrites it to an equi-join on quantized time
    buckets with 3× replication of the right side — ordinary shuffle
    join cost, AQE-safe at scale. The oracle is the naive inequality
    join, which DuckDB can afford at sf0.01."""
    from eligibility_etl_airflow_spark.operators.rangejoin import range_join

    e = Catalog(spark, sf_dir).events
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("ts").alias("e_ts")
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("c_ts"), F.col("value").alias("c_value")
    )
    return (
        range_join(errors, clicks, "e_ts", "c_ts", tolerance_s=120)
        .groupBy("error_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nearby_clicks"),
            F.round(F.sum("c_value"), 4).alias("sum_click_value"),
        )
    )


# --------------------------------------------------------------------------
# Stratified sampling — training-data curation primitive
# --------------------------------------------------------------------------


@query("stratified_sample")
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum Bernoulli sampling (``sampleBy``) over documents by
    language — the corpus-rebalancing primitive for training-data
    mixes. Seeded, executor-side, no shuffle (a map-only filter over the
    scan). Registered rows-only: the sample membership is Spark-seed-
    specific, so there is no DuckDB twin; the per-stratum rate bounds
    are asserted in tests/test_extras.py."""
    d = Catalog(spark, sf_dir).documents
    fractions = {"en": 0.5, "de": 0.25, "es": 0.25, "fr": 0.25, "zh": 0.1}
    sample = d.sampleBy("lang", fractions, seed=42)
    return sample.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_sampled")
    )


@query("approx_distinct_sketch")
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) next to the exact count —
    the sketch is mergeable across partitions (one pass, no
    distinct-expansion shuffle), which is what replaces exact
    COUNT(DISTINCT) at 100 TB. Registered rows-only (sketch estimates
    aren't oracle-matchable); the relative-error bound is asserted in
    tests/test_extras.py."""
    o = Catalog(spark, sf_dir).orders
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_customers"),
        F.approx_count_distinct("o_custkey", rsd=0.02).cast("long").alias("approx_customers"),
    )


# --------------------------------------------------------------------------
# SCD type-2 history + CDC snapshot diff (operators/history.py)
# --------------------------------------------------------------------------

SCD2_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER w AS prev_type,
         ROW_NUMBER() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
starts AS (
  -- rn=1 (not prev IS NULL) marks the first row, and IS DISTINCT FROM
  -- is null-safe — so value->NULL transitions version and NULL
  -- heartbeats compact, matching scd2_from_changelog's eqNullSafe
  -- semantics even when the attribute itself is NULL
  SELECT user_id, ts, event_id, event_type FROM ordered
  WHERE rn = 1 OR event_type IS DISTINCT FROM prev_type
)
SELECT user_id, event_type, ts AS valid_from,
       LEAD(ts) OVER w2 AS valid_to,
       (LEAD(ts) OVER w2) IS NULL AS is_current
FROM starts
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@query("scd2_user_status", oracle=SCD2_ORACLE)
def scd2_user_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 dimension history of each user's event_type status built
    from the events change log (operators/history.py): consecutive
    unchanged rows compacted, valid_from/valid_to intervals closed by
    the next version, open interval = current. One shuffle on user_id;
    lag-compare and lead-close share the window sort."""
    from eligibility_etl_airflow_spark.operators import history

    e = Catalog(spark, sf_dir).events.select("user_id", "ts", "event_id", "event_type")
    return history.scd2_from_changelog(
        e, ["user_id"], "ts", ["event_type"], tiebreak_cols=["event_id"]
    )


SNAPSHOT_DIFF_ORACLE = """
WITH old AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0
),
new AS (
  -- +1000.0 is exact in binary double: both engines produce identical
  -- bits, unlike *1.1 + round(_, 2), whose half-way ties Spark rounds on
  -- the double's SHORTEST DECIMAL repr (BigDecimal.valueOf -> "x.035" ->
  -- HALF_UP -> .04) while DuckDB rounds the exact binary value
  -- (.03499... -> .03)
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 5 <> 0
)
SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
       CASE WHEN old.o_orderkey IS NULL THEN 'insert'
            WHEN new.o_orderkey IS NULL THEN 'delete'
            WHEN old.o_totalprice <> new.o_totalprice THEN 'update'
       END AS change_type,
       old.o_totalprice AS old_o_totalprice,
       new.o_totalprice AS new_o_totalprice
FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
WHERE CASE WHEN old.o_orderkey IS NULL THEN 'insert'
           WHEN new.o_orderkey IS NULL THEN 'delete'
           WHEN old.o_totalprice <> new.o_totalprice THEN 'update'
      END IS NOT NULL
"""


@query("snapshot_diff_cdc", oracle=SNAPSHOT_DIFF_ORACLE)
def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changeset between two deterministic snapshots of orders
    (operators/history.py): rows present only in the new snapshot are
    inserts, only in the old are deletes, shared keys with a null-safe
    value difference are updates; unchanged keys drop out. One
    full-outer shuffle join on the key."""
    from eligibility_etl_airflow_spark.operators import history

    o = Catalog(spark, sf_dir).orders
    old = o.filter(F.col("o_orderkey") % 7 != 0).select("o_orderkey", "o_totalprice")
    new = (
        o.filter(F.col("o_orderkey") % 5 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") + 1000.0)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    return history.snapshot_diff(old, new, ["o_orderkey"])


# --------------------------------------------------------------------------
# Incremental aggregate maintenance (operators/incremental.py)
# --------------------------------------------------------------------------

INCREMENTAL_ROLLUP_ORACLE = """
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(o_totalprice) AS BIGINT) AS count_o_totalprice,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_o_totalprice,
       min(o_totalprice) AS min_o_totalprice,
       max(o_totalprice) AS max_o_totalprice,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(o_totalprice), 6) AS avg_o_totalprice
FROM orders GROUP BY o_orderpriority
"""


@query("incremental_rollup", oracle=INCREMENTAL_ROLLUP_ORACLE)
def incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained per-priority rollup proven equal to the
    batch aggregate: state built from orders before 1996-01-01, the rest
    ingested as a delta through partial-agg + merge
    (operators/incremental.py), averages derived at read time. The
    oracle is the PLAIN one-shot GROUP BY over all orders — the whole
    point is that maintained state is indistinguishable from recompute.
    Money sums ride DECIMAL(18,2) so merge order cannot drift the total
    (float addition is non-associative; the incremental merge adds in a
    different order than a one-shot aggregate)."""
    from eligibility_etl_airflow_spark.operators import incremental

    measures = {"o_totalprice": ("count", "sum", "min", "max")}
    o = Catalog(spark, sf_dir).orders.select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
    )
    split = F.lit("1996-01-01").cast("date")
    state = incremental.aggregate_state(
        o.filter(F.col("o_orderdate") < split), ["o_orderpriority"], measures
    )
    updated = incremental.ingest_delta(
        state, o.filter(F.col("o_orderdate") >= split), ["o_orderpriority"], measures
    )
    final = incremental.finalize(updated, measures, avg_cols=["o_totalprice"])
    return final.select(
        "o_orderpriority",
        "n_rows",
        "count_o_totalprice",
        F.col("sum_o_totalprice").cast("double").alias("sum_o_totalprice"),
        F.col("min_o_totalprice").cast("double").alias("min_o_totalprice"),
        F.col("max_o_totalprice").cast("double").alias("max_o_totalprice"),
        F.round(F.col("avg_o_totalprice").cast("double"), 6).alias("avg_o_totalprice"),
    )


@query("heavy_hitters_sketch")
def heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters over order priorities
    (operators/sketches.py): one map-side sketch aggregate + a bounded
    seeded candidate sample — the 100 TB alternative to a full groupBy
    when key cardinality explodes. Rows-only (sketch estimates are
    error-bounded, not exact); the one-sided bound, no-missed-hitter
    guarantee, and determinism are pinned in tests/test_sketches.py."""
    from eligibility_etl_airflow_spark.operators import sketches

    o = Catalog(spark, sf_dir).orders
    return sketches.heavy_hitters(o, "o_orderpriority", min_share=0.05, eps=1e-3)


HEAVY_HITTERS_VERIFIED_ORACLE = """
WITH v AS (
  SELECT CAST(user_id AS VARCHAR) AS value FROM events
  WHERE user_id IS NOT NULL
),
n AS (SELECT count(*) AS n FROM v),
c AS (SELECT value, count(*) AS exact_count FROM v GROUP BY 1)
SELECT value,
       CAST(exact_count AS BIGINT) AS exact_count,
       round(exact_count * 1.0 / n.n, 6) AS exact_share
FROM c CROSS JOIN n
WHERE exact_count >= 0.007 * n.n
"""


@query("heavy_hitters_verified", oracle=HEAVY_HITTERS_VERIFIED_ORACLE)
def heavy_hitters_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-then-verify heavy hitters — the production two-phase shape
    and the oracle-gradable twin of ``heavy_hitters_sketch``: phase 1
    finds candidates with the Count-Min sketch (never under-counts, so
    candidates ⊇ true hitters; the seeded sample puts every ≥min_share
    value in the candidate set w.p. ≥ 1−e^−50), phase 2 joins the
    bounded candidate set back for EXACT counts and keeps only values
    whose exact frequency clears min_share. The exact filter trims the
    sketch's one-sided over-estimates, so the output equals the plain
    GROUP BY / HAVING truth — which is exactly what the DuckDB oracle
    computes. At 100 TB phase 2 touches only candidate keys (a broadcast
    semi-join), never a full-cardinality aggregate spill."""
    from eligibility_etl_airflow_spark.operators import sketches

    e = Catalog(spark, sf_dir).events
    min_share = 0.007
    cands = sketches.heavy_hitters(e, "user_id", min_share=min_share, eps=1e-3)
    vals = e.select(F.col("user_id").cast("string").alias("value")).where(
        F.col("value").isNotNull()
    )
    exact = vals.groupBy("value").agg(F.count(F.lit(1)).alias("exact_count"))
    n = vals.agg(F.count(F.lit(1)).alias("n"))
    return (
        exact.join(F.broadcast(cands.select("value")), "value")
        .crossJoin(F.broadcast(n))
        .filter(F.col("exact_count") >= min_share * F.col("n"))
        .select(
            "value",
            F.col("exact_count").cast("long").alias("exact_count"),
            F.round(F.col("exact_count") / F.col("n"), 6).alias("exact_share"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic train/test split + contiguous id assignment
# --------------------------------------------------------------------------

SPLIT_ORACLE = """
SELECT doc_id, lang,
       CASE WHEN doc_id IS NOT NULL
                 AND substring(md5('split-v1' || '|' || CAST(doc_id AS VARCHAR)), 1, 8)
                     < '19999999'
            THEN 'test' ELSE 'train' END AS split
FROM documents
"""


@query("train_test_split_hash", oracle=SPLIT_ORACLE)
def train_test_split_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free split by key hash (operators/sampling.py::
    assign_split): membership is a pure function of (seed, id), so it is
    stable across runs, engines, and incremental data arrival — unlike
    randomSplit, whose membership is a property of the run. 10% test via
    md5-prefix threshold (int(0.1 · 16^8) = 0x19999999 — the oracle
    literal must match the code's TRUNCATED int, not the rounded one),
    map-only."""
    from eligibility_etl_airflow_spark.operators import sampling

    d = Catalog(spark, sf_dir).documents.select("doc_id", "lang")
    return sampling.assign_split(d, "doc_id", test_frac=0.1)


CONTIG_IDS_ORACLE = """
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS row_id
FROM documents
"""


@query("contiguous_row_ids", oracle=CONTIG_IDS_ORACLE)
def contiguous_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense global row ids in key order (operators/sampling.py::
    assign_contiguous_ids) — zipWithIndex as DataFrame ops: range
    shuffle + per-partition counts (driver gets one scalar per
    partition) + partition-local row_number with broadcast offsets. No
    single-partition global sort."""
    from eligibility_etl_airflow_spark.operators import sampling

    d = Catalog(spark, sf_dir).documents.select("doc_id")
    return sampling.assign_contiguous_ids(d, ["doc_id"])


# --------------------------------------------------------------------------
# Data-quality constraint suite (Deequ-shaped, one-pass)
# --------------------------------------------------------------------------

QUALITY_SUITE_ORACLE = """
WITH t AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v1,
         CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                        OR o_totalprice > 600000 THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         CAST(sum(CASE WHEN o_orderstatus IS NULL
                        OR o_orderstatus NOT IN ('F','O','P')
                   THEN 1 ELSE 0 END) AS BIGINT) AS v3,
         CAST(sum(CASE WHEN o_orderpriority IS NULL
                        OR NOT regexp_matches(o_orderpriority, '^[1-5]-')
                   THEN 1 ELSE 0 END) AS BIGINT) AS v4,
         CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) AS v5
  FROM orders
)
SELECT rule, n_violations, n_rows, n_violations = 0 AS passed FROM (
  SELECT 'not_null(o_custkey)' AS rule, v1 AS n_violations, n AS n_rows FROM t
  UNION ALL SELECT 'in_range(o_totalprice,0,600000)', v2, n FROM t
  UNION ALL SELECT 'isin(o_orderstatus)', v3, n FROM t
  UNION ALL SELECT 'matches(o_orderpriority)', v4, n FROM t
  UNION ALL SELECT 'unique(o_orderkey)', v5, n FROM t
)
"""


@query("data_quality_report", oracle=QUALITY_SUITE_ORACLE)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-shaped constraint suite (operators/quality.py): five rules
    (completeness, range, membership, pattern, uniqueness) over orders —
    all row-level rules share ONE aggregate pass; the uniqueness rule
    rides the same aggregate as count-minus-count_distinct."""
    from eligibility_etl_airflow_spark.operators import quality as q

    o = Catalog(spark, sf_dir).orders
    return q.check(
        o,
        [
            q.not_null("o_custkey"),
            q.in_range("o_totalprice", 0, 600000),
            q.isin("o_orderstatus", ("F", "O", "P")),
            q.matches("o_orderpriority", "^[1-5]-"),
            q.unique("o_orderkey"),
        ],
    )


PROFILE_ORACLE = """
SELECT * FROM (
  SELECT 'o_orderkey' AS "column",
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
         CAST(min(o_orderkey) AS VARCHAR) AS min_value,
         CAST(max(o_orderkey) AS VARCHAR) AS max_value
  FROM orders
  UNION ALL
  SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(DISTINCT o_orderstatus) AS BIGINT),
         min(o_orderstatus), max(o_orderstatus)
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(DISTINCT o_orderpriority) AS BIGINT),
         min(o_orderpriority), max(o_orderpriority)
  FROM orders
)
"""


@query("column_profile", oracle=PROFILE_ORACLE)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profiling (operators/quality.py::profile): null
    counts, distinct cardinality, min/max — one aggregate pass for all
    columns. Graded with exact distincts; production default is the
    HLL approximation (same plan shape, sketch-mergeable)."""
    from eligibility_etl_airflow_spark.operators import quality as q

    o = Catalog(spark, sf_dir).orders
    return q.profile(
        o, ["o_orderkey", "o_orderstatus", "o_orderpriority"], exact_distinct=True
    )


WEIGHTED_SAMPLE_ORACLE = """
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars FROM (
  SELECT doc_id, n_chars,
         pow((CAST(('0x' || substring(md5('ws1' || '|' || CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) + 1) / 4294967297.0,
             1.0 / n_chars) AS wkey
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
)
ORDER BY wkey DESC, doc_id
LIMIT 50
"""


@query("weighted_sample_docs", oracle=WEIGHTED_SAMPLE_ORACLE)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (operators/sampling.py::
    weighted_sample_deterministic): 50 docs drawn ∝ length via
    hash-seeded Efraimidis–Spirakis keys — longer docs proportionally
    likelier, same draw every run and on both engines."""
    from eligibility_etl_airflow_spark.operators import sampling

    d = Catalog(spark, sf_dir).documents.select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars")
    )
    return sampling.weighted_sample_deterministic(d, "doc_id", "n_chars", k=50)
