"""Relational core — every T-SQL / pandas relational operator from
SURVEY.md §2 re-expressed as a Catalyst-native DataFrame plan on the
TPC-H-ish testdata.

Scale stance: no query here collects to the driver; every aggregation is
partial-aggregatable (map-side combine), every dimension join is broadcast,
every window partitions by a high-cardinality key so state is bounded per
task. Filters and projections are expressed declaratively so they reach the
parquet scan (PushedFilters / ReadSchema).

Determinism: pandas `keep="last"` / "first row of group" semantics in the
reference are row-order-dependent (SURVEY.md §7.8); every dedup/top-1 here
takes an explicit ordering key so results are reproducible and oracle-
matchable. String aggregation is sorted (`array_sort` → `concat_ws`) to
match `string_agg(... ORDER BY ...)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.catalog import Catalog
from eligibility_etl_airflow_spark.config import ORDERS_ANCHOR
from eligibility_etl_airflow_spark.registry import query


def _dec(col: str):
    """Exact money arithmetic: decimal, not float, so Spark's partial
    aggregation order can't drift from the oracle's serial sum."""
    return F.col(col).cast("decimal(18,2)")


# --------------------------------------------------------------------------
# P4/P6/P7/P8 — flag, IN-list, LIKE / NOT LIKE, date-window predicates
# (eligibility_enhanced.sql:70-75; resubmission.sql:5-23, 66-67;
#  resubmission_update.sql:51-74, 220-224)
# --------------------------------------------------------------------------

PREDICATES_ORACLE = """
SELECT o_orderkey AS order_id,
       o_orderpriority AS priority,
       o_orderstatus AS status,
       o_orderdate AS order_date
FROM orders
WHERE o_orderstatus <> 'P'
  AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
  AND o_orderpriority NOT LIKE '%MEDIUM%'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
  AND o_totalprice > 1000.0
"""


@query("predicates_in_like_window", oracle=PREDICATES_ORACLE)
def predicates_in_like_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 flag filters + P8 IN-list + P7 NOT LIKE + P6 date window.

    All five predicates fold into one parquet-scan filter
    (PushedFilters) — zero shuffle, zero post-scan work at 100 TB.
    """
    o = Catalog(spark, sf_dir).orders
    return (
        o.filter(F.col("o_orderstatus") != "P")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM"))
        .filter(~F.col("o_orderpriority").like("%MEDIUM%"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        )
        .filter(F.col("o_totalprice") > 1000.0)
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderdate").alias("order_date"),
        )
    )


# --------------------------------------------------------------------------
# J4/J8 — semi-join via key set (resubmission.sql:2-25, 74-75)
# J7 — anti-join resume (eligibility_recovery.py:281; run_predictions.py:224)
# --------------------------------------------------------------------------

SEMI_JOIN_ORACLE = """
SELECT CAST(c_custkey AS BIGINT) AS customer_id, c_name AS customer_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderpriority LIKE '1-%'
    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
)
"""


@query("semi_join_key_set", oracle=SEMI_JOIN_ORACLE)
def semi_join_key_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: semi-join reduction via a filtered DISTINCT key set.

    The reference builds CTE key-sets then INNER JOINs them
    (resubmission.sql:2-25); left_semi expresses intent directly and
    never duplicates rows. The filtered key set is small → broadcast.
    """
    cat = Catalog(spark, sf_dir)
    keys = cat.orders.filter(
        F.col("o_orderpriority").like("1-%")
        & (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    ).select("o_custkey")
    return (
        cat.customer.join(
            F.broadcast(keys),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        ).select(
            F.col("c_custkey").cast("long").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
        )
    )


ANTI_JOIN_ORACLE = """
SELECT o_orderkey AS order_id, CAST(o_custkey AS BIGINT) AS customer_id
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey
)
"""


@query("anti_join_resume", oracle=ANTI_JOIN_ORACLE)
def anti_join_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7: anti-join — the engine's resume/skip-processed primitive.

    Replaces the reference's driver-side ``~isin(processed_ids)`` set
    (run_predictions.py:224-225) with a distributed left_anti join, the
    only form that survives a processed-set larger than driver memory.
    """
    cat = Catalog(spark, sf_dir)
    return cat.orders.join(
        cat.lineitem.select("l_orderkey"), F.col("o_orderkey") == F.col("l_orderkey"), "left_anti"
    ).select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").cast("long").alias("customer_id"),
    )


# --------------------------------------------------------------------------
# J2 — join with coalesce-expression key + constant predicate
# (eligibility_enhanced.sql:69: ContractorID = ISNULL(ParentID, ID) AND GateWayID = 3)
# --------------------------------------------------------------------------

COALESCE_KEY_ORACLE = """
SELECT l.l_orderkey AS order_id,
       l.l_linenumber AS line_no,
       s.s_name AS supplier_name,
       CAST(s.s_nationkey AS BIGINT) AS supplier_nation
FROM lineitem l
JOIN supplier s
  ON s.s_suppkey = coalesce(l.l_suppkey, l.l_partkey)
 AND s.s_nationkey < 20
WHERE l.l_returnflag = 'R'
"""


@query("coalesce_key_join", oracle=COALESCE_KEY_ORACLE)
def coalesce_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: inner join on a COALESCE expression key + constant predicate."""
    cat = Catalog(spark, sf_dir)
    l, s = cat.lineitem, cat.supplier
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(
            F.broadcast(s),
            (s.s_suppkey == F.coalesce(l.l_suppkey, l.l_partkey)) & (s.s_nationkey < 20),
            "inner",
        )
        .select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_linenumber").cast("int").alias("line_no"),
            F.col("s_name").alias("supplier_name"),
            F.col("s_nationkey").cast("long").alias("supplier_nation"),
        )
    )


# --------------------------------------------------------------------------
# W1/W2 — latest-record-per-group window dedup (resubmission.sql:60-68;
# resubmission_update.sql:87-91) — the reference's most load-bearing pattern
# --------------------------------------------------------------------------

LATEST_DENSE_ORACLE = """
SELECT * FROM (
  SELECT CAST(o_custkey AS BIGINT) AS customer_id,
         o_orderkey AS order_id,
         o_orderdate AS order_date,
         o_totalprice AS total_price,
         DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC) AS rn
  FROM orders
) WHERE rn = 1
"""


@query("latest_order_dense_rank", oracle=LATEST_DENSE_ORACLE)
def latest_order_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: DENSE_RANK latest-per-group (ties kept, as in resubmission.sql:60-68).

    Partition key is the high-cardinality customer key, so per-task window
    state stays bounded at any scale; one shuffle on the partition key.
    """
    o = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"))
    return (
        o.withColumn("rn", F.dense_rank().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").cast("long").alias("customer_id"),
            F.col("o_orderkey").alias("order_id"),
            F.col("o_orderdate").alias("order_date"),
            F.col("o_totalprice").alias("total_price"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


LATEST_ROWNUM_ORACLE = """
SELECT * FROM (
  SELECT CAST(o_custkey AS BIGINT) AS customer_id,
         o_orderkey AS order_id,
         o_orderdate AS order_date,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
"""


@query("latest_order_row_number", oracle=LATEST_ROWNUM_ORACLE)
def latest_order_row_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: ROW_NUMBER latest-per-group with deterministic tie-break
    (resubmission_update.sql:87-91 adds ``ID DESC`` for exactly this)."""
    o = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").cast("long").alias("customer_id"),
            F.col("o_orderkey").alias("order_id"),
            F.col("o_orderdate").alias("order_date"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


# --------------------------------------------------------------------------
# A1 — grouped string aggregation (resubmission.sql:78-90 STRING_AGG)
# --------------------------------------------------------------------------

STRING_AGG_ORACLE = """
SELECT l.l_orderkey AS order_id,
       string_agg(p.p_name, ' , ' ORDER BY p.p_name) AS part_names,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY l.l_orderkey
"""


@query("string_agg_per_group", oracle=STRING_AGG_ORACLE)
def string_agg_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: STRING_AGG per key. The reference's T-SQL version has no WITHIN
    GROUP ordering (nondeterministic, SURVEY.md §7.8); the engine
    standardizes on sorted aggregation: collect_list → array_sort →
    concat_ws, which partial-aggregates and matches
    ``string_agg(... ORDER BY ...)`` exactly."""
    cat = Catalog(spark, sf_dir)
    return (
        cat.lineitem.join(F.broadcast(cat.part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_orderkey")
        .agg(
            F.concat_ws(" , ", F.array_sort(F.collect_list("p_name"))).alias("part_names"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.col("l_orderkey").alias("order_id"),
            "part_names",
            F.col("n_items").cast("long").alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# A2/U6 — DISTINCT key sets; A3 count distinct
# --------------------------------------------------------------------------

DISTINCT_KEYS_ORACLE = """
SELECT DISTINCT CAST(o_custkey AS BIGINT) AS customer_id
FROM orders
WHERE o_orderpriority LIKE '1-%'
"""


@query("distinct_key_set", oracle=DISTINCT_KEYS_ORACLE)
def distinct_key_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/U6: filtered DISTINCT key extraction (resubmission.sql:2-11 CTEs)."""
    o = Catalog(spark, sf_dir).orders
    return (
        o.filter(F.col("o_orderpriority").like("1-%"))
        .select(F.col("o_custkey").cast("long").alias("customer_id"))
        .distinct()
    )


# --------------------------------------------------------------------------
# A4/A5/A6 — top-k frequency, null counts, KPI scalars
# --------------------------------------------------------------------------

TOPK_ORACLE = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
ORDER BY n DESC, event_type ASC
LIMIT 3
"""


@query("topk_frequency", oracle=TOPK_ORACLE)
def topk_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/O3: top-k frequency table (``value_counts().head``,
    dags/eligibilty_etl.py:306) with a deterministic tie-break."""
    e = Catalog(spark, sf_dir).events
    return (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"))
        .limit(3)
    )


KPI_ORACLE = f"""
SELECT
  CAST(count(*) AS BIGINT)                                   AS n_rows,
  CAST(count(DISTINCT l_orderkey) AS BIGINT)                 AS n_orders,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)      AS total_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        / count(*), 4)                                       AS avg_price,
  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{ORDERS_ANCHOR}' - INTERVAL 2000 DAY
"""


@query("kpi_scalar_aggs", oracle=KPI_ORACLE)
def kpi_scalar_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A5/A6: KPI scalars (analysis.py:16-32) in one pass.

    Money sums go through DECIMAL so the result is exact regardless of
    partial-aggregation order — float sums would drift from the oracle's
    serial sum at 100 TB row counts. count(DISTINCT) is exact here; the
    documented scale path is approx_count_distinct when 2% error is fine.
    """
    l = Catalog(spark, sf_dir).lineitem
    filtered = l.filter(
        F.col("l_shipdate") >= F.expr(f"timestamp'{ORDERS_ANCHOR}' - INTERVAL 2000 DAYS")
    )
    total_price = F.sum(_dec("l_extendedprice"))
    return filtered.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
        F.round(total_price.cast("double"), 2).alias("total_price"),
        F.round(F.sum(_dec("l_quantity")).cast("double"), 2).alias("total_qty"),
        F.round(total_price.cast("double") / F.count(F.lit(1)), 4).alias("avg_price"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).cast("long").alias("n_returned"),
    )


# --------------------------------------------------------------------------
# A7 — group-by-date rollup (analysis.py:52-57)
# --------------------------------------------------------------------------

DATE_ROLLUP_ORACLE = """
SELECT date_trunc('day', ts) AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
FROM events
GROUP BY 1
"""


@query("date_rollup_daily", oracle=DATE_ROLLUP_ORACLE)
def date_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: daily rollup — the batch twin of a tumbling 1-day window."""
    e = Catalog(spark, sf_dir).events
    return (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.round(F.sum(_dec("value")).cast("double"), 2).alias("total_value"),
        )
    )


# --------------------------------------------------------------------------
# A8 — grouped multi-agg with set collection (predicitions_analysis.ipynb)
# --------------------------------------------------------------------------

MULTI_AGG_ORACLE = """
SELECT CAST(o_custkey AS BIGINT) AS customer_id,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
       string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS status_set,
       min(o_orderdate) AS first_order,
       max(o_orderdate) AS last_order,
       CAST(date_diff('day', min(o_orderdate), max(o_orderdate)) AS BIGINT) AS span_days
FROM orders
GROUP BY o_custkey
"""


@query("grouped_multi_agg", oracle=MULTI_AGG_ORACLE)
def grouped_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: conflict-detection aggregate — count distinct, sorted set
    collection, min/max timestamps and their difference."""
    o = Catalog(spark, sf_dir).orders
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.countDistinct("o_orderstatus").cast("long").alias("n_statuses"),
            F.concat_ws(",", F.array_sort(F.collect_set("o_orderstatus"))).alias("status_set"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
            F.datediff(F.max("o_orderdate"), F.min("o_orderdate")).cast("long").alias("span_days"),
        )
        .select(
            F.col("o_custkey").cast("long").alias("customer_id"),
            "n_orders", "n_statuses", "status_set", "first_order", "last_order", "span_days",
        )
    )


# --------------------------------------------------------------------------
# U4 — keep-last dedup with explicit ordering key (eligibilty_etl.py:146)
# --------------------------------------------------------------------------

KEEP_LAST_ORACLE = """
SELECT order_id, part_id, line_no, qty FROM (
  SELECT l_orderkey AS order_id,
         l_partkey AS part_id,
         l_linenumber AS line_no,
         l_quantity AS qty,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_partkey
                            ORDER BY l_linenumber DESC, l_suppkey DESC) AS rn
  FROM lineitem
) WHERE rn = 1
"""


@query("keep_last_dedup", oracle=KEEP_LAST_ORACLE)
def keep_last_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: pandas ``drop_duplicates(keep="last")`` made deterministic.

    The reference's version depends on arrival order (SURVEY.md §7.8); the
    engine requires an explicit ordering key (line number) and implements
    keep-last as a row_number window — reproducible on any cluster layout.
    """
    from eligibility_etl_airflow_spark.operators.dedup import keep_last

    l = Catalog(spark, sf_dir).lineitem
    # l_linenumber alone is NOT a total order here (sf0.01 has a genuine
    # tie: two rows of order 6150 / part 1782 both at line 7) — exactly the
    # SURVEY.md §7.8 hazard this operator exists to prevent. Tie-break on
    # l_suppkey to make the ordering total.
    out = keep_last(
        l,
        keys=["l_orderkey", "l_partkey"],
        order_by=[F.col("l_linenumber"), F.col("l_suppkey")],
    )
    return out.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_partkey").alias("part_id"),
        F.col("l_linenumber").cast("int").alias("line_no"),
        F.col("l_quantity").alias("qty"),
    )


# --------------------------------------------------------------------------
# U5 — duplicate detection & labeling (predictions.py:244-253)
# --------------------------------------------------------------------------

DUP_DETECT_ORACLE = """
SELECT order_id, part_id, line_no, dup_label FROM (
  SELECT l_orderkey AS order_id,
         l_partkey AS part_id,
         l_linenumber AS line_no,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_partkey, l_quantity
                                      ORDER BY l_linenumber ASC) > 1
              THEN 'Duplicated Service' ELSE 'ok' END AS dup_label
  FROM lineitem
)
WHERE dup_label = 'Duplicated Service'
"""


@query("duplicate_detection_label", oracle=DUP_DETECT_ORACLE)
def duplicate_detection_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5/G3: keep-first duplicate labeling — the outpatient duplicate
    auto-reject rewritten as a pure window expression (no set differences
    on the driver, predictions.py:244-253)."""
    l = Catalog(spark, sf_dir).lineitem
    w = Window.partitionBy("l_orderkey", "l_partkey", "l_quantity").orderBy(F.asc("l_linenumber"))
    return (
        l.withColumn(
            "dup_label",
            F.when(F.row_number().over(w) > 1, "Duplicated Service").otherwise("ok"),
        )
        .filter(F.col("dup_label") == "Duplicated Service")
        .select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_partkey").alias("part_id"),
            F.col("l_linenumber").cast("int").alias("line_no"),
            "dup_label",
        )
    )


# --------------------------------------------------------------------------
# O1/O2 — global sort + limit (eligibility_enhanced.sql:76;
# resubmission_update.sql:97 TOP 100)
# --------------------------------------------------------------------------

TOP100_ORACLE = """
SELECT o_orderkey AS order_id, o_totalprice AS total_price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


@query("global_topk_orders", oracle=TOP100_ORACLE)
def global_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2: global top-k. Spark executes this as TakeOrderedAndProject —
    per-partition heaps + driver merge of k rows, not a full sort — exactly
    the plan you want for TOP 100 over 100 TB."""
    o = Catalog(spark, sf_dir).orders
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select(F.col("o_orderkey").alias("order_id"), F.col("o_totalprice").alias("total_price"))
    )


# --------------------------------------------------------------------------
# F4 — multi-format date normalization (eligibility.py:297-314 change_date)
# --------------------------------------------------------------------------

MULTIFMT_ORACLE = """
SELECT order_id, raw_date,
       strftime(coalesce(try_strptime(raw_date, '%Y-%m-%d %H:%M:%S'),
                         try_strptime(raw_date, '%d/%m/%Y')), '%Y-%m-%d') AS parsed_date
FROM (
  SELECT o_orderkey AS order_id,
         CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
              WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%d/%m/%Y')
              ELSE 'not a date' END AS raw_date
  FROM orders
)
"""


@query("multi_format_date_parse", oracle=MULTIFMT_ORACLE)
def multi_format_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: try-each-format date parsing with NULL on failure — the
    change_date ladder (strip fractional, try several formats) as a
    coalesce of try_to_timestamp calls; pure codegen, no UDF."""
    from eligibility_etl_airflow_spark.functions.scalar import parse_date_multi

    o = Catalog(spark, sf_dir).orders
    raw = o.select(
        F.col("o_orderkey").alias("order_id"),
        F.when(F.col("o_orderkey") % 3 == 0, F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss"))
        .when(F.col("o_orderkey") % 3 == 1, F.date_format("o_orderdate", "dd/MM/yyyy"))
        .otherwise("not a date")
        .alias("raw_date"),
    )
    return raw.withColumn(
        "parsed_date",
        F.date_format(
            parse_date_multi(F.col("raw_date"), ["yyyy-MM-dd HH:mm:ss", "dd/MM/yyyy"]),
            "yyyy-MM-dd",
        ),
    )


# --------------------------------------------------------------------------
# F6 — birthday-corrected age (resubmission_update.sql:123-139)
# --------------------------------------------------------------------------

AGE_ORACLE = f"""
SELECT CAST(c_custkey AS BIGINT) AS customer_id,
       first_order,
       CAST(
         date_part('year', TIMESTAMP '{ORDERS_ANCHOR}') - date_part('year', first_order)
         - CASE WHEN (date_part('month', TIMESTAMP '{ORDERS_ANCHOR}'),
                      date_part('day', TIMESTAMP '{ORDERS_ANCHOR}'))
                     < (date_part('month', first_order), date_part('day', first_order))
                THEN 1 ELSE 0 END
       AS BIGINT) AS account_age_years
FROM (
  SELECT c_custkey, min(o_orderdate) AS first_order
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c_custkey
)
"""


@query("age_birthday_corrected", oracle=AGE_ORACLE)
def age_birthday_corrected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6: age with birthday correction — the resubmission_update.sql
    rewrite of the naive DATEDIFF(YEAR) age (which overcounts before the
    birthday). Anchored to the deterministic ORDERS_ANCHOR."""
    from eligibility_etl_airflow_spark.functions.scalar import age_years

    cat = Catalog(spark, sf_dir)
    first = (
        cat.customer.join(cat.orders, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey")
        .agg(F.min("o_orderdate").alias("first_order"))
    )
    anchor = F.lit(ORDERS_ANCHOR).cast("timestamp")
    return first.select(
        F.col("c_custkey").cast("long").alias("customer_id"),
        F.col("first_order"),
        age_years(F.col("first_order"), anchor).alias("account_age_years"),
    )


# --------------------------------------------------------------------------
# F10/F12 — regex + key normalization (predictions.py:170-191; notebook J9)
# --------------------------------------------------------------------------

REGEX_ORACLE = r"""
SELECT doc_id,
       regexp_extract(text, '([a-z]+)', 1) AS first_word,
       CASE WHEN regexp_matches(text, '\bspark\b') THEN 1 ELSE 0 END AS mentions_spark,
       lower(trim(source)) AS source_norm,
       regexp_replace(text, '\s+', ' ', 'g') AS text_collapsed
FROM documents
WHERE regexp_matches(text, '\b(join|window)\b')
"""


@query("regex_text_ops", oracle=REGEX_ORACLE)
def regex_text_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10-F12: regexp extract / rlike / normalize — the markdown-fence and
    id:reason regex family (predictions.py:170-191) over real text."""
    d = Catalog(spark, sf_dir).documents
    return (
        d.filter(F.col("text").rlike(r"\b(join|window)\b"))
        .select(
            "doc_id",
            F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
            F.when(F.col("text").rlike(r"\bspark\b"), 1).otherwise(0).alias("mentions_spark"),
            F.lower(F.trim(F.col("source"))).alias("source_norm"),
            F.regexp_replace("text", r"\s+", " ").alias("text_collapsed"),
        )
    )


# --------------------------------------------------------------------------
# F11 — split & explode multi-key strings (predictions.py:133-167)
# --------------------------------------------------------------------------

SPLIT_EXPLODE_ORACLE = """
SELECT order_id, CAST(trim(part_token) AS BIGINT) AS part_id
FROM (
  SELECT l_orderkey AS order_id,
         string_agg(CAST(l_partkey AS VARCHAR), ', ') AS keys_csv
  FROM lineitem
  GROUP BY l_orderkey
), UNNEST(string_split(keys_csv, ',')) AS t(part_token)
"""


@query("split_explode_keys", oracle=SPLIT_EXPLODE_ORACLE)
def split_explode_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11/UDTF: '"id1, id2": reason' fan-out — build a CSV key string per
    group, then explode(split(...)) + trim + cast, one row per id
    (validate_keys, predictions.py:133-167)."""
    l = Catalog(spark, sf_dir).lineitem
    csv = l.groupBy(F.col("l_orderkey").alias("order_id")).agg(
        F.concat_ws(", ", F.collect_list(F.col("l_partkey").cast("string"))).alias("keys_csv")
    )
    return csv.select(
        "order_id",
        F.explode_outer(F.split("keys_csv", ",")).alias("part_token"),
    ).select("order_id", F.trim("part_token").cast("long").alias("part_id"))


# --------------------------------------------------------------------------
# UDTF-like — map→rows explosion (Rejected/Justifications dicts,
# predictions.py:350-360; resubmission.py:176-179)
# --------------------------------------------------------------------------

MAP_EXPLODE_ORACLE = """
SELECT o_orderkey AS order_id, 'status' AS field, o_orderstatus AS value
FROM orders
UNION ALL
SELECT o_orderkey AS order_id, 'priority' AS field, o_orderpriority AS value
FROM orders
"""


@query("map_explode_fields", oracle=MAP_EXPLODE_ORACLE)
def map_explode_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 UDTF-like: the reference turns per-visit dict columns
    (Rejected / Justifications) into rows with pandas loops; here the
    dict is a first-class MAP column and the fan-out is
    ``explode(map_col)`` — generator, map-side, no shuffle."""
    o = Catalog(spark, sf_dir).orders
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return o.select(
        F.col("o_orderkey").alias("order_id"),
        F.explode_outer(m).alias("field", "value"),
    )


# --------------------------------------------------------------------------
# N-family basic — JSON field extraction on events.props
# --------------------------------------------------------------------------

JSON_PROPS_ORACLE = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
            THEN 'high' ELSE 'low' END AS k_band
FROM events
WHERE json_extract_string(props, '$.k') IS NOT NULL
"""


@query("json_field_extract", oracle=JSON_PROPS_ORACLE)
def json_field_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N1-analog: JSON field extraction from a string column with a
    downstream CASE — get_json_object stays JVM-side (no UDF)."""
    e = Catalog(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.filter(k.isNotNull())
        .select(
            "event_id",
            k.alias("k_value"),
            F.when(k >= 50, "high").otherwise("low").alias("k_band"),
        )
    )


# --------------------------------------------------------------------------
# U3/N3 — struct build + expansion (eligibility.py:246-248 apply(pd.Series))
# --------------------------------------------------------------------------

STRUCT_EXPAND_ORACLE = """
SELECT o_orderkey AS order_id,
       o_orderstatus AS status,
       o_totalprice AS price,
       CAST(year(o_orderdate) AS BIGINT) AS order_year
FROM orders
WHERE o_orderstatus = 'O'
"""


@query("struct_expand", oracle=STRUCT_EXPAND_ORACLE)
def struct_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3/N3: pack columns into a struct, then expand struct.* back to
    columns — the columnar equivalent of ``apply(pd.Series)`` expansion."""
    o = Catalog(spark, sf_dir).orders
    packed = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("order_id"),
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        ).alias("packed"),
    )
    return packed.select("order_id", "packed.*")
