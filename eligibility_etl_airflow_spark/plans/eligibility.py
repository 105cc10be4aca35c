"""Eligibility-pipeline plans re-expressed on the TPC-H-ish testdata.

Mirrors the reference's eligibility extraction+transform
(sql/eligibility_enhanced.sql:5-76, dags/eligibilty_etl.py:72-336):
a star of left joins to small dimensions, CASE decodes, concat_ws naming,
literal columns, a sliding time-window predicate relative to "now"
(parameterized to a fixed anchor — SURVEY.md §7.8), dedup, and a
quality-gate aggregate.

Scale notes (100 TB): orders is the fact side; customer/nation/region are
dimensions and are broadcast explicitly, so the whole flagship plan is a
single scan of the fact table with no shuffle. The window predicate and the
projected-column set both reach the parquet scan (PushedFilters/ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.catalog import Catalog
from eligibility_etl_airflow_spark.config import ORDERS_ANCHOR, RECENT_WINDOW_DAYS
from eligibility_etl_airflow_spark.registry import query

_WINDOW_START = f"timestamp'{ORDERS_ANCHOR}' - INTERVAL {RECENT_WINDOW_DAYS} DAYS"

# CASE decode mirrors the 16-branch marital / 5-branch id-type decodes
# (sql/eligibility_enhanced.sql:17-44).
_STATUS_DECODE = [("O", "open"), ("F", "finished"), ("P", "pending")]
_PRIORITY_DECODE = [
    ("1-URGENT", "urgent"),
    ("2-HIGH", "high"),
    ("3-MEDIUM", "medium"),
    ("4-NOT SPECIFIED", "unspecified"),
    ("5-LOW", "low"),
]


def _decode(col: str, pairs: list[tuple[str, str]], default: str):
    expr = F
    out = None
    for raw, label in pairs:
        cond = F.col(col) == raw
        out = F.when(cond, label) if out is None else out.when(cond, label)
    return out.otherwise(default)


FLAGSHIP_ORACLE = f"""
SELECT
  o.o_orderkey                         AS order_id,
  o.o_orderdate                        AS order_date,
  CAST(c.c_custkey AS BIGINT)          AS customer_id,
  concat_ws(' ', c.c_name, n.n_name)   AS customer_label,
  CASE o.o_orderstatus WHEN 'O' THEN 'open' WHEN 'F' THEN 'finished'
       WHEN 'P' THEN 'pending' ELSE 'unknown' END AS status_name,
  CASE o.o_orderpriority WHEN '1-URGENT' THEN 'urgent' WHEN '2-HIGH' THEN 'high'
       WHEN '3-MEDIUM' THEN 'medium' WHEN '4-NOT SPECIFIED' THEN 'unspecified'
       WHEN '5-LOW' THEN 'low' ELSE 'unknown' END AS priority_class,
  c.c_mktsegment                       AS segment,
  r.r_name                             AS region_name,
  1                                    AS organization_code,
  'ANDALUSIA'                          AS organization_name,
  o.o_totalprice                       AS total_price
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '{ORDERS_ANCHOR}' - INTERVAL {RECENT_WINDOW_DAYS} DAY
  AND o.o_orderstatus <> 'P'
"""


@query("eligibility_flagship", oracle=FLAGSHIP_ORACLE)
def recent_orders_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: recent-orders enrichment (eligibility_enhanced.sql analog).

    Operators: P1 wide projection w/ literals, P4 flag predicate, P5 sliding
    window predicate, J1 left-join star (broadcast dims), F1 concat name,
    F2 CASE decodes (sql/eligibility_enhanced.sql:5-76).
    """
    cat = Catalog(spark, sf_dir)
    o, c, n, r = cat.orders, cat.customer, cat.nation, cat.region

    return (
        o.filter(F.col("o_orderdate") >= F.expr(_WINDOW_START))
        .filter(F.col("o_orderstatus") != "P")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_orderdate").alias("order_date"),
            F.col("c_custkey").cast("long").alias("customer_id"),
            F.concat_ws(" ", F.col("c_name"), F.col("n_name")).alias("customer_label"),
            _decode("o_orderstatus", _STATUS_DECODE, "unknown").alias("status_name"),
            _decode("o_orderpriority", _PRIORITY_DECODE, "unknown").alias("priority_class"),
            F.col("c_mktsegment").alias("segment"),
            F.col("r_name").alias("region_name"),
            F.lit(1).alias("organization_code"),
            F.lit("ANDALUSIA").alias("organization_name"),
            F.col("o_totalprice").alias("total_price"),
        )
    )


QUALITY_GATE_ORACLE = f"""
SELECT
  CAST(count(*) AS BIGINT) AS total_rows,
  CAST(sum(CASE WHEN r.r_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS invalid_rows,
  round(sum(CASE WHEN r.r_name IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 4)
      AS invalid_ratio,
  CASE WHEN sum(CASE WHEN r.r_name IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*) >= 0.5
       THEN 1 ELSE 0 END AS gate_tripped
FROM orders o
LEFT JOIN customer c ON o.o_custkey = c.c_custkey
LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '{ORDERS_ANCHOR}' - INTERVAL {RECENT_WINDOW_DAYS} DAY
"""


@query("eligibility_quality_gate", oracle=QUALITY_GATE_ORACLE)
def quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-gate aggregate (P13): invalid-ratio + abort flag.

    Mirrors the >=50%-null-class load abort (dags/eligibilty_etl.py:280-321)
    as a single partial-aggregatable pass — at scale this is one map-side
    combine + one tiny shuffle, never a collect.
    """
    cat = Catalog(spark, sf_dir)
    o, c, n, r = cat.orders, cat.customer, cat.nation, cat.region

    joined = (
        o.filter(F.col("o_orderdate") >= F.expr(_WINDOW_START))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
    )
    invalid = F.sum(F.when(F.col("r_name").isNull(), 1).otherwise(0))
    total = F.count(F.lit(1))
    return joined.agg(
        total.cast("long").alias("total_rows"),
        invalid.cast("long").alias("invalid_rows"),
        F.round(invalid * 1.0 / total, 4).alias("invalid_ratio"),
        F.when(invalid * 1.0 / total >= 0.5, 1).otherwise(0).alias("gate_tripped"),
    )
