"""Resubmission-pipeline plans on the TPC-H-ish testdata.

Mirrors sql/resubmission.sql (the reference's most complex query): two
DISTINCT key-set CTEs with LIKE filters (lines 2-25), a DENSE_RANK
latest-claim-request derived table (54-68), joins to claim items and two
pre-aggregated STRING_AGG subqueries (71-108), a semi-join against the
key set, and a UNION ALL of the medical-necessity and drug-interaction
branches (117) — here: orders ≙ claim transactions, lineitem ≙ claim
items, part names ≙ diagnosis strings.

Scale notes: the key-set CTEs are filtered-distinct aggregates that stay
small → broadcast into left_semi joins (semi-join reduction before the
wide join, the same optimization the reference hand-codes). The window
dedup shuffles once on the customer key; the string-agg subquery
pre-aggregates before joining (partial agg on the map side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.catalog import Catalog
from eligibility_etl_airflow_spark.registry import query

RESUBMISSION_ORACLE = """
WITH mn1_keys AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
),
drug_keys AS (
  SELECT DISTINCT l_orderkey FROM lineitem
  WHERE l_returnflag = 'R' AND l_tax > 0.05
),
latest AS (
  SELECT * FROM (
    SELECT o_orderkey, o_custkey, o_orderdate, o_orderstatus, o_orderpriority,
           DENSE_RANK() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
),
diag AS (
  SELECT l_orderkey,
         string_agg(DISTINCT p.p_name, ' , ' ORDER BY p.p_name) AS diagnosis_names
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY l_orderkey
)
SELECT * FROM (
  SELECT lt.o_orderkey                    AS request_id,
         CAST(lt.o_custkey AS BIGINT)     AS customer_id,
         lt.o_orderdate                   AS request_date,
         li.l_linenumber                  AS sequence,
         li.l_partkey                     AS service_id,
         li.l_extendedprice               AS service_price,
         li.l_returnflag                  AS response_state,
         d.diagnosis_names                AS diagnosis_names,
         'Medical Necessity'              AS justification_type
  FROM latest lt
  JOIN lineitem li ON li.l_orderkey = lt.o_orderkey
  LEFT JOIN diag d ON d.l_orderkey = lt.o_orderkey
  WHERE lt.o_custkey IN (SELECT o_custkey FROM mn1_keys)
    AND li.l_returnflag IN ('A', 'R')

  UNION ALL

  SELECT lt.o_orderkey                    AS request_id,
         CAST(lt.o_custkey AS BIGINT)     AS customer_id,
         lt.o_orderdate                   AS request_date,
         li.l_linenumber                  AS sequence,
         li.l_partkey                     AS service_id,
         li.l_extendedprice               AS service_price,
         li.l_returnflag                  AS response_state,
         d.diagnosis_names                AS diagnosis_names,
         'Drug Interaction'               AS justification_type
  FROM latest lt
  JOIN lineitem li ON li.l_orderkey = lt.o_orderkey
  LEFT JOIN diag d ON d.l_orderkey = lt.o_orderkey
  WHERE lt.o_orderkey IN (SELECT l_orderkey FROM drug_keys)
    AND li.l_linestatus <> 'O'
)
"""


@query("resubmission_flagship", oracle=RESUBMISSION_ORACLE)
def resubmission_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full resubmission.sql shape: key-set CTEs → latest-request window
    dedup → item join → string-agg join → semi-join → UNION ALL branches."""
    cat = Catalog(spark, sf_dir)
    o, l, p = cat.orders, cat.lineitem, cat.part

    mn1_keys = (
        o.filter(F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"))
        .select("o_custkey")
        .distinct()
    )
    drug_keys = (
        l.filter((F.col("l_returnflag") == "R") & (F.col("l_tax") > 0.05))
        .select("l_orderkey")
        .distinct()
    )

    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    latest = (
        o.withColumn("rn", F.dense_rank().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )

    diag = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_orderkey")
        .agg(
            F.concat_ws(" , ", F.array_sort(F.collect_set("p_name"))).alias("diagnosis_names")
        )
        .withColumnRenamed("l_orderkey", "diag_orderkey")
    )

    def branch(base: DataFrame, jtype: str) -> DataFrame:
        return base.select(
            F.col("o_orderkey").alias("request_id"),
            F.col("o_custkey").cast("long").alias("customer_id"),
            F.col("o_orderdate").alias("request_date"),
            F.col("l_linenumber").cast("int").alias("sequence"),
            F.col("l_partkey").alias("service_id"),
            F.col("l_extendedprice").alias("service_price"),
            F.col("l_returnflag").alias("response_state"),
            F.col("diagnosis_names"),
            F.lit(jtype).alias("justification_type"),
        )

    items = latest.join(l, F.col("l_orderkey") == F.col("o_orderkey")).join(
        diag, F.col("diag_orderkey") == F.col("o_orderkey"), "left"
    )

    mn_branch = branch(
        items.join(F.broadcast(mn1_keys), "o_custkey", "left_semi").filter(
            F.col("l_returnflag").isin("A", "R")
        ),
        "Medical Necessity",
    )
    drug_branch = branch(
        items.join(F.broadcast(drug_keys), "l_orderkey", "left_semi").filter(
            F.col("l_linestatus") != "O"
        ),
        "Drug Interaction",
    )
    return mn_branch.unionByName(drug_branch)


# --------------------------------------------------------------------------
# P9/P10 — conditional business-rule update + cross-generation coalesce
# (dags/eligibilty_etl.py:226-227 "1680 " → out-network;
#  src/eligibility.py:158-176 name_conflict)
# --------------------------------------------------------------------------

BUSINESS_RULES_ORACLE = """
SELECT o_orderkey AS order_id,
       coalesce(c.c_name, 'UNKNOWN#' || CAST(o.o_custkey AS VARCHAR)) AS customer_name,
       CASE WHEN o.o_orderpriority = '1-URGENT' AND c.c_name IS NULL
            THEN 'out-network'
            WHEN o.o_orderpriority = '5-LOW' AND c.c_name IS NULL
            THEN 'not-active'
            ELSE coalesce(c.c_mktsegment, 'unclassified') END AS coverage_class
FROM orders o
LEFT JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_acctbal > 0
"""


@query("business_rule_updates", oracle=BUSINESS_RULES_ORACLE)
def business_rule_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9/P10: null-conditional business rules (`df.loc[cond, col] = v`) and
    coalesce-with-default as pure column expressions — no row mutation."""
    cat = Catalog(spark, sf_dir)
    o, c = cat.orders, cat.customer
    cf = c.filter(F.col("c_acctbal") > 0)
    return (
        o.join(F.broadcast(cf), cf.c_custkey == o.o_custkey, "left")
        .select(
            F.col("o_orderkey").alias("order_id"),
            F.coalesce(
                F.col("c_name"), F.concat(F.lit("UNKNOWN#"), F.col("o_custkey").cast("string"))
            ).alias("customer_name"),
            F.when(
                (F.col("o_orderpriority") == "1-URGENT") & F.col("c_name").isNull(),
                "out-network",
            )
            .when(
                (F.col("o_orderpriority") == "5-LOW") & F.col("c_name").isNull(),
                "not-active",
            )
            .otherwise(F.coalesce(F.col("c_mktsegment"), F.lit("unclassified")))
            .alias("coverage_class"),
        )
    )
