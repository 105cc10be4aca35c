"""FHIR nested-JSON extraction queries (SURVEY.md §2.9).

Test vehicle: a deterministic FHIR eligibility bundle is synthesized per
orders row (payer, outcome, benefits all derived from order columns per
FIXTURES.md §2), then parsed back through the schema-first extractors in
``functions/fhir.py``. The DuckDB oracle computes the expected outputs
DIRECTLY from the generating columns — so parity proves
``extract(construct(x)) == truth(x)``: a wrong filter/flatten/dispatch in
the parser cannot cancel out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.catalog import Catalog
from eligibility_etl_airflow_spark.functions import fhir
from eligibility_etl_airflow_spark.registry import query

_PAYER_URLS = [
    "https://tawuniya.com.sa/eligibility",  # typed-benefit path (N8)
    "https://www.malath.com.sa/eligibility",  # costToBeneficiary path (N9)
    "https://bupa.com.sa/eligibility",  # named-item path (N10)
    "https://gateway.example/eligibility",  # unknown payer → nulls
]


def synth_bundles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → (order_key, raw_bundle): API errors for k%7=0, claim
    rejections for k%3=0, missing outcome for k%5=0, else complete —
    with payer-variant benefit placement keyed by k%4.

    The orders scan is parallelism-staged (r10): at bench scale it is
    ONE parquet split, so the whole synth → parse → extract chain ran
    as a single task (fhir_extract_bundle 4.85 s single-threaded,
    stage-profile-measured); ensure_parallelism spreads it and is a
    no-op at scale where the scan itself provides the partitions."""
    from eligibility_etl_airflow_spark.operators.parallel import ensure_parallelism

    o = ensure_parallelism(Catalog(spark, sf_dir).orders)
    k = F.col("o_orderkey")
    p = F.col("o_totalprice")
    s = F.col("o_orderstatus")
    full_url = F.concat(
        F.element_at(F.array(*[F.lit(u) for u in _PAYER_URLS]), (k % 4 + 1).cast("int")),
        F.lit("/"),
        k.cast("string"),
    )
    site = (
        F.when(s == "O", F.lit("eligible"))
        .when(s == "F", F.lit("not-active"))
        .otherwise(F.lit("suspended"))
    )
    ins_part = (
        F.when(
            k % 4 == 0,
            F.format_string(
                ',"insurance":[{"inforce":true,"item":[{"name":"benefits","benefit":'
                '[{"allowedMoney":{"value":%.2f,"currency":"SAR"},"type":{"coding":[{"code":"approval-limit"}]}},'
                '{"allowedMoney":{"value":%.3f,"currency":"SAR"},"type":{"coding":[{"code":"copay-maximum"}]}}]}]}]',
                p,
                p / 10,
            ),
        )
        .when(
            k % 4 == 2,
            F.format_string(
                ',"insurance":[{"inforce":true,"item":[{"name":"Approval limit","benefit":'
                '[{"allowedMoney":{"value":%.2f,"currency":"SAR"}}]}]}]',
                p,
            ),
        )
        .otherwise(F.lit(""))
    )
    ctb_part = F.when(
        k % 4 == 1,
        F.format_string(
            ',"costToBeneficiary":[{"type":{"coding":[{"code":"maxcopay"}]},'
            '"valueMoney":{"value":%.3f}}]',
            p / 10,
        ),
    ).otherwise(F.lit(""))

    entry1 = F.format_string(
        '{"fullUrl":"%s","resource":{"resourceType":"MessageHeader"}}', full_url
    )
    entry2 = (
        F.when(
            k % 3 == 0,
            F.format_string(
                '{"fullUrl":"%s","resource":{"resourceType":"CoverageEligibilityResponse",'
                '"outcome":"error","error":[{"code":{"coding":'
                '[{"code":"E%d","display":"adjudication failure"}]}}]}}',
                full_url,
                k % 11,
            ),
        )
        .when(
            k % 5 == 0,
            F.format_string(
                '{"fullUrl":"%s","resource":{"resourceType":"CoverageEligibilityResponse"%s%s}}',
                full_url,
                ins_part,
                ctb_part,
            ),
        )
        .otherwise(
            F.format_string(
                '{"fullUrl":"%s","resource":{"resourceType":"CoverageEligibilityResponse",'
                '"outcome":"complete","disposition":"Visit covered %s",'
                '"extension":[{"url":"http://nphies.sa/extension-siteEligibility",'
                '"valueCodeableConcept":{"coding":[{"code":"%s"}]}}]%s%s}}',
                full_url,
                s,
                site,
                ins_part,
                ctb_part,
            )
        )
    )
    raw = F.when(
        k % 7 == 0, F.lit('{"status":"error","message":"timeout"}')
    ).otherwise(
        F.format_string(
            '{"status":"success","nphies_response_time":0.5,"response":{"entry":[%s,%s]}}',
            entry1,
            entry2,
        )
    )
    return o.select(k.cast("long").alias("order_key"), raw.alias("raw_bundle"))


FHIR_EXTRACT_ORACLE = """
WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p, o_orderstatus AS s FROM orders)
SELECT CAST(k AS BIGINT) AS order_key,
       CASE WHEN k % 7 = 0 THEN 'Null'
            WHEN k % 3 = 0 THEN 'ERROR'
            WHEN k % 5 = 0 THEN 'Null'
            ELSE 'Complete' END AS outcome,
       CASE WHEN k % 7 = 0 THEN NULL
            WHEN k % 3 = 0 THEN 'E' || CAST(k % 11 AS VARCHAR) || ' adjudication failure'
            WHEN k % 5 = 0 THEN NULL
            ELSE 'Visit covered ' || s END AS note,
       CASE WHEN k % 7 <> 0 AND k % 3 <> 0 AND k % 5 <> 0 THEN
            CASE s WHEN 'O' THEN 'eligible' WHEN 'F' THEN 'not-active'
                   ELSE 'suspended' END END AS site_code,
       CASE WHEN k % 7 <> 0 AND k % 3 <> 0 AND k % 4 IN (0, 2)
            THEN round(p, 2) END AS approval_limit,
       CASE WHEN k % 7 <> 0 AND k % 3 <> 0 AND k % 4 IN (0, 1)
            THEN round(p / 10, 3) END AS copay_maximum
FROM o
"""


@query("fhir_extract_bundle", oracle=FHIR_EXTRACT_ORACLE)
def fhir_extract_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outcome/note/site-code/limits extraction — N4, N5, N6, N8–N12 as
    pure higher-order column expressions over the declared bundle schema."""
    # two-step select: parse ONCE into a named struct column, then extract
    # from the column reference — the single-projection form re-evaluates
    # from_json per output column (2.5× slower at sf0.1)
    parsed = synth_bundles(spark, sf_dir).select(
        "order_key", fhir.parse_bundle(F.col("raw_bundle")).alias("b")
    )
    b: Column = F.col("b")
    limits = fhir.parse_limits(b)
    return parsed.select(
        "order_key",
        fhir.extract_outcome(b).alias("outcome"),
        fhir.extract_note(b).alias("note"),
        fhir.extract_site_code(b).alias("site_code"),
        limits.getField("approval_limit").alias("approval_limit"),
        limits.getField("copay_maximum").alias("copay_maximum"),
    )


FIND_KEYS_ORACLE = """
WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders)
SELECT CAST(k AS BIGINT) AS order_key,
       CAST(CASE WHEN k % 7 = 0 OR k % 3 = 0 THEN 0
                 WHEN k % 4 = 0 THEN 2
                 WHEN k % 4 = 2 THEN 1
                 ELSE 0 END AS BIGINT) AS n_allowed_money,
       CASE WHEN k % 7 <> 0 AND k % 3 <> 0 AND k % 4 IN (0, 2)
            THEN round(p, 2) END AS first_allowed_value
FROM o
"""


@query("fhir_find_keys_udf", oracle=FIND_KEYS_ORACLE)
def fhir_find_keys_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N7: the recursive find_keys UDF — count and first value of every
    ``allowedMoney`` anywhere in the bundle, checked against the known
    construction."""
    bundles = synth_bundles(spark, sf_dir)
    found = fhir.find_keys(F.col("raw_bundle"), F.lit("allowedMoney"))
    return bundles.select(
        "order_key",
        F.coalesce(F.size(found), F.lit(0)).cast("long").alias("n_allowed_money"),
        F.get_json_object(F.try_element_at(found, F.lit(1)), "$.value")
        .cast("double")
        .alias("first_allowed_value"),
    )


# --------------------------------------------------------------------------
# Beneficiary API response — N1 (ApiStatus), N2 (Insurance[0]), N3 (struct
# expansion), P10 (name-conflict coalesce) in one construct→parse query
# --------------------------------------------------------------------------

BENEFICIARY_DDL = """
struct<response: struct<
  ApiStatus: string,
  Insurance: array<struct<
    InsuranceCompanyEN: string,
    InsuranceCompanyName: string,
    IdentityNumber: string,
    MemberIdentityNumber: string
  >>
>>
"""

BENEFICIARY_ORACLE = """
SELECT CAST(c_custkey AS BIGINT) AS customer_key,
       CASE WHEN c_custkey % 11 = 0 THEN 'Fail' ELSE 'Success' END AS api_status,
       CASE WHEN c_custkey % 11 <> 0 THEN c_mktsegment END AS company,
       CASE WHEN c_custkey % 11 <> 0 THEN CAST(c_custkey * 7 AS VARCHAR) END AS identity_number
FROM customer
"""


@query("beneficiary_enrichment", oracle=BENEFICIARY_ORACLE)
def beneficiary_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beneficiary-response path (§3.1 transform_iqama): ApiStatus gate
    (N1), first Insurance element (N2), struct expansion (N3), and the
    two-generation column-pair coalesce (P10, src/eligibility.py:158-176)
    — either the primary or the alternate field is populated depending on
    the API generation (keyed by customer parity), and coalesce restores
    one column."""
    c = Catalog(spark, sf_dir).customer
    k = F.col("c_custkey")
    ins_old = F.format_string(
        '{"InsuranceCompanyName":"%s","MemberIdentityNumber":"%s"}',
        F.col("c_mktsegment"),
        (k * 7).cast("string"),
    )
    ins_new = F.format_string(
        '{"InsuranceCompanyEN":"%s","IdentityNumber":"%s"}',
        F.col("c_mktsegment"),
        (k * 7).cast("string"),
    )
    raw = F.when(
        k % 11 == 0, F.lit('{"response":{"ApiStatus":"Fail"}}')
    ).otherwise(
        F.format_string(
            '{"response":{"ApiStatus":"Success","Insurance":[%s]}}',
            F.when(k % 2 == 0, ins_new).otherwise(ins_old),
        )
    )
    parsed = c.select(
        k.cast("long").alias("customer_key"),
        F.from_json(raw, BENEFICIARY_DDL).alias("b"),
    )
    status = F.col("b.response.ApiStatus")
    ins0 = F.when(status == "Success", F.try_element_at("b.response.Insurance", F.lit(1)))
    return parsed.select(
        "customer_key",
        status.alias("api_status"),
        F.coalesce(
            ins0.getField("InsuranceCompanyEN"), ins0.getField("InsuranceCompanyName")
        ).alias("company"),
        F.coalesce(
            ins0.getField("IdentityNumber"), ins0.getField("MemberIdentityNumber")
        ).alias("identity_number"),
    )
