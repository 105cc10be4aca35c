"""Edge cases for the FHIR extractors (functions/fhir.py) beyond what the
construct→parse oracle query covers: malformed JSON, absent fields,
payer-variant dispatch, and the recursive find_keys UDF."""

from __future__ import annotations

from pyspark.sql import functions as F

from eligibility_etl_airflow_spark.functions import fhir

COMPLETE = (
    '{"status":"success","response":{"entry":['
    '{"fullUrl":"https://bupa.com.sa/elig/1","resource":{"resourceType":"MessageHeader"}},'
    '{"fullUrl":"x","resource":{"resourceType":"CoverageEligibilityResponse",'
    '"outcome":"complete","disposition":"covered",'
    '"extension":[{"url":"http://x/extension-siteEligibility",'
    '"valueCodeableConcept":{"coding":[{"code":"eligible"}]}}],'
    '"insurance":[{"inforce":true,"item":[{"name":"Approval limit",'
    '"benefit":[{"allowedMoney":{"value":500.0,"currency":"SAR"}}]}]}]}}]}}'
)
ERROR = (
    '{"status":"success","response":{"entry":['
    '{"fullUrl":"https://other/elig/2","resource":{"resourceType":"CoverageEligibilityResponse",'
    '"outcome":"error","error":[{"code":{"coding":[{"code":"GE-0001","display":"bad request"}]}}]}}]}}'
)
API_ERROR = '{"status":"error","message":"timeout"}'
GARBAGE = "not json at all {"


def _extract(spark, raws):
    df = spark.createDataFrame([(i, r) for i, r in enumerate(raws)], "i long, raw string")
    b = fhir.parse_bundle(F.col("raw"))
    lim = fhir.parse_limits(b)
    return df.select(
        "i",
        fhir.extract_outcome(b).alias("outcome"),
        fhir.extract_note(b).alias("note"),
        fhir.extract_site_code(b).alias("site"),
        lim.getField("approval_limit").alias("lim"),
    ).collect()


def test_extractors_over_variants(spark):
    rows = {r.i: r for r in _extract(spark, [COMPLETE, ERROR, API_ERROR, GARBAGE])}
    assert (rows[0].outcome, rows[0].note, rows[0].site, rows[0].lim) == (
        "Complete", "covered", "eligible", 500.0,
    )
    assert (rows[1].outcome, rows[1].note, rows[1].site, rows[1].lim) == (
        "ERROR", "GE-0001 bad request", None, None,
    )
    assert (rows[2].outcome, rows[2].note, rows[2].lim) == ("Null", None, None)
    # from_json on garbage → null struct → safe nulls everywhere
    assert (rows[3].outcome, rows[3].note, rows[3].lim) == ("Null", None, None)


def test_find_keys_recursive(spark):
    doc = '{"a":{"allowedMoney":{"value":1}},"b":[{"allowedMoney":{"value":2}},{"c":{"allowedMoney":3}}]}'
    df = spark.createDataFrame([(doc,), (GARBAGE,), (None,)], "raw string")
    got = df.select(fhir.find_keys(F.col("raw"), F.lit("allowedMoney")).alias("f")).collect()
    assert got[0].f == ['{"value":1}', '{"value":2}', "3"]
    assert got[1].f == []  # unparseable → empty
    assert got[2].f is None  # null in → null out
