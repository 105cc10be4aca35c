"""Invariants for the sketch-based extras."""

from __future__ import annotations

from pyspark.sql import functions as F

from eligibility_etl_airflow_spark import registry

registry.load_all()


def test_approx_distinct_within_rsd(spark, sf_dir):
    rows = registry.QUERIES["approx_distinct_sketch"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_customers - r.exact_customers) / max(r.exact_customers, 1)
        assert rel_err < 0.10, f"{r.o_orderstatus}: rel err {rel_err:.3f}"


def test_pii_redaction_planted(spark, tmp_path):
    """Planted PII must be counted and replaced by typed tokens."""
    import pyspark.sql.functions as SF

    from eligibility_etl_airflow_spark.plans.llm_pipeline import _PII

    docs = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@example-mail.co.uk or 555-867-5309 now"),
            (2, "ssn 123-45-6789 appears twice: 987-65-4321"),
            (3, "clean text with no sensitive content at all"),
        ],
        "doc_id long, text string",
    )
    t = SF.col("text")
    red = SF.regexp_replace(
        SF.regexp_replace(
            SF.regexp_replace(t, _PII["email"], "<EMAIL>"), _PII["ssn"], "<SSN>"
        ),
        _PII["phone"],
        "<PHONE>",
    )
    rows = {
        r.doc_id: r
        for r in docs.select(
            "doc_id",
            red.alias("red"),
            SF.size(SF.regexp_extract_all(t, SF.lit(_PII["email"]), SF.lit(0))).alias("n_email"),
            SF.size(SF.regexp_extract_all(t, SF.lit(_PII["ssn"]), SF.lit(0))).alias("n_ssn"),
        ).collect()
    }
    assert rows[1].n_email == 1 and "<EMAIL>" in rows[1].red and "<PHONE>" in rows[1].red
    assert rows[2].n_ssn == 2 and rows[2].red.count("<SSN>") == 2
    assert rows[3].red == "clean text with no sensitive content at all"


def test_stratified_sample_rates(spark, sf_dir):
    """Each stratum's sampled count must sit near fraction * stratum size
    (Bernoulli sampling; loose 3-sigma-ish bounds on small strata)."""
    got = {
        r.lang: r.n_sampled
        for r in registry.QUERIES["stratified_sample"](spark, sf_dir).collect()
    }
    totals = {
        r.lang: r.n
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    fractions = {"en": 0.5, "de": 0.25, "es": 0.25, "fr": 0.25, "zh": 0.1}
    for lang, frac in fractions.items():
        n = totals.get(lang, 0)
        if n < 20:
            continue
        expect = frac * n
        sd = (n * frac * (1 - frac)) ** 0.5
        assert abs(got.get(lang, 0) - expect) <= 4 * sd + 1, (lang, got.get(lang), expect)


def test_approx_percentile_tracks_exact(spark, sf_dir):
    """The sketch twin must agree with the exact percentiles within the
    accuracy bound. At accuracy=10000 the rank error on sf0.001 groups
    (~tens of thousands of rows) is well under one rank — assert a tight
    relative band on the returned values plus exact min/max/avg."""
    exact = {r.l_returnflag: r for r in
             registry.QUERIES["percentile_stats"](spark, sf_dir).collect()}
    approx = {r.l_returnflag: r for r in
              registry.QUERIES["percentile_stats_approx"](spark, sf_dir).collect()}
    assert set(exact) == set(approx) and exact
    for flag, e in exact.items():
        a = approx[flag]
        assert a.min_price == e.min_price and a.max_price == e.max_price
        assert a.avg_price == e.avg_price
        for col in ("p50", "p95"):
            rel = abs(getattr(a, col) - getattr(e, col)) / max(abs(getattr(e, col)), 1e-9)
            assert rel < 0.01, f"{flag}.{col}: rel err {rel:.5f}"
