

def test_source_dup_diagnostics_planted(spark):
    """Planted sources: A duplicates itself, B echoes A (cross-source),
    C is clean — counts and rates pin each distinction."""
    import unittest.mock as mock

    from eligibility_etl_airflow_spark.plans.llm_pipeline import (
        source_dup_diagnostics,
    )

    rows = [
        (1, "shared article body one", "A"),
        (2, "shared article body one", "A"),    # self-dup within A
        (3, "unique piece alpha", "A"),
        (4, "shared article body one", "B"),    # cross-source echo of A
        (5, "unique piece beta", "B"),
        (6, "unique piece gamma", "C"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    with mock.patch(
        "eligibility_etl_airflow_spark.plans.llm_pipeline.Catalog"
    ) as cat:
        cat.return_value.documents = df
        out = {r["source"]: r for r in source_dup_diagnostics(spark, "x").collect()}
    a, b, c = out["A"], out["B"], out["C"]
    assert (a["n_docs"], a["n_unique_contents"]) == (3, 2)
    assert a["n_duplicated_docs"] == 2 and a["n_cross_source_docs"] == 2
    assert abs(a["dup_rate"] - round(2 / 3, 6)) < 1e-9
    assert (b["n_docs"], b["n_duplicated_docs"], b["n_cross_source_docs"]) == (2, 1, 1)
    assert (c["n_duplicated_docs"], c["n_cross_source_docs"]) == (0, 0)
    assert c["dup_rate"] == 0.0
