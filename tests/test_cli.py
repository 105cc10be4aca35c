"""In-process CLI coverage for the pipeline command's crawl-tier flags.

``main()`` is invoked directly (get_spark getOrCreate reuses the test
session) so the argument wiring — --raw-crawl requiredness, blocklist
parsing, --docs-parquet chaining — is exercised without subprocess
startup cost.
"""

import json

import pytest


def _mk_crawl(spark, tmp_path):
    body = (
        "the quick brown fox jumps over the lazy dog and the cat "
        "is in the house of a friend"
    )
    rows = [
        (
            i,
            f"https://www.s{i % 3}.example.com/p/{i}",
            f"<html><body><p>{body} v{i}</p></body></html>",
        )
        for i in range(12)
    ]
    rows.append((12, "https://bad.example.org/x",
                 f"<html><body><p>{body} FORBIDDENTERM v12</p></body></html>"))
    raw = tmp_path / "raw"
    spark.createDataFrame(rows, "doc_id long, url string, html string").write.parquet(
        str(raw)
    )
    return str(raw)


def test_cli_crawl_preprocess_with_blocklist(spark, tmp_path, capsys):
    from eligibility_etl_airflow_spark.__main__ import main

    raw = _mk_crawl(spark, tmp_path)
    rc = main(
        [
            "pipeline",
            "crawl-preprocess",
            "--raw-crawl",
            raw,
            "--out-dir",
            str(tmp_path / "s1"),
            "--blocklist",
            " forbiddenterm , ,unused ",
            "--min-latin-fraction",
            "0.5",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_total"] == 13
    assert stats["n_after_blocklist"] == 12  # planted doc dropped
    assert stats["n_preprocessed"] == 12
    out = spark.read.parquet(str(tmp_path / "s1" / "documents.parquet"))
    assert out.count() == 12


def test_cli_crawl_preprocess_requires_raw_crawl(spark, tmp_path, capsys):
    from eligibility_etl_airflow_spark.__main__ import main

    rc = main(["pipeline", "crawl-preprocess", "--out-dir", str(tmp_path / "x")])
    assert rc == 2
    assert "requires --raw-crawl" in capsys.readouterr().err


def test_cli_chain_sf_dir_and_docs_parquet(spark, tmp_path, capsys):
    from eligibility_etl_airflow_spark.__main__ import main

    raw = _mk_crawl(spark, tmp_path)
    assert main(
        ["pipeline", "crawl-preprocess", "--raw-crawl", raw,
         "--out-dir", str(tmp_path / "s1")]
    ) == 0
    # stage-1 out-dir as sf-dir
    assert main(
        ["pipeline", "corpus-curation", "--sf-dir", str(tmp_path / "s1"),
         "--out-dir", str(tmp_path / "s2")]
    ) == 0
    # --docs-parquet chains stage 2's curated docs into training prep
    assert main(
        ["pipeline", "training-prep", "--sf-dir", str(tmp_path / "s1"),
         "--out-dir", str(tmp_path / "s3"),
         "--docs-parquet", str(tmp_path / "s2" / "curated_docs")]
    ) == 0
    lines = [ln for ln in capsys.readouterr().out.strip().splitlines() if ln.startswith("{")]
    s3 = json.loads(lines[-1])
    assert s3["n_packs"] >= 1
    assert spark.read.parquet(str(tmp_path / "s3" / "packed_chunks")).count() > 0


def test_cli_crawl_frontier_with_robots(spark, tmp_path, capsys):
    from eligibility_etl_airflow_spark.__main__ import main

    pages = tmp_path / "pages"
    spark.createDataFrame(
        [
            (
                1,
                "https://hub.example.com/a",
                '<p><a href="https://new.example.net/x">n</a>'
                '<a href="https://new.example.net/blocked/y">b</a></p>',
            )
        ],
        "doc_id long, url string, html string",
    ).write.parquet(str(pages))
    robots = tmp_path / "robots"
    spark.createDataFrame(
        [("new.example.net", "User-agent: *\nDisallow: /blocked\n")],
        "domain string, robots string",
    ).write.parquet(str(robots))
    rc = main(
        [
            "pipeline",
            "crawl-frontier",
            "--raw-crawl",
            str(pages),
            "--robots-parquet",
            str(robots),
            "--out-dir",
            str(tmp_path / "f"),
            "--per-domain-budget",
            "1",
        ]
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["n_candidates"] == 2
    assert stats["n_admitted"] == 1
    assert stats["n_scheduled"] == 1
    out = spark.read.parquet(str(tmp_path / "f" / "frontier.parquet"))
    assert [r["url"] for r in out.collect()] == ["https://new.example.net/x"]


def test_cli_crawl_frontier_requires_raw_crawl(spark, tmp_path, capsys):
    from eligibility_etl_airflow_spark.__main__ import main

    rc = main(["pipeline", "crawl-frontier", "--out-dir", str(tmp_path / "x")])
    assert rc == 2
    assert "requires --raw-crawl" in capsys.readouterr().err


@pytest.mark.slow
def test_cli_crawl_ingest_with_drift(spark, tmp_path, capsys):
    """crawl-ingest subcommand: two batches against one state dir; the
    second surfaces the drift stat (token index built by the first) and
    a replay accepts nothing."""
    from eligibility_etl_airflow_spark.__main__ import main

    def batch(path, rows):
        spark.createDataFrame(
            rows, "doc_id long, url string, html string"
        ).write.parquet(path)
        return path

    b1 = batch(str(tmp_path / "b1"), [
        (1, "https://s1.example.com/a", "<p>alpha beta gamma delta words</p>"),
    ])
    b2 = batch(str(tmp_path / "b2"), [
        (2, "https://s1.example.com/b", "<p>epsilon zeta different words</p>"),
    ])
    state = str(tmp_path / "state")

    rc = main(["crawl-ingest", "--batch-parquet", b1,
               "--state-dir", state, "--drift-report"])
    assert rc == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["n_accepted"] == 1 and "batch_js_divergence" not in s1

    rc = main(["crawl-ingest", "--batch-parquet", b2,
               "--state-dir", state, "--drift-report"])
    assert rc == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["n_accepted"] == 1 and "batch_js_divergence" in s2

    rc = main(["crawl-ingest", "--batch-parquet", b2, "--state-dir", state])
    assert rc == 0
    s3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s3["n_accepted"] == 0


def test_cli_incremental_curation_drift_flag(spark, tmp_path, capsys):
    from eligibility_etl_airflow_spark.__main__ import main

    def batch(path, rows):
        spark.createDataFrame(rows, "doc_id long, text string").write.parquet(path)
        return path

    b1 = batch(str(tmp_path / "c1"), [(1, "alpha beta gamma delta words")])
    b2 = batch(str(tmp_path / "c2"), [(2, "epsilon zeta other words here")])
    state = str(tmp_path / "cstate")
    main(["incremental-curation", "--batch-parquet", b1,
          "--state-dir", state, "--drift-report"])
    capsys.readouterr()
    rc = main(["incremental-curation", "--batch-parquet", b2,
               "--state-dir", state, "--drift-report"])
    assert rc == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "batch_js_divergence" in s2


def test_cli_ann_query_over_state(spark, tmp_path, capsys):
    """ann-query serves top-k from a curation state's vector index."""
    from eligibility_etl_airflow_spark import pipelines
    from eligibility_etl_airflow_spark.__main__ import main

    state = str(tmp_path / "st")
    rows = [
        (i, f"doc {i} words a{i} b{i}", [float((i * 5 + d) % 7 - 3) for d in range(4)])
        for i in range(20)
    ]
    batch = spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<double>"
    )
    pipelines.run_incremental_curation(
        spark, batch, state, semantic_eps=0.9999, semantic_k=4
    )
    qp = str(tmp_path / "q.parquet")
    spark.createDataFrame(
        [(1, [1.0, 0.0, -1.0, 2.0])], "vec_id long, embedding array<double>"
    ).write.parquet(qp)
    out = str(tmp_path / "res")
    rc = main(
        [
            "ann-query", "--state-dir", state, "--queries-parquet", qp,
            "--out-dir", out, "--k", "3", "--nprobe", "4",
        ]
    )
    assert rc == 0
    res = spark.read.parquet(out)
    assert res.columns == ["query_id", "corpus_id", "sim", "rank"]
    assert res.count() == 3
