"""DAG orchestration module: graph validation, level structure, XCom-style
result passing, retries, and the eligibility task graph end-to-end."""

from __future__ import annotations

import os

import pytest

from eligibility_etl_airflow_spark import dag as dagmod


def test_levels_and_cycle_detection():
    d = dagmod.Dag("t")
    d.task("a", lambda: {})
    d.task("b", lambda a: {}, upstream=["a"])
    d.task("c", lambda a: {}, upstream=["a"])
    d.task("d", lambda b, c: {}, upstream=["b", "c"])
    assert d.levels() == [["a"], ["b", "c"], ["d"]]

    cyc = dagmod.Dag("cyc")
    cyc.task("x", lambda y: {}, upstream=["y"])
    cyc.task("y", lambda x: {}, upstream=["x"])
    with pytest.raises(ValueError, match="cycle"):
        cyc.levels()

    bad = dagmod.Dag("bad")
    bad.task("x", lambda nope: {}, upstream=["nope"])
    with pytest.raises(ValueError, match="unknown task"):
        bad.levels()


def test_run_passes_upstream_results_and_retries():
    calls = {"n": 0}

    def flaky(seed):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")
        return {"doubled": seed["v"] * 2}

    d = dagmod.Dag("t")
    d.task("seed", lambda: {"v": 21})
    d.task("flaky", flaky, upstream=["seed"], retries=1)
    results = d.run()
    assert results["flaky"] == {"doubled": 42}
    assert calls["n"] == 2

    # retries exhausted → the failure propagates
    d2 = dagmod.Dag("t2")
    d2.task("boom", lambda: 1 / 0)
    with pytest.raises(ZeroDivisionError):
        d2.run()


def test_eligibility_dag_end_to_end(spark, sf_dir, tmp_path):
    d = dagmod.eligibility_dag(spark, sf_dir, str(tmp_path))
    # graph mirrors the reference: parallel transforms between extract/load
    assert d.levels() == [
        ["extract"],
        ["transform_eligibility", "transform_iqama"],
        ["load"],
        ["cleanup"],
    ]
    results = d.run()
    assert results["extract"]["rows"] > 0
    assert results["transform_iqama"]["rows"] == results["extract"]["rows"]
    assert results["load"]["appended"] == results["transform_eligibility"]["rows"]
    # staging removed, warehouse kept
    assert not os.path.exists(results["transform_iqama"]["path"])
    assert os.path.exists(results["load"]["target"])
    # re-run is idempotent: append_dedup sees every key already present
    d2 = dagmod.eligibility_dag(spark, sf_dir, str(tmp_path))
    assert d2.run()["load"]["appended"] == 0
