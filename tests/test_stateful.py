"""applyInPandasWithState operator: the stream's final per-user state
must equal the batch groupBy over the same input, including when the
input arrives split across multiple micro-batches."""

from __future__ import annotations

import os
import shutil

from eligibility_etl_airflow_spark.catalog import Catalog
from eligibility_etl_airflow_spark.streaming import ops, stateful


def _final_rows(df):
    # update-mode emits one row per user per batch; keep the last emission
    pdf = df.toPandas().drop_duplicates(subset=["user_id"], keep="last")
    return {
        (r.user_id): (r.n_events, round(r.total_value, 4), r.last_ts)
        for r in pdf.itertuples()
    }


def test_stateful_running_spend_matches_batch(spark, sf_dir, tmp_path):
    # two files → two micro-batches → state must carry across them
    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(os.path.join(sf_dir, "events.parquet"), src / "a.parquet")

    stream = ops.events_stream(spark, str(tmp_path).replace("events.parquet", ""))
    # point the stream at our staged dir instead
    raw = (
        spark.readStream.schema(ops.EVENTS_SCHEMA).format("parquet").load(str(src))
    )
    from pyspark.sql import functions as F

    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    got = ops.run_available_now(
        stateful.running_spend_stream(events), "t_stateful", output_mode="update"
    )
    want = stateful.running_spend_batch(Catalog(spark, sf_dir).events)
    got_map = _final_rows(got)
    want_map = {
        r.user_id: (r.n_events, round(r.total_value, 4), r.last_ts)
        for r in want.collect()
    }
    assert got_map == want_map
