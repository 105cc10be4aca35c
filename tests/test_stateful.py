"""applyInPandasWithState operator: the stream's final per-user state
must equal the batch groupBy over the same input, including when the
input arrives split across multiple micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

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
    all_events = Catalog(spark, sf_dir).events
    # parity split: most users get events in BOTH micro-batches, so the
    # per-user state must genuinely carry across the batch boundary
    first = all_events.filter(F.col("event_id") % 2 == 0)
    second = all_events.filter(F.col("event_id") % 2 == 1)
    # the file-stream source lists flat files, not Spark output dirs —
    # write each half then hoist the single part-file up as <name>.parquet
    for name, half in [("a", first), ("b", second)]:
        out = tmp_path / f"w_{name}"
        half.coalesce(1).write.parquet(str(out))
        (part,) = out.glob("part-*.parquet")
        part.rename(src / f"{name}.parquet")

    events = ops.stream_from_dir(spark, str(src), maxFilesPerTrigger=1)
    got = ops.run_available_now(
        stateful.running_spend_stream(events), "t_stateful", output_mode="update"
    )
    want = stateful.running_spend_batch(all_events)
    got_map = _final_rows(got)
    want_map = {
        r.user_id: (r.n_events, round(r.total_value, 4), r.last_ts)
        for r in want.collect()
    }
    assert got_map == want_map
