"""Structured Streaming windowed aggregation with late-data
watermarking over the events shape — the same plan as the batch
``windowed_event_counts``, driven through readStream."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


def test_stateful_streaming_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: sessions closed by the
    stream (gap observed across micro-batches) must exactly match the
    batch sessionize result."""
    from quickwit_spark.pipeline.events import sessionize, sessionize_stream

    from pyspark.sql import functions as F

    full = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch = full.where(F.col("user_id") < 40)  # keep the test snappy
    src = tmp_path / "sess_in"
    src.mkdir()
    pdf = batch.toPandas().sort_values("ts")  # time-ordered arrival
    half = len(pdf) // 2
    for i, part in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            str(src / f"p{i}.parquet"), coerce_timestamps="us",
        )

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        # expire_open_sessions=False: a bounded availableNow drain must
        # terminate instead of spinning empty batches until the 30-min
        # timeouts fire
        sessionize_stream(stream, gap_minutes=30, expire_open_sessions=False)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        terminated = q.awaitTermination(120)
    finally:
        q.stop()
    assert terminated  # drained and stopped — no timeout spin
    got = spark.sql("select * from sessions").toPandas()
    assert len(got) > 0

    want = sessionize(batch, gap_minutes=30).toPandas()
    want["session_start_us"] = (
        want["session_start"].astype("datetime64[ns]").astype("int64") // 1000
    )
    want["session_end_us"] = (
        want["session_end"].astype("datetime64[ns]").astype("int64") // 1000
    )
    merged = got.merge(
        want, on=["user_id", "session_idx"], suffixes=("_s", "_b")
    )
    # every closed session emitted by the stream matches batch exactly
    assert len(merged) == len(got)
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    assert (merged["session_start_us_s"] == merged["session_start_us_b"]).all()
    assert (merged["session_end_us_s"] == merged["session_end_us_b"]).all()
    assert (abs(merged["value_sum_s"] - merged["value_sum_b"]) < 1e-6).all()


def test_streamed_window_counts_match_batch(spark, tmp_path):
    from quickwit_spark.pipeline.events import windowed_event_counts

    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = tmp_path / "in"
    src.mkdir()
    # split the events into two files (arrives in two micro-batches)
    pdf = batch.toPandas().sort_values("event_id")
    half = len(pdf) // 2
    for i, part in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            str(src / f"p{i}.parquet"), coerce_timestamps="us",
        )

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        # watermarks need TIMESTAMP (with tz); parquet stores NTZ
        .withColumn("ts", F.col("ts").cast("timestamp_ltz"))
        .withWatermark("ts", "10 minutes")
    )
    q = (
        windowed_event_counts(stream, "1 hour")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from win_counts").toPandas()
    want = windowed_event_counts(
        batch.withColumn("ts", F.col("ts").cast("timestamp_ltz")), "1 hour"
    ).toPandas()

    # append mode only emits windows the watermark has CLOSED — every
    # emitted window must exactly match the batch result, and most
    # windows must have been finalized
    merged = got.merge(
        want, on=["window_start", "event_type"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(got) > 0
    assert (merged["n_events_s"] == merged["n_events_b"]).all()
    assert (merged["value_sum_s"] == merged["value_sum_b"]).all()
    assert len(got) >= len(want) * 0.8  # only trailing windows still open
