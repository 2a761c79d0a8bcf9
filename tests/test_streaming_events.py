"""Structured Streaming windowed aggregation with late-data
watermarking over the events shape — the same plan as the batch
``windowed_event_counts``, driven through readStream."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


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
