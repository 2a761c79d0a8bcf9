"""Event-stream analytics over the ``events`` table shape
(event_id, ts, user_id, event_type, value, props): tumbling-window
aggregation and gap-based sessionization.

Both are pure DataFrame plans that run identically in batch and in
Structured Streaming (``readStream`` + ``withWatermark`` + the same
``F.window`` groupBy — tests/test_streaming_events.py drives the
streaming path with late-data watermarking). The reference has no
stream-analytics operators (its "streams" are ingestion sources), so
these extend the engine the way a training-data pipeline needs:
per-window activity stats and per-session grouping of interaction
logs at 100 TB (one shuffle each, keyed by (window|user), AQE-skew
tolerant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def windowed_event_counts(
    df: DataFrame, window: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Tumbling-window counts + value stats per event_type.

    Streaming: apply ``df.withWatermark(ts_col, ...)`` first and the
    same plan emits finalized windows as the watermark passes."""
    return (
        df.groupBy(
            F.window(ts_col, window).alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
            F.round(F.avg("value"), 4).alias("value_avg"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "value_sum", "value_avg",
        )
    )


def sessionize(
    df: DataFrame, gap_minutes: int = 30, ts_col: str = "ts",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes``. One window shuffle keyed
    by user (the classic lag→flag→cumsum pattern; for unbounded
    streams the stateful equivalent is applyInPandasWithState keyed by
    user with a gap timeout). ``tiebreak_col`` makes the per-user event
    order total (equal timestamps otherwise make the lag
    nondeterministic). Returns one row per session."""
    order = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
    w = Window.partitionBy("user_id").orderBy(*order)
    # exact integer micros (parquet TIMESTAMP_NTZ can't cast to long
    # directly; fractional-second epoch math would round differently
    # across engines)
    epoch_us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    gap = epoch_us - F.lag(epoch_us).over(w)
    flagged = df.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0),
    ).withColumn("session_idx", F.sum("new_session").over(w))
    return (
        flagged.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
    )
