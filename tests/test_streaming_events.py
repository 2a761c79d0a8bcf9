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


class _FakeState:
    """Minimal GroupState stand-in for driving _session_update."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self._timeout_armed = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        self._timeout_armed = True


def test_session_idx_survives_timeout_flush():
    """A session flushed by the processing-time timeout must NOT reset
    the user's session counter — the next session continues numbering,
    so emitted (user_id, session_idx) keys stay unique."""
    import pandas as pd

    from quickwit_spark.pipeline.events import _session_update

    def batch(ts_s, values):
        return [pd.DataFrame({
            "event_id": range(len(ts_s)),
            "ts": pd.to_datetime([t * 1_000_000_000 for t in ts_s]),
            "value": values,
        })]

    st_ = _FakeState()
    out1 = list(_session_update((7,), batch([100, 200], [1.0, 2.0]),
                                st_, 30, "ts", True))
    assert out1 == [] and st_._timeout_armed  # open session, timeout armed

    # timeout fires with no new events: session 1 flushed, counter kept
    st_.hasTimedOut = True
    out2 = pd.concat(list(_session_update((7,), [], st_, 30, "ts", True)))
    assert out2["session_idx"].tolist() == [1]
    assert out2["n_events"].tolist() == [2]
    assert st_.exists and st_.get[0] == 2  # counter advanced, kept

    # later events open session 2 and a further gap closes it as 2 (not 1)
    st_.hasTimedOut = False
    gap = 40 * 60
    list(_session_update((7,), batch([10_000], [5.0]), st_, 30, "ts", True))
    out3 = pd.concat(list(_session_update(
        (7,), batch([10_000 + gap], [6.0]), st_, 30, "ts", True)))
    assert out3["session_idx"].tolist() == [2]
    assert st_.get[0] == 3

    # a timeout on an EMPTY open session just drops the state
    st2 = _FakeState()
    st2.update((5, None, 0, None, 0.0))
    st2.hasTimedOut = True
    assert list(_session_update((7,), [], st2, 30, "ts", True)) == []
    assert not st2.exists


def test_streaming_exact_dedup_first_seen(spark, tmp_path):
    """exact_dedup_stream keeps each digest's first arrival across
    micro-batches; with arrival ordered by doc_id the kept set equals
    the batch keeper set, and the watermarked variant behaves the same
    when duplicates arrive within the delay."""
    import pandas as pd

    from quickwit_spark.pipeline.dedup import exact_dedup, exact_dedup_stream

    rows = []
    for i in range(60):
        rows.append((i, f"text {i % 20}", pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=i)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "ts"])
    src = tmp_path / "dedup_in"
    src.mkdir()
    half = len(pdf) // 2  # doc_id order => first arrival is min id
    for i, part in enumerate((pdf.iloc[:half], pdf.iloc[half:])):
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            str(src / f"p{i}.parquet"), coerce_timestamps="us",
        )
    batch = spark.read.parquet(str(src))

    with pytest.raises(ValueError):
        exact_dedup_stream(batch)

    keepers = {
        r.doc_id
        for r in exact_dedup(batch).where(~F.col("is_dup")).collect()
    }
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    for name, kwargs in (
        ("kept_plain", {}),
        ("kept_wm", {"ts_col": "ts", "watermark": "10 minutes"}),
    ):
        q = (
            exact_dedup_stream(stream, **kwargs)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(120)
        finally:
            q.stop()
        got = {r.doc_id for r in spark.sql(f"select doc_id from {name}").collect()}
        assert got == keepers, name
