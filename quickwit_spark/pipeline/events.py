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


def _session_update(key, pdfs, state, gap_minutes, ts_col, expire_open_sessions):
    """Per-user state transition of the streaming sessionizer (module
    level so the timeout path is unit-testable without a running
    stream). State tuple: (session_idx, last_ts_us, n_events, start_us,
    value_sum)."""
    import pandas as pd

    gap_us = gap_minutes * 60 * 1_000_000
    (user_id,) = key
    if state.exists:
        sess_idx, last_us, n_ev, start_us, vsum = state.get
    else:
        # first session per user is 1 — matches the batch
        # sessionize's cumsum-of-flags numbering
        sess_idx, last_us, n_ev, start_us, vsum = 1, None, 0, None, 0.0
    closed = []

    if state.hasTimedOut:
        if n_ev:
            closed.append(
                (user_id, sess_idx, n_ev, start_us, last_us, round(vsum, 4))
            )
            # keep the per-user session counter so later sessions never
            # reuse an already-emitted (user_id, session_idx) key —
            # numbering stays identical to the batch sessionize; the
            # tiny counter state persists (no new timeout armed: it
            # re-arms on the user's next event)
            state.update((sess_idx + 1, None, 0, None, 0.0))
        else:
            state.remove()
    else:
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows["_us"] = (
            pd.to_datetime(rows[ts_col])
            .astype("datetime64[ns]")
            .astype("int64")
            // 1000
        )
        rows = rows.sort_values(["_us", "event_id"], kind="mergesort")
        for us, val in zip(rows["_us"], rows["value"]):
            if last_us is not None and us - last_us > gap_us:
                closed.append(
                    (user_id, sess_idx, n_ev, start_us, last_us, round(vsum, 4))
                )
                sess_idx += 1
                n_ev, start_us, vsum = 0, None, 0.0
            if start_us is None:
                start_us = int(us)
            n_ev += 1
            vsum += float(val)
            last_us = int(us)
        state.update((sess_idx, last_us, n_ev, start_us, vsum))
        if expire_open_sessions:
            state.setTimeoutDuration(gap_minutes * 60 * 1000)

    if closed:
        yield pd.DataFrame(
            closed,
            columns=[
                "user_id", "session_idx", "n_events",
                "session_start_us", "session_end_us", "value_sum",
            ],
        )


SESSION_STATE_SCHEMA = "session_idx LONG, last_ts_us LONG, n_events LONG, start_us LONG, value_sum DOUBLE"
SESSION_OUT_SCHEMA = (
    "user_id LONG, session_idx LONG, n_events LONG, "
    "session_start_us LONG, session_end_us LONG, value_sum DOUBLE"
)


def sessionize_stream(
    stream_df: DataFrame, gap_minutes: int = 30, ts_col: str = "ts",
    expire_open_sessions: bool = True,
) -> DataFrame:
    """Stateful streaming sessionization via ``applyInPandasWithState``
    keyed by user: state holds the open session (idx, last event time,
    partial aggregates); a session CLOSES and is emitted when the gap
    to the next event exceeds ``gap_minutes`` or the state times out
    after the gap with no new events (ProcessingTimeTimeout). This is
    the unbounded-stream twin of :func:`sessionize` — the custom
    stateful operator shape the engine uses for anything the built-in
    window aggregations can't express.

    ``expire_open_sessions`` arms a ProcessingTimeTimeout so idle users'
    open sessions flush after the gap with no further input — the right
    setting for continuous streams. For bounded drains
    (``trigger(availableNow=True)``) pass False: armed timeouts keep
    the query alive on empty micro-batches until wall-clock reaches the
    gap, so an availableNow run would spin for gap_minutes.

    Usage::

        out = sessionize_stream(spark.readStream...parquet(dir))
        out.writeStream.outputMode("append")...
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        yield from _session_update(
            key, pdfs, state, gap_minutes, ts_col, expire_open_sessions
        )

    return stream_df.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if expire_open_sessions
            else GroupStateTimeout.NoTimeout
        ),
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


def sessionize_closed(
    df: DataFrame, gap_minutes: int = 30, ts_col: str = "ts",
    tiebreak_col: str | None = "event_id",
    expire_at_max_ts: bool = False,
) -> DataFrame:
    """Deterministic batch REPLAY of :func:`sessionize_stream`'s
    append-mode emission — which sessions the stateful streaming
    sessionizer would have EMITTED after draining this input:

    * a session closed by an observed gap (a later event of the same
      user arrived more than ``gap_minutes`` after it) is always
      emitted — this is the ``expire_open_sessions=False`` bounded
      drain exactly (tests drive the real ``applyInPandasWithState``
      query against this result);
    * with ``expire_at_max_ts=True``, additionally emit sessions whose
      last event lies more than the gap before the input's max event
      time — the timeout-expiry behavior replayed on an event-time
      clock (the deterministic stand-in for ProcessingTimeTimeout,
      whose wall-clock firings no batch replay can reproduce bit-wise).

    Output schema matches SESSION_OUT_SCHEMA (integer microseconds) so
    the replay is directly comparable to the stream's sink. A session
    is gap-closed iff a LATER session of the same user exists
    (session_idx < per-user max) — no second window pass needed beyond
    the :func:`sessionize` plan; the global max-ts cutoff is a 1-row
    broadcast cross join, never a single-partition window shuffle.
    """
    s = sessionize(df, gap_minutes, ts_col, tiebreak_col)
    start_us = F.unix_micros(F.col("session_start").cast("timestamp_ltz"))
    end_us = F.unix_micros(F.col("session_end").cast("timestamp_ltz"))
    w_user = Window.partitionBy("user_id")
    out = s.select(
        "user_id",
        F.col("session_idx").cast("long").alias("session_idx"),
        F.col("n_events").cast("long").alias("n_events"),
        start_us.alias("session_start_us"),
        end_us.alias("session_end_us"),
        "value_sum",
        (F.col("session_idx") < F.max("session_idx").over(w_user)).alias(
            "_gap_closed"
        ),
    )
    if expire_at_max_ts:
        from pyspark.sql.functions import broadcast

        gap_us = int(gap_minutes) * 60 * 1_000_000
        cutoff = df.agg(
            F.max(
                F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
            ).alias("_cutoff_us")
        )
        out = out.crossJoin(broadcast(cutoff))
        emitted = F.col("_gap_closed") | (
            F.col("_cutoff_us") - F.col("session_end_us") > F.lit(gap_us)
        )
    else:
        emitted = F.col("_gap_closed")
    return out.filter(emitted).select(
        "user_id", "session_idx", "n_events",
        "session_start_us", "session_end_us", "value_sum",
    )


def asof_join(
    probes: DataFrame,
    events: DataFrame,
    key_col: str = "user_id",
    probe_ts_col: str = "ts",
    event_ts_col: str = "ts",
    payload_cols: tuple[str, ...] = ("event_id", "event_type"),
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """As-of join: for each probe row, the LATEST event of the same
    ``key_col`` with event ts <= probe ts (left semantics — probes
    with no prior event keep NULL payload columns).

    Spark has no native as-of join; the scalable expression is the
    union-and-carry-forward pattern: tag the two inputs, union them,
    and take ``last(payload, ignorenulls)`` over a (key, ts)-ordered
    running window — ONE shuffle on the key, per-key sorted scan, no
    range join and no per-probe lookup. Equal timestamps are made
    deterministic by ordering (ts, tag, tiebreak): events sort before
    probes at the same instant (<= semantics) and the highest
    ``tiebreak_col`` event wins among exact ties.

    Output: all probe columns + ``asof_<payload>`` + ``asof_ts_us``
    (integer microseconds — no fractional-epoch drift cross-engine).
    """
    e_us = F.unix_micros(F.col(event_ts_col).cast("timestamp_ltz"))
    p_us = F.unix_micros(F.col(probe_ts_col).cast("timestamp_ltz"))
    # an event with a NULL timestamp (or key) can never satisfy
    # `event_ts <= probe_ts`; without this filter its null _ts_us
    # would sort FIRST in the window and its payload would leak into
    # probes that have no real prior event
    events = events.where(
        F.col(event_ts_col).isNotNull() & F.col(key_col).isNotNull()
    )
    ev = events.select(
        F.col(key_col).alias("_k"),
        e_us.alias("_ts_us"),
        F.lit(0).alias("_tag"),
        F.col(tiebreak_col).cast("long").alias("_tie"),
        F.struct(
            *[F.col(c).alias(c) for c in payload_cols],
            e_us.alias("asof_ts_us"),
        ).alias("_payload"),
        *[F.lit(None).cast(t.dataType).alias(f"_p_{t.name}")
          for t in probes.schema.fields],
    )
    pr = probes.select(
        F.col(key_col).alias("_k"),
        p_us.alias("_ts_us"),
        F.lit(1).alias("_tag"),
        F.lit(0).cast("long").alias("_tie"),
        F.lit(None).cast(
            ev.schema["_payload"].dataType
        ).alias("_payload"),
        *[F.col(t.name).alias(f"_p_{t.name}") for t in probes.schema.fields],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts_us", "_tag", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = ev.unionByName(pr).withColumn(
        "_m", F.last("_payload", ignorenulls=True).over(w)
    )
    return joined.filter(F.col("_tag") == 1).select(
        *[F.col(f"_p_{t.name}").alias(t.name) for t in probes.schema.fields],
        *[F.col("_m")[c].alias(f"asof_{c}") for c in payload_cols],
        F.col("_m")["asof_ts_us"].alias("asof_ts_us"),
    )


def interval_join(
    intervals: DataFrame,
    events: DataFrame,
    bucket_minutes: int,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    event_ts_col: str = "ts",
) -> DataFrame:
    """Range (interval-containment) join: pair each event with every
    interval whose half-open [start, end) contains its timestamp.

    A naive theta join is a broadcast-nested-loop (quadratic at
    scale). The scalable expression bucketizes time: each interval is
    exploded to the ``bucket_minutes``-wide buckets it overlaps, each
    event belongs to exactly ONE bucket, and the join becomes an
    EQUI-join on the bucket id followed by the exact containment
    filter — one hash shuffle, prunable, AQE-skew tolerant. Pick
    ``bucket_minutes`` >= the typical interval length so intervals
    explode to O(1) buckets (len/bucket + 1 rows each).

    Returns intervals' columns + the matched event row's columns
    (event ts as ``event_ts_us`` integer microseconds).
    """
    b_us = int(bucket_minutes) * 60 * 1_000_000
    s_us = F.unix_micros(F.col(start_col).cast("timestamp_ltz"))
    e_us = F.unix_micros(F.col(end_col).cast("timestamp_ltz"))
    t_us = F.unix_micros(F.col(event_ts_col).cast("timestamp_ltz"))
    iv = intervals.withColumn("_s_us", s_us).withColumn("_e_us", e_us)
    iv = iv.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col("_s_us") / b_us).cast("long"),
                # end is exclusive: the last covered bucket holds e-1
                ((F.col("_e_us") - 1) / b_us).cast("long"),
            )
        ),
    )
    ev = events.withColumn("_t_us", t_us).withColumn(
        "_bucket", (F.col("_t_us") / b_us).cast("long")
    )
    matched = iv.join(ev, "_bucket").filter(
        (F.col("_t_us") >= F.col("_s_us")) & (F.col("_t_us") < F.col("_e_us"))
    )
    keep_iv = [c for c in intervals.columns]
    keep_ev = [c for c in events.columns if c != event_ts_col]
    return matched.select(
        *keep_iv, *keep_ev, F.col("_t_us").alias("event_ts_us")
    )
