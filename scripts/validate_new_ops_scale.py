"""Scale validation for the round-4 additions: as-of join,
interval-containment join, transcript render / loss spans /
conv-dedup at millions of rows on local[32].

Usage: python scripts/validate_new_ops_scale.py [n_events] [n_turns]
(defaults 10M events / 1M probes, 10M turns). Prints one JSON line
per op: rows in/out, wall seconds, rows/sec, plus invariant checks
(as-of monotonicity sample, interval containment exactness on a
sampled interval, render turn-count conservation). Run on an
otherwise-idle host; the bench canary (bench._cpu_canary) is printed
first so the record shows window quality.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    n_probes = max(n_events // 10, 1)

    import bench  # noqa: E402  (repo root on path)
    print(json.dumps({"canary_hashes_per_sec": round(bench._cpu_canary(), 1)}))

    from pyspark.sql import functions as F

    from quickwit_spark.pipeline.events import asof_join, interval_join
    from quickwit_spark.pipeline.transcripts import (
        assistant_spans,
        dedup_conversations,
        render_conversations,
    )
    from quickwit_spark.session import get_spark

    spark = get_spark("scale-new-ops", cpus=32)

    def timed(name, df, n_in):
        t0 = time.time()
        n_out = df.count()
        dt = time.time() - t0
        print(json.dumps({
            "op": name, "rows_in": n_in, "rows_out": n_out,
            "sec": round(dt, 2), "rows_in_per_sec": round(n_in / dt, 1),
        }))
        return n_out

    # --- events + probes (deterministic, sized by args) -----------------
    ev = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 100_000).cast("int").alias("user_id"),
        F.expr(
            "timestamp'2024-01-01 00:00:00'"
            " + make_interval(0,0,0,0,0,0, CAST(id % 2592000 AS INT))"
        ).alias("ts"),
        (F.col("id") % 7).cast("double").alias("value"),
        F.lit("click").alias("event_type"),
    )
    probes = spark.range(n_probes).select(
        F.col("id").alias("probe_id"),
        (F.col("id") % 100_000).cast("int").alias("user_id"),
        F.expr(
            "timestamp'2024-01-01 00:00:00'"
            " + make_interval(0,0,0,0,0,0, CAST((id * 37) % 2592000 AS INT))"
        ).alias("ts"),
    )

    out = asof_join(probes, ev, payload_cols=("event_id",))
    timed("asof_join", out, n_events + n_probes)
    # invariant: every matched event precedes its probe
    bad = (
        out.where(F.col("asof_ts_us").isNotNull())
        .where(
            F.col("asof_ts_us")
            > F.unix_micros(F.col("ts").cast("timestamp_ltz"))
        )
        .count()
    )
    assert bad == 0, f"{bad} as-of rows violate event_ts <= probe_ts"

    iv = spark.range(20_000).select(
        F.col("id").alias("interval_id"),
        F.expr(
            "timestamp'2024-01-01 00:00:00'"
            " + make_interval(0,0,0,0,0, CAST(id * 2 AS INT), 0)"
        ).alias("start_ts"),
        F.expr(
            "timestamp'2024-01-01 00:00:00'"
            " + make_interval(0,0,0,0,0, CAST(id * 2 + 1 AS INT), 0)"
        ).alias("end_ts"),
    )
    pairs = interval_join(iv, ev, bucket_minutes=2)
    timed("interval_join", pairs.groupBy("interval_id").count(), n_events)
    # containment exactness on a sampled interval: the bucketized join
    # must agree with a direct range filter, and every matched event
    # must actually lie inside its interval
    probe_iv = iv.where(F.col("interval_id") == 123).first()
    got = pairs.where(F.col("interval_id") == 123).count()
    want = ev.where(
        (F.col("ts") >= F.lit(probe_iv.start_ts))
        & (F.col("ts") < F.lit(probe_iv.end_ts))
    ).count()
    assert got == want, (got, want)
    outside = pairs.where(
        (F.col("event_ts_us")
         < F.unix_micros(F.col("start_ts").cast("timestamp_ltz")))
        | (F.col("event_ts_us")
           >= F.unix_micros(F.col("end_ts").cast("timestamp_ltz")))
    ).count()
    assert outside == 0, f"{outside} pairs violate containment"

    # --- transcripts at n_turns -----------------------------------------
    turns = spark.range(n_turns).select(
        F.concat(F.lit("c"), (F.col("id") % 500_000).cast("string")).alias(
            "conv_id"
        ),
        F.expr("CAST(id DIV 500000 AS INT)").alias("turn_idx"),
        F.expr(
            "CASE WHEN (id DIV 500000) % 2 = 0 THEN 'user'"
            " ELSE 'assistant' END"
        ).alias("role"),
        F.concat(
            F.lit("w"), (F.col("id") % 997).cast("string"),
            F.lit(" the quick brown fox jumps over the lazy dog "),
            (F.col("id") % 31).cast("string"),
        ).alias("text"),
        F.expr("CASE WHEN id % 11 = 0 THEN 'search' END").alias("tool"),
        F.expr(
            "timestamp'2025-01-01 00:00:00'"
            " + make_interval(0,0,0,0,0,0, CAST(id % 86400 AS INT))"
        ).alias("ts"),
    )
    rendered = render_conversations(turns)
    timed("render_conversations", rendered, n_turns)
    total_turns = rendered.agg(F.sum("n_turns")).first()[0]
    assert total_turns == n_turns, (total_turns, n_turns)

    timed("assistant_spans", assistant_spans(turns), n_turns)
    timed("dedup_conversations", dedup_conversations(turns), n_turns)

    spark.stop()
    print(json.dumps({"status": "ok"}))


if __name__ == "__main__":
    main()
