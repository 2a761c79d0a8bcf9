"""As-of join and bucketized interval (range) join
(pipeline/events.py) — hand-checked semantics on fixed fixtures:
<=-inclusive as-of with deterministic ties, half-open interval
containment, and the one-equi-join scale plan."""

import datetime as dt

import pytest
from pyspark.sql import types as T

from quickwit_spark.pipeline.events import asof_join, interval_join

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.IntegerType()),
        T.StructField("event_type", T.StringType()),
    ]
)


def _t(m, s=0):
    return dt.datetime(2024, 1, 1, 0, m, s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (1, _t(0), 7, "signup"),
        (2, _t(10), 7, "click"),
        (3, _t(10), 7, "purchase"),  # same instant as #2: higher id wins
        (4, _t(30), 7, "error"),
        (5, _t(5), 8, "signup"),
    ]
    return spark.createDataFrame(rows, EV_SCHEMA)


def test_asof_join_semantics(spark, events):
    probes = spark.createDataFrame(
        [
            (100, 7, _t(9, 59)),   # before the minute-10 pair -> event 1
            (101, 7, _t(10)),      # exactly at ts: <= includes; id 3 wins tie
            (102, 7, _t(29, 59)),  # still event 3
            (103, 7, _t(59)),      # after everything -> event 4
            (104, 8, _t(4)),       # before user 8's only event -> NULL
            (105, 9, _t(30)),      # unknown user -> NULL
        ],
        T.StructType(
            [
                T.StructField("probe_id", T.LongType()),
                T.StructField("user_id", T.IntegerType()),
                T.StructField("ts", T.TimestampType()),
            ]
        ),
    )
    out = {
        r.probe_id: (r.asof_event_id, r.asof_event_type)
        for r in asof_join(probes, events).collect()
    }
    assert out[100] == (1, "signup")
    assert out[101] == (3, "purchase")
    assert out[102] == (3, "purchase")
    assert out[103] == (4, "error")
    assert out[104] == (None, None)
    assert out[105] == (None, None)


def test_asof_join_single_shuffle(spark, events):
    probes = events.select("user_id", "ts", events.event_id.alias("probe_id"))
    plan = (
        asof_join(probes, events)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # union-and-carry-forward: exactly one Exchange (the window's
    # hash partition on the key) and no join node at all
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_interval_join(spark, events):
    intervals = spark.createDataFrame(
        [
            (0, _t(0), _t(10)),    # [00:00, 00:10): events 1 (not 2/3)
            (1, _t(5), _t(35)),    # events 2,3,4,5
            (2, _t(40), _t(50)),   # empty
        ],
        T.StructType(
            [
                T.StructField("interval_id", T.LongType()),
                T.StructField("start_ts", T.TimestampType()),
                T.StructField("end_ts", T.TimestampType()),
            ]
        ),
    )
    out = interval_join(intervals, events, bucket_minutes=15)
    got = sorted((r.interval_id, r.event_id) for r in out.collect())
    assert got == [(0, 1), (0, 5), (1, 2), (1, 3), (1, 4), (1, 5)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the scale plan: an equi-join on the bucket id, never a
    # broadcast-nested-loop / cartesian theta join
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
