"""Conversation-transcript curation ops (pipeline/transcripts.py):
rendering, loss spans, turn-budget truncation, stats, conv-level
dedup, sliding context windows — hand-checked on a tiny fixed fixture."""

import datetime as dt

import pytest
from pyspark.sql import functions as F, types as T

from quickwit_spark.pipeline.transcripts import (
    assistant_spans,
    context_windows,
    conversation_stats,
    dedup_conversations,
    render_conversations,
    truncate_to_budget,
)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _ts(m):
    return dt.datetime(2025, 1, 1, 0, m)


@pytest.fixture(scope="module")
def turns(spark):
    rows = [
        # conv a: user/assistant/user/assistant, one tool call
        ("a", 0, "user", "hello there", None, _ts(0)),
        ("a", 1, "assistant", "hi how can I help", None, _ts(1)),
        ("a", 2, "user", "find the answer", None, _ts(2)),
        ("a", 3, "assistant", "searching now", "search", _ts(3)),
        # conv b: single exchange
        ("b", 0, "user", "ping", None, _ts(10)),
        ("b", 1, "assistant", "pong", None, _ts(12)),
        # conv c: byte-identical replay of conv b (dup group)
        ("c", 0, "user", "ping", None, _ts(20)),
        ("c", 1, "assistant", "pong", None, _ts(25)),
    ]
    # out-of-order insert: ops must sort by turn_idx themselves
    rows = rows[::-1]
    return spark.createDataFrame(rows, SCHEMA)


def test_render(turns):
    out = {r.conv_id: r for r in render_conversations(turns).collect()}
    assert out["a"].n_turns == 4
    assert out["a"].rendered == (
        "<|user|>hello there\n<|assistant|>hi how can I help\n"
        "<|user|>find the answer\n<|assistant:search|>searching now"
    )
    assert out["b"].rendered == "<|user|>ping\n<|assistant|>pong"
    assert out["b"].rendered == out["c"].rendered


def test_assistant_spans(turns):
    rows = {
        (r.conv_id, r.turn_idx): (r.tok_start, r.tok_end)
        for r in assistant_spans(turns).collect()
    }
    # conv a token stream: [hello there][hi how can i help][find the
    # answer][searching now] -> cumulative 2, 7, 10, 12
    assert rows[("a", 1)] == (2, 7)
    assert rows[("a", 3)] == (10, 12)
    assert rows[("b", 1)] == (1, 2)
    assert ("a", 0) not in rows  # user turns carry no loss


def test_truncate_to_budget(turns):
    kept = truncate_to_budget(turns, max_tokens=8)
    got = sorted((r.conv_id, r.turn_idx) for r in kept.collect())
    # conv a: turns 0 (cum 2) and 1 (cum 7) fit; turn 2 (cum 10) does not
    assert got == [("a", 0), ("a", 1), ("b", 0), ("b", 1), ("c", 0), ("c", 1)]
    # never splits a turn: tok_end of every kept row <= budget
    assert all(r.tok_end <= 8 for r in kept.collect())


def test_conversation_stats(turns):
    out = {r.conv_id: r for r in conversation_stats(turns).collect()}
    a = out["a"]
    assert (a.n_turns, a.n_user, a.n_assistant, a.n_tool_calls) == (4, 2, 2, 1)
    assert a.n_tokens == 12
    assert a.avg_assistant_tokens == pytest.approx((5 + 2) / 2)
    assert a.span_seconds == 180
    assert out["c"].span_seconds == 300


def test_dedup_conversations(turns):
    out = {r.conv_id: r for r in dedup_conversations(turns).collect()}
    assert out["b"].canonical_conv_id == "b"
    assert out["c"].canonical_conv_id == "b"  # replay collapses onto b
    assert out["c"].dup_group_size == 2
    assert out["a"].canonical_conv_id == "a"
    assert out["a"].dup_group_size == 1


def test_context_windows(turns):
    out = {
        (r.conv_id, r.turn_idx): r.context
        for r in context_windows(turns, k_prev=2).collect()
    }
    # assistant turn 3 of conv a sees turns 1..3
    assert out[("a", 3)] == (
        "<|assistant|>hi how can I help\n<|user|>find the answer\n"
        "<|assistant:search|>searching now"
    )
    # first assistant turn sees only the opening user turn + itself
    assert out[("a", 1)] == "<|user|>hello there\n<|assistant|>hi how can I help"
    assert out[("b", 1)] == "<|user|>ping\n<|assistant|>pong"


def test_plans_stay_jvm_side(turns):
    # zero Python in any of these plans: no BatchEvalPython /
    # ArrowEvalPython / FlatMapsInPandas nodes
    for df in (
        render_conversations(turns),
        assistant_spans(turns),
        truncate_to_budget(turns, 8),
        conversation_stats(turns),
        dedup_conversations(turns),
        context_windows(turns),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "InPandas" not in plan
