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
    curate_transcripts,
    dedup_conversations,
    divergence_pairs,
    render_conversations,
    shared_prefix_depth,
    transcript_lint,
    truncate_to_budget,
    turn_loops,
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


@pytest.fixture(scope="module")
def messy_turns(spark):
    """Planted curation hazards: shared prefixes, an assistant loop,
    an empty turn, a role repeat, a timestamp regression."""
    rows = [
        # p/q/r share a 2-turn system preamble; q/r additionally share
        # turn 2, then diverge; s shares nothing
        ("p", 0, "user", "SYS preamble", None, _ts(0)),
        ("p", 1, "assistant", "ack", None, _ts(1)),
        ("p", 2, "user", "p goes here", None, _ts(2)),
        ("q", 0, "user", "SYS preamble", None, _ts(0)),
        ("q", 1, "assistant", "ack", None, _ts(1)),
        ("q", 2, "user", "shared third turn", None, _ts(2)),
        ("q", 3, "assistant", "q diverges", None, _ts(3)),
        ("r", 0, "user", "SYS preamble", None, _ts(0)),
        ("r", 1, "assistant", "ack", None, _ts(1)),
        ("r", 2, "user", "shared third turn", None, _ts(2)),
        ("r", 3, "assistant", "r diverges", None, _ts(3)),
        # s: stuck agent — 3 identical consecutive assistant turns,
        # plus an empty user turn and a ts regression at turn 4
        ("s", 0, "user", "do the thing", None, _ts(0)),
        ("s", 1, "assistant", "retrying the tool call", "bash", _ts(1)),
        ("s", 2, "assistant", "retrying the tool call", "bash", _ts(2)),
        ("s", 3, "assistant", "retrying the tool call", "bash", _ts(3)),
        ("s", 4, "user", "   ", None, _ts(2)),
        # t: opens with assistant (lint: first_role != user)
        ("t", 0, "assistant", "unprompted", None, _ts(0)),
        ("t", 1, "user", "ok", None, _ts(1)),
    ]
    return spark.createDataFrame(rows[::-1], SCHEMA)


def test_shared_prefix_depth(turns, messy_turns):
    # b and c are byte-identical transcripts: full-depth sharing
    out = {r.conv_id: r for r in shared_prefix_depth(turns).collect()}
    assert (out["b"].shared_depth, out["b"].n_sharers) == (2, 2)
    assert (out["c"].shared_depth, out["c"].n_sharers) == (2, 2)
    assert (out["a"].shared_depth, out["a"].n_sharers) == (0, 1)

    out = {r.conv_id: r for r in shared_prefix_depth(messy_turns).collect()}
    # p shares only the 2-turn preamble (with q and r => 3 sharers);
    # q and r share through turn 2 (depth 3, 2 sharers), diverge at 3
    assert (out["p"].shared_depth, out["p"].n_sharers) == (2, 3)
    assert (out["q"].shared_depth, out["q"].n_sharers) == (3, 2)
    assert (out["r"].shared_depth, out["r"].n_sharers) == (3, 2)
    assert (out["s"].shared_depth, out["s"].n_sharers) == (0, 1)
    assert out["q"].n_turns == 4

    # depth cap: q/r's depth-3 share reports as the cap; the deeper
    # prefix rows are never computed
    capped = {
        r.conv_id: r
        for r in shared_prefix_depth(messy_turns, max_depth=2).collect()
    }
    assert (capped["q"].shared_depth, capped["q"].n_sharers) == (2, 3)
    assert capped["q"].n_turns == 4  # n_turns stays uncapped


def test_turn_loops(messy_turns):
    out = {r.conv_id: r for r in turn_loops(messy_turns).collect()}
    s = out["s"]
    assert (s.n_turns_seen, s.max_run, s.n_loops, s.n_loop_turns) == (3, 3, 1, 3)
    assert (out["q"].max_run, out["q"].n_loops) == (1, 0)
    # role=None compares (role, text) over ALL turns: s's identical
    # assistant turns are still consecutive in the full order
    all_roles = {r.conv_id: r for r in turn_loops(messy_turns, role=None).collect()}
    assert (all_roles["s"].max_run, all_roles["s"].n_loop_turns) == (3, 3)
    assert all_roles["s"].n_turns_seen == 5
    # min_run above the longest run finds nothing
    strict = {r.conv_id: r for r in turn_loops(messy_turns, min_run=4).collect()}
    assert (strict["s"].n_loops, strict["s"].n_loop_turns) == (0, 0)
    assert strict["s"].max_run == 3


def test_divergence_pairs(turns, messy_turns):
    # b and c are byte-identical (both "end" at the shared depth):
    # full duplicates emit NO pair; a shares nothing with them
    assert divergence_pairs(turns).count() == 0

    got = {
        (r.conv_a, r.conv_b): r
        for r in divergence_pairs(messy_turns).collect()
    }
    # each pair exactly once, at its MAXIMAL shared depth
    assert set(got) == {("p", "q"), ("p", "r"), ("q", "r")}
    assert got[("p", "q")].shared_depth == 2
    assert got[("p", "q")].branch_a == "<|user|>p goes here"
    assert got[("p", "q")].branch_b == "<|user|>shared third turn"
    assert got[("q", "r")].shared_depth == 3
    assert got[("q", "r")].branch_a == "<|assistant|>q diverges"
    assert got[("q", "r")].branch_b == "<|assistant|>r diverges"
    # min_depth above every family silences the output
    assert divergence_pairs(messy_turns, min_depth=4).count() == 0

    # ended-rollout pairing: add a conversation that stops exactly at
    # the shared preamble — it pairs against each continuation with a
    # NULL branch, and a byte-identical second ender adds no (e, f) pair
    extra = messy_turns.sparkSession.createDataFrame(
        [
            ("e", 0, "user", "SYS preamble", None, _ts(0)),
            ("e", 1, "assistant", "ack", None, _ts(1)),
            ("f", 0, "user", "SYS preamble", None, _ts(0)),
            ("f", 1, "assistant", "ack", None, _ts(1)),
        ],
        SCHEMA,
    )
    got2 = {
        (r.conv_a, r.conv_b): r
        for r in divergence_pairs(messy_turns.unionByName(extra)).collect()
    }
    assert ("e", "f") not in got2
    assert got2[("e", "p")].branch_a is None
    assert got2[("e", "p")].branch_b == "<|user|>p goes here"
    # caps: per_branch=1 keeps one conversation per continuation —
    # q/r share the depth-2 continuation, so only one of them pairs
    # against p there, and the (q, r) depth-3 pair survives
    capped = divergence_pairs(messy_turns, per_branch=1).collect()
    d2 = [r for r in capped if r.shared_depth == 2]
    assert len(d2) == 1 and {d2[0].conv_a, d2[0].conv_b} < {"p", "q", "r"}
    assert [(r.conv_a, r.conv_b) for r in capped if r.shared_depth == 3] == [
        ("q", "r")
    ]


def test_transcript_lint(turns, messy_turns):
    clean = {r.conv_id: r for r in transcript_lint(turns).collect()}
    assert all(r.ok == 1 for r in clean.values())

    out = {r.conv_id: r for r in transcript_lint(messy_turns).collect()}
    s = out["s"]
    assert s.n_empty_turns == 1  # whitespace-only turn 4
    assert s.n_role_repeats == 2  # assistant turns 2 and 3
    assert s.n_ts_regressions == 1  # turn 4 ts earlier than turn 3
    assert (s.first_role, s.ok) == ("user", 0)
    t = out["t"]
    assert (t.first_role, t.ok) == ("assistant", 0)
    assert (t.n_empty_turns, t.n_role_repeats, t.n_ts_regressions) == (0, 0, 0)
    assert out["p"].ok == 1


def test_null_text_handling(spark):
    """NULL-text turns must not vanish from prefix digests, loop runs,
    or lint counts (review findings: md5(NULL line) used to be skipped
    by array_join, lag equality was not null-safe, and sum over
    all-NULL _empty returned NULL)."""
    rows = [
        # x and y differ ONLY in where the NULL-text turn sits: they
        # must NOT share any prefix (roles differ at turn 0 too)
        ("x", 0, "user", "hello", None, _ts(0)),
        ("x", 1, "assistant", None, "bash", _ts(1)),
        ("y", 0, "user", None, None, _ts(0)),
        ("y", 1, "assistant", "hello", "bash", _ts(1)),
        # z: stuck tool-only agent — 3 consecutive NULL-text assistant
        # turns with the same tool ARE a loop
        ("z", 0, "user", "go", None, _ts(0)),
        ("z", 1, "assistant", None, "bash", _ts(1)),
        ("z", 2, "assistant", None, "bash", _ts(2)),
        ("z", 3, "assistant", None, "bash", _ts(3)),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    pref = {r.conv_id: r for r in shared_prefix_depth(df).collect()}
    assert (pref["x"].shared_depth, pref["y"].shared_depth) == (0, 0)

    loops = {r.conv_id: r for r in turn_loops(df).collect()}
    assert (loops["z"].max_run, loops["z"].n_loop_turns) == (3, 3)

    lint = {r.conv_id: r for r in transcript_lint(df).collect()}
    assert lint["z"].n_empty_turns == 3  # NULL text counts as empty
    assert lint["z"].ok == 0
    assert lint["x"].n_empty_turns == 1 and lint["x"].ok == 0

    # a NULL-text continuation is a real branch, not an ended rollout
    pairs = {
        (r.conv_a, r.conv_b): r for r in divergence_pairs(df).collect()
    }
    assert ("x", "y") not in pairs  # nothing shared
    # x vs a twin sharing turn 0 then diverging into a NULL-text turn
    extra = spark.createDataFrame(
        [
            ("w", 0, "user", "hello", None, _ts(0)),
            ("w", 1, "assistant", "actual words", None, _ts(1)),
        ],
        SCHEMA,
    )
    got = {
        (r.conv_a, r.conv_b): r
        for r in divergence_pairs(df.unionByName(extra)).collect()
    }
    xw = got[("w", "x")]
    assert xw.shared_depth == 1
    assert xw.branch_a == "<|assistant|>actual words"
    assert xw.branch_b == "<|assistant:bash|>"  # NULL body, real branch


def test_curate_transcripts(spark):
    rows = []

    def add(conv, ts_off, *turns):
        for i, (role, text) in enumerate(turns):
            rows.append((conv, i, role, text, None, _ts(ts_off + i)))

    # a/b/c: one 2-turn prefix family; c is a byte-identical replay of b
    add("a", 0, ("user", "SYS"), ("assistant", "ack"), ("user", "a tail"))
    add("b", 0, ("user", "SYS"), ("assistant", "ack"), ("user", "b tail"))
    add("c", 10, ("user", "SYS"), ("assistant", "ack"), ("user", "b tail"))
    # d: lint (opens with assistant); e: loop (3 identical assistant)
    add("d", 0, ("assistant", "SYS"), ("user", "x"))
    add("e", 0, ("user", "q"), ("assistant", "L"), ("user", "q2"),
        ("assistant", "L"), ("user", "q3"), ("assistant", "L"))
    # f: shorter than family_depth -> never a family member
    add("f", 0, ("user", "solo"))
    df = spark.createDataFrame(rows, SCHEMA)

    out = {r.conv_id: r for r in curate_transcripts(df).collect()}
    assert len(out) == 6
    assert out["d"].reason == "lint"
    assert out["e"].reason == "loop"
    assert out["c"].reason == "duplicate"  # canonical b survives
    assert out["f"].kept == 1 and out["f"].reason is None
    # family {a, b}: exactly one kept at per_family=1
    fam = sorted((out["a"].reason, out["b"].reason), key=str)
    assert fam.count(None) == 1 and fam.count("prefix_family") == 1

    # per_family=2 keeps both family members; everything else unchanged
    out2 = {r.conv_id: r for r in curate_transcripts(df, per_family=2).collect()}
    assert out2["a"].kept == 1 and out2["b"].kept == 1
    assert (out2["c"].reason, out2["d"].reason, out2["e"].reason) == (
        "duplicate", "lint", "loop",
    )
    # staged semantics: duplicates drop BEFORE families form, so c never
    # occupies a family slot; and a lint-dropped conv's duplicate
    # reports lint, not duplicate
    dup_of_d = spark.createDataFrame(
        [("g", 0, "assistant", "SYS", None, _ts(50)),
         ("g", 1, "user", "x", None, _ts(51))],
        SCHEMA,
    )
    out3 = {
        r.conv_id: r
        for r in curate_transcripts(df.unionByName(dup_of_d)).collect()
    }
    assert out3["g"].reason == "lint"


def test_subsecond_ts_regression(spark):
    """Sub-second timestamp regressions count (epoch-microsecond
    comparison, not floored seconds)."""
    base = dt.datetime(2025, 1, 1)
    rows = [
        ("a", 0, "user", "t0", None, base + dt.timedelta(milliseconds=900)),
        ("a", 1, "assistant", "t1", None, base + dt.timedelta(milliseconds=200)),
    ]
    out = transcript_lint(spark.createDataFrame(rows, SCHEMA)).collect()[0]
    assert out.n_ts_regressions == 1 and out.ok == 0


def test_null_ts_and_role_are_lint_failures(spark):
    """Missing metadata is itself a structural hazard: a NULL ts is
    invisible to the regression comparison and a NULL role to the
    repeat comparison (SQL NULL semantics), so lint counts them
    explicitly and fails the conversation (advisor finding r4)."""
    rows = [
        # a: NULL ts at turn 1 — no regression fires (NULL compare),
        # but n_null_ts must catch it
        ("a", 0, "user", "hi", None, _ts(0)),
        ("a", 1, "assistant", "yo", None, None),
        ("a", 2, "user", "more", None, _ts(2)),
        # b: NULL role at turn 1 — no repeat fires, n_null_role catches
        ("b", 0, "user", "hi", None, _ts(0)),
        ("b", 1, None, "mystery", None, _ts(1)),
        # c: NULL role at turn 0 — first_role comparison would be NULL;
        # ok must still be a concrete 0, not NULL
        ("c", 0, None, "who", None, _ts(0)),
        ("c", 1, "assistant", "resp", None, _ts(1)),
        # d: clean control
        ("d", 0, "user", "hi", None, _ts(0)),
        ("d", 1, "assistant", "yo", None, _ts(1)),
    ]
    out = {r.conv_id: r for r in transcript_lint(
        spark.createDataFrame(rows, SCHEMA)).collect()}
    a = out["a"]
    assert (a.n_null_ts, a.n_ts_regressions, a.ok) == (1, 0, 0)
    b = out["b"]
    assert (b.n_null_role, b.n_role_repeats, b.ok) == (1, 0, 0)
    c = out["c"]
    assert c.n_null_role == 1
    assert c.ok == 0  # concrete zero, never NULL
    # first_role is the role AT turn 0 — NULL included (struct-min on
    # both engines; arg_min-style NULL skipping would report
    # 'assistant' here)
    assert c.first_role is None
    d = out["d"]
    assert (d.n_null_ts, d.n_null_role, d.ok) == (0, 0, 1)


def test_curate_gates_null_ts(spark):
    """curate_transcripts treats a NULL-ts conversation as a lint
    failure (previously it passed silently — ok was computed only
    from the visible counts)."""
    rows = [
        ("a", 0, "user", "hi", None, _ts(0)),
        ("a", 1, "assistant", "yo", None, None),
        ("b", 0, "user", "hi there", None, _ts(0)),
        ("b", 1, "assistant", "sure", None, _ts(1)),
    ]
    out = {r.conv_id: r for r in curate_transcripts(
        spark.createDataFrame(rows, SCHEMA)).collect()}
    assert (out["a"].kept, out["a"].reason) == (0, "lint")
    assert (out["b"].kept, out["b"].reason) == (1, None)


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
        shared_prefix_depth(turns),
        turn_loops(turns),
        transcript_lint(turns),
        divergence_pairs(turns),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "InPandas" not in plan
