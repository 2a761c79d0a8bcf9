"""Conversation-transcript operators: chat-template rendering,
assistant loss-mask spans, turn-budget truncation, per-conversation
statistics, conversation-level dedup, and sliding context windows.

The input is the transcript table shape the engine indexes
(``conv_id:string, turn_idx:int, role:string, text:string,
tool:string, ts:timestamp`` — the same stable (conv_id, turn_idx)
ordering the index build keys docids on, see operators/build.py).
These are the turns-table curation ops a training pipeline runs
BEFORE indexing / packing: render turns into a model-ready string,
compute which token spans belong to assistant turns (loss masking),
cut conversations to a token budget at turn boundaries, and drop
whole duplicate conversations.

All pure built-in-function plans (whole-stage codegen, zero Python).
Scale story: every op here shuffles AT MOST once, on ``conv_id`` —
the natural conversation partitioning — with narrow maps on either
side; window ops use (conv_id, turn_idx) ordering inside each
partition. Conversations are bounded (thousands of turns, not
billions), so per-key state stays small and skew is structural, not
data-driven. Each op has an ANSI-SQL twin in
``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .textstats import tokens_col

# chat-template markers: '<|role|>' or '<|role:tool|>' when the turn
# carries a tool call; turns joined with a newline
_TURN_SEP = "\n"


def _turn_header(role, tool):
    """``<|role|>`` / ``<|role:tool|>`` rendered from column exprs."""
    return F.concat(
        F.lit("<|"),
        role,
        F.when(tool.isNotNull(), F.concat(F.lit(":"), tool)).otherwise(F.lit("")),
        F.lit("|>"),
    )


def _turn_line(role, tool, text):
    # NULL text renders as an empty body (not a NULL line): a NULL line
    # would vanish from concat_ws/array_join joins and collapse distinct
    # transcripts onto one digest in the prefix/divergence ops. The
    # oracle _line() helper coalesces identically.
    return F.concat(_turn_header(role, tool), F.coalesce(text, F.lit("")))


def render_conversations(
    turns: DataFrame,
    conv_col: str = "conv_id",
) -> DataFrame:
    """Render each conversation into one model-ready training string:
    turns sorted by ``turn_idx``, each prefixed ``<|role|>`` (or
    ``<|role:tool|>``), joined with newlines.

    One shuffle on ``conv_id``; the sort happens inside each group via
    ``array_sort`` over (turn_idx, line) structs, so no global sort.
    Returns (conv_id, n_turns, rendered).
    """
    line = _turn_line(F.col("role"), F.col("tool"), F.col("text"))
    grouped = turns.groupBy(conv_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("turn_idx"), line.alias("line")))
        ).alias("_t")
    )
    return grouped.select(
        conv_col,
        F.size("_t").cast("long").alias("n_turns"),
        F.concat_ws(_TURN_SEP, F.transform("_t", lambda t: t["line"])).alias(
            "rendered"
        ),
    )


def _cum_tokens(turns: DataFrame, conv_col: str) -> DataFrame:
    """turns + (n_tok, tok_end) where tok_end is the cumulative token
    count through this turn in (conv_id, turn_idx) order — the offsets
    a packer sees when conversations are concatenated turn-by-turn."""
    w = (
        Window.partitionBy(conv_col)
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return turns.withColumn(
        "n_tok", F.size(tokens_col("text")).cast("long")
    ).withColumn("tok_end", F.sum("n_tok").over(w))


def assistant_spans(
    turns: DataFrame,
    conv_col: str = "conv_id",
    loss_role: str = "assistant",
) -> DataFrame:
    """Loss-mask spans: for each turn whose role is ``loss_role``, the
    half-open token span [tok_start, tok_end) it occupies in the
    conversation's concatenated token stream — the spans a
    train-on-assistant-only masking step keeps.

    One shuffle (the window partition on conv_id); token counts are a
    narrow map. Returns (conv_id, turn_idx, tok_start, tok_end).
    """
    df = _cum_tokens(turns, conv_col)
    return df.filter(F.col("role") == loss_role).select(
        conv_col,
        "turn_idx",
        (F.col("tok_end") - F.col("n_tok")).alias("tok_start"),
        "tok_end",
    )


def truncate_to_budget(
    turns: DataFrame,
    max_tokens: int,
    conv_col: str = "conv_id",
) -> DataFrame:
    """Cut each conversation to a token budget at TURN boundaries:
    keep the maximal prefix of turns (in turn_idx order) whose total
    token count stays <= ``max_tokens``. Never splits a turn — the
    packing ops (packing.py) handle intra-sequence chunking; this is
    the conversation-level context-length gate.

    Same single conv_id window as :func:`assistant_spans`.
    Returns the kept turns + (n_tok, tok_end).
    """
    return _cum_tokens(turns, conv_col).filter(
        F.col("tok_end") <= F.lit(int(max_tokens))
    )


def conversation_stats(
    turns: DataFrame,
    conv_col: str = "conv_id",
) -> DataFrame:
    """Per-conversation curation statistics: turn counts by role, tool
    call count, token totals, mean assistant-turn tokens, and the
    conversation's wall-clock span in seconds (integer microsecond
    arithmetic — no fractional-epoch drift between engines).

    One aggregation shuffle on conv_id, partial aggregates map-side.
    """
    n_tok = F.size(tokens_col("text")).cast("long")
    is_asst = (F.col("role") == "assistant").cast("long")
    return turns.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum((F.col("role") == "user").cast("long")).alias("n_user"),
        F.sum(is_asst).alias("n_assistant"),
        F.sum(F.col("tool").isNotNull().cast("long")).alias("n_tool_calls"),
        F.sum(n_tok).alias("n_tokens"),
        F.round(
            F.sum(F.when(F.col("role") == "assistant", n_tok).otherwise(0))
            / F.greatest(F.sum(is_asst), F.lit(1)),
            6,
        ).alias("avg_assistant_tokens"),
        (
            (
                F.max(F.col("ts").cast("timestamp_ltz").cast("long"))
                - F.min(F.col("ts").cast("timestamp_ltz").cast("long"))
            )
        ).alias("span_seconds"),
    )


def dedup_conversations(
    turns: DataFrame,
    conv_col: str = "conv_id",
) -> DataFrame:
    """Conversation-LEVEL exact dedup: two conversations are duplicates
    iff their full rendered transcripts (role+tool headers included,
    turn order respected) are byte-identical. The canonical survivor
    is the lexicographically smallest conv_id in each group — the same
    deterministic keep rule as doc-level exact_dedup (dedup.py).

    Two shuffles total: render (conv_id) then group (digest) — both
    keyed aggregations with map-side partials; digest groups are tiny.
    Returns (conv_id, canonical_conv_id, dup_group_size).
    """
    rendered = render_conversations(turns, conv_col)
    digest = rendered.select(
        conv_col, F.md5(F.col("rendered")).alias("_digest")
    )
    groups = digest.groupBy("_digest").agg(
        F.min(conv_col).alias("canonical_conv_id"),
        F.count(F.lit(1)).cast("long").alias("dup_group_size"),
    )
    return digest.join(groups, "_digest").select(
        conv_col, "canonical_conv_id", "dup_group_size"
    )


def _prefix_rows(
    turns: DataFrame, conv_col: str, max_depth: int | None
) -> DataFrame:
    """(conv_id, n_turns, depth, _ph) — one row per conversation per
    prefix depth 1..min(n_turns, max_depth); ``_ph`` is the digest of
    the '|'-joined per-line digests (fixed-width elements, never the
    raw texts). One conv shuffle; per-conversation work is
    O(min(n_turns, max_depth)^2) over 32-char digests."""
    line_digest = F.md5(_turn_line(F.col("role"), F.col("tool"), F.col("text")))
    grouped = turns.groupBy(conv_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("turn_idx"), line_digest.alias("lh")))
        ).alias("_t")
    ).select(
        conv_col,
        F.size("_t").cast("long").alias("n_turns"),
        (
            F.slice(F.transform("_t", lambda t: t["lh"]), 1, int(max_depth))
            if max_depth is not None
            else F.transform("_t", lambda t: t["lh"])
        ).alias("_h"),
    )
    return grouped.select(
        conv_col,
        "n_turns",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("_h")),
                lambda i: F.md5(
                    F.array_join(F.slice(F.col("_h"), F.lit(1), i), "|")
                ),
            )
        ).alias("_pos", "_ph"),
    ).select(
        conv_col, "n_turns", (F.col("_pos") + 1).cast("long").alias("depth"), "_ph"
    )


def shared_prefix_depth(
    turns: DataFrame,
    conv_col: str = "conv_id",
    max_depth: int | None = None,
) -> DataFrame:
    """Shared-prefix analysis: for each conversation, how deep a turn
    prefix (rendered lines in turn order, role/tool headers included)
    is shared byte-identically with at least one OTHER conversation.

    Agent rollouts routinely share long identical prefixes (same system
    preamble / few-shot turns, branching later); a curation pipeline
    uses this to find templated spam and retried-rollout families. Two
    conversations share depth ``d`` iff their first ``d`` rendered
    lines are pairwise identical.

    Plan: per-conversation sorted line-digest array (one conv shuffle),
    prefix digests computed in one pass per conversation (digest of the
    joined per-line digests — O(depth) fixed-width elements, never the
    raw texts), posexplode to (depth, prefix_digest) rows, one keyed
    count per (depth, digest), join back, per-conv max. All keyed
    aggregations with map-side partials; no self-join, no cross
    product. ``max_depth`` bounds per-conversation work (prefix rows =
    min(n_turns, max_depth)) — at 10^12 turns cap it (e.g. 64): shared
    prefixes deeper than the cap still report as depth == max_depth.

    Returns (conv_id, n_turns, shared_depth, n_sharers): the deepest
    shared depth (0 if no other conversation shares even turn 1) and
    the number of conversations (self included) sharing that deepest
    prefix (1 when shared_depth is 0).
    """
    prefixes = _prefix_rows(turns, conv_col, max_depth)
    counts = prefixes.groupBy("depth", "_ph").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    joined = prefixes.join(counts, ["depth", "_ph"])
    best = joined.groupBy(conv_col).agg(
        F.max("n_turns").alias("n_turns"),
        F.max(
            F.when(F.col("cnt") >= 2, F.struct(F.col("depth"), F.col("cnt")))
        ).alias("_best"),
    )
    return best.select(
        conv_col,
        "n_turns",
        F.coalesce(F.col("_best.depth"), F.lit(0)).cast("long").alias(
            "shared_depth"
        ),
        F.coalesce(F.col("_best.cnt"), F.lit(1)).cast("long").alias("n_sharers"),
    )


def divergence_pairs(
    turns: DataFrame,
    conv_col: str = "conv_id",
    min_depth: int = 1,
    max_depth: int | None = None,
    per_branch: int = 2,
    max_branches: int = 16,
) -> DataFrame:
    """Preference-pair construction at rollout branch points: for every
    pair of conversations whose rendered transcripts agree on exactly
    ``shared_depth >= min_depth`` leading turns and then DIVERGE, emit
    one row with both first divergent turns — the (shared context,
    continuation A, continuation B) shape a DPO/RLHF pairing pipeline
    feeds to preference labeling when multiple rollouts branch from a
    common prefix.

    A pair surfaces at its MAXIMAL shared depth only: at shallower
    depths both conversations carry the same next line (same branch
    digest) and are skipped; beyond it they are never in the same
    prefix group. A conversation that simply ENDS at the shared depth
    pairs against continuations (branch = NULL); two conversations
    that both end there are full duplicates (dedup_conversations'
    territory) and emit nothing.

    Scale guards, both deterministic md5 ranks (the LSH `max_bucket`
    pattern): ``per_branch`` caps conversations kept per distinct
    continuation within a prefix group, ``max_branches`` caps distinct
    continuations per group — so one viral prefix with B branches
    yields at most C(min(B, max_branches) * per_branch, 2) pairs
    instead of quadratic blowup. ``max_depth`` bounds per-conversation
    prefix work as in :func:`shared_prefix_depth` — but note the
    COVERAGE consequence: a pair whose true branch point lies DEEPER
    than ``max_depth`` is NOT emitted at all (at depth == max_depth
    both sides still carry the same next line, so they are filtered as
    same-continuation, and deeper prefix rows are never computed).
    :func:`shared_prefix_depth` still reports such capped families at
    shared_depth == max_depth; callers of the capped 10^12-turn path
    who need those deep-branching families should detect them there
    (shared_depth == max_depth) and re-run :func:`divergence_pairs` on
    that small subset with a larger cap. The pair self-join is keyed
    on (depth, prefix digest) — no cross product.

    Returns (conv_a, conv_b, shared_depth, branch_a, branch_b) with
    conv_a < conv_b; branch_* is the rendered first divergent line or
    NULL when that side ended at the shared depth.
    """
    prefixes = _prefix_rows(turns, conv_col, max_depth)
    lines = turns.select(
        F.col(conv_col).alias("_lc"),
        F.col("turn_idx"),
        _turn_line(F.col("role"), F.col("tool"), F.col("text")).alias("_line"),
    ).withColumn(
        "_rank",
        F.row_number().over(
            Window.partitionBy("_lc").orderBy("turn_idx")
        ).cast("long"),
    )
    cand = prefixes.filter(F.col("depth") >= int(min_depth)).join(
        lines,
        (prefixes[conv_col] == lines["_lc"])
        & (lines["_rank"] == prefixes["depth"] + 1),
        "left",
    ).select(
        conv_col,
        "depth",
        "_ph",
        F.col("_line").alias("_branch"),
        F.coalesce(F.md5("_line"), F.lit("<END>")).alias("_bd"),
    )
    # deterministic caps: per_branch convs per continuation, then
    # max_branches continuations per prefix group
    w_conv = Window.partitionBy("depth", "_ph", "_bd").orderBy(
        F.md5(F.concat_ws("|", F.col(conv_col), F.col("_ph")))
    )
    kept = cand.withColumn("_cr", F.row_number().over(w_conv)).filter(
        F.col("_cr") <= int(per_branch)
    )
    w_branch = Window.partitionBy("depth", "_ph").orderBy(
        F.md5(F.concat_ws("~", F.col("_bd"), F.col("_ph")))
    )
    kept = kept.withColumn(
        "_br", F.dense_rank().over(w_branch)
    ).filter(F.col("_br") <= int(max_branches))
    a = kept.select(
        F.col(conv_col).alias("conv_a"),
        F.col("depth"),
        F.col("_ph"),
        F.col("_branch").alias("branch_a"),
        F.col("_bd").alias("_bd_a"),
    )
    b = kept.select(
        F.col(conv_col).alias("conv_b"),
        F.col("depth"),
        F.col("_ph"),
        F.col("_branch").alias("branch_b"),
        F.col("_bd").alias("_bd_b"),
    )
    return (
        a.join(b, ["depth", "_ph"])
        .filter(
            (F.col("conv_a") < F.col("conv_b"))
            & (F.col("_bd_a") != F.col("_bd_b"))
        )
        .select(
            "conv_a",
            "conv_b",
            F.col("depth").alias("shared_depth"),
            "branch_a",
            "branch_b",
        )
    )


def turn_loops(
    turns: DataFrame,
    conv_col: str = "conv_id",
    role: str | None = "assistant",
    min_run: int = 2,
) -> DataFrame:
    """Stuck-agent loop detection: runs of consecutive byte-identical
    turns within each conversation. With ``role`` set (default
    'assistant'), only that role's turns are considered and
    consecutiveness is in that role's own turn order — the standard
    "agent repeating the same message" curation gate; with
    ``role=None`` runs compare (role, text) pairs over all turns.

    One conv_id window (lag + running sum to assign run ids), one
    keyed run-length aggregation, one per-conversation rollup — no
    self-joins; per-conversation state is O(turns in the conversation).

    Returns (conv_id, n_turns_seen, max_run, n_loops, n_loop_turns):
    the longest identical run, the number of runs of length >=
    ``min_run``, and the total turns inside such runs. Conversations
    with zero matching-role turns are absent from the output.
    """
    df = turns if role is None else turns.filter(F.col("role") == role)
    w = Window.partitionBy(conv_col).orderBy("turn_idx")
    # null-safe comparisons: a run of identical NULL-text turns (e.g. a
    # stuck tool-only agent) is still a loop; the first row of each
    # conversation always starts a run (lag(turn_idx) is null there)
    same = F.lag("text").over(w).eqNullSafe(F.col("text")) & F.lag(
        "role"
    ).over(w).eqNullSafe(F.col("role"))
    df = df.withColumn(
        "_chg",
        F.when(
            F.lag("turn_idx").over(w).isNull() | ~same, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    df = df.withColumn(
        "_run",
        F.sum("_chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = df.groupBy(conv_col, "_run").agg(
        F.count(F.lit(1)).cast("long").alias("run_len")
    )
    loop = F.col("run_len") >= int(min_run)
    return runs.groupBy(conv_col).agg(
        F.sum("run_len").cast("long").alias("n_turns_seen"),
        F.max("run_len").cast("long").alias("max_run"),
        F.sum(loop.cast("long")).cast("long").alias("n_loops"),
        F.sum(F.when(loop, F.col("run_len")).otherwise(0))
        .cast("long")
        .alias("n_loop_turns"),
    )


def transcript_lint(
    turns: DataFrame,
    conv_col: str = "conv_id",
) -> DataFrame:
    """Structural validation of chat training data, per conversation:
    empty turns (NULL or whitespace-only text), adjacent same-role turns
    (broken user/assistant alternation), timestamp regressions (ts
    earlier than the previous turn's), and MISSING metadata — NULL ts
    or NULL role turns. A NULL ts is invisible to the regression
    comparison and a NULL role is invisible to the repeat comparison
    (SQL NULL semantics on both engines), so for a structural gate they
    are hazards in their own right and counted explicitly. ``ok`` is 1
    iff all five counts are zero AND the conversation opens with a user
    turn (the n_null_role == 0 conjunct keeps ok non-NULL even when
    first_role is NULL).

    One conv_id window (two lags), one keyed rollup; whole-stage
    codegen throughout.

    Returns (conv_id, n_turns, n_empty_turns, n_role_repeats,
    n_ts_regressions, n_null_ts, n_null_role, first_role, ok).
    """
    w = Window.partitionBy(conv_col).orderBy("turn_idx")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    df = turns.select(
        conv_col,
        F.col("turn_idx"),
        F.col("role"),
        # NULL text counts as empty (and keeps the counts/ok non-NULL)
        (F.col("text").isNull() | (F.trim(F.col("text")) == ""))
        .cast("long")
        .alias("_empty"),
        (F.lag("role").over(w) == F.col("role")).cast("long").alias("_rep"),
        # microsecond epoch comparison: sub-second regressions count
        (ts_us < F.lag(ts_us).over(w)).cast("long").alias("_reg"),
        F.col("ts").isNull().cast("long").alias("_null_ts"),
        F.col("role").isNull().cast("long").alias("_null_role"),
    )
    agg = df.groupBy(conv_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum("_empty").cast("long").alias("n_empty_turns"),
        F.coalesce(F.sum("_rep"), F.lit(0)).cast("long").alias("n_role_repeats"),
        F.coalesce(F.sum("_reg"), F.lit(0)).cast("long").alias(
            "n_ts_regressions"
        ),
        F.sum("_null_ts").cast("long").alias("n_null_ts"),
        F.sum("_null_role").cast("long").alias("n_null_role"),
        # first_role = the role AT the minimum turn_idx, NULL included
        # — built as a struct-min so the semantics are explicit and
        # cross-engine (DuckDB's arg_min SKIPS NULL values, Spark's
        # min_by keeps them; the oracle mirrors this struct-min form)
        F.min(F.struct(F.col("turn_idx"), F.col("role")))["role"].alias(
            "first_role"
        ),
    )
    ok = (
        (F.col("n_empty_turns") == 0)
        & (F.col("n_role_repeats") == 0)
        & (F.col("n_ts_regressions") == 0)
        & (F.col("n_null_ts") == 0)
        & (F.col("n_null_role") == 0)
        & (F.col("first_role") == "user")
    )
    return agg.withColumn("ok", ok.cast("long"))


def curate_transcripts(
    turns: DataFrame,
    conv_col: str = "conv_id",
    loop_run_limit: int = 3,
    family_depth: int = 2,
    per_family: int = 1,
) -> DataFrame:
    """Composed end-to-end agent-data curation gate, one verdict row per
    conversation. Stages, in priority order (first failure wins):

    1. ``lint`` — structural hazards (:func:`transcript_lint` ok == 0);
    2. ``loop`` — a stuck agent (an assistant message repeated
       ``loop_run_limit``+ times consecutively, :func:`turn_loops`);
    3. ``duplicate`` — byte-identical rendered transcript of a
       lint/loop-surviving conversation with a smaller conv_id
       (:func:`dedup_conversations` canonical-keeper rule);
    4. ``prefix_family`` — templated spam: among survivors whose first
       ``family_depth`` rendered turns are identical, keep the
       ``per_family`` smallest md5-ranked conversations and drop the
       rest (conversations shorter than ``family_depth`` turns carry
       no family and always pass this stage).

    Later stages are computed over the SURVIVORS of earlier ones (a
    duplicate of a lint-dropped conversation reports 'lint', and its
    canonical is chosen among survivors only) — the same staged
    semantics as the corpus-side composed ingest gate.

    Scale: each stage is the underlying operator's plan (keyed
    aggregations and windows on conv_id / digest keys); the
    composition adds only conv-count-sized semi-joins between stages.

    Returns (conv_id, kept, reason): kept 1/0, reason in
    ('lint', 'loop', 'duplicate', 'prefix_family') or NULL when kept.
    """
    lint = transcript_lint(turns, conv_col).select(conv_col, "ok")
    loops = turn_loops(turns, conv_col).select(conv_col, "max_run")
    # conversations with no assistant turns have no loops row: max_run 1
    s1 = lint.join(loops, conv_col, "left").select(
        conv_col,
        F.when(F.col("ok") == 0, F.lit("lint"))
        .when(
            F.coalesce(F.col("max_run"), F.lit(1)) >= int(loop_run_limit),
            F.lit("loop"),
        )
        .alias("_r1"),
    )
    surv1 = s1.filter(F.col("_r1").isNull()).select(conv_col)
    turns1 = turns.join(surv1, conv_col, "left_semi")
    dd = dedup_conversations(turns1, conv_col).select(
        conv_col,
        F.when(
            F.col(conv_col) != F.col("canonical_conv_id"), F.lit("duplicate")
        ).alias("_r2"),
    )
    surv2 = dd.filter(F.col("_r2").isNull()).select(conv_col)
    turns2 = turns.join(surv2, conv_col, "left_semi")
    fam = _prefix_rows(turns2, conv_col, max_depth=int(family_depth)).filter(
        F.col("depth") == int(family_depth)
    )
    w_fam = Window.partitionBy("_ph").orderBy(
        F.md5(F.concat_ws("|", F.col(conv_col), F.col("_ph")))
    )
    fam = fam.select(
        conv_col,
        F.when(
            F.row_number().over(w_fam) > int(per_family),
            F.lit("prefix_family"),
        ).alias("_r3"),
    )
    out = (
        s1.join(dd.select(conv_col, "_r2"), conv_col, "left")
        .join(fam, conv_col, "left")
        .select(
            conv_col,
            F.coalesce("_r1", "_r2", "_r3").alias("reason"),
        )
    )
    return out.select(
        conv_col,
        F.col("reason").isNull().cast("long").alias("kept"),
        "reason",
    )


def context_windows(
    turns: DataFrame,
    k_prev: int = 2,
    conv_col: str = "conv_id",
    target_role: str = "assistant",
) -> DataFrame:
    """Sliding training samples: for each ``target_role`` turn, render
    the previous ``k_prev`` turns plus the turn itself (in turn order)
    as one context string — the (context -> completion) sample shape a
    turn-level SFT pipeline emits.

    One conv_id window; the frame is rows-bounded so per-row state is
    O(k_prev). The collected frame is re-sorted by turn_idx before
    joining, so the output does not depend on collect order.
    Returns (conv_id, turn_idx, context).
    """
    w = (
        Window.partitionBy(conv_col)
        .orderBy("turn_idx")
        .rowsBetween(-int(k_prev), Window.currentRow)
    )
    line = _turn_line(F.col("role"), F.col("tool"), F.col("text"))
    df = turns.withColumn(
        "_frame",
        F.collect_list(F.struct(F.col("turn_idx"), line.alias("line"))).over(w),
    )
    return df.filter(F.col("role") == target_role).select(
        conv_col,
        "turn_idx",
        F.concat_ws(
            _TURN_SEP,
            F.transform(F.array_sort("_frame"), lambda t: t["line"]),
        ).alias("context"),
    )
