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
    return F.concat(_turn_header(role, tool), text)


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
