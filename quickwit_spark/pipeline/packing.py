"""Sequence packing — map each document to its position in fixed-length
training sequences (GPT-style concat-and-chunk: shuffle the corpus
deterministically, concatenate the token streams, cut every
``seq_len`` tokens). The output is the doc → (shard, sequence,
offset) assignment a tokenize-and-pack job needs to write training
shards without ever materializing the concatenated stream.

Semantics (all deterministic, no RNG state):

* each doc goes to shard ``H15(seed ':' id) % n_shards`` — this is
  also the corpus shuffle: the (shard, order-key) pair is a
  reproducible pseudo-random global order, bit-stable across engines,
  runs, and partitionings (same ``H15`` md5 hash as dedup/sampling);
* within a shard docs are ordered by ``(H15(seed '~' id), id)`` and
  their token counts cumulated; sequence ``i`` of a shard owns token
  positions ``[i*seq_len, (i+1)*seq_len)`` of that shard's stream —
  docs may straddle sequence boundaries exactly as in pretraining
  concat-and-chunk packing.

Scale (the 100 TB story): ONE hash-partition shuffle (the window's
``partitionBy(shard)``); the per-shard sort is Spark's window sort
(spillable). ``n_shards`` bounds the per-shard stream: at 10^12 turns
pick ``n_shards ≈ total_tokens / 10^8`` so each shard's sort fits an
executor; every other step is a narrow map in whole-stage codegen.
There is no reference analog — this is a training-pipeline op the
rebuild adds alongside dedup/sampling (same contract: ANSI-SQL twin
in ``__spark_entry__.oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from quickwit_spark.pipeline.dedup import H15
from quickwit_spark.pipeline.textstats import tokens_col


def _assignment(
    df: DataFrame,
    seq_len: int,
    n_shards: int,
    id_col: str,
    text_col: str,
    seed: str,
    keep_tokens: bool,
) -> DataFrame:
    """Shared packing plan. ``keep_tokens`` carries the token array
    through the window shuffle (every token must reach the packed
    sequence anyway — strictly cheaper than a join-back that would
    re-shuffle AND re-tokenize)."""
    if seq_len <= 0 or n_shards <= 0:
        raise ValueError("seq_len and n_shards must be positive")
    sid = f"cast({id_col} as string)"
    shard = F.expr(H15.format(x=f"concat('{seed}:', {sid})")) % n_shards
    order_key = F.expr(H15.format(x=f"concat('{seed}~', {sid})"))
    staged = df.select(
        F.col(id_col),
        tokens_col(text_col).alias("_toks"),
        shard.cast("long").alias("shard"),
        order_key.alias("_ord"),
    ).select(
        "*", F.size("_toks").cast("long").alias("n_tokens")
    )
    if not keep_tokens:
        staged = staged.drop("_toks")
    w = (
        Window.partitionBy("shard")
        .orderBy("_ord", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = staged.select(
        *[col for col in staged.columns if col != "_ord"],
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("token_start"),
    )
    # integer `div` on both engines — no double rounding at 10^13+ offsets
    return c.select(
        "*",
        F.expr(f"token_start div {seq_len}").alias("seq_idx"),
        (F.col("token_start") % seq_len).alias("seq_offset"),
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("long")).otherwise(
            F.expr(f"(token_start + n_tokens - 1) div {seq_len}")
            - F.expr(f"token_start div {seq_len}")
            + 1
        ).alias("n_seqs"),
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack0",
) -> DataFrame:
    """Assign each doc its packed position: (shard, seq_idx of the
    doc's FIRST token, seq_offset within that sequence, n_tokens,
    n_seqs = how many sequences the doc spans; 0 for empty docs).

    ``seq_len``/``n_shards``/``seed`` are part of the layout spec —
    the same values always produce the same packing.
    """
    a = _assignment(df, seq_len, n_shards, id_col, text_col, seed, False)
    return a.select(
        id_col, "shard", "n_tokens", "token_start",
        "seq_idx", "seq_offset", "n_seqs",
    )


def packed_token_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack0",
) -> DataFrame:
    """Materialize the packed training sequences: one row per
    (shard, seq_idx) with the actual token array — every sequence
    except a shard's last has EXACTLY ``seq_len`` tokens, docs sliced
    across boundaries exactly as :func:`pack_sequences` assigns them.

    Plan: assignment with the token arrays riding the window shuffle →
    explode each doc over the sequences it spans (≤ n_tokens/seq_len+1
    rows per doc, a narrow map) → slice the doc's tokens per spanned
    sequence → groupBy (shard, seq_idx) flattening the slices in
    token_start order. ONE shuffle total: the window's
    hash-partitioning on shard already satisfies the groupBy's
    (shard, seq_idx) distribution, so Catalyst plans the aggregation
    without a second exchange (plan-asserted in tests).
    """
    a = _assignment(
        df, seq_len, n_shards, id_col, text_col, seed, True
    ).where(F.col("n_tokens") > 0)
    spans = a.select(
        "shard",
        "token_start",
        "n_tokens",
        "_toks",
        F.explode(
            F.expr("sequence(seq_idx, seq_idx + n_seqs - 1)")
        ).alias("seq_idx"),
    ).select(
        "shard",
        "seq_idx",
        "token_start",
        # the doc's token slice landing in THIS sequence:
        # [seq_idx*L, (seq_idx+1)*L) ∩ [token_start, token_start+n)
        F.expr(
            f"slice(_toks,"
            f" cast(greatest(seq_idx * {seq_len} - token_start, 0) + 1 as int),"
            f" cast(least((seq_idx + 1) * {seq_len}, token_start + n_tokens)"
            f"   - greatest(seq_idx * {seq_len}, token_start) as int))"
        ).alias("piece"),
    )
    return (
        spans.groupBy("shard", "seq_idx")
        .agg(
            F.expr(
                "flatten(transform("
                "  array_sort(collect_list(struct(token_start, piece)),"
                "    (a, b) -> case when a.token_start < b.token_start then -1"
                "              when a.token_start > b.token_start then 1 else 0 end),"
                "  s -> s.piece))"
            ).alias("tokens"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .select(
            "shard", "seq_idx", "n_docs",
            F.size("tokens").cast("long").alias("n_tokens"),
            "tokens",
        )
    )


def chunk_text(
    df: DataFrame,
    chunk_len: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window chunking (the RAG / context-window layout, as
    opposed to :func:`pack_sequences`' concat-and-chunk): one row per
    (doc, chunk), chunks start at token offsets 0, stride, 2·stride, …
    < n_tokens and carry up to ``chunk_len`` tokens, so consecutive
    chunks overlap by ``chunk_len - stride`` tokens. Docs with no
    tokens emit no chunks. Output identifies each chunk by
    (doc_id, chunk_idx, start_tok, n_tokens, chunk_md5 — md5 of the
    space-joined token slice, the cross-engine content check).

    Scale (the 100 TB story): ZERO shuffles — tokenize, start-offset
    generation, posexplode, and slice are all narrow maps in
    whole-stage codegen; output order is per-doc and never needs a
    global sort. Expansion factor is ~n_tokens/stride rows per doc,
    each bounded by ``chunk_len`` tokens.
    """
    if chunk_len <= 0 or stride <= 0:
        raise ValueError("chunk_len and stride must be positive")
    staged = df.select(
        F.col(id_col), tokens_col(text_col).alias("_toks")
    ).select("*", F.size("_toks").alias("_n"))
    starts = F.when(
        F.col("_n") > 0,
        F.expr(f"transform(sequence(0, (_n - 1) div {stride}), i -> i * {stride})"),
    ).otherwise(F.expr("cast(array() as array<int>)"))
    ex = staged.select(
        F.col(id_col),
        "_toks",
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    ).select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.expr(f"slice(_toks, start_tok + 1, {chunk_len})").alias("_chunk"),
    )
    return ex.select(
        F.col(id_col),
        "chunk_idx",
        "start_tok",
        F.size("_chunk").cast("long").alias("n_tokens"),
        F.md5(F.concat_ws(" ", "_chunk")).alias("chunk_md5"),
    )
