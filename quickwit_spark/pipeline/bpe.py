"""Byte-pair-encoding primitives as pure DataFrame plans: learn the
top-N merges from the corpus and encode documents with them — the
tokenizer-training step of an LLM data pipeline, distributed.

The trick that keeps it engine-exact: a word's symbol sequence is ONE
delimiter-joined string (``\\x1e`` between symbols). For the merge
step the string is re-bracketed so EVERY symbol is individually
wrapped (``\\x1e sym \\x1e`` concatenated — junctions read
``\\x1e\\x1e``, ends a single ``\\x1e``); the pattern
``\\x1e l \\x1e\\x1e r \\x1e`` can then only match two COMPLETE
adjacent symbols (a bare ``l+SEP+r`` pattern would also fire where
``l`` is a proper suffix of the preceding symbol or ``r`` a proper
prefix of the following one — merging across symbol boundaries, which
is not BPE), and the replacement ``\\x1e lr \\x1e`` preserves the
bracketed form so consecutive non-overlapping matches stay greedy
left-to-right — exactly classic BPE merge order. Both Spark and
DuckDB replace left-to-right non-overlapping, and pair frequencies
are exact integer sums. The oracle replays the rounds as CTEs with
scalar-subquery merge picks; no tolerance windows anywhere.

Scale (the 100 TB story): everything after the first groupBy runs on
the DISTINCT-WORD table (vocab-sized, << corpus — this is why
classical BPE trainers keep a word-frequency dict). Per round: one
vocab-sized pair-count aggregate (map-side combined) + a 1-row argmax
to the driver (the merge decision is inherently global and tiny) + a
narrow-map replace over the vocab table. The corpus itself is touched
once to build word frequencies and once per encode. ``n_merges``
rounds means n sequential tiny jobs — the vocab table is persisted
across them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from quickwit_spark.pipeline.textstats import ensure_parallelism, tokens_col

SEP = "\x1e"


def _word_freq(df: DataFrame, text_col: str) -> DataFrame:
    return (
        ensure_parallelism(df)
        .select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _char_rep() -> str:
    """Initial symbol sequence: one char per symbol, SEP-joined."""
    return f"array_join(split(word, ''), '{SEP}')"


def _pair_counts(reps: DataFrame) -> DataFrame:
    """Every adjacent symbol position (overlaps counted — classic
    get_stats), weighted by word frequency."""
    arr = f"split(rep, '{SEP}')"
    pairs = (
        f"transform(sequence(1, size({arr}) - 1),"
        f" i -> struct(element_at({arr}, i) as l,"
        f" element_at({arr}, i + 1) as r))"
    )
    return (
        reps.where(F.expr(f"size({arr}) > 1"))
        .select("freq", F.explode(F.expr(pairs)).alias("p"))
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("pair_freq"))
    )


def bpe_learn(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges from the corpus. Each round
    picks the most frequent adjacent symbol pair (ties: lowest (l, r)
    lexically) and merges it greedily left-to-right in every word.
    Stops early if no pair is left. Returns (merges, final_reps):
    ``merges`` is ``[(left, right, pair_freq), ...]`` in rank order;
    ``final_reps`` is the vocab table (word, freq, rep) with the
    merges applied — feed it to :func:`bpe_encode`.
    """
    from pyspark.storagelevel import StorageLevel

    reps = _word_freq(df, text_col).select(
        "word", "freq", F.expr(_char_rep()).alias("rep")
    )
    merges: list[tuple[str, str, int]] = []
    persisted = []
    for _ in range(n_merges):
        reps = reps.persist(StorageLevel.MEMORY_AND_DISK)
        persisted.append(reps)
        top = (
            _pair_counts(reps)
            .orderBy(F.col("pair_freq").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, freq = top[0].l, top[0].r, int(top[0].pair_freq)
        merges.append((l, r, freq))
        # bracket every symbol (SEP sym SEP) so the pattern matches only
        # complete adjacent symbols — module docstring has the argument
        pat = f"{SEP}{l}{SEP}{SEP}{r}{SEP}"
        rep_to = f"{SEP}{l}{r}{SEP}"
        wrapped = (
            f"concat({_sql_str(SEP)},"
            f" replace(rep, {_sql_str(SEP)}, {_sql_str(SEP + SEP)}),"
            f" {_sql_str(SEP)})"
        )
        merged = f"replace({wrapped}, {_sql_str(pat)}, {_sql_str(rep_to)})"
        reps = reps.select(
            "word",
            "freq",
            F.expr(
                f"trim(BOTH {_sql_str(SEP)} FROM"
                f" replace({merged}, {_sql_str(SEP + SEP)}, {_sql_str(SEP)}))"
            ).alias("rep"),
        )
    # keep only the last persisted vocab (the one final_reps reads);
    # earlier rounds' caches are superseded
    for p in persisted[:-1]:
        p.unpersist()
    if persisted:
        reps._qs_cached = (persisted[-1],)  # type: ignore[attr-defined]
    return merges, reps


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def merges_df(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """The learned merge table as a DataFrame: (rank, lhs, rhs,
    pair_freq) — rank 1 is the first (most frequent) merge. lhs/rhs
    instead of left/right so the oracle SQL needs no keyword quoting."""
    rows = [
        (i + 1, l, r, f) for i, (l, r, f) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, lhs string, rhs string, pair_freq bigint"
    )


def bpe_encode(
    df: DataFrame,
    final_reps: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode documents with a learned vocab: each token maps to its
    merged symbol sequence, in document order. Returns (id_col,
    n_tokens, n_subtokens, sub_md5) where sub_md5 digests the full
    SEP-joined subtoken stream — engine-portable proof the encoding
    matches, without shipping the stream itself.

    Scale: posexplode keeps token order; the token→rep join is
    vocab-sized on the build side (broadcastable on a real cluster —
    BPE vocabs are small by construction); the per-doc reassembly
    groupBy is the one corpus shuffle.
    """
    toks = ensure_parallelism(df).select(
        F.col(id_col),
        F.posexplode(tokens_col(text_col)).alias("pos", "word"),
    )
    joined = toks.join(final_reps.select("word", "rep"), "word")
    return (
        joined.groupBy(id_col)
        .agg(
            F.expr(
                "array_sort(collect_list(struct(pos, rep)),"
                " (a, b) -> case when a.pos < b.pos then -1"
                " when a.pos > b.pos then 1 else 0 end)"
            ).alias("ordered")
        )
        .select(
            id_col,
            F.expr("size(ordered)").cast("long").alias("n_tokens"),
            F.expr(
                f"aggregate(ordered, 0L, (s, o) ->"
                f" s + size(split(o.rep, '{SEP}')))"
            ).alias("n_subtokens"),
            F.md5(
                F.expr(
                    f"array_join(transform(ordered, o -> o.rep), '{SEP}')"
                )
            ).alias("sub_md5"),
        )
    )
