"""Text analysis operators: token counting, quality scoring, language
ID, document fingerprinting.

All pure built-in-function plans (whole-stage codegen; zero Python in
the executor hot path). Each has an ANSI-SQL twin in
``__spark_entry__.oracle_sql`` so DuckDB can verify it bit-for-bit.

Scale: every operator here except :func:`unigram_logprob` is a narrow
map over the input — no shuffle, no UDF; a 100 TB scan parallelizes
embarrassingly and the projection is pruned to (id, text).
``unigram_logprob`` is the one corpus-relative score (it needs global
token counts) and keeps its shuffles distinct-token-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_PATTERN = "[0-9a-z]+"
# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

# small embedded stopword lists for the language-ID heuristic
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "zu", "auf"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pas", "pour", "dans"),
}


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Small-input guard for CPU-bound narrow maps (md5 per shingle /
    per token, HOF dot products): a small parquet table arrives as ONE
    scan partition and the whole computation runs serially no matter
    how many cores the cluster has. Repartition up to the session's
    default parallelism ONLY when the scan has fewer partitions — at
    real scale inputs already carry >= cores partitions and this is a
    no-op (no added shuffle). Measured at sf0.1 (5k docs, 1 file,
    local[32]): minhash signatures 4.96 s -> 1.27 s, LSH 6.5 s -> 2.9 s."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def tokens_col(text_col: str = "text"):
    """Lowercased alphanumeric tokens — same token stream as the index
    tokenizer (functions/tokenize.py) for ASCII input."""
    return F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)")


def token_count(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    append: bool = False,
) -> DataFrame:
    """Per-doc token counts: whitespace-ish tokens and a BPE-ish regex.
    ``append=True`` keeps the input columns (narrow map — composes
    into larger plans without a re-join on the id)."""
    return df.select(
        *(["*"] if append else [id_col]),
        F.size(tokens_col(text_col)).cast("long").alias("n_tokens"),
        F.size(
            F.expr(f"regexp_extract_all(lower({text_col}), '{BPE_PATTERN}', 0)")
        ).cast("long").alias("n_bpeish"),
        F.length(text_col).cast("long").alias("n_chars_computed"),
    )


def quality_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    append: bool = False,
) -> DataFrame:
    """Heuristic quality features + a composite score: length, mean
    token length, stopword ratio, alpha ratio, repetition (distinct
    token ratio). Deterministic, SQL-expressible. ``append=True``
    keeps the input columns (narrow map — composes into larger plans
    without a re-join on the id).

    The token array is staged under an alias referenced 3× so single
    regex evaluation per row is guaranteed by plan shape rather than
    by codegen subexpression elimination (A/B at sf0.01/sf0.1:
    identical time — codegen already CSEs the inline form; the staged
    form keeps that property under interpreted fallback too)."""
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    staged = df.select(
        *(["*"] if append else [id_col]),
        F.length(text_col).cast("long").alias("n_chars_q"),
        tokens_col(text_col).alias("_toks"),
    )
    out = staged.select(
        *[c for c in staged.columns if c != "_toks"],
        F.size("_toks").cast("long").alias("n_toks"),
        F.expr(f"size(filter(_toks, t -> t in ({en})))")
        .cast("long").alias("n_stop"),
        F.size(F.array_distinct("_toks")).cast("long").alias("n_distinct"),
    )
    out = out.withColumn(
        "stopword_ratio",
        F.round(F.col("n_stop") / F.greatest(F.col("n_toks"), F.lit(1)), 6),
    ).withColumn(
        "distinct_ratio",
        F.round(F.col("n_distinct") / F.greatest(F.col("n_toks"), F.lit(1)), 6),
    )
    return out.withColumn(
        "quality",
        F.round(
            F.least(F.col("n_toks") / F.lit(100.0), F.lit(1.0)) * 0.4
            + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.2
            + F.col("distinct_ratio") * 0.4,
            6,
        ),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID over {en, de, fr}; ties break by
    language code order, zero votes → 'und'. Tokens staged once so the
    per-vote regex sharing does not depend on codegen subexpression
    elimination."""

    def votes(lang: str):
        words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        return F.expr(f"size(filter(_toks, t -> t in ({words})))")

    out = df.select(
        F.col(id_col),
        tokens_col(text_col).alias("_toks"),
    ).select(
        F.col(id_col),
        votes("en").alias("v_en"),
        votes("de").alias("v_de"),
        votes("fr").alias("v_fr"),
    )
    best = F.greatest("v_en", "v_de", "v_fr")
    return out.withColumn(
        "lang_pred",
        F.when(best == 0, F.lit("und"))
        .when(F.col("v_de") == best, F.lit("de"))  # checked before en/fr
        .otherwise(
            F.when(F.col("v_en") == best, F.lit("en")).otherwise(F.lit("fr"))
        ),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprints: md5 of the normalized token stream (exact
    content identity modulo whitespace/punct) + a bottom-1 shingle
    sketch (min hash of word 3-grams — a 1-perm rolling-window
    fingerprint; robust to local edits).

    Tokens staged once so the inline form's per-shingle regex inside
    the transform lambda cannot recur; measured equivalent at
    sf0.01/sf0.1 (codegen CSE already hoists it) but the staged plan
    guarantees it structurally."""
    return df.select(
        F.col(id_col),
        tokens_col(text_col).alias("_toks"),
    ).select(
        F.col(id_col),
        F.md5(F.concat_ws(" ", "_toks")).alias("content_md5"),
        F.expr(
            """
            array_min(transform(
              sequence(1, greatest(size(_toks) - 2, 1)),
              i -> cast(conv(substring(md5(concat_ws(' ',
                     slice(_toks, i, 3))), 1, 15), 16, 10) as bigint)
            ))
            """
        ).cast("long").alias("shingle_min_hash"),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals: top-bigram fraction (the most
    frequent word 2-gram's share of all 2-grams) and distinct-token
    ratio. A high top-bigram fraction or a low distinct ratio flags
    boilerplate and degenerate repetition. Pure HOF expressions
    (whole-stage codegen, no shuffle); the O(distinct-bigrams × len)
    counting is bounded by document length, done entirely JVM-side.

    Single-token docs yield one degenerate "bigram" (the token itself)
    on BOTH engines (sequence/generate_series floor of 1), keeping the
    DuckDB oracle twin bit-identical."""
    # staged projections so tokens and bigrams materialize ONCE per doc
    # (inlining the regex inside the HOF lambdas re-evaluates it per
    # element — measured ~50× slower); Catalyst collapses the chain
    # into one narrow-map stage
    staged = df.select(
        F.col(id_col),
        F.expr(
            f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
        ).alias("_toks"),
    ).select(
        F.col(id_col),
        F.col("_toks"),
        F.expr(
            "transform(sequence(1, greatest(size(_toks) - 1, 1)),"
            " i -> concat_ws(' ', slice(_toks, i, 2)))"
        ).alias("_bg"),
    ).select(
        F.col(id_col),
        F.col("_toks"),
        F.col("_bg"),
        F.expr(
            "array_max(transform(array_distinct(_bg),"
            " x -> size(filter(_bg, y -> y = x))))"
        ).alias("_top_n"),
    )
    return staged.select(
        F.col(id_col),
        F.size("_bg").cast("long").alias("n_bigrams"),
        F.col("_top_n").cast("long").alias("top_bigram_n"),
        F.round(
            F.expr("cast(_top_n as double) / size(_bg)"), 6
        ).alias("top_bigram_frac"),
        F.round(
            F.expr(
                "cast(size(array_distinct(_toks)) as double)"
                " / greatest(size(_toks), 1)"
            ),
            6,
        ).alias("distinct_token_ratio"),
    )


# ln quantization for the unigram LM: ln() is not IEEE
# correctly-rounded, so summing raw doubles across engines (and across
# Spark's nondeterministic partial-agg order) can drift a ulp per term.
# Quantizing each ln to integer micro-nats makes every downstream sum
# EXACT integer arithmetic — order-independent and bit-identical in
# Spark, DuckDB, and Python (same trick as the H15 cross-engine hash).
LN_MICRO = 1_000_000


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist_intermediates: bool = True,
) -> DataFrame:
    """Corpus unigram-LM score per doc: mean ln p(token) under the
    corpus's own unigram distribution (the cheap stand-in for a
    perplexity quality filter — boilerplate and in-distribution text
    score high, junk/rare-token soup scores low).

    logprob(d) = (1/|d|) * sum_t ln(cnt(t)) - ln(total_tokens), with
    each ln quantized to integer micro-nats (``LN_MICRO``) so the
    per-doc sum is exact integer arithmetic (see above). Docs with no
    tokens return NULL.

    Scale (the 100 TB story): per-doc tf via groupBy(id, token) —
    map-side combine collapses it to distinct-tokens-per-doc before
    the exchange; the vocab table aggregates from tf rows (vocab-sized,
    << corpus); the tf→vocab join moves one row per (doc, distinct
    token), so hot stopwords contribute once per doc, not once per
    occurrence (the skew defusal). No collect, no UDF. The tf frame
    feeds three consumers (vocab, the total, the scoring join) and
    Catalyst cannot CSE across them, so ``persist_intermediates=True``
    caches it — one tokenize pass + one tf shuffle instead of three;
    release with :func:`quickwit_spark.pipeline.dedup
    .unpersist_intermediates`.
    """
    tf = (
        df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    cached = []
    if persist_intermediates:
        from pyspark.storagelevel import StorageLevel

        tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(tf)
    vocab = tf.groupBy("tok").agg(F.sum("tf").alias("cnt"))
    q = F.round(F.log(F.col("cnt").cast("double")) * LN_MICRO, 0).cast("long")
    total = vocab.agg(
        F.round(F.log(F.sum("cnt").cast("double")) * LN_MICRO, 0)
        .cast("long")
        .alias("_qtot")
    )
    per_doc = (
        tf.join(vocab.select("tok", q.alias("_q")), "tok")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("_q")).alias("_sq"),
        )
    )
    scored = per_doc.crossJoin(F.broadcast(total)).select(
        F.col(id_col),
        "n_tokens",
        F.round(
            (F.col("_sq").cast("double") / F.col("n_tokens") - F.col("_qtot"))
            / LN_MICRO,
            6,
        ).alias("logprob"),
    )
    out = df.select(id_col).join(scored, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        "logprob",
    )
    out._qs_cached = cached
    return out


def tfidf_keywords(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist_intermediates: bool = True,
) -> DataFrame:
    """Top-k TF-IDF keywords per document — the classic extractive
    summary / topic-signal column a curation pipeline keys search and
    mixing decisions on. score(d, t) = tf(d,t) · ln((1+N)/(1+df(t)))
    (smoothed idf), with the idf quantized to integer micro-nats
    (``LN_MICRO``, same trick as :func:`unigram_logprob`) so the
    per-term score is exact integer arithmetic and the top-k order is
    bit-identical across engines. Ties break (score desc, term asc).

    Returns (id_col, term, rank, tf, tfidf) — tfidf is the micro-nat
    score scaled back to nats, rounded to 6dp.

    Scale: same shape as :func:`unigram_logprob` — per-doc tf with
    map-side combine, a vocab-sized df/idf aggregate, one tf→idf join
    carrying a row per (doc, distinct token), then ONE window shuffle
    on the doc id for the top-k. ``persist_intermediates`` caches the
    tf frame across its two consumers (idf aggregate + scoring join);
    release with
    :func:`quickwit_spark.pipeline.dedup.unpersist_intermediates`.
    """
    from pyspark.sql import Window

    tf = (
        df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    cached = []
    if persist_intermediates:
        from pyspark.storagelevel import StorageLevel

        tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(tf)
    ndocs = df.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    idf = (
        tf.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_df"))
        .crossJoin(F.broadcast(ndocs))
        .select(
            "tok",
            F.round(
                F.log(
                    (F.lit(1) + F.col("_n")).cast("double")
                    / (F.lit(1) + F.col("_df"))
                )
                * LN_MICRO,
                0,
            )
            .cast("long")
            .alias("_idf"),
        )
    )
    scored = tf.join(idf, "tok").select(
        F.col(id_col),
        F.col("tok").alias("term"),
        F.col("tf").cast("long").alias("tf"),
        (F.col("tf") * F.col("_idf")).alias("_score"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("_score").desc(), F.col("term").asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            id_col,
            "term",
            "rank",
            "tf",
            F.round(F.col("_score").cast("double") / LN_MICRO, 6).alias("tfidf"),
        )
    )
    out._qs_cached = cached
    return out


GOPHER_REQUIRED_STOPWORDS = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_required_stopwords: int = 2,
) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021, Table A1):
    per-doc rule features + a composite ``gopher_keep`` flag. Words
    are WHITESPACE-split (the paper's definition — distinct from the
    index tokenizer); lines split on newline. Default thresholds are
    the paper's; every bound is a parameter because real corpora tune
    them. Pure narrow map — zero shuffles, zero Python; all features
    are SQL-expressible so the DuckDB oracle verifies value-for-value.

    Reported features: n_words, mean_word_len, symbol_ratio
    (# + ellipsis occurrences per word), bullet_line_frac,
    ellipsis_line_frac, alpha_word_frac, n_required_stop (how many of
    the paper's 8 required stopwords appear), gopher_keep."""
    words = f"filter(split({text_col}, '\\\\s+'), w -> w <> '')"
    lines = f"split({text_col}, '\\n')"
    stop_arr = ", ".join(f"'{w}'" for w in GOPHER_REQUIRED_STOPWORDS)
    staged = df.select(
        F.col(id_col),
        F.expr(words).alias("_w"),
        F.expr(lines).alias("_l"),
        (
            F.length(text_col)
            - F.length(F.replace(F.col(text_col), F.lit("#"), F.lit("")))
            + F.expr(f"size(regexp_extract_all({text_col}, '\\\\.\\\\.\\\\.|…', 0))")
        ).cast("long").alias("n_symbols"),
    )
    feats = staged.select(
        id_col,
        F.size("_w").cast("long").alias("n_words"),
        F.round(
            F.expr("aggregate(_w, 0L, (a, w) -> a + length(w))")
            / F.greatest(F.size("_w"), F.lit(1)),
            6,
        ).alias("mean_word_len"),
        F.round(
            F.col("n_symbols") / F.greatest(F.size("_w"), F.lit(1)), 6
        ).alias("symbol_ratio"),
        F.round(
            F.expr(
                "size(filter(_l, l -> trim(l) like '-%' or trim(l) like '•%'))"
            )
            / F.greatest(F.size("_l"), F.lit(1)),
            6,
        ).alias("bullet_line_frac"),
        F.round(
            F.expr(
                "size(filter(_l, l -> trim(l) like '%...' or trim(l) like '%…'))"
            )
            / F.greatest(F.size("_l"), F.lit(1)),
            6,
        ).alias("ellipsis_line_frac"),
        F.round(
            F.expr("size(filter(_w, w -> w rlike '[A-Za-z]'))")
            / F.greatest(F.size("_w"), F.lit(1)),
            6,
        ).alias("alpha_word_frac"),
        F.expr(
            f"size(filter(array({stop_arr}),"
            f" s -> exists(_w, w -> lower(w) = s)))"
        ).cast("long").alias("n_required_stop"),
    )
    return feats.withColumn(
        "gopher_keep",
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_line_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_line_frac)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("n_required_stop") >= min_required_stopwords),
    )


def c4_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    blocklist: tuple = ("lorem ipsum",),
    drop_brace: bool = True,
) -> DataFrame:
    """The C4 line/page filter battery (Raffel et al. 2020, §2.2) —
    the other canonical web-corpus cleaner next to :func:`gopher_rules`:

    * line level (lines = newline split, trimmed): keep a line iff it
      ends in terminal punctuation (``. ! ? "``), has at least
      ``min_words_per_line`` space-separated words (the paper's 5),
      and does not mention ``javascript`` (case-insensitive);
    * page level: drop the page if the KEPT text has fewer than
      ``min_sentences`` sentences (terminal-punct marks — the paper's
      3), if the original page contains any ``blocklist`` phrase
      (stand-in for the paper's word-list filter; lowercase matched),
      or if it contains a curly brace (``drop_brace`` — the paper's
      code-page heuristic).

    The paper's remaining rule — dedup of any 3-sentence span — is the
    span-dedup family (``dedup.duplicate_spans`` /
    ``decontaminate_spans``), not re-implemented here.

    Pure narrow map: higher-order filters over the line array, zero
    shuffles, zero Python; every feature SQL-expressible so the DuckDB
    oracle verifies value-for-value (entry twin: ``c4_rules``).

    Returns (id_col, n_lines, n_kept_lines, n_sentences,
    has_blocklist, has_brace, kept_text, c4_keep).
    """
    lines = f"transform(split({text_col}, '\\n'), x -> trim(x))"
    kept = (
        "filter(_l, x -> x rlike '[.!?\"]$'"
        f" and size(filter(split(x, ' '), w -> w <> ''))"
        f" >= {int(min_words_per_line)}"
        " and not contains(lower(x), 'javascript'))"
    )
    has_block = F.lit(False)
    for phrase in blocklist:
        # Column API, not an interpolated SQL literal — phrases with
        # quotes/backslashes need no escaping
        has_block = has_block | F.contains(
            F.lower(F.col(text_col)), F.lit(str(phrase).lower())
        )
    staged = df.select(
        F.col(id_col),
        F.expr(lines).alias("_l"),
        has_block.alias("has_blocklist"),
        F.expr(f"contains({text_col}, '{{')").alias("has_brace"),
    ).select(
        id_col,
        F.size("_l").cast("long").alias("n_lines"),
        F.expr(kept).alias("_k"),
        "has_blocklist",
        "has_brace",
    )
    feats = staged.select(
        id_col,
        "n_lines",
        F.size("_k").cast("long").alias("n_kept_lines"),
        F.expr(
            "size(regexp_extract_all(array_join(_k, '\\n'), '[.!?]', 0))"
        ).cast("long").alias("n_sentences"),
        "has_blocklist",
        "has_brace",
        F.expr("array_join(_k, '\\n')").alias("kept_text"),
    )
    keep = (F.col("n_sentences") >= int(min_sentences)) & ~F.col(
        "has_blocklist"
    )
    if drop_brace:
        keep = keep & ~F.col("has_brace")
    return feats.withColumn("c4_keep", keep).select(
        id_col,
        "n_lines",
        "n_kept_lines",
        "n_sentences",
        "has_blocklist",
        "has_brace",
        "kept_text",
        "c4_keep",
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    persist_intermediates: bool = True,
) -> DataFrame:
    """Corpus bigram-LM score per doc: mean ln p(w_i | w_{i-1}) under
    the corpus's own maximum-likelihood conditional bigram
    distribution — the next step up from :func:`unigram_logprob`
    toward the CCNet-style n-gram-perplexity quality filter (Wenzek et
    al. 2020 use a 5-gram KenLM; a self-scored bigram LM keeps the
    same signal shape: formulaic boilerplate scores high, token soup
    scores low, while staying exactly SQL-expressible). Self-scoring
    means every doc bigram exists in the corpus counts, so no
    smoothing term is needed and the score is exact.

    logprob(d) = (1/n_bigrams) * sum_i [ ln c(w_{i-1}, w_i)
    - ln c_head(w_{i-1}) ], each ln quantized to integer micro-nats
    (``LN_MICRO``) so the per-doc sum is exact integer arithmetic,
    bit-identical across engines. Docs with fewer than 2 tokens return
    n_bigrams=0 and NULL logprob.

    Scale (the 100 TB story): the token array is STAGED under an alias
    before the bigram lambda (inlining the regex re-runs extraction
    per element — the measured 5x dsir trap); per-doc bigram tf
    collapses map-side before its exchange; the corpus bigram table
    aggregates FROM tf rows and the head table FROM the bigram table
    (each ≪ corpus occurrences); the scoring join moves one row per
    (doc, distinct bigram) so hot collocations contribute once per
    doc. No collect, no UDF. ``persist_intermediates`` caches the tf
    frame across its two consumers; release with
    :func:`quickwit_spark.pipeline.dedup.unpersist_intermediates`.
    """
    bigrams = (
        "CASE WHEN size(_toks) >= 2 THEN"
        " transform(sequence(1, size(_toks) - 1),"
        "  i -> concat(_toks[i-1], ' ', _toks[i]))"
        " ELSE cast(array() AS array<string>) END"
    )
    tf = (
        df.select(F.col(id_col), tokens_col(text_col).alias("_toks"))
        .select(F.col(id_col), F.explode(F.expr(bigrams)).alias("bg"))
        .groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    cached = []
    if persist_intermediates:
        from pyspark.storagelevel import StorageLevel

        tf = tf.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(tf)

    def _qln(col):
        return F.round(F.log(col.cast("double")) * LN_MICRO, 0).cast("long")

    bgc = tf.groupBy("bg").agg(F.sum("tf").alias("c"))
    headc = (
        bgc.groupBy(F.expr("split_part(bg, ' ', 1)").alias("head"))
        .agg(F.sum("c").alias("hc"))
    )
    q = (
        bgc.withColumn("head", F.expr("split_part(bg, ' ', 1)"))
        .join(headc, "head")
        .select("bg", (_qln(F.col("c")) - _qln(F.col("hc"))).alias("_q"))
    )
    per_doc = (
        tf.join(q, "bg")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("_q")).alias("_sq"),
        )
    )
    out = (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.round(
                F.col("_sq").cast("double") / F.col("n_bigrams") / LN_MICRO, 6
            ).alias("logprob"),
        )
    )
    out._qs_cached = cached
    return out


def ccnet_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    head_frac: float = 1 / 3,
    tail_frac: float = 1 / 3,
    by_col: str | None = None,
    persist_intermediates: bool = True,
) -> DataFrame:
    """CCNet head/middle/tail quality bucketing (Wenzek et al. 2020
    §4.3): label every doc by where its LM score falls in the corpus
    distribution — CCNet sorts by KenLM perplexity and cuts the corpus
    into thirds ("head" = most fluent, the slice most pretraining
    recipes keep or upsample). Here the score is the self-scored
    corpus bigram LM (:func:`bigram_logprob` — higher logprob = lower
    perplexity), and the cuts are corpus-relative quantile thresholds,
    not rank positions, so the label is a pure per-row comparison.

    Bucket rule (evaluated in this order, identically in the oracle):
    NULL score (< 2 tokens — unscoreable) → NULL bucket;
    ``logprob >= cut_hi`` (the ``1 - head_frac`` quantile) → 'head';
    ``logprob < cut_lo`` (the ``tail_frac`` quantile) → 'tail';
    else 'middle'. With heavy score ties the realized fractions can
    deviate from the requested ones — inherent to threshold (vs rank)
    bucketing, and the price of needing no global sort.

    Exactness: scores are 6dp micro-nat means (cross-engine
    identical); thresholds are exact type-7 linear-interpolation
    quantiles over them (Spark ``percentile`` == DuckDB
    ``quantile_cont``) — the same discipline as
    :func:`quickwit_spark.pipeline.sampling.quality_percentile_filter`.

    ``by_col`` (e.g. a language-id column on ``df``) computes the
    cuts PER GROUP — CCNet proper buckets per language, so mixed
    corpora don't label one language's fluent docs against another's
    distribution. The LM stays the corpus-global self-scored bigram
    model (CCNet's per-language KenLM has no in-sandbox analog; a
    per-group LM is the composition "partition the corpus by group,
    run this per partition"). The group cut table is group-count
    rows, broadcast.

    Scale: bigram_logprob's map-side-combined shape, one exact
    ``percentile`` over the 8-byte score column (fine to ~10^9 docs;
    swap ``approx_percentile`` beyond), one broadcast of the 1-row
    (or per-group) cut table. Returns (id_col, [by_col,] n_bigrams,
    logprob, ccnet_bucket, cut_lo, cut_hi)."""
    if not (0 < head_frac < 1 and 0 < tail_frac < 1
            and head_frac + tail_frac <= 1):
        raise ValueError(
            f"head_frac/tail_frac must be in (0,1) and sum <= 1,"
            f" got {head_frac}/{tail_frac}"
        )
    scored = bigram_logprob(df, id_col, text_col, persist_intermediates)
    cached = list(getattr(scored, "_qs_cached", []))
    if persist_intermediates:
        # the cuts aggregate and the labeled output both consume the
        # full bigram chain; persisting the doc-sized score frame makes
        # the percentile pass the only full evaluation
        from pyspark.storagelevel import StorageLevel

        scored = scored.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(scored)
    hi_expr = F.expr(f"percentile(logprob, {1.0 - head_frac}D)").alias("_hi")
    lo_expr = F.expr(f"percentile(logprob, {float(tail_frac)}D)").alias("_lo")
    if by_col is None:
        cuts = scored.agg(hi_expr, lo_expr)
        labeled = scored.crossJoin(F.broadcast(cuts))
        lead_cols = [id_col]
    else:
        grouped = scored.join(df.select(id_col, by_col), id_col)
        cuts = grouped.groupBy(by_col).agg(hi_expr, lo_expr)
        labeled = grouped.join(F.broadcast(cuts), by_col)
        lead_cols = [id_col, by_col]
    out = labeled.select(
        *lead_cols,
        "n_bigrams",
        "logprob",
        F.when(F.col("logprob").isNull(), F.lit(None).cast("string"))
        .when(F.col("logprob") >= F.col("_hi"), "head")
        .when(F.col("logprob") < F.col("_lo"), "tail")
        .otherwise("middle")
        .alias("ccnet_bucket"),
        F.round(F.col("_lo"), 6).alias("cut_lo"),
        F.round(F.col("_hi"), 6).alias("cut_hi"),
    )
    out._qs_cached = cached
    return out
