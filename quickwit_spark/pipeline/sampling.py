"""Training-mix sampling + benchmark decontamination — the corpus ops
a pretraining data build needs alongside dedup: hold eval benchmarks
out of the training set, and hit per-source mix quotas reproducibly.

Scale shapes (the 100 TB story):
* ``decontaminate`` — an eval/benchmark set is small (10^3–10^6 docs)
  by construction, so its distinct shingle set broadcast-joins against
  the exploded corpus shingles; the only corpus-wide movement is the
  map-side-combined ``groupBy(doc_id)``. The corpus is never
  self-joined and never collected.
* ``semantic_decontaminate`` — the eval embeddings collapse into one
  broadcast row of structs, so the corpus-side max-cosine flag is a
  pure narrow map: zero shuffles, no pair explosion.
* ``stratified_sample`` — one narrow map over the corpus: keep/drop is
  a deterministic md5 threshold on the doc id (the cross-engine
  ``H15`` hash), so the sample is bit-reproducible across engines,
  runs, and partitionings — no RNG state, no ``sampleBy``
  nondeterminism — and re-running after an append keeps every
  previously-selected doc (monotone under corpus growth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from quickwit_spark.pipeline.dedup import H15, _shingles

SAMPLE_MOD = 1_000_000  # threshold granularity: fractions quantize to ppm


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Flag corpus docs sharing any word ``k``-gram with ``eval_df``.

    Returns one row per input doc: (id, n_overlap = distinct shared
    shingles, contaminated = n_overlap > 0). Filter on ``~contaminated``
    to decontaminate; keep ``n_overlap`` to grade near-misses.
    """
    sh = _shingles(text_col, k)
    doc_sh = df.select(F.col(id_col), F.explode(F.expr(sh)).alias("sh"))
    ev = eval_df.select(F.explode(F.expr(sh)).alias("sh")).distinct()
    hits = (
        doc_sh.join(F.broadcast(ev), "sh")
        .groupBy(id_col)
        .agg(F.countDistinct("sh").alias("n_overlap"))
    )
    n = F.coalesce("n_overlap", F.lit(0))
    return df.select(id_col).join(hits, id_col, "left").select(
        id_col,
        n.alias("n_overlap"),
        (n > 0).alias("contaminated"),
    )


def semantic_decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space twin of :func:`decontaminate`: flag corpus docs
    whose max cosine similarity against ANY eval-set embedding reaches
    ``threshold`` (paraphrased benchmark leakage that k-gram overlap
    misses — the second decontamination pass real pretraining builds
    run alongside the lexical one).

    Scale shape: the eval set is collapsed into ONE broadcast row
    (an array of (eid, vec, norm) structs), so the corpus side is a
    pure narrow map — zero shuffles, no pair explosion; the
    ``crossJoin`` below is a 1-row broadcast nested-loop (constant
    fan-out ×1), not a data-proportional cross product. Per-pair
    cosine is rounded to 6dp (cross-engine float parity, same as
    similarity.cosine_topk); ties on the max resolve to the smallest
    eval id. Fits eval sets up to ~10^4 × dim in a single row
    (benchmarks are that small by construction); beyond that, chunk
    ``eval_df`` and fold the per-chunk (max_cosine, nearest) — max
    composes associatively across chunks.

    Returns one row per corpus doc: (id, max_cosine, nearest_eval_id,
    contaminated). An empty eval set yields max_cosine = NULL and
    contaminated = false for every doc; zero-norm vectors on either
    side contribute NULL cosine (never contaminate).
    """
    from quickwit_spark.pipeline.similarity import DOT

    ev = eval_df.agg(
        F.collect_list(
            F.struct(
                F.col(id_col).alias("eid"),
                F.col(vec_col).alias("ev"),
                F.expr(
                    f"sqrt({DOT.format(a=vec_col, b=vec_col)})"
                ).alias("en"),
            )
        ).alias("_evs")
    )
    c = df.select(
        F.col(id_col),
        F.col(vec_col).alias("_cv"),
        F.expr(f"sqrt({DOT.format(a=vec_col, b=vec_col)})").alias("_cn"),
    )
    pair_dot = DOT.format(a="_cv", b="e.ev")
    scored = (
        "transform(_evs, e -> struct("
        f" CASE WHEN _cn * e.en > 0D THEN round({pair_dot} / (_cn * e.en), 6)"
        " END AS cos, e.eid AS eid))"
    )
    out = (
        c.crossJoin(F.broadcast(ev))
        .withColumn("_scored", F.expr(scored))
        .withColumn(
            "max_cosine", F.expr("array_max(transform(_scored, s -> s.cos))")
        )
    )
    return out.select(
        id_col,
        "max_cosine",
        F.expr(
            "array_min(transform(filter(_scored, s -> s.cos = max_cosine),"
            " s -> s.eid))"
        ).alias("nearest_eval_id"),
        F.coalesce(
            F.col("max_cosine") >= F.lit(float(threshold)), F.lit(False)
        ).alias("contaminated"),
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    ``H15(seed:id) % 1e6 < floor(fraction * 1e6)`` for its stratum's
    fraction. Strata absent from ``fractions`` are dropped (same
    contract as ``DataFrame.sampleBy``). Fractions quantize to ppm.
    """
    h = H15.format(x=f"concat('{seed}:', cast({id_col} as string))")
    pairs = [x for kv in fractions.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    frac = F.create_map(*pairs)[F.col(strata_col)]
    return (
        df.withColumn("_keep_frac", frac)
        .where(
            F.expr(h) % SAMPLE_MOD
            < F.floor(F.col("_keep_frac") * SAMPLE_MOD)
        )
        .drop("_keep_frac")
    )


def shuffle_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "sh0",
    n_shards: int = 64,
) -> DataFrame:
    """Deterministic global corpus shuffle — the write-time training
    order. Every row gets ``(shuffle_shard, shuffle_pos)`` from the
    cross-engine md5 hash: reading shards ``0..n_shards`` in order and
    rows by ``shuffle_pos`` within each shard streams the corpus in a
    reproducible pseudo-random permutation. A new epoch is a new
    ``seed`` — not a second copy of the data.

    Scale (the 100 TB story): the permutation is never materialized in
    one place. Shard assignment is a narrow map; the within-shard
    position is a window per shard, i.e. ``n_shards``-way parallel
    sorts of ~rows/n_shards each (size ``n_shards`` so a shard fits an
    executor's sort buffer). Writing with
    ``partitionBy(shuffle_shard)`` + ``sortWithinPartitions`` lays the
    corpus out in shuffled order with exactly ONE hash-partition
    shuffle. Unlike ``orderBy(rand())``, the layout is reproducible
    across engines, runs, and partitionings (no RNG state), and
    appending rows never reorders previously-placed ones within their
    shard prefix semantics.
    """
    from pyspark.sql import Window

    shard = F.expr(
        H15.format(x=f"concat('{seed}:', cast({id_col} as string))")
    ) % n_shards
    ordh = F.expr(
        H15.format(x=f"concat('{seed}~', cast({id_col} as string))")
    )
    w = Window.partitionBy("shuffle_shard").orderBy("_ord", id_col)
    return (
        df.withColumn("shuffle_shard", shard.cast("int"))
        .withColumn("_ord", ordh)
        .withColumn("shuffle_pos", F.row_number().over(w).cast("bigint"))
        .drop("_ord")
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "t0",
    temperature: float = 2.0,
) -> DataFrame:
    """Temperature-based domain mixing (the multilingual/multi-source
    pretraining sampler): flatten the per-stratum distribution from
    p_g ∝ c_g to q_g ∝ p_g^(1/T) by DOWN-sampling every stratum
    relative to the smallest — keep rate_g = (c_min / c_g)^(1 - 1/T),
    so the smallest stratum keeps everything and rate 1 everywhere at
    T=1. Rows keep/drop by the same deterministic md5 threshold as
    :func:`stratified_sample` (bit-reproducible, monotone under
    appends).

    T=2 (the common choice) computes the rate as ``sqrt(c_min / c_g)``
    — sqrt IS IEEE correctly-rounded, so the rate is bit-identical in
    Spark / DuckDB / numpy and the kept set hashes identically across
    engines. Other temperatures go through pow(), which is not
    correctly-rounded: fine in production, but cross-engine twins
    should pin T=2.

    Scale: one count-aggregate (stratum-sized), rates broadcast back,
    then a narrow filter map — the corpus itself is never shuffled.
    """
    if temperature < 1.0:
        raise ValueError("temperature must be >= 1 (T<1 would up-sample)")
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_cg"))
    cmin = counts.agg(F.min("_cg").alias("_cmin"))
    ratio = F.col("_cmin").cast("double") / F.col("_cg")
    if temperature == 2.0:
        rate = F.sqrt(ratio)
    else:
        rate = F.pow(ratio, 1.0 - 1.0 / temperature)
    rates = counts.crossJoin(F.broadcast(cmin)).select(
        strata_col, rate.alias("_rate")
    )
    h = H15.format(x=f"concat('{seed}:', cast({id_col} as string))")
    return (
        df.join(F.broadcast(rates), strata_col)
        .where(F.expr(h) % SAMPLE_MOD < F.floor(F.col("_rate") * SAMPLE_MOD))
        .drop("_rate")
        .select(*df.columns)
    )


def quality_percentile_filter(
    df: DataFrame,
    p: float = 0.1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-relative quality gate: score every doc with the corpus
    unigram LM (:func:`quickwit_spark.pipeline.textstats
    .unigram_logprob`) and drop the bottom ``p`` quantile — the
    "remove the worst X% by perplexity" move of CCNet-style curation,
    with the threshold taken from THIS corpus rather than a magic
    constant. Docs with no tokens (NULL score) are dropped outright.

    Returns the kept docs as (id_col, n_tokens, logprob, cutoff) where
    cutoff is the corpus-wide p-quantile every row was gated on.

    Exactness: scores are 6dp-rounded micro-nat means (cross-engine
    identical); the threshold is the exact type-7 linear-interpolation
    quantile over them (Spark ``percentile`` == DuckDB
    ``quantile_cont``). An interpolated threshold lies strictly
    between two 6dp score values, so a last-ulp engine difference
    cannot flip any row's >= comparison.

    Scale: the quantile is the one non-linear step — Spark's exact
    ``percentile`` gathers the score column (8 bytes/doc) on one
    reducer, fine to ~10^9 docs; past that swap in
    ``approx_percentile(logprob, p, 10000)`` (same plan shape,
    documented accuracy knob). Everything else is unigram_logprob's
    map-side-combined shape plus one broadcast of the 1-row threshold.
    """
    from quickwit_spark.pipeline.textstats import unigram_logprob

    scored = unigram_logprob(df, id_col, text_col,
                             persist_intermediates=False)
    thr = scored.agg(F.expr(f"percentile(logprob, {p}D)").alias("_thr"))
    return (
        scored.where(F.col("logprob").isNotNull())
        .crossJoin(F.broadcast(thr))
        .where(F.col("logprob") >= F.col("_thr"))
        .select(
            id_col,
            "n_tokens",
            "logprob",
            F.round(F.col("_thr"), 6).alias("cutoff"),
        )
    )


def assign_split(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: str = "split0",
) -> DataFrame:
    """Deterministic train/val/test assignment: every row gets a
    ``split`` label by hashing its id into [0, 1e6) (the cross-engine
    ``H15`` md5 hash — bit-reproducible in Spark, DuckDB and Python)
    and cutting at the cumulative fraction thresholds, in the
    fractions' insertion order. The LAST split absorbs the ppm
    rounding remainder so every row is labeled. Zero shuffles, no RNG
    state; stable under corpus growth (a doc's label never changes
    when other docs are appended) and disjoint by construction —
    train/eval leakage can't happen at assignment time (content-level
    leakage is :func:`decontaminate`'s job).

    ``fractions`` defaults to {'train': .98, 'val': .01, 'test': .01};
    values must sum to 1 (±1 ppm)."""
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    if abs(sum(fractions.values()) - 1.0) > 1e-6:
        raise ValueError(f"fractions must sum to 1, got {fractions}")
    if len(fractions) < 1:
        raise ValueError("need at least one split")
    h = F.expr(
        H15.format(x=f"concat('{seed}:', cast({id_col} as string))")
    ) % SAMPLE_MOD
    names = list(fractions)
    cuts, acc = [], 0
    for name in names[:-1]:
        acc += int(fractions[name] * SAMPLE_MOD)
        cuts.append(acc)
    label = F.lit(names[-1])
    for name, cut in zip(reversed(names[:-1]), reversed(cuts)):
        label = F.when(h < cut, F.lit(name)).otherwise(label)
    return df.withColumn("split", label)


# --------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
# score every raw doc by how much more likely its hashed n-gram
# features are under a small TARGET distribution than under the raw
# corpus distribution, then keep the top of that ranking. The standard
# cheap way to skew a 100 TB crawl toward a domain (code, math, a
# style) given only a few thousand in-domain examples.
# --------------------------------------------------------------------------


def _hashed_features(df: DataFrame, id_col: str, text_col: str,
                     n_buckets: int) -> DataFrame:
    """(id, bucket): one row per token occurrence + one per bigram
    occurrence, hashed into [0, n_buckets) with the cross-engine H15
    md5 hash (DSIR's hashed unigram+bigram feature space)."""
    from quickwit_spark.pipeline.textstats import TOKEN_PATTERN

    toks = f"regexp_extract_all(lower({text_col}), '{TOKEN_PATTERN}', 0)"
    uni = f"transform(_toks, t -> {H15.format(x='t')} % {n_buckets})"
    # size<2 guard: sequence(1, 0) counts DOWN in Spark and would
    # index an empty array. The token array is STAGED under an alias:
    # inlining the regex inside the bigram lambda re-runs the
    # extraction per array element (measured 5x the whole op at sf0.1).
    bi = (
        f"CASE WHEN size(_toks) >= 2 THEN"
        f" transform(sequence(1, size(_toks) - 1),"
        f"  i -> {H15.format(x='concat(_toks[i-1], chr(32), _toks[i])')}"
        f"  % {n_buckets})"
        f" ELSE cast(array() AS array<bigint>) END"
    )
    return (
        df.select(F.col(id_col), F.expr(toks).alias("_toks"))
        .select(
            F.col(id_col),
            F.explode(F.expr(f"concat({uni}, {bi})")).alias("bucket"),
        )
    )


def dsir_logweights(
    df: DataFrame,
    target_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
) -> DataFrame:
    """Per-doc DSIR importance log-weight: ``log p_target(feats) -
    log p_raw(feats)`` under add-one-smoothed hashed unigram+bigram
    distributions. Every ln is quantized to integer micro-nats
    (``LN_MICRO``, the :func:`quality scoring <quickwit_spark.pipeline
    .textstats.unigram_logprob>` trick) so the per-doc sum —
    ``logweight_micro`` — is EXACT integer arithmetic, bit-identical
    across Spark / DuckDB / numpy; ``logweight`` is the float view
    rounded to 6dp. Docs with zero features report 0 (an empty doc is
    neither in- nor out-of-domain).

    Scale (the 100 TB story): both distributions are bucket tables of
    ≤ ``n_buckets`` rows — the target side because the target set is
    small by construction, the raw side because hashing caps the
    domain — so the scoring join BROADCASTS the ratio table against
    the exploded corpus features and the only corpus-wide exchange is
    the map-side-combined per-doc groupBy. No self-join, no collect
    of anything data-proportional."""
    from quickwit_spark.pipeline.textstats import LN_MICRO

    feats = _hashed_features(df, id_col, text_col, n_buckets)
    tgt = _hashed_features(target_df, id_col, text_col, n_buckets)
    raw_counts = feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("rc"))
    tgt_counts = tgt.groupBy("bucket").agg(F.count(F.lit(1)).alias("tc"))

    def _qln(col):
        return F.round(F.log(col.cast("double")) * LN_MICRO, 0).cast("long")

    totals = (
        raw_counts.agg(F.sum("rc").alias("rt"))
        .crossJoin(tgt_counts.agg(F.sum("tc").alias("tt")))
        .select(
            _qln(F.col("rt") + n_buckets).alias("_qrt"),
            _qln(F.coalesce(F.col("tt"), F.lit(0)) + n_buckets).alias("_qtt"),
        )
    )
    ratio = (
        raw_counts.join(tgt_counts, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                _qln(F.coalesce(F.col("tc"), F.lit(0)) + 1) - F.col("_qtt")
                - _qln(F.col("rc") + 1) + F.col("_qrt")
            ).alias("_qr"),
        )
    )
    per_doc = (
        feats.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("_qr").alias("logweight_micro"),
        )
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce("logweight_micro", F.lit(0)).cast("long")
        .alias("logweight_micro"),
        F.round(
            F.coalesce("logweight_micro", F.lit(0)) / F.lit(float(LN_MICRO)), 6
        ).alias("logweight"),
    )


def dsir_select(
    df: DataFrame,
    target_df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    gumbel_seed: str | None = None,
) -> DataFrame:
    """Keep the ``k`` raw docs with the highest DSIR importance weight
    (ties by id — fully deterministic because the weights are exact
    integers). With ``gumbel_seed`` set, rank by ``logweight_micro +
    Gumbel(H15-hash uniform)`` instead — the paper's importance
    RESAMPLING (without it, selection is the argmax variant: higher
    precision, less diversity). The Gumbel noise is a pure hash of
    (seed, id): deterministic, reproducible, no RNG state.

    The top-k is ``orderBy().limit(k)`` — Spark plans TakeOrdered
    (per-partition heaps + driver merge of k·partitions rows), never a
    single-partition global sort."""
    w = dsir_logweights(df, target_df, id_col, text_col, n_buckets)
    key = F.col("logweight_micro").cast("double")
    if gumbel_seed is not None:
        from quickwit_spark.pipeline.textstats import LN_MICRO

        u = (
            F.expr(
                H15.format(
                    x=f"concat('{gumbel_seed}:', cast({id_col} as string))"
                )
            )
            % SAMPLE_MOD
            + F.lit(0.5)
        ) / SAMPLE_MOD
        key = key + F.round(-F.log(-F.log(u)) * LN_MICRO, 0)
    return (
        w.withColumn("_key", key)
        .orderBy(F.col("_key").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("_key")
    )


def frequency_cap(
    df: DataFrame,
    group_col: str = "source",
    max_per_group: int = 1000,
    id_col: str = "doc_id",
    seed: str = "cap0",
) -> DataFrame:
    """Per-group document cap (the RefinedWeb/C4 per-domain guard: a
    handful of template-heavy hosts otherwise dominate a crawl): keep
    at most ``max_per_group`` docs per group, chosen by deterministic
    md5 rank (H15(seed:id), ties by id) so the survivors are
    bit-reproducible across engines and runs, and a group's survivor
    set only shrinks predictably as the cap tightens (rank is
    cap-independent). ONE window shuffle on the group key; heavily
    skewed groups are bounded by the cap itself downstream."""
    from pyspark.sql import Window

    h = F.expr(
        H15.format(x=f"concat('{seed}:', cast({id_col} as string))")
    )
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= max_per_group)
        .drop("_rk")
    )
