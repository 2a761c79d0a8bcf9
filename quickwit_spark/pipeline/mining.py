"""Hard-negative mining: BM25 retrieval minus known positives.

Contrastive retrieval training (DPR, Karpukhin et al. 2020; RocketQA)
wants, for every training query, the highest-BM25-scoring documents
that are NOT labeled relevant — "hard" negatives the embedding model
must learn to push away. The reference engine would serve this one
query at a time (quickwit-search/src/root.rs request loop); here it is
one declarative Spark plan over the whole query table:

* candidate generation is ``operators/batch_search.batch_bm25_topk``
  (one posting scan amortized across every query, vectorized decode,
  conjunction groupBy, per-query window) with a mining depth ``k``
  deep enough to survive the positive-removal cut;
* positives are removed with a ``left_anti`` join on
  ``(query_id, doc_key)`` — co-shuffled with the k·Q candidate rows,
  broadcast automatically by AQE when the label table is small;
* survivors re-rank per query on the engine's tie order
  (score desc, split_id asc, docid asc) and cut to ``n_neg``.

Shuffle inventory at scale (Q queries, P matched posting rows):
everything up to the candidate top-k is batch_search's plan (two
shuffles over O(P) rows); the mining tail adds one anti-join and one
window over only k·Q candidate rows. Nothing driver-side, nothing
per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from quickwit_spark.operators.batch_search import batch_bm25_topk


def mine_hard_negatives(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 50,
    n_neg: int = 10,
    doc_key: str = "doc_id",
    mode: str = "all",
) -> DataFrame:
    """Top ``n_neg`` BM25-ranked non-positive docs per query.

    queries: (query_id, query) — see batch_bm25_topk.
    positives: (query_id, <doc_key>) labeled-relevant pairs to exclude;
      extra columns are ignored.
    k: mining depth — candidates retrieved per query BEFORE positive
      removal. Must exceed ``n_neg`` by at least the expected number of
      positives ranked inside the top k, or queries come up short
      (shortfalls are visible: fewer than n_neg rows for that query).
    doc_key: doc-store column identifying a document to the label set
      (fetched for candidates only — k·Q rows).

    Returns (query_id, <doc_key>, neg_rank, score) with neg_rank
    1..n_neg per query in engine tie order (score desc, split_id asc,
    docid asc).
    """
    if n_neg > k:
        raise ValueError(f"n_neg ({n_neg}) must be <= mining depth k ({k})")
    hits = batch_bm25_topk(
        spark, index_dir, queries, k=k, fetch_cols=(doc_key,), mode=mode
    )
    negatives = hits.join(
        positives.select("query_id", doc_key).distinct(),
        ["query_id", doc_key],
        "left_anti",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("split_id").asc(), F.col("docid").asc()
    )
    return (
        negatives.withColumn("neg_rank", F.row_number().over(w))
        .where(F.col("neg_rank") <= n_neg)
        .select("query_id", doc_key, "neg_rank", "score")
    )


def retrieval_metrics(
    hits: DataFrame,
    gold: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Retrieval-quality evaluation: for every query in ``gold``, the
    rank of its best gold document inside the top-``k`` retrieved hits
    and the reciprocal rank (the per-query MRR@k component; averaging
    recip_rank over queries gives MRR@k, counting gold_rank non-null
    gives recall@k when gold is one-doc-per-query).

    hits: retrieval output (query_id, doc_id, score) — e.g.
      ``operators/batch_search.batch_bm25_topk``; deeper than k is
      fine, the cut happens here on the engine-independent tie order
      (score rounded to 4dp desc, doc_id asc).
    gold: labeled-relevant (query_id, doc_id) pairs; queries with no
      retrieved gold doc keep a row (gold_rank NULL, recip_rank 0.0).

    Scale: hits is already k·Q rows; one window over it, two
    query_id-keyed joins with the (small, broadcastable) gold table.
    Returns (query_id, gold_rank, recip_rank).
    """
    w = Window.partitionBy(query_col).orderBy(
        F.round(F.col(score_col), 4).desc(), F.col(doc_col).asc()
    )
    ranked = hits.withColumn("_rnk", F.row_number().over(w)).where(
        F.col("_rnk") <= int(k)
    )
    matched = (
        ranked.join(
            gold.select(query_col, doc_col), [query_col, doc_col]
        )
        .groupBy(query_col)
        .agg(F.min("_rnk").alias("gold_rank"))
    )
    per_q = gold.select(query_col).distinct().join(
        matched, query_col, "left"
    )
    return per_q.select(
        query_col,
        F.col("gold_rank").cast("int").alias("gold_rank"),
        F.round(
            F.when(
                F.col("gold_rank").isNotNull(), 1.0 / F.col("gold_rank")
            ).otherwise(0.0),
            6,
        ).alias("recip_rank"),
    )


# RRF contributions are quantized to integer units of 1e-9 so the
# per-doc sum is exact integer arithmetic — bit-identical across
# Spark / DuckDB / Python regardless of how many ranked lists are
# fused or in what order the aggregate visits them (a float sum of
# >2 contributions would depend on groupBy visit order)
RRF_SCALE = 1_000_000_000


def rrf_fuse(
    sides: "list[DataFrame]",
    k: int = 10,
    rrf_k: int = 60,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    any number of ranked retrieval lists: every (query, doc) pair
    scores ``sum over sides of 1/(rrf_k + rank)``, using only the
    RANK each side assigned — no score calibration between retrieval
    systems with incomparable score scales (BM25 vs cosine vs a
    reranker). The standard hybrid-search combiner (Elasticsearch /
    OpenSearch expose exactly this).

    sides: DataFrames each holding (query_col, doc_col, rank_col)
      with 1-based ranks; extra columns are ignored. A doc missing
      from a side simply contributes nothing for that side.
    rrf_k: the damping constant (60 in the paper and in both ES and
      OpenSearch defaults) — larger values flatten the rank curve.

    Each contribution is ``floor(RRF_SCALE / (rrf_k + rank))`` — an
    exact integer both engines compute identically (one IEEE-754
    double division, correctly rounded, then floor), so ``rrf_micro``
    sums and the (rrf_micro desc, doc asc) fused order are
    cross-engine deterministic; ``rrf_score`` is the float view.

    Scale: each input is already a k·Q-row ranked list; the union is
    sides·k·Q rows, one groupBy and one window over that — nothing
    corpus-proportional touches this operator.

    Returns (query_col, doc_col, fused_rank, rrf_micro, rrf_score,
    n_sides), fused_rank 1..k per query.
    """
    if not sides:
        raise ValueError("rrf_fuse needs at least one ranked side")
    contrib = F.floor(
        F.lit(float(RRF_SCALE)) / (F.lit(int(rrf_k)) + F.col(rank_col))
    ).cast("long")
    tagged = [
        s.select(
            F.col(query_col),
            F.col(doc_col),
            contrib.alias("_c"),
        )
        for s in sides
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    fused = u.groupBy(query_col, doc_col).agg(
        F.sum("_c").alias("rrf_micro"),
        F.count(F.lit(1)).cast("long").alias("n_sides"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_micro").desc(), F.col(doc_col).asc()
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .where(F.col("fused_rank") <= int(k))
        .select(
            query_col,
            doc_col,
            "fused_rank",
            "rrf_micro",
            F.round(F.col("rrf_micro") / F.lit(float(RRF_SCALE)), 6)
            .alias("rrf_score"),
            "n_sides",
        )
    )


def hybrid_bm25_cosine_topk(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    corpus_vecs: DataFrame,
    query_vecs: DataFrame,
    k: int = 10,
    depth: int = 40,
    rrf_k: int = 60,
    doc_key: str = "doc_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "all",
    overfetch: int = 8,
) -> DataFrame:
    """Hybrid lexical+semantic retrieval: batch BM25 over the inverted
    index fused with exact cosine over the embedding corpus by
    reciprocal-rank fusion — the RAG retrieval stack's standard
    two-tower recall layer, as ONE declarative Spark plan per side
    plus a k·Q-row fusion tail.

    queries: (query_id, query) text table — see batch_bm25_topk.
    query_vecs: (query_id, <vec_col>) — the SAME query ids with their
      embedding (produced upstream by whatever encoder; at test scale
      a fixture mapping).
    corpus_vecs: (<id_col>, <vec_col>) where id values are the doc
      ids the lexical side reports under ``doc_key``.
    depth: per-side candidate depth fed into fusion (fusion can
      promote a doc ranked depth-th on both sides above a doc ranked
      1st on one, so depth > k matters).
    overfetch: extra lexical candidates retrieved in engine tie order
      BEFORE the engine-independent re-rank cuts to ``depth`` — keeps
      unrounded-score boundary ties away from the depth cut (the same
      buffer discipline the driver-gate entries use); raise it (or
      set it very large) when exact cross-engine reproducibility of
      the depth-th lexical candidate matters more than retrieval
      volume.

    Per-side ranks are engine-independent: lexical on (score rounded
    4dp desc, doc asc), semantic on (cosine rounded 6dp desc, doc
    asc) — the same tie discipline as retrieval_metrics.

    Scale: the lexical side is batch_search's amortized posting-scan
    plan; the semantic side broadcasts the query vectors and never
    shuffles the corpus; fusion touches 2·depth·Q rows. Returns
    (query_id, <doc_key>, fused_rank, rrf_micro, rrf_score, n_sides,
    lex_rank, sem_rank).
    """
    from quickwit_spark.pipeline.similarity import cosine_topk

    hits = batch_bm25_topk(
        spark, index_dir, queries, k=int(depth) + int(overfetch),
        fetch_cols=(doc_key,), mode=mode,
    )
    wl = Window.partitionBy("query_id").orderBy(
        F.round(F.col("score"), 4).desc(), F.col(doc_key).asc()
    )
    lex = (
        hits.withColumn("lex_rank", F.row_number().over(wl).cast("long"))
        .where(F.col("lex_rank") <= int(depth))
        .select("query_id", doc_key, "lex_rank")
    )
    sem = cosine_topk(
        corpus_vecs,
        query_vecs.select(
            F.col("query_id").alias(id_col), F.col(vec_col)
        ),
        k=depth,
        id_col=id_col,
        vec_col=vec_col,
        exclude_self=False,
    ).select(
        "query_id",
        F.col("neighbor_id").alias(doc_key),
        F.col("rank").cast("long").alias("sem_rank"),
    )
    fused = rrf_fuse(
        [
            lex.withColumnRenamed("lex_rank", "rank"),
            sem.withColumnRenamed("sem_rank", "rank"),
        ],
        k=k,
        rrf_k=rrf_k,
        query_col="query_id",
        doc_col=doc_key,
    )
    return (
        fused.join(lex, ["query_id", doc_key], "left")
        .join(sem, ["query_id", doc_key], "left")
        .select(
            "query_id",
            doc_key,
            "fused_rank",
            "rrf_micro",
            "rrf_score",
            "n_sides",
            "lex_rank",
            "sem_rank",
        )
    )
