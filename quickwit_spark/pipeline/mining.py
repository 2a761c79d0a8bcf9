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
