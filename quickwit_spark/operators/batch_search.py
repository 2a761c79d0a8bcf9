"""Batch BM25 retrieval: top-k for a whole TABLE of queries in one job.

The reference engine answers one query per request — the root fans a
single query out to leaf nodes and merges partials
(quickwit-search/src/root.rs:35-108, leaf.rs). A training-data
pipeline needs the transpose: MILLIONS of queries (hard-negative
mining, RAG evaluation, distillation labeling) against the same index,
where per-request round-trips would be the bottleneck. This module
re-expresses retrieval as DataFrame joins between a query table and the
index's posting files, so Spark amortizes ONE scan of the postings
across every query:

* query tokenization uses the engine's own tokenizer (vectorized,
  mapInPandas — bit-identical terms to ``parse_query``);
* the distinct query-term set joins the posting scan on ``term``; when
  it is small enough it is ALSO pushed down as an ``isin`` filter so
  parquet row-group stats on the term-sorted posting files prune the
  scan (the batch analog of the per-query row-group point reads in
  operators/search.py);
* only MATCHED posting rows are decoded (vectorized delta+varint via
  functions/codec, numpy repeat/concatenate — no per-row Python);
* global BM25 stats come from the catalog (N, avgdl) and a ``sum(df)``
  over the same filtered posting scan (identical to the persisted
  term-stats table by construction);
* scoring/conjunction/top-k are pure built-in expressions: a
  ``groupBy(query, split, docid)`` enforcing all-terms-present for the
  default AND semantics (quickwit query language: terms combine with
  AND), then one ``row_number`` window per query.

Shuffle inventory at scale (Q queries, P matched posting rows):
decode output shuffles once for the (query, doc) groupBy and once for
the per-query top-k window; the doc-length join co-shuffles matched
rows with a two-column pruned scan of the doc store. Nothing is
corpus × corpus; the query-term table and per-term df table ride
broadcast joins. Scores match the sequential kernel to float-sum
association (the groupBy may re-associate the per-term partial sums;
ranks are identical wherever scores differ by more than ~1e-12).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from quickwit_spark.functions import fs as fsio
from quickwit_spark.operators.build import DOCS_FILE, POSTINGS_FILE
from quickwit_spark.plans.catalog import Catalog

# above this many distinct query terms, skip the driver-side collect and
# rely on the broadcast term join alone (no parquet pushdown): the isin
# literal list would bloat the plan and the scan is amortized anyway
DEFAULT_PUSHDOWN_MAX_TERMS = 10_000


def _split_id_col() -> F.Column:
    """Split id from the scanned file's path (…/<split_id>/postings.parquet
    — split files are immutable and live one directory per split)."""
    return F.element_at(F.split(F.input_file_name(), "/"), -2)


def _tokenize_queries(
    queries: DataFrame, tokenizer: str
) -> DataFrame:
    """(query_id, query) → (query_id, term, weight) with the ENGINE
    tokenizer (functions/tokenize semantics, incl. the 40-char
    pre-lowercase cap — same terms parse_query would produce).

    ``weight`` is the term's multiplicity in the query: the engine
    parses a repeated term as repeated must clauses, each contributing
    its full BM25 partial (tantivy boolean semantics), so the batch
    score multiplies the per-term partial by the occurrence count."""
    schema = StructType([
        queries.schema["query_id"],
        StructField("term", StringType()),
        StructField("weight", LongType()),
    ])

    def tok(batches):
        from quickwit_spark.functions.tokenize import tokenize_series
        from quickwit_spark.operators.build import limit_worker_threads

        limit_worker_threads()
        for pdf in batches:
            toks = tokenize_series(pdf["query"], tokenizer)
            lens = toks.map(len).to_numpy(dtype=np.int64)
            flat = [t for lst in toks for t in lst]
            out = pd.DataFrame({
                "query_id": pdf["query_id"].to_numpy().repeat(lens),
                "term": pd.Series(flat, dtype="object"),
            })
            yield out.groupby(
                ["query_id", "term"], as_index=False, sort=False
            ).size().rename(columns={"size": "weight"})

    return queries.mapInPandas(tok, schema=schema)


_DECODED_SCHEMA = StructType([
    StructField("split_id", StringType()),
    StructField("term", StringType()),
    StructField("docid", LongType()),
    StructField("tf", LongType()),
])


def _decode_postings(matched: DataFrame) -> DataFrame:
    """Vectorized posting-row explode: each (split, term, shard) row's
    delta+varint docid blob and varint tf blob become per-doc rows.
    Decode cost is O(matched posting entries) — rows for terms no query
    asked about never reach this kernel."""

    def decode(batches):
        from quickwit_spark.functions.codec import decode_varint, delta_decode
        from quickwit_spark.operators.build import limit_worker_threads

        limit_worker_threads()
        for pdf in batches:
            if not len(pdf):
                continue
            ids = [delta_decode(b) for b in pdf["doc_ids"]]
            tfs = [decode_varint(b) for b in pdf["tfs"]]
            counts = np.array([len(a) for a in ids], dtype=np.int64)
            yield pd.DataFrame({
                "split_id": pdf["split_id"].to_numpy().repeat(counts),
                "term": pdf["term"].to_numpy().repeat(counts),
                "docid": np.concatenate(ids).astype(np.int64),
                "tf": np.concatenate(tfs).astype(np.int64),
            })

    return matched.mapInPandas(decode, schema=_DECODED_SCHEMA)


def batch_bm25_topk(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
    field: str | None = None,
    mode: str = "all",
    fetch_cols: tuple[str, ...] | None = None,
    pushdown_max_terms: int = DEFAULT_PUSHDOWN_MAX_TERMS,
) -> DataFrame:
    """Top-k BM25 hits for every row of ``queries`` in one Spark plan.

    queries: DataFrame with columns (query_id, query); query text uses
      the engine's bag-of-terms semantics — ``mode='all'`` (default)
      requires every distinct term (the query language's implicit AND),
      ``mode='any'`` scores any-term matches (pure disjunction).
    k: hits per query; tie order (score desc, split_id asc, docid asc)
      — the engine's collector order (operators/search.py).
    field: indexed field to search; defaults to the index's
      default_search_field.
    fetch_cols: optional doc-store columns joined onto the winners only
      (k·Q rows — the batch analog of the root fetch_docs phase).

    Returns (query_id, split_id, docid, score[, *fetch_cols]).
    """
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    cat = Catalog.load(index_dir)
    cfg = cat.config
    field = field or cfg.default_search_field
    if field is None:
        raise ValueError(
            "No default field declared and no field specified in query."
        )
    fcfg = cfg.field(field)
    splits = cat.published_splits()
    n_total = cat.total_docs()
    if not splits or n_total == 0:
        from pyspark.sql.types import DoubleType

        schema = StructType([
            queries.schema["query_id"],
            StructField("split_id", StringType()),
            StructField("docid", LongType()),
            StructField("score", DoubleType()),
        ])
        return spark.createDataFrame([], schema)
    avgdl = cat.total_doc_len() / n_total
    k1, b = cfg.k1, cfg.b

    qterms = _tokenize_queries(queries.select("query_id", "query"), fcfg.tokenizer)
    n_required = qterms.groupBy("query_id").agg(
        F.count("*").alias("n_terms")
    )

    posting_paths = [
        fsio.spark_read_path(fsio.join(cat.split_dir(s.split_id), POSTINGS_FILE))
        for s in splits
    ]
    # filters BEFORE the split_id projection: input_file_name() is
    # nondeterministic, so a filter added after it cannot be pushed
    # through to the scan (verified on the executed plan)
    postings = spark.read.parquet(*posting_paths).where(F.col("field") == field)

    # parquet pushdown: when the distinct query-term set is small, an
    # isin literal filter reaches the scan and term-sorted row-group
    # stats prune it (bounded driver-side collect — limit guards it)
    pushed = False
    if pushdown_max_terms > 0:
        sample = [
            r.term
            for r in qterms.select("term").distinct()
            .limit(pushdown_max_terms + 1).collect()
        ]
        if len(sample) <= pushdown_max_terms:
            postings = postings.where(F.col("term").isin(sample))
            pushed = True
    postings = postings.withColumn("split_id", _split_id_col()).select(
        "split_id", "term", "df", "doc_ids", "tfs"
    )

    if pushed:
        # the isin literal IS the complete distinct-term set (the limit
        # guard proved it) — a broadcast semijoin on the same set would
        # only re-evaluate the tokenize subtree for zero extra pruning
        matched = postings
    else:
        matched = postings.join(
            F.broadcast(qterms.select("term").distinct()), "term"
        )
    # global df per term — sum of per-shard dfs over every split (each
    # docid appears in exactly one shard row per split, so this equals
    # the persisted term-stats table's value)
    df_g = matched.groupBy("term").agg(F.sum("df").alias("df_g"))

    decoded = _decode_postings(matched)

    doc_paths = [
        fsio.spark_read_path(fsio.join(cat.split_dir(s.split_id), DOCS_FILE))
        for s in splits
    ]
    doc_len = (
        spark.read.parquet(*doc_paths)
        .withColumn("split_id", _split_id_col())
        .select("split_id", "docid", "doc_len")
    )

    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_total)) - F.col("df_g") + F.lit(0.5))
        / (F.col("df_g") + F.lit(0.5))
    )
    tf = F.col("tf").cast("double")
    norm = (tf * F.lit(k1 + 1.0)) / (
        tf
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("doc_len") / F.lit(float(avgdl)))
    )

    contrib = (
        decoded
        .join(doc_len, ["split_id", "docid"])
        .join(F.broadcast(df_g), "term")
        .join(F.broadcast(qterms), "term")
        .select(
            "query_id", "split_id", "docid",
            (idf * norm * F.col("weight").cast("double")).alias("partial"),
        )
    )
    scored = contrib.groupBy("query_id", "split_id", "docid").agg(
        F.sum("partial").alias("score"), F.count("*").alias("n_matched")
    )
    if mode == "all":
        scored = scored.join(F.broadcast(n_required), "query_id").where(
            F.col("n_matched") == F.col("n_terms")
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("split_id").asc(), F.col("docid").asc()
    )
    topk = (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "split_id", "docid", "score")
    )

    if fetch_cols:
        payload = (
            spark.read.parquet(*doc_paths)
            .withColumn("split_id", _split_id_col())
            .select("split_id", "docid", *fetch_cols)
        )
        topk = topk.join(payload, ["split_id", "docid"])
    return topk


def searcher_reference_scores(
    searcher, query: str, k: int
) -> list[tuple[str, int, float]]:
    """Test helper: the sequential engine's (split_id, docid, score)
    list for one query — the per-query ground truth batch mode must
    reproduce."""
    resp = searcher.search(query, k=k)
    return [(h.split_id, h.docid, h.score) for h in resp.hits]


def brute_force_bm25(
    docs_tokens: dict, query_terms: list[str], n_total: int, avgdl: float,
    k1: float = 1.2, b: float = 0.75, require_all: bool = True,
) -> dict:
    """Pure-Python oracle for unit tests: {doc_key: score} over
    pre-tokenized docs (doc_key → token list)."""
    from collections import Counter

    df = Counter()
    tf_by_doc = {}
    for key, toks in docs_tokens.items():
        c = Counter(toks)
        tf_by_doc[key] = c
        for t in set(query_terms):
            if c.get(t):
                df[t] += 1
    out = {}
    for key, c in tf_by_doc.items():
        dl = sum(c.values())
        matched = [t for t in set(query_terms) if c.get(t)]
        if require_all and len(matched) != len(set(query_terms)):
            continue
        if not matched:
            continue
        s = 0.0
        for t in sorted(matched):
            idf = math.log(1.0 + (n_total - df[t] + 0.5) / (df[t] + 0.5))
            tfv = float(c[t])
            s += idf * tfv * (k1 + 1.0) / (
                tfv + k1 * (1.0 - b + b * dl / avgdl)
            )
        out[key] = s
    return out
