"""Scale validation for the incremental-curation additions: standing
digest-index dedup, paragraph-level dedup, and DSIR importance
weighting at millions of docs on local[32].

Usage: python scripts/validate_incremental_scale.py [n_docs]
(default 10M). Prints one JSON line per op: rows in/out, wall seconds,
rows/sec, plus invariant checks (every batch doc whose digest is in
the index is flagged; a sampled paragraph digest's dup_count matches a
direct count; DSIR n_feats sums to the independently-computed feature
total). Run on an otherwise-idle host; the bench canary is printed
first so the record shows window quality.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

    import bench  # noqa: E402  (repo root on path)
    print(json.dumps({"canary_hashes_per_sec": round(bench._cpu_canary(), 1)}))

    from pyspark.sql import functions as F

    from quickwit_spark.pipeline.dedup import (
        exact_dedup_incremental,
        paragraph_dedup,
        write_digest_index,
    )
    from quickwit_spark.pipeline.sampling import dsir_logweights
    from quickwit_spark.session import get_spark

    spark = get_spark("scale-incremental", cpus=32)

    def timed(name, df, n_in):
        t0 = time.time()
        n_out = df.count()
        dt = time.time() - t0
        print(json.dumps({
            "op": name, "rows_in": n_in, "rows_out": n_out,
            "sec": round(dt, 2), "rows_in_per_sec": round(n_in / dt, 1),
        }))
        return n_out

    # ~12-token docs; the text is a pure function of k = id % (0.8 * n)
    # so ~20% of docs are exact duplicates of an earlier doc — the
    # realistic crawl shape
    def docs(lo: int, hi: int):
        k = F.col("id") % (n_docs * 8 // 10)
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("w"), k.cast("string"),
                F.lit(" the quick brown fox jumps over the lazy dog token "),
                (k % 97).cast("string"),
            ).alias("text"),
        )

    # --- incremental exact dedup ----------------------------------------
    n_corpus = n_docs * 9 // 10
    idx = os.path.join(tempfile.gettempdir(), f"scale_digidx_{n_docs}")
    t0 = time.time()
    write_digest_index(docs(0, n_corpus), idx)
    print(json.dumps({
        "op": "write_digest_index", "rows_in": n_corpus,
        "sec": round(time.time() - t0, 2),
        "rows_in_per_sec": round(n_corpus / (time.time() - t0), 1),
    }))
    batch = docs(n_corpus, n_docs)
    ann = exact_dedup_incremental(spark, batch, idx)
    # aggregate over the computed flags so Catalyst cannot prune the
    # window/join away under a bare count()
    t0 = time.time()
    n_flagged = ann.agg(
        F.sum(F.col("is_dup").cast("long"))
    ).first()[0]
    print(json.dumps({
        "op": "exact_dedup_incremental", "rows_in": n_docs - n_corpus,
        "rows_flagged": int(n_flagged), "sec": round(time.time() - t0, 2),
        "rows_in_per_sec": round((n_docs - n_corpus) / (time.time() - t0), 1),
    }))
    # invariant: flagged-vs-corpus == batch digests present in the index
    stored = spark.read.parquet(idx).select("digest")
    want = (
        batch.select(F.md5("text").alias("digest"))
        .join(stored, "digest", "left_semi").count()
    )
    got = ann.where("is_dup_corpus").count()
    assert got == want, (got, want)

    # --- paragraph dedup --------------------------------------------------
    # 4-paragraph pages; each paragraph drawn from an (n/10)-string
    # pool so boilerplate repeats ~10x across pages at any scale
    n_pages = n_docs // 4
    pool = max(n_docs // 10, 10)
    pages = spark.range(n_pages).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "\n",
            F.concat(F.lit("para "), ((F.col("id") * 4) % pool).cast("string")),
            F.concat(F.lit("para "), ((F.col("id") * 4 + 1) % pool).cast("string")),
            F.concat(F.lit("para "), ((F.col("id") * 4 + 2) % pool).cast("string")),
            F.concat(F.lit("para "), ((F.col("id") * 4 + 3) % pool).cast("string")),
        ).alias("text"),
    )
    marked = paragraph_dedup(pages)
    t0 = time.time()
    n_paras, n_dup = marked.agg(
        F.count(F.lit(1)), F.sum(F.col("is_dup").cast("long"))
    ).first()
    print(json.dumps({
        "op": "paragraph_dedup", "rows_in": n_pages,
        "paras": int(n_paras), "dup_paras": int(n_dup),
        "sec": round(time.time() - t0, 2),
        "rows_in_per_sec": round(n_pages / (time.time() - t0), 1),
    }))
    # invariant: a sampled digest's dup_count equals its direct count
    sample = marked.where("doc_id = 123 and para_idx = 0").first()
    direct = marked.where(F.col("para_digest") == sample.para_digest).count()
    assert sample.dup_count == direct, (sample.dup_count, direct)
    exp = n_docs // pool  # occurrences of each pooled para string
    assert abs(sample.dup_count - exp) <= 1, (sample.dup_count, exp)

    # --- DSIR -------------------------------------------------------------
    corpus = docs(0, n_docs)
    target = corpus.where("doc_id % 997 = 0")
    w = dsir_logweights(corpus, target)
    t0 = time.time()
    lw_sum, got_feats = w.agg(
        F.sum("logweight_micro"), F.sum("n_feats")
    ).first()
    print(json.dumps({
        "op": "dsir_logweights", "rows_in": n_docs,
        "logweight_micro_sum": int(lw_sum),
        "sec": round(time.time() - t0, 2),
        "rows_in_per_sec": round(n_docs / (time.time() - t0), 1),
    }))
    # invariant: n_feats sums to the independent unigram+bigram total
    toks = "regexp_extract_all(lower(text), '[0-9a-z]+', 0)"
    want_feats = corpus.select(
        F.expr(f"size({toks}) + greatest(size({toks}) - 1, 0)").alias("nf")
    ).agg(F.sum("nf")).first()[0]
    assert got_feats == want_feats, (got_feats, want_feats)

    spark.stop()
    print(json.dumps({"status": "ok"}))


if __name__ == "__main__":
    main()
