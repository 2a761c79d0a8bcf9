"""Scale validation for the round-4 retrieval/quality additions:
hybrid RRF retrieval (batch BM25 + cosine fusion), the C4 filter
battery, and the bigram-LM quality score at millions of rows on
local[32].

Usage: python scripts/validate_retrieval_scale.py [n_docs] [n_queries]
(defaults 1M docs / 256 queries). Prints one JSON line per op: rows
in/out, wall seconds, rows/sec, plus EXACT invariant checks computed
over the FULL output (not samples):

* hybrid: rrf_micro == sum of the integer contributions implied by
  the reported per-side ranks, n_sides == count of non-null sides,
  fused_rank is a dense 1..k per query;
* c4: kept lines never exceed lines; zero-sentence pages never keep;
* bigram: logprob <= 0 everywhere (ML conditional prob <= 1) and
  n_bigrams == max(n_tokens - 1, 0) doc-for-doc;
* ccnet_buckets: every row's label equals a replay against
  independently recomputed unrounded quantile cuts;
* ccnet_buckets_by_lang: same replay PER GROUP over a separate
  corpus with three planted languages — every language buckets
  against its own distribution and contains heads;
* semantic_decontaminate (1M corpus vs 256-vector eval set):
  contaminated == (max_cosine >= thr) exactly, cosines in [-1, 1],
  nearest id always present and inside the eval set.

Run on an otherwise-idle host; the bench canary is printed first so
the record shows window quality (correctness checks are
window-independent; wall times are not).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import bench  # noqa: E402  (repo root on path)
    print(json.dumps({"canary_hashes_per_sec": round(bench._cpu_canary(), 1)}))

    from pyspark.sql import functions as F

    from quickwit_spark.operators.build import build_index
    from quickwit_spark.config import FieldConfig, IndexConfig
    from quickwit_spark.session import get_spark

    spark = get_spark("scale-retrieval", cpus=32)
    t_all0 = time.time()

    def report(name, sec, rows_in, rows_out, **extra):
        print(json.dumps({
            "op": name, "rows_in": rows_in, "rows_out": rows_out,
            "sec": round(sec, 2),
            "rows_in_per_sec": round(rows_in / max(sec, 1e-9), 1),
            **extra,
        }))

    # --- corpus: n_docs docs of 20-59 uniform-vocab words (xxhash64 —
    # Spark-side only, no oracle here) + deterministic 16-dim vectors
    VOCAB, DIM = 2_000, 16
    word = "concat('w', lpad(cast(pmod(xxhash64(id, i), {v}) as string), 5, '0'))"
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(1, 20 + cast(id % 40 as int)),"
            f" i -> {word.format(v=VOCAB)}), ' ')"
        ).alias("text"),
        F.expr(
            "timestamp'2025-01-01 00:00:00'"
            " + make_interval(0,0,0,0,0,0, cast(id % 86400 as int))"
        ).alias("ts"),
    )
    workdir = tempfile.mkdtemp(prefix="qs_retr_scale_")
    src = os.path.join(workdir, "docs.parquet")
    docs.write.parquet(src)
    docs = spark.read.parquet(src)

    embs = spark.range(n_docs).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {DIM}),"
            " j -> (cast(pmod(xxhash64(id, j, 7), 2001) as double) - 1000.0)"
            " / 1000.0)"
        ).alias("embedding"),
    )

    # --- index build over the corpus --------------------------------
    cfg = IndexConfig(
        fields=(FieldConfig("text", tokenizer="default", record="position"),),
        default_search_field="text",
        timestamp_field="ts",
        tag_fields=(),
        doc_key_fields=("doc_id",),
        routing_field="doc_id",
    )
    idx = os.path.join(workdir, "index")
    t0 = time.time()
    build_index(spark, docs, idx, cfg, n_splits=16)
    report("index_build", time.time() - t0, n_docs, n_docs)

    # --- hybrid RRF over Q two-term conjunctions ---------------------
    qdf = spark.range(n_queries).select(
        F.concat(F.lit("q"), F.col("id")).alias("query_id"),
        F.expr(
            "concat('w', lpad(cast(pmod(xxhash64(id, 1, 11), 2000) as string), 5, '0'),"
            " ' ',"
            " 'w', lpad(cast(pmod(xxhash64(id, 2, 11), 2000) as string), 5, '0'))"
        ).alias("query"),
    )
    qvecs = spark.range(n_queries).select(
        F.concat(F.lit("q"), F.col("id")).alias("query_id"),
        F.expr(
            f"transform(sequence(1, {DIM}),"
            " j -> (cast(pmod(xxhash64(id, j, 13), 2001) as double) - 1000.0)"
            " / 1000.0)"
        ).alias("embedding"),
    )

    from quickwit_spark.pipeline.mining import RRF_SCALE, hybrid_bm25_cosine_topk

    K, DEPTH, RRF_K = 10, 40, 60
    t0 = time.time()
    out = hybrid_bm25_cosine_topk(
        spark, idx, qdf, embs, qvecs, k=K, depth=DEPTH, rrf_k=RRF_K,
    ).persist()
    n_out = out.count()
    dt = time.time() - t0

    contrib = (
        f"coalesce(cast(floor({float(RRF_SCALE)} / ({RRF_K} + lex_rank)) as bigint), 0L)"
        f" + coalesce(cast(floor({float(RRF_SCALE)} / ({RRF_K} + sem_rank)) as bigint), 0L)"
    )
    bad_micro = out.where(F.expr(f"rrf_micro <> ({contrib})")).count()
    bad_sides = out.where(
        F.expr(
            "n_sides <> (case when lex_rank is null then 0 else 1 end"
            " + case when sem_rank is null then 0 else 1 end)"
        )
    ).count()
    ranks = out.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("fused_rank").alias("nd"),
        F.min("fused_rank").alias("lo"),
        F.max("fused_rank").alias("hi"),
    )
    bad_rank = ranks.where(
        f"n <> nd or lo <> 1 or hi <> n or n > {K}"
    ).count()
    out.unpersist()
    report(
        "hybrid_rrf_topk", dt, n_docs, n_out,
        n_queries=n_queries, bad_micro=bad_micro, bad_sides=bad_sides,
        bad_rank_seq=bad_rank,
    )
    assert bad_micro == 0 and bad_sides == 0 and bad_rank == 0

    # --- C4 battery over a synthesized multiline corpus -------------
    from quickwit_spark.pipeline.textstats import bigram_logprob, c4_rules

    lined = docs.select(
        "doc_id",
        F.regexp_replace(
            F.col("text"), r"(([a-z0-9]+ ){4}[a-z0-9]+) ", "$1.\n"
        ).alias("text"),
    )
    t0 = time.time()
    c4 = c4_rules(lined).persist()
    n_c4 = c4.count()
    dt = time.time() - t0
    bad_lines = c4.where("n_kept_lines > n_lines").count()
    bad_keep = c4.where("n_sentences = 0 and c4_keep").count()
    n_kept = c4.where("c4_keep").count()
    c4.unpersist()
    report("c4_rules", dt, n_docs, n_c4, kept=n_kept,
           bad_lines=bad_lines, bad_zero_sentence_keep=bad_keep)
    assert n_c4 == n_docs and bad_lines == 0 and bad_keep == 0

    # --- bigram LM over the flat corpus ------------------------------
    t0 = time.time()
    bg = bigram_logprob(docs).persist()
    n_bg = bg.count()
    dt = time.time() - t0
    bad_pos = bg.where("logprob > 0").count()
    from quickwit_spark.pipeline.textstats import tokens_col

    ntk = docs.select("doc_id", F.size(tokens_col("text")).alias("nt"))
    bad_n = (
        bg.join(ntk, "doc_id")
        .where("n_bigrams <> greatest(nt - 1, 0)")
        .count()
    )
    from quickwit_spark.pipeline.dedup import unpersist_intermediates

    unpersist_intermediates(bg)
    bg.unpersist()
    report("bigram_logprob", dt, n_docs, n_bg,
           bad_positive=bad_pos, bad_bigram_count=bad_n)
    assert n_bg == n_docs and bad_pos == 0 and bad_n == 0

    # --- CCNet buckets over the flat corpus --------------------------
    from quickwit_spark.pipeline.textstats import ccnet_buckets

    t0 = time.time()
    cb = ccnet_buckets(docs).persist()
    n_cb = cb.count()
    dt = time.time() - t0
    # every row's label must match a replay against independently
    # recomputed UNROUNDED quantile cuts (the output's cut_lo/cut_hi
    # are 6dp-rounded for display — labeling happened on the exact
    # values, so the replay must too or a doc scoring exactly
    # round(cut, 6) false-fails when the cut is interpolated)
    recut = cb.agg(
        F.expr(f"percentile(logprob, {1.0 - 1 / 3}D)").alias("_rhi"),
        F.expr(f"percentile(logprob, {float(1 / 3)}D)").alias("_rlo"),
    )
    bad_label = cb.crossJoin(F.broadcast(recut)).where(
        "ccnet_bucket <> (case when logprob is null then null"
        " when logprob >= _rhi then 'head'"
        " when logprob < _rlo then 'tail' else 'middle' end)"
        " or ccnet_bucket is null or cut_lo > cut_hi"
        " or abs(cut_hi - round(_rhi, 6)) > 1e-9"
        " or abs(cut_lo - round(_rlo, 6)) > 1e-9"
    ).count()
    fracs = {
        r.ccnet_bucket: r.n
        for r in cb.groupBy("ccnet_bucket").agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    unpersist_intermediates(cb)
    cb.unpersist()
    report("ccnet_buckets", dt, n_docs, n_cb,
           bad_label=bad_label, bucket_counts=fracs)
    assert n_cb == n_docs and bad_label == 0

    # --- per-language CCNet buckets over a planted-language corpus ---
    # separate corpus: every doc gets a language by id % 3 and leads
    # with that language's stopwords so lang_id is deterministic
    from quickwit_spark.pipeline.textstats import ccnet_buckets, lang_id

    planted = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat(element_at(array('the a of and is', 'der die das und ist',"
            " 'le la les et est'), cast(id % 3 as int) + 1), ' ',"
            "array_join(transform(sequence(1, 16 + cast(id % 16 as int)),"
            f" i -> {word.format(v=VOCAB)}), ' '))"
        ).alias("text"),
    )
    langs = lang_id(planted).select(
        "doc_id", F.col("lang_pred").alias("pred_lang")
    )
    t0 = time.time()
    cbl = ccnet_buckets(planted.join(langs, "doc_id"),
                        by_col="pred_lang").persist()
    n_cbl = cbl.count()
    dt = time.time() - t0
    recut_g = cbl.groupBy("pred_lang").agg(
        F.expr(f"percentile(logprob, {1.0 - 1 / 3}D)").alias("_rhi"),
        F.expr(f"percentile(logprob, {float(1 / 3)}D)").alias("_rlo"),
    )
    bad_glabel = cbl.join(F.broadcast(recut_g), "pred_lang").where(
        "ccnet_bucket <> (case when logprob is null then null"
        " when logprob >= _rhi then 'head'"
        " when logprob < _rlo then 'tail' else 'middle' end)"
        " or ccnet_bucket is null"
        " or abs(cut_hi - round(_rhi, 6)) > 1e-9"
        " or abs(cut_lo - round(_rlo, 6)) > 1e-9"
    ).count()
    gcounts = {
        (r.pred_lang, r.ccnet_bucket): r.n
        for r in cbl.groupBy("pred_lang", "ccnet_bucket")
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_langs = len({k[0] for k in gcounts})
    heads_per_lang = all(
        any(k == (lang, "head") for k in gcounts)
        for lang in {k[0] for k in gcounts}
    )
    unpersist_intermediates(cbl)
    cbl.unpersist()
    report("ccnet_buckets_by_lang", dt, n_docs, n_cbl,
           bad_label=bad_glabel, n_langs=n_langs,
           every_lang_has_heads=heads_per_lang)
    assert n_cbl == n_docs and bad_glabel == 0 and n_langs == 3
    assert heads_per_lang

    # --- semantic decontamination vs a 256-vector eval set -----------
    from quickwit_spark.pipeline.sampling import semantic_decontaminate

    ev = embs.where(F.col("vec_id") < 256)
    corpus_v = embs.where(F.col("vec_id") >= 256)
    t0 = time.time()
    sd = semantic_decontaminate(corpus_v, ev, threshold=0.9).persist()
    n_sd = sd.count()
    dt = time.time() - t0
    bad_flag = sd.where(
        "contaminated <> coalesce(max_cosine >= 0.9, false)"
        " or (max_cosine is not null and abs(max_cosine) > 1.000001)"
        " or (max_cosine is not null and nearest_eval_id is null)"
        " or (nearest_eval_id is not null and nearest_eval_id >= 256)"
    ).count()
    n_cont = sd.where("contaminated").count()
    sd.unpersist()
    report("semantic_decontaminate", dt, n_docs - 256, n_sd,
           contaminated=n_cont, bad=bad_flag)
    assert n_sd == n_docs - 256 and bad_flag == 0

    print(json.dumps({
        "total_sec": round(time.time() - t_all0, 1),
        "verdict": "ALL_INVARIANTS_PASS",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
