"""Large-scale rank-identity validation: engine vs the pure-Python
oracle on a 200k-turn corpus (100× the unit-test fixtures) across the
F7 query battery. Run standalone:

    python scripts/validate_large.py [n_turns] [n_splits] [merge_factor]

``n_splits`` defaults to 16 with a 4/8 merge policy (16 -> 2 splits);
``validate_large.py 10000000 8 8`` builds 8 x 1.25M-doc splits and
merges 8 -> 1, exercising a single split at the production
``split_num_docs_target`` (10M docs, index_config.rs:180-182).

Prints one JSON verdict line; exits non-zero on any mismatch."""

from __future__ import annotations

import json
import sys
import tempfile
import time


QUERIES = (
    ["w00000", "w00001", "w00004", "w00120", "w00400", "w02500", "w09000",
     "hotterm"]
    + ["w00000 w00050", "w00001 w00120", "w00120 OR w02500",
       "w00000 -w00001", "NOT w00000 AND w00050",
       '"w00000 w00001"~1', '"w00001 w00002"~3',
       "role:user AND w00003", "tool:python AND w00002",
       "(w00000 OR w00050) AND (w00001 OR w00120)",
       "w00050 OR (w00001 AND w00120)",
       "(w00000 AND w00050) OR (w00001 AND w00200)",
       "(w00050 OR (w00001 AND w00120)) AND w00002"]
)


def main() -> int:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    sys.path.insert(0, "/root/repo")
    from quickwit_spark.config import IndexConfig
    from quickwit_spark.operators.build import build_index
    from quickwit_spark.operators.search import Searcher
    from quickwit_spark.oracle import OracleEngine
    from quickwit_spark.session import get_spark
    from quickwit_spark.sources.transcripts import generate_transcripts

    t0 = time.time()
    n_splits = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    merge_factor = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    cfg = IndexConfig(hot_term_doc_freq=5000, salt_docid_range=2048)
    pdf = generate_transcripts(n_turns, seed=42, hot_term_frac=0.1)
    gen_sec = time.time() - t0

    spark = get_spark("validate_large")
    d = tempfile.mkdtemp(prefix="qs_validate_")
    t0 = time.time()
    build_index(spark, spark.createDataFrame(pdf), d + "/idx", cfg, n_splits=n_splits)
    build_sec = time.time() - t0

    t0 = time.time()
    oracle = OracleEngine(pdf, cfg, n_splits=n_splits)
    oracle_sec = time.time() - t0

    se = Searcher(spark, d + "/idx")
    failures = []
    checked = 0
    for q in QUERIES:
        for k in (1, 10, 100):
            n_o, hits_o = oracle.search(q, k=k)
            r = se.search(q, k=k)
            checked += 1
            ok = (
                r.num_hits == n_o
                and [(h.split_id, h.docid) for h in r.hits]
                == [(h.split_id, h.docid) for h in hits_o]
                and all(
                    abs(a.score - b.score) < 1e-9
                    for a, b in zip(hits_o, r.hits)
                )
            )
            if not ok:
                failures.append({"query": q, "k": k, "oracle_hits": n_o,
                                 "engine_hits": r.num_hits})
    # post-merge phase: hierarchical compaction must preserve the match
    # sets and every score exactly (tie encoding may differ — split ids
    # change)
    from quickwit_spark.operators.merge import run_merge_pipeline
    from quickwit_spark.plans.catalog import Catalog

    cat = Catalog.load(d + "/idx")
    cat.config = IndexConfig(
        hot_term_doc_freq=cfg.hot_term_doc_freq,
        salt_docid_range=cfg.salt_docid_range,
        merge_factor=merge_factor, max_merge_factor=max(8, merge_factor),
        min_level_num_docs=1000,
    )
    cat._commit()
    t0 = time.time()
    n_merges = run_merge_pipeline(spark, d + "/idx")
    merge_sec = time.time() - t0
    se2 = Searcher(spark, d + "/idx")
    merge_failures = []
    for q in QUERIES[:10]:
        n_o, hits_o = oracle.search(q, k=200)
        r = se2.search(q, k=200)
        # merge renames splits, so the (split_id, docid) tie encoding
        # changes: require exact num_hits, exact score SEQUENCE, and
        # identical doc sets STRICTLY ABOVE the k-th score (equal-score
        # members at the boundary may legitimately differ)
        so = [round(h.score, 9) for h in hits_o]
        sg = [round(h.score, 9) for h in r.hits]
        ok = n_o == r.num_hits and so == sg
        if ok and so:
            thr = so[-1]
            o_set = {(h.conv_id, h.turn_idx) for h in hits_o if round(h.score, 9) > thr}
            g_set = {(h.conv_id, h.turn_idx) for h in r.hits if round(h.score, 9) > thr}
            ok = o_set == g_set
        if not ok:
            merge_failures.append({"query": q})

    print(json.dumps({
        "n_turns": n_turns, "n_splits": n_splits,
        "queries_checked": checked, "failures": failures,
        "n_merges": n_merges,
        "post_merge_splits": len(Catalog.load(d + "/idx").published_splits()),
        "merge_failures": merge_failures,
        "verdict": (
            "RANK_IDENTICAL" if not failures and not merge_failures else "MISMATCH"
        ),
        "gen_sec": round(gen_sec, 1), "build_sec": round(build_sec, 1),
        "oracle_build_sec": round(oracle_sec, 1),
        "merge_sec": round(merge_sec, 1),
    }))
    return 1 if failures or merge_failures else 0


if __name__ == "__main__":
    sys.exit(main())
