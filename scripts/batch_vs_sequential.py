"""Batch-vs-sequential retrieval throughput probe.

The reference engine serves one query per request (root fan-out,
quickwit-search/src/root.rs); training-data pipelines need the
transpose — a whole TABLE of queries against one index
(operators/batch_search.py). This probe quantifies the amortization
claim on the real sf index: Q deterministic queries run (a) through the
sequential ``Searcher`` loop (one root search per query, warm caches)
and (b) as ONE ``batch_bm25_topk`` Spark job, with top-k parity
asserted on a sample before any timing is trusted.

Usage:
    python scripts/batch_vs_sequential.py [sf_dir] [n_queries] [reps]

Prints one JSON line:
    {"sf": ..., "n_queries": Q, "k": 10,
     "sequential_sec": ..., "sequential_qps": ...,
     "batch_sec": ..., "batch_qps": ..., "batch_speedup": ...,
     "parity_checked": n, "host_canary": ...}

Determinism: the query workload is seeded combinations of the corpus's
own frequent terms (1-3 term conjunctions) — no RNG state leaks into
results, so reruns are comparable.
"""

from __future__ import annotations

import json
import random
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

# the frequent-term vocabulary of the synthetic documents corpus
# (TESTDATA.md); combinations of these hit hundreds of docs per query
VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "agg", "key", "query", "scan", "batch",
]


def make_queries(n: int) -> list[tuple[str, str]]:
    rng = random.Random(417)
    out = []
    for i in range(n):
        terms = rng.sample(VOCAB, rng.choice([1, 2, 2, 3]))
        out.append((f"q{i:04d}", " ".join(terms)))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    k = 10

    import pandas as pd

    import __spark_entry__ as entry
    from bench import _cpu_canary
    from quickwit_spark import get_spark
    from quickwit_spark.operators.batch_search import batch_bm25_topk
    from quickwit_spark.operators.search import Searcher

    canary = round(_cpu_canary(), 1)
    spark = get_spark(cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    idx = entry._docs_index(spark, sf_dir)
    se = Searcher(spark, idx)
    queries = make_queries(n_queries)
    qdf = spark.createDataFrame(
        pd.DataFrame(queries, columns=["query_id", "query"])
    )

    # ---- parity gate: batch top-k must reproduce the sequential
    # engine's (split, docid) ranking on a query sample ------------------
    sample = queries[:: max(1, n_queries // 8)]
    batch_hits = (
        batch_bm25_topk(spark, idx, qdf, k=k)
        .toPandas()
        .sort_values(["query_id", "score", "split_id", "docid"],
                     ascending=[True, False, True, True])
    )
    checked = 0
    for qid, qtext in sample:
        seq = [(h.split_id, h.docid) for h in se.search(qtext, k=k).hits]
        got = list(
            batch_hits[batch_hits["query_id"] == qid][["split_id", "docid"]]
            .itertuples(index=False, name=None)
        )
        if seq != got:
            raise SystemExit(
                f"parity FAIL on {qid} ({qtext!r}):\n seq={seq}\n bat={got}"
            )
        checked += 1

    # ---- timed: sequential loop (warm — parity pass touched caches) ----
    seq_samples = []
    for _ in range(reps):
        t0 = time.time()
        for _, qtext in queries:
            se.search(qtext, k=k)
        seq_samples.append(round(time.time() - t0, 3))
    seq_sec = sorted(seq_samples)[len(seq_samples) // 2]

    # ---- timed: one batch job (count() materializes every hit) ---------
    bat_samples = []
    for _ in range(reps):
        t0 = time.time()
        batch_bm25_topk(spark, idx, qdf, k=k).count()
        bat_samples.append(round(time.time() - t0, 3))
    bat_sec = sorted(bat_samples)[len(bat_samples) // 2]

    print(json.dumps({
        "sf": sf_dir.rstrip("/").rsplit("/", 1)[-1],
        "n_queries": n_queries,
        "k": k,
        "sequential_sec": seq_sec,
        "sequential_qps": round(n_queries / seq_sec, 1),
        "sequential_samples": seq_samples,
        "batch_sec": bat_sec,
        "batch_qps": round(n_queries / bat_sec, 1),
        "batch_samples": bat_samples,
        "batch_speedup": round(seq_sec / bat_sec, 2),
        "parity_checked": checked,
        "host_canary": canary,
    }))


if __name__ == "__main__":
    main()
