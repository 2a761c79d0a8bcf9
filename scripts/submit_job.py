"""spark-submit entry point: build the index and/or run searches.

Cluster launch (the north-star invocation):

    zip -r quickwit_spark.zip quickwit_spark
    spark-submit --master <cluster> --py-files quickwit_spark.zip \\
        scripts/submit_job.py build --src iceberg:prod.transcripts \\
        --index s3://bucket/index --n-splits 100000
    spark-submit --py-files quickwit_spark.zip scripts/submit_job.py \\
        search --index s3://bucket/index --query '"hello world"~1' -k 10

Local smoke (tests/test_submit.py runs exactly this):

    spark-submit --master 'local[4]' --py-files /tmp/qs.zip \\
        scripts/submit_job.py build --src /tmp/t.parquet --index /tmp/idx

Prints one JSON line per command.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--src", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--n-splits", type=int, default=8)

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)

    m = sub.add_parser("merge")
    m.add_argument("--index", required=True)

    # scaling-probe payload: warmup build, then one timed build over
    # the in-job-replicated corpus; prints turns_per_sec (the unit the
    # N-vs-4N-executor efficiency ratio is computed from)
    pr = sub.add_parser("probe")
    pr.add_argument("--src", required=True)
    pr.add_argument("--n-turns", type=int, required=True)
    pr.add_argument("--replicate", type=int, default=3)
    pr.add_argument("--n-splits", type=int, default=512)

    args = p.parse_args(argv)

    # under spark-submit an active session already exists
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if args.cmd == "build":
        from quickwit_spark.operators.build import build_index
        from quickwit_spark.sources.tables import load_table

        t0 = time.time()
        catalog = build_index(
            spark, load_table(spark, args.src), args.index,
            n_splits=args.n_splits,
        )
        print(json.dumps({
            "cmd": "build", "num_docs": catalog.total_docs(),
            "num_splits": len(catalog.published_splits()),
            "sec": round(time.time() - t0, 2),
        }))
    elif args.cmd == "search":
        from quickwit_spark.operators.search import Searcher

        r = Searcher(spark, args.index).search(args.query, k=args.k)
        print(json.dumps({
            "cmd": "search", "num_hits": r.num_hits,
            "hits": [
                {"split_id": h.split_id, "docid": h.docid,
                 "score": round(h.score, 4), "doc": h.doc}
                for h in r.hits
            ],
            "elapsed_sec": round(r.elapsed_sec, 4),
        }, default=str))
    elif args.cmd == "merge":
        from quickwit_spark.operators.merge import run_merge_pipeline

        n = run_merge_pipeline(spark, args.index)
        print(json.dumps({"cmd": "merge", "merges": n}))
    elif args.cmd == "probe":
        import tempfile

        from pyspark.sql import functions as F

        from quickwit_spark.operators.build import build_index

        base = spark.read.parquet(args.src)
        df = base
        for i in range(1, args.replicate):
            df = df.unionAll(
                base.withColumn(
                    "conv_id", F.concat(F.lit(f"r{i}-"), F.col("conv_id"))
                )
            )
        with tempfile.TemporaryDirectory() as td:
            # warm-up build (JVM codegen + python worker pools on every
            # executor), then the timed run — same discipline as
            # bench.scale_probe
            build_index(
                spark, base.limit(20_000), td + "/warm_idx",
                n_splits=args.n_splits, resume=False,
            )
            t0 = time.time()
            build_index(
                spark, df, td + "/idx",
                n_splits=args.n_splits, resume=False,
            )
            dt = time.time() - t0
        total = args.n_turns * args.replicate
        print(json.dumps({
            "cmd": "probe", "sec": round(dt, 2),
            "turns": total,
            "turns_per_sec": round(total / dt, 1),
            "executors": spark.sparkContext.getConf().get(
                "spark.master", "?"
            ),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
