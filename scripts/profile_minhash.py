"""Microbench for dedup_minhash_lsh (VERDICT r3 next-round #6).

The declarative plan recomputes the shingle expression up to 4x
(signature explode; band reuse via the max_bucket count; both sides of
_verify_jaccard). Variants measured here:

  A  current  minhash_lsh_pairs as shipped (pure declarative)
  B  persist-sets  shingle-set DF persisted once and shared by the
     signature explode and both verify join sides
  C  persist-sets+sig  B plus the signature DF persisted so the band
     explode + bucket-count reuse don't recompute the groupBy agg

Run:  python scripts/profile_minhash.py [sf_dir] [reps]
Prints one JSON line with per-variant medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _pairs_persisted(df, persist_sig: bool, id_col="doc_id", text_col="text",
                     num_perm=12, band_size=3, k=3, threshold=0.4,
                     max_bucket=1000):
    from quickwit_spark.pipeline.dedup import (
        H15, MINHASH_MOD, _shingles, _ensure_parallelism,
    )

    M = MINHASH_MOD
    n_bands = num_perm // band_size
    sets_ = _ensure_parallelism(df).select(
        F.col(id_col), F.expr(_shingles(text_col, k)).alias("sh")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sh = sets_.select(id_col, F.explode("sh").alias("s")).select(
        id_col,
        F.expr(H15.format(x="s") + f" % {M}").alias("h1"),
        F.expr(H15.format(x="concat('~', s)") + f" % {M}").alias("h2"),
    )
    mins = [
        F.min((F.col("h1") + p * F.col("h2")) % M).alias(f"mh{p}")
        for p in range(num_perm)
    ]
    sig = sh.groupBy(id_col).agg(*mins).select(
        F.col(id_col),
        F.array(*[F.col(f"mh{p}") for p in range(num_perm)]).alias("signature"),
    )
    if persist_sig:
        sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    bands = sig.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}), b -> named_struct("
                f" 'band', b,"
                f" 'bucket', md5(concat_ws(',',"
                f"   transform(slice(signature, b * {band_size} + 1, {band_size}),"
                f"     v -> cast(v as string))))))"
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    keep = (
        bands.groupBy("band", "bucket").count()
        .where(F.col("count") <= max_bucket)
        .select("band", "bucket")
    )
    bands = bands.join(keep, ["band", "bucket"])
    a = bands.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cand = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    out = (
        cand.join(sets_.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sets_.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.size("sh_a") + F.size("sh_b") - F.col("inter")), 6),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out, ([sets_, sig] if persist_sig else [sets_])


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from quickwit_spark.pipeline.dedup import minhash_lsh_pairs
    from quickwit_spark.session import get_spark

    spark = get_spark("profile_minhash", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = docs.select("doc_id", "text")

    def run_current():
        minhash_lsh_pairs(docs, threshold=0.4).write.format("noop").mode("overwrite").save()

    def run_variant(persist_sig):
        out, cached = _pairs_persisted(docs, persist_sig)
        try:
            out.write.format("noop").mode("overwrite").save()
        finally:
            for c in cached:
                c.unpersist()

    results = {}
    variants = [
        ("A_current", run_current),
        ("B_persist_sets", lambda: run_variant(False)),
        ("C_persist_sets_sig", lambda: run_variant(True)),
    ]
    for name, fn in variants:
        fn()  # warmup
        samples = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            samples.append(round(time.time() - t0, 3))
        results[name] = {"median": statistics.median(samples), "samples": samples}

    # sanity: identical pair counts across variants
    n_cur = minhash_lsh_pairs(docs, threshold=0.4).count()
    out_b, cached = _pairs_persisted(docs, False)
    n_b = out_b.count()
    for c in cached:
        c.unpersist()
    results["pair_counts"] = {"current": n_cur, "persisted": n_b, "match": n_cur == n_b}
    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
