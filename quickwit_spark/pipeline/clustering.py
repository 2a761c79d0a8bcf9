"""Embedding clustering for corpus curation: quantized k-means (Lloyd
iterations over int8-quantized vectors with INTEGER centroids) and
cluster-balanced sampling on top of it.

Why quantized: every Lloyd step must be bit-reproducible across
engines (Spark / DuckDB / numpy) for the oracle gate, and float means
are not — summation order changes the last ulp and a near-tie argmin
flips. Over int8 vectors the whole loop is exact integer arithmetic:

* distances are BIGINT sums of squared integer differences — exact,
  association-order-independent;
* centroid updates are ``floor(int_sum / count + 0.5)`` — one IEEE
  division of exact integers, correctly rounded, then floor: every
  engine computes the identical integer.

So two engines running the same iterations land on the SAME centroids
and the SAME assignment, bit for bit — no tolerance windows. The int8
rounding costs a sliver of cluster quality (centroids live on the
integer lattice), which is irrelevant for curation-grade clustering
(DataComp/SemDeDup-style balance / prune decisions).

Scale (the 100 TB story): assignment is a narrow map over a broadcast
centroid literal (k·dim numbers — metadata-sized) — the corpus is
never shuffled. The update is ``posexplode → groupBy(cluster, pos)``
whose partial aggregation combines map-side, so the shuffle carries
only k·dim partial-sum rows PER PARTITION, not the exploded data.
Centroids are collected to the driver each round (k·dim values — the
same driver-side center state MLlib's KMeans keeps); the data path
stays distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from quickwit_spark.pipeline.similarity import quantize_embeddings
from quickwit_spark.pipeline.textstats import ensure_parallelism

_MAXLONG = 9223372036854775807


def _init_centroids(
    q: DataFrame, k: int, seed: str, id_col: str
) -> list[tuple[int, list[int]]]:
    """Deterministic init: the quantized vectors of the k md5-ranked
    corpus rows (same sampling shape as similarity._centroid_array —
    reproducible across engines, no RNG state). Labels are the sample
    rank 0..k-1, NOT the source ids, so they stay stable while the
    centroids drift away from the seeds."""
    h = (
        f"cast(conv(substring(md5(concat('{seed}:', cast({id_col} as"
        f" string))), 1, 15), 16, 10) as bigint)"
    )
    rows = (
        q.orderBy(F.expr(h), F.col(id_col))
        .limit(k)
        .select("qv")
        .collect()
    )
    return [(cid, list(r.qv)) for cid, r in enumerate(rows)]


def _cents_literal(cents: list[tuple[int, list[int]]]) -> str:
    items = ", ".join(
        f"named_struct('cid', cast({cid} as bigint), 'cv',"
        f" array({', '.join(f'cast({v} as bigint)' for v in cv)}))"
        for cid, cv in cents
    )
    return f"array({items})"


def _assign_expr(cents: list[tuple[int, list[int]]]) -> str:
    """argmin over the centroid literal: exact BIGINT squared-distance
    fold; strict ``<`` keeps the first (lowest-cid) minimum — the tie
    rule the oracle's ``ORDER BY dist, cid`` mirrors."""
    dist = "aggregate(zip_with(qv, c.cv, (x, y) -> (x-y)*(x-y)), 0L, (s, v) -> s + v)"
    return (
        f"aggregate({_cents_literal(cents)},"
        f" named_struct('cid', cast(-1 as bigint), 'best',"
        f" cast({_MAXLONG} as bigint)),"
        f" (acc, c) -> if({dist} < acc.best,"
        f" named_struct('cid', c.cid, 'best', {dist}), acc))"
    )


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "km1",
    persist_intermediates: bool = True,
) -> DataFrame:
    """Quantized k-means: ``n_iter`` Lloyd rounds over int8-quantized
    vectors with integer-lattice centroids (module docstring has the
    exactness argument). Returns one row per input row: (id_col,
    cluster_id, sq_dist) where sq_dist is the exact BIGINT squared
    distance to the final centroid.

    Empty clusters keep their previous centroid (no respawn — k is a
    curation knob, not a quality target). ``persist_intermediates``
    caches the quantized corpus across the n_iter+1 assignment scans;
    release with :func:`quickwit_spark.pipeline.dedup.unpersist_intermediates`.
    """
    q = quantize_embeddings(ensure_parallelism(df), id_col, vec_col).select(
        F.col(id_col),
        F.expr("transform(qvec, x -> cast(x as bigint))").alias("qv"),
    )
    if persist_intermediates:
        from pyspark import StorageLevel

        q = q.persist(StorageLevel.MEMORY_AND_DISK)

    cents = _init_centroids(q, k, seed, id_col)
    dim = len(cents[0][1]) if cents else 0
    for _ in range(n_iter):
        assigned = q.select(
            F.expr(_assign_expr(cents))["cid"].alias("cluster_id"), "qv"
        )
        sums = (
            assigned.select("cluster_id", F.posexplode("qv").alias("pos", "val"))
            .groupBy("cluster_id", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("cnt"))
            .withColumn(
                "m",
                F.expr("cast(floor(cast(s as double) / cnt + 0.5D) as bigint)"),
            )
            .collect()
        )
        upd: dict[int, list[int]] = {}
        for r in sums:
            upd.setdefault(r.cluster_id, [0] * dim)[r.pos] = r.m
        cents = [(cid, upd.get(cid, cv)) for cid, cv in cents]

    out = q.select(
        F.col(id_col),
        F.expr(_assign_expr(cents)).alias("_a"),
    ).select(
        id_col,
        F.col("_a")["cid"].alias("cluster_id"),
        F.col("_a")["best"].alias("sq_dist"),
    )
    if persist_intermediates:
        out._qs_cached = (q,)  # type: ignore[attr-defined]
    return out


def cluster_balanced_sample(
    df: DataFrame,
    quota: int,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "km1",
    sample_seed: str = "bal1",
) -> DataFrame:
    """Cluster-balanced subsample (DataComp-style curation): k-means
    the corpus, then keep at most ``quota`` rows per cluster, ranked
    by the cross-engine md5 hash (ties by id) — a deterministic
    uniform draw within each cluster, so over-represented regions of
    embedding space are capped instead of dominating the mix.

    One window shuffle on cluster_id on top of the k-means passes.
    Returns (id_col, cluster_id, sq_dist) for the kept rows.
    """
    a = kmeans_assign(df, k, n_iter, id_col, vec_col, seed,
                      persist_intermediates=False)
    h = (
        f"cast(conv(substring(md5(concat('{sample_seed}:',"
        f" cast({id_col} as string))), 1, 15), 16, 10) as bigint)"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(
        F.expr(h), F.col(id_col)
    )
    return (
        a.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= quota)
        .drop("rn")
    )
