"""Similarity search over embedding columns: brute-force cosine top-k
(the exact baseline) and LSH / IVF-style bucketed ANN (the scale path).

Plans are pure built-in functions: the dot product is
``aggregate(zip_with(...))`` (JVM, codegen); the only Python is plan
construction. At 100 TB the bucketed variant turns the O(n·q) scan
into a bucket-pruned scan — the probe side is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (s, v) -> s + v)"
)


def _with_norm(df, id_col, vec_col, prefix):
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.col(vec_col).alias(f"{prefix}_v"),
        F.expr(f"sqrt({DOT.format(a=vec_col, b=vec_col)})").alias(f"{prefix}_n"),
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (excluding
    itself). The small query side is broadcast; ranking is a window
    top-k that AQE executes as a partial sort — no global shuffle of
    the corpus. Returns (query_id, neighbor_id, rank, cosine)."""
    c = _with_norm(corpus, id_col, vec_col, "c")
    q = _with_norm(queries, id_col, vec_col, "q")
    scored = (
        c.join(F.broadcast(q), F.col("c_id") != F.col("q_id"))
        .withColumn(
            "cosine",
            F.round(
                F.expr(DOT.format(a="c_v", b="q_v")) / (F.col("c_n") * F.col("q_n")),
                6,
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("c_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "rank",
            "cosine",
        )
    )


def random_hyperplane_buckets(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Sign-of-projection LSH bucket per vector: plane p's normal is a
    deterministic pseudo-random ±1 vector derived from md5(seed,p,dim)
    — reproducible across engines and runs with no RNG state. Bucket =
    the n-plane sign bit string."""
    dim_expr = f"size({vec_col})"
    # component d of plane p: +1 if md5-hash of (seed:p:d) is even else -1
    proj = (
        f"aggregate(zip_with({vec_col}, sequence(0, {dim_expr} - 1),"
        f" (x, d) -> cast(x as double) * (conv(substring(md5(concat('{seed}:', '{{p}}', ':', cast(d as string))), 1, 15), 16, 10) % 2 * 2 - 1)),"
        f" 0D, (s, v) -> s + v)"
    )
    bits = ", ".join(
        f"if({proj.format(p=p)} > 0, '1', '0')" for p in range(n_planes)
    )
    return df.select(
        F.col(id_col), F.expr(f"concat({bits})").alias("bucket")
    )


def write_ann_index(
    df: DataFrame,
    path: str,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> None:
    """Persist the corpus as an IVF-style index: parquet partitioned by
    the hyperplane bucket, norms precomputed. A probe then reads ONLY
    its bucket's partition directory — Catalyst partition pruning, no
    scan of the other buckets (the 100 TB ANN path; multi-probe = read
    several partitions)."""
    b = random_hyperplane_buckets(df, n_planes, id_col, vec_col, seed)
    from pyspark.sql import functions as F

    (
        df.join(b, id_col)
        .withColumn("nrm", F.expr(f"sqrt({DOT.format(a=vec_col, b=vec_col)})"))
        .write.partitionBy("bucket")
        .mode("overwrite")
        .parquet(path)
    )


def ann_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Probe a persisted ANN index: bucket each query with the same
    deterministic hyperplanes, then join against the bucket-partitioned
    corpus — the bucket equijoin lets Catalyst prune every other
    partition from the scan."""
    from pyspark.sql import functions as F

    corpus = spark.read.parquet(path)
    qb = random_hyperplane_buckets(queries, n_planes, id_col, vec_col, seed)
    q = (
        _with_norm(queries, id_col, vec_col, "q")
        .join(qb.withColumnRenamed(id_col, "q_id"), "q_id")
    )
    scored = (
        corpus.join(F.broadcast(q), "bucket")
        .where(F.col(id_col) != F.col("q_id"))
        .withColumn(
            "cosine",
            F.round(
                F.expr(DOT.format(a=vec_col, b="q_v")) / (F.col("nrm") * F.col("q_n")),
                6,
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            "rank",
            "cosine",
        )
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's hyperplane
    bucket, then exact cosine rank within it. Recall < 1 by design;
    multi-probe = union over several seeds. At scale the corpus is
    written bucketed (partitionBy(bucket)) so a probe touches one
    partition — the IVF pattern."""
    cb = random_hyperplane_buckets(corpus, n_planes, id_col, vec_col, seed)
    qb = random_hyperplane_buckets(queries, n_planes, id_col, vec_col, seed)
    c = _with_norm(corpus, id_col, vec_col, "c").join(
        cb.withColumnRenamed(id_col, "c_id"), "c_id"
    )
    q = _with_norm(queries, id_col, vec_col, "q").join(
        qb.withColumnRenamed(id_col, "q_id"), "q_id"
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("c_id") != F.col("q_id"))
        .withColumn(
            "cosine",
            F.round(
                F.expr(DOT.format(a="c_v", b="q_v")) / (F.col("c_n") * F.col("q_n")),
                6,
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("c_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            "rank",
            "cosine",
        )
    )
