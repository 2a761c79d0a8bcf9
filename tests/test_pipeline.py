"""Pipeline operator tests beyond the DuckDB oracle parity in
test_entry.py: structural invariants and the multimodal stub gate."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_minhash_candidates_subset_of_exact(spark, docs):
    """LSH candidates that verify ≥ τ must be a subset of the exact
    all-pairs result at the same τ (LSH can miss, never invent)."""
    from quickwit_spark.pipeline.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert lsh <= exact


def test_minhash_persist_parity_and_release(spark, docs):
    """persist_intermediates must not change the pair set, and
    unpersist_intermediates must release exactly what was cached."""
    from quickwit_spark.pipeline.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        unpersist_intermediates,
    )

    out = minhash_lsh_pairs(docs, threshold=0.4)
    cached_pairs = {(r.id_a, r.id_b, r.jaccard) for r in out.collect()}
    assert len(out._qs_cached) == 2  # shingle sets + signatures
    assert all(c.is_cached for c in out._qs_cached)
    unpersist_intermediates(out)
    assert not any(c.is_cached for c in out._qs_cached)

    plain = minhash_lsh_pairs(docs, threshold=0.4, persist_intermediates=False)
    assert plain._qs_cached == []
    assert {(r.id_a, r.id_b, r.jaccard) for r in plain.collect()} == cached_pairs

    ng = ngram_jaccard_pairs(docs, threshold=0.4)
    ng_pairs = {(r.id_a, r.id_b, r.jaccard) for r in ng.collect()}
    unpersist_intermediates(ng)
    ng_plain = ngram_jaccard_pairs(docs, threshold=0.4, persist_intermediates=False)
    assert {(r.id_a, r.id_b, r.jaccard) for r in ng_plain.collect()} == ng_pairs
    unpersist_intermediates(ng_plain)  # no-op path

    from quickwit_spark.pipeline.dedup import embedding_lsh_pairs

    embs = docs.sparkSession.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    )
    el = embedding_lsh_pairs(embs, threshold=0.2, n_planes=4)
    el_pairs = {(r.id_a, r.id_b, r.cosine) for r in el.collect()}
    assert len(el._qs_cached) == 2  # vec+norm table + bucket table
    assert all(c.is_cached for c in el._qs_cached)
    unpersist_intermediates(el)
    assert not any(c.is_cached for c in el._qs_cached)
    el_plain = embedding_lsh_pairs(
        embs, threshold=0.2, n_planes=4, persist_intermediates=False
    )
    assert el_plain._qs_cached == []
    assert {(r.id_a, r.id_b, r.cosine) for r in el_plain.collect()} == el_pairs


def test_simhash_close_on_near_identical_text(spark):
    from pyspark.sql import functions as F

    from quickwit_spark.pipeline.dedup import simhash_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (0, base),
        (1, base + " extra"),          # near-dup
        (2, "completely different words about database query planning"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_pairs(df, max_hamming=60, prefix_bits=0).collect()}
    assert pairs[(0, 1)] < pairs.get((0, 2), 61)
    near = simhash_pairs(df, max_hamming=10, prefix_bits=4).collect()
    assert {(r.id_a, r.id_b) for r in near} == {(0, 1)}


def test_persisted_ann_index_matches_inline_lsh(spark, tmp_path):
    """The bucket-partitioned on-disk ANN index returns exactly what the
    inline LSH path returns, and the probe's scan is partition-pruned
    to the queries' buckets."""
    from pyspark.sql import functions as F

    from quickwit_spark.pipeline.similarity import (
        ann_index_topk,
        lsh_ann_topk,
        write_ann_index,
    )

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = embs.where(F.col("vec_id") < 3)
    path = str(tmp_path / "ann_idx")
    write_ann_index(embs, path, n_planes=4)

    got = ann_index_topk(spark, path, q, k=10, n_planes=4).toPandas()
    want = lsh_ann_topk(embs, q, k=10, n_planes=4).toPandas()
    key = ["query_id", "rank"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got["neighbor_id"].tolist() == want["neighbor_id"].tolist()
    assert (got["cosine"] == want["cosine"]).all()

    # partition pruning: the corpus scan carries a PartitionFilters
    # entry on bucket (dynamic via the bucket join)
    plan = ann_index_topk(spark, path, q, k=10, n_planes=4)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:200]


def test_quantize_embeddings_roundtrip_and_topk_recall(spark):
    """Quantized values stay in [-127, 127] with max|q| = 127 for
    nonzero vectors; dequantization error is bounded by scale/254 per
    component; zero vectors quantize to zeros with scale 0; and the
    quantized brute-force top-k agrees with the exact float top-k on
    nearly every neighbor (int8 rounding only reorders near-ties)."""
    import numpy as np
    from pyspark.sql import functions as F

    from quickwit_spark.pipeline.similarity import (
        cosine_topk,
        quantize_embeddings,
        quantized_cosine_topk,
    )

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    zero = spark.createDataFrame(
        [(999999, [0.0] * len(embs.first().embedding))],
        "vec_id long, embedding array<float>",
    )
    q = quantize_embeddings(embs.unionByName(zero)).toPandas().set_index("vec_id")
    raw = embs.toPandas().set_index("vec_id")
    zrow = q.loc[999999]
    assert zrow.scale == 0.0 and all(v == 0 for v in zrow.qvec)
    for vid in list(raw.index[:20]):
        qv = np.array(q.loc[vid].qvec, dtype=np.int64)
        x = np.array(raw.loc[vid].embedding, dtype=np.float64)
        s = q.loc[vid].scale
        assert s == np.abs(x).max()
        assert np.abs(qv).max() == 127 and np.abs(qv).max() <= 127
        deq = qv * s / 127.0
        assert np.abs(deq - x).max() <= s / 254.0 + 1e-9

    qs = embs.where(F.col("vec_id") < 5)
    exact = cosine_topk(embs, qs, k=10).toPandas()
    quant = quantized_cosine_topk(embs, qs, k=10).toPandas()
    key = lambda df: {
        (r.query_id, r.neighbor_id) for r in df.itertuples()
    }
    overlap = len(key(exact) & key(quant)) / len(key(exact))
    assert overlap >= 0.9


def test_kmeans_assign_invariants(spark):
    """One row out per row in; cluster ids in [0, k); sq_dist equals
    the brute-force numpy min distance to the SAME final centroids
    (recomputed independently with exact integer arithmetic); the
    assignment is invariant to input partitioning; the balanced sample
    caps every cluster at the quota and is a subset of the assignment."""
    import numpy as np
    from pyspark.sql import functions as F

    from quickwit_spark.pipeline.clustering import (
        cluster_balanced_sample,
        kmeans_assign,
    )
    from quickwit_spark.pipeline.similarity import quantize_embeddings

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    k, n_iter = 6, 2
    a = kmeans_assign(embs, k=k, n_iter=n_iter,
                      persist_intermediates=False).toPandas()
    assert len(a) == embs.count()
    assert a.cluster_id.between(0, k - 1).all()

    # independent replay: same init, same Lloyd rounds, numpy integers
    q = (
        quantize_embeddings(embs)
        .select("vec_id", F.expr("transform(qvec, x -> cast(x as bigint))").alias("qv"))
        .toPandas()
        .sort_values("vec_id")
    )
    ids = q.vec_id.to_numpy()
    X = np.array([list(v) for v in q.qv], dtype=np.int64)
    h = lambda s: [
        int(__import__("hashlib").md5(f"{s}:{i}".encode()).hexdigest()[:15], 16)
        for i in ids
    ]
    order = np.lexsort((ids, np.array(h("km1"))))
    C = X[order[:k]].copy()
    for _ in range(n_iter):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin keeps lowest index on ties
        for c in range(k):
            m = assign == c
            if m.any():
                s = X[m].sum(axis=0)
                C[c] = np.floor(s.astype(np.float64) / m.sum() + 0.5).astype(np.int64)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    exp = dict(zip(ids, d.argmin(axis=1)))
    exp_d = dict(zip(ids, d.min(axis=1)))
    got = a.set_index("vec_id")
    for i in ids:
        assert got.loc[i].cluster_id == exp[i]
        assert got.loc[i].sq_dist == exp_d[i]

    b = kmeans_assign(embs.repartition(7), k=k, n_iter=n_iter,
                      persist_intermediates=False).toPandas()
    assert a.sort_values("vec_id").reset_index(drop=True).equals(
        b.sort_values("vec_id").reset_index(drop=True)
    )

    bal = cluster_balanced_sample(embs, quota=10, k=k, n_iter=n_iter).toPandas()
    assert bal.groupby("cluster_id").size().max() <= 10
    merged = bal.merge(a, on="vec_id", suffixes=("", "_a"))
    assert (merged.cluster_id == merged.cluster_id_a).all()


def test_semantic_dedup_invariants_and_exact_copies(spark):
    """One row out per row in; is_dup ⇔ canonical_id is a lower id in
    the same cell; exact vector copies (cosine 1.0) always collapse to
    the lowest-id copy in their cell group."""
    from pyspark.sql import functions as F

    from quickwit_spark.pipeline.dedup import semantic_dedup

    base = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).limit(40)
    # clone three rows under new ids: identical vectors share the
    # argmax cell, and cosine(v, v) = 1 >= any threshold
    clones = base.where(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    df = base.select("vec_id", "embedding").unionByName(clones)
    out = semantic_dedup(df, threshold=0.95, n_centroids=4, seed="t1").toPandas()

    assert len(out) == df.count()
    assert sorted(out["vec_id"]) == sorted(
        r.vec_id for r in df.select("vec_id").collect()
    )
    cell_of = dict(zip(out["vec_id"], out["cell"]))
    for r in out.itertuples():
        if r.is_dup:
            assert r.canonical_id < r.vec_id
            assert cell_of[r.canonical_id] == r.cell
        else:
            assert r.canonical_id == r.vec_id
    by_id = out.set_index("vec_id")
    for orig in range(3):
        clone = by_id.loc[orig + 100000]
        assert clone.is_dup  # its exact copy has a lower id in-cell
        assert clone.canonical_id <= orig


def test_embedding_lsh_pairs_subset_exact_and_recall_monotone(spark):
    """Bucketed pairs must be a subset of the exact O(n²) result with
    identical cosines (LSH can miss, never invent), restrict the
    candidate set, and adding tables must only ADD pairs."""
    from quickwit_spark.pipeline.dedup import (
        embedding_cosine_pairs,
        embedding_lsh_pairs,
    )

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_cosine_pairs(embs, threshold=0.2).collect()
    }
    t1 = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_lsh_pairs(
            embs, threshold=0.2, n_planes=4, n_tables=1
        ).collect()
    }
    t2 = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_lsh_pairs(
            embs, threshold=0.2, n_planes=4, n_tables=2
        ).collect()
    }
    assert t1 and set(t1) <= set(exact) and set(t1) <= set(t2) <= set(exact)
    assert all(exact[k] == v for k, v in t2.items())
    assert len(t1) < len(exact)  # bucketing actually restricts


def test_ann_lsh_is_subset_of_bruteforce_candidates(spark):
    from pyspark.sql import functions as F

    from quickwit_spark.pipeline.similarity import cosine_topk, lsh_ann_topk

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = embs.where(F.col("vec_id") < 3)
    brute = cosine_topk(embs, q, k=1000).toPandas()
    lsh = lsh_ann_topk(embs, q, k=1000, n_planes=4).toPandas()
    # every LSH result's cosine agrees with brute force for that pair
    merged = lsh.merge(
        brute, on=["query_id", "neighbor_id"], suffixes=("_l", "_b")
    )
    assert len(merged) == len(lsh)
    assert (merged["cosine_l"] == merged["cosine_b"]).all()
    # bucketing actually restricts the candidate set
    assert len(lsh) < len(brute)


def test_near_dup_clusters_multi_hop(spark):
    """CC label propagation must traverse chains (a-b, b-c ⇒ one
    cluster) and leave singletons alone."""
    from quickwit_spark.pipeline.dedup import near_dup_clusters

    ids = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    got = {
        r.doc_id: r.cluster_id for r in near_dup_clusters(ids, pairs).collect()
    }
    assert got == {0: 0, 3: 0, 5: 0, 6: 0, 1: 1, 2: 1, 4: 4}


def test_multimodal_stub_raises_without_fake():
    from quickwit_spark.pipeline.multimodal import decode_image_batch

    with pytest.raises(NotImplementedError):
        decode_image_batch(pd.Series([b"abc"]), fake=False)


def test_media_metadata_schema_and_partitions(spark, docs):
    from quickwit_spark.pipeline.multimodal import (
        attach_fake_payload,
        extract_media_metadata,
    )

    media = attach_fake_payload(docs.repartition(4))
    meta = extract_media_metadata(media, fake=True)
    assert meta.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,byte_len:bigint,header:string,"
        "width:int,height:int,n_frames:int>"
    )
    # narrow op: partitioning preserved
    assert meta.rdd.getNumPartitions() == 4
    pdf = meta.toPandas()
    assert (pdf[pdf["kind"] == "image"]["width"] > 0).all()
    assert (pdf[pdf["kind"] != "image"]["width"] == 0).all()


def test_minhash_lsh_degenerate_bucket_capped(spark):
    """A degenerate corpus (1200 identical docs) must complete with
    bounded candidate counts: the default max_bucket guard drops the
    single huge band bucket (identical content is exact_dedup's job),
    while small dup groups under the cap are still found."""
    from quickwit_spark.pipeline.dedup import exact_dedup, minhash_lsh_pairs

    n = 1200
    rows = [(i, "the exact same boilerplate text repeated verbatim here")
            for i in range(n)]
    rows += [(n + i, f"a genuinely unique document number {i} talking about "
                     f"different things entirely {i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_lsh_pairs(df, threshold=0.4).count()
    # without the cap this would be ~719k pairs; the degenerate bucket
    # is suppressed wholesale
    assert pairs == 0
    # the identical docs are exactly what exact_dedup reports
    ex = exact_dedup(df).where("is_dup").count()
    assert ex == n - 1

    # dup groups UNDER the cap are unaffected
    small = spark.createDataFrame(
        [(i, "shared content words alpha beta gamma delta") for i in range(6)]
        + [(100 + i, f"unrelated text {i} zeta eta theta iota {i}") for i in range(4)],
        "doc_id long, text string",
    )
    assert minhash_lsh_pairs(small, threshold=0.4).count() == 15  # C(6,2)


def test_ngram_jaccard_frequent_shingle_capped(spark):
    """ngram_jaccard_pairs' default max_shingle_df bounds the inverted
    self-join: 1200 identical docs generate no candidates, while pairs
    sharing informative (sub-cap) shingles are exact."""
    from quickwit_spark.pipeline.dedup import ngram_jaccard_pairs

    n = 1200
    rows = [(i, "the exact same boilerplate text repeated verbatim here")
            for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert ngram_jaccard_pairs(df, threshold=0.4).count() == 0

    small = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "alpha beta gamma delta zeta"),
         (3, "completely different words here now")],
        "doc_id long, text string",
    )
    got = {(r.id_a, r.id_b) for r in
           ngram_jaccard_pairs(small, threshold=0.3).collect()}
    assert got == {(1, 2)}


def test_multiprobe_ann_recall_monotone(spark, tmp_path):
    """Multi-probe LSH (lowest-margin bit flips) must reach recall >=
    the single-probe index at the same index layout — no rebuild."""
    from quickwit_spark.pipeline.similarity import (
        ann_index_topk,
        cosine_topk,
        write_ann_index,
    )

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = embs.where("vec_id < 10")
    path = str(tmp_path / "mp_idx")
    write_ann_index(embs, path, n_planes=4)

    def pairs(df):
        return {(r.query_id, r.neighbor_id) for r in df.collect()}

    exact = pairs(cosine_topk(embs, q, k=10))
    r1 = pairs(ann_index_topk(spark, path, q, k=10, n_planes=4, n_probes=1))
    r3 = pairs(ann_index_topk(spark, path, q, k=10, n_planes=4, n_probes=3))
    recall1 = len(r1 & exact) / len(exact)
    recall3 = len(r3 & exact) / len(exact)
    # deterministic (md5-derived planes): measured 0.08 -> 0.30
    assert recall3 > recall1
    assert recall3 >= 0.25
    assert len(r1) <= len(r3)


def test_simhash_rotations_monotone_recall(spark):
    """Rotation tables only ADD candidate pairs: pairs(n_rotations=1)
    is a subset of pairs(n_rotations=3), and everything stays a subset
    of the exhaustive (prefix_bits=0) ground truth with identical
    hamming values."""
    from quickwit_spark.pipeline.dedup import simhash_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for i in range(40):
        rows.append((2 * i, base + f" doc{i}"))
        rows.append((2 * i + 1, base + f" doc{i} extra"))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(n_rot, prefix):
        return {
            (r.id_a, r.id_b): r.hamming
            for r in simhash_pairs(
                df, max_hamming=20, prefix_bits=prefix, n_rotations=n_rot
            ).collect()
        }

    full = pairs(1, 0)           # single all-in bucket = ground truth
    r1 = pairs(1, 30)
    r3 = pairs(3, 30)
    assert set(r1) <= set(r3) <= set(full)
    for k, v in r3.items():
        assert full[k] == v      # hamming values identical


def test_decontaminate_counts_and_plan(spark):
    """Known-overlap corpus: n_overlap counts distinct shared k-grams,
    clean docs survive with 0, and the eval side is broadcast (the
    100 TB shape: no corpus self-join, no corpus-side shuffle for the
    probe)."""
    from quickwit_spark.pipeline.sampling import decontaminate

    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),        # shares 2 3-grams w/ eval
            (1, "one two three four five"),       # clean
            (2, "zz alpha beta gamma yy"),        # shares 1 3-gram
            (3, "alpha beta gamma delta"),        # dup of 0
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    out = decontaminate(corpus, ev, k=3)
    got = {r.doc_id: (r.n_overlap, r.contaminated) for r in out.collect()}
    assert got == {0: (2, True), 1: (0, False), 2: (1, True), 3: (2, True)}
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan


def test_semantic_decontaminate_values_and_plan(spark):
    """Max-cosine flag vs a broadcast eval set: exact values, smallest
    eval id on max ties, NULL (never contaminated) for zero-norm
    vectors and for an empty eval set; the plan is a 1-row broadcast
    nested-loop (constant fan-out) with no corpus-side shuffle — the
    100 TB shape for a second, paraphrase-catching decontamination
    pass."""
    from quickwit_spark.pipeline.sampling import semantic_decontaminate

    corpus = spark.createDataFrame(
        [
            (10, [1.0, 0.0]),    # exact eval hit (ev 0)
            (11, [0.6, 0.8]),    # near ev 1 but under threshold
            (12, [0.0, 0.0]),    # zero vector: NULL cosine
            (13, [0.0, -1.0]),   # anti-aligned: max is 0.0 vs ev 0
        ],
        "vec_id long, embedding array<float>",
    )
    ev = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [2.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = semantic_decontaminate(corpus, ev, threshold=0.9)
    got = {r.vec_id: tuple(r)[1:] for r in out.collect()}
    assert got == {
        # ev 2 ties ev 0 at cosine 1.0 → nearest is the smaller id 0
        10: (1.0, 0, True),
        11: (0.8, 1, False),
        12: (None, None, False),
        13: (0.0, 0, False),
    }
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    got0 = {r.vec_id: tuple(r)[1:] for r in
            semantic_decontaminate(corpus, empty).collect()}
    assert got0 == {i: (None, None, False) for i in (10, 11, 12, 13)}
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastNestedLoopJoin" in plan
    # no hash-partitioned shuffle anywhere: the only exchanges are the
    # eval side's SinglePartition collapse + its broadcast (1 row)
    assert "hashpartitioning" not in plan
    assert "BroadcastExchange" in plan


def test_stratified_sample_deterministic_reproducible(spark):
    """Same seed → identical rows; unlisted strata dropped; per-stratum
    rates track the requested fractions; and the keep decision is
    per-row, so sampling commutes with corpus filtering (resumable
    appends keep prior selections)."""
    from pyspark.sql import functions as F

    from quickwit_spark.pipeline.sampling import stratified_sample

    rows = [(i, f"s{i % 4}") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    fr = {"s0": 0.5, "s1": 0.1, "s2": 1.0}

    a = {r.doc_id for r in stratified_sample(df, fr, seed="x").collect()}
    b = {r.doc_id for r in stratified_sample(df, fr, seed="x").collect()}
    assert a == b
    c = {r.doc_id for r in stratified_sample(df, fr, seed="y").collect()}
    assert a != c

    got = dict(
        stratified_sample(df, fr, seed="x")
        .groupBy("source").count().rdd.map(lambda r: (r.source, r["count"]))
        .collect()
    )
    assert "s3" not in got                      # unlisted stratum dropped
    assert got["s2"] == 1000                    # fraction 1.0 keeps all
    assert abs(got["s0"] - 500) < 80 and abs(got["s1"] - 100) < 50

    # commutes with filtering: sampling a subset = subset of the sample
    sub = df.where(F.col("doc_id") < 1000)
    sub_sample = {r.doc_id for r in stratified_sample(sub, fr, seed="x").collect()}
    assert sub_sample == {i for i in a if i < 1000}


def test_shuffle_rows_permutation_invariants(spark):
    """(shard, pos) is a permutation layout: every row appears exactly
    once, positions are dense 1..count(shard) per shard, the layout is
    reproducible across runs and partitionings, and a new seed yields a
    different order over the same row set."""
    from quickwit_spark.pipeline.sampling import shuffle_rows

    rows = [(i,) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long")
    out = shuffle_rows(df, seed="e1", n_shards=8).collect()
    assert len(out) == 3000
    assert {r.doc_id for r in out} == set(range(3000))
    by_shard: dict[int, list[int]] = {}
    for r in out:
        assert 0 <= r.shuffle_shard < 8
        by_shard.setdefault(r.shuffle_shard, []).append(r.shuffle_pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))

    # reproducible across partitionings; seed changes the order
    key = lambda rs: sorted((r.doc_id, r.shuffle_shard, r.shuffle_pos) for r in rs)
    again = shuffle_rows(df.repartition(13), seed="e1", n_shards=8).collect()
    assert key(again) == key(out)
    other = shuffle_rows(df, seed="e2", n_shards=8).collect()
    assert key(other) != key(out)
    assert {r.doc_id for r in other} == set(range(3000))


def test_pii_scrub_redacts_and_counts(spark):
    from quickwit_spark.pipeline.scrub import pii_scrub

    rows = [
        (0, "mail bob.smith+x@corp.example.org now"),
        (1, "server at 192.168.0.17 and 10.0.0.1 up"),
        (2, "call +4915112345678 or +123456789"),
        (3, "clean text with no pii at all"),
        (4, "a@b.io from 1.2.3.4 dial +987654321"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert got[0].text_scrubbed == "mail <EMAIL> now"
    assert (got[0].n_emails, got[0].n_ipv4, got[0].n_phones) == (1, 0, 0)
    assert got[1].text_scrubbed == "server at <IP> and <IP> up"
    assert got[1].n_ipv4 == 2
    assert got[2].text_scrubbed == "call <PHONE> or <PHONE>"
    assert got[2].n_phones == 2
    assert got[3].text_scrubbed == rows[3][1]
    assert got[4].text_scrubbed == "<EMAIL> from <IP> dial <PHONE>"


def test_url_extract_rows_and_domains(spark):
    from quickwit_spark.pipeline.scrub import url_extract

    rows = [
        (0, "see https://a.example.com/x and http://b.org/y?z=1"),
        (1, "no urls here"),
        (2, "dup https://a.example.com/x https://a.example.com/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.url, r.domain) for r in url_extract(df).collect()
    )
    assert got == [
        (0, "http://b.org/y?z=1", "b.org"),
        (0, "https://a.example.com/x", "a.example.com"),
        (2, "https://a.example.com/x", "a.example.com"),
        (2, "https://a.example.com/x", "a.example.com"),
    ]


def test_normalize_text_strips_and_collapses(spark):
    from quickwit_spark.pipeline.scrub import normalize_text

    rows = [
        (0, "  a\t\tb\n\nc  "),
        (1, "x\x07y\x00z"),   # control chars removed, no space left
        (2, "already clean"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in normalize_text(df).collect()}
    assert got[0].text_norm == "a b c"
    assert got[0].n_chars_raw == len(rows[0][1])
    assert got[0].n_chars_norm == 5
    assert got[1].text_norm == "xyz"
    assert got[2].text_norm == "already clean"


def test_repetition_stats_flags_degenerate_docs(spark):
    from quickwit_spark.pipeline.textstats import repetition_stats

    rows = [
        (0, "a b a b a b"),        # top bigram "a b" x3 of 5
        (1, "solo"),               # degenerate single-token doc
        (2, "w1 w2 w3 w4"),        # all distinct
        (3, "z z z z z"),          # fully repetitive
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert (got[0].n_bigrams, got[0].top_bigram_n) == (5, 3)
    assert got[0].top_bigram_frac == 0.6
    assert got[1].n_bigrams == 1 and got[1].top_bigram_frac == 1.0
    assert got[2].top_bigram_n == 1 and got[2].distinct_token_ratio == 1.0
    assert got[3].top_bigram_frac == 1.0 and got[3].distinct_token_ratio == 0.2


def test_pack_sequences_invariants(spark, docs):
    """Concat-and-chunk packing invariants: token conservation per
    shard, offset arithmetic, boundary-straddle counts, empty docs,
    and seq coverage (a contiguous stream leaves no empty sequence)."""
    from quickwit_spark.pipeline.packing import pack_sequences

    seq_len, n_shards = 64, 4
    out = pack_sequences(docs, seq_len=seq_len, n_shards=n_shards).collect()
    assert len(out) == docs.count()
    by_shard: dict[int, list] = {}
    for r in out:
        assert 0 <= r.shard < n_shards
        assert r.seq_offset == r.token_start % seq_len
        assert r.seq_idx == r.token_start // seq_len
        if r.n_tokens == 0:
            assert r.n_seqs == 0
        else:
            assert r.n_seqs == (r.token_start + r.n_tokens - 1) // seq_len - r.seq_idx + 1
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.token_start)
        # the streams tile: each doc starts where the previous ended
        pos = 0
        for r in rows:
            assert r.token_start == pos
            pos += r.n_tokens
        # every sequence index up to the last is touched by some doc
        touched = set()
        for r in rows:
            if r.n_tokens:
                touched.update(range(r.seq_idx, r.seq_idx + r.n_seqs))
        if pos:
            assert touched == set(range((pos - 1) // seq_len + 1))


def test_pack_sequences_deterministic_and_single_shuffle(spark, docs):
    from quickwit_spark.pipeline.packing import pack_sequences

    a = pack_sequences(docs, seq_len=128, n_shards=3)
    b = pack_sequences(docs, seq_len=128, n_shards=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    plan = a._sc._jvm.PythonSQLUtils.explainString(
        a._jdf.queryExecution(), "formatted"
    )
    # AQE's formatted string repeats the tree (final + initial + node
    # details); count operator headers in the final-plan section only
    final = plan.split("== Initial Plan ==")[0]
    import re as _re

    assert len(_re.findall(r"Exchange \(\d+\)", final)) == 1  # the window's hash partition
    # different seed → different order (shuffle actually shuffles)
    c = pack_sequences(docs, seq_len=128, n_shards=3, seed="other")
    key = {r[0]: (r.shard, r.token_start) for r in a.collect()}
    key_c = {r[0]: (r.shard, r.token_start) for r in c.collect()}
    assert key != key_c


def test_pack_sequences_empty_doc_and_validation(spark):
    from quickwit_spark.pipeline.packing import pack_sequences

    df = spark.createDataFrame(
        [(0, "one two three"), (1, ""), (2, "four")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pack_sequences(df, seq_len=2, n_shards=1).collect()}
    assert got[1].n_tokens == 0 and got[1].n_seqs == 0
    assert sum(r.n_tokens for r in got.values()) == 4
    with pytest.raises(ValueError):
        pack_sequences(df, seq_len=0)
    with pytest.raises(ValueError):
        pack_sequences(df, n_shards=0)


def test_packed_token_sequences_materialization(spark, docs):
    """The materializer tiles each shard's token stream exactly: every
    sequence but the shard's last has exactly seq_len tokens, and
    concatenating sequences in order reproduces concatenating the
    docs' tokens in assignment order."""
    from quickwit_spark.pipeline.packing import (
        pack_sequences,
        packed_token_sequences,
    )
    from quickwit_spark.pipeline.textstats import tokens_col
    from pyspark.sql import functions as F

    seq_len, n_shards = 64, 4
    packed = packed_token_sequences(
        docs, seq_len=seq_len, n_shards=n_shards
    ).collect()
    by_shard: dict[int, list] = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r)
    # reference stream: docs' tokens in (shard, order) sequence
    assign = {
        r[0]: r
        for r in pack_sequences(docs, seq_len=seq_len, n_shards=n_shards).collect()
    }
    doc_toks = {
        r[0]: r.toks
        for r in docs.select("doc_id", tokens_col("text").alias("toks")).collect()
    }
    streams: dict[int, list] = {s: [] for s in range(n_shards)}
    for did, a in sorted(assign.items(), key=lambda kv: (kv[1].shard, kv[1].token_start)):
        streams[a.shard].extend(doc_toks[did])
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.seq_idx)
        assert [r.seq_idx for r in rows] == list(range(len(rows)))
        for r in rows[:-1]:
            assert r.n_tokens == seq_len == len(r.tokens)
        assert 0 < rows[-1].n_tokens <= seq_len
        got = [t for r in rows for t in r.tokens]
        assert got == streams[shard]
    # plan: ONE exchange — the window's shard partitioning satisfies
    # the groupBy (shard, seq_idx) distribution, no second shuffle
    plan = packed_token_sequences(docs, seq_len=seq_len, n_shards=n_shards)
    s = plan._sc._jvm.PythonSQLUtils.explainString(
        plan._jdf.queryExecution(), "formatted"
    ).split("== Initial Plan ==")[0]
    import re as _re

    assert len(_re.findall(r"Exchange \(\d+\)", s)) == 1


def test_chunk_text_coverage_and_overlap(spark, docs):
    """Every token is covered by some chunk, interior chunks carry
    exactly chunk_len tokens with chunk_len-stride overlap, starts
    never reach past the doc, and empty docs emit nothing."""
    from pyspark.sql import functions as F

    from quickwit_spark.pipeline.packing import chunk_text
    from quickwit_spark.pipeline.textstats import tokens_col

    chunk_len, stride = 16, 12
    with_empty = docs.select("doc_id", "text").union(
        spark.createDataFrame([(10_000, ""), (10_001, "one")], ["doc_id", "text"])
    )
    rows = chunk_text(with_empty, chunk_len=chunk_len, stride=stride).collect()
    n_toks = {
        r.doc_id: r.n
        for r in with_empty.select(
            "doc_id", F.size(tokens_col("text")).alias("n")
        ).collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 10_000 not in by_doc  # empty doc: no chunks
    assert [
        (c.start_tok, c.n_tokens) for c in by_doc[10_001]
    ] == [(0, 1)]
    for did, chunks in by_doc.items():
        n = n_toks[did]
        chunks.sort(key=lambda c: c.chunk_idx)
        assert [c.start_tok for c in chunks] == [
            i * stride for i in range(len(chunks))
        ]
        assert all(c.start_tok < n for c in chunks)
        # coverage: last chunk reaches the final token
        last = chunks[-1]
        assert last.start_tok + last.n_tokens == n or last.n_tokens == chunk_len
        assert max(c.start_tok + c.n_tokens for c in chunks) == n
        for c in chunks[:-1]:
            assert c.n_tokens == chunk_len or c.start_tok + c.n_tokens == n
    with pytest.raises(ValueError):
        chunk_text(docs, chunk_len=0)
    with pytest.raises(ValueError):
        chunk_text(docs, stride=-1)


def test_temperature_sample_invariants(spark, docs):
    """Smallest stratum is kept in full, kept sets are deterministic
    and subset-monotone in T, and T<1 raises."""
    from pyspark.sql import functions as F

    from quickwit_spark.pipeline.sampling import temperature_sample

    kept2 = temperature_sample(docs, strata_col="lang", seed="tt").collect()
    again = temperature_sample(docs, strata_col="lang", seed="tt").collect()
    assert {r.doc_id for r in kept2} == {r.doc_id for r in again}

    counts = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    smallest = min(counts, key=lambda k: counts[k])
    kept_by_lang: dict[str, int] = {}
    for r in kept2:
        kept_by_lang[r.lang] = kept_by_lang.get(r.lang, 0) + 1
    assert kept_by_lang[smallest] == counts[smallest]
    # larger strata are downsampled below their input counts
    biggest = max(counts, key=lambda k: counts[k])
    assert kept_by_lang[biggest] < counts[biggest]

    # T=1 keeps everything (rate 1 everywhere)
    kept1 = temperature_sample(docs, strata_col="lang", seed="tt", temperature=1.0)
    assert kept1.count() == docs.count()

    with pytest.raises(ValueError):
        temperature_sample(docs, temperature=0.5)


def test_unigram_logprob_bounds(spark, docs):
    """Scores are <= 0 (token prob <= 1), empty docs score NULL with
    n_tokens 0, and n_tokens agrees with the tokenizer."""
    from pyspark.sql import functions as F

    from quickwit_spark.pipeline.textstats import tokens_col, unigram_logprob

    with_empty = docs.select("doc_id", "text").union(
        spark.createDataFrame([(10_000, "??!")], ["doc_id", "text"])
    )
    out = unigram_logprob(with_empty).collect()
    got = {r.doc_id: r for r in out}
    assert got[10_000].n_tokens == 0 and got[10_000].logprob is None
    assert all(r.logprob <= 0 for r in out if r.logprob is not None)
    n_toks = {
        r.doc_id: r.n
        for r in with_empty.select(
            "doc_id", F.size(tokens_col("text")).alias("n")
        ).collect()
    }
    assert all(n_toks[r.doc_id] == r.n_tokens for r in out)

    # the tf intermediate (3 consumers) is persisted and releasable;
    # the uncached plan scores identically
    from quickwit_spark.pipeline.dedup import unpersist_intermediates

    cached = unigram_logprob(with_empty)
    assert len(cached._qs_cached) == 1 and cached._qs_cached[0].is_cached
    cached_rows = {(r.doc_id, r.n_tokens, r.logprob) for r in cached.collect()}
    unpersist_intermediates(cached)
    assert not cached._qs_cached[0].is_cached
    plain = unigram_logprob(with_empty, persist_intermediates=False)
    assert plain._qs_cached == []
    assert {(r.doc_id, r.n_tokens, r.logprob) for r in plain.collect()} == cached_rows


def test_quality_percentile_filter(spark, docs):
    """Kept set == {scores >= numpy's type-7 p-quantile}; cutoff
    matches that quantile; no-token docs are dropped."""
    import numpy as np

    from quickwit_spark.pipeline.sampling import quality_percentile_filter
    from quickwit_spark.pipeline.textstats import unigram_logprob

    with_empty = docs.select("doc_id", "text").union(
        spark.createDataFrame([(10_000, "??!")], ["doc_id", "text"])
    )
    scored = {
        r.doc_id: r.logprob
        for r in unigram_logprob(with_empty, persist_intermediates=False).collect()
        if r.logprob is not None
    }
    thr = float(np.quantile(np.array(list(scored.values())), 0.2))
    out = quality_percentile_filter(with_empty, p=0.2).collect()
    kept = {r.doc_id for r in out}
    assert 10_000 not in kept
    assert kept == {d for d, s in scored.items() if s >= thr}
    assert all(abs(r.cutoff - round(thr, 6)) <= 1e-6 for r in out)
    assert all(r.logprob >= r.cutoff - 1e-6 for r in out)


def test_bpe_matches_pure_python_reference(spark):
    """bpe_learn/bpe_encode agree with a from-scratch Python BPE
    (word-freq dict, overlap-counted pair stats, greedy left-to-right
    merge, ties to the lexically smallest pair) on merges, subtoken
    counts, and the per-doc subtoken-stream digest; the result is
    invariant to input partitioning."""
    import hashlib
    import re
    from collections import Counter

    from quickwit_spark.pipeline.bpe import SEP, bpe_encode, bpe_learn
    from quickwit_spark.pipeline.dedup import unpersist_intermediates

    texts = [
        "low lower lowest low low",
        "new newer newest new news",
        "wide wider widest low new",
        "lower newer lower wide wide",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    n = 6
    merges, reps = bpe_learn(docs, n_merges=n)

    wf = Counter(
        t for txt in texts for t in re.findall(r"[^\W_]+", txt.lower())
    )
    seqs = {w: list(w) for w in wf}
    ref_merges = []
    for _ in range(n):
        counts = Counter()
        for w, f in wf.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        (l, r), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        ref_merges.append((l, r, freq))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    assert merges == ref_merges

    enc = {r.doc_id: r for r in bpe_encode(docs, reps).collect()}
    for i, txt in enumerate(texts):
        toks = re.findall(r"[^\W_]+", txt.lower())
        stream = SEP.join(SEP.join(seqs[t]) for t in toks)
        assert enc[i].n_tokens == len(toks)
        assert enc[i].n_subtokens == sum(len(seqs[t]) for t in toks)
        assert enc[i].sub_md5 == hashlib.md5(stream.encode()).hexdigest()
    unpersist_intermediates(reps)

    merges2, reps2 = bpe_learn(docs.repartition(5), n_merges=n)
    assert merges2 == merges
    unpersist_intermediates(reps2)


def test_bpe_merge_is_symbol_boundary_exact(spark):
    """Regression: the merge replace must fire only on two COMPLETE
    adjacent symbols. This corpus learns (a,b) then (b,c); the word
    "abc" then holds symbols [ab, c], where an unbracketed
    ``l+SEP+r`` pattern false-matches (suffix "b" of symbol "ab"
    against the following "c") and collapses the word to one symbol
    ["abc"] — true BPE keeps [ab, c] because the adjacent PAIR is
    (ab, c), not (b, c)."""
    from quickwit_spark.pipeline.bpe import SEP, bpe_learn
    from quickwit_spark.pipeline.dedup import unpersist_intermediates

    text = " ".join(["ab"] * 10 + ["xbc"] * 9 + ["abc"])
    docs = spark.createDataFrame([(0, text)], ["doc_id", "text"])
    merges, reps = bpe_learn(docs, n_merges=3)
    assert [(m[0], m[1]) for m in merges] == [("a", "b"), ("b", "c"), ("x", "bc")]
    got = {r.word: r.rep.split(SEP) for r in reps.collect()}
    assert got["abc"] == ["ab", "c"]
    assert got["ab"] == ["ab"]
    assert got["xbc"] == ["xbc"]
    unpersist_intermediates(reps)


def test_tfidf_keywords_crafted(spark):
    """A corpus-wide stopword never outranks a doc-unique term; rank
    order is (tf*idf desc, term asc); at most k rows per doc; and the
    tfidf value matches the hand-computed micro-nat formula."""
    import math

    from quickwit_spark.pipeline.textstats import tfidf_keywords

    docs = spark.createDataFrame(
        [
            (1, "the the the apple apple banana"),
            (2, "the cherry"),
            (3, "the banana banana"),
        ],
        ["doc_id", "text"],
    )
    out = tfidf_keywords(docs, k=2, persist_intermediates=False).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert all(len(v) <= 2 for v in by_doc.values())
    # idf('the') = ln(4/4) = 0 -> never beats a positive-idf term
    d1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert [r.term for r in d1] == ["apple", "banana"]
    idf_apple = round(math.log(4 / 2) * 1_000_000)
    assert d1[0].tf == 2 and d1[0].tfidf == round(2 * idf_apple / 1e6, 6)
    assert {r.term for r in by_doc[2]} == {"cherry", "the"}


def test_canonical_docs_one_keeper_per_cluster(spark, docs):
    """Exactly one canonical per cluster; the keeper has the cluster's
    max token count (ties by lowest id); sizes sum to the corpus."""
    from pyspark.sql import functions as F

    from quickwit_spark.pipeline.dedup import (
        canonical_docs,
        minhash_lsh_pairs,
        near_dup_clusters,
        unpersist_intermediates,
    )
    from quickwit_spark.pipeline.textstats import tokens_col

    pairs = minhash_lsh_pairs(docs, threshold=0.4)
    clusters = near_dup_clusters(docs, pairs)
    unpersist_intermediates(pairs)
    rows = canonical_docs(docs, clusters).collect()
    n_toks = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(tokens_col("text")).alias("n")
        ).collect()
    }
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert sum(len(v) for v in by_cluster.values()) == docs.count()
    for cid, members in by_cluster.items():
        assert all(m.cluster_size == len(members) for m in members)
        keepers = [m for m in members if m.is_canonical]
        assert len(keepers) == 1
        best = min(members, key=lambda m: (-n_toks[m.doc_id], m.doc_id))
        assert keepers[0].doc_id == best.doc_id


def test_ivf_full_probe_equals_exact(spark):
    """IVF with n_probe == n_centroids probes every cell, so the
    result must equal brute-force cosine top-k exactly; with fewer
    probes the result is a subset of each query's candidate space and
    deterministic."""
    from pyspark.sql import functions as F

    from quickwit_spark.pipeline.similarity import cosine_topk, ivf_ann_topk

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = embs.where(F.col("vec_id") < 4)
    full = {
        (r.query_id, r.neighbor_id, r.rank, r.cosine)
        for r in ivf_ann_topk(embs, qs, k=5, n_centroids=4, n_probe=4).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id, r.rank, r.cosine)
        for r in cosine_topk(embs, qs, k=5).collect()
    }
    assert full == exact
    part = ivf_ann_topk(embs, qs, k=5, n_centroids=4, n_probe=1).collect()
    assert {r.query_id for r in part} <= {t[0] for t in exact}
    again = ivf_ann_topk(embs, qs, k=5, n_centroids=4, n_probe=1).collect()
    assert {(r.query_id, r.neighbor_id, r.rank) for r in part} == {
        (r.query_id, r.neighbor_id, r.rank) for r in again
    }


def test_duplicate_spans_semantics(spark):
    """Maximal-span merge, cross-doc vs any-occurrence modes, short-doc
    guard, and the scrub companion's token accounting."""
    from quickwit_spark.pipeline.dedup import duplicate_spans, remove_duplicate_spans

    df = spark.createDataFrame(
        [
            ("a", "x1 x2 x3 x4 x5 q1 q2 q3 q4 q5 q6 y1"),
            ("b", "z1 q1 q2 q3 q4 q5 q6 z2 z3"),
            ("c", "u1 u2 u3 u4 u5 u6 u7"),
            ("d", "r1 r2 r1 r2 r1 r2 r1 r2"),  # within-doc repeats only
            ("e", "s1"),  # shorter than min_len
        ],
        ["doc_id", "text"],
    )
    cross = {
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in duplicate_spans(df, min_len=3).collect()
    }
    # q1..q6 is one maximal 6-token span in both docs (4 merged 3-grams)
    assert cross == {("a", 5, 11, 4), ("b", 1, 7, 4)}
    any_ = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(df, min_len=3, cross_doc_only=False).collect()
    }
    assert any_ == {("a", 5, 11), ("b", 1, 7), ("d", 0, 8)}

    spans = duplicate_spans(df, min_len=3)
    out = {r.doc_id: r for r in remove_duplicate_spans(df, spans).collect()}
    assert out["a"].n_dup_tokens == 6 and out["a"].n_tokens == 12
    assert out["b"].n_dup_tokens == 6
    # untouched docs pass through with zero removed and full stream kept
    assert out["c"].n_dup_tokens == 0 and out["e"].n_dup_tokens == 0
    import hashlib

    assert out["a"].clean_md5 == hashlib.md5(b"x1 x2 x3 x4 x5 y1").hexdigest()

    with pytest.raises(ValueError):
        duplicate_spans(df, min_len=1)


def test_duplicate_spans_plan_two_shuffles(spark, docs):
    """The span plan must keep to its scale contract: exchanges only on
    the gram hash and the doc id — no join back for the duplicate mark,
    no broadcast of a corpus-sized duplicate list, no cartesian."""
    from quickwit_spark.pipeline.dedup import duplicate_spans

    plan = duplicate_spans(docs, min_len=8)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    # windows mark duplicates in place of a groupBy+join on the hash
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") == 0


def test_duplicate_spans_matches_bruteforce_random(spark):
    """Randomized parity: a seeded corpus with injected shared
    paragraphs, checked span-for-span against a pure-Python
    brute-force (dict of gram occurrences + island merge)."""
    import random
    import re

    from quickwit_spark.pipeline.dedup import duplicate_spans

    rng = random.Random(20260818)
    vocab = [f"v{i:02d}" for i in range(50)]
    texts = {
        f"d{i:03d}": [rng.choice(vocab) for _ in range(rng.randint(5, 60))]
        for i in range(120)
    }
    for _ in range(10):  # shared paragraphs pasted into 2-5 docs each
        para = [rng.choice(vocab) for _ in range(rng.randint(6, 15))]
        for d in rng.sample(sorted(texts), rng.randint(2, 5)):
            at = rng.randint(0, len(texts[d]))
            texts[d] = texts[d][:at] + para + texts[d][at:]
    L = 4

    grams: dict[tuple, list] = {}
    for d, ts in texts.items():
        for p in range(len(ts) - L + 1):
            grams.setdefault(tuple(ts[p : p + L]), []).append((d, p))
    dup_pos: dict[str, list] = {}
    for occ in grams.values():
        if len({d for d, _ in occ}) >= 2:
            for d, p in occ:
                dup_pos.setdefault(d, []).append(p)
    want = set()
    for d, ps in dup_pos.items():
        ps.sort()
        start = prev = ps[0]
        n = 1
        for p in ps[1:]:
            if p - prev <= L:
                prev, n = p, n + 1
            else:
                want.add((d, start, prev + L, n))
                start = prev = p
                n = 1
        want.add((d, start, prev + L, n))

    df = spark.createDataFrame(
        [(d, " ".join(ts)) for d, ts in texts.items()], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in duplicate_spans(df, min_len=L).collect()
    }
    assert got == want and len(want) > 20


def test_duplicate_spans_hash_paths_agree(spark, docs):
    """The fast xxhash64-over-slice path and the DuckDB-reproducible
    md5 path must produce identical spans (same semantics, different
    gram hash)."""
    from quickwit_spark.pipeline.dedup import duplicate_spans

    fast = {tuple(r) for r in duplicate_spans(docs, min_len=8).collect()}
    md5 = {
        tuple(r) for r in duplicate_spans(docs, min_len=8, hash="md5").collect()
    }
    assert fast == md5 and fast

    with pytest.raises(ValueError):
        duplicate_spans(docs, hash="sha1")


def test_duplicate_spans_keep_first(spark):
    """keep_first leaves each gram's globally-smallest (id, pos)
    occurrence unmarked, so scrubbing keeps exactly one copy of the
    duplicated passage."""
    from quickwit_spark.pipeline.dedup import duplicate_spans, remove_duplicate_spans

    df = spark.createDataFrame(
        [
            ("a", "x1 x2 x3 x4 x5 q1 q2 q3 q4 q5 q6 y1"),
            ("b", "z1 q1 q2 q3 q4 q5 q6 z2 z3"),
        ],
        ["doc_id", "text"],
    )
    spans = duplicate_spans(df, min_len=3, keep_first=True)
    got = {(r.doc_id, r.span_start, r.span_end, r.n_grams) for r in spans.collect()}
    assert got == {("b", 1, 7, 4)}  # doc a holds the canonical copy
    out = {r.doc_id: r for r in remove_duplicate_spans(df, spans).collect()}
    assert out["a"].n_dup_tokens == 0 and out["b"].n_dup_tokens == 6


def test_contamination_spans_semantics(spark):
    """Only corpus positions whose gram appears in the eval set are
    marked; eval-internal duplication and corpus-internal duplication
    do NOT mark anything on their own."""
    from quickwit_spark.pipeline.dedup import contamination_spans, remove_duplicate_spans

    corpus = spark.createDataFrame(
        [
            ("a", "x1 x2 x3 q1 q2 q3 q4 x4 x5"),
            ("b", "z1 z2 z3 z4 z5 z6"),
            ("c", "q2 q3 q4 x9"),
            # corpus-internal dup of doc b's text: not contamination
            ("d", "z1 z2 z3 z4 z5 z6"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [("e1", "w1 q1 q2 q3 q4 w2"), ("e2", "w1 q1 q2 q3 q4 w2")],
        ["doc_id", "text"],
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in contamination_spans(corpus, ev, min_len=3).collect()
    }
    assert got == {("a", 3, 7, 2), ("c", 0, 3, 1)}

    # scrubbing the spans removes exactly the contaminated tokens
    sp = contamination_spans(corpus, ev, min_len=3)
    out = {r.doc_id: r for r in remove_duplicate_spans(corpus, sp).collect()}
    assert out["a"].n_dup_tokens == 4 and out["b"].n_dup_tokens == 0
    assert out["c"].n_dup_tokens == 3 and out["d"].n_dup_tokens == 0

    with pytest.raises(ValueError):
        contamination_spans(corpus, ev, min_len=1)


def test_contamination_spans_matches_bruteforce_random(spark):
    """Randomized parity for span-level decontamination: seeded corpus
    + eval set with injected shared passages, checked span-for-span
    against a pure-Python brute force."""
    import random

    from quickwit_spark.pipeline.dedup import contamination_spans

    rng = random.Random(20260819)
    vocab = [f"v{i:02d}" for i in range(40)]
    corpus = {
        f"d{i:03d}": [rng.choice(vocab) for _ in range(rng.randint(5, 50))]
        for i in range(80)
    }
    evals = {
        f"e{i}": [rng.choice(vocab) for _ in range(rng.randint(10, 25))]
        for i in range(8)
    }
    for _ in range(12):  # eval passages pasted into corpus docs
        ev = rng.choice(sorted(evals))
        lo = rng.randint(0, max(len(evals[ev]) - 6, 0))
        passage = evals[ev][lo : lo + rng.randint(5, 10)]
        for d in rng.sample(sorted(corpus), rng.randint(1, 3)):
            at = rng.randint(0, len(corpus[d]))
            corpus[d] = corpus[d][:at] + passage + corpus[d][at:]
    L = 4

    ev_grams = {
        tuple(ts[p : p + L])
        for ts in evals.values()
        for p in range(len(ts) - L + 1)
    }
    want = set()
    for d, ts in corpus.items():
        ps = [p for p in range(len(ts) - L + 1) if tuple(ts[p : p + L]) in ev_grams]
        if not ps:
            continue
        start = prev = ps[0]
        n = 1
        for p in ps[1:]:
            if p - prev <= L:
                prev, n = p, n + 1
            else:
                want.add((d, start, prev + L, n))
                start = prev = p
                n = 1
        want.add((d, start, prev + L, n))

    cdf = spark.createDataFrame(
        [(d, " ".join(ts)) for d, ts in corpus.items()], ["doc_id", "text"]
    )
    edf = spark.createDataFrame(
        [(d, " ".join(ts)) for d, ts in evals.items()], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_grams)
        for r in contamination_spans(cdf, edf, min_len=L).collect()
    }
    assert got == want and len(want) > 5


def test_bigram_logprob_exact_replay(spark):
    """Scores match a pure-Python integer micro-nat replay of the
    ML conditional bigram LM; <2-token docs score NULL; a repeated
    formulaic doc scores higher than a unique-bigram doc."""
    import math

    from quickwit_spark.pipeline.textstats import LN_MICRO, bigram_logprob

    rows = [
        (0, "a b a b a b"),          # formulaic: p(b|a)=1 within-doc mass
        (1, "a b c d"),              # unique bigrams
        (2, "c a b d"),
        (3, "solo"),                 # 1 token -> no bigrams
        (4, ""),                     # empty
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in bigram_logprob(df).collect()}
    assert out[3].n_bigrams == 0 and out[3].logprob is None
    assert out[4].n_bigrams == 0 and out[4].logprob is None

    # pure-Python replay
    from collections import Counter

    bg_by_doc = {}
    corpus = Counter()
    for did, text in rows:
        toks = text.split()
        bgs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        bg_by_doc[did] = bgs
        corpus.update(bgs)
    heads = Counter()
    for bg, c in corpus.items():
        heads[bg.split(" ")[0]] += c

    def qln(x):
        return int(math.floor(math.log(x) * LN_MICRO + 0.5))

    for did, bgs in bg_by_doc.items():
        if not bgs:
            continue
        sq = sum(qln(corpus[bg]) - qln(heads[bg.split(" ")[0]]) for bg in bgs)
        want = round(sq / len(bgs) / LN_MICRO, 6)
        assert out[did].n_bigrams == len(bgs)
        assert abs(out[did].logprob - want) < 1e-9, (did, out[did].logprob, want)

    assert out[0].logprob > out[1].logprob  # formulaic beats token soup

    # cached intermediate is releasable and matches the uncached plan
    from quickwit_spark.pipeline.dedup import unpersist_intermediates

    cached = bigram_logprob(df)
    assert len(cached._qs_cached) == 1
    rows_cached = {(r.doc_id, r.n_bigrams, r.logprob) for r in cached.collect()}
    unpersist_intermediates(cached)
    plain = bigram_logprob(df, persist_intermediates=False)
    assert {(r.doc_id, r.n_bigrams, r.logprob) for r in plain.collect()} == rows_cached


def test_ccnet_buckets_thresholds_and_labels(spark):
    """Bucket labels follow the tercile thresholds of the bigram-LM
    score: most-fluent third 'head', least 'tail', unscoreable docs
    (< 2 tokens) NULL; cut columns are the corpus-wide quantiles every
    row was compared against; a python replay of the type-7 quantile +
    CASE rule reproduces every label."""
    from quickwit_spark.pipeline.dedup import unpersist_intermediates
    from quickwit_spark.pipeline.textstats import bigram_logprob, ccnet_buckets

    rows = [
        (0, "a b a b a b a b"),      # formulaic -> highest score
        (1, "a b a b c"),
        (2, "a b c d e"),
        (3, "f g h i j"),            # all-unique bigrams -> low
        (4, "k l m n o"),
        (5, "p q r s t"),
        (6, "solo"),                 # unscoreable
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    res = ccnet_buckets(df)
    out = {r.doc_id: r for r in res.collect()}
    assert out[6].ccnet_bucket is None

    lp = {r.doc_id: r.logprob
          for r in bigram_logprob(df, persist_intermediates=False).collect()}
    scores = sorted(v for v in lp.values() if v is not None)

    def type7(p):
        pos = p * (len(scores) - 1)
        i, f = int(pos), pos - int(pos)
        return scores[i] if f == 0 else scores[i] * (1 - f) + scores[i + 1] * f

    hi, lo = type7(1.0 - 1 / 3), type7(1 / 3)
    for did, s in lp.items():
        want = (None if s is None else "head" if s >= hi
                else "tail" if s < lo else "middle")
        assert out[did].ccnet_bucket == want, (did, s, hi, lo)
        assert abs(out[did].cut_hi - round(hi, 6)) < 1e-9
        assert abs(out[did].cut_lo - round(lo, 6)) < 1e-9
    best = max((d for d, s in lp.items() if s is not None), key=lambda d: lp[d])
    worst = min((d for d, s in lp.items() if s is not None), key=lambda d: lp[d])
    assert out[best].ccnet_bucket == "head"
    assert out[worst].ccnet_bucket == "tail"
    assert len(res._qs_cached) == 2  # tf frame + persisted score frame
    unpersist_intermediates(res)


def test_ccnet_buckets_by_group(spark):
    """Per-group cuts (CCNet proper is per-language): each group's
    thresholds come from its OWN score distribution — a replay of the
    type-7 quantile + CASE rule per group reproduces every label, and
    each group independently contains a head row, so a group whose
    scores all sit below another group's cuts still gets heads."""
    from quickwit_spark.pipeline.dedup import unpersist_intermediates
    from quickwit_spark.pipeline.textstats import bigram_logprob, ccnet_buckets

    rows = [
        (0, "a b a b a b a b", "x"),
        (1, "a b a b c", "x"),
        (2, "a b c d e", "x"),
        (3, "f g h i j", "y"),
        (4, "k l m n o", "y"),
        (5, "p q r s t", "y"),
        (6, "solo", "y"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "grp"])
    res = ccnet_buckets(df, by_col="grp")
    out = {r.doc_id: r for r in res.collect()}
    assert out[6].ccnet_bucket is None and out[6].grp == "y"

    lp = {r.doc_id: r.logprob
          for r in bigram_logprob(df, persist_intermediates=False).collect()}
    grp_of = {d: g for d, _, g in rows}

    def type7(scores, p):
        pos = p * (len(scores) - 1)
        i, f = int(pos), pos - int(pos)
        return scores[i] if f == 0 else scores[i] * (1 - f) + scores[i + 1] * f

    for g in ("x", "y"):
        scores = sorted(lp[d] for d in lp
                        if grp_of[d] == g and lp[d] is not None)
        hi, lo = type7(scores, 1.0 - 1 / 3), type7(scores, 1 / 3)
        labels = set()
        for d, s in lp.items():
            if grp_of[d] != g:
                continue
            want = (None if s is None else "head" if s >= hi
                    else "tail" if s < lo else "middle")
            assert out[d].ccnet_bucket == want, (d, g, s, hi, lo)
            labels.add(want)
        assert "head" in labels  # every group buckets against itself
    unpersist_intermediates(res)
