"""Physical-plan quality gates: column pruning, predicate pushdown,
broadcast joins, no Python UDFs in built-in pipelines — the properties
that decide whether these plans survive a 100 TB scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_token_count_prunes_columns(spark):
    from quickwit_spark.pipeline.textstats import token_count

    df = token_count(spark.read.parquet(f"{SF}/documents.parquet"))
    plan = _plan(df)
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "doc_id" in read_schema
    # lang/source/n_chars must NOT be read
    assert "lang" not in read_schema and "source" not in read_schema


def test_filter_pushdown_reaches_scan(spark):
    df = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .where(F.col("n_chars") > 300)
        .select("doc_id")
    )
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "GreaterThan(n_chars,300)" in plan.replace(" ", "")


def test_cosine_topk_broadcasts_queries(spark):
    from quickwit_spark.pipeline.similarity import cosine_topk

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = cosine_topk(embs, embs.where(F.col("vec_id") < 3), k=5)
    assert "Broadcast" in _plan(df)  # small probe side broadcast


def test_embedding_lsh_pairs_has_no_cartesian_product(spark):
    """The scale path must candidate via the bucket equi-join; only the
    exact verifier is allowed a cross join."""
    from quickwit_spark.pipeline.dedup import (
        embedding_cosine_pairs,
        embedding_lsh_pairs,
    )

    embs = spark.read.parquet(f"{SF}/embeddings.parquet")
    lsh_plan = _plan(embedding_lsh_pairs(embs, threshold=0.2, n_planes=4))
    assert "CartesianProduct" not in lsh_plan and "NestedLoop" not in lsh_plan
    # the exact verifier by contrast IS an all-pairs join (cartesian, or
    # its broadcast-nested-loop form when one side is small)
    exact_plan = _plan(embedding_cosine_pairs(embs, threshold=0.2))
    assert "CartesianProduct" in exact_plan or "NestedLoop" in exact_plan


def test_exact_dedup_is_single_shuffle_window(spark):
    from quickwit_spark.pipeline.dedup import exact_dedup

    df = exact_dedup(spark.read.parquet(f"{SF}/documents.parquet"))
    plan = _plan(df)
    # one digest shuffle feeding a window agg — no second exchange
    # (the groupBy+join formulation) and no join at all
    assert plan.count("Exchange") == 1
    assert "Window" in plan
    assert "Join" not in plan


@pytest.mark.parametrize(
    "maker",
    ["token_count", "quality_score", "lang_id", "fingerprint", "simhash"],
)
def test_no_python_udfs_in_builtin_pipelines(spark, maker):
    """These operators promise whole-stage-codegen plans — a
    BatchEvalPython/ArrowEvalPython node means a Python UDF snuck in."""
    import quickwit_spark.pipeline.dedup as dd
    import quickwit_spark.pipeline.textstats as ts

    fn = getattr(ts, maker, None) or getattr(dd, maker)
    df = fn(spark.read.parquet(f"{SF}/documents.parquet"))
    # ops guarded by ensure_parallelism() repartition small inputs, which
    # puts an AdaptiveSparkPlan on top whose toString hides codegen spans
    # until the plan is finalized — execute first, then read the plan
    df.collect()
    plan = _plan(df)
    assert "EvalPython" not in plan  # all expressions JVM-side
    # codegen spans present (toString marks them "*(n)"); higher-order
    # lambdas legitimately sit outside WSCG but stay JVM-interpreted
    assert "*(1)" in plan


def test_minhash_signature_single_shuffle(spark):
    from quickwit_spark.pipeline.dedup import minhash_signatures

    df = minhash_signatures(spark.read.parquet(f"{SF}/documents.parquet"))
    plan = _plan(df)
    # exactly one DATA shuffle — the groupBy(doc) hash partitioning;
    # the small-input ensure_parallelism guard may add a round-robin
    # repartition exchange on this tiny fixture (a no-op at real scale)
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange ") <= 2  # at most the round-robin extra
    assert "EvalPython" not in plan
