"""Incremental dedup (standing digest index + new-vs-corpus MinHash),
paragraph-level dedup, per-doc duplication fraction, and deterministic
split assignment."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from quickwit_spark.pipeline.dedup import (
    append_digest_index,
    duplication_fraction,
    exact_dedup_incremental,
    minhash_lsh_incremental,
    minhash_lsh_pairs,
    paragraph_dedup,
    remove_duplicate_paragraphs,
    unpersist_intermediates,
    write_digest_index,
)
from quickwit_spark.pipeline.sampling import assign_split


def _df(spark, rows, cols=("doc_id", "text")):
    return spark.createDataFrame(pd.DataFrame(rows, columns=list(cols)))


class TestExactIncremental:
    def test_lifecycle(self, spark, tmp_path):
        idx = str(tmp_path / "digest_idx")
        corpus = _df(spark, [(0, "alpha beta gamma"), (1, "delta epsilon"),
                             (2, "alpha beta gamma")])
        write_digest_index(corpus, idx)
        # index holds one row per DISTINCT digest with the min-id keeper
        stored = spark.read.parquet(idx).toPandas()
        assert len(stored) == 2
        assert set(stored.keeper_id) == {0, 1}

        batch = _df(spark, [
            (10, "alpha beta gamma"),   # corpus dup
            (11, "zeta eta"),           # new
            (12, "zeta eta"),           # within-batch dup of 11
            (13, "theta iota"),         # new
        ])
        out = exact_dedup_incremental(spark, batch, idx).toPandas() \
            .set_index("doc_id").sort_index()
        assert bool(out.loc[10, "is_dup_corpus"]) is True
        assert out.loc[10, "corpus_keeper_id"] == 0
        assert out.loc[10, "keeper_id"] == 0
        assert bool(out.loc[11, "is_dup"]) is False
        assert bool(out.loc[12, "is_dup"]) is True
        assert out.loc[12, "keeper_id"] == 11
        assert bool(out.loc[13, "is_dup"]) is False
        # exactly the non-dups are appendable; append is idempotent
        assert append_digest_index(spark, batch, idx) == 2
        assert append_digest_index(spark, batch, idx) == 0
        again = exact_dedup_incremental(spark, batch, idx).toPandas()
        assert bool(again.is_dup.all())  # now everything is seen

    def test_batch_shuffled_once(self, spark, tmp_path):
        idx = str(tmp_path / "digest_idx2")
        corpus = _df(spark, [(0, "a b c")])
        write_digest_index(corpus, idx)
        batch = _df(spark, [(1, "a b c"), (2, "x y z")])
        plan = exact_dedup_incremental(spark, batch, idx) \
            ._jdf.queryExecution().executedPlan().toString()
        # one exchange for the batch side (window + probe join reuse the
        # digest partitioning), one for the narrow index side
        assert plan.count("Exchange hashpartitioning") <= 2


class TestMinhashIncremental:
    def test_new_vs_corpus_only(self, spark):
        corpus = _df(spark, [
            (0, "the quick brown fox jumps over the lazy dog tonight"),
            (1, "completely unrelated corpus content about spark plans"),
            (2, "another unrelated corpus doc mentioning parquet files"),
        ])
        batch = _df(spark, [
            (100, "the quick brown fox jumps over the lazy dog today"),
            (101, "fresh batch text with no match whatsoever anywhere"),
        ])
        out = minhash_lsh_incremental(batch, corpus, threshold=0.3)
        pairs = {(r.id_new, r.id_corpus) for r in out.collect()}
        unpersist_intermediates(out)
        assert (100, 0) in pairs
        # only batch ids on the left, corpus ids on the right
        assert all(a >= 100 and b < 100 for a, b in pairs)

    def test_matches_full_self_join_restricted(self, spark):
        rows = [(i, f"shared prefix tokens run long {i % 3} tail {i}")
                for i in range(12)]
        full = _df(spark, rows)
        corpus, batch = full.where("doc_id < 8"), full.where("doc_id >= 8")
        inc = minhash_lsh_incremental(batch, corpus, threshold=0.2)
        got = {(r.id_corpus, r.id_new, r.jaccard) for r in inc.collect()}
        unpersist_intermediates(inc)
        allp = minhash_lsh_pairs(full, threshold=0.2)
        want = {(r.id_a, r.id_b, r.jaccard) for r in allp.collect()
                if r.id_a < 8 <= r.id_b}
        unpersist_intermediates(allp)
        assert got == want and want  # nonempty and identical


PARA_DOCS = [
    (0, "Header boilerplate\nunique body zero\nFooter legal text"),
    (1, "header   BOILERPLATE\nunique body one\nFooter legal text"),
    (2, "totally unique document two"),
    (3, "\n\nunique body three\n"),
]


class TestParagraphDedup:
    def test_marks_and_keepers(self, spark):
        out = paragraph_dedup(_df(spark, PARA_DOCS)).toPandas()
        out = out.set_index(["doc_id", "para_idx"]).sort_index()
        # normalization folds case + whitespace: doc1's header == doc0's
        assert out.loc[(0, 0), "dup_count"] == 2
        assert bool(out.loc[(0, 0), "is_keeper"]) is True
        assert bool(out.loc[(1, 0), "is_dup"]) is True
        # footers duplicate exactly
        assert bool(out.loc[(1, 2), "is_dup"]) is True
        # unique paragraphs never marked
        assert not out.loc[(2, 0), "is_dup"] and out.loc[(2, 0), "dup_count"] == 1
        # doc3: the leading \n\n collapses into ONE delimiter (delim is
        # the regex \n+), leaving [''], ['unique body three'] — the
        # empty is filtered but the body keeps its raw split index 1
        assert (3, 1) in out.index and (3, 0) not in out.index

    def test_scrub_keep_first(self, spark):
        out = remove_duplicate_paragraphs(_df(spark, PARA_DOCS)).toPandas() \
            .set_index("doc_id").sort_index()
        assert out.loc[0, "n_removed"] == 0  # doc0 holds both keepers
        assert out.loc[0, "text_clean"] == PARA_DOCS[0][1]
        assert out.loc[1, "n_removed"] == 2
        assert out.loc[1, "text_clean"] == "unique body one"
        assert out.loc[2, "n_removed"] == 0
        assert out.loc[3, "text_clean"] == "unique body three"

    def test_single_exchange(self, spark):
        plan = paragraph_dedup(_df(spark, PARA_DOCS)) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1


class TestDuplicationFraction:
    def test_fraction_matches_spans(self, spark):
        shared = " ".join(f"w{i}" for i in range(10))  # 10-token passage
        rows = [
            (0, shared + " unique0 tail0 a b c d e f g h i j"),
            (1, shared + " unique1 tail1 k l m n o p q r s t"),
            (2, "no duplication here at all just singles " +
                " ".join(f"z{i}" for i in range(10))),
        ]
        out = duplication_fraction(_df(spark, rows), min_len=8).toPandas() \
            .set_index("doc_id").sort_index()
        assert out.loc[0, "n_tokens"] == 22
        assert out.loc[0, "dup_tokens"] == 10  # exactly the shared passage
        assert out.loc[0, "dup_fraction"] == pytest.approx(10 / 22, abs=1e-6)
        assert out.loc[2, "dup_tokens"] == 0 and out.loc[2, "dup_fraction"] == 0


class TestAssignSplit:
    def test_partition_and_determinism(self, spark):
        df = spark.range(2000).withColumnRenamed("id", "doc_id")
        out = assign_split(df, {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
        assert sum(counts.values()) == 2000
        assert 1520 < counts["train"] < 1680  # ~1600 ± binomial noise
        # label is a pure function of (seed, id): stable across runs
        a = {r.doc_id: r.split for r in out.collect()}
        b = {r.doc_id: r.split
             for r in assign_split(df, {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
        assert a == b
        # monotone under growth: first 2000 keep labels inside 4000
        big = assign_split(
            spark.range(4000).withColumnRenamed("id", "doc_id"),
            {"train": 0.8, "val": 0.1, "test": 0.1})
        c = {r.doc_id: r.split for r in big.collect() if r.doc_id < 2000}
        assert a == c

    def test_validation(self, spark):
        df = spark.range(5).withColumnRenamed("id", "doc_id")
        with pytest.raises(ValueError, match="sum to 1"):
            assign_split(df, {"train": 0.5, "val": 0.1})


def _h15(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class TestDsir:
    TARGET = [(1000, "cat cats feline cat whiskers purr"),
              (1001, "cat feline purr cats meow")]
    RAW = [
        (0, "cat cats purr feline whiskers happy"),   # in-domain
        (1, "spark shuffle exchange partition plan"),  # off-domain
        (2, "cat meow purr"),                          # in-domain
        (3, "totally unrelated quarterly revenue"),    # off-domain
        (4, ""),                                       # empty
    ]

    def test_ranking_and_exact_integer_replay(self, spark):
        import math

        from quickwit_spark.pipeline.sampling import dsir_logweights

        B, LN = 101, 1_000_000
        out = dsir_logweights(
            _df(spark, self.RAW), _df(spark, self.TARGET), n_buckets=B
        ).toPandas().set_index("doc_id").sort_index()

        # pure-Python integer replay of the micro-nat arithmetic
        import re

        def feats(text):
            toks = re.findall(r"[a-z0-9]+", text.lower())
            f = [_h15(t) % B for t in toks]
            f += [_h15(f"{a} {b}") % B for a, b in zip(toks, toks[1:])]
            return f

        from collections import Counter
        rc = Counter(x for _, t in self.RAW for x in feats(t))
        tc = Counter(x for _, t in self.TARGET for x in feats(t))
        qln = lambda v: round(math.log(v) * LN)
        qrt, qtt = qln(sum(rc.values()) + B), qln(sum(tc.values()) + B)
        for did, text in self.RAW:
            fs = feats(text)
            want = sum(
                qln(tc.get(x, 0) + 1) - qtt - qln(rc[x] + 1) + qrt for x in fs
            )
            assert out.loc[did, "logweight_micro"] == want, did
            assert out.loc[did, "n_feats"] == len(fs)
        # in-domain docs outrank off-domain; empty doc is neutral 0
        assert out.loc[0, "logweight_micro"] > out.loc[1, "logweight_micro"]
        assert out.loc[2, "logweight_micro"] > out.loc[3, "logweight_micro"]
        assert out.loc[4, "logweight_micro"] == 0 and out.loc[4, "n_feats"] == 0

    def test_select_topk_and_gumbel_determinism(self, spark):
        from quickwit_spark.pipeline.sampling import dsir_select

        raw, tgt = _df(spark, self.RAW), _df(spark, self.TARGET)
        top = dsir_select(raw, tgt, k=2, n_buckets=101)
        # the off-domain docs (1, 3) must never make the cut; the empty
        # doc's neutral 0 may legitimately beat a weakly-in-domain doc
        # on a tiny smoothed fixture
        assert {r.doc_id for r in top.collect()} <= {0, 2, 4}
        assert 2 in {r.doc_id for r in top.collect()}
        g1 = [r.doc_id for r in
              dsir_select(raw, tgt, k=2, n_buckets=101,
                          gumbel_seed="g0").collect()]
        g2 = [r.doc_id for r in
              dsir_select(raw, tgt, k=2, n_buckets=101,
                          gumbel_seed="g0").collect()]
        assert g1 == g2  # hash-Gumbel: no RNG state, fully reproducible

    def test_ratio_join_broadcasts(self, spark):
        from quickwit_spark.pipeline.sampling import dsir_logweights

        raw, tgt = _df(spark, self.RAW), _df(spark, self.TARGET)
        plan = dsir_logweights(raw, tgt, n_buckets=101) \
            ._jdf.queryExecution().executedPlan().toString()
        # the bucket-bounded ratio table broadcasts against the exploded
        # corpus features — the corpus is never shuffled for the join
        assert "BroadcastHashJoin" in plan


class TestMinhashIndexed:
    def test_lifecycle_matches_recompute(self, spark, tmp_path):
        from quickwit_spark.pipeline.dedup import (
            append_minhash_index,
            minhash_lsh_indexed,
            write_minhash_index,
        )

        rows = [(i, f"shared prefix tokens run long {i % 3} tail {i}")
                for i in range(12)]
        full = _df(spark, rows)
        corpus, batch = full.where("doc_id < 8"), full.where("doc_id >= 8")
        idx = str(tmp_path / "mh_idx")
        write_minhash_index(corpus, idx)

        got_df = minhash_lsh_indexed(spark, batch, idx, threshold=0.2)
        got = {(r.id_new, r.id_corpus, r.jaccard) for r in got_df.collect()}
        unpersist_intermediates(got_df)
        ref_df = minhash_lsh_incremental(batch, corpus, threshold=0.2)
        want = {(r.id_new, r.id_corpus, r.jaccard) for r in ref_df.collect()}
        unpersist_intermediates(ref_df)
        assert got == want and want  # identical to the recompute path

        # fold the batch in: the NEXT increment now matches against it
        append_minhash_index(batch, idx)
        nxt = _df(spark, [(100, "shared prefix tokens run long 2 tail 8")])
        out = minhash_lsh_indexed(spark, nxt, idx, threshold=0.2)
        hits = {r.id_corpus for r in out.collect()}
        unpersist_intermediates(out)
        assert 8 in hits  # doc 8 (appended batch member) is now corpus


class TestGopherRules:
    def test_each_rule_fires(self, spark):
        from quickwit_spark.pipeline.textstats import gopher_rules

        good = "the cat and dog have fun with all of that " * 6  # 60 words
        rows = [
            (0, good),                                   # passes everything
            (1, "too short of the and"),                 # n_words < min
            (2, "### " * 60 + good),                     # symbol ratio
            (3, "\n".join(["- bullet point here"] * 10 + [good])),  # bullets
            (4, "\n".join(["trailing thought..."] * 5 + [good, good])),
            (5, ("0101 " * 30) + "the of and"),          # alpha fraction
            (6, "zz qq xx vv " * 15),                    # no required stops
        ]
        out = gopher_rules(
            _df(spark, rows), min_words=30, max_bullet_line_frac=0.5,
            max_ellipsis_line_frac=0.3,
        ).toPandas().set_index("doc_id").sort_index()
        assert bool(out.loc[0, "gopher_keep"]) is True
        assert bool(out.loc[1, "gopher_keep"]) is False
        assert out.loc[1, "n_words"] == 5
        assert bool(out.loc[2, "gopher_keep"]) is False
        assert out.loc[2, "symbol_ratio"] > 0.1
        assert bool(out.loc[3, "gopher_keep"]) is False
        assert out.loc[3, "bullet_line_frac"] > 0.5
        assert bool(out.loc[4, "gopher_keep"]) is False
        assert out.loc[4, "ellipsis_line_frac"] > 0.3
        assert bool(out.loc[5, "gopher_keep"]) is False
        assert out.loc[5, "alpha_word_frac"] < 0.8
        assert bool(out.loc[6, "gopher_keep"]) is False
        assert out.loc[6, "n_required_stop"] == 0
        assert out.loc[0, "n_required_stop"] == 6  # the,and,have,with,of,that

    def test_zero_exchange(self, spark):
        from quickwit_spark.pipeline.textstats import gopher_rules

        plan = gopher_rules(_df(spark, [(0, "a b c")])) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure narrow map


class TestFrequencyCap:
    def test_cap_deterministic_and_monotone(self, spark):
        from quickwit_spark.pipeline.sampling import frequency_cap

        rows = [(i, "srcA" if i < 80 else "srcB") for i in range(100)]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "source"])
        )
        out = frequency_cap(df, max_per_group=10)
        got = sorted(r.doc_id for r in out.collect())
        assert len(got) == 20  # 10 from each group
        # deterministic across runs
        again = sorted(
            r.doc_id for r in frequency_cap(df, max_per_group=10).collect()
        )
        assert got == again
        # tightening the cap yields a SUBSET (rank is cap-independent)
        tight = {r.doc_id for r in frequency_cap(df, max_per_group=5).collect()}
        assert tight < set(got) and len(tight) == 10
        # loosening past the group size keeps everything
        assert frequency_cap(df, max_per_group=1000).count() == 100


class TestIndexedDedupStream:
    def test_stream_dedups_and_reprocessing_is_idempotent(self, spark, tmp_path):
        import json as _json

        from quickwit_spark.pipeline.dedup import start_indexed_dedup_stream

        src = tmp_path / "src"
        src.mkdir()
        (src / "f1.json").write_text("\n".join(
            _json.dumps(d) for d in [
                {"doc_id": 10, "text": "alpha beta"},
                {"doc_id": 11, "text": "gamma delta"},
            ]))
        (src / "f2.json").write_text("\n".join(
            _json.dumps(d) for d in [
                {"doc_id": 20, "text": "alpha beta"},     # dup of 10
                {"doc_id": 21, "text": "seed content"},   # dup of seed 0
                {"doc_id": 22, "text": "epsilon zeta"},   # new
            ]))
        idx = str(tmp_path / "digidx")
        write_digest_index(
            _df(spark, [(0, "seed content")]), idx
        )
        out = str(tmp_path / "kept")

        def run(cp: str):
            stream = (
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1).json(str(src))
            )
            q = start_indexed_dedup_stream(
                spark, stream, idx, out, str(tmp_path / cp))
            q.awaitTermination(120)

        run("cp1")
        kept = spark.read.parquet(out)
        ids = {r.doc_id for r in kept.select("doc_id").collect()}
        assert ids == {10, 11, 22}  # both dups dropped, firsts kept
        # the index now also covers the streamed keepers
        n_digests = spark.read.parquet(idx).count()
        assert n_digests == 4  # seed + 3 keepers

        # reprocess everything with a FRESH checkpoint: every keeper is
        # its own canonical copy (keeper_id == id survives its own
        # digest being in the index), dups stay dropped, index stable
        run("cp2")
        again = {r.doc_id for r in
                 spark.read.parquet(out).select("doc_id").collect()}
        assert again == ids
        assert spark.read.parquet(idx).count() == n_digests


class TestC4Rules:
    def test_line_and_page_rules(self, spark):
        from quickwit_spark.pipeline.textstats import c4_rules

        good = "the quick brown fox jumps over it."
        rows = [
            # 3 good lines -> kept page
            (0, "\n".join([good, good, good])),
            # line dropped: no terminal punctuation
            (1, "\n".join([good, good, "no punctuation on this line", good])),
            # line dropped: < 5 words despite punctuation
            (2, "\n".join([good, good, "too short."])),
            # line dropped: javascript mention
            (3, "\n".join([good, good, "please enable JavaScript to view.", good])),
            # page dropped: blocklist phrase anywhere in the ORIGINAL text
            (4, "\n".join([good, good, "Lorem Ipsum dolor sit amet."])),
            # page dropped: curly brace
            (5, "\n".join([good, good, good, "if (x) { return y; }"])),
            # page dropped: fewer than 3 sentences after line filtering
            (6, "\n".join([good, good])),
            # multi-sentence single line still counts 3 sentences
            (7, "one two three four five. six seven eight nine ten! end it now ok yes?"),
        ]
        out = (
            c4_rules(_df(spark, rows))
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert bool(out.loc[0, "c4_keep"]) is True
        assert out.loc[0, "n_kept_lines"] == 3
        assert bool(out.loc[1, "c4_keep"]) is True
        assert out.loc[1, "n_lines"] == 4 and out.loc[1, "n_kept_lines"] == 3
        assert out.loc[2, "n_kept_lines"] == 2  # 'too short.' cut
        assert out.loc[3, "n_kept_lines"] == 3  # javascript line cut
        assert bool(out.loc[4, "has_blocklist"]) is True
        assert bool(out.loc[4, "c4_keep"]) is False
        assert bool(out.loc[5, "has_brace"]) is True
        assert bool(out.loc[5, "c4_keep"]) is False
        assert bool(out.loc[6, "c4_keep"]) is False
        assert out.loc[6, "n_sentences"] == 2
        assert bool(out.loc[7, "c4_keep"]) is True
        assert out.loc[7, "n_sentences"] == 3
        # kept_text is the trimmed kept lines rejoined
        assert out.loc[0, "kept_text"] == "\n".join([good, good, good])

    def test_thresholds_and_blocklist_params(self, spark):
        from quickwit_spark.pipeline.textstats import c4_rules

        rows = [(0, "alpha beta gamma delta epsilon zeta.\nsecret phrase here today now.")]
        strict = c4_rules(
            _df(spark, rows), min_sentences=2, blocklist=("secret phrase",)
        ).collect()[0]
        assert strict.has_blocklist and not strict.c4_keep
        loose = c4_rules(
            _df(spark, rows), min_sentences=2, blocklist=()
        ).collect()[0]
        assert (not loose.has_blocklist) and loose.c4_keep
        # word threshold: 6-word line survives min_words_per_line=6, not 7
        assert c4_rules(
            _df(spark, rows), min_sentences=1, blocklist=(),
            min_words_per_line=7,
        ).collect()[0].n_kept_lines == 0
        # brace tolerance
        braced = [(0, "alpha beta gamma delta epsilon { zeta.\n" * 3)]
        assert c4_rules(_df(spark, braced), drop_brace=False).collect()[0].c4_keep
        assert not c4_rules(_df(spark, braced)).collect()[0].c4_keep


def test_c4_oracle_zero_kept_line_parity():
    """A page whose every line is filtered out must report '' / 0 /
    keep=false in BOTH engines: DuckDB's array_to_string([]) is NULL
    (unlike Spark's array_join) and the oracle twin must coalesce it
    (regression: review finding, round 4)."""
    import duckdb

    import __spark_entry__ as entry

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT 5::BIGINT AS doc_id, 'short' AS text"
    )
    row = con.execute(entry.oracle_sql()["c4_rules"]).df().iloc[0]
    assert row["n_kept_lines"] == 0
    assert row["kept_text"] == "" and row["n_sentences"] == 0
    assert bool(row["c4_keep"]) is False
