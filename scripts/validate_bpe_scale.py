"""Scale validation for the (boundary-exact) BPE primitives: learn
merges over millions of docs and encode the full corpus on local[32].

Usage: python scripts/validate_bpe_scale.py [n_docs] [n_merges]
(defaults 1M docs / 12 merges). Prints one JSON line per op plus a
verdict. Checks are EXACT and vocab/full-output level, not samples:

* merges (rank, lhs, rhs, pair_freq) equal a pure-Python BPE replay
  (Sennrich-style symbol-level greedy merge — the replay compares
  whole symbols, so it would catch any boundary false-match) over the
  collected (word, freq) vocab;
* the final rep of EVERY vocab word equals the replay's;
* encode over the full corpus: row count == n_docs, sum(n_tokens) ==
  corpus token count, sum(n_subtokens) == sum over vocab of
  freq * len(rep) (corpus-level identity), and per-doc
  n_tokens <= n_subtokens <= n_tokens * max_word_len.

Run on an otherwise-idle host; the bench canary is printed first so
the record shows window quality (correctness checks are
window-independent; wall times are not).
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def python_bpe(wf: dict[str, int], n_merges: int):
    """Reference symbol-level BPE (same as the unit test's replay)."""
    seqs = {w: list(w) for w in wf}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, f in wf.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += f
        if not counts:
            break
        (l, r), freq = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r, freq))
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
    return merges, seqs


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    import bench  # noqa: E402  (repo root on path)
    print(json.dumps({"canary_hashes_per_sec": round(bench._cpu_canary(), 1)}))

    from pyspark.sql import functions as F

    from quickwit_spark.pipeline.bpe import SEP, bpe_encode, bpe_learn
    from quickwit_spark.pipeline.dedup import unpersist_intermediates
    from quickwit_spark.session import get_spark

    spark = get_spark("scale-bpe", cpus=32)
    t_all0 = time.time()

    def report(name, sec, rows_in, rows_out, **extra):
        print(json.dumps({
            "op": name, "rows_in": rows_in, "rows_out": rows_out,
            "sec": round(sec, 2),
            "rows_in_per_sec": round(rows_in / max(sec, 1e-9), 1),
            **extra,
        }))

    # same synthetic corpus shape as validate_retrieval_scale: 20-59
    # uniform-vocab words per doc, 2000 distinct 6-char words
    VOCAB = 2_000
    word = "concat('w', lpad(cast(pmod(xxhash64(id, i), {v}) as string), 5, '0'))"
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "array_join(transform(sequence(1, 20 + cast(id % 40 as int)),"
            f" i -> {word.format(v=VOCAB)}), ' ')"
        ).alias("text"),
    )

    # --- learn ------------------------------------------------------
    t0 = time.time()
    merges, reps = bpe_learn(docs, n_merges=n_merges)
    vocab_rows = reps.collect()
    t_learn = time.time() - t0
    report("bpe_learn", t_learn, n_docs, len(merges),
           vocab_words=len(vocab_rows))

    wf = {r.word: int(r.freq) for r in vocab_rows}
    ref_merges, ref_seqs = python_bpe(wf, n_merges)
    merges_ok = merges == ref_merges
    reps_ok = all(r.rep.split(SEP) == ref_seqs[r.word] for r in vocab_rows)
    print(json.dumps({
        "check": "learn_vs_python_replay",
        "merges_equal": merges_ok,
        "all_vocab_reps_equal": reps_ok,
        "n_merges": len(merges),
    }))

    # --- encode -----------------------------------------------------
    t0 = time.time()
    enc = bpe_encode(docs, reps)
    agg = enc.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_tokens").alias("tok"),
        F.sum("n_subtokens").alias("sub"),
        F.min(F.col("n_subtokens") >= F.col("n_tokens")).alias("sub_ge_tok"),
        F.min(F.col("n_subtokens") <= F.col("n_tokens") * 6).alias("sub_le_max"),
    ).collect()[0]
    t_enc = time.time() - t0
    report("bpe_encode", t_enc, n_docs, int(agg["rows"]))

    want_tok = sum(wf.values())
    want_sub = sum(f * len(ref_seqs[w]) for w, f in wf.items())
    enc_ok = (
        int(agg["rows"]) == n_docs
        and int(agg["tok"]) == want_tok
        and int(agg["sub"]) == want_sub
        and bool(agg["sub_ge_tok"]) and bool(agg["sub_le_max"])
    )
    print(json.dumps({
        "check": "encode_full_output",
        "rows_equal_docs": int(agg["rows"]) == n_docs,
        "sum_tokens_equal": int(agg["tok"]) == want_tok,
        "sum_subtokens_equal_replay": int(agg["sub"]) == want_sub,
        "per_doc_bounds_hold": bool(agg["sub_ge_tok"]) and bool(agg["sub_le_max"]),
    }))
    unpersist_intermediates(reps)

    verdict = "BPE_IDENTICAL" if (merges_ok and reps_ok and enc_ok) else "MISMATCH"
    print(json.dumps({
        "verdict": verdict,
        "n_docs": n_docs,
        "total_sec": round(time.time() - t_all0, 2),
        "end_canary_hashes_per_sec": round(bench._cpu_canary(), 1),
    }))
    if verdict != "BPE_IDENTICAL":
        sys.exit(1)


if __name__ == "__main__":
    main()
