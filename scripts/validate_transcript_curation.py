"""Scale validation for the transcript curation-hazard battery:
shared_prefix_depth, turn_loops, and transcript_lint at millions of
turns on local[32].

Usage: python scripts/validate_transcript_curation.py [n_turns]
(default 1M turns = 62.5k conversations of 16 turns). Prints one JSON
line per op: rows in/out, wall seconds, rows/sec, plus EXACT invariant
checks computed over the FULL output against an INDEPENDENT arithmetic
replay of the planting formulas (never by re-running the op):

* shared_prefix_depth (run with max_depth=8 to exercise the capped
  scale path): every conversation's shared_depth must equal its
  planted preamble length K = 2 + (conv DIV 1000) % 4, and n_sharers
  must equal the number of conversations in its template
  (conv % 1000) whose K' >= K — both derived purely from conversation
  ids; zero row-level mismatches allowed;
* turn_loops: planted loop conversations (conv % 97 == 13, constant
  assistant text at odd turns 7..13) must report exactly
  (max_run, n_loops, n_loop_turns) = (4, 1, 4) — or (3, 1, 3) when the
  same conversation also carries the role override that removes turn 9
  from the assistant stream — and every other conversation must report
  max_run == 1, n_loops == 0; n_turns_seen must match the planted
  assistant-turn count row-for-row;
* transcript_lint: n_empty_turns / n_role_repeats / n_ts_regressions
  must equal the planted hazard indicator per conversation
  (conv % 89 == 7 / 11 / 17 -> 1 / 2 / 1, else 0), first_role must be
  'user' everywhere, and ok must equal the conjunction exactly;
* curate_transcripts (loop_run_limit=3, family_depth=2, per_family=2):
  exactly one verdict row per conversation; the 'lint' set must equal
  the planted hazard classes exactly; the 'loop' set must equal the
  planted loop conversations minus those already lint-dropped; zero
  'duplicate' verdicts (none planted); and because every conversation
  in a template shares the same depth-2 preamble, each of the 1000
  templates must keep EXACTLY per_family conversations, with the
  rest of its survivors dropped as 'prefix_family';
* divergence_pairs (per_branch=2, max_branches=16, max_depth=8):
  every emitted pair must join two conversations of the SAME template
  with shared_depth == min(K_a, K_b) exactly; the deeper-preamble side
  must carry the exact rendered template continuation line and the
  K == depth side must NOT; no pair may have both sides on the shared
  continuation (the within-branch exclusion); every one of the
  templates x depths {2,3,4,5} prefix groups must emit >= 1 pair even
  under the caps; and no group may exceed the cap-implied
  C(max_branches*per_branch, 2) pair bound.

Planting keeps the hazard turns (7..13) strictly after the deepest
possible preamble turn (K <= 5), so the expectations compose without
cross-terms. Divergence texts are 4 words drawn from xxhash64(conv,
turn, j) over a 50k vocabulary (~6e18 distinct line space), so
accidental prefix extension / accidental loops are negligible.

Run on an otherwise-idle host; the bench canary is printed first so
the record shows window quality (correctness checks are
window-independent; wall times are not).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TURNS_PER_CONV = 16


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    import bench  # noqa: E402  (repo root on path)
    print(json.dumps({"canary_hashes_per_sec": round(bench._cpu_canary(), 1)}))

    from pyspark.sql import functions as F

    from quickwit_spark.pipeline.transcripts import (
        curate_transcripts,
        divergence_pairs,
        shared_prefix_depth,
        transcript_lint,
        turn_loops,
    )
    from quickwit_spark.session import get_spark

    spark = get_spark("scale-transcript-curation", cpus=32)
    t_all0 = time.time()

    def report(name, sec, rows_in, rows_out, **extra):
        print(json.dumps({
            "op": name, "rows_in": rows_in, "rows_out": rows_out,
            "sec": round(sec, 2),
            "rows_in_per_sec": round(rows_in / max(sec, 1e-9), 1),
            **extra,
        }))

    # --- planted corpus: conv = id DIV 16, t = id % 16 ---------------
    # preamble: template conv % 1000, length K = 2 + (conv DIV 1000) % 4
    # loop:     conv % 97 == 13, odd t in 7..13, constant text
    # lint:     conv % 89 == 7 -> '  ' at t=8; == 11 -> role 'user' at
    #           t=9 (two adjacent repeats); == 17 -> ts -3600 s at t=12
    conv = "id DIV 16"
    t = "id % 16"
    k = f"2 + (({conv}) DIV 1000) % 4"
    uniq = (
        "array_join(transform(sequence(1, 4), j -> concat('w', lpad(cast("
        f"pmod(xxhash64({conv}, {t}, j), 50000) as string), 5, '0'))), ' ')"
    )
    turns = spark.range(n_turns).select(
        F.expr(f"concat('c', lpad(cast({conv} as string), 13, '0'))").alias(
            "conv_id"
        ),
        F.expr(f"cast({t} as int)").alias("turn_idx"),
        F.expr(
            f"CASE WHEN ({conv}) % 89 = 11 AND {t} = 9 THEN 'user'"
            f" WHEN ({t}) % 2 = 0 THEN 'user' ELSE 'assistant' END"
        ).alias("role"),
        F.expr(
            f"CASE WHEN ({conv}) % 89 = 7 AND {t} = 8 THEN '  '"
            f" WHEN ({conv}) % 97 = 13 AND ({t}) % 2 = 1"
            f"  AND {t} BETWEEN 7 AND 13 THEN 'retrying the tool call'"
            f" WHEN {t} < {k} THEN concat('SYS template ',"
            f"  cast(({conv}) % 1000 as string), ' turn ', cast({t} as string))"
            f" ELSE {uniq} END"
        ).alias("text"),
        F.expr(
            f"CASE WHEN {t} < {k} THEN NULL"
            f" WHEN ({t}) % 2 = 1 AND (({conv}) + {t}) % 5 = 0"
            " THEN 'search' END"
        ).alias("tool"),
        F.expr(
            "timestamp'2025-01-01 00:00:00' + make_interval(0,0,0,0,0,0,"
            f" cast(CASE WHEN ({conv}) % 89 = 17 AND {t} = 12"
            " THEN id - 3600 ELSE id END as bigint))"
        ).alias("ts"),
    )
    workdir = tempfile.mkdtemp(prefix="qs_transcur_scale_")
    src = os.path.join(workdir, "turns.parquet")
    turns.write.parquet(src)
    turns = spark.read.parquet(src)
    n_convs = n_turns // TURNS_PER_CONV

    # independent per-conversation expectations (pure id arithmetic)
    exp = spark.range(n_convs).select(
        F.expr("concat('c', lpad(cast(id as string), 13, '0'))").alias("conv_id"),
        F.expr("id % 1000").alias("tpl"),
        F.expr("cast(2 + (id DIV 1000) % 4 as bigint)").alias("exp_k"),
        F.expr("id % 97 = 13").alias("is_loop"),
        F.expr("id % 89 = 7").alias("has_empty"),
        F.expr("id % 89 = 11").alias("has_role_override"),
        F.expr("id % 89 = 17").alias("has_ts_reg"),
    )
    # sharers with K' >= K inside the template, via one template rollup
    kcounts = exp.groupBy("tpl").pivot(
        "exp_k", [2, 3, 4, 5]
    ).count().na.fill(0)
    kcounts = kcounts.select(
        "tpl",
        (F.col("2") + F.col("3") + F.col("4") + F.col("5")).alias("ge2"),
        (F.col("3") + F.col("4") + F.col("5")).alias("ge3"),
        (F.col("4") + F.col("5")).alias("ge4"),
        F.col("5").alias("ge5"),
    )
    exp = exp.join(kcounts, "tpl").withColumn(
        "exp_sharers",
        F.expr(
            "CASE exp_k WHEN 2 THEN ge2 WHEN 3 THEN ge3"
            " WHEN 4 THEN ge4 ELSE ge5 END"
        ).cast("long"),
    )

    # --- shared_prefix_depth (capped path) ---------------------------
    t0 = time.time()
    pref = shared_prefix_depth(turns, max_depth=8)
    bad_pref = pref.join(exp, "conv_id").filter(
        ~(
            (F.col("n_turns") == TURNS_PER_CONV)
            & (F.col("shared_depth") == F.col("exp_k"))
            & (F.col("n_sharers") == F.col("exp_sharers"))
        )
    ).count()
    n_out = pref.count()
    report(
        "shared_prefix_depth", time.time() - t0, n_turns, n_out,
        mismatches=bad_pref, convs=n_convs,
    )
    assert n_out == n_convs and bad_pref == 0, (n_out, bad_pref)

    # --- turn_loops ---------------------------------------------------
    t0 = time.time()
    loops = turn_loops(turns)
    exp_loops = exp.select(
        "conv_id",
        F.expr(
            "cast(CASE WHEN has_role_override THEN 7 ELSE 8 END as bigint)"
        ).alias("exp_seen"),
        F.expr(
            "cast(CASE WHEN is_loop AND has_role_override THEN 3"
            " WHEN is_loop THEN 4 ELSE 1 END as bigint)"
        ).alias("exp_max_run"),
        F.expr("cast(CASE WHEN is_loop THEN 1 ELSE 0 END as bigint)").alias(
            "exp_n_loops"
        ),
    )
    bad_loops = loops.join(exp_loops, "conv_id").filter(
        ~(
            (F.col("n_turns_seen") == F.col("exp_seen"))
            & (F.col("max_run") == F.col("exp_max_run"))
            & (F.col("n_loops") == F.col("exp_n_loops"))
            & (
                F.col("n_loop_turns")
                == F.when(F.col("exp_n_loops") > 0, F.col("exp_max_run"))
                .otherwise(0)
            )
        )
    ).count()
    n_out = loops.count()
    n_planted = exp.filter("is_loop").count()
    report(
        "turn_loops", time.time() - t0, n_turns, n_out,
        mismatches=bad_loops, planted_loop_convs=n_planted,
    )
    assert n_out == n_convs and bad_loops == 0, (n_out, bad_loops)

    # --- transcript_lint -----------------------------------------------
    t0 = time.time()
    lint = transcript_lint(turns)
    bad_lint = lint.join(exp, "conv_id").filter(
        ~(
            (F.col("n_turns") == TURNS_PER_CONV)
            & (F.col("n_empty_turns") == F.expr(
                "CASE WHEN has_empty THEN 1 ELSE 0 END"))
            & (F.col("n_role_repeats") == F.expr(
                "CASE WHEN has_role_override THEN 2 ELSE 0 END"))
            & (F.col("n_ts_regressions") == F.expr(
                "CASE WHEN has_ts_reg THEN 1 ELSE 0 END"))
            & (F.col("first_role") == "user")
            & (F.col("ok") == F.expr(
                "CASE WHEN has_empty OR has_role_override OR has_ts_reg"
                " THEN 0 ELSE 1 END"))
        )
    ).count()
    n_out = lint.count()
    n_hazard = exp.filter("has_empty OR has_role_override OR has_ts_reg").count()
    report(
        "transcript_lint", time.time() - t0, n_turns, n_out,
        mismatches=bad_lint, planted_hazard_convs=n_hazard,
    )
    assert n_out == n_convs and bad_lint == 0, (n_out, bad_lint)

    # --- curate_transcripts (composed gate) ----------------------------
    t0 = time.time()
    gate = curate_transcripts(
        turns, loop_run_limit=3, family_depth=2, per_family=2
    )
    g = gate.join(exp, "conv_id")
    hazard = "(has_empty OR has_role_override OR has_ts_reg)"
    bad_gate = g.filter(
        f"coalesce(reason = 'lint', false) != {hazard}"
        f" OR coalesce(reason = 'loop', false) != (is_loop AND NOT {hazard})"
        " OR reason = 'duplicate'"
        " OR (kept = 1) != (reason IS NULL)"
    ).count()
    per_tpl = g.groupBy("tpl").agg(
        F.sum("kept").alias("n_kept"), F.count(F.lit(1)).alias("n"),
    )
    bad_tpl = per_tpl.filter("n_kept != 2").count()
    n_tpl = per_tpl.count()
    n_out = gate.count()
    report(
        "curate_transcripts", time.time() - t0, n_turns, n_out,
        mismatches=bad_gate, bad_templates=bad_tpl, templates=n_tpl,
    )
    assert n_out == n_convs and bad_gate == 0 and bad_tpl == 0, (
        n_out, bad_gate, bad_tpl,
    )

    # --- divergence_pairs ----------------------------------------------
    t0 = time.time()
    pairs = divergence_pairs(turns, max_depth=8)
    ca = "cast(substring(conv_a, 2, 13) as bigint)"
    cb = "cast(substring(conv_b, 2, 13) as bigint)"
    ann = pairs.selectExpr(
        "conv_a", "conv_b", "shared_depth", "branch_a", "branch_b",
        f"({ca}) % 1000 as tpl_a", f"({cb}) % 1000 as tpl_b",
        f"2 + (({ca}) DIV 1000) % 4 as k_a",
        f"2 + (({cb}) DIV 1000) % 4 as k_b",
    ).selectExpr(
        "*",
        # exact rendered template continuation line at turn t = depth
        # (t <= 5 < every hazard turn; tool is NULL inside preambles)
        "concat('<|', CASE WHEN shared_depth % 2 = 0 THEN 'user'"
        " ELSE 'assistant' END, '|>', 'SYS template ',"
        " cast(tpl_a as string), ' turn ', cast(shared_depth as string))"
        " as tpl_line",
    )
    bad_pairs = ann.filter(
        "NOT (tpl_a = tpl_b AND conv_a < conv_b"
        " AND shared_depth = least(k_a, k_b)"
        " AND branch_a IS NOT NULL AND branch_b IS NOT NULL"
        " AND branch_a != branch_b"
        " AND (CASE WHEN k_a > shared_depth THEN branch_a = tpl_line"
        "      ELSE branch_a != tpl_line END)"
        " AND (CASE WHEN k_b > shared_depth THEN branch_b = tpl_line"
        "      ELSE branch_b != tpl_line END)"
        " AND NOT (branch_a = tpl_line AND branch_b = tpl_line))"
    ).count()
    groups = ann.groupBy("tpl_a", "shared_depth").count()
    n_groups = groups.count()
    over_cap = groups.filter(f"count > {32 * 31 // 2}").count()
    n_pairs = pairs.count()
    report(
        "divergence_pairs", time.time() - t0, n_turns, n_pairs,
        mismatches=bad_pairs, groups_covered=n_groups,
        groups_expected=4000, groups_over_cap=over_cap,
    )
    assert bad_pairs == 0 and over_cap == 0 and n_groups == 4000, (
        bad_pairs, over_cap, n_groups,
    )

    print(json.dumps({
        "total_sec": round(time.time() - t_all0, 2),
        "n_turns": n_turns, "n_convs": n_convs, "verdict": "ALL_EXACT",
    }))
    spark.stop()


if __name__ == "__main__":
    main()
