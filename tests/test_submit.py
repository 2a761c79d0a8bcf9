"""The north-star launch path: spark-submit --py-files with the
package zipped, building and searching through scripts/submit_job.py
in a REAL spark-submit process (not the test session)."""

from __future__ import annotations

import json
import os
import subprocess
import zipfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


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


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_build_and_search(tmp_path):
    from quickwit_spark.sources.transcripts import generate_transcripts

    src = str(tmp_path / "t.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            generate_transcripts(2000, seed=7), preserve_index=False
        ),
        src, coerce_timestamps="us",
    )
    zip_path = str(tmp_path / "qs.zip")
    _make_zip(zip_path)
    idx = str(tmp_path / "idx")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient

    def submit(*args):
        out = subprocess.run(
            [
                SPARK_SUBMIT, "--master", "local[4]",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.sql.session.timeZone=UTC",
                "--py-files", zip_path,
                os.path.join(REPO, "scripts", "submit_job.py"), *args,
            ],
            capture_output=True, text=True, timeout=600, env=env, cwd=str(tmp_path),
        )
        assert out.returncode == 0, out.stderr[-2000:]
        for line in reversed(out.stdout.strip().splitlines()):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
        raise AssertionError(f"no JSON line in output: {out.stdout[-500:]}")

    b = submit("build", "--src", src, "--index", idx, "--n-splits", "2")
    assert b["num_docs"] == 2000 and b["num_splits"] == 2

    s = submit("search", "--index", idx, "--query", "w00001 w00002", "-k", "3")
    assert s["num_hits"] > 0 and len(s["hits"]) == 3
    assert s["hits"][0]["score"] >= s["hits"][1]["score"]
    assert "text" in s["hits"][0]["doc"]
