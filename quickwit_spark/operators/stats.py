"""Index-level term statistics (global doc-freq per term).

The BM25 idf needs GLOBAL doc-freq; recomputing it per query was a
Spark job (~1s of latency). Instead we materialize Σ df per (field,
term) over the published split set at publish time — the analog of the
reference's hotcache/footer (quickwit-directories/src/hot_directory.rs:
everything needed to *open* the index precomputed at package time) —
and the query path does a driver-side Parquet-pushdown point read
(~ms). The file is named by the catalog's published-set version hash,
so a stale file is never used; queries fall back to the distributed
aggregation when it's missing.

Scale: term-stats is vocab-sized (millions of rows at 10^12 turns, a
few hundred MB) — written sorted by (field, term) so point lookups
touch one row group; refresh cost is one narrow aggregation over the
splits' (field, term, df) columns, run as a Spark job.
"""

from __future__ import annotations

import os

import pandas as pd

from quickwit_spark.functions import fs as fsio
from quickwit_spark.operators.build import POSTINGS_FILE
from quickwit_spark.plans.catalog import Catalog


DRIVER_REFRESH_MAX_SPLITS = 256


def refresh_term_stats(spark, catalog: Catalog) -> str | None:
    """Aggregate per-split df columns into the index-level stats file
    for the CURRENT published set. No-op if already current.

    Small split counts aggregate driver-side (pyarrow column-pruned
    reads + one pandas groupby — no Spark job on the build's critical
    path); large ones run the distributed aggregation."""
    out_path = catalog.term_stats_path()
    if fsio.exists(out_path):
        return out_path
    splits = catalog.published_splits()
    if not splits:
        return None

    if len(splits) <= DRIVER_REFRESH_MAX_SPLITS:
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow.parquet as pq

        import pyarrow as pa

        def read_one(s):
            return fsio.read_table(
                fsio.join(catalog.split_dir(s.split_id), POSTINGS_FILE),
                columns=["field", "term", "df"],
            )

        with ThreadPoolExecutor(max_workers=min(len(splits), 16)) as ex:
            tables = list(ex.map(read_one, splits))
        # aggregate in Arrow C++ (faster than pandas for many splits)
        merged = (
            pa.concat_tables(tables)
            .group_by(["field", "term"])
            .aggregate([("df", "sum")])
            .rename_columns(["field", "term", "df"])
            .sort_by([("field", "ascending"), ("term", "ascending")])
        )
        return _write_stats(merged.to_pandas(), out_path)

    rows = [(catalog.split_dir(s.split_id),) for s in splits]
    sdf = spark.createDataFrame(rows, "path string").repartition(
        min(len(rows), 64)
    )

    def read_dfs(iterator):
        import pyarrow.parquet as pq

        for pdf in iterator:
            out = []
            for path in pdf["path"]:
                t = fsio.read_table(
                    fsio.join(path, POSTINGS_FILE),
                    columns=["field", "term", "df"],
                )
                out.append(t.to_pandas())
            if out:
                yield pd.concat(out, ignore_index=True)

    agg = (
        sdf.mapInPandas(read_dfs, schema="field string, term string, df long")
        .groupBy("field", "term")
        .sum("df")
        .withColumnRenamed("sum(df)", "df")
        .sort("field", "term")
        .toPandas()
    )
    return _write_stats(agg, out_path)


def _write_stats(agg: pd.DataFrame, out_path: str) -> str:
    import pyarrow as pa

    fsio.makedirs(fsio.dirname(out_path))
    tbl = pa.Table.from_pandas(agg, preserve_index=False)
    if fsio.is_local(out_path):
        # local: write-then-rename so readers never see a torn file
        local = fsio.strip_local(out_path)
        tmp = local + ".tmp"
        fsio.write_table(tbl, tmp, compression="zstd", row_group_size=32768)
        os.replace(tmp, local)
    else:
        # object stores: a PUT is atomic at the object level
        fsio.write_table(tbl, out_path, compression="zstd", row_group_size=32768)
    return out_path


def carry_forward_term_stats(catalog: Catalog, old_version: str) -> bool:
    """Merges don't change global doc-freqs (Σ df is invariant under
    split concatenation), so the stats file survives a merge round
    verbatim — just republish it under the new version name."""
    old_path = fsio.join(
        catalog.index_dir, "term_stats", f"stats-{old_version}.parquet"
    )
    new_path = catalog.term_stats_path()
    if fsio.exists(new_path) or not fsio.exists(old_path):
        return fsio.exists(new_path)
    if fsio.is_local(new_path):
        local = fsio.strip_local(new_path)
        tmp = local + ".tmp"
        fsio.copy_file(old_path, tmp)
        os.replace(tmp, local)
    else:
        fsio.copy_file(old_path, new_path)
    return True


def lookup_term_stats(
    catalog: Catalog, terms: set[tuple[str, str]]
) -> dict[tuple[str, str], int] | None:
    """Driver-side pushdown point read of global dfs; None if the stats
    file for the current published set doesn't exist."""
    path = catalog.term_stats_path()
    if not fsio.exists(path):
        return None
    from quickwit_spark.functions.parquet_io import read_pruned

    term_values = sorted({t for _, t in terms})
    tbl = read_pruned(path, None, "term", term_values)
    found: dict[tuple[str, str], int] = {}
    for f, t, df in zip(
        tbl.column("field").to_pylist(),
        tbl.column("term").to_pylist(),
        tbl.column("df").to_pylist(),
    ):
        found[(f, t)] = int(df)
    return {t: found.get(t, 0) for t in terms}
