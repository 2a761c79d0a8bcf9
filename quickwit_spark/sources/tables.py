"""Table source abstraction: the engine reads its input (and would, in
production, store split files) through this layer.

The north rule targets Iceberg tables of transcripts; this sandbox has
no Iceberg runtime jars, so:
* ``load_table(spark, "iceberg:<catalog.db.table>")`` uses the Iceberg
  DataSource when the runtime provides it (spark.jars.packages
  org.apache.iceberg:iceberg-spark-runtime-<ver> on a real cluster) —
  snapshot isolation, manifest min/max pruning and partition pruning
  then come for free (SURVEY.md §4 mapping);
* ``load_table(spark, "/path")`` reads Parquet — same columnar scans,
  footer-stats pruning instead of manifest pruning. All tests and the
  bench exercise this path.

The catalog/stats/lineage files in plans/catalog.py are the metastore
analog either way; on Iceberg they would live in a table with atomic
snapshot commits instead of the rename-committed JSON file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ICEBERG_PREFIX = "iceberg:"


def iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def load_table(spark, source: str) -> DataFrame:
    """Load a transcripts-shaped table from an Iceberg identifier
    (``iceberg:catalog.db.table``) or a Parquet path."""
    if source.startswith(ICEBERG_PREFIX):
        ident = source[len(ICEBERG_PREFIX):]
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; add "
                "org.apache.iceberg:iceberg-spark-runtime to spark.jars.packages"
            )
        return spark.read.format("iceberg").load(ident)
    return spark.read.parquet(source)
