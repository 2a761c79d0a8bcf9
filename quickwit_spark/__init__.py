"""quickwit_spark — a PySpark-native inverted-index build + BM25 top-k
search engine with the query/data-processing capabilities of Quickwit
(reference: tshepang/quickwit, surveyed in SURVEY.md).

Not a port: Quickwit's actor pipeline / gRPC fan-out / custom storage
directories are replaced by Spark's scheduler, shuffle, and columnar
Parquet I/O.  The custom pieces (see SURVEY.md §4) are:

* vectorized tokenization + delta+varint posting-list encoding
  (``quickwit_spark.functions``),
* a BM25 + boolean/phrase + block-max-WAND query kernel expressed as
  ``applyInPandas`` over co-partitioned postings
  (``quickwit_spark.operators.search``),
* a split catalog with Staged→Published state machine, lineage rows and
  a log-level merge planner (``quickwit_spark.plans``),
* driver-side split pruning by time range / tags / term range.
"""

from quickwit_spark.config import IndexConfig, FieldConfig
from quickwit_spark.session import get_spark

__all__ = ["IndexConfig", "FieldConfig", "get_spark"]
__version__ = "0.1.0"
