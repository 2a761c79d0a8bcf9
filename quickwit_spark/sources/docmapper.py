"""Document mapping: JSON lines → typed transcript rows.

The analog of the reference's DocMapper layer
(quickwit-doc-mapper/src/default_doc_mapper/default_mapper.rs:441-475 +
mapping_tree.rs:361-393): parse a JSON doc, walk the field mappings,
coerce leaf types, route unmapped fields per the mode, and count
parse errors — all as ONE declarative Spark plan (from_json +
coalesce(to_timestamp...) + struct ops; Catalyst, no UDFs).

Supported semantics:
* modes (default_mapper.rs:64-84): ``lenient`` drops unmapped fields,
  ``strict`` marks docs with unmapped fields as errors
  (NoSuchFieldInSchema, mapping_tree.rs:384-388), ``dynamic`` routes
  them into a ``_dynamic`` JSON column (mapping_tree.rs:379-383);
* multi-format datetime parsing (date_time_type.rs:76-112): each
  configured format is tried in order via ``coalesce``; numbers are
  unix timestamps at the configured precision;
* ``store_source`` keeps the raw line under ``_source``
  (default_mapper.rs:296-300);
* invalid docs are not dropped silently: ``_error`` carries the reason
  and ``split_valid`` partitions the result (the Indexer's
  parse_errors/missing_fields counters, indexer.rs:52-78).

Round-trip: ``doc_to_json`` rebuilds the user-facing JSON
(default_mapper.rs:477-495).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.StringType()),  # raw; coerced below
    ]
)

# rfc3339 / iso8601 / strftime patterns, tried in order
# (quickwit-doc-mapper/src/default_doc_mapper/date_time_type.rs:39-60).
# rfc2822's "EEE, " day-name needs Spark's LEGACY time parser; supply a
# custom ``ts_formats`` (plus a regexp_replace preprocessing of the
# day name) if an rfc2822 feed shows up.
DEFAULT_TS_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]XXX",
    "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]",
    "yyyy-MM-dd HH:mm:ss",
    "d MMM yyyy HH:mm:ss Z",
    "yyyy/MM/dd HH:mm:ss",
)


def _ts_expr(col, formats=DEFAULT_TS_FORMATS, precision: str | None = None):
    """coalesce over configured formats, then a numeric-epoch fallback:
    either at an explicit precision (unix_ts_{secs,millis,micros},
    date_time_type.rs:164-211) or, when None, inferred by magnitude."""
    attempts = [F.try_to_timestamp(col, F.lit(f)) for f in formats]
    num = col.cast("decimal(20,0)")
    if precision is not None:
        mult = {"secs": 1_000_000, "millis": 1_000, "micros": 1}[precision]
        micros = num * mult
    else:
        micros = (
            F.when(num < 100_000_000_000, num * 1_000_000)      # seconds
            .when(num < 100_000_000_000_000, num * 1_000)        # millis
            .otherwise(num)                                      # micros
        )
    numeric = F.when(
        col.rlike(r"^\d+$"), F.timestamp_micros(micros.cast("long"))
    )
    return F.coalesce(*attempts, numeric)


def map_json_docs(
    df_raw: DataFrame,
    mode: str = "lenient",
    store_source: bool = False,
    ts_formats=DEFAULT_TS_FORMATS,
    ts_precision: str | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Map a DataFrame of raw JSON lines (column ``value``) into typed
    transcript rows + ``_error``/``_dynamic``/``_source`` columns."""
    if mode not in ("lenient", "strict", "dynamic"):
        raise ValueError(f"unknown mapping mode {mode!r}")
    raw = F.col(value_col)
    parsed = F.from_json(raw, TRANSCRIPT_SCHEMA)
    # full parse into a map to detect unmapped fields
    asmap = F.from_json(raw, T.MapType(T.StringType(), T.StringType()))
    known = F.array(*[F.lit(f.name) for f in TRANSCRIPT_SCHEMA.fields])
    extra_keys = F.array_except(F.map_keys(asmap), known)

    out = df_raw.select(
        raw.alias("_raw"),
        parsed.alias("_doc"),
        asmap.alias("_map"),
        extra_keys.alias("_extra"),
    )
    err = (
        F.when(F.col("_map").isNull(), F.lit("parse_error"))
        .when(F.col("_doc.conv_id").isNull(), F.lit("missing_field:conv_id"))
        .when(F.col("_doc.turn_idx").isNull(), F.lit("missing_field:turn_idx"))
        .when(F.col("_doc.text").isNull(), F.lit("missing_field:text"))
    )
    if mode == "strict":
        err = F.coalesce(
            err,
            F.when(
                F.size("_extra") > 0,
                F.concat(F.lit("no_such_field:"), F.array_join("_extra", ",")),
            ),
        )
    out = out.withColumn("_error", err)
    cols = [
        F.col("_doc.conv_id").alias("conv_id"),
        F.col("_doc.turn_idx").alias("turn_idx"),
        F.col("_doc.role").alias("role"),
        F.col("_doc.text").alias("text"),
        F.col("_doc.tool").alias("tool"),
        _ts_expr(F.col("_doc.ts"), ts_formats, ts_precision).alias("ts"),
        F.col("_error"),
    ]
    if mode == "dynamic":
        cols.append(
            F.when(
                F.size("_extra") > 0,
                F.to_json(
                    F.map_filter(
                        F.col("_map"), lambda k, _: F.array_contains(F.col("_extra"), k)
                    )
                ),
            ).alias("_dynamic")
        )
    if store_source:
        cols.append(F.col("_raw").alias("_source"))
    return out.select(*cols)


def split_valid(mapped: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid docs ready to index, rejected docs with _error) — the
    Indexer's valid/parse_error/missing_field counters come from
    ``rejected.groupBy("_error").count()``."""
    valid = mapped.where(F.col("_error").isNull()).drop("_error")
    rejected = mapped.where(F.col("_error").isNotNull())
    return valid, rejected


def doc_to_json(df: DataFrame) -> DataFrame:
    """Inverse projection: typed rows → user-facing JSON (rfc3339 ts)
    under column ``json`` (default_mapper.rs:477-495)."""
    return df.select(
        F.to_json(
            F.struct(
                F.col("conv_id"),
                F.col("turn_idx"),
                F.col("role"),
                F.col("text"),
                F.col("tool"),
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").alias("ts"),
            )
        ).alias("json")
    )


def read_json_lines(spark, path: str) -> DataFrame:
    """FileSource analog (quickwit-indexing/src/source/file_source.rs:48):
    newline-delimited JSON, one doc per line; batch or streaming
    (`spark.readStream.text` + the same map_json_docs plan)."""
    return spark.read.text(path).withColumnRenamed("value", "value")
