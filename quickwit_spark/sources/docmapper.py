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

import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# reference-exact field-name rule (default_doc_mapper/mod.rs:39):
# starts with an ASCII letter; letters/digits/`_`/`.`/`-`; <= 255 chars
FIELD_MAPPING_NAME_PATTERN = r"^[a-zA-Z][_\.\-a-zA-Z0-9]{0,254}$"


def validate_field_mapping_name(name: str) -> None:
    """Reject invalid mapping names with the reference's exact error
    strings (default_doc_mapper/mod.rs:51-83; leading `_` covers the
    reserved names like ``_source``/``_dynamic``)."""
    if re.match(FIELD_MAPPING_NAME_PATTERN, name):
        return
    if not name:
        raise ValueError("Field name is empty.")
    if name.startswith("_"):
        raise ValueError(f"Field name `{name}` may not start by _")
    if len(name) > 255:
        raise ValueError(
            f"Field name `{name}` is too long. Field names must not be "
            "longer than 255 characters."
        )
    first = name[0]
    if not ("a" <= first <= "z" or "A" <= first <= "Z") and first != "_":
        raise ValueError(
            f"Field name `{name}` is invalid. Field names must start with "
            "an uppercase or lowercase ASCII letter, or an underscore `_`."
        )
    raise ValueError(
        f"Field name `{name}` contains illegal characters. Field names "
        "must only contain uppercase and lowercase ASCII letters, digits, "
        "hyphens `-`, periods `.`, and underscores `_`."
    )


# --- generic mapping tree (field_mapping_entry.rs:250-299 analog) ----------

@dataclass(frozen=True)
class FieldMapping:
    """One mapped leaf/node of the document tree.

    type: 'text' | 'i32' | 'i64' | 'f64' | 'bool' | 'datetime'
          | 'bytes' (base64 in the JSON, binary column out —
            field_mapping_entry.rs BytesOptions)
          | 'json'  (kept as a raw JSON string column)
          | 'object' (nested struct; children in ``fields`` —
            mapping_tree.rs:302-345)
          | 'array<T>' for any scalar T above.
    ``required`` marks fields whose absence rejects the doc
    (missing_field counters, indexer.rs:52-78).
    """

    name: str
    type: str = "text"
    required: bool = False
    fields: tuple = ()  # sub-mappings for type == 'object'


@dataclass(frozen=True)
class DocMapping:
    """Ordered field mappings + datetime handling for one source —
    the DocMapper schema the JSON mapper is built from (the reference's
    doc_mapping index-config section, default_mapper.rs:64-84)."""

    fields: tuple = ()
    ts_field: str | None = None  # coerced through the datetime parser


_SCALAR_TYPES = {
    "text": T.StringType(),
    "i32": T.IntegerType(),
    "i64": T.LongType(),
    "f64": T.DoubleType(),
    "bool": T.BooleanType(),
    # parsed from the raw string post-hoc (multi-format coalesce):
    "datetime": T.StringType(),
    # base64 in the JSON; decoded to binary post-parse:
    "bytes": T.StringType(),
    "json": T.StringType(),
}


def _spark_type(fm: FieldMapping) -> T.DataType:
    t = fm.type
    if t == "object":
        return T.StructType([_schema_field(c) for c in fm.fields])
    if t.startswith("array<") and t.endswith(">"):
        inner = t[6:-1]
        if inner not in _SCALAR_TYPES:
            raise ValueError(f"unsupported array element type {inner!r}")
        return T.ArrayType(_SCALAR_TYPES[inner])
    if t in _SCALAR_TYPES:
        return _SCALAR_TYPES[t]
    raise ValueError(f"unsupported field type {t!r} for {fm.name!r}")


def _schema_field(fm: FieldMapping) -> T.StructField:
    validate_field_mapping_name(fm.name)
    return T.StructField(fm.name, _spark_type(fm))


def mapping_schema(mapping: DocMapping) -> T.StructType:
    """The from_json schema for a mapping tree."""
    return T.StructType([_schema_field(f) for f in mapping.fields])


TRANSCRIPT_MAPPING = DocMapping(
    fields=(
        FieldMapping("conv_id", "text", required=True),
        FieldMapping("turn_idx", "i32", required=True),
        FieldMapping("role", "text"),
        FieldMapping("text", "text", required=True),
        FieldMapping("tool", "text"),
        FieldMapping("ts", "datetime"),
    ),
    ts_field="ts",
)

TRANSCRIPT_SCHEMA = mapping_schema(TRANSCRIPT_MAPPING)

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
    # rfc2822 ("Tue, 1 Jul 2003 10:52:37 +0200"): Spark's non-legacy
    # parser has no day-name pattern, so strip the "EEE, " prefix and
    # reuse the "d MMM yyyy HH:mm:ss Z" format (date_time_type.rs
    # Rfc2822 — the reference parses it natively)
    rfc2822 = F.try_to_timestamp(
        F.regexp_replace(col, r"^[A-Za-z]{3},\s*", ""),
        F.lit("d MMM yyyy HH:mm:ss Z"),
    )
    return F.coalesce(*attempts, rfc2822, numeric)


# strict padded base64 (the reference's base64::decode;
# test_parse_bytes_invalid_base64): Spark's unbase64 silently mangles
# invalid input (or raises under ANSI), so gate it behind a validity
# check and surface a value_error instead
_B64_PATTERN = (
    r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"
)


def _b64_decode(col):
    return F.when(col.rlike(_B64_PATTERN), F.unbase64(col))


def _scalar_from_raw(raw, inner, ts_formats, ts_precision):
    """Convert ONE raw scalar string (from the map-typed parse) to the
    leaf type — the cardinality-lenient path that accepts a scalar for
    a multivalued field (mapping_tree cardinality MultiValues;
    test_parse_i64_mutivalued_accepts_scalar)."""
    if inner == "datetime":
        return _ts_expr(raw, ts_formats, ts_precision)
    if inner == "bytes":
        return _b64_decode(raw)
    if inner == "text":
        return raw
    return raw.try_cast(_SCALAR_TYPES[inner])


def _output_col(fm: FieldMapping, ts_formats, ts_precision):
    """Top-level output column with type coercion: datetime through the
    multi-format parser, bytes through base64 decode (including
    array<...> variants); array<T> leaves also accept a bare scalar
    (wrapped into a singleton — reference cardinality semantics).
    Nested (object) datetime/bytes leaves stay as parsed strings —
    coerce them downstream if needed."""
    col = F.col(f"_doc.{fm.name}")
    if fm.type == "datetime":
        return _ts_expr(col, ts_formats, ts_precision).alias(fm.name)
    if fm.type == "bytes":
        return _b64_decode(col).alias(fm.name)
    if fm.type.startswith("array<"):
        inner = fm.type[6:-1]
        if inner == "datetime":
            parsed = F.transform(col, lambda c: _ts_expr(c, ts_formats, ts_precision))
        elif inner == "bytes":
            parsed = F.transform(col, _b64_decode)
        else:
            parsed = col
        raw_v = F.col("_map").getItem(fm.name)
        conv = _scalar_from_raw(raw_v, inner, ts_formats, ts_precision)
        singleton = F.when(
            ~raw_v.rlike(r"^\s*[\[{]") & conv.isNotNull(), F.array(conv)
        )
        return F.coalesce(parsed, singleton).alias(fm.name)
    return col.alias(fm.name)


def map_docs(
    df_raw: DataFrame,
    mapping: DocMapping,
    mode: str = "lenient",
    store_source: bool = False,
    ts_formats=DEFAULT_TS_FORMATS,
    ts_precision: str | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Map a DataFrame of raw JSON lines (column ``value``) into typed
    rows of ``mapping``'s tree + ``_error``/``_dynamic``/``_source``
    columns — the generic DocMapper (default_mapper.rs:441-475 +
    mapping_tree.rs:361-393) as ONE declarative Catalyst plan."""
    if mode not in ("lenient", "strict", "dynamic"):
        raise ValueError(f"unknown mapping mode {mode!r}")
    schema = mapping_schema(mapping)
    raw = F.col(value_col)
    parsed = F.from_json(raw, schema)
    # full parse into a map to detect unmapped top-level fields
    asmap = F.from_json(raw, T.MapType(T.StringType(), T.StringType()))
    known = F.array(*[F.lit(f.name) for f in schema.fields])
    extra_keys = F.array_except(F.map_keys(asmap), known)

    out = df_raw.select(
        raw.alias("_raw"),
        parsed.alias("_doc"),
        asmap.alias("_map"),
        extra_keys.alias("_extra"),
    )
    outputs = {
        fm.name: _output_col(fm, ts_formats, ts_precision)
        for fm in mapping.fields
    }
    # error precedence mirrors the mapper walk (DocParsingError,
    # error.rs:37-53): NotJsonObject > per-field required-missing /
    # MultiValuesNotSupported / ValueError in mapping order >
    # NoSuchFieldInSchema (strict). An explicit JSON null counts as
    # absent (test_parse_null_is_just_ignored) — missing for required
    # fields, ignored otherwise.
    err = F.when(F.col("_map").isNull(), F.lit("parse_error"))
    for fm in mapping.fields:
        raw_v = F.col("_map").getItem(fm.name)
        if fm.required:
            err = err.when(
                raw_v.isNull(), F.lit(f"missing_field:{fm.name}")
            )
        if fm.type in ("object", "json", "text"):
            # nested/raw-json leaves stay best-effort; text accepts any
            # scalar (from_json stringifies JSON atoms AND nested values
            # into string fields — flagging a leading '[' would reject
            # legitimate text like "[INFO] ...", so text stays lenient)
            continue
        is_array = fm.type.startswith("array<")
        if not is_array:
            err = err.when(
                raw_v.isNotNull() & raw_v.rlike(r"^\s*\["),
                F.lit(f"multi_values_not_supported:{fm.name}"),
            )
        bad = outputs[fm.name].isNull()
        if is_array:
            # nested arrays / uncoercible elements (including explicit
            # null elements) are ValueErrors, not silent nulls
            bad = bad | F.exists(outputs[fm.name], lambda x: x.isNull())
        err = err.when(
            raw_v.isNotNull() & bad, F.lit(f"value_error:{fm.name}")
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
    cols = list(outputs.values())
    cols.append(F.col("_error"))
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


def map_json_docs(
    df_raw: DataFrame,
    mode: str = "lenient",
    store_source: bool = False,
    ts_formats=DEFAULT_TS_FORMATS,
    ts_precision: str | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Transcript-schema convenience wrapper over :func:`map_docs`."""
    return map_docs(
        df_raw, TRANSCRIPT_MAPPING, mode, store_source,
        ts_formats, ts_precision, value_col,
    )


def split_valid(mapped: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid docs ready to index, rejected docs with _error) — the
    Indexer's valid/parse_error/missing_field counters come from
    ``rejected.groupBy("_error").count()``."""
    valid = mapped.where(F.col("_error").isNull()).drop("_error")
    rejected = mapped.where(F.col("_error").isNotNull())
    return valid, rejected


def doc_to_json(df: DataFrame, mapping: DocMapping = TRANSCRIPT_MAPPING) -> DataFrame:
    """Inverse projection: typed rows → user-facing JSON (rfc3339
    datetimes, base64 bytes) under column ``json``
    (default_mapper.rs:477-495)."""
    entries = []
    for fm in mapping.fields:
        if fm.type == "datetime":
            entries.append(
                F.date_format(fm.name, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").alias(fm.name)
            )
        elif fm.type == "bytes":
            entries.append(F.base64(F.col(fm.name)).alias(fm.name))
        elif fm.type == "array<bytes>":
            entries.append(
                F.transform(F.col(fm.name), F.base64).alias(fm.name)
            )
        else:
            entries.append(F.col(fm.name))
    return df.select(F.to_json(F.struct(*entries)).alias("json"))


def read_json_lines(spark, path: str) -> DataFrame:
    """FileSource analog (quickwit-indexing/src/source/file_source.rs:48):
    newline-delimited JSON, one doc per line; batch or streaming
    (`spark.readStream.text` + the same map_json_docs plan)."""
    return spark.read.text(path).withColumnRenamed("value", "value")
