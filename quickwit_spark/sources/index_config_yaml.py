"""Load the reference's index-config YAML format.

Translates the schema documented in docs/configuration/index-config.md
(shipped examples: quickwit-config/resources/tests/index_config/*.yaml)
into this engine's objects, so an existing deployment's YAML works
as-is:

* ``doc_mapping.field_mappings``  -> :class:`DocMapping` (typed ndjson
  ingest through the generic mapper) + text/tag ``FieldConfig`` entries
  for the inverted index,
* ``indexing_settings`` (timestamp/sort/demux fields, merge_policy,
  split_num_docs_target) -> :class:`IndexConfig` knobs,
* ``search_settings.default_search_fields`` -> the default query field
  (the full list is returned for per-request ``search_field`` use),
* ``sources``                    -> catalog source configs.

Divergences (documented, not silent): ``u64`` maps to i64 (Spark has no
unsigned 64-bit type; values above 2^63-1 are rejected by the mapper),
non-text tag fields get an implicit raw-tokenizer index entry (our tag
pruning works on whole string values, which is also how the reference
stores numeric tags in split metadata), and per-field ``fast``/
``stored`` flags are accepted but ignored — every mapped column is
stored, and numeric columns are always fast (columnar parquet).
"""

from __future__ import annotations

import os

from quickwit_spark.config import FieldConfig, IndexConfig
from quickwit_spark.sources.docmapper import DocMapping, FieldMapping

# reference type -> our DocMapping leaf type
_TYPE_MAP = {
    "text": "text",
    "i64": "i64",
    "u64": "i64",
    "i32": "i32",
    "f64": "f64",
    "bool": "bool",
    "datetime": "datetime",
    "date": "datetime",
    "bytes": "bytes",
    "binary": "bytes",
    "json": "json",
    "object": "object",
}


def _field_mapping(d: dict) -> FieldMapping:
    t_ref = d.get("type", "text")
    if t_ref.startswith("array<") and t_ref.endswith(">"):
        inner = _TYPE_MAP.get(t_ref[6:-1])
        if inner is None or inner == "object":
            raise ValueError(f"unsupported array element type in {t_ref!r}")
        t = f"array<{inner}>"
    else:
        t = _TYPE_MAP.get(t_ref)
        if t is None:
            raise ValueError(
                f"unsupported field type {t_ref!r} for {d.get('name')!r}"
            )
    children = (
        tuple(_field_mapping(c) for c in d.get("field_mappings", ()) or ())
        if t == "object"
        else ()
    )
    return FieldMapping(
        d["name"], t, required=bool(d.get("required", False)), fields=children
    )


def load_reference_index_config(
    source: str,
    doc_key_fields: tuple | None = None,
    routing_field: str | None = None,
) -> dict:
    """Parse a reference index-config YAML (file path or YAML text).

    Returns ``{"index_id", "index_uri", "config": IndexConfig,
    "doc_mapping": DocMapping, "mode", "default_search_fields",
    "sources"}``.

    ``doc_key_fields`` / ``routing_field`` override the stable-order
    keys (the reference has no doc-key concept — it uses append order);
    they default to ``indexing_settings.sort_field`` then the timestamp
    field.
    """
    import yaml

    text = source
    if "\n" not in source and os.path.exists(source):
        with open(source) as f:
            text = f.read()
    y = yaml.safe_load(text) or {}
    dm = y.get("doc_mapping", {}) or {}
    idx_set = y.get("indexing_settings", {}) or {}
    search_set = y.get("search_settings", {}) or {}

    raw_fields = dm.get("field_mappings", []) or []
    mapping_fields = tuple(_field_mapping(d) for d in raw_fields)
    ts_field = idx_set.get("timestamp_field") or dm.get("timestamp_field")
    mapping = DocMapping(fields=mapping_fields, ts_field=ts_field)

    # index entries: top-level text fields keep their tokenizer/record;
    # tag fields that are not text get an implicit raw entry
    fields: list[FieldConfig] = []
    for d in raw_fields:
        if d.get("type", "text") == "text":
            fields.append(
                FieldConfig(
                    d["name"],
                    tokenizer=d.get("tokenizer", "default"),
                    record=d.get("record", "freq"),
                )
            )
    tag_fields = tuple(dm.get("tag_fields", []) or [])
    names = {f.name for f in fields}
    for t in tag_fields:
        if t not in names:
            fields.append(FieldConfig(t, tokenizer="raw", record="basic"))

    # mode=dynamic: index the `_dynamic` catch-all json field with the
    # dynamic_mapping tokenizer (default_mapper_builder.rs:111 —
    # QuickwitJsonOptions default tokenizer is `default`) so unknown
    # `field:value` queries resolve into it
    dynamic_field = None
    if dm.get("mode") == "dynamic":
        dyn = dm.get("dynamic_mapping", {}) or {}
        if dyn.get("indexed", True):
            tok = "json_raw" if dyn.get("tokenizer", "default") == "raw" else "json"
            fields.append(FieldConfig("_dynamic", tokenizer=tok, record="basic"))
            dynamic_field = "_dynamic"

    defaults = list(search_set.get("default_search_fields", []) or [])
    default_field = defaults[0] if defaults else None
    if default_field is None:
        text_fields = [f.name for f in fields]
        if not text_fields:
            raise ValueError(
                "index config defines no text field and no "
                "default_search_fields — nothing to search"
            )
        default_field = text_fields[0]

    sort_field = idx_set.get("sort_field")
    keys = tuple(doc_key_fields or ())
    if not keys:
        if sort_field:
            keys = (sort_field,)
        elif ts_field:
            keys = (ts_field,)
        else:
            raise ValueError(
                "cannot derive stable doc-key fields: pass doc_key_fields= "
                "or set indexing_settings.sort_field / timestamp_field"
            )
    demux_field = idx_set.get("demux_field")
    routing = routing_field or demux_field or keys[0]

    merge = idx_set.get("merge_policy", {}) or {}
    kwargs: dict = {
        "fields": tuple(fields),
        "default_search_field": default_field,
        # the reference's default_search_fields is a LIST — keep every
        # member for query parsing (unqualified terms search them all)
        "default_search_fields": tuple(defaults) if len(defaults) > 1 else None,
        "dynamic_field": dynamic_field,
        "tag_fields": tag_fields,
        "doc_key_fields": keys,
        "routing_field": routing,
    }
    if ts_field:
        kwargs["timestamp_field"] = ts_field
    if idx_set.get("split_num_docs_target"):
        kwargs["split_num_docs_target"] = int(idx_set["split_num_docs_target"])
    if merge.get("merge_factor"):
        kwargs["merge_factor"] = int(merge["merge_factor"])
    if merge.get("max_merge_factor"):
        kwargs["max_merge_factor"] = int(merge["max_merge_factor"])
    if merge.get("demux_factor"):
        kwargs["demux_factor"] = int(merge["demux_factor"])
    if demux_field:
        kwargs["demux_field"] = demux_field
        kwargs["demux_enabled"] = True

    config = IndexConfig(**kwargs).validate()
    return {
        "index_id": y.get("index_id"),
        "index_uri": y.get("index_uri"),
        "config": config,
        "doc_mapping": mapping,
        "mode": dm.get("mode", "lenient"),
        "store_source": bool(dm.get("store_source", False)),
        "default_search_fields": defaults or [default_field],
        "sources": list(y.get("sources", []) or []),
    }


def mapping_to_dict(mapping: DocMapping) -> dict:
    """JSON-serializable form of a DocMapping (for catalog persistence)."""

    def fm(f: FieldMapping) -> dict:
        d = {"name": f.name, "type": f.type}
        if f.required:
            d["required"] = True
        if f.fields:
            d["fields"] = [fm(c) for c in f.fields]
        return d

    return {
        "fields": [fm(f) for f in mapping.fields],
        "ts_field": mapping.ts_field,
    }


def mapping_from_dict(d: dict) -> DocMapping:
    def fm(x: dict) -> FieldMapping:
        return FieldMapping(
            x["name"], x.get("type", "text"),
            required=bool(x.get("required", False)),
            fields=tuple(fm(c) for c in x.get("fields", ()) or ()),
        )

    return DocMapping(
        fields=tuple(fm(x) for x in d.get("fields", ()) or ()),
        ts_field=d.get("ts_field"),
    )


def _parse_bytes(v) -> int:
    """'10G' / '512M' / '1T' -> bytes (binary units, like the
    reference's byte-unit sizes); bare ints pass through."""
    if isinstance(v, (int, float)):
        return int(v)
    s = str(v).strip().upper()
    units = {"K": 1 << 10, "M": 1 << 20, "G": 1 << 30, "T": 1 << 40}
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


def load_node_config(source: str) -> dict:
    """Parse a reference node-config YAML (docs/configuration/
    node-config.md; shipped example quickwit-config/resources/tests/
    config/quickwit.yaml) into what the single-process REST service
    needs: ``rest_listen_port``, ``data_dir`` (indexes are served from
    ``data_dir/indexes/*`` or ``data_dir/*``), and
    ``searcher.fast_field_cache_capacity`` (applied to the per-process
    fast-field cache). Cluster/gossip/gRPC/metastore keys are accepted
    and ignored — scheduling and membership are Spark's job here
    (SURVEY §2.9)."""
    import yaml

    text = source
    if "\n" not in source and os.path.exists(source):
        with open(source) as f:
            text = f.read()
    y = yaml.safe_load(text) or {}
    searcher = y.get("searcher", {}) or {}
    out = {
        "rest_listen_port": int(y.get("rest_listen_port", 7280)),
        "data_dir": y.get("data_dir"),
        "fast_field_cache_bytes": (
            _parse_bytes(searcher["fast_field_cache_capacity"])
            if "fast_field_cache_capacity" in searcher
            else None
        ),
    }
    return out
