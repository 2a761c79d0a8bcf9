"""Index configuration — the analog of Quickwit's ``DocMapping`` +
``IndexingSettings`` (reference: quickwit-config/src/index_config.rs:45-58,
quickwit-doc-mapper/src/default_doc_mapper/field_mapping_entry.rs:250-299).

Only the pieces the transcript engine needs: text fields with a tokenizer
and an optional position record, a timestamp fast field, tag fields for
split pruning, and the build/merge knobs whose defaults mirror the
reference's pinned constants (BASELINE.md §a).
"""

from __future__ import annotations

from dataclasses import dataclass, fields as _dc_fields


@dataclass(frozen=True)
class FieldConfig:
    """One indexed field (reference: field_mapping_entry.rs:117-134).

    tokenizer: 'default' (simple split + lowercase + drop >40 chars),
               'raw' (whole value, drop >100 chars, no lowercasing —
               quickwit-doc-mapper/src/tokenizers.rs:23-29), or 'en_stem'.
    record:    'basic' (docids), 'freq' (+term freqs), 'position'
               (+token positions, required for phrase queries).
    """

    name: str
    tokenizer: str = "default"
    record: str = "freq"

    @property
    def with_positions(self) -> bool:
        return self.record == "position"


# Default field mapping for the transcripts table (BASELINE.json input_hint):
# (conv_id string, turn_idx int, role string, text string, tool string, ts ts)
TRANSCRIPT_FIELDS = (
    FieldConfig("text", tokenizer="default", record="position"),
    FieldConfig("role", tokenizer="raw", record="basic"),
    FieldConfig("tool", tokenizer="raw", record="basic"),
)


@dataclass(frozen=True)
class IndexConfig:
    """Build + query configuration for one index.

    Defaults mirror the reference where a constant exists:
    * split_num_docs_target=10M (index_config.rs:180-182) — scaled down
      by callers for tests.
    * merge_factor=10 / max_merge_factor=12 (index_config.rs:114-120).
    * min_level_num_docs=100k (merge_policy.rs:165-175).
    * max tag values per field = 1000 (packager.rs:36-43).
    * default field for unqualified query terms = 'text'.
    """

    fields: tuple[FieldConfig, ...] = TRANSCRIPT_FIELDS
    # None = the index declares no default search field: unqualified
    # query terms are rejected at parse time with the reference's
    # "No default field declared and no field specified in query."
    # (query_builder.rs:45-52). Indexing still requires one (our BM25
    # doc length is the default field's token count — build_index
    # guards this loudly).
    default_search_field: str | None = "text"
    # Optional MULTI-field default list for query parsing (the
    # reference's search_settings.default_search_fields is a list —
    # unqualified terms search every member, scored as the boolean
    # should-sum). None → (default_search_field,). BM25 doc length
    # stays anchored on default_search_field.
    default_search_fields: tuple[str, ...] | None = None
    # mode=dynamic catch-all (lib.rs DYNAMIC_FIELD_NAME '_dynamic'):
    # names a json/json_raw field; `unknown_field:value` queries
    # resolve as json paths into it instead of erroring
    # (default_mapper.rs:497-509 appends the dynamic field to the
    # tantivy default fields; tests.rs test_search_dynamic_mode).
    # Unqualified terms do NOT search it (a pathless term has no json
    # token to look up — divergence documented).
    dynamic_field: str | None = None
    timestamp_field: str = "ts"
    tag_fields: tuple[str, ...] = ("tool",)
    doc_key_fields: tuple[str, ...] = ("conv_id", "turn_idx")
    routing_field: str = "conv_id"

    # build knobs
    split_num_docs_target: int = 10_000_000
    block_size: int = 128          # docs per block-max WAND block
    hot_term_doc_freq: int = 100_000   # salt terms with df above this
    salt_docid_range: int = 65_536     # docid span per salted posting shard
    max_tag_values: int = 1000

    # merge knobs
    merge_factor: int = 10
    max_merge_factor: int = 12
    min_level_num_docs: int = 100_000

    # demux knobs (merge_policy.rs demux gate; index_config.rs:110-112)
    demux_enabled: bool = False
    demux_factor: int = 6
    demux_field: str | None = None

    # BM25 (Lucene/tantivy constants)
    k1: float = 1.2
    b: float = 0.75

    def validate(self) -> "IndexConfig":
        """Schema sanity rules mirroring the reference's DocMapper
        validation (default_mapper.rs:140-230): tag fields must exist
        and use the raw tokenizer; the default search field, routing
        field and doc keys must be consistent."""
        names = {f.name for f in self.fields}
        if (
            self.default_search_field is not None
            and self.default_search_field not in names
        ):
            raise ValueError(
                f"default_search_field {self.default_search_field!r} is not an indexed field"
            )
        for f in self.default_search_fields or ():
            if f not in names:
                raise ValueError(
                    f"default_search_fields member {f!r} is not an indexed field"
                )
        if self.dynamic_field is not None:
            if self.dynamic_field not in names:
                raise ValueError(
                    f"dynamic_field {self.dynamic_field!r} is not an indexed field"
                )
            if self.field(self.dynamic_field).tokenizer not in ("json", "json_raw"):
                raise ValueError(
                    f"dynamic_field {self.dynamic_field!r} must use a json tokenizer"
                )
        for t in self.tag_fields:
            if t not in names:
                raise ValueError(f"tag field {t!r} is not an indexed field")
            if self.field(t).tokenizer != "raw":
                # tag values are whole strings (default_mapper.rs:140-165)
                raise ValueError(f"tag field {t!r} must use the raw tokenizer")
        for f in self.fields:
            if f.tokenizer in ("json", "json_raw") and f.record == "position":
                # json leaves carry no positional structure across paths
                raise ValueError(
                    f"json field {f.name!r} cannot record positions"
                )
        if not self.doc_key_fields:
            raise ValueError("doc_key_fields must not be empty")
        if not self.routing_field:
            raise ValueError("routing_field must be set")
        if self.merge_factor < 2 or self.max_merge_factor < self.merge_factor:
            raise ValueError("need 2 <= merge_factor <= max_merge_factor")
        return self

    @property
    def query_default_fields(self) -> list[str]:
        """The field list unqualified query terms search (the
        reference's default_search_fields; query_builder.rs:53-58)."""
        if self.default_search_fields is not None:
            return list(self.default_search_fields)
        if self.default_search_field is None:
            return []
        return [self.default_search_field]

    def field(self, name: str) -> FieldConfig:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(f"no such indexed field: {name}")

    @property
    def field_names(self) -> tuple[str, ...]:
        return tuple(f.name for f in self.fields)

    def to_dict(self) -> dict:
        return {
            "fields": [
                {"name": f.name, "tokenizer": f.tokenizer, "record": f.record}
                for f in self.fields
            ],
            "default_search_field": self.default_search_field,
            "default_search_fields": (
                list(self.default_search_fields)
                if self.default_search_fields is not None
                else None
            ),
            "dynamic_field": self.dynamic_field,
            "timestamp_field": self.timestamp_field,
            "tag_fields": list(self.tag_fields),
            "doc_key_fields": list(self.doc_key_fields),
            "routing_field": self.routing_field,
            "split_num_docs_target": self.split_num_docs_target,
            "block_size": self.block_size,
            "hot_term_doc_freq": self.hot_term_doc_freq,
            "salt_docid_range": self.salt_docid_range,
            "max_tag_values": self.max_tag_values,
            "merge_factor": self.merge_factor,
            "max_merge_factor": self.max_merge_factor,
            "min_level_num_docs": self.min_level_num_docs,
            "demux_enabled": self.demux_enabled,
            "demux_factor": self.demux_factor,
            "demux_field": self.demux_field,
            "k1": self.k1,
            "b": self.b,
        }

    @staticmethod
    def from_dict(d: dict) -> "IndexConfig":
        """Missing keys take the dataclass defaults, so partial dicts
        (CLI ``--config`` overrides) and catalogs persisted before a
        knob existed both load; unknown keys are rejected loudly."""
        kw = dict(d)
        if "fields" in kw:
            kw["fields"] = tuple(
                FieldConfig(f["name"], f.get("tokenizer", "default"),
                            f.get("record", "freq"))
                for f in kw["fields"]
            )
        for k in ("tag_fields", "doc_key_fields", "default_search_fields"):
            if k in kw and kw[k] is not None:
                kw[k] = tuple(kw[k])
        unknown = set(kw) - {f.name for f in _dc_fields(IndexConfig)}
        if unknown:
            raise ValueError(f"unknown IndexConfig keys: {sorted(unknown)}")
        return IndexConfig(**kw)
