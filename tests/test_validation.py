"""Config + query validation (default_mapper.rs:140-230 analogs)."""

from __future__ import annotations

import pytest

from quickwit_spark.config import FieldConfig, IndexConfig


def test_tag_field_must_be_raw():
    cfg = IndexConfig(
        fields=(FieldConfig("text", "default", "freq"),),
        tag_fields=("text",),
    )
    with pytest.raises(ValueError, match="raw tokenizer"):
        cfg.validate()


def test_tag_field_must_exist():
    cfg = IndexConfig(tag_fields=("nope",))
    with pytest.raises(ValueError, match="not an indexed field"):
        cfg.validate()


def test_default_search_field_must_exist():
    cfg = IndexConfig(
        fields=(FieldConfig("body", "default", "freq"),),
        default_search_field="text",
        tag_fields=(),
    )
    with pytest.raises(ValueError, match="default_search_field"):
        cfg.validate()


def test_default_config_is_valid():
    IndexConfig().validate()


def test_phrase_on_positionless_field_rejected(spark, corpus, tmp_path):
    from quickwit_spark.operators.build import build_index
    from quickwit_spark.operators.search import Searcher

    cfg = IndexConfig(
        fields=(
            FieldConfig("text", "default", "freq"),  # no positions
            FieldConfig("tool", "raw", "basic"),
        ),
        tag_fields=("tool",),
    )
    idx = str(tmp_path / "nopos")
    build_index(spark, spark.createDataFrame(corpus.head(300)), idx, cfg, n_splits=2)
    se = Searcher(spark, idx)
    assert se.search("w00001", k=3).num_hits >= 0  # terms fine
    with pytest.raises(ValueError, match="without positions"):
        se.search('"w00001 w00002"', k=3)
