"""Query mini-language parser tests (semantics per
quickwit-doc-mapper/src/query_builder.rs + docs/reference/query-language.md)."""

import pytest

from quickwit_spark.config import IndexConfig
from quickwit_spark.plans.query import (
    Bool,
    MatchAll,
    Phrase,
    QueryParseError,
    Term,
    parse_query,
    positive_required_terms,
    query_terms,
)

CFG = IndexConfig()


def test_single_term_default_field():
    assert parse_query("beagle", CFG) == Term("text", "beagle")


def test_term_is_tokenized_and_lowercased():
    assert parse_query("Beagle", CFG) == Term("text", "beagle")


def test_multi_token_word_becomes_phrase():
    # "t:10"-style text with punctuation splits into a phrase
    assert parse_query("x86-64", CFG) == Phrase("text", ("x86", "64"), 0)


def test_conjunction_by_default():
    ast = parse_query("small bike", CFG)
    assert ast == Bool(must=(Term("text", "small"), Term("text", "bike")))


def test_explicit_and_or():
    assert parse_query("a AND b", CFG) == Bool(
        must=(Term("text", "a"), Term("text", "b"))
    )
    assert parse_query("a OR b", CFG) == Bool(
        should=(Term("text", "a"), Term("text", "b"))
    )


def test_or_of_ands_precedence():
    ast = parse_query("a b OR c", CFG)
    assert ast == Bool(
        should=(
            Bool(must=(Term("text", "a"), Term("text", "b"))),
            Term("text", "c"),
        )
    )


def test_field_scoped_term_raw_tokenizer_keeps_case():
    assert parse_query("role:user", CFG) == Term("role", "user")
    assert parse_query("tool:Bash", CFG) == Term("tool", "Bash")  # raw: no lower


def test_not_and_minus():
    ast = parse_query("beagle NOT comic", CFG)
    assert ast == Bool(must=(Term("text", "beagle"),), must_not=(Term("text", "comic"),))
    assert parse_query("beagle -comic", CFG) == ast


def test_phrase_with_slop():
    assert parse_query('"small bike"~2', CFG) == Phrase(
        "text", ("small", "bike"), 2
    )
    assert parse_query('"red bike"', CFG) == Phrase("text", ("red", "bike"), 0)


def test_parens():
    ast = parse_query("(a OR b) c", CFG)
    assert ast == Bool(
        must=(
            Bool(should=(Term("text", "a"), Term("text", "b"))),
            Term("text", "c"),
        )
    )


def test_matchall():
    assert parse_query("", CFG) == MatchAll()
    assert parse_query("*", CFG) == MatchAll()


def test_unknown_field_rejected():
    with pytest.raises(QueryParseError):
        parse_query("nosuchfield:x", CFG)


def test_query_terms_collection():
    ast = parse_query('role:user "small bike"~1 -w123', CFG)
    assert query_terms(ast) == {
        ("role", "user"),
        ("text", "small"),
        ("text", "bike"),
        ("text", "w123"),
    }


def test_positive_required_terms():
    ast = parse_query("a b OR c", CFG)
    assert positive_required_terms(ast) == set()  # top-level OR: nothing required
    ast2 = parse_query("a b -c", CFG)
    assert positive_required_terms(ast2) == {("text", "a"), ("text", "b")}
