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


class TestJsonPathQueries:
    """field.path:value resolution against a json-tokenizer field
    (doc_mapper.rs:189-217 typed-term OR expansion analog)."""

    @staticmethod
    def _cfg():
        from quickwit_spark.config import FieldConfig, IndexConfig

        return IndexConfig(
            fields=(
                FieldConfig("text", "default", "position"),
                FieldConfig("tool", "raw", "basic"),
                FieldConfig("props", "json", "basic"),
            ),
            tag_fields=("tool",),
        )

    def test_json_tokenizer_flattens_paths(self):
        from quickwit_spark.functions.tokenize import JSON_PATH_SEP, tokenize_json

        toks = tokenize_json(
            '{"user": {"name": "Bob Smith", "age": 42}, '
            '"tags": ["a", "b"], "pi": 3.5, "ok": true, "none": null}'
        )
        S = JSON_PATH_SEP
        assert toks == [
            f"user.name{S}bob", f"user.name{S}smith", f"user.age{S}42",
            f"tags{S}a", f"tags{S}b", f"pi{S}3.5", f"ok{S}true",
        ]
        # numeric unification: 5 and 5.0 and "5" land on the same token
        assert tokenize_json('{"x": 5.0}') == tokenize_json('{"x": 5}')
        assert tokenize_json('{"x": "5"}') == tokenize_json('{"x": 5}')

    def test_path_term_resolution(self):
        from quickwit_spark.functions.tokenize import JSON_PATH_SEP as S
        from quickwit_spark.plans.query import Bool, Term, parse_query

        cfg = self._cfg()
        ast = parse_query("props.user.name:bob", cfg)
        assert ast == Term("props", f"user.name{S}bob")
        # numeric literal expands over string + canonical number (same
        # token after unification -> single term)
        ast = parse_query("props.user.age:42", cfg)
        assert ast == Term("props", f"user.age{S}42")
        # float literal: string interp is a 2-token conjunction, OR'd
        # with the canonical numeric token
        ast = parse_query("props.pi:3.5", cfg)
        assert isinstance(ast, Bool) and len(ast.should) == 2
        assert Term("props", f"pi{S}3.5") in ast.should
        # unknown root still errors
        import pytest

        from quickwit_spark.plans.query import QueryParseError

        with pytest.raises(
            QueryParseError, match="Field does not exists: 'nope.user'"
        ):
            parse_query("nope.user:bob", cfg)

    def test_json_field_end_to_end_vs_oracle(self, spark, tmp_path):
        """Engine rank-identity with the oracle over a json field
        (oracle indexes through the same tokenizer registry but
        evaluates independently)."""
        from quickwit_spark.operators.build import build_index
        from quickwit_spark.operators.search import Searcher
        from quickwit_spark.oracle import OracleEngine
        from quickwit_spark.sources.transcripts import fixture_corpus

        rows = [
            (f"doc number {i} common", "user", None) for i in range(30)
        ]
        pdf = fixture_corpus(rows)
        langs = ["en", "fr", "de"]
        pdf["props"] = [
            f'{{"lang": "{langs[i % 3]}", "score": {i % 5}, '
            f'"meta": {{"src": "s{i % 2}"}}}}'
            for i in range(len(pdf))
        ]
        cfg = self._cfg()
        d = str(tmp_path / "jsonidx")
        build_index(spark, spark.createDataFrame(pdf), d, cfg, n_splits=2)
        se = Searcher(spark, d)
        oracle = OracleEngine(pdf, cfg, n_splits=2)
        for q, want_hits in [
            ("props.lang:en", 10),
            ("props.score:3 AND common", 6),
            ("props.meta.src:s1 AND props.lang:fr", None),
            ("common -props.lang:de", 20),
        ]:
            n_o, hits_o = oracle.search(q, k=10)
            r = se.search(q, k=10)
            assert r.num_hits == n_o
            if want_hits is not None:
                assert n_o == want_hits
            assert [(h.split_id, h.docid) for h in r.hits] == [
                (h.split_id, h.docid) for h in hits_o
            ]
            for a, b in zip(hits_o, r.hits):
                assert abs(a.score - b.score) < 1e-9

    def test_json_field_rejects_positions(self):
        import pytest

        from quickwit_spark.config import FieldConfig, IndexConfig

        cfg = IndexConfig(
            fields=(
                FieldConfig("text", "default", "freq"),
                FieldConfig("props", "json", "position"),
            ),
            tag_fields=(),
        )
        with pytest.raises(ValueError, match="positions"):
            cfg.validate()


class TestReservedAndEscapes:
    """docs/reference/query-language.md "Boolean Operators" +
    "Escaping Special Characters"; range rejection per
    quickwit-doc-mapper/src/query_builder.rs:41-43."""

    def test_range_clause_rejected_with_reference_error(self):
        for q in (
            "ts:[2020 TO 2021]",
            "{a TO b}",
            "x AND price:[1 TO 10]",
        ):
            with pytest.raises(
                QueryParseError, match="Range queries are not currently"
            ):
                parse_query(q, CFG)

    def test_comparison_range_rejected_with_reference_error(self):
        # query_builder.rs test battery: ``title:>foo`` is a Range leaf
        # in the tantivy grammar and is rejected wholesale
        for q in ("tool:>foo", "tool:<foo", "tool:>=5", "text:<=bar", ">loose"):
            with pytest.raises(
                QueryParseError, match="Range queries are not currently"
            ):
                parse_query(q, CFG)

    def test_trailing_caret_number_is_a_boost(self):
        # tantivy grammar: ``clause^N`` is UserInputAst::Boost — the
        # reference accepts it (query_builder.rs pattern-matches Boost)
        from quickwit_spark.plans.query import Boost

        assert parse_query("beagle^2", CFG) == Boost(
            Term("text", "beagle"), 2.0
        )
        assert parse_query('"small dog"^1.5', CFG) == Boost(
            Phrase("text", ("small", "dog"), 0), 1.5
        )
        assert parse_query("(beagle OR pug)^3 AND dog", CFG) == Bool(
            must=(
                Boost(
                    Bool(
                        should=(
                            Term("text", "beagle"),
                            Term("text", "pug"),
                        )
                    ),
                    3.0,
                ),
                Term("text", "dog"),
            )
        )

    def test_field_scoped_group(self):
        # tantivy grammar ``field:(a b)``: the field is the default for
        # the inner clause; explicit inner qualifiers still win
        assert parse_query("tool:(python OR rust)", CFG) == Bool(
            should=(Term("tool", "python"), Term("tool", "rust"))
        )
        assert parse_query("tool:(python rust)", CFG) == Bool(
            must=(Term("tool", "python"), Term("tool", "rust"))
        )
        assert parse_query("tool:(text:python OR rust)", CFG) == Bool(
            should=(Term("text", "python"), Term("tool", "rust"))
        )
        from quickwit_spark.plans.query import Boost

        assert parse_query("tool:(python OR rust)^2", CFG) == Boost(
            Bool(should=(Term("tool", "python"), Term("tool", "rust"))),
            2.0,
        )
        with pytest.raises(QueryParseError, match="unbalanced"):
            parse_query("tool:(python OR rust", CFG)

    def test_non_boost_caret_is_a_syntax_error(self):
        # a caret NOT in trailing ``^number`` position still needs the
        # backslash escape; silent phrase mis-parse is worse
        with pytest.raises(QueryParseError, match="reserved character"):
            parse_query("bea^gle", CFG)
        with pytest.raises(QueryParseError, match="reserved character"):
            parse_query("beagle^x", CFG)
        with pytest.raises(QueryParseError, match="reserved character"):
            parse_query("a OR tool:x{1}", CFG)

    def test_escaped_reserved_chars_are_literal(self):
        # raw-tokenizer field keeps the unescaped value verbatim
        assert parse_query(r"tool:a\^b", CFG) == Term("tool", "a^b")
        assert parse_query(r"tool:py\[3\]", CFG) == Term("tool", "py[3]")
        # text field: the literal char then tokenizes away
        assert parse_query(r"beagle\^2", CFG) == Phrase(
            "text", ("beagle", "2"), 0
        )

    def test_escaped_space_binds_one_term(self):
        assert parse_query(r"tool:a\ b", CFG) == Term("tool", "a b")

    def test_plus_is_explicit_must(self):
        assert parse_query("+small bike", CFG) == parse_query(
            "small bike", CFG
        )
        assert parse_query("a AND +b", CFG) == parse_query("a AND b", CFG)
        # in an OR list, + marks the clause but OR grouping is unchanged
        assert parse_query("+a OR b", CFG) == parse_query("a OR b", CFG)


def test_bool_rejects_mixed_must_and_should():
    """No node may carry both must and should: the parser never emits
    the mix (AND binds tighter than OR) and the evaluators define no
    semantics for it, so construction fails loudly."""
    import pytest

    from quickwit_spark.plans.query import Bool, Term

    with pytest.raises(ValueError, match="must and should"):
        Bool(must=(Term("text", "a"),), should=(Term("text", "b"),))


class TestBuildQueryReferenceBattery:
    """The reference's build_query test battery re-expressed
    (quickwit-doc-mapper/src/query_builder.rs:195-287): unknown fields
    and unknown search_fields error with the reference's exact string;
    a no-default-field index rejects unqualified terms."""

    def test_unknown_field_errors_with_reference_string(self):
        import pytest

        from quickwit_spark.plans.query import QueryParseError

        with pytest.raises(
            QueryParseError, match="Field does not exists: 'foo'"
        ):
            parse_query("foo:bar", CFG)
        # dotted path whose root is not a json field (reference:
        # "server.type:hpc server.mem:4GB" over a text-only schema)
        with pytest.raises(
            QueryParseError, match="Field does not exists: 'server.type'"
        ):
            parse_query("server.type:hpc server.mem:4GB", CFG)

    def test_unknown_search_field_errors_even_if_terms_qualified(self):
        """resolve_fields validates the search_fields list eagerly —
        'title:foo desc:bar' with search_fields=['url'] errors."""
        import pytest

        from quickwit_spark.plans.query import QueryParseError

        with pytest.raises(
            QueryParseError, match="Field does not exists: 'url'"
        ):
            parse_query("text:foo role:bar", CFG, search_fields=["url"])

    def test_no_default_field_rejects_unqualified_terms(self):
        import pytest

        from quickwit_spark.plans.query import QueryParseError, Term

        cfg = IndexConfig(default_search_field=None).validate()
        msg = "No default field declared and no field specified in query."
        with pytest.raises(QueryParseError, match=msg.replace(".", r"\.")):
            parse_query("bar", cfg)
        # unqualified term nested in a group still triggers it
        with pytest.raises(QueryParseError, match="No default field"):
            parse_query("text:hello AND (Jane OR role:world)", cfg)
        # fully qualified queries parse fine without a default field
        assert parse_query("text:hello", cfg) == Term("text", "hello")
        # and the REST search_field override supplies the default
        assert parse_query("hello", cfg, search_fields=["text"]) == Term(
            "text", "hello"
        )

    def test_no_default_field_config_cannot_build(self, tmp_path):
        import pytest

        from quickwit_spark.operators.build import build_index

        cfg = IndexConfig(default_search_field=None).validate()
        with pytest.raises(ValueError, match="requires a default_search_field"):
            build_index(None, "unused", str(tmp_path / "ix"), config=cfg)

    def test_config_level_multi_default_fields(self):
        """default_search_fields (the reference's list form) makes
        unqualified terms search every member — identical AST to the
        REST search_field override, and round-trips through dicts."""
        cfg = IndexConfig(default_search_fields=("text", "tool")).validate()
        assert parse_query("bash", cfg) == parse_query(
            "bash", CFG, search_fields=["text", "tool"]
        )
        # explicit search_fields still overrides the config list
        assert parse_query("bash", cfg, search_fields=["tool"]) == Term(
            "tool", "bash"
        )
        assert IndexConfig.from_dict(cfg.to_dict()) == cfg
        with pytest.raises(ValueError, match="default_search_fields member"):
            IndexConfig(default_search_fields=("text", "nope")).validate()


class TestDynamicModeQueries:
    """mode=dynamic searchability (tests.rs test_search_dynamic_mode
    + default_mapper.rs:497-509): unknown `field:value` queries
    resolve as json paths into the `_dynamic` catch-all field; the
    dynamic_mapping tokenizer controls leaf tokenization (raw keeps
    the whole value, case included)."""

    @staticmethod
    def _cfg(tok="json_raw"):
        from quickwit_spark.config import FieldConfig, IndexConfig

        return IndexConfig(
            fields=(
                FieldConfig("text", "default", "position"),
                FieldConfig("tool", "raw", "basic"),
                FieldConfig("_dynamic", tok, "basic"),
            ),
            tag_fields=("tool",),
            dynamic_field="_dynamic",
        ).validate()

    def test_unknown_field_resolves_into_dynamic(self):
        from quickwit_spark.functions.tokenize import JSON_PATH_SEP as S

        cfg = self._cfg()
        assert parse_query("body_dynamic:hello", cfg) == Term(
            "_dynamic", f"body_dynamic{S}hello"
        )
        # dotted unknown root: the WHOLE name is the dynamic path
        assert parse_query("a.b:x", cfg) == Term("_dynamic", f"a.b{S}x")
        # raw leaves: quoted multi-word value stays ONE raw token,
        # case preserved
        assert parse_query('body_dynamic:"Hello Happy"', cfg) == Term(
            "_dynamic", f"body_dynamic{S}Hello Happy"
        )
        # known fields still win over the dynamic fallback
        assert parse_query("tool:Bash", cfg) == Term("tool", "Bash")
        # default-leaf dynamic field tokenizes/lowercases the value
        cfg_def = self._cfg(tok="json")
        got = parse_query('body_dynamic:"Hello Happy"', cfg_def)
        assert got == Bool(must=(
            Term("_dynamic", f"body_dynamic{S}hello"),
            Term("_dynamic", f"body_dynamic{S}happy"),
        ))

    def test_without_dynamic_field_still_errors(self):
        with pytest.raises(
            QueryParseError, match="Field does not exists: 'body_dynamic'"
        ):
            parse_query("body_dynamic:hello", CFG)

    def test_json_raw_tokenizer_units(self):
        from quickwit_spark.functions.tokenize import (
            JSON_PATH_SEP as S,
            tokenize_json_raw,
        )

        assert tokenize_json_raw('{"k": "Hello World", "n": 5}') == [
            f"k{S}Hello World", f"n{S}5"
        ]
        # >100-char raw leaves drop (raw tokenizer cap)
        assert tokenize_json_raw('{"k": "' + "x" * 101 + '"}') == []

    def test_dynamic_config_validation(self):
        from quickwit_spark.config import FieldConfig, IndexConfig

        with pytest.raises(ValueError, match="dynamic_field"):
            IndexConfig(dynamic_field="nope").validate()
        with pytest.raises(ValueError, match="must use a json tokenizer"):
            IndexConfig(dynamic_field="text").validate()

    def test_dynamic_mode_end_to_end_vs_oracle(self, spark, tmp_path):
        """The reference test corpus re-expressed: text:hello matches
        the two mapped docs; body_dynamic:hello matches ONLY the doc
        whose raw dynamic value is exactly 'hello'."""
        from quickwit_spark.operators.build import build_index
        from quickwit_spark.operators.search import Searcher
        from quickwit_spark.oracle import OracleEngine
        from quickwit_spark.sources.transcripts import fixture_corpus

        pdf = fixture_corpus([
            ("hello happy tax payer", "user", None),
            ("hello", "user", None),
            ("unrelated", "user", None),
            ("unrelated", "user", None),
        ])
        pdf["_dynamic"] = [
            None,
            None,
            '{"body_dynamic": "hello happy tax payer"}',
            '{"body_dynamic": "hello"}',
        ]
        cfg = self._cfg()
        d = str(tmp_path / "dynidx")
        build_index(spark, spark.createDataFrame(pdf), d, cfg, n_splits=2)
        se = Searcher(spark, d)
        oracle = OracleEngine(pdf, cfg, n_splits=2)
        for q, want in [
            ("text:hello", 2),
            ("body_dynamic:hello", 1),          # raw: only the exact value
            ('body_dynamic:"hello happy tax payer"', 1),
            ("body_dynamic:nope", 0),
        ]:
            n_o, hits_o = oracle.search(q, k=10)
            r = se.search(q, k=10)
            assert (r.num_hits, n_o) == (want, want)
            assert [(h.split_id, h.docid) for h in r.hits] == [
                (h.split_id, h.docid) for h in hits_o
            ]
            for a, b in zip(hits_o, r.hits):
                assert abs(a.score - b.score) < 1e-9


def test_dotted_field_collision_json_root_wins():
    """Dot-collision rule (default_mapper.rs
    test_doc_mapper_object_dot_collision_with_json_field): an
    unescaped dotted name prefers the json-root path interpretation
    over an exact field with the same dotted name; an escaped dot
    (``identity\\.username``) pins the literal field."""
    from quickwit_spark.config import FieldConfig, IndexConfig

    cfg = IndexConfig(
        fields=(
            FieldConfig("text", "default"),
            FieldConfig("identity", "json"),
            FieldConfig("identity.username", "default"),
        )
    )
    assert parse_query("identity.username:toto", cfg) == Term(
        "identity", "username\x1ftoto"
    )
    assert parse_query(r"identity\.username:toto", cfg) == Term(
        "identity.username", "toto"
    )
    # a literal dotted field with NO json root still resolves directly
    cfg2 = IndexConfig(
        fields=(FieldConfig("text", "default"), FieldConfig("a.b", "default"))
    )
    assert parse_query("a.b:x", cfg2) == Term("a.b", "x")
    # an escaped unknown name is an error, not a dynamic/path fallback
    with pytest.raises(QueryParseError, match="Field does not exists"):
        parse_query(r"a\.b:x", CFG)
