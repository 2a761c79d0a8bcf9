"""Query mini-language: terms, ``field:term``, phrases with slop,
AND/+/OR/NOT/- (conjunction by default), parentheses, backslash
escapes for reserved characters.

Semantics follow the reference's query layer:
* conjunction by default — quickwit-doc-mapper/src/query_builder.rs:60-63
  (``set_conjunction_by_default``);
* phrase slop ``"a b"~N`` — docs/reference/query-language.md, behavior
  pinned by quickwit-search/src/tests.rs:111-143;
* ``-clause`` / ``NOT clause`` = must-not; ``+clause`` = explicit must
  (docs/reference/query-language.md "Boolean Operators" — a no-op
  under conjunction-by-default but accepted, as in the reference);
* reserved characters (``^ [ ] { }`` …) appear in terms only behind a
  ``\\`` escape (docs/reference/query-language.md "Escaping Special
  Characters"); an unescaped ``^ [ ] { }`` is a syntax error rather
  than a silent mis-parse;
* range clauses (``field:[a TO b]``) are detected and rejected with
  the reference's exact error — query_builder.rs:42
  ("Range queries are not currently allowed.");
* ``clause^N`` boosts (tantivy grammar ``UserInputAst::Boost``,
  accepted by query_builder.rs:79/96) on terms, phrases and
  parenthesized groups; any other unescaped ``^`` stays a loud
  reserved-character error;
* ``field:(a b)`` field-scoped groups (tantivy grammar): the field is
  the default for the inner clause, explicit inner qualifiers win.

Scoring (our addition — the reference disables scoring at this rev,
quickwit-search/src/collector.rs:318-323): Lucene-style boolean sum of
BM25 clause scores over matching positive clauses; phrase tf = number
of phrase occurrences within the slop window.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Term:
    field: str
    value: str


@dataclass(frozen=True)
class Phrase:
    field: str
    tokens: tuple[str, ...]
    slop: int = 0


@dataclass(frozen=True)
class Bool:
    """must/should/must_not boolean node. must and should are mutually
    exclusive at one node: the parser never produces both (AND binds
    tighter, so ``a AND b OR c`` becomes should-of-conjunctions), and
    the evaluators define no semantics for the mix — reject it here
    rather than silently dropping the should clauses."""

    must: tuple = ()
    should: tuple = ()
    must_not: tuple = ()

    def __post_init__(self):
        if self.must and self.should:
            raise ValueError(
                "Bool cannot carry both must and should clauses; nest a "
                "Bool(should=...) inside must instead"
            )


@dataclass(frozen=True)
class MatchAll:
    pass


@dataclass(frozen=True)
class Boost:
    """``clause^N`` — the tantivy grammar's ``UserInputAst::Boost``
    (query_builder.rs:79/96 pattern-matches it, so the reference
    accepts boosted queries; with scoring disabled there the boost is
    output-neutral). We score, so the boost is applied Lucene-style:
    the child's BM25 score multiplied by ``factor`` (non-negative by
    construction — the grammar lexes only an unsigned number)."""

    node: object
    factor: float


QueryAst = object  # union of the above


_TOKEN_SPEC = re.compile(
    r"""
    \s*(?:
        (?P<fgroup>[A-Za-z_](?:\\.|[\w.\-])*):\( |
        (?P<lparen>\() |
        (?P<rparen>\))(?:\^(?P<rpboost>\d+(?:\.\d+)?))? |
        (?P<quoted>(?:(?P<qfield>[A-Za-z_](?:\\.|[\w.\-])*):)?"(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?(?:\^(?P<qboost>\d+(?:\.\d+)?))?) |
        (?P<neg>-) |
        (?P<plus>\+) |
        (?P<word>(?:(?P<field>[A-Za-z_](?:\\.|[\w.\-])*):)?(?:\\.|[^\s()"\\+-])(?:\\.|[^\s()"\\])*)
    )
    """,
    re.VERBOSE,
)

# range syntax ``[a TO b]`` / ``{a TO b}`` (unescaped) anywhere in the
# query — the reference parses these and then rejects the whole query
_RANGE_CLAUSE = re.compile(r"(?<!\\)[\[{][^\]}]*\sTO\s[^\]}]*[\]}]")

# reserved characters we cannot interpret: unescaped in a term they
# would silently tokenize into the wrong query
_UNESCAPED_RESERVED = re.compile(r"(?<!\\)[\^\[\]{}]")


class QueryParseError(ValueError):
    pass


def _lex(q: str) -> list[tuple[str, object]]:
    tokens: list[tuple[str, object]] = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_SPEC.match(q, pos)
        if not m or m.end() == pos:
            if q[pos:].strip() == "":
                break
            raise QueryParseError(f"cannot lex query at: {q[pos:]!r}")
        pos = m.end()
        if m.group("fgroup"):
            # ``field:(...)`` — tantivy grammar's field-scoped group:
            # the field becomes the default for the inner clause
            # (explicit inner fields still win)
            tokens.append(("fgroup", m.group("fgroup")))
        elif m.group("lparen"):
            tokens.append(("(", None))
        elif m.group("rparen"):
            rb = m.group("rpboost")
            tokens.append((")", float(rb) if rb else None))
        elif m.group("quoted") is not None:
            slop = int(m.group("slop") or 0)
            qb = m.group("qboost")
            tokens.append(
                ("phrase", (m.group("qfield"), m.group("phrase"), slop,
                            float(qb) if qb else None))
            )
        elif m.group("neg"):
            tokens.append(("NOT", None))
        elif m.group("plus"):
            tokens.append(("PLUS", None))
        else:
            word = m.group("word")
            fld = m.group("field")
            if fld is None and word in ("AND", "OR", "NOT"):
                tokens.append((word, None))
            elif fld is None and word == "*":
                tokens.append(("matchall", None))
            else:
                value = word[len(fld) + 1 :] if fld else word
                if value[:1] in ("<", ">"):
                    # comparison-range syntax (``field:>foo``,
                    # ``field:<=bar``) — the tantivy grammar parses these
                    # as Range leaves and the reference rejects the whole
                    # query (query_builder.rs:41-43 + its test
                    # ``title:>foo``)
                    raise QueryParseError(
                        "Range queries are not currently allowed."
                    )
                # trailing unescaped ``^N`` is a boost suffix
                # (UserInputAst::Boost); any other unescaped ``^`` stays
                # a loud reserved-character error below
                boost = None
                mb = re.search(r"(?<!\\)\^(\d+(?:\.\d+)?)$", value)
                if mb and mb.start() > 0:
                    boost = float(mb.group(1))
                    value = value[: mb.start()]
                bad = _UNESCAPED_RESERVED.search(value)
                if bad:
                    raise QueryParseError(
                        f"reserved character {bad.group()!r} in term "
                        f"{value!r} must be escaped with a backslash"
                    )
                tokens.append(
                    ("term", (fld, re.sub(r"\\(.)", r"\1", value), boost))
                )
    return tokens


class _Parser:
    def __init__(self, tokens: list, default_fields, resolve):
        self.toks = tokens
        self.i = 0
        # unqualified terms search ALL default fields (the REST
        # `search_field` param — rest_handler.rs:83-114): a multi-field
        # unqualified term becomes Should(per-field terms), scored as
        # the boolean sum over matching fields
        self.default_fields = (
            [default_fields] if isinstance(default_fields, str) else list(default_fields)
        )
        # resolve(field, text, slop) -> query node | None (no tokens);
        # handles field-aware tokenization incl. json dotted paths
        self.resolve = resolve

    def _default_expand(self, make_node):
        if not self.default_fields:
            # reference parity (query_builder.rs:45-52): an unqualified
            # term with no default field declared is an error, checked
            # syntactically — raised even if the term tokenizes empty
            raise QueryParseError(
                "No default field declared and no field specified in query."
            )
        nodes = []
        for fld in self.default_fields:
            node = make_node(fld)
            if node is not None:
                nodes.append(node)
        if not nodes:
            return MatchAll()
        if len(nodes) == 1:
            return nodes[0]
        return Bool(should=tuple(nodes))

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def parse(self):
        node = self.parse_or()
        if self.i != len(self.toks):
            raise QueryParseError(f"trailing tokens at {self.i}")
        return node

    def parse_or(self):
        clauses = [self.parse_and()]
        while self.peek()[0] == "OR":
            self.next()
            clauses.append(self.parse_and())
        if len(clauses) == 1:
            return clauses[0]
        return Bool(should=tuple(clauses))

    def parse_and(self):
        must: list = []
        must_not: list = []
        while True:
            kind, _ = self.peek()
            if kind in (None, ")", "OR"):
                break
            if kind == "AND":
                self.next()
                continue
            if kind == "NOT":
                self.next()
                must_not.append(self.parse_unary())
                continue
            if kind == "PLUS":
                # explicit must — identical to the conjunction default
                self.next()
                must.append(self.parse_unary())
                continue
            must.append(self.parse_unary())
        if not must and not must_not:
            raise QueryParseError("empty clause")
        if len(must) == 1 and not must_not:
            return must[0]
        return Bool(must=tuple(must), must_not=tuple(must_not))

    @staticmethod
    def _boosted(node, factor):
        """Wrap ``node`` in Boost(factor); boosting MatchAll is a no-op
        (its score is 0) so the wrapper is elided there."""
        if factor is None or isinstance(node, MatchAll):
            return node
        return Boost(node, factor)

    def parse_unary(self):
        kind, val = self.next()
        if kind == "(":
            node = self.parse_or()
            close, boost = self.next()
            if close != ")":
                raise QueryParseError("unbalanced parentheses")
            return self._boosted(node, boost)
        if kind == "fgroup":
            # field-scoped group: the field is the default for the
            # inner clause (tantivy ``field:(a b)``); explicit inner
            # ``other:term`` qualifiers still win
            saved = self.default_fields
            self.default_fields = [val]
            try:
                node = self.parse_or()
            finally:
                self.default_fields = saved
            close, boost = self.next()
            if close != ")":
                raise QueryParseError("unbalanced parentheses")
            return self._boosted(node, boost)
        if kind == "NOT":
            inner = self.parse_unary()
            return Bool(must_not=(inner,))
        if kind == "matchall":
            return MatchAll()
        if kind == "term":
            fld, value, boost = val

            def make_term(field):
                return self.resolve(field, value, None)

            if fld is not None:
                return self._boosted(make_term(fld) or MatchAll(), boost)
            return self._boosted(self._default_expand(make_term), boost)
        if kind == "phrase":
            fld, text, slop, boost = val

            def make_phrase(field):
                return self.resolve(field, text, slop)

            if fld is not None:
                return self._boosted(make_phrase(fld) or MatchAll(), boost)
            return self._boosted(self._default_expand(make_phrase), boost)
        raise QueryParseError(f"unexpected token {kind}")


def parse_query(q: str, config, search_fields=None) -> QueryAst:
    """Parse ``q`` against an :class:`IndexConfig` (field-aware
    tokenization: raw fields keep the value verbatim; dotted paths on a
    json-tokenizer field resolve to path-scoped terms with typed-term
    OR expansion — quickwit-doc-mapper/src/doc_mapper.rs:189-217,
    query_builder.rs:29-65).
    ``search_fields`` overrides the default field(s) for unqualified
    terms (REST ``search_field`` param)."""
    from quickwit_spark.functions.tokenize import TOKENIZERS, json_query_tokens

    def resolve(fld: str, text: str, slop):
        # an escaped dot (``identity\.username``) pins the LITERAL
        # field name and disables the json-path interpretation; an
        # unescaped dotted name prefers the json-root path over an
        # exact field of the same dotted name (the reference's
        # dot-collision rule, default_mapper.rs
        # test_doc_mapper_object_dot_collision_with_json_field)
        escaped = "\\" in fld
        literal = re.sub(r"\\(.)", r"\1", fld)
        rcfg = None
        if not escaped:
            root, dot, path = fld.partition(".")
            if dot and path:
                try:
                    rcfg = config.field(root)
                except KeyError:
                    rcfg = None
                if rcfg is not None and rcfg.tokenizer not in ("json", "json_raw"):
                    rcfg = None
        if rcfg is None:
            try:
                fcfg = config.field(literal)
            except KeyError:
                fcfg = None
            if fcfg is not None:
                toks = TOKENIZERS[fcfg.tokenizer](text)
                if len(toks) == 0:
                    return None
                if len(toks) == 1:
                    return Term(literal, toks[0])
                return Phrase(literal, tuple(toks), slop or 0)
            if config.dynamic_field is not None:
                # mode=dynamic fallback (tests.rs
                # test_search_dynamic_mode): an unknown field resolves
                # as a json path INTO the dynamic catch-all field —
                # the whole dotted name is the path
                root, path = config.dynamic_field, literal
                rcfg = config.field(root)
            if rcfg is None:
                # exact reference string incl. the grammar quirk
                # (query_builder.rs resolve_fields / tantivy
                # QueryParserError::FieldDoesNotExist)
                raise QueryParseError(f"Field does not exists: '{fld}'")
        # json path term: string interpretation (conjunction when
        # multi-token — json fields record no positions, slop is
        # ignored) OR'd with the canonical numeric interpretation
        toks, numeric = json_query_tokens(
            path, text,
            "raw" if rcfg.tokenizer == "json_raw" else "default",
        )
        nodes = []
        if len(toks) == 1:
            nodes.append(Term(root, toks[0]))
        elif toks:
            nodes.append(Bool(must=tuple(Term(root, t) for t in toks)))
        if numeric is not None:
            nodes.append(Term(root, numeric))
        if not nodes:
            return None
        return nodes[0] if len(nodes) == 1 else Bool(should=tuple(nodes))

    q = q.strip()
    if not q or q == "*":
        return MatchAll()
    if _RANGE_CLAUSE.search(q):
        # parity with the reference: the grammar recognizes range
        # clauses and the query builder rejects them wholesale
        # (quickwit-doc-mapper/src/query_builder.rs:41-43)
        raise QueryParseError("Range queries are not currently allowed.")
    tokens = _lex(q)
    if not tokens:
        return MatchAll()
    fields = search_fields or config.query_default_fields
    fields = [fields] if isinstance(fields, str) else list(fields)
    # search_fields / default fields resolve eagerly against the schema
    # (query_builder.rs resolve_fields) — even when every query term is
    # field-qualified, an unknown name in the list is an error
    known = set(config.field_names)
    for f in fields:
        if f not in known:
            raise QueryParseError(f"Field does not exists: '{f}'")
    return _Parser(tokens, fields, resolve).parse()


def query_terms(ast: QueryAst) -> set[tuple[str, str]]:
    """All (field, token) pairs the query touches — drives the postings
    scan filter (predicate pushdown to Parquet)."""
    out: set[tuple[str, str]] = set()

    def walk(node):
        if isinstance(node, Term):
            out.add((node.field, node.value))
        elif isinstance(node, Phrase):
            out.update((node.field, t) for t in node.tokens)
        elif isinstance(node, Bool):
            for c in node.must + node.should + node.must_not:
                walk(c)
        elif isinstance(node, Boost):
            walk(node.node)

    walk(ast)
    return out


def positive_required_terms(ast: QueryAst) -> set[tuple[str, str]]:
    """(field, token) pairs that MUST match for any hit — sound input to
    term-range / tag split pruning (mirrors tag_pruning.rs:28-51: OR is
    the union, must_not and unknown shapes are uninformative)."""
    if isinstance(ast, Boost):
        # a boost scales scores only — the match set is the child's
        return positive_required_terms(ast.node)
    if isinstance(ast, Term):
        return {(ast.field, ast.value)}
    if isinstance(ast, Phrase):
        return {(ast.field, t) for t in ast.tokens}
    if isinstance(ast, Bool) and ast.must:
        out: set[tuple[str, str]] = set()
        for c in ast.must:
            out |= positive_required_terms(c)
        return out
    return set()
