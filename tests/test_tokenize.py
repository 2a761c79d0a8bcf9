"""Char-level tokenizer tests — tokenizer fidelity is the #1 risk for
BM25 rank-identity (SURVEY.md §7.2)."""

from quickwit_spark.functions.tokenize import (
    porter_stem,
    tokenize_default,
    tokenize_en_stem,
    tokenize_raw,
)


def test_default_splits_on_non_alphanumeric():
    assert tokenize_default("Hello, World!") == ["hello", "world"]
    assert tokenize_default("a red bike") == ["a", "red", "bike"]
    assert tokenize_default("fred's small bike") == ["fred", "s", "small", "bike"]
    assert tokenize_default("a small, rusty, and yellow bike") == [
        "a", "small", "rusty", "and", "yellow", "bike",
    ]


def test_default_underscore_is_separator():
    # tantivy SimpleTokenizer splits on !is_alphanumeric; '_' is not alnum
    assert tokenize_default("foo_bar") == ["foo", "bar"]


def test_default_numbers_and_mixed():
    assert tokenize_default("info @ t:37") == ["info", "t", "37"]
    assert tokenize_default("x86-64 ARM") == ["x86", "64", "arm"]


def test_default_drops_tokens_over_40_chars():
    long = "a" * 41
    ok = "b" * 40
    assert tokenize_default(f"{long} {ok}") == [ok]


def test_default_empty_and_none():
    assert tokenize_default("") == []
    assert tokenize_default(None) == []
    assert tokenize_default("!!! ---") == []


def test_raw_whole_value_one_token():
    # quickwit-doc-mapper/src/tokenizers.rs raw_tokenizer_test analog
    haiku = "\n        white sandy beach\n        a strong wind is coming \n        sand in my face\n        "
    assert tokenize_raw(haiku) == [haiku]
    long_text = (
        "a text, that is just too long, no one will type it, no one will like it, "
        "no one shall find it. I just need some more chars, now you may not pass."
    )
    assert tokenize_raw(long_text) == []
    assert tokenize_raw("UserName") == ["UserName"]  # no lowercasing


def test_porter_stem_classics():
    assert porter_stem("running") == "run"
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("relational") == "relat"
    assert porter_stem("sky") == "sky"


def test_porter_stem_known_vectors():
    """Full-algorithm outputs: the Porter 1980 paper's own worked
    examples (GENERALIZATIONS -> GENER, OSCILLATORS -> OSCIL) plus
    widely published reference results across every step's territory
    (plurals, -eed/-ed/-ing, y->i, the step-2/3 suffix ladders,
    -ant/-ence/-ion strips, -e removal, -ll reduction)."""
    vectors = {
        "generalizations": "gener", "oscillators": "oscil",
        "connected": "connect", "connecting": "connect",
        "connection": "connect", "connections": "connect",
        "agreed": "agre", "plastered": "plaster", "motoring": "motor",
        "conflated": "conflat", "troubled": "troubl", "sized": "size",
        "hopping": "hop", "tanned": "tan", "falling": "fall",
        "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file", "happy": "happi",
        "conditional": "condit", "rational": "ration",
        "digitizer": "digit", "operator": "oper",
        "feudalism": "feudal", "decisiveness": "decis",
        "hopefulness": "hope", "callousness": "callous",
        "formality": "formal", "sensitivity": "sensit",
        "triplicate": "triplic", "formative": "form",
        "formalize": "formal", "electricity": "electr",
        "electrical": "electr", "hopeful": "hope", "goodness": "good",
        "revival": "reviv", "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "communism": "commun",
        "activate": "activ", "effective": "effect",
        "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
        "cease": "ceas", "controlling": "control", "rolling": "roll",
    }
    bad = {w: (porter_stem(w), want)
           for w, want in vectors.items() if porter_stem(w) != want}
    assert not bad, bad


def test_en_stem_pipeline():
    assert tokenize_en_stem("Running QUICKLY") == ["run", "quickli"]
