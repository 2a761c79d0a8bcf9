"""Driver-side split pruning: time range, tag predicate, term range.

Mirrors the reference's metastore-level pruning:
* time range — quickwit-search/src/lib.rs:107-156 (``[start, end)``
  query semantics vs the split's inclusive min/max);
* tag pruning AST with Uninformative elimination (a sound
  over-approximation: when in doubt, keep the split) —
  quickwit-doc-mapper/src/tag_pruning.rs:28-109,150-199;
* term-range pruning is our Parquet-era addition: every split records
  the (min, max) term of the default search field, so a required term
  outside that range skips the split (cheap because the catalog is
  driver-side; at 10^12 scale this is the metastore query).
"""

from __future__ import annotations

from dataclasses import dataclass

from quickwit_spark.plans.catalog import SplitMetadata
from quickwit_spark.plans.query import (
    Bool,
    Boost,
    MatchAll,
    Phrase,
    QueryAst,
    Term,
    positive_required_terms,
)


# --- tag predicate AST (tag_pruning.rs:28-51 analog) -----------------------

@dataclass(frozen=True)
class TagPred:
    field: str
    value: str


@dataclass(frozen=True)
class NotTagPred:
    """must_not on a tag field (tag_pruning.rs negate_ast → Tag with
    ``is_present: false``). The reference prunes whenever the value tag
    is present; with nullable tag fields that is unsound (a null-valued
    doc matches the negation but contributes no tag), so here the split
    additionally records whether the field had nulls
    (``tag_has_null``) — the presence-marker ``field!`` analog — and
    pruning only fires when the split's value set is exactly {value}
    with no nulls: every doc provably fails the negation."""

    field: str
    value: str


@dataclass(frozen=True)
class AndPred:
    children: tuple


@dataclass(frozen=True)
class OrPred:
    children: tuple


UNINFORMATIVE = object()  # matches every split


def extract_tag_pred(ast: QueryAst, tag_fields: tuple[str, ...]):
    """Extract a monotone predicate over split tags; any query shape that
    cannot constrain tags becomes UNINFORMATIVE (tag_pruning.rs:150-199)."""
    if isinstance(ast, Boost):
        # boost scales scores only; the match set — hence the tag
        # constraint — is the child's
        return extract_tag_pred(ast.node, tag_fields)
    if isinstance(ast, Term):
        if ast.field in tag_fields:
            return TagPred(ast.field, ast.value)
        return UNINFORMATIVE
    if isinstance(ast, (Phrase, MatchAll)):
        return UNINFORMATIVE
    if isinstance(ast, Bool):
        if ast.should:
            children = [extract_tag_pred(c, tag_fields) for c in ast.should]
            # an uninformative OR branch makes the whole OR uninformative
            if any(c is UNINFORMATIVE for c in children):
                return UNINFORMATIVE
            return OrPred(tuple(children))
        children = [
            extract_tag_pred(c, tag_fields)
            for c in ast.must
        ]
        # must_not on a bare tag-field term prunes via NotTagPred
        # (collect_tag_filters_for_clause Occur::MustNot → negate_ast)
        for c in ast.must_not:
            if isinstance(c, Term) and c.field in tag_fields:
                children.append(NotTagPred(c.field, c.value))
        children = [c for c in children if c is not UNINFORMATIVE]
        if not children:
            return UNINFORMATIVE
        if len(children) == 1:
            return children[0]
        return AndPred(tuple(children))
    return UNINFORMATIVE


def eval_tag_pred(pred, split: SplitMetadata) -> bool:
    if pred is UNINFORMATIVE:
        return True
    if isinstance(pred, TagPred):
        if pred.field not in split.tags:
            return True  # split predates the tag field — keep (sound);
            # the reference's ¬field! disjunct (tag_pruning.rs:218-240)
        values = split.tags[pred.field]
        if values is None:
            # field overflowed the 1000-value cap (packager.rs:36-43)
            return True
        return pred.value in values
    if isinstance(pred, NotTagPred):
        if pred.field not in split.tags:
            return True
        values = split.tags[pred.field]
        if values is None:
            return True
        has_null = (split.tag_has_null or {}).get(pred.field, True)
        # prunable only when EVERY doc in the split carries exactly the
        # negated value (single recorded value, no nulls)
        return not (values == [pred.value] and not has_null)
    if isinstance(pred, AndPred):
        return all(eval_tag_pred(c, split) for c in pred.children)
    if isinstance(pred, OrPred):
        return any(eval_tag_pred(c, split) for c in pred.children)
    return True


# --- combined pruning --------------------------------------------------------

def time_overlaps(split: SplitMetadata, start_us, end_us) -> bool:
    """Query range is [start, end) in epoch-micros; split range inclusive
    (quickwit-search/src/filters.rs:61-155 semantics)."""
    if split.time_range is None:
        return True
    lo, hi = split.time_range
    if start_us is not None and hi < start_us:
        return False
    if end_us is not None and lo >= end_us:
        return False
    return True


def prune_splits(
    splits: list[SplitMetadata],
    ast: QueryAst,
    config,
    start_us=None,
    end_us=None,
) -> list[SplitMetadata]:
    tag_pred = extract_tag_pred(ast, tuple(config.tag_fields))
    required = positive_required_terms(ast)
    default_field_terms = sorted(
        t for f, t in required if f == config.default_search_field
    )
    out = []
    for s in splits:
        if not time_overlaps(s, start_us, end_us):
            continue
        if not eval_tag_pred(tag_pred, s):
            continue
        if default_field_terms and s.term_range is not None:
            lo, hi = s.term_range
            if any(t < lo or t > hi for t in default_field_terms):
                continue
        out.append(s)
    return out
