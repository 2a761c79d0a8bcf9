"""Pure-Python reference engine — the pytest oracle (SURVEY.md §5).

The analog of the reference's ``TestSandbox``
(quickwit-indexing/src/test_utils.rs, used by
quickwit-search/src/tests.rs:43-48): index a small corpus exactly,
answer queries exactly, so the Spark engine can be asserted
rank-identical (top-k docids + BM25 scores to 1e-6, tie order
``(score desc, split_id asc, docid asc)`` —
quickwit-search/src/lib.rs:100-105).

BM25 (Lucene/tantivy constants, public knowledge):
  idf  = ln(1 + (N - n + 0.5) / (n + 0.5))
  tfn  = tf * (k1+1) / (tf + k1 * (1 - b + b * dl / avgdl))
  score = sum over matching positive clauses of idf * tfn
with GLOBAL corpus stats (N, avgdl, doc-freq summed over all splits).
Doc lengths are exact token counts (unquantized — our spec, see
SURVEY.md §7.2 "BM25 constants/normalization").
"""

from __future__ import annotations

import math
import zlib
from collections import defaultdict
from dataclasses import dataclass

import numpy as np
import pandas as pd

from quickwit_spark.config import IndexConfig
from quickwit_spark.functions.phrase import phrase_freq
from quickwit_spark.operators.build import split_id_for_partition
from quickwit_spark.functions.tokenize import TOKENIZERS
from quickwit_spark.plans.query import (
    Bool,
    Boost,
    MatchAll,
    Phrase,
    QueryAst,
    Term,
    parse_query,
)


def route_split(conv_id: str, n_splits: int) -> int:
    """Deterministic conv-level split routing shared with the Spark build:
    crc32(utf8(conv_id)) mod n_splits.  (The reference hashes a routing
    expression to a u64 partition — routing_expression/mod.rs:132-151;
    we use crc32 because Spark's ``F.crc32`` and ``zlib.crc32`` are
    bit-identical, which lets the oracle reproduce split assignment.)"""
    return zlib.crc32(conv_id.encode("utf-8")) % n_splits


@dataclass
class OracleHit:
    split_id: str
    docid: int
    score: float
    conv_id: str
    turn_idx: int


class OracleEngine:
    def __init__(self, docs: pd.DataFrame, config: IndexConfig | None = None, n_splits: int = 4):
        self.config = config or IndexConfig()
        self.n_splits = n_splits
        cfg = self.config

        docs = docs.reset_index(drop=True).copy()
        docs["split_ord"] = [
            route_split(c, n_splits) for c in docs["conv_id"].astype(str)
        ]
        docs = docs.sort_values(
            ["split_ord", *cfg.doc_key_fields], kind="mergesort"
        ).reset_index(drop=True)
        docs["docid"] = docs.groupby("split_ord").cumcount()
        self.docs = docs

        # postings[field][term] = {(split, docid): positions list}
        self.postings: dict[str, dict[str, dict]] = {
            f.name: defaultdict(dict) for f in cfg.fields
        }
        self.doc_len: dict[tuple[int, int], int] = {}
        self.doc_meta: dict[tuple[int, int], dict] = {}
        # plain tuples + a column index map: itertuples' named form
        # RENAMES underscore-prefixed columns (e.g. `_dynamic` -> _N),
        # which silently dropped dynamic-field postings via getattr
        ci = {c: i for i, c in enumerate(docs.columns)}
        for row in docs.itertuples(index=False, name=None):
            key = (row[ci["split_ord"]], row[ci["docid"]])
            for f in cfg.fields:
                value = row[ci[f.name]] if f.name in ci else None
                toks = TOKENIZERS[f.tokenizer](value)
                if f.name == cfg.default_search_field:
                    self.doc_len[key] = len(toks)
                for pos, t in enumerate(toks):
                    self.postings[f.name][t].setdefault(key, []).append(pos)
            ts = row[ci[cfg.timestamp_field]]
            self.doc_meta[key] = {
                "conv_id": row[ci["conv_id"]],
                "turn_idx": row[ci["turn_idx"]],
                "ts_us": int(pd.Timestamp(ts).value // 1000),
            }
        self.N = len(docs)
        self.avgdl = (
            sum(self.doc_len.values()) / self.N if self.N else 0.0
        )

    # -- scoring ------------------------------------------------------------

    def _idf(self, df: int) -> float:
        return math.log(1.0 + (self.N - df + 0.5) / (df + 0.5))

    def _bm25(self, tf: float, dl: int, df: int) -> float:
        k1, b = self.config.k1, self.config.b
        norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / self.avgdl))
        return self._idf(df) * norm

    def _eval(self, node: QueryAst) -> dict[tuple[int, int], float]:
        """Return {(split, docid): score} of matching docs."""
        if isinstance(node, MatchAll):
            return {k: 0.0 for k in self.doc_meta}
        if isinstance(node, Boost):
            # Lucene-style: the child's score scaled by the factor;
            # the match set is unchanged
            return {
                k: v * node.factor for k, v in self._eval(node.node).items()
            }
        if isinstance(node, Term):
            plist = self.postings[node.field].get(node.value, {})
            df = len(plist)
            return {
                key: self._bm25(len(pos), self.doc_len.get(key, 0), df)
                for key, pos in plist.items()
            }
        if isinstance(node, Phrase):
            # Lucene-style phrase idf: sum of the constituent terms' idfs
            # (distributable — needs no global phrase-match count), with
            # tf = phrase frequency within the slop window.
            maps = [
                self.postings[node.field].get(t, {}) for t in node.tokens
            ]
            idf_sum = sum(self._idf(len(m)) for m in maps)
            candidates = set(maps[0])
            for m in maps[1:]:
                candidates &= set(m)
            k1, b = self.config.k1, self.config.b
            out = {}
            for key in candidates:
                freq = phrase_freq(
                    [np.asarray(m[key]) for m in maps], node.slop
                )
                if freq > 0:
                    dl = self.doc_len.get(key, 0)
                    tfn = freq * (k1 + 1.0) / (
                        freq + k1 * (1.0 - b + b * dl / self.avgdl)
                    )
                    out[key] = idf_sum * tfn
            return out
        if isinstance(node, Bool):
            if node.must:
                musts = [self._eval(c) for c in node.must]
                base = set(musts[0])
                for m in musts[1:]:
                    base &= set(m)
                scores = {
                    k: sum(m.get(k, 0.0) for m in musts) for k in base
                }
            elif node.should:
                shoulds = [self._eval(c) for c in node.should]
                keys = set().union(*[set(s) for s in shoulds])
                scores = {
                    k: sum(s.get(k, 0.0) for s in shoulds) for k in keys
                }
            else:
                scores = {k: 0.0 for k in self.doc_meta}
            for c in node.must_not:
                excl = self._eval(c)
                scores = {k: v for k, v in scores.items() if k not in excl}
            return scores
        raise TypeError(f"unknown node {node}")

    # -- public API -----------------------------------------------------------

    def search(
        self,
        query: str,
        k: int = 20,
        start_us: int | None = None,
        end_us: int | None = None,
        sort_by: str | None = None,
        sort_desc: bool = True,
        offset: int = 0,
        search_fields=None,
    ) -> tuple[int, list[OracleHit]]:
        """Returns (num_hits, top-k hits). Time range is [start, end) in
        epoch micros on the timestamp fast field (filters.rs:61-155)."""
        ast = parse_query(query, self.config, search_fields)
        scores = self._eval(ast)
        if start_us is not None or end_us is not None:
            scores = {
                key: v
                for key, v in scores.items()
                if (start_us is None or self.doc_meta[key]["ts_us"] >= start_us)
                and (end_us is None or self.doc_meta[key]["ts_us"] < end_us)
            }
        num_hits = len(scores)
        if sort_by is not None:
            if sort_by == self.config.timestamp_field:
                keyfn = lambda key: self.doc_meta[key]["ts_us"]  # noqa: E731
            else:
                keyfn = lambda key: self.doc_meta[key][sort_by]  # noqa: E731
            ranked = sorted(
                scores,
                key=lambda key: (
                    -keyfn(key) if sort_desc else keyfn(key),
                    key[0],
                    key[1],
                ),
            )
            hits = [
                OracleHit(
                    split_id_for_partition("b0000", key[0]),
                    key[1],
                    float(keyfn(key)),
                    self.doc_meta[key]["conv_id"],
                    self.doc_meta[key]["turn_idx"],
                )
                for key in ranked[offset : offset + k]
            ]
            return num_hits, hits
        ranked = sorted(
            scores.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        hits = [
            OracleHit(
                split_id_for_partition("b0000", key[0]),
                key[1],
                score,
                self.doc_meta[key]["conv_id"],
                self.doc_meta[key]["turn_idx"],
            )
            for key, score in ranked[offset : offset + k]
        ]
        return num_hits, hits
