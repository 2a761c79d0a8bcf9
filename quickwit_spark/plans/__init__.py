"""Driver-side planning: query AST, split catalog, pruning, merge policy.

These replace Quickwit's metastore + root-search planning layer
(quickwit-metastore, quickwit-search/src/root.rs) — plain Python that
decides *which* Spark jobs run over *which* splits; no Catalyst rules
are needed (SURVEY.md §4).
"""
