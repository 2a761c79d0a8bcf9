"""Spark-side operators: index build, search kernel, merge, aggregations.

These are the four custom pieces identified in SURVEY.md §4; everything
else (shuffle, retry, partial/final agg, pruning pushdown) is delegated
to Spark/Catalyst.
"""
