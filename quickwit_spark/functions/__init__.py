"""Vectorized text/codec kernels — the 'slow path done fast' layer.

Everything here is either pure-Python reference logic shared with the
pytest oracle, or numpy/pandas vectorized code used inside Arrow UDFs.
No per-row Python runs inside a Spark job (BASELINE.json input_hint).
"""
