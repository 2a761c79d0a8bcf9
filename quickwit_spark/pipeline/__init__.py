"""Training-data pipeline operators over document/embedding tables:
deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
cosine), similarity search (brute-force + LSH-bucketed ANN), text
analysis (token counting, quality scoring, language ID,
fingerprinting), and multimodal column plumbing.

These go beyond the reference's operator set (Quickwit is a search
engine, not a data pipeline) but reuse its design stance: declarative
DataFrame plans that Catalyst can push down and shuffle efficiently;
no per-row Python anywhere — everything is built-in
``pyspark.sql.functions`` (JVM/WSCG) or Arrow-batched pandas UDFs.
"""
