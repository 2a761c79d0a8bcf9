"""Training-data pipeline operators over document/embedding tables:
deduplication (exact incl. streaming first-seen, MinHash+LSH, SimHash,
n-gram Jaccard, embedding cosine + hyperplane-LSH, exact-substring
spans with keep-first and scrub), span-level and k-gram
decontamination, similarity search (brute-force, LSH-bucketed and IVF
ANN, persisted partition-pruned index), text analysis (token counting,
quality scoring, language ID, fingerprinting, repetition signals,
corpus unigram-LM scoring), PII scrub / URL extract / normalization,
sampling (stratified, temperature-based domain mixing), training
layout (sequence packing, sliding-window chunking), sessionization
(batch + stateful streaming), and multimodal column plumbing.

These go beyond the reference's operator set (Quickwit is a search
engine, not a data pipeline) but reuse its design stance: declarative
DataFrame plans that Catalyst can push down and shuffle efficiently;
no per-row Python anywhere — everything is built-in
``pyspark.sql.functions`` (JVM/WSCG) or Arrow-batched pandas UDFs.
"""
