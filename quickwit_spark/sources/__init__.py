"""Sources: deterministic transcript generation + table readers.

The reference's source zoo (file/Kafka/Kinesis/ingest-API —
quickwit-indexing/src/source/) maps to Spark readers; batch builds read
the transcripts table (Parquet here, Iceberg in production — the
iceberg runtime jar is not in this sandbox, see sources/reader.py).
"""
