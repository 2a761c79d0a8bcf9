"""Structured Streaming ingest: continuous sources → incremental split
builds with exactly-once publish (the KafkaSource/FileSource +
checkpoint story of the reference, re-expressed as foreachBatch)."""
