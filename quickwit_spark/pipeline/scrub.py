"""Text scrubbing / normalization operators for training-data
pipelines: PII redaction (emails, IPv4s, international phone numbers),
URL extraction, and whitespace/control-character normalization.

All pure built-in-expression plans (regexp_replace / regexp_extract_all
run in whole-stage codegen; zero Python in the executor hot path), so a
100 TB corpus scrub is an embarrassingly parallel narrow map with the
projection pruned to (id, text). Patterns are restricted to syntax that
behaves identically in Java regex (Spark) and RE2 (DuckDB) so each op
has a bit-for-bit ANSI-SQL twin in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# deliberately simple, cross-engine-identical patterns; a production
# deployment would swap in a vetted PII ruleset — the PLAN (narrow map,
# count columns, redaction placeholders) is the part that must scale
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PHONE_RE = "\\+[0-9]{9,14}"
URL_RE = "https?://[^ \\t\\n]+"


def _count(text_col, pattern: str):
    return F.size(F.regexp_extract_all(text_col, F.lit(pattern), F.lit(0)))


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails, IPv4 addresses, and international phone numbers,
    keeping per-doc match counts (the audit trail a redaction pass
    needs). Order matters: emails first, so the IPv4 pattern cannot
    fire inside an already-redacted host part."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(c, EMAIL_RE, "<EMAIL>"),
                IPV4_RE, "<IP>",
            ),
            PHONE_RE, "<PHONE>",
        ).alias("text_scrubbed"),
        _count(c, EMAIL_RE).cast("long").alias("n_emails"),
        _count(c, IPV4_RE).cast("long").alias("n_ipv4"),
        _count(c, PHONE_RE).cast("long").alias("n_phones"),
    )


def url_extract(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per URL occurrence: (id, url, domain). Downstream uses:
    per-domain corpus stats, blocklist joins (broadcast the blocklist),
    dedup keys. Explode keeps the op a narrow map followed by a
    generator — still no shuffle."""
    urls = F.regexp_extract_all(F.col(text_col), F.lit(URL_RE), F.lit(0))
    out = df.select(F.col(id_col), F.explode(urls).alias("url"))
    return out.select(
        F.col(id_col),
        F.col("url"),
        F.regexp_extract(F.col("url"), "https?://([^/ ]+)", 1).alias("domain"),
    )


def normalize_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Canonicalize whitespace: strip ASCII control characters, collapse
    whitespace runs to one space, trim. Reports the size delta so a
    pipeline can flag documents that were mostly junk."""
    c = F.col(text_col)
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(c, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", ""),
            "[ \\t\\n\\r]+", " ",
        )
    )
    return df.select(
        F.col(id_col),
        cleaned.alias("text_norm"),
        F.length(c).cast("long").alias("n_chars_raw"),
        F.length(cleaned).cast("long").alias("n_chars_norm"),
    )
