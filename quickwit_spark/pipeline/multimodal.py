"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched
``mapInPandas`` kernels.

The decode step is STUBBED (no image/audio libraries in this
container): ``decode_image_batch`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decoder
derives (width, height, n_frames) from the payload bytes. Everything
around the stub — schema, batch shape, partition-preserving plumbing,
metadata extraction — is real and tested; swapping in PIL/ffmpeg later
changes one function.

Scale: payloads stay in executor Arrow memory end-to-end; metadata-only
queries never deserialize payloads (column pruning skips the binary
column at the Parquet scan).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, byte_len long, header string, "
    "width int, height int, n_frames int"
)


def attach_fake_payload(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Test helper: synthesize a deterministic binary payload column
    from existing data (stands in for real image/audio bytes)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
    )


def decode_image_batch(payloads: pd.Series, fake: bool) -> pd.DataFrame:
    """Decode a batch of image payloads → (width, height). STUB: real
    decoding needs PIL/libvips, not present here."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "environment; run with fake=True for the deterministic stub"
        )
    # deterministic fake: dimensions derived from payload bytes
    lens = payloads.str.len().astype("int64")
    first = payloads.apply(lambda b: b[0] if len(b) else 0).astype("int64")
    return pd.DataFrame(
        {
            "width": ((first % 64 + 1) * 16).astype("int32"),
            "height": ((lens % 64 + 1) * 16).astype("int32"),
        }
    )


def extract_media_metadata(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas metadata extraction over (media_id, payload, kind):
    byte length + header hex + kind-specific decode (stubbed). Arrow
    batches in/out; partitioning of the input is preserved (narrow)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from quickwit_spark.operators.build import limit_worker_threads

        limit_worker_threads()
        for pdf in batches:
            n = len(pdf)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "byte_len": pdf["payload"].str.len().astype("int64"),
                    "header": pdf["payload"].apply(lambda b: bytes(b[:4]).hex()),
                    "width": np.zeros(n, dtype="int32"),
                    "height": np.zeros(n, dtype="int32"),
                    "n_frames": np.ones(n, dtype="int32"),
                }
            )
            img = (out["kind"] == "image").to_numpy()
            if img.any():
                dec = decode_image_batch(pdf.loc[img, "payload"], fake)
                w = out["width"].to_numpy().copy()
                h = out["height"].to_numpy().copy()
                w[img] = dec["width"].to_numpy()
                h[img] = dec["height"].to_numpy()
                out["width"], out["height"] = w, h
            vid = out["kind"] == "video"
            if vid.any():
                # fake frame sampling: frame count from byte length
                out.loc[vid, "n_frames"] = (
                    out.loc[vid, "byte_len"] % 24 + 1
                ).astype("int32")
            yield out

    # narrow op: the caller's partitioning is preserved (size the input
    # with textstats.ensure_parallelism when it arrives as one small
    # scan partition)
    return df.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 8) -> DataFrame:
    """Explode videos into sampled frame rows (frame indices only — the
    pixel decode is behind the same stub). Demonstrates the
    one-to-many mapInPandas shape used for real frame extraction."""
    meta = df
    return (
        meta.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
