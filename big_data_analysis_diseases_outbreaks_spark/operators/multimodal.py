"""Multimodal (binary-payload) column plumbing.

Images/audio/video are opaque ``binary`` columns with typed metadata; the
decode/feature-extract step runs as ``mapInPandas`` over Arrow batches.
The actual media decode is STUBBED (no image/audio libraries in this
container) behind :func:`decode_image_real`; :func:`fake_decode_features`
is a deterministic stand-in computing the same *shape* of output, so the
Spark-side plumbing — schema, batch iteration, partitioning — is real and
oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, width INT, height INT, n_pixels BIGINT, "
    "mean_byte DOUBLE"
)


def decode_image_real(payload: bytes) -> dict:
    """Real media decode — requires an image library not present here."""
    raise NotImplementedError(
        "media decode requires PIL/opencv which are not installed; "
        "use fake_decode_features for the deterministic test path"
    )


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column (UTF-8 bytes of the text stand in
    for an encoded media payload) + typed metadata."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/raw").alias("mime"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
        ).alias("media_meta"),
    )


def fake_decode_features(binary_docs: DataFrame) -> DataFrame:
    """mapInPandas 'decode': deterministic pseudo-dimensions from the
    payload bytes. Arrow-batched; no shuffle — a pure narrow map, which
    is exactly the plan a real decoder would want at 100 TB."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len).astype("int64")
            width = (n % 64 + 1).astype("int32")
            height = (n // 64 % 64 + 1).astype("int32")
            mean_byte = pdf["payload"].map(
                lambda b: round(sum(b) / len(b), 4) if len(b) else 0.0
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "width": width,
                    "height": height,
                    "n_pixels": (width.astype("int64") * height),
                    "mean_byte": mean_byte,
                }
            )

    return binary_docs.mapInPandas(decode, schema=DECODE_SCHEMA)
