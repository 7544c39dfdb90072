"""Multimodal-column queries: binary payload + mapInPandas decode.

The decode itself is a deterministic fake (no media libs in-container,
operators/multimodal.py), but everything Spark-side — binary column,
Arrow batching, schema — is real. The byte-length-derived fields are
oracle-checkable from the text length; ``mean_byte`` (not derivable in
SQL) is asserted in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import (
    fake_decode_features,
    resize_and_frame_sample,
    with_binary_payload,
)
from ..sources.tables import load_table
from . import register


@register(
    "multimodal_decode",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 64 + 1 AS INTEGER) AS width,
       CAST(octet_length(encode(text)) // 64 % 64 + 1 AS INTEGER) AS height,
       CAST((octet_length(encode(text)) % 64 + 1)
            * (octet_length(encode(text)) // 64 % 64 + 1) AS BIGINT) AS n_pixels
FROM documents
""".strip(),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    decoded = fake_decode_features(with_binary_payload(docs))
    return decoded.select("doc_id", "n_bytes", "width", "height", "n_pixels")


# Resize + frame-sample plumbing. The count fields are derivable from the
# byte length in SQL (stride-2 resize keeps ceil(n/2) bytes; 256-byte
# frames sampled every 4th); the checksum is covered in
# tests/test_multimodal (not SQL-derivable from text length alone).
@register(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST((octet_length(encode(text)) + 1) // 2 AS BIGINT) AS resized_bytes,
       CAST((octet_length(encode(text)) + 255) // 256 AS BIGINT) AS n_frames,
       CAST(((octet_length(encode(text)) + 255) // 256 + 3) // 4 AS BIGINT)
         AS n_sampled
FROM documents
""".strip(),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = resize_and_frame_sample(with_binary_payload(docs), stride=2)
    return out.select("doc_id", "n_bytes", "resized_bytes", "n_frames", "n_sampled")
