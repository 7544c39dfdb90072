"""Multimodal plumbing tests: the mapInPandas decode/resize/frame-sample
fields that are NOT derivable from byte length in SQL (mean_byte,
sample_checksum) are verified against a local recomputation here.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from big_data_analysis_diseases_outbreaks_spark.operators.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    fake_decode_features,
    resize_and_frame_sample,
    with_binary_payload,
)
from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

from .conftest import SF_SMALL


def _payloads(spark, n=50):
    docs = load_table(spark, SF_SMALL, "documents").where(F.col("doc_id") < n)
    return {
        r["doc_id"]: bytes(r["payload"])
        for r in with_binary_payload(docs).collect()
    }


def test_decode_mean_byte_matches_local(spark):
    docs = load_table(spark, SF_SMALL, "documents").where(F.col("doc_id") < 50)
    payloads = _payloads(spark)
    decoded = {
        r["doc_id"]: r
        for r in fake_decode_features(with_binary_payload(docs)).collect()
    }
    assert decoded.keys() == payloads.keys()
    for doc_id, b in payloads.items():
        r = decoded[doc_id]
        assert r["n_bytes"] == len(b)
        expected = round(float(np.frombuffer(b, dtype=np.uint8).mean()), 4)
        assert r["mean_byte"] == expected
        assert r["n_pixels"] == r["width"] * r["height"]


def test_frame_sample_checksum_matches_local(spark):
    docs = load_table(spark, SF_SMALL, "documents").where(F.col("doc_id") < 50)
    payloads = _payloads(spark)
    out = {
        r["doc_id"]: r
        for r in resize_and_frame_sample(
            with_binary_payload(docs), stride=2
        ).collect()
    }
    for doc_id, b in payloads.items():
        r = out[doc_id]
        assert r["resized_bytes"] == len(b[::2])
        assert r["n_frames"] == -(-len(b) // FRAME_BYTES)
        assert r["n_sampled"] == -(-r["n_frames"] // FRAME_STRIDE)
        expected = sum(
            sum(b[f : f + FRAME_BYTES])
            for f in range(0, len(b), FRAME_BYTES * FRAME_STRIDE)
        )
        assert r["sample_checksum"] == expected


def test_documents_fixture_is_ascii(spark):
    """Precondition of the multimodal_byte_histogram oracle: payload
    bytes equal text codepoints, which holds ONLY for pure-ASCII text
    (a multi-byte character would make Spark count UTF-8 bytes while
    the oracle counts characters). Pin it so a future testdata
    generation with non-ASCII text fails HERE, not as a confusing
    parity mismatch."""
    from pyspark.sql import functions as F

    from big_data_analysis_diseases_outbreaks_spark.sources.tables import load_table

    from .conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    non_ascii = docs.where(
        F.octet_length(F.encode(F.col("text"), "UTF-8"))
        != F.length(F.col("text"))
    ).count()
    assert non_ascii == 0, (
        f"{non_ascii} non-ASCII documents: the byte-histogram oracle's "
        "byte==codepoint equivalence no longer holds"
    )
