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


# Byte-histogram feature extraction: binary → fixed-dim exact-integer
# features. The payloads are UTF-8 of ASCII text, so every byte equals
# the codepoint of the corresponding character — the whole feature
# vector is SQL-derivable and value-checked, not just the lengths.
@register(
    "multimodal_byte_histogram",
    oracle=("""
WITH by_char AS (
  SELECT doc_id, octet_length(encode(text)) AS n_bytes,
         unnest(list_transform(range(1, length(text) + 1),
                i -> ord(substr(text, i, 1)) // 32)) AS bucket
  FROM documents),
hist AS (
  SELECT doc_id, MAX(n_bytes) AS n_bytes,
         """ + ",\n         ".join(
              f"CAST(COUNT(*) FILTER (WHERE bucket = {i}) AS BIGINT) AS h{i}"
              for i in range(8)
          ) + """
  FROM by_char GROUP BY doc_id)
SELECT doc_id, n_bytes, h0, h1, h2, h3, h4, h5, h6, h7,
       CAST((SELECT MIN(i) FROM (VALUES (0), (1), (2), (3), (4), (5), (6), (7)) v(i)
             WHERE (CASE i WHEN 0 THEN h0 WHEN 1 THEN h1 WHEN 2 THEN h2
                           WHEN 3 THEN h3 WHEN 4 THEN h4 WHEN 5 THEN h5
                           WHEN 6 THEN h6 ELSE h7 END)
                   = greatest(h0, h1, h2, h3, h4, h5, h6, h7))
            AS INTEGER) AS dominant_bucket
FROM hist
""").strip(),
)
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import byte_histogram_features

    docs = load_table(spark, sf_dir, "documents")
    return byte_histogram_features(with_binary_payload(docs))


# Patch extraction (the ViT preprocessing shape): payload → fixed 64-byte
# patches. Payloads are UTF-8 of ASCII text, so each patch's bytes equal
# the corresponding substring and the PER-PATCH md5 is fully
# SQL-derivable — the whole exploded output is value-checked, not just
# counts.
@register(
    "multimodal_patchify",
    oracle="""
SELECT doc_id,
       CAST(i AS INTEGER) AS patch_idx,
       CAST(length(substr(text, i * 64 + 1, 64)) AS INTEGER) AS patch_len,
       md5(substr(text, i * 64 + 1, 64)) AS patch_md5
FROM documents,
     LATERAL UNNEST(range(CAST(ceil(greatest(length(text), 1) / 64.0) AS BIGINT)))
       AS u(i)
""".strip(),
)
def multimodal_patchify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import patchify

    docs = load_table(spark, sf_dir, "documents")
    return patchify(with_binary_payload(docs), patch_bytes=64)


# --- exact binary dedup (content-hash grouping over media payloads) -------
# The multimodal twin of dedup_exact: byte-identical payload detection
# via md5 over the BINARY column — the first pass of any media dedup
# pipeline (cheap hash grouping BEFORE perceptual/embedding near-dup).
# JVM md5 on payload bytes; only (hash, count, canonical id) aggregates
# leave the scan, never payload bytes — at 100 TB the shuffle carries
# 16-byte digests. Canonical = min doc_id (the dedup_keep_best
# convention); singleton groups are retained with n_copies = 1 so the
# output is a full manifest, is_dup flags the actual duplicates.

@register(
    "multimodal_exact_dedup",
    oracle="""
SELECT md5(text) AS payload_md5,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       MIN(doc_id) AS canonical_doc_id,
       CAST(CASE WHEN COUNT(*) > 1 THEN 1 ELSE 0 END AS BIGINT) AS is_dup
FROM documents
GROUP BY md5(text)
""".strip(),
)
def multimodal_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(docs)
    return payloads.groupBy(F.md5(F.col("payload")).alias("payload_md5")).agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("canonical_doc_id"),
        (F.count(F.lit(1)) > 1).cast("long").alias("is_dup"),
    )


# --- perceptual average-hash near-dup buckets (round 11b) -------------------
# The aHash step of an image near-dup pipeline, run on the opaque
# payload bytes: sample 64 evenly-strided bytes ("pixels" of the
# 8x8 thumbnail), threshold each against the integer mean of the
# sample, pack the 64 bits into two 32-bit halves, and bucket by the
# signature. Unlike multimodal_exact_dedup's md5, the signature
# IGNORES small payload edits away from the sampled positions — the
# property a perceptual hash exists for — so buckets can hold
# payloads whose md5s differ (n_distinct_payloads < n_docs). Pure
# integer arithmetic (strided ord(), floor mean, bit sum) — identical
# in both engines; a real decoder would swap the byte sampler for
# decoded luma, nothing else changes. Shape: one narrow map over the
# scan, one hash aggregate on the signature.

_AHASH_BITS = 64


@register(
    "multimodal_ahash_dedup",
    oracle=f"""
WITH px AS (
  SELECT doc_id, md5(text) AS payload_md5,
         list_transform(range(0, {_AHASH_BITS}),
             i -> ord(substr(text,
                  CAST(1 + (i * length(text)) // {_AHASH_BITS} AS BIGINT),
                  1))) AS b
  FROM documents WHERE length(text) >= 1),
sig AS (
  SELECT doc_id, payload_md5,
         list_sum(b) // {_AHASH_BITS} AS mean_b, b
  FROM px),
bits AS (
  SELECT doc_id, payload_md5,
         CAST(list_sum(list_transform(range(1, 33),
              i -> CASE WHEN b[i] > mean_b
                   THEN 2 ** (i - 1) ELSE 0 END)) AS BIGINT) AS sig_lo,
         CAST(list_sum(list_transform(range(33, {_AHASH_BITS} + 1),
              i -> CASE WHEN b[i] > mean_b
                   THEN 2 ** (i - 33) ELSE 0 END)) AS BIGINT) AS sig_hi
  FROM sig)
SELECT sig_hi, sig_lo,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT payload_md5) AS BIGINT) AS n_distinct_payloads,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id
FROM bits GROUP BY sig_hi, sig_lo
""".strip(),
)
def multimodal_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").where(
        F.length("text") >= 1
    )
    tlen = F.length("text")
    b = F.transform(
        F.sequence(F.lit(0), F.lit(_AHASH_BITS - 1)),
        lambda i: F.ascii(
            F.col("text").substr(
                (F.lit(1) + (i * tlen - (i * tlen) % _AHASH_BITS)
                 / _AHASH_BITS).cast("int"),
                F.lit(1),
            )
        ),
    )
    px = docs.select(
        "doc_id", F.md5(F.col("text")).alias("payload_md5"), b.alias("b")
    )
    mean_b = F.expr(
        f"aggregate(b, 0L, (a, x) -> a + x) div {_AHASH_BITS}"
    )
    sig = px.select("doc_id", "payload_md5", "b", mean_b.alias("mean_b"))

    def _half(lo: int, hi: int, base: int):
        return (
            F.aggregate(
                F.sequence(F.lit(lo), F.lit(hi)),
                F.lit(0).cast("long"),
                lambda a, i: a
                + F.when(
                    F.element_at("b", i.cast("int")) > F.col("mean_b"),
                    # 2^(i-base) via pow: exact in double through 2^31,
                    # and shiftleft() only takes a literal bit count
                    F.pow(F.lit(2.0), (i - base).cast("double")).cast(
                        "long"
                    ),
                ).otherwise(F.lit(0).cast("long")),
            )
        ).cast("long")

    bits = sig.select(
        "doc_id",
        "payload_md5",
        _half(1, 32, 1).alias("sig_lo"),
        _half(33, _AHASH_BITS, 33).alias("sig_hi"),
    )
    return bits.groupBy("sig_hi", "sig_lo").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("payload_md5").cast("long").alias(
            "n_distinct_payloads"
        ),
        F.min("doc_id").cast("long").alias("canonical_doc_id"),
    )


# --- ViT patchify tile manifest (round 12) ------------------------------------
# The preprocessing planner every vision-transformer ingest runs: how
# many P×P patches does each image yield, and what padded canvas does
# it need? Pure integer arithmetic on the typed metadata columns
# (deterministic fake dims — the documented env-gated decode
# convention, multimodal_decode), so the whole manifest value-oracles:
# n_tiles = ceil(w/P)·ceil(h/P) with ceil as (x+P−1) div P. The
# SEQUENCE BUDGET (n_tiles + 1 CLS token) is what a packing planner
# consumes downstream. Narrow map over the scan, no shuffle.

_TILE_P = 16


@register(
    "multimodal_tile_manifest",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) % 64 + 1 AS BIGINT) AS width,
         CAST(octet_length(encode(text)) // 64 % 64 + 1 AS BIGINT) AS height
  FROM documents)
SELECT doc_id, width, height,
       CAST((width + {_TILE_P - 1}) // {_TILE_P} AS BIGINT) AS n_tiles_x,
       CAST((height + {_TILE_P - 1}) // {_TILE_P} AS BIGINT) AS n_tiles_y,
       CAST(((width + {_TILE_P - 1}) // {_TILE_P})
            * ((height + {_TILE_P - 1}) // {_TILE_P}) AS BIGINT) AS n_tiles,
       CAST(((width + {_TILE_P - 1}) // {_TILE_P}) * {_TILE_P} AS BIGINT)
         AS padded_w,
       CAST(((height + {_TILE_P - 1}) // {_TILE_P}) * {_TILE_P} AS BIGINT)
         AS padded_h,
       CAST(((width + {_TILE_P - 1}) // {_TILE_P})
            * ((height + {_TILE_P - 1}) // {_TILE_P}) + 1 AS BIGINT)
         AS seq_len
FROM m
""".strip(),
)
def multimodal_tile_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    nb = F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long")
    w = (nb % 64 + 1).cast("long")
    h = (F.expr("octet_length(encode(text, 'UTF-8')) div 64") % 64 + 1).cast(
        "long"
    )
    tx = F.expr(f"(width + {_TILE_P - 1}) div {_TILE_P}")
    ty = F.expr(f"(height + {_TILE_P - 1}) div {_TILE_P}")
    return (
        docs.select("doc_id", w.alias("width"), h.alias("height"))
        .select(
            "doc_id",
            "width",
            "height",
            tx.cast("long").alias("n_tiles_x"),
            ty.cast("long").alias("n_tiles_y"),
            (tx * ty).cast("long").alias("n_tiles"),
            (tx * _TILE_P).cast("long").alias("padded_w"),
            (ty * _TILE_P).cast("long").alias("padded_h"),
            (tx * ty + 1).cast("long").alias("seq_len"),
        )
    )
