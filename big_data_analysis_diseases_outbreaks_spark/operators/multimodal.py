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
        import numpy as np

        for pdf in batches:
            n = pdf["payload"].map(len).astype("int64")
            width = (n % 64 + 1).astype("int32")
            height = (n // 64 % 64 + 1).astype("int32")
            mean_byte = pdf["payload"].map(
                lambda b: round(float(np.frombuffer(b, dtype=np.uint8).mean()), 4)
                if len(b)
                else 0.0
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


RESIZE_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, resized_bytes BIGINT, n_frames BIGINT, "
    "n_sampled BIGINT, sample_checksum BIGINT"
)

FRAME_BYTES = 256  # stand-in frame size for the fake video payload
FRAME_STRIDE = 4   # keep every 4th frame


def resize_and_frame_sample(
    binary_docs: DataFrame, stride: int = 2
) -> DataFrame:
    """mapInPandas resize + frame-sample plumbing (real decoders swap in
    at :func:`decode_image_real`):

    - resize: keep every ``stride``-th payload byte (stand-in for a
      downsample; output length = ceil(n/stride));
    - frame sample: view the payload as FRAME_BYTES-sized frames and keep
      every FRAME_STRIDE-th, checksumming kept bytes (deterministic,
      order-independent within a doc).

    Narrow map over Arrow batches — at 100 TB this pipelines behind the
    scan with no shuffle, the same plan a real transcoder stage wants.
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n = pdf["payload"].map(len).astype("int64")
            resized = pdf["payload"].map(lambda b: len(b[::stride])).astype("int64")
            n_frames = -(-n // FRAME_BYTES)  # ceil div
            n_sampled = -(-n_frames // FRAME_STRIDE)

            def checksum(b: bytes) -> int:
                a = np.frombuffer(b, dtype=np.uint8)
                total = 0
                for f in range(0, len(a), FRAME_BYTES * FRAME_STRIDE):
                    total += int(a[f : f + FRAME_BYTES].sum())
                return total

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "resized_bytes": resized,
                    "n_frames": n_frames,
                    "n_sampled": n_sampled,
                    "sample_checksum": pdf["payload"].map(checksum).astype("int64"),
                }
            )

    return binary_docs.mapInPandas(work, schema=RESIZE_SCHEMA)


HIST_BUCKETS = 8  # byte value >> 5 → 8 coarse buckets

HIST_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, "
    + ", ".join(f"h{i} BIGINT" for i in range(HIST_BUCKETS))
    + ", dominant_bucket INT"
)


def byte_histogram_features(binary_docs: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: fixed-dim byte-distribution
    features from the opaque payload (bucket = byte >> 5 → 8 exact
    integer counts + argmax bucket, min-id tie-break). This is the
    feature-extractor plumbing shape — binary in, fixed-width numeric
    vector out, narrow map, Arrow-batched — that a real CLIP/audio
    embedder slots into at :func:`decode_image_real`."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(a >> 5, minlength=HIST_BUCKETS)
                rows.append(
                    (int(doc_id), len(a), *map(int, hist), int(hist.argmax()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_bytes"]
                + [f"h{i}" for i in range(HIST_BUCKETS)]
                + ["dominant_bucket"],
            )

    return binary_docs.mapInPandas(extract, schema=HIST_SCHEMA)


def patchify(binary_docs: DataFrame, patch_bytes: int = 64) -> DataFrame:
    """ViT-style patch extraction: one payload → N fixed-size patches
    (doc_id, patch_idx, patch_len, patch_md5). The 1→N expansion runs as
    a narrow ``mapInPandas`` — rows multiply ~n_bytes/patch_bytes× inside
    the Arrow batch but memory stays bounded by batch size, and no
    shuffle happens until a consumer keys by something. A real image
    patchifier swaps the byte slicing for pixel-grid slicing behind the
    same signature (see decode_image_real's stub contract)."""
    import hashlib

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, md5s = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(0, max(len(b), 1), patch_bytes):
                    chunk = b[i : i + patch_bytes]
                    ids.append(doc_id)
                    idxs.append(i // patch_bytes)
                    lens.append(len(chunk))
                    md5s.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "patch_idx": pd.Series(idxs, dtype="int32"),
                    "patch_len": pd.Series(lens, dtype="int32"),
                    "patch_md5": pd.Series(md5s, dtype="object"),
                }
            )

    return binary_docs.mapInPandas(
        work, "doc_id LONG, patch_idx INT, patch_len INT, patch_md5 STRING"
    )
