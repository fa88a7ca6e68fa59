"""Multimodal-column plumbing (north-star; SURVEY.md §7.6).

Design: media lives in opaque ``BinaryType`` columns with typed
metadata beside it.  Heavy per-item work (decode, resize, feature
extraction, frame sampling) runs as Arrow-batched ``mapInPandas`` —
one Python process per partition, columnar transfer, never per-row
UDF calls.

The actual codec step is STUBBED (image/audio libraries are not in
this container): ``decode_image`` raises ``NotImplementedError`` and
``extract_metadata`` derives deterministic fake dimensions from the
payload digest.  The Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.registry import ensure_parallelism

METADATA_SCHEMA = (
    "doc_id bigint, n_bytes bigint, payload_md5 string, width int, height int"
)


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Materialize an opaque binary payload column.

    In production this is the raw image/audio bytes read from object
    storage (spark.read.format('binaryFile') or a manifest join); here
    the payload is the UTF-8 encoding of the text column so tests are
    hermetic.  Output: doc_id, payload (binary).
    """
    return ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_image(payload: bytes) -> object:
    """Decode an image payload.  STUB: no codec libraries in this
    environment — wire Pillow/torchvision here in production."""
    raise NotImplementedError(
        "image decoding requires a codec library not present in this container"
    )


def _fake_dims(digest_hex: str) -> tuple[int, int]:
    """Deterministic stand-in for decoded dimensions: derived from the
    payload digest so every engine (and the oracle) agrees."""
    h = int(digest_hex[:15], 16)  # 60-bit prefix, same as functions.hashing
    return 64 + h % 960, 64 + (h // 960) % 960


def extract_metadata(df: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    mapInPandas streams columnar batches; per batch the work is
    vectorized pandas.  This is exactly where a real decode/resize/
    feature step plugs in (swap _fake_dims for decode_image output).
    Input: doc_id, payload.  Output: METADATA_SCHEMA.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            dims = digests.map(_fake_dims)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "payload_md5": digests,
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                }
            )

    return df.mapInPandas(batches, METADATA_SCHEMA)


def resize_payload(df: DataFrame, max_dim: int = 256) -> DataFrame:
    """Resize plumbing over decoded dimensions: scale each item so its
    longer side is ≤ max_dim (aspect preserved), reporting the new
    dims and projected byte size.  The arithmetic is the real resize
    contract; the pixel work is where ``decode_image`` + an image lib
    plug in (stubbed per container limits — dims come from
    extract_metadata's deterministic fake).

    Input: doc_id, payload.  Output: doc_id, width, height, new_width,
    new_height, est_bytes.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            dims = digests.map(_fake_dims)
            w = dims.map(lambda d: d[0]).astype("int32")
            h = dims.map(lambda d: d[1]).astype("int32")
            longer = pd.concat([w, h], axis=1).max(axis=1)
            scale = (max_dim / longer).clip(upper=1.0)
            nw = (w * scale).astype("int32").clip(lower=1)
            nh = (h * scale).astype("int32").clip(lower=1)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "new_width": nw,
                    "new_height": nh,
                    "est_bytes": (nw.astype("int64") * nh.astype("int64") * 3),
                }
            )

    return df.mapInPandas(
        batches,
        "doc_id bigint, width int, height int, new_width int, new_height int,"
        " est_bytes bigint",
    )


def sample_frames(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Frame-sampling plumbing: emit one row per sampled offset of each
    payload (video frame-sample shape without the codec).  Demonstrates
    a fan-out mapInPandas (input row → N output rows).
    Output: doc_id, frame_index, frame_offset.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = max(1, len(payload) // every_n_bytes + 1)
                for i in range(n):
                    rows.append((doc_id, i, i * every_n_bytes))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_index", "frame_offset"]
            ).astype({"doc_id": "int64", "frame_index": "int32", "frame_offset": "int64"})

    return df.mapInPandas(batches, "doc_id bigint, frame_index int, frame_offset bigint")


FEATURES_BINS = 8
FEATURES_SCHEMA = "doc_id bigint, n_bytes bigint, " + ", ".join(
    f"f{k} double" for k in range(FEATURES_BINS)
)


def extract_features(df: DataFrame) -> DataFrame:
    """REAL (non-stub) vectorized feature extraction over binary
    payloads: an L2-normalized byte-value histogram (byte % 8 bins) —
    the classic cheap content signature, and the exact plumbing shape
    of a neural feature extractor (payload bytes in, fixed-width float
    vector out, Arrow-batched, numpy-vectorized per batch).

    Rounding uses decimal HALF_UP (not numpy's half-even) so the
    published 6dp values match Spark's ``round()`` and the DuckDB
    oracle bit-for-bit.

    Input: doc_id, payload.  Output: FEATURES_SCHEMA.
    """
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    q = Decimal("0.000001")

    def r6(x: float) -> float:
        return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:  # np.stack requires >= 1 array
                yield pd.DataFrame(
                    {c: [] for c in ["doc_id", "n_bytes"]
                     + [f"f{k}" for k in range(FEATURES_BINS)]}
                )
                continue
            out = {"doc_id": pdf["doc_id"], "n_bytes": pdf["payload"].map(len).astype("int64")}
            counts = np.stack(
                [
                    np.bincount(
                        np.frombuffer(bytes(b), dtype=np.uint8) % FEATURES_BINS,
                        minlength=FEATURES_BINS,
                    )
                    for b in pdf["payload"]
                ]
            ).astype("int64")
            norms = np.sqrt((counts * counts).sum(axis=1))
            with np.errstate(invalid="ignore"):
                feats = counts / norms[:, None]
            for k in range(FEATURES_BINS):
                # zero-byte payload -> norm 0 -> NULL features, matching
                # SQL division-by-zero semantics (DuckDB 0/0 = NULL)
                out[f"f{k}"] = [
                    None if n == 0 else r6(v)
                    for v, n in zip(feats[:, k], norms)
                ]
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, FEATURES_SCHEMA)
