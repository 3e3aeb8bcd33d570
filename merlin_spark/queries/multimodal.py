"""Multimodal column plumbing — image/audio/video as opaque `binary`
columns with typed metadata (task brief).

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (deterministic fake); everything Spark-side —
binary schema, Arrow batch shape through mapInPandas, partitioning,
metadata struct — is real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from ..io_util import load
from .registry import query

FRAME_BYTES = 16
FRAME_STRIDE = 64


def decode_image(payload: bytes) -> "np.ndarray":
    """Real codec hook — requires PIL/libjpeg, absent in this container.

    STUB: callers must catch NotImplementedError or use
    fake_decode_features (deterministic) instead."""
    raise NotImplementedError(
        "image decode requires an image codec library not present in this "
        "environment; use fake_decode_features for plumbing tests"
    )


def fake_decode_features(payload: bytes, n: int = 4) -> list[float]:
    """Deterministic fake 'decoder': digest bytes → n floats in [0,1).
    Stands in for decode→feature-extract so the Spark plumbing (binary
    in, float vector out, Arrow batch transfer) is fully exercised."""
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(n)]


@query(
    "mm_binary_meta",
    """SELECT doc_id,
              octet_length(encode(text)) AS n_bytes,
              md5(text) AS content_md5,
              'application/octet-stream' AS mime
       FROM documents""",
)
def mm_binary_meta(spark, sf_dir):
    """Binary payload + typed metadata, all JVM-side: the text column
    stands in for an opaque media blob (encode → binary)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
        F.md5("text").alias("content_md5"),
        F.lit("application/octet-stream").alias("mime"),
    )


@query("mm_frame_sample")  # binary frames not SQL-comparable ⇒ rows-only
def mm_frame_sample(spark, sf_dir):
    """'Video' frame sampling over binary payloads via mapInPandas:
    every FRAME_STRIDE bytes emit one FRAME_BYTES slice as a frame row
    (1→N expansion). The batch shape — iterator of pandas frames with a
    bytes column in, exploded frames out — is exactly the real
    frame-sampler plumbing; the codec is the stub above."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def sample(batches):
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": [], "feat0": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                for k, off in enumerate(range(0, len(buf), FRAME_STRIDE)):
                    frame = buf[off : off + FRAME_BYTES]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(k)
                    out["frame"].append(frame)
                    out["feat0"].append(fake_decode_features(frame, 1)[0])
            yield pd.DataFrame(out)

    return d.mapInPandas(
        sample, "doc_id long, frame_idx int, frame binary, feat0 double"
    ).orderBy("doc_id", "frame_idx")


@query("mm_embed_binary")  # rows-only (binary + fake features)
def mm_embed_binary(spark, sf_dir):
    """Decode→feature-extract shape: binary payload → fixed-dim float
    vector via vectorized batches (deterministic fake decoder)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )

    def featurize(batches):
        for pdf in batches:
            feats = [fake_decode_features(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return d.mapInPandas(featurize, "doc_id long, features array<double>").orderBy(
        "doc_id"
    )
