"""Vectorized frame sampler (VERDICT r2 wrong #2 / task #4): the
numpy/Arrow batch body must emit byte-for-byte the same frames as the
straightforward per-row reference loop, with no per-element Python on
the data path."""

import numpy as np
import pandas as pd

from merlin_spark.queries.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    sample_frames_batch,
)


def _reference(doc_ids, payloads) -> pd.DataFrame:
    out = {"doc_id": [], "frame_idx": [], "frame": []}
    for d, p in zip(doc_ids, payloads):
        buf = bytes(p)
        for k, off in enumerate(range(0, len(buf), FRAME_STRIDE)):
            out["doc_id"].append(d)
            out["frame_idx"].append(k)
            out["frame"].append(buf[off : off + FRAME_BYTES])
    return pd.DataFrame(out)


def test_sample_frames_matches_reference_loop():
    rng = np.random.default_rng(7)
    payloads = [rng.bytes(int(n)) for n in rng.integers(0, 900, 500)]
    payloads[5] = b""  # zero-byte payload → zero frames
    payloads[6] = rng.bytes(FRAME_STRIDE)  # exact stride boundary
    payloads[7] = rng.bytes(FRAME_BYTES - 3)  # single short tail frame
    doc_ids = np.arange(500, dtype=np.int64) * 3

    got = sample_frames_batch(doc_ids, payloads)
    exp = _reference(doc_ids, payloads)
    assert len(got) == len(exp)
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    assert (got["frame_idx"].to_numpy() == np.array(exp["frame_idx"])).all()
    assert list(got["frame"]) == list(exp["frame"])
    # feat0: deterministic, in [0,1), sensitive to frame content
    assert got["feat0"].between(0, 1, inclusive="left").all()
    again = sample_frames_batch(doc_ids, payloads)
    assert (got["feat0"].to_numpy() == again["feat0"].to_numpy()).all()


def test_sample_frames_empty_batch():
    got = sample_frames_batch(np.array([], dtype=np.int64), [])
    assert len(got) == 0
    assert list(got.columns) == ["doc_id", "frame_idx", "frame", "feat0"]
