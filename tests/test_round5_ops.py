"""Round-5 operators: real AVI video decode (container walk + DIB frames),
the sampled-frame actor stage, and the sharded-exchange helpers."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from feast_ray.stages.multimodal import (
    VideoFrameExtractor,
    attach_avi_payloads,
    decode_avi,
    encode_avi,
)


def _rand_frames(n, h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (n, h, w, 3), dtype=np.uint8)


def test_avi_roundtrip_exact():
    fr = _rand_frames(6, 5, 7)
    fps, got = decode_avi(encode_avi(fr, fps=13))
    assert fps == 13
    assert got.shape == fr.shape
    assert (got == fr).all()


def test_avi_roundtrip_padded_width():
    # w=3 -> 9-byte rows padded to 12: padding must not leak into pixels
    fr = _rand_frames(2, 4, 3, seed=1)
    _, got = decode_avi(encode_avi(fr, fps=10))
    assert (got == fr).all()


def test_avi_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="RIFF/AVI"):
        decode_avi(b"not an avi at all")
    buf = bytearray(encode_avi(_rand_frames(2, 3, 3), fps=10))
    # shrink the first movi frame chunk's declared size below one full frame
    # (NOT rfind — idx1 entries also contain the b"00db" fcc)
    pos = buf.find(b"00db", buf.find(b"movi"))
    import struct

    struct.pack_into("<I", buf, pos + 4, 4)
    with pytest.raises(ValueError, match="truncated"):
        decode_avi(bytes(buf))


def test_video_extractor_sampling_and_moments():
    fr = _rand_frames(7, 4, 5, seed=2)  # 7 frames, stride 2, max 3 -> idx 0,2,4
    tbl = pa.table({"doc_id": pa.array([11], pa.int64()),
                    "payload": pa.array([encode_avi(fr, fps=12)], pa.binary())})
    out = VideoFrameExtractor(stride=2, max_frames=3)(tbl)
    assert out["frame_idx"].to_pylist() == [0, 2, 4]
    assert out["n_frames"].to_pylist() == [7, 7, 7]
    assert out["fps"].to_pylist() == [12, 12, 12]
    assert out["width"].to_pylist() == [5, 5, 5]
    assert out["height"].to_pylist() == [4, 4, 4]
    for row, j in enumerate((0, 2, 4)):
        pf = fr[j].astype(np.float64).ravel()
        assert out["frame_mean"][row].as_py() == pytest.approx(pf.mean(), abs=0)
        assert out["frame_std"][row].as_py() == pytest.approx(pf.std(), rel=1e-12)


def test_video_extractor_modes():
    with pytest.raises(ValueError, match="unknown decode mode"):
        VideoFrameExtractor(mode="nope")
    with pytest.raises(NotImplementedError, match="pyav"):
        VideoFrameExtractor(mode="pyav")  # library absent in this sandbox


def test_attach_avi_payloads_closed_form():
    ids = pa.table({"doc_id": pa.array([0, 5, 38], pa.int64())})
    out = attach_avi_payloads(ids)
    for i, v in enumerate([0, 5, 38]):
        fps, frames = decode_avi(out["payload"][i].as_py())
        assert fps == 10 + v % 5
        assert frames.shape == (v % 4 + 2, v % 7 + 1, v % 11 + 1, 3)
        nf, h, w = frames.shape[:3]
        f = np.arange(nf)[:, None]
        k = np.arange(h * w * 3)[None, :]
        want = ((v * 13 + f * 97 + k * 5) % 256).astype(np.uint8).reshape(nf, h, w, 3)
        assert (frames == want).all()


def test_split_by_bucket_range_consistency():
    from feast_ray.exchange import _split_by_bucket

    tbl = pa.table({"conv_id": pa.array([f"c{i % 17}" for i in range(200)]),
                    "x": pa.array(np.arange(200))})
    full = _split_by_bucket(tbl, ["conv_id"], 8)
    lo_hi = [(0, 3), (3, 7), (7, 8)]
    ranged = []
    for lo, hi in lo_hi:
        ranged.extend(_split_by_bucket(tbl, ["conv_id"], 8, lo, hi))
    assert len(full) == len(ranged) == 8
    for a, b in zip(full, ranged):
        assert a.num_rows == b.num_rows
        assert a.sort_by("x").equals(b.sort_by("x"))
