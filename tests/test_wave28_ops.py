"""Round-4 wave-28: spectral audio features (rfft) — planted-tone recovery
and numpy-recompute parity (the query is rows-only; this IS its oracle)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, n):
    pq.write_table(
        pa.table({
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["x"] * n, pa.string()),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([1] * n, pa.int64()),
        }),
        tmp_path / "documents.parquet",
    )


def test_spectral_recovers_planted_tone(ray_session, tmp_path):
    from feast_ray.pipelines.queries_docs import q_wav_spectral_docs

    n = 64  # covers all 16 tone frequencies and all 4 clip lengths
    _write_docs(tmp_path, n)
    out = (q_wav_spectral_docs(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    assert len(out) == n
    for did in range(n):
        f_true = 200.0 + (did % 16) * 200.0
        ns = 512 + (did % 4) * 256
        assert out.loc[did, "n_samples"] == ns
        bin_hz = 8000.0 / ns
        assert abs(out.loc[did, "dominant_hz"] - f_true) <= bin_hz / 2 + 1e-9
        # a pure tone's POWER-weighted centroid sits near the tone
        assert abs(out.loc[did, "centroid_hz"] - f_true) < 30.0
        # RMS of a full-scale sine ~ 20000/sqrt(2)
        assert out.loc[did, "rms"] == pytest.approx(20000 / np.sqrt(2),
                                                    rel=0.05)


def test_spectral_matches_numpy_recompute(ray_session, tmp_path):
    from feast_ray.pipelines.queries_docs import q_wav_spectral_docs
    from feast_ray.stages.multimodal import decode_wav, encode_wav

    _write_docs(tmp_path, 8)
    out = (q_wav_spectral_docs(str(tmp_path)).to_pandas()
           .set_index("doc_id").sort_index())
    for did in range(8):
        ns = 512 + (did % 4) * 256
        f = 200.0 + (did % 16) * 200.0
        i = np.arange(ns, dtype=np.float64)
        s = np.round(20000.0 * np.sin(2 * np.pi * f * i / 8000.0))
        # byte-level round trip through the real encoder/decoder
        rate, ch, dec = decode_wav(encode_wav(s.astype(np.int16),
                                              sample_rate=8000, n_channels=1))
        assert rate == 8000 and (dec == s.astype(np.int16)).all()
        sf = dec.astype(np.float64)
        mag = np.abs(np.fft.rfft(sf))
        freqs = np.fft.rfftfreq(len(sf), d=1 / 8000.0)
        k = int(np.argmax(mag[1:])) + 1
        want_dom = freqs[k]
        pw = mag[1:] * mag[1:]
        want_cent = float((freqs[1:] * pw).sum() / pw.sum())
        want_rms = float(np.sqrt((sf * sf).sum() / sf.size))
        assert out.loc[did, "dominant_hz"] == want_dom
        assert out.loc[did, "centroid_hz"] == pytest.approx(want_cent,
                                                            abs=1e-9)
        assert out.loc[did, "rms"] == pytest.approx(want_rms, abs=1e-9)
