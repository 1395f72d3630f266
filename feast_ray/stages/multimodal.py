"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
(``media_type``, ``n_bytes``) — the Arrow-native representation for blob
data at 100 TB: payload bytes stay in the object store as zero-copy Arrow
buffers, never Python objects.

Decode / feature-extraction runs as an ACTOR-POOL ``map_batches`` stage
(``concurrency=N``): expensive setup (codec contexts, model weights) happens
once per actor in ``__init__``, per-batch work in ``__call__``.  Because the
image/audio libraries are not available in this container, the actual codec
call is STUBBED:

- ``mode="fake"`` (default): a deterministic, fully-vectorized stand-in
  that derives (width, height, channel stats) from the payload bytes — the
  Ray-side plumbing (schema, batch sizing, actor lifecycle, output layout)
  is real and tested.
- ``mode="pil"`` / ``mode="librosa"``: raise ``NotImplementedError`` unless
  the library imports — the marked integration point for real decoders.

Batch-size note: payload blobs dominate block bytes; callers should pass a
small ``batch_size`` (e.g. 64) so batch x concurrency fits the worker heap
(task brief: memory-aware operators for large binary payloads).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def attach_fake_payloads(tbl: pa.Table, *, text_col: str = "text", out_col: str = "payload") -> pa.Table:
    """Deterministic binary payloads for testing: the utf-8 bytes of a text
    column, typed as ``binary`` with media metadata columns."""
    payload = tbl[text_col].cast(pa.binary())
    out = tbl.append_column(out_col, payload)
    out = out.append_column("media_type", pa.array(["image/fake"] * tbl.num_rows))
    out = out.append_column("n_bytes", pc.binary_length(out[out_col]).cast(pa.int64()))
    return out


def _flat_binary(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(flat_bytes, offsets) of a binary array, zero-copy from Arrow buffers."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        arr = arr.cast(pa.binary())
        off_dtype = np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    return data, offsets.astype(np.int64)


class MediaFeatureExtractor:
    """Actor-pool decode/feature stage (pass the CLASS to ``map_batches``).

    __init__ = once-per-actor setup (decoder/model load); __call__ = per
    batch.  Output schema: id columns + (width, height, byte_mean, byte_std,
    n_bytes) — the shape a real image featurizer would emit.
    """

    def __init__(
        self,
        *,
        payload_col: str = "payload",
        id_cols: Sequence[str] = ("doc_id",),
        mode: str = "fake",
    ):
        self.payload_col = payload_col
        self.id_cols = list(id_cols)
        self.mode = mode
        if mode == "fake":
            self._decoder = None  # the deterministic stand-in needs no state
        elif mode == "pil":
            try:
                from PIL import Image  # noqa: F401  (absent in this container)

                self._decoder = Image
            except ImportError as e:  # pragma: no cover - marked stub
                raise NotImplementedError(
                    "PIL decode requested but Pillow is not installed in this "
                    "environment; use mode='fake' (deterministic stub) or add "
                    "the dependency at deploy time"
                ) from e
        else:
            raise ValueError(f"unknown decode mode {mode!r}")

    def __call__(self, tbl: pa.Table) -> pa.Table:
        data, offsets = _flat_binary(tbl[self.payload_col])
        lens = np.diff(offsets)
        n = len(lens)
        out = tbl.select(self.id_cols)
        if n == 0:
            for name in ("width", "height", "byte_mean", "byte_std"):
                t = pa.int32() if name in ("width", "height") else pa.float64()
                out = out.append_column(name, pa.array([], type=t))
            return out.append_column("n_bytes", pa.array([], type=pa.int64()))
        # "decode": fake dimensions derived from payload size (deterministic),
        # channel statistics computed vectorized over the flat byte buffer.
        width = (lens % 640 + 1).astype(np.int32)
        height = (lens % 480 + 1).astype(np.int32)
        d = data.astype(np.float64)
        cs = np.concatenate(([0.0], np.cumsum(d)))
        css = np.concatenate(([0.0], np.cumsum(d * d)))
        s = cs[offsets[1:]] - cs[offsets[:-1]]
        q = css[offsets[1:]] - css[offsets[:-1]]
        ln = np.maximum(lens, 1).astype(np.float64)
        mean = s / ln
        var = np.maximum(q / ln - mean * mean, 0.0)
        empty = lens == 0
        out = out.append_column("width", pa.array(width))
        out = out.append_column("height", pa.array(height))
        out = out.append_column("byte_mean", pa.array(mean, mask=empty))
        out = out.append_column("byte_std", pa.array(np.sqrt(var), mask=empty))
        return out.append_column("n_bytes", pa.array(lens.astype(np.int64)))


def add_media_features(
    ds,
    *,
    payload_col: str = "payload",
    id_cols: Sequence[str] = ("doc_id",),
    mode: str = "fake",
    concurrency: int | tuple[int, int] = 2,
    batch_size: Optional[int] = 64,
    num_cpus: float = 1.0,
):
    """Decode + featurize media payloads on an actor pool (small batches —
    blobs dominate memory)."""
    return ds.map_batches(
        MediaFeatureExtractor,
        fn_constructor_kwargs={"payload_col": payload_col, "id_cols": id_cols, "mode": mode},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


class FrameSampler:
    """Actor-pool frame-sampling stage for video-style payloads (one row
    OUT per sampled frame — the flat_map shape a real decoder feeds).

    The payload is treated as fixed-size frames of ``frame_bytes``; every
    ``stride``-th full frame is sampled up to ``max_frames``.  A real
    implementation would seek keyframes via the container index in
    ``__init__``-held codec state; here the frame walk, offsets and
    per-frame byte statistics are real and vectorized, the decode is the
    same deterministic stand-in as :class:`MediaFeatureExtractor`
    (``mode="pyav"`` is the marked integration point and raises unless the
    library exists).
    """

    def __init__(
        self,
        *,
        payload_col: str = "payload",
        id_cols: Sequence[str] = ("doc_id",),
        frame_bytes: int = 256,
        stride: int = 2,
        max_frames: int = 5,
        mode: str = "fake",
    ):
        self.payload_col = payload_col
        self.id_cols = list(id_cols)
        self.frame_bytes = int(frame_bytes)
        self.stride = int(stride)
        self.max_frames = int(max_frames)
        if mode == "pyav":
            try:
                import av  # noqa: F401  (absent in this container)
            except ImportError as e:  # pragma: no cover - marked stub
                raise NotImplementedError(
                    "pyav decode requested but the library is not installed; "
                    "use mode='fake' or add the dependency at deploy time"
                ) from e
        elif mode != "fake":
            raise ValueError(f"unknown decode mode {mode!r}")

    def __call__(self, tbl: pa.Table) -> pa.Table:
        data, offsets = _flat_binary(tbl[self.payload_col])
        lens = np.diff(offsets)
        FB, ST, MF = self.frame_bytes, self.stride, self.max_frames
        n_full = lens // FB
        n_samp = np.minimum((n_full + ST - 1) // ST, MF).astype(np.int64)
        total = int(n_samp.sum())
        ids_tbl = tbl.select(self.id_cols)
        if total == 0:
            out = ids_tbl.slice(0, 0)
            for name, t in (
                ("frame_idx", pa.int64()), ("frame_off", pa.int64()),
                ("frame_len", pa.int64()), ("frame_mean", pa.float64()),
            ):
                out = out.append_column(name, pa.array([], type=t))
            return out
        row_of = np.repeat(np.arange(len(lens), dtype=np.int64), n_samp)
        csum = np.concatenate(([0], np.cumsum(n_samp)))
        local = np.arange(total, dtype=np.int64) - np.repeat(csum[:-1], n_samp)
        frame_idx = local * ST
        frame_off = frame_idx * FB
        starts = offsets[:-1][row_of] + frame_off
        d = data.astype(np.float64)
        cs = np.concatenate(([0.0], np.cumsum(d)))
        mean = (cs[starts + FB] - cs[starts]) / float(FB)
        out = ids_tbl.take(pa.array(row_of))
        out = out.append_column("frame_idx", pa.array(frame_idx))
        out = out.append_column("frame_off", pa.array(frame_off))
        out = out.append_column("frame_len", pa.array(np.full(total, FB, dtype=np.int64)))
        return out.append_column("frame_mean", pa.array(mean))


def add_frame_samples(
    ds,
    *,
    payload_col: str = "payload",
    id_cols: Sequence[str] = ("doc_id",),
    frame_bytes: int = 256,
    stride: int = 2,
    max_frames: int = 5,
    mode: str = "fake",
    concurrency: int | tuple[int, int] = 2,
    batch_size: Optional[int] = 64,
    num_cpus: float = 1.0,
):
    """Frame-sample media payloads on an actor pool (one output row per
    sampled frame)."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={
            "payload_col": payload_col,
            "id_cols": id_cols,
            "frame_bytes": frame_bytes,
            "stride": stride,
            "max_frames": max_frames,
            "mode": mode,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )
