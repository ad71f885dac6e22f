"""Multimodal column stages: image/audio/video as opaque ``binary`` columns
with typed metadata.

The decode codecs (PIL/ffmpeg/librosa) are NOT available in this
environment, so the decode kernels are STUBBED — either raising
``NotImplementedError`` (strict mode) or producing a deterministic fake
derived from the payload bytes (test mode).  The Ray-side plumbing is
real and tested: actor-pool stages, small batch sizes for large binary
rows, Arrow binary columns kept in ``batch_format="pyarrow"`` end-to-end
(binary does not round-trip pandas safely).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .geocode import hash64_utf8  # noqa: F401  (same hashing style)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Seeded fake media rows (payload = deterministic pseudo-bytes)."""
    rng = np.random.default_rng(seed)
    kinds = rng.choice(np.array(["image", "audio", "video"]), size=n, p=[0.6, 0.2, 0.2])
    payloads = [rng.integers(0, 256, int(rng.integers(64, 512)), dtype=np.uint8).tobytes() for _ in range(n)]
    mime = np.where(kinds == "image", "image/png", np.where(kinds == "audio", "audio/wav", "video/mp4"))
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds.tolist(), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mime.tolist(), pa.string()),
            "width": pa.array(rng.integers(16, 512, n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 512, n).astype(np.int32)),
            "duration_ms": pa.array(rng.integers(0, 60000, n).astype(np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


def _payload_hashes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Deterministic uint64 per binary payload (drives the fake kernels).

    Vectorized straight off the binary column's offsets+data buffers:
    Horner over the (≤64-byte) prefix, one masked pass per byte position —
    no per-row Python, so this survives into a real decode path where
    payloads are MB-scale (only the prefix is ever touched)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks() if col.num_chunks != 1 else col.chunk(0)
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    off_dtype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    bufs = col.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype, count=n + 1 + col.offset)
    offsets = offsets[col.offset : col.offset + n + 1].astype(np.int64)
    data = (
        np.frombuffer(bufs[2], dtype=np.uint8)
        if bufs[2] is not None
        else np.empty(0, np.uint8)
    )
    starts = offsets[:-1]
    lens = offsets[1:] - starts
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(min(64, int(lens.max()))):
            m = lens > j
            h[m] = h[m] * np.uint64(31) + data[starts[m] + j]
        return h ^ (lens.astype(np.uint64) << np.uint64(32))


class ImageDecode:
    """Actor stage: decode image payloads → fixed-size feature vectors.

    REAL decode requires PIL/opencv — not in this container.  With
    ``strict=True`` this raises NotImplementedError at first batch (the
    marked stub); the default deterministic-fake mode emits a seeded
    feature vector derived from the payload hash so downstream plumbing
    (schema, batching, writes) is fully exercised."""

    def __init__(self, *, dim: int = 16, strict: bool = False):
        self.dim = int(dim)
        self.strict = strict
        try:  # pragma: no cover - not present in this environment
            import PIL.Image  # noqa: F401

            self.pil = True
        except ImportError:
            self.pil = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict and not self.pil:
            raise NotImplementedError(
                "ImageDecode: real decode needs PIL/opencv (unavailable); "
                "run with strict=False for the deterministic fake"
            )
        h = _payload_hashes(batch["payload"])
        rng_rows = (h[:, None] >> (np.arange(self.dim, dtype=np.uint64) * 4)) & np.uint64(0xFF)
        feats = rng_rows.astype(np.float32) / 255.0
        off = pa.array(np.arange(0, (len(batch) + 1) * self.dim, self.dim, dtype=np.int32))
        return batch.append_column(
            "features",
            pa.ListArray.from_arrays(off, pa.array(feats.ravel(), pa.float32())),
        )


class FrameSample:
    """Actor stage: sample N frame offsets per video row (metadata-only math
    — real frame extraction would need ffmpeg).  Adds ``frame_offsets_ms``."""

    def __init__(self, *, n_frames: int = 4):
        self.n = int(n_frames)

    def __call__(self, batch: pa.Table) -> pa.Table:
        dur = batch["duration_ms"].to_numpy(zero_copy_only=False).astype(np.float64)
        # evenly spaced sample points in [0, duration)
        steps = (np.arange(self.n, dtype=np.float64) + 0.5) / self.n
        offs_ms = (dur[:, None] * steps[None, :]).astype(np.int32)
        off = pa.array(np.arange(0, (len(batch) + 1) * self.n, self.n, dtype=np.int32))
        return batch.append_column(
            "frame_offsets_ms",
            pa.ListArray.from_arrays(off, pa.array(offs_ms.ravel(), pa.int32())),
        )


def media_pipeline(ds, *, dim: int = 16, n_frames: int = 4, concurrency=2):
    """images → features; videos → frame offsets.  Small batch size because
    binary rows are wide (object-store-friendly).  The two chained actor
    pools run at num_cpus=0.5 each so pools never reserve every CPU of a
    small session (a fully-reserved session starves the read/consume
    operators and deadlocks the streaming plan)."""
    return (
        ds.map_batches(
            ImageDecode,
            fn_constructor_kwargs={"dim": dim},
            batch_format="pyarrow",
            batch_size=256,
            concurrency=concurrency,
            num_cpus=0.5,
        ).map_batches(
            FrameSample,
            fn_constructor_kwargs={"n_frames": n_frames},
            batch_format="pyarrow",
            batch_size=256,
            concurrency=concurrency,
            num_cpus=0.5,
        )
    )
