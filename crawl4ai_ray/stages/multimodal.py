"""Multimodal (image/audio/video) stages — real Ray plumbing, stubbed codecs.

Media ride as opaque ``binary`` columns with typed metadata. Decode /
resize / frame-sample are actor-pool ``map_batches`` stages: the actor
``__init__`` is where a real build loads codecs/models once per worker; in
this container the decode kernels are STUBS (no PIL/ffmpeg available) that
produce deterministic fake outputs from the payload bytes, so schemas,
batch sizing, actor signatures and output layout are real and tested.
The decode kernels are INJECTABLE: ``DecodeMedia`` and ``FrameSample``
take a ``decoder_factory`` — a zero-arg callable returning an object with
``decode(payload) -> {width, height, features}`` (resp.
``sample(payload, n_frames) -> [{frame_idx, ts_ms, features}, ...]``) —
constructed ONCE per actor in ``__init__`` (where a real build loads
PIL/ffmpeg); the default factory wraps the deterministic stubs, and
``RawGrayCodec`` (r5) is the shipped REAL kernel for the repo's raw-gray
grid interchange format — it parses actual pixel bytes, no hashing. The
swap-in proof (schemas preserved, init-once per actor, batch boundaries
exact) is tests/test_kernel_injection.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("url", pa.string()),
        ("mime", pa.string()),
        ("payload", pa.binary()),
    ]
)

FEATURE_DIM = 16


def _decode_stub(payload: bytes) -> dict:
    """STUB decoder: deterministic pseudo-decode from payload bytes.

    A real implementation would call PIL / libvips / ffmpeg here; those
    libraries are not in this container (NotImplementedError path guarded
    by ``strict=True``).
    """
    h = hashlib.blake2b(payload or b"", digest_size=32).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    feats = (np.frombuffer(h, dtype=np.uint8)[:FEATURE_DIM].astype(np.float32) / 255.0)
    return {"width": int(width), "height": int(height), "features": feats.tolist()}


class _StubCodec:
    """Default codec object: wraps the deterministic stubs behind the
    same interface a real PIL/ffmpeg-backed codec would present."""

    def decode(self, payload: bytes) -> dict:
        return _decode_stub(payload)

    def sample(self, payload: bytes, n_frames: int) -> list:
        h = hashlib.blake2b(payload or b"", digest_size=32).digest()
        duration_ms = 1000 + int.from_bytes(h[:2], "big")
        frames = []
        for j in range(n_frames):
            fh = hashlib.blake2b(
                (payload or b"") + j.to_bytes(4, "big"), digest_size=32
            ).digest()
            frames.append(
                {
                    "frame_idx": j,
                    "ts_ms": duration_ms * j // n_frames,
                    "features": (
                        np.frombuffer(fh, dtype=np.uint8)[:FEATURE_DIM].astype(
                            np.float32
                        )
                        / 255.0
                    ).tolist(),
                }
            )
        return frames


class RawGrayCodec:
    """REAL codec for the repo's raw-gray interchange format (r5 — the
    shipped non-stub media kernel, promoted from the r4 injection test):
    actually PARSES the 72-byte row-major 8×9 uint8 grid that
    ``raw_gray_payload`` writes — no hash-fakery. ``decode``: width /
    height from the real geometry, features = per-row pixel means / 255.
    ``sample``: frame j reads row ``j % GRID_ROWS`` as its feature slice
    at 100 ms spacing. Use via
    ``media_pipeline(ds, decoder_factory=RawGrayCodec)`` when payloads
    are raw-gray grids (the DHashImage family's native format); the
    default ``_StubCodec`` remains for opaque/foreign payloads (PIL /
    ffmpeg absent in this container)."""

    def decode(self, payload: bytes) -> dict:
        g = np.frombuffer(payload or b"", dtype=np.uint8)
        if g.size != GRID_ROWS * GRID_COLS:
            raise ValueError(
                f"raw-gray payload must be {GRID_ROWS * GRID_COLS} bytes, "
                f"got {g.size}"
            )
        g = g.reshape(GRID_ROWS, GRID_COLS)
        feats = np.zeros(FEATURE_DIM, np.float32)
        feats[:GRID_ROWS] = g.mean(axis=1) / 255.0
        return {
            "width": GRID_COLS,
            "height": GRID_ROWS,
            "features": feats.tolist(),
        }

    def sample(self, payload: bytes, n_frames: int) -> list:
        g = np.frombuffer(payload or b"", dtype=np.uint8).reshape(
            GRID_ROWS, GRID_COLS
        )
        frames = []
        for j in range(n_frames):
            feats = np.zeros(FEATURE_DIM, np.float32)
            feats[:GRID_COLS] = g[j % GRID_ROWS] / 255.0
            frames.append(
                {
                    "frame_idx": j,
                    "ts_ms": 100 * j,
                    "features": feats.tolist(),
                }
            )
        return frames


class DecodeMedia:
    """Actor-pool stage: (media_id, payload, mime) → decoded metadata +
    feature vector. batch_size should be small (payloads are fat).
    ``decoder_factory``: zero-arg factory → codec with ``decode(payload)``,
    built ONCE per actor here (the model-load seam)."""

    def __init__(self, strict: bool = False, decoder_factory=None):
        # the once-per-actor codec load (real build: PIL/libvips handles)
        self.codec = (decoder_factory or _StubCodec)()
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "real media decoding requires PIL/ffmpeg, not present in this container"
            )
        payloads = batch.column("payload").to_pylist()
        decoded = [self.codec.decode(p) for p in payloads]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "url": batch.column("url"),
                "mime": batch.column("mime"),
                "width": pa.array([d["width"] for d in decoded], pa.int32()),
                "height": pa.array([d["height"] for d in decoded], pa.int32()),
                "features": pa.array(
                    [d["features"] for d in decoded], pa.list_(pa.float32())
                ),
            }
        )


class ResizeMedia:
    """Actor-pool stage: clamp decoded dims to a max edge (stub: arithmetic
    only; a real build transforms pixels)."""

    def __init__(self, max_edge: int = 256):
        self.max_edge = max_edge

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("width").to_numpy().astype(np.float64)
        h = batch.column("height").to_numpy().astype(np.float64)
        scale = np.minimum(1.0, self.max_edge / np.maximum(w, h))
        return batch.set_column(
            batch.schema.get_field_index("width"),
            "width",
            pa.array((w * scale).astype(np.int32)),
        ).set_column(
            batch.schema.get_field_index("height"),
            "height",
            pa.array((h * scale).astype(np.int32)),
        )


class FrameSample:
    """Actor-pool stage: video binary → k uniformly-spaced frame records
    (fan-out: one input row becomes k output rows). The stub derives a
    deterministic per-frame feature vector from (payload, frame_idx); a
    real build seeks with ffmpeg/pyav in __init__-loaded codecs. Output
    rows are small (features, not pixels), so the fan-out is safe at any
    batch size; the INPUT batch stays small because payloads are fat."""

    def __init__(self, n_frames: int = 4, strict: bool = False,
                 decoder_factory=None):
        # the once-per-actor codec load (real build: ffmpeg/pyav handles)
        self.codec = (decoder_factory or _StubCodec)()
        self.n_frames = n_frames
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "real frame sampling requires ffmpeg/pyav, not present in this container"
            )
        out = {
            "media_id": [],
            "frame_idx": [],
            "ts_ms": [],
            "features": [],
        }
        for mid, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            for fr in self.codec.sample(payload, self.n_frames):
                out["media_id"].append(mid)
                out["frame_idx"].append(fr["frame_idx"])
                out["ts_ms"].append(fr["ts_ms"])
                out["features"].append(fr["features"])
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "ts_ms": pa.array(out["ts_ms"], pa.int64()),
                "features": pa.array(out["features"], pa.list_(pa.float32())),
            }
        )


def frame_pipeline(ds, n_frames: int = 4, batch_size: int = 8, concurrency=(1, 4),
                   decoder_factory=None):
    """video rows → sampled frame table (actor pool, fat-payload batches)."""
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"n_frames": n_frames,
                               "decoder_factory": decoder_factory},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_media_table(n: int = 64) -> pa.Table:
    """Deterministic fake media corpus for tests."""
    ids = list(range(n))
    payloads = [hashlib.sha256(str(i).encode()).digest() * 8 for i in ids]
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "url": pa.array([f"https://img.example.com/img{i}.png" for i in ids]),
            "mime": pa.array(["image/png"] * n),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def media_pipeline(ds, batch_size: int = 16, concurrency=(1, 4),
                   decoder_factory=None):
    """decode → resize as actor pools (small batches: fat payloads)."""
    return ds.map_batches(
        DecodeMedia,
        fn_constructor_kwargs={"decoder_factory": decoder_factory},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    ).map_batches(
        ResizeMedia,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


GRID_ROWS, GRID_COLS = 8, 9  # dHash geometry: 8 rows x 9 cols -> 64 bits


def raw_gray_payload(grid: "np.ndarray") -> bytes:
    """Serialize an (8, 9) uint8 grayscale grid as the repo's raw
    'decoded image' interchange bytes (row-major). This is the seam a
    real build replaces: PIL would decode a JPEG to exactly such a
    grid (resize to 9x8, convert to L) before hashing."""
    assert grid.shape == (GRID_ROWS, GRID_COLS)
    return grid.astype(np.uint8).tobytes()


def dhash_grids(grids: "np.ndarray") -> "np.ndarray":
    """Vectorized Krawetz dHash over (..., 8, 9) uint8 grids → (...,)
    uint64 (row-major little-endian bit packing, same contract as
    DHashImage._dhash). Shared by the image-dedup and scene-cut paths."""
    bits = grids[..., :, :-1] < grids[..., :, 1:]  # (..., 8, 8)
    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)).reshape(
        GRID_ROWS, GRID_COLS - 1
    )
    return (weights * bits.astype(np.uint64)).sum(axis=(-1, -2))


class DHashImage:
    """Actor-pool stage: (media_id, payload) → 64-bit perceptual dHash.

    The HASH ITSELF is the real algorithm (difference hash, Krawetz
    2013: bit[r][c] = pixel[r][c] < pixel[r][c+1] over an 8x9
    grayscale thumbnail, packed row-major little-endian); only the
    JPEG→thumbnail decode in front of it is the container's stub seam
    (payloads here are already raw 8x9 grids — see raw_gray_payload).
    A real build decodes/resizes in __init__-loaded codecs, then calls
    the same _dhash."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    @staticmethod
    def _dhash(grid: "np.ndarray") -> int:
        bits = grid[:, :-1] < grid[:, 1:]  # (8, 8) bool
        weights = (np.uint64(1) << np.arange(64, dtype=np.uint64)).reshape(
            GRID_ROWS, GRID_COLS - 1
        )
        return int((weights * bits.astype(np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "real image decoding requires PIL, not present in this container"
            )
        payloads = batch.column("payload").to_pylist()
        if not payloads:
            return pa.table(
                {
                    "id": pa.array([], pa.int64()),
                    "dhash": pa.array([], pa.uint64()),
                }
            )
        # fixed 72-byte raw grids: decode the whole batch in ONE frombuffer
        # and hash with one vectorized comparison — no per-image python
        grids = np.frombuffer(b"".join(payloads), dtype=np.uint8).reshape(
            len(payloads), GRID_ROWS, GRID_COLS
        )
        hashes = dhash_grids(grids)
        return pa.table(
            {
                "id": batch.column("media_id"),
                "dhash": pa.array(hashes.astype(np.uint64), pa.uint64()),
            }
        )


AUDIO_FRAMES, AUDIO_BANDS = 2, 33  # 2 frames x 32 sign bits = 64-bit fp
FRAME_LEN, BAND_LEN = 512, 15  # 33 bands x 15 samples = 495 of 512 used


class AudioFingerprint:
    """Actor-pool stage: (media_id, payload int16-LE PCM) → 64-bit audio
    fingerprint — simplified Haitsma–Kalker (Philips 2002): per frame,
    band ENERGIES (integer sums of squares over contiguous sample
    bands standing in for spectral bands), bit(n, m) =
    [E(n, m) − E(n, m+1) > 0], packed k = n·32 + m. The sign/packing
    math is real and integer-exact; the stub seam is in FRONT of it —
    a real build would decode/resample with ffmpeg and use FFT bands,
    then call the same _fingerprint."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    @staticmethod
    def _fingerprint(samples: "np.ndarray") -> int:
        assert len(samples) >= AUDIO_FRAMES * FRAME_LEN
        s = samples.astype(np.int64)
        fp = np.uint64(0)
        for n in range(AUDIO_FRAMES):
            frame = s[n * FRAME_LEN : (n + 1) * FRAME_LEN]
            used = frame[: AUDIO_BANDS * BAND_LEN].reshape(AUDIO_BANDS, BAND_LEN)
            energy = (used * used).sum(axis=1)  # (33,) int64
            bits = energy[:-1] > energy[1:]  # (32,)
            weights = np.uint64(1) << (
                np.arange(32, dtype=np.uint64) + np.uint64(n * 32)
            )
            fp |= np.uint64((weights * bits.astype(np.uint64)).sum())
        return int(fp)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "real audio decoding requires ffmpeg, not present in this container"
            )
        payloads = batch.column("payload").to_pylist()
        if not payloads:
            return pa.table(
                {
                    "id": pa.array([], pa.int64()),
                    "afp": pa.array([], pa.uint64()),
                }
            )
        n_samp = len(payloads[0]) // 2
        # equal-length PCM payloads: one frombuffer for the whole batch,
        # band energies via einsum — no per-clip python
        s = (
            np.frombuffer(b"".join(payloads), dtype="<i2")
            .reshape(len(payloads), n_samp)
            .astype(np.int64)
        )
        fps = np.zeros(len(payloads), np.uint64)
        for n in range(AUDIO_FRAMES):
            frame = s[:, n * FRAME_LEN : (n + 1) * FRAME_LEN]
            used = frame[:, : AUDIO_BANDS * BAND_LEN].reshape(
                len(payloads), AUDIO_BANDS, BAND_LEN
            )
            energy = np.einsum("nbl,nbl->nb", used, used)
            bits = energy[:, :-1] > energy[:, 1:]  # (n, 32)
            weights = (
                np.uint64(1)
                << (np.arange(32, dtype=np.uint64) + np.uint64(n * 32))
            )[None, :]
            fps |= (weights * bits.astype(np.uint64)).sum(axis=1).astype(np.uint64)
        return pa.table(
            {
                "id": batch.column("media_id"),
                "afp": pa.array(fps, pa.uint64()),
            }
        )
