"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as opaque ``binary`` columns with
typed metadata; decode / feature-extract run as actor-pool ``map_batches``
stages sized for large rows (small batches). The actual codecs are NOT in
this container: the REAL decode paths are the import-guarded
``PillowImageCodec`` and ``SoundfileAudioCodec`` adapters (same pattern
as ``analyzer.MecabMorphemeAnalyzer``) — on a cluster with Pillow /
soundfile (or PyAV) installed they decode unchanged; here they raise the
documented error and the pipelines use deterministic fake decoders — the
Ray-side plumbing (schema, batch size, actor signature, output layout)
is real and tested.
"""

from __future__ import annotations

import hashlib
import io

import numpy as np
import pyarrow as pa
import ray.data

FEATURE_DIM = 16


class PillowImageCodec:
    """Adapter for a REAL image codec, import-guarded like
    ``analyzer.MecabMorphemeAnalyzer`` (analyzer.py:192): requires the
    public Pillow library (``PIL.Image``), which does not ship in this
    sandbox, so tests cover the duck-typed injection path and the
    ImportError fallback; on a cluster with Pillow installed
    ``ImageResizeStage(..., codec=PillowImageCodec())`` works unchanged.

    ``backend``: optional PIL.Image-like module exposing
    ``open(file_obj) -> image`` where the image supports
    ``convert("RGB")`` and numpy conversion (dependency injection for
    tests / custom codecs).
    """

    def __init__(self, backend=None):
        if backend is None:
            backend = self._load_backend()
        self._image_mod = backend

    @staticmethod
    def _load_backend():
        try:
            from PIL import Image  # Pillow

            return Image
        except ImportError:
            raise ImportError(
                "PillowImageCodec needs Pillow (PIL), which is not "
                "installed. Pass a backend exposing open(file_obj) -> "
                "image with convert('RGB'), or use fake_decode_image.")

    def decode(self, payload: bytes) -> np.ndarray:
        """payload bytes -> (H, W, 3) uint8 RGB tensor."""
        img = self._image_mod.open(io.BytesIO(payload)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)


_IMAGE_CODEC: PillowImageCodec | None = None


def decode_image(payload: bytes) -> "np.ndarray":
    """Real image decode via the import-guarded :class:`PillowImageCodec`.
    No codec library ships in this sandbox, so this raises the documented
    ``NotImplementedError`` here; with Pillow installed it decodes."""
    global _IMAGE_CODEC
    if _IMAGE_CODEC is None:
        try:
            _IMAGE_CODEC = PillowImageCodec()
        except ImportError as e:
            raise NotImplementedError(str(e)) from e
    return _IMAGE_CODEC.decode(payload)


class SoundfileAudioCodec:
    """Adapter for a REAL audio codec — the audio twin of
    :class:`PillowImageCodec`, import-guarded the same way: requires the
    public ``soundfile`` library (falling back to ``av``/PyAV), neither
    of which ships in this sandbox, so tests cover the duck-typed
    injection path and the ImportError fallback; on a cluster with
    either installed ``AudioSampleStage(..., codec=SoundfileAudioCodec())``
    works unchanged.

    ``backend``: optional soundfile-like module exposing
    ``read(file_obj, dtype="float32") -> (samples, sample_rate)``
    (dependency injection for tests / custom codecs).
    """

    def __init__(self, backend=None):
        if backend is None:
            backend = self._load_backend()
        self._sf = backend

    @staticmethod
    def _load_backend():
        try:
            import soundfile  # libsndfile wrapper

            return soundfile
        except ImportError:
            pass
        try:
            import av  # PyAV — wrap its container API in the sf shape

            class _AvShim:
                @staticmethod
                def read(fobj, dtype="float32"):
                    with av.open(fobj) as container:
                        stream = container.streams.audio[0]
                        frames = []
                        for f in container.decode(stream):
                            arr = f.to_ndarray()
                            # packed (interleaved) formats come back as
                            # (1, samples*channels) — de-interleave to
                            # the planar (channels, samples) layout the
                            # concat below assumes.
                            ch = len(f.layout.channels)
                            if not f.format.is_planar and ch > 1:
                                arr = arr.reshape(-1, ch).T
                            frames.append(arr)
                    if not frames:
                        return np.zeros((0, 1), dtype=dtype), int(stream.rate)
                    data = np.concatenate(frames, axis=-1).T.astype(dtype)
                    return data, int(stream.rate)

            return _AvShim
        except ImportError:
            raise ImportError(
                "SoundfileAudioCodec needs soundfile or av (PyAV), "
                "neither installed. Pass a backend exposing "
                "read(file_obj, dtype) -> (samples, sample_rate), or "
                "use fake_decode_audio.")

    def decode(self, payload: bytes) -> tuple["np.ndarray", int]:
        """payload bytes -> (mono float32 samples, sample_rate)."""
        data, sr = self._sf.read(io.BytesIO(payload), dtype="float32")
        data = np.asarray(data, dtype=np.float32)
        if data.ndim == 2:  # (n, channels) -> mono mixdown
            data = data.mean(axis=1, dtype=np.float32)
        return data, int(sr)


_AUDIO_CODEC: SoundfileAudioCodec | None = None


def decode_audio(payload: bytes) -> tuple["np.ndarray", int]:
    """Real audio decode via the import-guarded
    :class:`SoundfileAudioCodec`. No audio codec library ships in this
    sandbox, so this raises the documented ``NotImplementedError`` here;
    with soundfile (or PyAV) installed it decodes."""
    global _AUDIO_CODEC
    if _AUDIO_CODEC is None:
        try:
            _AUDIO_CODEC = SoundfileAudioCodec()
        except ImportError as e:
            raise NotImplementedError(str(e)) from e
    return _AUDIO_CODEC.decode(payload)


def fake_decode_audio(payload: bytes, n: int = 256,
                      sr: int = 16_000) -> tuple["np.ndarray", int]:
    """Deterministic pseudo-decode: hash-seeded mono float32 samples in
    the real output shape. Swap for ``decode_audio`` when codecs exist —
    everything downstream (resample math, schema) is unchanged."""
    seed = int.from_bytes(
        hashlib.blake2b(payload, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return (rng.uniform(-1.0, 1.0, size=n).astype(np.float32), sr)


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in feature vector: blake2b-seeded floats."""
    h = hashlib.blake2b(payload, digest_size=FEATURE_DIM * 2).digest()
    raw = np.frombuffer(h, dtype=np.uint16).astype(np.float64)
    return raw / 65535.0


class MediaFeatureStage:
    """Actor-pool stage: binary payload column → metadata + feature vector.

    ``__init__`` is where a real model/codec would load once per actor
    (SURVEY.md ST1 pattern); ``__call__`` handles one (small) Arrow batch.
    Use ``map_batches(MediaFeatureStage, batch_size=64, concurrency=N,
    num_cpus=1)`` — batches stay small because payload rows are large.
    """

    def __init__(self, payload_col: str, id_col: str, use_real_decode: bool = False):
        self.payload_col = payload_col
        self.id_col = id_col
        self.use_real_decode = use_real_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.payload_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        payloads = [
            v if isinstance(v, (bytes, bytearray)) else str(v).encode()
            for v in col.to_pylist()
        ]
        if self.use_real_decode:
            _ = [decode_image(p) for p in payloads]  # raises by spec
        nbytes = np.array([len(p) for p in payloads], dtype=np.int64)
        digests = [hashlib.md5(p).hexdigest() for p in payloads]
        feats = np.stack([_fake_features(p) for p in payloads]) if payloads else (
            np.zeros((0, FEATURE_DIM)))
        return pa.table(
            {
                self.id_col: batch[self.id_col].cast(pa.int64()),
                "nbytes": pa.array(nbytes),
                "digest": pa.array(digests, pa.string()),
                "features": pa.array(list(feats), pa.list_(pa.float64())),
            }
        )


def media_metadata(
    ds: ray.data.Dataset, payload_col: str, id_col: str, concurrency=2
) -> ray.data.Dataset:
    """Typed metadata for a binary/opaque payload column via the actor pool."""
    return ds.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"payload_col": payload_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )


def media_batch_size(
    mean_payload_bytes: int, target_batch_bytes: int = 64 << 20,
    decode_expansion: float = 8.0,
) -> int:
    """Memory-aware batch sizing for large-payload stages: a batch's
    decoded footprint (payload × expansion, e.g. JPEG→RGB ≈ 8-20×) must
    fit the target so batch × actor-pool concurrency stays inside the
    worker heap. Floor of 1 — a single oversized row still processes."""
    per_row = max(1, int(mean_payload_bytes * decode_expansion))
    return max(1, int(target_batch_bytes) // per_row)


def _payloads(batch: pa.Table, payload_col: str) -> list[bytes]:
    col = batch[payload_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return [v if isinstance(v, (bytes, bytearray)) else str(v).encode()
            for v in col.to_pylist()]


def fake_decode_image(payload: bytes, h: int = 32, w: int = 32) -> np.ndarray:
    """Deterministic pseudo-decode: hash-seeded pixels in the real output
    shape (H, W, 3 uint8). Swap for ``decode_image`` when codecs exist —
    everything downstream (resize math, tensor schema) is unchanged."""
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized nearest-neighbor resample — real math, codec-free."""
    ys = (np.arange(out_h) * img.shape[0]) // out_h
    xs = (np.arange(out_w) * img.shape[1]) // out_w
    return img[ys][:, xs]


class ImageResizeStage:
    """Actor-pool image decode→resize stage.

    Output schema: ``id, pixels: fixed_size_list<uint8, H*W*3>, height,
    width, channels`` — the flat tensor layout a training loader reshapes
    zero-copy. Real decode is stub-gated (``use_real_decode=True`` raises
    the documented ``NotImplementedError``); the resize itself is real
    vectorized math over the decoded tensor. Size batches with
    ``media_batch_size`` — decoded frames, not payloads, dominate memory.
    """

    def __init__(self, payload_col: str, id_col: str, out_h: int = 8,
                 out_w: int = 8, use_real_decode: bool = False, codec=None):
        self.payload_col = payload_col
        self.id_col = id_col
        self.out_h, self.out_w = out_h, out_w
        # codec: anything exposing decode(bytes) -> (H, W, 3) uint8 —
        # e.g. PillowImageCodec (loads once per ACTOR, the ST1 pattern).
        if codec is not None:
            self.decode = codec.decode
        else:
            self.decode = decode_image if use_real_decode else fake_decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = _payloads(batch, self.payload_col)
        n = len(payloads)
        px = np.stack([
            resize_nearest(self.decode(p), self.out_h, self.out_w)
            for p in payloads
        ]).reshape(n, -1) if n else np.zeros(
            (0, self.out_h * self.out_w * 3), np.uint8)
        flat = pa.array(px.reshape(-1), pa.uint8())
        return pa.table({
            self.id_col: batch[self.id_col].cast(pa.int64()),
            "pixels": pa.FixedSizeListArray.from_arrays(
                flat, self.out_h * self.out_w * 3),
            "height": pa.array(np.full(n, self.out_h, np.int32)),
            "width": pa.array(np.full(n, self.out_w, np.int32)),
            "channels": pa.array(np.full(n, 3, np.int32)),
        })


# Deterministic fake container geometry: one "frame" per FRAME_BYTES of
# payload (stand-in for real container duration metadata; small so the
# sampler visibly expands rows even on byte-scale test payloads).
FRAME_BYTES = 4


def frame_indices(nbytes: int) -> list[int]:
    """Deterministic 3-point sample over the fake frame count: first,
    middle, last (deduplicated, ascending)."""
    n = nbytes // FRAME_BYTES + 1
    return sorted({0, n // 2, n - 1})


class FrameSampleStage:
    """Actor-pool video frame sampler — a ROW-EXPANDING media stage.

    One input row (video payload) → one output row per sampled frame:
    ``id, frame_idx, n_frames, pixels``. The container probe is the
    deterministic fake (payload length → frame count); the real decoder
    slots into ``decode`` exactly like ImageResizeStage.
    """

    def __init__(self, payload_col: str, id_col: str, out_h: int = 8,
                 out_w: int = 8, use_real_decode: bool = False, codec=None):
        self.payload_col = payload_col
        self.id_col = id_col
        self.out_h, self.out_w = out_h, out_w
        if codec is not None:
            self.decode = codec.decode
        else:
            self.decode = decode_image if use_real_decode else fake_decode_image

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = _payloads(batch, self.payload_col)
        ids = batch[self.id_col].cast(pa.int64()).to_pylist()
        out_id, out_fi, out_nf, out_px = [], [], [], []
        for i, p in zip(ids, payloads):
            idxs = frame_indices(len(p))
            nf = len(p) // FRAME_BYTES + 1
            for fi in idxs:
                # Frame identity folds the index into the decode seed.
                img = self.decode(p + fi.to_bytes(4, "big"))
                out_id.append(i); out_fi.append(fi); out_nf.append(nf)
                out_px.append(resize_nearest(
                    img, self.out_h, self.out_w).reshape(-1))
        px = (np.stack(out_px) if out_px
              else np.zeros((0, self.out_h * self.out_w * 3), np.uint8))
        flat = pa.array(px.reshape(-1).astype(np.uint8), pa.uint8())
        return pa.table({
            self.id_col: pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_fi, pa.int64()),
            "n_frames": pa.array(out_nf, pa.int64()),
            "pixels": pa.FixedSizeListArray.from_arrays(
                flat, self.out_h * self.out_w * 3),
        })


def sample_frames(
    ds: ray.data.Dataset, payload_col: str, id_col: str,
    concurrency=2, batch_size: int | None = None,
) -> ray.data.Dataset:
    """Frame-sampling pipeline over a video payload column."""
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"payload_col": payload_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size or 32,
        concurrency=concurrency,
    )


def resample_nearest_1d(samples: np.ndarray, in_rate: int,
                        out_rate: int) -> np.ndarray:
    """Vectorized nearest-index resample to ``out_rate`` — the 1-D twin
    of :func:`resize_nearest`; real math, codec-free. A zero-length
    waveform (empty-but-valid payload) stays zero-length rather than
    indexing into nothing."""
    if not len(samples):
        return samples[:0]
    n_out = max(1, (len(samples) * out_rate) // in_rate)
    idx = (np.arange(n_out) * in_rate) // out_rate
    return samples[np.minimum(idx, len(samples) - 1)]


class AudioSampleStage:
    """Actor-pool audio decode→resample stage — the audio twin of
    :class:`ImageResizeStage`.

    Output schema: ``id, samples: list<float32>, sample_rate,
    n_samples`` — the variable-length mono waveform layout a feature
    extractor consumes. Real decode is stub-gated exactly like the
    image path (``use_real_decode=True`` raises the documented
    ``NotImplementedError`` here; with soundfile/PyAV installed, or a
    ``codec`` injected, it decodes) — the resample itself is real
    vectorized math. Size batches with ``media_batch_size``.
    """

    def __init__(self, payload_col: str, id_col: str,
                 out_rate: int = 16_000, use_real_decode: bool = False,
                 codec=None):
        self.payload_col = payload_col
        self.id_col = id_col
        self.out_rate = out_rate
        # codec: anything exposing decode(bytes) -> (samples, rate) —
        # e.g. SoundfileAudioCodec (loads once per ACTOR, ST1 pattern).
        if codec is not None:
            self.decode = codec.decode
        else:
            self.decode = decode_audio if use_real_decode else fake_decode_audio

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = _payloads(batch, self.payload_col)
        waves = []
        for p in payloads:
            samples, rate = self.decode(p)
            waves.append(resample_nearest_1d(
                np.asarray(samples, np.float32), int(rate), self.out_rate))
        flat = pa.array(
            np.concatenate(waves) if waves else np.zeros(0, np.float32),
            pa.float32())
        offsets = np.zeros(len(waves) + 1, dtype=np.int32)
        if waves:
            np.cumsum([len(w) for w in waves], out=offsets[1:])
        return pa.table({
            self.id_col: batch[self.id_col].cast(pa.int64()),
            "samples": pa.ListArray.from_arrays(pa.array(offsets), flat),
            "sample_rate": pa.array(
                np.full(len(waves), self.out_rate, np.int32)),
            "n_samples": pa.array(offsets[1:] - offsets[:-1], pa.int32()),
        })
