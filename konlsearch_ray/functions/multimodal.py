"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are treated as opaque ``binary`` columns with
typed metadata; decode / feature-extract run as actor-pool ``map_batches``
stages sized for large rows (small batches). The actual codecs are NOT in
this container, so `decode_image` / `decode_audio` are stubbed behind
``NotImplementedError`` and the pipeline uses a deterministic fake feature
extractor — the Ray-side plumbing (schema, batch size, actor signature,
output layout) is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

FEATURE_DIM = 16


def decode_image(payload: bytes) -> "np.ndarray":
    """Real image decode — requires an image codec library (not in this
    environment). Stub by spec; see module docstring."""
    raise NotImplementedError("image codecs unavailable in this environment")


def decode_audio(payload: bytes) -> "np.ndarray":
    raise NotImplementedError("audio codecs unavailable in this environment")


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
