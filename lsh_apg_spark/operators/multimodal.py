"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns + typed metadata, processed by mapInPandas in Arrow batches.

The decode kernels are STUBBED (this container has no image/audio
libraries): `decode_stub=True` (default) produces a deterministic fake
feature vector from the bytes so the Spark-side plumbing — schema,
batch iteration, partitioning — is real and tested; passing
decode_stub=False raises NotImplementedError at the exact point a real
decoder (PIL/ffmpeg/torchaudio) would plug in."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = ("id long, media_type string, payload binary, "
                "width int, height int, duration_ms int")
FEATURE_SCHEMA = "id long, media_type string, n_bytes long, feature array<float>"


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: expand a
    blake2b digest of the payload into `dim` floats in [-1, 1)."""
    out = np.empty(dim, dtype=np.float32)
    h = b""
    i = 0
    while i < dim:
        h = hashlib.blake2b(payload + i.to_bytes(4, "little"),
                            digest_size=32).digest()
        chunk = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
        take = min(dim - i, len(chunk))
        out[i:i + take] = chunk[:take] / 128.0 - 1.0
        i += take
    return out


def extract_features(media: DataFrame, dim: int = 16,
                     decode_stub: bool = True) -> DataFrame:
    """(id, media_type, payload, ...) -> (id, media_type, n_bytes,
    feature array<float>) via mapInPandas — the batch shape a real
    decode/resize/frame-sample stage would use."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this "
                    "container; plug the decoder in here")
            feats = [
                _fake_feature(bytes(p) if p is not None else b"", dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "id": pdf["id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(p) if p is not None else 0
                            for p in pdf["payload"]],
                "feature": feats,
            })

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)
