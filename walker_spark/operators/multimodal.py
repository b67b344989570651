"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning) is real and tested; the actual media decoding
is STUBBED — this container ships no image/audio libs, so the decoder
seam raises ``NotImplementedError`` unless the deterministic fake
decoder is requested (tests use the fake; production swaps in a real
decoder with the same signature).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "attach_media_metadata",
    "decode_and_featurize",
    "fake_decode",
]

# Typed metadata for an opaque media blob.
MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, n_bytes long, "
    "width int, height int, duration_ms int, blob binary"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, ok boolean, err string, "
    "feat array<float>, thumb_w int, thumb_h int"
)


def fake_decode(blob: bytes, kind: str) -> np.ndarray:
    """Deterministic stand-in decoder: blake2b of the blob → 16 floats.
    Lets the full pipeline (batching, schema, partitioning) run and be
    asserted on without media libs."""
    h = hashlib.blake2b(blob or b"", digest_size=64).digest()
    return np.frombuffer(h, dtype=np.uint8).astype(np.float32)[:16] / 255.0


def _real_decode(blob: bytes, kind: str) -> np.ndarray:
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in "
        "this environment; inject a decoder with signature "
        "(blob: bytes, kind: str) -> np.ndarray"
    )


def attach_media_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Native metadata columns over the opaque binary (no decode):
    byte length + a stable content hash for exact dedup of media."""
    return df.withColumn("n_bytes_m", F.length(F.col(blob_col))).withColumn(
        "content_hash", F.xxhash64(F.col(blob_col))
    )


def decode_and_featurize(
    df: DataFrame,
    decoder: str = "stub",
    batch_hint: int = 256,
) -> DataFrame:
    """mapInPandas decode/feature-extract stage.

    ``decoder='fake'`` uses the deterministic stand-in; ``'stub'``
    surfaces NotImplementedError rows as ok=false (the plumbing —
    batching, error capture, schema — is what this verifies).
    """
    decode = fake_decode if decoder == "fake" else _real_decode

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "ok": [], "err": [],
                "feat": [], "thumb_w": [], "thumb_h": [],
            }
            for t in pdf.itertuples(index=False):
                out["media_id"].append(int(t.media_id))
                out["kind"].append(t.kind)
                try:
                    feat = decode(bytes(t.blob) if t.blob is not None else b"", t.kind)
                    out["ok"].append(True)
                    out["err"].append("")
                    out["feat"].append([float(x) for x in feat])
                    out["thumb_w"].append(16)
                    out["thumb_h"].append(16)
                except NotImplementedError as e:
                    out["ok"].append(False)
                    out["err"].append(str(e)[:120])
                    out["feat"].append([])
                    out["thumb_w"].append(0)
                    out["thumb_h"].append(0)
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, FEATURE_SCHEMA)
