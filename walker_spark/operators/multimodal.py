"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning) is real and tested, and — new in r3 — so are
two pure-stdlib decoders behind the ``_real_decode`` seam:

* **PNG** — full chunk walk with CRC verification, IHDR parse, IDAT
  zlib-decompress, scanline unfilter (filter types 0-4) for 8-bit
  RGB/RGBA/grayscale. No image library involved.
* **WAV** — stdlib ``wave`` module: frames → int16 samples, duration,
  per-segment RMS features.

Other media kinds (video, lossy codecs) still raise
``NotImplementedError`` at the same seam — production swaps in a real
decoder with the same ``(blob, kind) -> Decoded`` signature. The
deterministic ``fake_decode`` remains for plumbing-speed tests.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator
from typing import NamedTuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "Decoded",
    "attach_media_metadata",
    "decode_and_featurize",
    "fake_decode",
    "encode_png",
    "decode_png",
    "encode_wav",
    "decode_wav",
    "synth_media_df",
]

# Typed metadata for an opaque media blob.
MEDIA_SCHEMA = (
    "media_id long, kind string, mime string, n_bytes long, "
    "width int, height int, duration_ms int, blob binary"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, ok boolean, err string, "
    "feat array<float>, width int, height int, duration_ms int, "
    "thumb_w int, thumb_h int"
)

N_FEAT = 16


class Decoded(NamedTuple):
    feat: "np.ndarray"  # N_FEAT float32 features
    width: int  # images; 0 for audio
    height: int
    duration_ms: int  # audio; 0 for images


def fake_decode(blob: bytes, kind: str) -> Decoded:
    """Deterministic stand-in decoder: blake2b of the blob → 16 floats.
    Lets the full pipeline (batching, schema, partitioning) run and be
    asserted on without decoding anything."""
    h = hashlib.blake2b(blob or b"", digest_size=64).digest()
    feat = np.frombuffer(h, dtype=np.uint8).astype(np.float32)[:N_FEAT] / 255.0
    return Decoded(feat, 0, 0, 0)


# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}


def encode_png(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal valid 8-bit RGB PNG with deterministic pixels (filter 0
    scanlines, one IDAT). Pure zlib + struct — the fixture generator for
    decoder tests and the multimodal oracle query."""

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    idx = np.arange(width * height * 3, dtype=np.int64)
    pixels = ((idx * 31 + seed * 7919) % 256).astype(np.uint8).reshape(height, width * 3)
    raw = b"".join(b"\x00" + row.tobytes() for row in pixels)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4). Returns (height, width*bpp)
    uint8. int16 scratch avoids uint8 overflow in the Paeth predictor."""
    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).astype(np.int16)
        pos += 1 + stride
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need left pixel
            cur = np.zeros(stride, dtype=np.int16)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                if ftype == 1:
                    cur[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (line[i] + (a + b) // 2) & 0xFF
                else:
                    c = prev[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(blob: bytes) -> Decoded:
    """Parse + fully decode an 8-bit grayscale/RGB/RGBA PNG: chunk CRCs
    verified, IDAT inflated, scanlines unfiltered. Features: per-channel
    mean/std + dims, padded to N_FEAT."""
    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", blob, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
                raise ValueError(
                    f"unsupported PNG layout (depth={depth} color={color})"
                )
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    px = _unfilter(zlib.decompress(bytes(idat)), width, height, channels)
    px = px.reshape(height, width, channels).astype(np.float32)
    feat = np.zeros(N_FEAT, dtype=np.float32)
    feat[0], feat[1] = float(width), float(height)
    for c in range(min(channels, 4)):
        feat[2 + 2 * c] = float(px[:, :, c].mean())
        feat[3 + 2 * c] = float(px[:, :, c].std())
    return Decoded(feat, width, height, 0)


# ---------------------------------------------------------------- WAV


def encode_wav(n_samples: int, sample_rate: int = 8000, seed: int = 0) -> bytes:
    """Mono 16-bit WAV with a deterministic waveform (stdlib ``wave``)."""
    t = np.arange(n_samples, dtype=np.float64)
    freq = 100.0 + (seed % 40) * 10.0
    samples = (10_000 * np.sin(2 * np.pi * freq * t / sample_rate)).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(blob: bytes) -> Decoded:
    """Decode a PCM WAV via stdlib ``wave``: duration from the frame
    count, features = global mean/std + RMS over 8 equal segments."""
    with wave.open(io.BytesIO(blob), "rb") as w:
        n, rate, width, ch = (
            w.getnframes(),
            w.getframerate(),
            w.getsampwidth(),
            w.getnchannels(),
        )
        frames = w.readframes(n)
    if width != 2:
        raise ValueError(f"unsupported WAV sample width {width}")
    s = np.frombuffer(frames, dtype="<i2").astype(np.float32)
    if ch > 1:
        s = s.reshape(-1, ch).mean(axis=1)
    duration_ms = int(n * 1000 // rate)
    feat = np.zeros(N_FEAT, dtype=np.float32)
    feat[0] = float(rate)
    feat[1] = float(n)
    feat[2] = float(s.mean()) if len(s) else 0.0
    feat[3] = float(s.std()) if len(s) else 0.0
    for i, seg in enumerate(np.array_split(s, 8)):
        feat[4 + i] = float(np.sqrt(np.mean(seg**2))) if len(seg) else 0.0
    return Decoded(feat, 0, 0, duration_ms)


def _real_decode(blob: bytes, kind: str) -> Decoded:
    """Stdlib decoder seam: PNG + WAV decode for real; other kinds
    (video, JPEG, MP3, ...) need codecs this environment doesn't ship —
    inject a decoder with the same signature for those."""
    if kind == "image" and blob[:8] == _PNG_SIG:
        return decode_png(blob)
    if kind == "audio" and blob[:4] == b"RIFF":
        return decode_wav(blob)
    raise NotImplementedError(
        f"no stdlib decoder for kind={kind!r} with this byte signature; "
        "inject a decoder with signature (blob: bytes, kind: str) -> Decoded"
    )


def attach_media_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Native metadata columns over the opaque binary (no decode):
    byte length + a stable content hash for exact dedup of media."""
    return df.withColumn("n_bytes_m", F.length(F.col(blob_col))).withColumn(
        "content_hash", F.xxhash64(F.col(blob_col))
    )


def decode_and_featurize(
    df: DataFrame,
    decoder: str = "real",
) -> DataFrame:
    """mapInPandas decode/feature-extract stage.

    ``decoder='real'`` (default) uses the stdlib PNG/WAV decoders —
    unsupported kinds surface as ok=false rows with the error captured,
    never a task failure. ``'fake'`` uses the deterministic stand-in
    (plumbing/speed tests)."""
    decode = fake_decode if decoder == "fake" else _real_decode

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "kind": [], "ok": [], "err": [], "feat": [],
                "width": [], "height": [], "duration_ms": [],
                "thumb_w": [], "thumb_h": [],
            }
            for t in pdf.itertuples(index=False):
                out["media_id"].append(int(t.media_id))
                out["kind"].append(t.kind)
                try:
                    d = decode(bytes(t.blob) if t.blob is not None else b"", t.kind)
                    out["ok"].append(True)
                    out["err"].append("")
                    out["feat"].append([float(x) for x in d.feat])
                    out["width"].append(d.width)
                    out["height"].append(d.height)
                    out["duration_ms"].append(d.duration_ms)
                    out["thumb_w"].append(min(d.width, 16))
                    out["thumb_h"].append(min(d.height, 16))
                except (
                    NotImplementedError,
                    ValueError,
                    zlib.error,
                    wave.Error,
                    EOFError,
                    struct.error,  # truncated chunk headers
                    IndexError,  # truncated scanline bytes
                ) as e:
                    out["ok"].append(False)
                    out["err"].append(str(e)[:120])
                    out["feat"].append([])
                    out["width"].append(0)
                    out["height"].append(0)
                    out["duration_ms"].append(0)
                    out["thumb_w"].append(0)
                    out["thumb_h"].append(0)
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, FEATURE_SCHEMA)


def synth_media_df(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic media fixtures, generated DISTRIBUTED (mapInPandas,
    no driver-side blobs): even ids → PNG with width = 4 + id % 13,
    height = 3 + id % 7; odd ids → 8 kHz WAV with
    n_samples = 800 + 40 * (id % 50) (duration_ms = 100 + 5 * (id % 50)).
    The dimension arithmetic is intentionally trivial so a SQL oracle
    can recompute the expected (width, height, duration_ms) per id and
    cross-check the real decoders' output."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "kind": [], "mime": [], "n_bytes": [],
                "width": [], "height": [], "duration_ms": [], "blob": [],
            }
            for t in pdf.itertuples(index=False):
                i = int(getattr(t, id_col))
                if i % 2 == 0:
                    w, h = 4 + i % 13, 3 + i % 7
                    blob = encode_png(w, h, seed=i)
                    out["kind"].append("image")
                    out["mime"].append("image/png")
                    out["width"].append(w)
                    out["height"].append(h)
                    out["duration_ms"].append(0)
                else:
                    n = 800 + 40 * (i % 50)
                    blob = encode_wav(n, 8000, seed=i)
                    out["kind"].append("audio")
                    out["mime"].append("audio/wav")
                    out["width"].append(0)
                    out["height"].append(0)
                    out["duration_ms"].append(n * 1000 // 8000)
                out["media_id"].append(i)
                out["n_bytes"].append(len(blob))
                out["blob"].append(blob)
            yield pd.DataFrame(out)

    return ids.select(id_col).mapInPandas(fn, MEDIA_SCHEMA)
