"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, mapInPandas
signatures, partitioning) is real and tested, and so are four
pure-stdlib/numpy decoders behind the ``_real_decode`` seam:

* **PNG** (r3) — full chunk walk with CRC verification, IHDR parse,
  IDAT zlib-decompress, scanline unfilter (filter types 0-4) for 8-bit
  RGB/RGBA/grayscale. No image library involved.
* **WAV** (r3) — stdlib ``wave`` module: frames → int16 samples,
  duration, per-segment RMS features.
* **baseline JPEG** (r4) — marker walk, DQT/DHT parse, Huffman entropy
  decode with byte unstuffing and restart handling, dequantize,
  inverse zigzag, IDCT, YCbCr→RGB; plus a matching grayscale encoder
  (Annex-K tables) as the fixture generator.
* **GIF** (r4) — full LZW (variable code width, clear/EOI, dictionary
  rebuild), global/local color tables, extension skipping; plus a
  grayscale-palette encoder emitting the classic uncompressed-LZW
  stream.

Video ships as MJPEG-in-AVI (r4): a pure RIFF container walk feeds
every sampled frame through the baseline-JPEG decoder
(``sample_video_frames``). Other media kinds (MP3, H.26x video,
progressive/subsampled JPEG) still raise
``NotImplementedError``/``ValueError`` at the same seam — production
swaps in a real decoder with the same ``(blob, kind) -> Decoded``
signature; such rows surface as ok=false, never task failures. The
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
    "wav_samples",
    "resample_audio",
    "RESAMPLE_SCHEMA",
    "encode_jpeg",
    "decode_jpeg",
    "encode_gif",
    "decode_gif",
    "png_pixels",
    "gif_pixels",
    "jpeg_pixels",
    "image_pixels",
    "resize_nearest",
    "resize_bilinear",
    "resize_images",
    "RESIZE_SCHEMA",
    "encode_avi_mjpeg",
    "avi_frames",
    "sample_video_frames",
    "VIDEO_FRAME_SCHEMA",
    "synth_video_df",
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



# Decode-bomb guard: a malformed/hostile header can declare dimensions
# whose pixel buffer would OOM an executor before any data check (a
# 16-byte blob claiming a 2^31-wide image). Every pixel decoder bounds
# the DECLARED size before allocating; beyond it is a ValueError →
# ok=false row, exactly like any other corrupt input. 2^26 samples
# (~256 MB float32 RGB) is far above any sane web image.
MAX_DECODE_PIXELS = 1 << 26


def _check_decode_size(width: int, height: int, channels: int = 3) -> None:
    if width <= 0 or height <= 0 or width * height * channels > MAX_DECODE_PIXELS:
        raise ValueError(
            f"refusing to decode declared size {width}x{height}x{channels} "
            f"(> {MAX_DECODE_PIXELS} samples or non-positive)"
        )


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
    px = png_pixels(blob)
    height, width, channels = px.shape
    feat = np.zeros(N_FEAT, dtype=np.float32)
    feat[0], feat[1] = float(width), float(height)
    for c in range(min(channels, 4)):
        feat[2 + 2 * c] = float(px[:, :, c].mean())
        feat[3 + 2 * c] = float(px[:, :, c].std())
    return Decoded(feat, width, height, 0)


def png_pixels(blob: bytes) -> "np.ndarray":
    """Fully decoded PNG pixel array, (height, width, channels) float32
    in [0, 255] — the pixel-level entry the resize/feature ops share."""
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
            _check_decode_size(width, height, channels)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    # Bounded inflate: dims are validated above, but a crafted IDAT can
    # still inflate ~1000x past the declared size — cap the output at
    # exactly the filtered-scanline byte count and reject any stream
    # that would produce more, BEFORE allocating the excess.
    expected = height * (width * channels + 1)
    dec = zlib.decompressobj()
    raw = dec.decompress(bytes(idat), expected)
    if dec.unconsumed_tail and dec.decompress(dec.unconsumed_tail, 1):
        raise ValueError("PNG IDAT inflates past declared dimensions")
    px = _unfilter(raw, width, height, channels)
    return px.reshape(height, width, channels).astype(np.float32)


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
    count, features = global mean/std + RMS over 8 equal segments.
    Parsing lives in :func:`wav_samples` (shared with the resample op);
    it normalizes chunk.py's bare RuntimeError to ValueError."""
    rate, s = wav_samples(blob)
    n = len(s)
    duration_ms = int(n * 1000 // rate)
    feat = np.zeros(N_FEAT, dtype=np.float32)
    feat[0] = float(rate)
    feat[1] = float(n)
    feat[2] = float(s.mean()) if len(s) else 0.0
    feat[3] = float(s.std()) if len(s) else 0.0
    for i, seg in enumerate(np.array_split(s, 8)):
        feat[4 + i] = float(np.sqrt(np.mean(seg**2))) if len(seg) else 0.0
    return Decoded(feat, 0, 0, duration_ms)


# ---------------------------------------------------------------- JPEG
# Baseline sequential DCT (SOF0), from scratch on struct/numpy — no
# image library. Encoder emits single-component (grayscale) baseline
# JPEGs with the Annex-K tables (the fixture generator); the decoder
# handles 1- or 3-component baseline streams with 1x1 sampling (no
# chroma subsampling), byte unstuffing, and DRI/RSTn restart markers.
# Progressive (SOF2), arithmetic coding, and subsampled layouts raise —
# those rows surface as ok=false in the pipeline, like any unsupported
# codec at the _real_decode seam.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 luminance quantization table (row-major)
_JPEG_LUM_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

# Annex K.3 / K.5 luminance Huffman specs: (BITS[1..16], HUFFVAL)
_JPEG_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: FDCT = C @ X @ C.T, IDCT = C.T @ X @ C."""
    n = np.arange(8)
    C = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    C[0, :] /= np.sqrt(2.0)
    return C


_DCT_C = _dct_matrix()


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length), canonical JPEG assignment (C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # pad with 1s
        return bytes(self.buf)


def _mag_bits(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC coefficient (F.1.2)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal valid baseline grayscale JPEG with deterministic pixels
    (same ``(idx*31 + seed*7919) % 256`` arithmetic as :func:`encode_png`)
    and the Annex-K luminance quant/Huffman tables. The JPEG leg of the
    multimodal fixture generator."""
    idx = np.arange(width * height, dtype=np.int64)
    img = ((idx * 31 + seed * 7919) % 256).astype(np.float64).reshape(height, width)
    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    padded = np.pad(img, ((0, ph - height), (0, pw - width)), mode="edge") - 128.0
    q = _JPEG_LUM_Q.reshape(8, 8).astype(np.float64)
    dc_codes = _huff_codes(*_JPEG_DC_LUM)
    ac_codes = _huff_codes(*_JPEG_AC_LUM)
    w = _BitWriter()
    prev_dc = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by : by + 8, bx : bx + 8]
            coef = _DCT_C @ block @ _DCT_C.T
            quant = np.round(coef / q).astype(np.int64)
            zz = quant.reshape(-1)[_ZIGZAG]
            size, bits = _mag_bits(int(zz[0]) - prev_dc)
            prev_dc = int(zz[0])
            c, l = dc_codes[size]
            w.put(c, l)
            if size:
                w.put(bits, size)
            run = 0
            for v in zz[1:]:
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    c, l = ac_codes[0xF0]  # ZRL
                    w.put(c, l)
                    run -= 16
                size, bits = _mag_bits(int(v))
                c, l = ac_codes[(run << 4) | size]
                w.put(c, l)
                w.put(bits, size)
                run = 0
            if run:
                c, l = ac_codes[0x00]  # EOB
                w.put(c, l)
    scan = w.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    dqt = seg(0xFFDB, b"\x00" + bytes(int(_JPEG_LUM_Q[i]) for i in _ZIGZAG))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]))
    dht = seg(
        0xFFC4, b"\x00" + bytes(_JPEG_DC_LUM[0]) + bytes(_JPEG_DC_LUM[1])
    ) + seg(0xFFC4, b"\x10" + bytes(_JPEG_AC_LUM[0]) + bytes(_JPEG_AC_LUM[1]))
    sos = seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return b"\xff\xd8" + dqt + sof + dht + sos + scan + b"\xff\xd9"


class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00, surfaces RSTn markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(self.pos)
            else:
                raise EOFError("marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

class _RestartMarker(ValueError):
    """Raised when an RSTn surfaces inside entropy data — reaching one
    outside the restart-boundary accounting means a corrupt stream.
    Subclasses ValueError so it lands in every pipeline's ok=false
    handling rather than escaping as a task failure."""

    def __init__(self, pos: int) -> None:
        super().__init__(f"unexpected JPEG restart marker at byte {pos}")
        self.pos = pos


def _huff_decoder(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    return {(l, c): v for v, (c, l) in _huff_codes(bits, vals).items()}


def _read_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bits(1)
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(blob: bytes) -> Decoded:
    """Decode a baseline sequential JPEG (SOF0, Huffman, 1x1 sampling,
    1 or 3 components): full marker walk, DQT/DHT parse, entropy decode
    with unstuffing + restart handling, dequantize, inverse zigzag,
    IDCT, YCbCr→RGB for color. Features mirror :func:`decode_png`
    (dims + per-channel mean/std)."""
    px = jpeg_pixels(blob)
    height, width, channels = px.shape
    feat = np.zeros(N_FEAT, dtype=np.float32)
    feat[0], feat[1] = float(width), float(height)
    for c in range(min(channels, 4)):
        feat[2 + 2 * c] = float(px[:, :, c].mean())
        feat[3 + 2 * c] = float(px[:, :, c].std())
    return Decoded(feat, width, height, 0)


def jpeg_pixels(blob: bytes) -> "np.ndarray":
    """Fully decoded JPEG pixel array, (height, width, channels) float32
    in [0, 255] — the pixel-level entry the resize/feature ops share."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    comps: list[dict] = []
    width = height = None
    restart_interval = 0
    scan_comps: list[dict] = []
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = struct.unpack_from(">H", blob, pos)[0]
        if marker == 0xFFD9:
            break
        (length,) = struct.unpack_from(">H", blob, pos + 2)
        data = blob[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 0xF
                n = 64 * (2 if pq else 1)
                raw = data[i + 1 : i + 1 + n]
                tbl = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                dezig = np.zeros(64, dtype=np.int64)
                dezig[_ZIGZAG] = tbl
                qt[tq] = dezig.reshape(8, 8)
                i += 1 + n
        elif marker == 0xFFC4:
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 0xF
                bits = list(data[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(data[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _huff_decoder(bits, vals)
                i += 17 + nv
        elif marker == 0xFFC0:
            _prec, height, width, nc = struct.unpack_from(">BHHB", data, 0)
            _check_decode_size(width, height, max(nc, 1))
            for c in range(nc):
                cid, samp, tq = data[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError(
                        "unsupported JPEG chroma subsampling (only 1x1)"
                    )
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7,
                        0xFFC9, 0xFFCA, 0xFFCB, 0xFFCD, 0xFFCE, 0xFFCF):
            raise ValueError("unsupported JPEG coding process (baseline only)")
        elif marker == 0xFFDD:
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xFFDA:
            ns = data[0]
            for c in range(ns):
                cid, tables = data[1 + 2 * c], data[2 + 2 * c]
                matches = [x for x in comps if x["id"] == cid]
                if not matches:
                    raise ValueError(f"JPEG scan references unknown component {cid}")
                scan_comps.append(
                    {**matches[0], "dc": tables >> 4, "ac": tables & 0xF}
                )
            pos += 2 + length
            break
        pos += 2 + length
    if width is None or not scan_comps:
        raise ValueError("JPEG missing SOF0/SOS")

    mcus_x = (width + 7) // 8
    mcus_y = (height + 7) // 8
    planes = [
        np.zeros((mcus_y * 8, mcus_x * 8), dtype=np.float64) for _ in scan_comps
    ]
    r = _BitReader(blob, pos)
    preds = [0] * len(scan_comps)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # byte-align, consume the RSTn, reset DC predictors
                r.acc = 0
                r.nbits = 0
                if (
                    r.data[r.pos] == 0xFF
                    and 0xD0 <= r.data[r.pos + 1] <= 0xD7
                ):
                    r.pos += 2
                preds = [0] * len(scan_comps)
            for ci, comp in enumerate(scan_comps):
                zz = np.zeros(64, dtype=np.int64)
                dc_tbl = huff.get((0, comp["dc"]))
                ac_tbl = huff.get((1, comp["ac"]))
                if dc_tbl is None or ac_tbl is None or comp["tq"] not in qt:
                    raise ValueError("JPEG scan references undefined DQT/DHT table")
                size = _read_symbol(r, dc_tbl)
                if size > 15:
                    # magnitude categories are <= 11 for 8-bit baseline;
                    # a corrupt table yielding e.g. 255 would otherwise
                    # read 255 bits into an arbitrary-precision int and
                    # overflow the int64 coefficient store (found by the
                    # byte-mutation fuzz test)
                    raise ValueError(f"corrupt JPEG DC magnitude category {size}")
                diff = _extend(r.bits(size), size) if size else 0
                preds[ci] += diff
                zz[0] = preds[ci]
                k = 1
                while k < 64:
                    sym = _read_symbol(r, ac_tbl)
                    if sym == 0x00:  # EOB
                        break
                    run, size = sym >> 4, sym & 0xF  # size <= 15 by construction
                    if size == 0:
                        if run != 15:
                            raise ValueError("bad AC symbol")
                        k += 16  # ZRL
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("AC coefficient index overflow")
                    zz[k] = _extend(r.bits(size), size)
                    k += 1
                block = np.zeros(64, dtype=np.int64)
                block[_ZIGZAG] = zz
                deq = block.reshape(8, 8) * qt[comp["tq"]]
                pix = _DCT_C.T @ deq.astype(np.float64) @ _DCT_C + 128.0
                planes[ci][my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = pix
            mcu += 1
    planes = [p[:height, :width] for p in planes]
    if len(planes) == 3:
        y, cb, cr = planes
        rgb = np.stack(
            [
                y + 1.402 * (cr - 128.0),
                y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
                y + 1.772 * (cb - 128.0),
            ],
            axis=-1,
        )
        return np.clip(rgb, 0, 255).astype(np.float32)
    return np.clip(planes[0], 0, 255).astype(np.float32)[:, :, None]


def _real_decode(blob: bytes, kind: str) -> Decoded:
    """Stdlib decoder seam: PNG + baseline JPEG + WAV decode for real;
    other kinds (video, MP3, progressive/subsampled JPEG, ...) need
    codecs this environment doesn't ship — inject a decoder with the
    same signature for those."""
    if kind == "image" and blob[:8] == _PNG_SIG:
        return decode_png(blob)
    if kind == "image" and blob[:2] == b"\xff\xd8":
        return decode_jpeg(blob)
    if kind == "image" and blob[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(blob)
    if kind == "audio" and blob[:4] == b"RIFF":
        return decode_wav(blob)
    raise NotImplementedError(
        f"no stdlib decoder for kind={kind!r} with this byte signature; "
        "inject a decoder with signature (blob: bytes, kind: str) -> Decoded"
    )


# ---------------------------------------------------------------- GIF
# GIF89a with LZW, from scratch. The encoder emits a 256-entry
# grayscale palette and the classic "uncompressed-LZW" stream (literal
# 9-bit codes with periodic CLEARs so the code width never grows) —
# valid GIF any decoder reads. The decoder implements full dynamic-
# dictionary LZW (variable code width, clear/EOI), global+local color
# tables, and extension-block skipping; interlaced images are rejected
# cleanly (ok=false rows).


def encode_gif(width: int, height: int, seed: int = 0) -> bytes:
    """Minimal valid GIF89a with deterministic grayscale pixels
    (``index = (y*w + x)*31 + seed*7919) % 256``, palette[i] = (i,i,i))."""
    idx = np.arange(width * height, dtype=np.int64)
    pixels = ((idx * 31 + seed * 7919) % 256).astype(np.uint8)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0xF7, 0, 0])  # GCT present, 8-bit, 256 entries
    for i in range(256):
        out += bytes([i, i, i])
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    out += bytes([8])  # LZW minimum code size
    # literal 9-bit codes, CLEAR (256) every 254 pixels so the decoder's
    # growing dictionary never forces a 10-bit width
    acc = 0
    nbits = 0
    data = bytearray()

    def put(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # GIF packs LSB-first
        nbits += 9
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    put(256)  # initial CLEAR
    for i, p in enumerate(pixels):
        if i and i % 254 == 0:
            put(256)
        put(int(p))
    put(257)  # EOI
    if nbits:
        data.append(acc & 0xFF)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def gif_pixels(blob: bytes) -> "np.ndarray":
    """Decode the first image of a GIF87a/89a: palette + full LZW
    (variable code width, dictionary rebuild on CLEAR). Returns
    (height, width, 3) float32."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(blob, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(blob):
        b0 = blob[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
        elif b0 == 0x2C:
            break
        elif b0 == 0x3B:
            raise ValueError("GIF trailer before any image")
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    _left, _top, width, height, ipacked = struct.unpack_from("<HHHHB", blob, pos + 1)
    pos += 10
    _check_decode_size(width, height)
    if ipacked & 0x40:
        raise ValueError("interlaced GIF not supported")
    palette = gct
    if ipacked & 0x80:
        n = 2 << (ipacked & 0x07)
        palette = np.frombuffer(blob, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    if palette is None:
        raise ValueError("GIF image has no color table")
    min_code = blob[pos]
    pos += 1
    data = bytearray()
    while blob[pos] != 0:
        ln = blob[pos]
        data += blob[pos + 1 : pos + 1 + ln]
        pos += 1 + ln
    clear = 1 << min_code
    eoi = clear + 1
    # LZW decode, LSB-first bit order
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code + 1
    acc = 0
    nbits = 0
    prev: bytes | None = None
    out = bytearray()
    i = 0
    # each iteration appends >=1 byte, so this bound also caps table
    # growth — a hostile stream with tiny declared dims can't balloon
    # the dictionary past the pixel budget
    max_out = width * height
    while len(out) < max_out:
        while nbits < code_size:
            if i >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[i] << nbits
            nbits += 8
            i += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([j]) for j in range(clear)] + [b"", b""]
            code_size = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) < width * height:
        raise ValueError("GIF pixel data short")
    indices = np.frombuffer(bytes(out[: width * height]), dtype=np.uint8)
    return palette[indices].reshape(height, width, 3).astype(np.float32)


def decode_gif(blob: bytes) -> Decoded:
    """GIF decode + the shared image feature vector (dims + per-channel
    mean/std, like :func:`decode_png`)."""
    px = gif_pixels(blob)
    height, width, channels = px.shape
    feat = np.zeros(N_FEAT, dtype=np.float32)
    feat[0], feat[1] = float(width), float(height)
    for c in range(min(channels, 4)):
        feat[2 + 2 * c] = float(px[:, :, c].mean())
        feat[3 + 2 * c] = float(px[:, :, c].std())
    return Decoded(feat, width, height, 0)


# ---------------------------------------------------------------- AVI (MJPEG)
# Motion-JPEG in a RIFF/AVI container — a real video format the
# baseline-JPEG decoder can decode frame-by-frame, so the video leg of
# the pipeline (frame sampling, per-frame decode) is genuinely
# exercised without any codec library. Non-MJPEG streams and other
# containers still surface as ok=false at the seam.


def encode_avi_mjpeg(
    width: int, height: int, n_frames: int, fps: int = 10, seed: int = 0
) -> bytes:
    """Minimal valid AVI: hdrl(avih + strl(strh 'vids'/'MJPG' + strf))
    then movi with one '00dc' JPEG chunk per frame (frame f seeded
    ``seed*100 + f`` so each frame's pixels differ deterministically)."""

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return fourcc + struct.pack("<I", len(payload)) + payload + pad

    def lst(four: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", four + payload)

    usec = 1_000_000 // fps
    avih = struct.pack(
        "<14I", usec, 0, 0, 0, n_frames, 0, 1, 0, width, height, 0, 0, 0, 0
    )
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n_frames, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, width * height * 3, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    frames = b"".join(
        chunk(b"00dc", encode_jpeg(width, height, seed=seed * 100 + f))
        for f in range(n_frames)
    )
    movi = lst(b"movi", frames)
    riff_payload = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def avi_frames(blob: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """Parse an AVI container: returns (n_frames, usec_per_frame,
    width, height, frame_payloads) from the avih header + '00dc'/'00db'
    movi chunks. Pure RIFF walking; raises ValueError on non-AVI."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF header)")
    n_frames = usec = width = height = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal n_frames, usec, width, height
        while pos + 8 <= end:
            fourcc = blob[pos : pos + 4]
            (size,) = struct.unpack_from("<I", blob, pos + 4)
            body = pos + 8
            if fourcc == b"LIST":
                walk(body + 4, body + size)
            elif fourcc == b"avih":
                usec, _mbs, _pad, _fl, n_frames = struct.unpack_from("<5I", blob, body)
                width, height = struct.unpack_from("<II", blob, body + 32)
            elif fourcc in (b"00dc", b"00db"):
                frames.append(blob[body : body + size])
            pos = body + size + (size % 2)

    walk(12, len(blob))
    if n_frames is None:
        raise ValueError("AVI missing avih header")
    return int(n_frames), int(usec), int(width), int(height), frames


VIDEO_FRAME_SCHEMA = (
    "media_id long, frame_idx int, ok boolean, err string, "
    "width int, height int, n_frames int, duration_ms int"
)


def sample_video_frames(
    df: DataFrame, every_k: int = 2, blob_col: str = "blob"
) -> DataFrame:
    """Frame-sampling stage for video columns: parse the container,
    keep every ``k``-th frame, REALLY decode each kept frame (MJPEG →
    the baseline-JPEG decoder) and emit one row per sampled frame with
    the decoded dims plus container-level frame count / duration.
    Undecodable rows → ok=false, never task failures. mapInPandas, so
    a 100 TB video corpus fans out by row like every other media op."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "ok": [], "err": [],
                "width": [], "height": [], "n_frames": [], "duration_ms": [],
            }

            def emit(mid, fi, ok, err, w, h, nf, dur):
                out["media_id"].append(mid)
                out["frame_idx"].append(fi)
                out["ok"].append(ok)
                out["err"].append(err)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["duration_ms"].append(dur)

            for t in pdf.itertuples(index=False):
                mid = int(t.media_id)
                try:
                    nf, usec, _w, _h, frames = avi_frames(
                        bytes(t.blob) if t.blob is not None else b""
                    )
                    dur = nf * usec // 1000
                    for fi in range(0, len(frames), every_k):
                        px = jpeg_pixels(frames[fi])
                        emit(mid, fi, True, "", px.shape[1], px.shape[0], nf, dur)
                except (
                    NotImplementedError,
                    ValueError,
                    zlib.error,
                    EOFError,
                    KeyError,
                    struct.error,
                    IndexError,
                ) as e:
                    emit(mid, -1, False, str(e)[:120], 0, 0, 0, 0)
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, VIDEO_FRAME_SCHEMA)


def synth_video_df(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic AVI-MJPEG fixtures (distributed): per id,
    n_frames = 3 + id % 5 at 10 fps, frame dims (4 + id % 13,
    3 + id % 7) — duration_ms = 100 * n_frames; all recomputable from
    id arithmetic by the SQL oracle."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "kind": [], "mime": [], "n_bytes": [],
                "width": [], "height": [], "duration_ms": [], "blob": [],
            }
            for t in pdf.itertuples(index=False):
                i = int(getattr(t, id_col))
                w, h, nf = 4 + i % 13, 3 + i % 7, 3 + i % 5
                blob = encode_avi_mjpeg(w, h, nf, fps=10, seed=i)
                out["media_id"].append(i)
                out["kind"].append("video")
                out["mime"].append("video/x-msvideo")
                out["n_bytes"].append(len(blob))
                out["width"].append(w)
                out["height"].append(h)
                out["duration_ms"].append(nf * 100)
                out["blob"].append(blob)
            yield pd.DataFrame(out)

    return ids.select(id_col).mapInPandas(fn, MEDIA_SCHEMA)


def image_pixels(blob: bytes) -> "np.ndarray":
    """Byte-signature-dispatched pixel decode (PNG, baseline JPEG, GIF)."""
    if blob[:8] == _PNG_SIG:
        return png_pixels(blob)
    if blob[:2] == b"\xff\xd8":
        return jpeg_pixels(blob)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return gif_pixels(blob)
    raise NotImplementedError("no stdlib pixel decoder for this byte signature")


def resize_nearest(px: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """Nearest-neighbor resize with the floor mapping
    ``src = (dst * src_dim) // dst_dim`` — integer arithmetic a SQL
    oracle can replicate exactly over the deterministic fixtures."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return px[ys[:, None], xs[None, :]]


def resize_bilinear(px: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """Bilinear resize (half-pixel centers, edge clamp) — the quality
    path for thumbnailing/feature prep; float math, pytest-covered
    rather than SQL-oracled."""
    h, w = px.shape[:2]
    y = np.clip((np.arange(out_h) + 0.5) * h / out_h - 0.5, 0, h - 1)
    x = np.clip((np.arange(out_w) + 0.5) * w / out_w - 0.5, 0, w - 1)
    y0 = np.floor(y).astype(np.int64)
    x0 = np.floor(x).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (y - y0)[:, None, None]
    fx = (x - x0)[None, :, None]
    p00 = px[y0[:, None], x0[None, :]]
    p01 = px[y0[:, None], x1[None, :]]
    p10 = px[y1[:, None], x0[None, :]]
    p11 = px[y1[:, None], x1[None, :]]
    top = p00 * (1 - fx) + p01 * fx
    bot = p10 * (1 - fx) + p11 * fx
    return (top * (1 - fy) + bot * fy).astype(np.float32)


def wav_samples(blob: bytes) -> tuple[int, "np.ndarray"]:
    """(sample_rate, mono float32 samples) — the pixel-level analogue
    for audio, shared by the feature and resample paths."""
    try:
        with wave.open(io.BytesIO(blob), "rb") as w:
            n, rate, width, ch = (
                w.getnframes(),
                w.getframerate(),
                w.getsampwidth(),
                w.getnchannels(),
            )
            frames = w.readframes(n)
    except RuntimeError as e:  # stdlib chunk.py bare RuntimeError
        raise ValueError(f"corrupt WAV container: {e or 'bad chunk seek'}")
    if width != 2:
        raise ValueError(f"unsupported WAV sample width {width}")
    s = np.frombuffer(frames, dtype="<i2").astype(np.float32)
    if ch > 1:
        s = s.reshape(-1, ch).mean(axis=1)
    return rate, s


RESAMPLE_SCHEMA = (
    "media_id long, ok boolean, err string, out_rate int, n_out int, "
    "out_duration_ms int, rms int"
)


def resample_audio(df: DataFrame, target_rate: int, blob_col: str = "blob") -> DataFrame:
    """Distributed audio resample by integer decimation: keep every
    ``src_rate // target_rate``-th sample (``src_rate`` must be an
    integer multiple — the common 48k→16k / 44.1k→14.7k training-prep
    shape; anything else is an ok=false row, as is non-audio input).
    Emits per-row proof-of-work scalars: output length, duration at the
    target rate, and the integer RMS of the decimated signal — the
    length/duration pair is recomputable from the fixture arithmetic by
    a SQL oracle; RMS pins the samples themselves in pytest."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "ok": [], "err": [], "out_rate": [],
                "n_out": [], "out_duration_ms": [], "rms": [],
            }
            for t in pdf.itertuples(index=False):
                out["media_id"].append(int(t.media_id))
                out["out_rate"].append(target_rate)
                try:
                    rate, samples = wav_samples(
                        bytes(t.blob) if t.blob is not None else b""
                    )
                    if target_rate <= 0 or rate % target_rate != 0:
                        raise ValueError(
                            f"decimation needs src_rate % target == 0 "
                            f"(src {rate}, target {target_rate})"
                        )
                    dec = samples[:: rate // target_rate]
                    out["ok"].append(True)
                    out["err"].append("")
                    out["n_out"].append(len(dec))
                    out["out_duration_ms"].append(len(dec) * 1000 // target_rate)
                    out["rms"].append(
                        int(np.sqrt(np.mean(dec.astype(np.float64) ** 2)))
                        if len(dec)
                        else 0
                    )
                except (
                    NotImplementedError,
                    ValueError,
                    zlib.error,
                    wave.Error,
                    EOFError,
                    KeyError,
                    struct.error,
                    IndexError,
                ) as e:
                    out["ok"].append(False)
                    out["err"].append(str(e)[:120])
                    out["n_out"].append(0)
                    out["out_duration_ms"].append(0)
                    out["rms"].append(0)
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, RESAMPLE_SCHEMA)



RESIZE_SCHEMA = (
    "media_id long, ok boolean, err string, out_w int, out_h int, "
    "pix_sum long, px_first int, px_last int"
)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    method: str = "nearest",
    blob_col: str = "blob",
) -> DataFrame:
    """Distributed image resize over the opaque binary column
    (mapInPandas — per-row pixel work is inherent to codecs, batches
    ride Arrow). Emits per-image proof-of-work scalars the oracle can
    recompute for the deterministic PNG fixtures: channel-0 pixel sum
    of the resized image plus its first/last pixel. Non-image or
    undecodable rows surface as ok=false, never task failures."""
    if method == "nearest":
        resize = resize_nearest
    elif method == "bilinear":
        resize = resize_bilinear
    else:
        raise ValueError(f"unknown resize method {method!r}")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "ok": [], "err": [], "out_w": [], "out_h": [],
                "pix_sum": [], "px_first": [], "px_last": [],
            }
            for t in pdf.itertuples(index=False):
                out["media_id"].append(int(t.media_id))
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                try:
                    px = image_pixels(bytes(t.blob) if t.blob is not None else b"")
                    r = resize(px, out_w, out_h)
                    c0 = r[:, :, 0].astype(np.int64)
                    out["ok"].append(True)
                    out["err"].append("")
                    out["pix_sum"].append(int(c0.sum()))
                    out["px_first"].append(int(c0[0, 0]))
                    out["px_last"].append(int(c0[-1, -1]))
                except (
                    NotImplementedError,
                    ValueError,
                    zlib.error,
                    EOFError,
                    KeyError,
                    struct.error,
                    IndexError,
                ) as e:
                    out["ok"].append(False)
                    out["err"].append(str(e)[:120])
                    out["pix_sum"].append(0)
                    out["px_first"].append(0)
                    out["px_last"].append(0)
            yield pd.DataFrame(out)

    return df.mapInPandas(fn, RESIZE_SCHEMA)


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
                    KeyError,  # malformed table/marker references
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
    no driver-side blobs): even ids → image with width = 4 + id % 13,
    height = 3 + id % 7 — baseline JPEG when id % 8 == 0, GIF when
    id % 8 == 4, PNG otherwise (same dimension arithmetic for all
    three, so the SQL oracle is unchanged and proves each decoder
    extracted dims from real compressed bytes); odd ids → 8 kHz WAV with n_samples = 800 + 40 * (id % 50)
    (duration_ms = 100 + 5 * (id % 50)). The dimension arithmetic is
    intentionally trivial so a SQL oracle can recompute the expected
    (width, height, duration_ms) per id and cross-check the real
    decoders' output."""

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
                    if i % 8 == 0:
                        blob, mime = encode_jpeg(w, h, seed=i), "image/jpeg"
                    elif i % 8 == 4:
                        blob, mime = encode_gif(w, h, seed=i), "image/gif"
                    else:
                        blob, mime = encode_png(w, h, seed=i), "image/png"
                    out["kind"].append("image")
                    out["mime"].append(mime)
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
