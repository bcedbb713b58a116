"""Pure-python media codecs (operators/codecs.py) + the real default
decode/resize hooks through the Spark mapInPandas plumbing."""

from __future__ import annotations

import pytest

from marc_data_migration_spark.operators.codecs import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    image_features,
    image_resize,
    resample_nn,
)

GRID_3x2 = [  # rows top-down; w=3 forces a 3-byte BMP row pad (9 % 4)
    [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
    [(1, 2, 3), (4, 5, 6), (7, 8, 9)],
]


def test_bmp_roundtrip_with_row_padding():
    payload = encode_bmp(GRID_3x2)
    w, h, grid = decode_bmp(payload)
    assert (w, h) == (3, 2)
    assert grid == GRID_3x2
    # stride = 3*3 + 3 pad = 12; file = 54 header + 2*12 pixel bytes
    assert len(payload) == 54 + 24


def test_bmp_top_down_negative_height():
    """Top-down BMPs store height < 0 and rows in natural order."""
    import struct

    payload = bytearray(encode_bmp(GRID_3x2))
    # flip height sign and reverse the stored row order
    struct.pack_into("<i", payload, 14 + 8, -2)
    stride = 12
    rows = payload[54:]
    payload[54:] = rows[stride:] + rows[:stride]
    w, h, grid = decode_bmp(bytes(payload))
    assert (w, h, grid) == (3, 2, GRID_3x2)


def test_ppm_roundtrip_and_comments():
    payload = encode_ppm(GRID_3x2)
    assert decode_ppm(payload) == (3, 2, GRID_3x2)
    commented = payload.replace(b"P6\n", b"P6\n# a comment line\n", 1)
    assert decode_ppm(commented) == (3, 2, GRID_3x2)


@pytest.mark.parametrize(
    "bad",
    [b"", b"BM123", b"P6\n3 2\n65535\n" + b"\x00" * 18, b"GIF89a....."],
)
def test_decode_rejects_garbage(bad):
    with pytest.raises(ValueError):
        decode_image(bad)


def test_resample_nn_known_grid():
    """4x4 → 2x2 nearest-neighbor picks indices 0 and 2 on each axis."""
    g = [[(x * 10 + y, 0, 0) for x in range(4)] for y in range(4)]
    out = resample_nn(g, 2, 2)
    assert [[px[0] for px in row] for row in out] == [[0, 20], [2, 22]]


def test_image_features_exact():
    feats = image_features(encode_bmp(GRID_3x2), "image")
    assert feats[:2] == [3.0, 2.0]
    assert feats[2] == pytest.approx((255 + 0 + 0 + 1 + 4 + 7) / 6)
    assert feats[3] == pytest.approx((0 + 255 + 0 + 2 + 5 + 8) / 6)
    assert feats[4] == pytest.approx((0 + 0 + 255 + 3 + 6 + 9) / 6)
    with pytest.raises(ValueError, match="kind"):
        image_features(encode_bmp(GRID_3x2), "audio")


def test_image_resize_real_resample():
    """Resize = decode → NN resample → re-encode in the same format,
    sized to the byte budget (side = floor(sqrt(target/3)))."""
    big = [[(x % 256, y % 256, (x + y) % 256) for x in range(16)] for y in range(16)]
    out = image_resize(encode_bmp(big), "image", target_bytes=48)  # side 4
    w, h, grid = decode_bmp(out)
    assert (w, h) == (4, 4)
    assert grid == resample_nn(big, 4, 4)
    out_ppm = image_resize(encode_ppm(big), "image", target_bytes=48)
    assert out_ppm[:2] == b"P6" and decode_ppm(out_ppm)[2] == resample_nn(big, 4, 4)


def test_decode_media_default_real_codec_end_to_end(spark):
    """Planted deterministic bitmaps through the REAL default hook: the
    decoded dimensions and channel means must equal the closed-form
    pixel arithmetic, across all three container formats (PPM for
    id%3==0, compressed PNG for id%3==1, BMP otherwise)."""
    from pyspark.sql import functions as F

    from marc_data_migration_spark.operators.multimodal import (
        decode_media,
        synthesize_image_media,
    )

    docs = spark.range(40).select(F.col("id").alias("doc_id"))
    feats = {
        r.media_id: r.feat
        for r in decode_media(
            synthesize_image_media(docs, include_png=True)
        ).collect()
    }
    assert len(feats) == 40
    for mid in range(40):
        w, h = 8 + mid % 5, 6 + mid % 4
        n = w * h
        want = [
            float(w),
            float(h),
            sum((7 * x + 13 * y + 31 * mid) % 256 for x in range(w) for y in range(h)) / n,
            sum((11 * x + 17 * y + mid) % 256 for x in range(w) for y in range(h)) / n,
            sum((5 * x + 3 * y + 23 * mid) % 256 for x in range(w) for y in range(h)) / n,
        ]
        assert feats[mid] == pytest.approx(want), mid


def test_resize_media_default_real_resizer_end_to_end(spark):
    from pyspark.sql import functions as F

    from marc_data_migration_spark.operators.multimodal import (
        resize_media,
        synthesize_image_media,
    )

    docs = spark.range(12).select(F.col("id").alias("doc_id"))
    out = resize_media(
        synthesize_image_media(docs, include_png=True), target_bytes=27  # side 3
    ).collect()
    assert len(out) == 12
    saw_png = False
    for r in out:
        saw_png = saw_png or bytes(r.payload).startswith(b"\x89PNG")
        w, h, _ = decode_image(bytes(r.payload))
        assert (w, h) == (3, 3)
        assert r.meta["resized_bytes"] == "27"
    assert saw_png  # the id%3==1 rows resized-and-re-encoded as PNG


def test_wav_roundtrip_mono_and_stereo():
    from marc_data_migration_spark.operators.codecs import decode_wav, encode_wav

    mono = [(0,), (1000,), (-1000,), (32767,), (-32768,)]
    assert decode_wav(encode_wav(mono, 16000)) == (16000, 1, mono)
    stereo = [(100, -100), (2000, 0)]
    assert decode_wav(encode_wav(stereo, 8000)) == (8000, 2, stereo)


def test_wav_skips_extra_chunks_and_word_alignment():
    """A LIST/INFO chunk with an ODD size before data must be skipped
    with word-aligned advance, like real writers emit."""
    import struct

    from marc_data_migration_spark.operators.codecs import decode_wav, encode_wav

    canonical = encode_wav([(7,), (-7,)], 8000)
    # splice an odd-sized junk chunk between fmt and data
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    spliced = canonical[:fmt_end] + junk + canonical[fmt_end:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced) == (8000, 1, [(7,), (-7,)])


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"RIFF\x00\x00\x00\x00WAVX",
        b"not audio at all",
    ],
)
def test_wav_rejects_garbage(bad):
    from marc_data_migration_spark.operators.codecs import decode_wav

    with pytest.raises(ValueError):
        decode_wav(bad)


def test_audio_features_exact():
    from marc_data_migration_spark.operators.codecs import audio_features, encode_wav

    # constant amplitude -> rms == amplitude/32768 exactly
    wav = encode_wav([(16384,)] * 8000, 8000)
    dur, rate, n_ch, rms = audio_features(wav, "audio")
    assert (dur, rate, n_ch) == (1.0, 8000.0, 1.0)
    assert abs(rms - 0.5) < 1e-9
    with pytest.raises(ValueError):
        audio_features(wav, "image")


def test_media_features_routes_mixed_kinds(spark):
    """decode_media with the kind-routing codec over a mixed
    image+audio table: one mapInPandas pass, real parses both ways."""
    from marc_data_migration_spark.operators.codecs import (
        encode_bmp,
        encode_wav,
        media_features,
    )
    from marc_data_migration_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
    )

    img = encode_bmp([[(10, 20, 30), (40, 50, 60)]])
    wav = encode_wav([(16384,), (-16384,)], 8000)
    rows = [
        (1, "c1", "image", bytearray(img), {}),
        (2, "c2", "audio", bytearray(wav), {}),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {r.media_id: r.feat for r in decode_media(df, codec=media_features).collect()}
    assert got[1] == [2.0, 1.0, 25.0, 35.0, 45.0]
    assert got[2][1:3] == [8000.0, 1.0]
    assert abs(got[2][3] - 0.5) < 1e-9


def test_avi_roundtrip_with_stride_padding():
    from marc_data_migration_spark.operators.codecs import decode_avi, encode_avi

    # 3-wide rows -> 9 bytes, padded to 12: stride logic exercised
    f1 = [[(1, 2, 3), (4, 5, 6), (7, 8, 9)], [(9, 8, 7), (6, 5, 4), (3, 2, 1)]]
    f2 = [[(0, 0, 0), (255, 255, 255), (128, 0, 128)], [(1, 1, 1), (2, 2, 2), (3, 3, 3)]]
    fps, w, h, frames = decode_avi(encode_avi([f1, f2], fps=25))
    assert (fps, w, h) == (25.0, 3, 2)
    assert frames == [f1, f2]


@pytest.mark.parametrize(
    "bad",
    [b"", b"RIFF\x04\x00\x00\x00WAVE", b"RIFF\x04\x00\x00\x00AVI ", b"junkjunkjunk"],
)
def test_avi_rejects_garbage_and_headerless(bad):
    from marc_data_migration_spark.operators.codecs import decode_avi

    with pytest.raises(ValueError):
        decode_avi(bad)


def test_video_features_exact():
    from marc_data_migration_spark.operators.codecs import encode_avi, video_features

    # all-white single pixel, 2 frames at 10 fps: luma == 255 exactly
    avi = encode_avi([[[(255, 255, 255)]], [[(255, 255, 255)]]], fps=10)
    n, fps, w, h, luma = video_features(avi, "video")
    assert (n, fps, w, h) == (2.0, 10.0, 1.0, 1.0)
    assert abs(luma - 255.0) < 1e-6
    with pytest.raises(ValueError):
        video_features(avi, "audio")


def test_media_features_routes_all_three_kinds(spark):
    from marc_data_migration_spark.operators.codecs import (
        encode_avi,
        encode_bmp,
        encode_wav,
        media_features,
    )
    from marc_data_migration_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
    )

    img = encode_bmp([[(10, 20, 30), (40, 50, 60)]])
    wav = encode_wav([(16384,), (-16384,)], 8000)
    avi = encode_avi([[[(255, 255, 255)]]], fps=5)
    rows = [
        (1, "c1", "image", bytearray(img), {}),
        (2, "c2", "audio", bytearray(wav), {}),
        (3, "c3", "video", bytearray(avi), {}),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {r.media_id: r.feat for r in decode_media(df, codec=media_features).collect()}
    assert got[1] == [2.0, 1.0, 25.0, 35.0, 45.0]
    assert got[2][1:3] == [8000.0, 1.0]
    assert got[3][:4] == [1.0, 5.0, 1.0, 1.0]


def test_audio_resample_real_downsample():
    from marc_data_migration_spark.operators.codecs import (
        audio_resample,
        decode_wav,
        encode_wav,
    )

    wav = encode_wav([(i * 100, -i * 100) for i in range(100)], 8000)
    small = audio_resample(wav, "audio", 80)
    rate, n_ch, frames = decode_wav(small)
    assert (n_ch, len(frames)) == (2, 20)  # 80 bytes / (2ch * 2B)
    assert rate == 1600  # rate scales with the frame cut: duration kept
    assert frames[0] == (0, 0) and frames[-1] == (9500, -9500)
    with pytest.raises(ValueError):
        audio_resample(wav, "image", 80)


def test_video_resize_keeps_frames_shrinks_pixels():
    from marc_data_migration_spark.operators.codecs import (
        decode_avi,
        encode_avi,
        video_resize,
    )

    frames = [[[(255, 0, 0)] * 4 for _ in range(4)] for _ in range(3)]
    avi = encode_avi(frames, fps=10)
    fps, w, h, out = decode_avi(video_resize(avi, "video", 36))
    assert (fps, w, h, len(out)) == (10.0, 2, 2, 3)  # 36B/3f -> 2x2
    assert out[0][0][0] == (255, 0, 0)


def test_resize_media_router_all_kinds(spark):
    from marc_data_migration_spark.operators.codecs import (
        decode_avi,
        decode_image,
        decode_wav,
        encode_avi,
        encode_bmp,
        encode_wav,
        media_resize_router,
    )
    from marc_data_migration_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_media,
    )

    rows = [
        (1, "c1", "image", bytearray(encode_bmp([[(9, 9, 9)] * 4] * 4)), {}),
        (2, "c2", "audio", bytearray(encode_wav([(5,)] * 50, 8000)), {}),
        (3, "c3", "video", bytearray(encode_avi([[[(1, 2, 3)] * 4] * 4] * 2, fps=4)), {}),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {
        r.media_id: bytes(r.payload)
        for r in resize_media(df, target_bytes=24, resizer=media_resize_router).collect()
    }
    assert decode_image(got[1])[:2] == (2, 2)
    assert len(decode_wav(got[2])[2]) == 12  # 24B mono
    fps, w, h, fr = decode_avi(got[3])
    assert (w, h, len(fr)) == (2, 2, 2)


def test_codec_degenerate_payloads_raise_valueerror():
    """Every degenerate-but-parseable payload must surface as the
    documented ValueError quarantine signal, never an IndexError /
    ZeroDivisionError that would kill a mapInPandas task opaquely."""
    import struct

    from marc_data_migration_spark.operators.codecs import (
        audio_features,
        audio_resample,
        decode_wav,
        encode_avi,
        encode_wav,
        video_resize,
    )

    # empty data chunk: features degrade gracefully, resample raises
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    empty_wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    assert audio_features(empty_wav, "audio") == [0.0, 8000.0, 1.0, 0.0]
    with pytest.raises(ValueError):
        audio_resample(empty_wav, "audio", 64)

    # sample_rate=0 in fmt: decode itself must reject it
    bad_fmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
    rate0 = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(bad_fmt) + 8 + 2) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(bad_fmt)) + bad_fmt
        + b"data" + struct.pack("<I", 2) + b"\x01\x00"
    )
    with pytest.raises(ValueError):
        decode_wav(rate0)

    # zero-frame AVI (valid header, empty movi): resize raises
    avih = struct.pack("<14I", 100000, 0, 0, 0, 0, 0, 1, 0, 1, 1, 0, 0, 0, 0)
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih)) + b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    movi = b"LIST" + struct.pack("<I", 4) + b"movi"
    no_frames = b"RIFF" + struct.pack("<I", 4 + len(hdrl) + len(movi)) + b"AVI " + hdrl + movi
    with pytest.raises(ValueError):
        video_resize(no_frames, "video", 64)

    # ragged / empty frames: encode must refuse, not corrupt silently
    with pytest.raises(ValueError):
        encode_avi([[[(1, 1, 1)], [(1, 1, 1), (2, 2, 2)]]])
    with pytest.raises(ValueError):
        encode_avi([[]])
    with pytest.raises(ValueError):
        encode_wav([])


def test_video_resize_preserves_fractional_fps():
    from marc_data_migration_spark.operators.codecs import (
        decode_avi,
        encode_avi,
        video_resize,
    )

    # 29.97 fps NTSC: dwMicroSecPerFrame=33367 must survive the resize
    src = encode_avi([[[(9, 9, 9)] * 4] * 4] * 2, usec_per_frame=33367)
    fps_in = decode_avi(src)[0]
    fps_out = decode_avi(video_resize(src, "video", 12))[0]
    assert fps_out == fps_in
    assert abs(fps_in - 29.97) < 0.01


# ---------------------------------------------------------------------
# PNG — the compressed member of the image family (stdlib zlib inflate
# + real per-scanline unfiltering)
# ---------------------------------------------------------------------


def test_png_roundtrip_every_filter_type():
    """Each PNG filter type (None/Sub/Up/Average/Paeth) is applied on
    encode and undone on decode — the unfilter paths are proven by
    round-trip, not trusted."""
    from marc_data_migration_spark.operators.codecs import decode_png, encode_png

    grid = [[((x * 37 + y * 11) % 256, (x * 5) % 256, (y * 7) % 256)
             for x in range(5)] for y in range(5)]
    for f in range(5):
        payload = encode_png(grid, filters=[f] * 5)
        assert decode_png(payload) == (5, 5, grid), f"filter {f}"
    # mixed filters down the image
    payload = encode_png(grid, filters=[0, 1, 2, 3, 4])
    assert decode_png(payload) == (5, 5, grid)


def test_png_property_random_grids_and_filters():
    """Round-trip holds for arbitrary pixel content under arbitrary
    per-row filter schedules."""
    import random

    from marc_data_migration_spark.operators.codecs import decode_png, encode_png

    rnd = random.Random(404)
    for _ in range(20):
        w, h = rnd.randint(1, 9), rnd.randint(1, 9)
        grid = [
            [(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
             for _ in range(w)]
            for _ in range(h)
        ]
        filters = [rnd.randrange(5) for _ in range(h)]
        assert decode_png(encode_png(grid, filters=filters)) == (w, h, grid)


def test_png_rejects_corruption_and_unsupported():
    import struct as _s
    import zlib

    from marc_data_migration_spark.operators.codecs import decode_png, encode_png

    good = encode_png(GRID_3x2)
    # flipped pixel byte → chunk CRC mismatch
    corrupt = bytearray(good)
    corrupt[-20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|IDAT|truncated"):
        decode_png(bytes(corrupt))
    # truncated mid-chunk
    with pytest.raises(ValueError):
        decode_png(good[:-8])
    # unsupported color type (palette) rejected loudly at IHDR
    ihdr = _s.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0)
    chunk = _s.pack(">I", len(ihdr)) + b"IHDR" + ihdr + _s.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr)
    )
    with pytest.raises(ValueError, match="truecolor"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)
    # interlaced rejected
    ihdr = _s.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 1)
    chunk = _s.pack(">I", len(ihdr)) + b"IHDR" + ihdr + _s.pack(
        ">I", zlib.crc32(b"IHDR" + ihdr)
    )
    with pytest.raises(ValueError, match="interlace"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)
    # encoder input validation
    with pytest.raises(ValueError):
        encode_png([])
    with pytest.raises(ValueError):
        encode_png(GRID_3x2, filters=[7, 0])


def test_png_through_sniffer_features_and_resize():
    """decode_image sniffs the PNG signature; image_features and
    image_resize treat a PNG payload exactly like BMP/PPM, and resize
    re-encodes in PNG."""
    from marc_data_migration_spark.operators.codecs import decode_png, encode_png

    payload = encode_png(GRID_3x2, filters=[4, 2])
    assert decode_image(payload) == (3, 2, GRID_3x2)
    feats = image_features(payload, "image")
    assert feats == image_features(encode_bmp(GRID_3x2), "image")
    big = [[(x % 256, y % 256, (x + y) % 256) for x in range(16)] for y in range(16)]
    out = image_resize(encode_png(big), "image", target_bytes=48)
    assert out[:8] == b"\x89PNG\r\n\x1a\n"
    assert decode_png(out)[2] == resample_nn(big, 4, 4)


# ---------------------------------------------------------------------
# G.711 µ-law WAV — the compressed member of the audio family
# ---------------------------------------------------------------------


def test_ulaw_codebook_properties():
    """The companding transform satisfies the G.711 invariants:
    decoded values are fixed points of a decode→encode→decode cycle,
    and quantization error is bounded by the segment step size."""
    from marc_data_migration_spark.operators.codecs import (
        _ulaw_decode_sample,
        _ulaw_encode_sample,
    )

    for b in range(256):
        v = _ulaw_decode_sample(b)
        assert -32768 < v < 32768
        assert _ulaw_decode_sample(_ulaw_encode_sample(v)) == v, b
    # error bound: segment exp has step 8 << exp (half-step after round)
    for s in [-32768, -32635, -5000, -133, -1, 0, 1, 7, 132, 5000, 32635, 32767]:
        v = _ulaw_decode_sample(_ulaw_encode_sample(s))
        clipped = max(min(s, 32635), -32635)
        assert abs(v - clipped) <= 1024, (s, v)  # top-segment step 8<<7


def test_wav_ulaw_roundtrip_and_size():
    """µ-law WAV decodes to the companded int16 frames; the payload is
    half the PCM size for the same content (8 vs 16 bits/sample)."""
    from marc_data_migration_spark.operators.codecs import (
        _ulaw_decode_sample,
        _ulaw_encode_sample,
        decode_wav,
        encode_wav,
    )

    frames = [(i * 321 - 16000, -i * 255) for i in range(100)]
    payload = encode_wav(frames, sample_rate=8000, ulaw=True)
    rate, n_ch, got = decode_wav(payload)
    assert (rate, n_ch) == (8000, 2)
    want = [
        tuple(_ulaw_decode_sample(_ulaw_encode_sample(s)) for s in f) for f in frames
    ]
    assert got == want
    pcm = encode_wav(frames, sample_rate=8000)
    assert len(payload) - 44 == (len(pcm) - 44) // 2


def test_wav_ulaw_features_and_resample_preserve_format():
    """audio_features is codec-blind (µ-law expands to int16 before the
    RMS), and audio_resample re-encodes µ-law as µ-law with the byte
    budget computed at 1 byte/sample."""
    from marc_data_migration_spark.operators.codecs import (
        audio_features,
        audio_resample,
        decode_wav,
        encode_wav,
    )

    frames = [((i * 97) % 20000 - 10000,) for i in range(200)]
    payload = encode_wav(frames, sample_rate=8000, ulaw=True)
    dur, rate, n_ch, rms = audio_features(payload, "audio")
    assert (dur, rate, n_ch) == (200 / 8000, 8000.0, 1.0)
    assert 0.0 < rms < 1.0
    out = audio_resample(payload, "audio", target_bytes=50)
    rate2, n_ch2, got = decode_wav(out)
    assert n_ch2 == 1 and len(got) == 50  # 50 bytes / 1 byte-per-frame
    assert rate2 == max(round(8000 * 50 / 200), 1)
    # still µ-law: re-decoding PCM-style must fail on the format tag
    from marc_data_migration_spark.operators.codecs import _wav_fmt_tag

    assert _wav_fmt_tag(out) == 7


# ---------------------------------------------------------------------
# BI_RLE8 AVI — the compressed member of the video family
# ---------------------------------------------------------------------


def _rle_frames():
    # few distinct colors with long runs — the shape RLE compresses
    return [
        [[(f * 10, 0, 200) if x < 6 else (0, 255, 0) for x in range(9)]
         for _y in range(7)]
        for f in range(3)
    ]


def test_avi_rle8_roundtrip_and_compression():
    from marc_data_migration_spark.operators.codecs import decode_avi, encode_avi

    frames = _rle_frames()
    rle = encode_avi(frames, fps=10, rle8=True)
    raw = encode_avi(frames, fps=10)
    assert decode_avi(rle) == decode_avi(raw) == (10.0, 9, 7, frames)
    # runs actually compress: movi payload well under the DIB size
    assert len(rle) < len(raw)


def test_avi_rle8_property_random_paletted_frames():
    import random

    from marc_data_migration_spark.operators.codecs import decode_avi, encode_avi

    rnd = random.Random(777)
    colors = [(rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
              for _ in range(20)]
    for _ in range(10):
        w, h, n = rnd.randint(1, 12), rnd.randint(1, 8), rnd.randint(1, 4)
        frames = [
            [[colors[rnd.randrange(len(colors))] for _ in range(w)]
             for _ in range(h)]
            for _ in range(n)
        ]
        fps, gw, gh, got = decode_avi(encode_avi(frames, rle8=True))
        assert (gw, gh, got) == (w, h, frames)


def test_avi_rle8_absolute_mode_and_rejections():
    import struct as _s

    from marc_data_migration_spark.operators.codecs import (
        _rle8_decompress,
        encode_avi,
    )

    # absolute mode: escape 00 n>=3 then n literal indices, word-padded
    data = bytes([0, 3, 5, 6, 7, 0]) + b"\x00\x01"  # 3 literals + pad, EOB
    assert _rle8_decompress(data, 3, 1) == [[5, 6, 7]]
    # run overflowing the row is loud
    with pytest.raises(ValueError, match="overflows"):
        _rle8_decompress(bytes([4, 1, 0, 1]), 3, 1)
    # missing EOB is loud
    with pytest.raises(ValueError, match="end-of-bitmap"):
        _rle8_decompress(bytes([2, 1, 0, 0]), 3, 1)
    # position delta rejected
    with pytest.raises(ValueError, match="delta"):
        _rle8_decompress(bytes([0, 2, 1, 1, 0, 1]), 3, 1)
    # >256 distinct colors cannot palettize
    big = [[[(x % 256, y % 7, (x // 256) % 256) for x in range(300)]
            for y in range(2)]]
    with pytest.raises(ValueError, match="256"):
        encode_avi(big, rle8=True)
    # non-RLE8 '00dc' still rejected: patch biCompression to 2
    from marc_data_migration_spark.operators.codecs import decode_avi

    rle = bytearray(encode_avi(_rle_frames(), rle8=True))
    i = rle.find(b"strf")
    _s.pack_into("<I", rle, i + 8 + 16, 2)  # biCompression field
    with pytest.raises(ValueError, match="not supported|palette"):
        decode_avi(bytes(rle))


def test_avi_rle8_features_and_resize_preserve_format():
    """video_features is codec-blind; video_resize re-encodes RLE8 as
    RLE8 with frame count and fps preserved."""
    from marc_data_migration_spark.operators.codecs import (
        _avi_compression,
        decode_avi,
        encode_avi,
        video_features,
        video_resize,
    )

    frames = _rle_frames()
    rle = encode_avi(frames, fps=10, rle8=True)
    assert video_features(rle, "video") == video_features(
        encode_avi(frames, fps=10), "video"
    )
    out = video_resize(rle, "video", target_bytes=3 * 3 * 4 * 4)  # side 4
    assert _avi_compression(out) == 1
    fps, w, h, got = decode_avi(out)
    assert (fps, w, h, len(got)) == (10.0, 4, 4, 3)
