"""Pure-python reference media codecs (stdlib-only): uncompressed
24-bit BMP and binary PPM (P6).

These make ``decode_media``/``resize_media`` REAL tested operators
instead of NotImplementedError seams: the container has no PIL/ffmpeg,
but an uncompressed bitmap needs only ``struct`` — decode validates
headers and yields the pixel grid, resize is a genuine decode →
nearest-neighbor resample → re-encode pass. On a real cluster the same
hook signatures take PIL/librosa/ffmpeg codecs; the Spark-side plumbing
(mapInPandas batch shape, schemas, partitioning) is identical either
way.

Reference anchor: the reference's only binary handling is the
``bad_writer`` passthrough (processors/oclc_update/record_update.py:
248-252, bytes in → bytes out, no decode); this module goes beyond it
with a real parse, so the multimodal family is a first-class operator
set rather than a stub.
"""

from __future__ import annotations

import struct

_BMP_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, data offset
_BMP_INFO = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER


def encode_bmp(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode an RGB pixel grid (rows top-down, ``pixels[y][x] ==
    (r, g, b)``) as an uncompressed 24-bit bottom-up BMP."""
    h = len(pixels)
    if h == 0 or len({len(r) for r in pixels}) != 1:
        raise ValueError("pixels must be a non-empty rectangular grid")
    w = len(pixels[0])
    rows = _bgr_rows(pixels)  # bottom-up padded BGR — the shared DIB layout
    offset = _BMP_HEADER.size + _BMP_INFO.size
    info = _BMP_INFO.pack(_BMP_INFO.size, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    head = _BMP_HEADER.pack(b"BM", offset + len(rows), 0, 0, offset)
    return head + info + rows


def decode_bmp(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode an uncompressed 24-bit BMP → (width, height, pixels) with
    rows top-down. Handles both bottom-up (height > 0) and top-down
    (height < 0) storage. Raises ValueError on anything else."""
    if len(payload) < _BMP_HEADER.size + _BMP_INFO.size:
        raise ValueError("truncated BMP header")
    magic, _, _, _, offset = _BMP_HEADER.unpack_from(payload, 0)
    if magic != b"BM":
        raise ValueError("not a BMP payload")
    (hdr_size, w, h_raw, planes, bpp, compression, *_rest) = _BMP_INFO.unpack_from(
        payload, _BMP_HEADER.size
    )
    if hdr_size < _BMP_INFO.size or planes != 1:
        raise ValueError("unsupported BMP header")
    if bpp != 24 or compression != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    bottom_up = h_raw > 0
    h = abs(h_raw)
    if w <= 0 or h == 0:
        raise ValueError("bad BMP dimensions")
    stride = 3 * w + ((-3 * w) % 4)
    if len(payload) < offset + stride * h:
        raise ValueError("truncated BMP pixel data")
    grid: list[list[tuple[int, int, int]]] = []
    for y in range(h):
        src = h - 1 - y if bottom_up else y
        base = offset + src * stride
        row = []
        for x in range(w):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            row.append((r, g, b))
        grid.append(row)
    return w, h, grid


def encode_ppm(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode an RGB grid as binary PPM (P6, maxval 255)."""
    h = len(pixels)
    if h == 0 or len({len(r) for r in pixels}) != 1:
        raise ValueError("pixels must be a non-empty rectangular grid")
    w = len(pixels[0])
    body = bytes(c for row in pixels for px in row for c in px)
    return f"P6\n{w} {h}\n255\n".encode() + body


def decode_ppm(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode binary PPM (P6) → (width, height, pixels top-down)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval as whitespace/comment-
    # separated tokens, then a single whitespace byte before the body
    toks: list[int] = []
    i = 2
    while len(toks) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":  # comment line
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        toks.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = toks
    if w <= 0 or h <= 0 or maxval != 255:
        raise ValueError("unsupported PPM (need positive dims, maxval 255)")
    if len(payload) < i + 3 * w * h:
        raise ValueError("truncated PPM pixel data")
    grid = []
    for y in range(h):
        base = i + y * 3 * w
        grid.append(
            [
                tuple(payload[base + 3 * x : base + 3 * x + 3])
                for x in range(w)
            ]
        )
    return w, h, grid


# ---------------------------------------------------------------------
# PNG (zlib DEFLATE) — the COMPRESSED-format member of the image family.
# stdlib ``zlib`` does the inflate; this module does the container walk
# (length-prefixed CRC-checked chunks) and the per-scanline unfiltering
# (all five PNG filter types), so compressed payloads are a real decode
# path rather than a documented hook.
# ---------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(
    pixels: list[list[tuple[int, int, int]]],
    filters: list[int] | None = None,
) -> bytes:
    """Encode an RGB grid as an 8-bit truecolor PNG. ``filters``
    optionally picks the per-row filter type (0–4); the default is 0
    (None). Non-trivial filters apply the real PNG filter transform, so
    decode's unfilter paths are exercised by round-trip tests rather
    than trusted."""
    import zlib

    h = len(pixels)
    if h == 0 or len({len(r) for r in pixels}) != 1:
        raise ValueError("pixels must be a non-empty rectangular grid")
    w = len(pixels[0])
    if filters is None:
        filters = [0] * h
    if len(filters) != h or any(f not in (0, 1, 2, 3, 4) for f in filters):
        raise ValueError("filters must give one PNG filter type (0-4) per row")
    raw = bytearray()
    prev = bytes(3 * w)
    for y, f in enumerate(filters):
        cur = bytes(c for px in pixels[y] for c in px)
        raw.append(f)
        for i in range(3 * w):
            a = cur[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 0:
                out = cur[i]
            elif f == 1:
                out = cur[i] - a
            elif f == 2:
                out = cur[i] - b
            elif f == 3:
                out = cur[i] - (a + b) // 2
            else:
                out = cur[i] - _paeth(a, b, c)
            raw.append(out & 0xFF)
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode an 8-bit truecolor (color type 2) non-interlaced PNG →
    (width, height, pixels top-down). Walks the chunk list with CRC
    checks, inflates the concatenated IDAT stream, and unfilters every
    scanline (filter types 0–4). Raises ValueError on anything else —
    palette/alpha/interlace stay out of scope, loudly."""
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    i = len(_PNG_SIG)
    w = h = -1
    idat = bytearray()
    seen_ihdr = seen_iend = False
    while i + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, i)
        ctype = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + length]
        if len(data) != length or i + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, i + 8 + length)
        if crc != zlib.crc32(ctype + data):
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or color != 2:
                raise ValueError(
                    f"only 8-bit truecolor PNG supported (depth={depth}, color={color})"
                )
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG compression/filter/interlace")
            seen_ihdr = True
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
            break
        i += 12 + length
    if not seen_ihdr or not seen_iend or w <= 0 or h <= 0:
        raise ValueError("malformed PNG (missing IHDR/IEND or bad dimensions)")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad PNG IDAT stream: {e}") from e
    stride = 3 * w
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG scanline data has wrong length")
    grid: list[list[tuple[int, int, int]]] = []
    prev = bytes(stride)
    for y in range(h):
        base = y * (1 + stride)
        f = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if f == 1:
            for i2 in range(3, stride):
                line[i2] = (line[i2] + line[i2 - 3]) & 0xFF
        elif f == 2:
            for i2 in range(stride):
                line[i2] = (line[i2] + prev[i2]) & 0xFF
        elif f == 3:
            for i2 in range(stride):
                a = line[i2 - 3] if i2 >= 3 else 0
                line[i2] = (line[i2] + (a + prev[i2]) // 2) & 0xFF
        elif f == 4:
            for i2 in range(stride):
                a = line[i2 - 3] if i2 >= 3 else 0
                c = prev[i2 - 3] if i2 >= 3 else 0
                line[i2] = (line[i2] + _paeth(a, prev[i2], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter type {f}")
        prev = bytes(line)
        grid.append(
            [tuple(line[3 * x : 3 * x + 3]) for x in range(w)]
        )
    return w, h, grid


def decode_image(payload: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Sniff-and-decode: BMP, P6 PPM, or PNG."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    raise ValueError("unsupported image payload (BMP, P6 PPM, PNG supported)")


def image_features(payload: bytes, kind: str) -> list[float]:
    """Default codec hook for ``decode_media`` on image rows: real
    decode → [width, height, mean_r, mean_g, mean_b]. Non-image kinds
    and undecodable payloads raise (quarantine upstream or pass a
    kind-routing codec)."""
    if kind != "image":
        raise ValueError(f"image_features got kind={kind!r}")
    w, h, grid = decode_image(payload)
    n = w * h
    sums = [0, 0, 0]
    for row in grid:
        for px in row:
            sums[0] += px[0]
            sums[1] += px[1]
            sums[2] += px[2]
    return [float(w), float(h), sums[0] / n, sums[1] / n, sums[2] / n]


def resample_nn(
    grid: list[list[tuple[int, int, int]]], out_w: int, out_h: int
) -> list[list[tuple[int, int, int]]]:
    """Nearest-neighbor resample (the classic index-scaling form)."""
    in_h, in_w = len(grid), len(grid[0])
    return [
        [grid[(y * in_h) // out_h][(x * in_w) // out_w] for x in range(out_w)]
        for y in range(out_h)
    ]


def image_resize(payload: bytes, kind: str, target_bytes: int) -> bytes:
    """Real resize hook for ``resize_media``: decode → nearest-neighbor
    resample to the largest square whose 24-bit pixel data fits
    ``target_bytes`` → re-encode in the payload's own format."""
    if kind != "image":
        raise ValueError(f"image_resize got kind={kind!r}")
    side = max(int((target_bytes / 3) ** 0.5), 1)
    w, h, grid = decode_image(payload)
    out = resample_nn(grid, side, side)
    if payload[:2] == b"BM":
        return encode_bmp(out)
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return encode_png(out)
    return encode_ppm(out)


# ---------------------------------------------------------------------
# WAV (RIFF PCM) — the audio-kind analogue of the BMP/PPM parsers
# ---------------------------------------------------------------------

_FMT_PCM = struct.Struct("<HHIIHH")  # format, channels, rate, byterate, align, bits

# G.711 µ-law companding (WAV format tag 7) — the compressed member of
# the audio family: 8 bits/sample log-quantized, expanded to int16 on
# decode so every downstream hook (features, resample) is codec-blind.
_ULAW_BIAS = 0x84
_ULAW_CLIP = 32635


def _ulaw_encode_sample(s: int) -> int:
    sign = 0x80 if s < 0 else 0
    mag = min(-s if s < 0 else s, _ULAW_CLIP) + _ULAW_BIAS
    exp = 7
    mask = 0x4000
    while exp > 0 and not mag & mask:
        exp -= 1
        mask >>= 1
    mantissa = (mag >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mantissa) & 0xFF


def _ulaw_decode_sample(b: int) -> int:
    b = ~b & 0xFF
    exp = (b >> 4) & 0x07
    mag = (((b & 0x0F) << 3) + _ULAW_BIAS << exp) - _ULAW_BIAS
    return -mag if b & 0x80 else mag


def encode_wav(
    samples: list[tuple[int, ...]], sample_rate: int = 8000, ulaw: bool = False
) -> bytes:
    """Encode 16-bit PCM frames (``samples[i]`` = one frame, a tuple of
    per-channel ints in [-32768, 32767]) as a canonical RIFF WAV.
    ``ulaw=True`` companded-encodes each sample to G.711 µ-law
    (format tag 7, 8 bits/sample — lossy log quantization)."""
    if not samples or len({len(f) for f in samples}) != 1:
        raise ValueError("samples must be non-empty uniform-channel frames")
    n_ch = len(samples[0])
    if ulaw:
        body = bytes(_ulaw_encode_sample(s) for frame in samples for s in frame)
        fmt = _FMT_PCM.pack(7, n_ch, sample_rate, sample_rate * n_ch, n_ch, 8)
    else:
        body = b"".join(
            struct.pack(f"<{n_ch}h", *frame) for frame in samples
        )
        fmt = _FMT_PCM.pack(1, n_ch, sample_rate, sample_rate * n_ch * 2, n_ch * 2, 16)
    data = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", len(data)) + data


def decode_wav(payload: bytes) -> tuple[int, int, list[tuple[int, ...]]]:
    """Decode RIFF WAV → (sample_rate, n_channels, frames): 16-bit PCM
    (format 1) or compressed G.711 µ-law (format 7, expanded to int16
    so callers are codec-blind). Walks the chunk list (extra chunks
    like LIST/INFO are skipped), so non-canonical writers parse too.
    Raises ValueError on any other encoding."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    fmt = None
    data = None
    for cid, body in _riff_children(payload[12:end]):
        if cid == b"fmt ":
            if len(body) < _FMT_PCM.size:
                raise ValueError("truncated fmt chunk")
            fmt = _FMT_PCM.unpack_from(body, 0)
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, n_ch, rate, _, _, bits = fmt
    if n_ch < 1:
        raise ValueError("bad WAV channel count")
    if rate < 1:
        raise ValueError("bad WAV sample rate")  # the decode_avi usec<=0 analogue
    if audio_format == 7 and bits == 8:
        n_frames = len(data) // n_ch
        frames = [
            tuple(
                _ulaw_decode_sample(data[j * n_ch + c]) for c in range(n_ch)
            )
            for j in range(n_frames)
        ]
        return rate, n_ch, frames
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"only 16-bit PCM or 8-bit mu-law supported (fmt={audio_format}, bits={bits})"
        )
    frame_bytes = n_ch * 2
    n_frames = len(data) // frame_bytes
    frames = [
        struct.unpack_from(f"<{n_ch}h", data, j * frame_bytes)
        for j in range(n_frames)
    ]
    return rate, n_ch, frames


def audio_features(payload: bytes, kind: str) -> list[float]:
    """Codec hook for ``decode_media`` on audio rows: real WAV decode →
    [duration_sec, sample_rate, n_channels, rms] with rms on the
    [-1, 1] int16 scale — the shape a loudness/quality gate consumes."""
    if kind != "audio":
        raise ValueError(f"audio_features got kind={kind!r}")
    rate, n_ch, frames = decode_wav(payload)
    n = len(frames) * n_ch
    if n == 0:
        return [0.0, float(rate), float(n_ch), 0.0]
    acc = 0.0
    for frame in frames:
        for s in frame:
            x = s / 32768.0
            acc += x * x
    return [len(frames) / rate, float(rate), float(n_ch), (acc / n) ** 0.5]


def media_features(payload: bytes, kind: str) -> list[float]:
    """Kind-routing codec for mixed media tables: image → BMP/PPM
    parse, audio → WAV parse, video → uncompressed-AVI parse. Unknown
    kinds and undecodable payloads raise — route or quarantine
    upstream."""
    if kind == "image":
        return image_features(payload, kind)
    if kind == "audio":
        return audio_features(payload, kind)
    if kind == "video":
        return video_features(payload, kind)
    raise ValueError(f"no pure-python codec for kind={kind!r}")


# ---------------------------------------------------------------------
# AVI (RIFF, uncompressed DIB frames) — the video-kind analogue
# ---------------------------------------------------------------------

_AVIH = struct.Struct("<14I")  # MainAVIHeader: 14 little-endian DWORDs


def _bgr_rows(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Bottom-up padded BGR rows — the DIB pixel-data layout BMP and
    uncompressed-AVI frames share."""
    w = len(pixels[0])
    pad = (-3 * w) % 4
    rows = bytearray()
    for y in range(len(pixels) - 1, -1, -1):
        for r, g, b in pixels[y]:
            rows += bytes((b, g, r))
        rows += b"\x00" * pad
    return bytes(rows)


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


# BI_RLE8 (biCompression=1) — the compressed member of the video
# family: 8-bit palettized frames, run-length encoded bottom-up, the
# palette carried in the stream-format (strf) BITMAPINFOHEADER tail.
_BIH = struct.Struct("<IiiHHIIiiII")  # BITMAPINFOHEADER (shared with BMP)


def _rle8_palette(
    frames: list[list[list[tuple[int, int, int]]]],
) -> tuple[list[tuple[int, int, int]], dict[tuple[int, int, int], int]]:
    colors: dict[tuple[int, int, int], int] = {}
    for f in frames:
        for row in f:
            for px in row:
                if px not in colors:
                    if len(colors) == 256:
                        raise ValueError("RLE8 needs <= 256 distinct colors")
                    colors[px] = len(colors)
    return list(colors), colors


def _rle8_compress_frame(
    frame: list[list[tuple[int, int, int]]], index: dict[tuple[int, int, int], int]
) -> bytes:
    out = bytearray()
    h = len(frame)
    for r in range(h):  # r=0 is the BOTTOM row — DIB storage order
        row = frame[h - 1 - r]
        x = 0
        while x < len(row):
            n = 1
            while x + n < len(row) and n < 255 and row[x + n] == row[x]:
                n += 1
            out += bytes((n, index[row[x]]))
            x += n
        out += b"\x00\x01" if r == h - 1 else b"\x00\x00"  # EOB / EOL
    return bytes(out)


def _rle8_decompress(data: bytes, w: int, h: int) -> list[list[int]]:
    """RLE8 → index grid with rows top-down. Handles encoded runs,
    absolute mode, EOL, EOB; position deltas (escape 2) are rejected —
    skipped pixels would be undefined content."""
    grid = [[0] * w for _ in range(h)]
    x = r = i = 0  # r counts rows from the bottom
    while i + 2 <= len(data):
        n, v = data[i], data[i + 1]
        i += 2
        if n > 0:
            if r >= h or x + n > w:
                raise ValueError("RLE8 run overflows the frame")
            grid[h - 1 - r][x : x + n] = [v] * n
            x += n
        elif v == 0:
            r += 1
            x = 0
        elif v == 1:
            return grid
        elif v == 2:
            raise ValueError("RLE8 position delta not supported")
        else:
            if i + v > len(data):
                raise ValueError("truncated RLE8 absolute run")
            if r >= h or x + v > w:
                raise ValueError("RLE8 absolute run overflows the frame")
            grid[h - 1 - r][x : x + v] = list(data[i : i + v])
            x += v
            i += v + (v & 1)  # absolute runs pad to word boundary
    raise ValueError("RLE8 stream missing end-of-bitmap")


def encode_avi(
    frames: list[list[list[tuple[int, int, int]]]],
    fps: int = 10,
    usec_per_frame: int | None = None,
    rle8: bool = False,
) -> bytes:
    """Encode RGB pixel-grid frames (all the same w×h, rows top-down)
    as a minimal uncompressed AVI: RIFF 'AVI ' → LIST hdrl (avih) +
    LIST movi ('00db' DIB chunks, bottom-up BGR, 4-byte row stride).
    ``usec_per_frame`` overrides the fps-derived dwMicroSecPerFrame so
    non-integer frame rates re-encode exactly (video_resize).
    ``rle8=True`` compresses: frames become palettized BI_RLE8 '00dc'
    chunks and the hdrl gains a LIST strl whose strf BITMAPINFOHEADER
    carries biCompression=1 plus the palette (≤256 distinct colors
    across all frames, or ValueError)."""
    if not frames or not frames[0] or not frames[0][0]:
        raise ValueError("frames must be non-empty uniform rectangular grids")
    h, w = len(frames[0]), len(frames[0][0])
    if any(len(f) != h or any(len(r) != w for r in f) for f in frames):
        # full per-row rectangularity, like encode_bmp/encode_ppm — a
        # ragged row would silently shift every later pixel's stride
        raise ValueError("frames must be non-empty uniform rectangular grids")
    usec = usec_per_frame if usec_per_frame is not None else 1_000_000 // fps
    if usec <= 0:
        raise ValueError("bad frame rate")
    avih = _AVIH.pack(
        usec, 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0
    )
    hdrl_body = b"hdrl" + _chunk(b"avih", avih)
    if rle8:
        palette, index = _rle8_palette(frames)
        bih = _BIH.pack(_BIH.size, w, h, 1, 8, 1, 0, 0, 0, len(palette), 0)
        strf = bih + b"".join(bytes((b, g, r, 0)) for r, g, b in palette)
        strh = b"vids" + b"mrle" + struct.pack("<10I4H", *([0] * 10), 0, 0, w, h)
        hdrl_body += _chunk(
            b"LIST", b"strl" + _chunk(b"strh", strh) + _chunk(b"strf", strf)
        )
        movi_frames = b"".join(
            _chunk(b"00dc", _rle8_compress_frame(f, index)) for f in frames
        )
    else:
        movi_frames = b"".join(_chunk(b"00db", _bgr_rows(f)) for f in frames)
    hdrl = _chunk(b"LIST", hdrl_body)
    movi = _chunk(b"LIST", b"movi" + movi_frames)
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def _riff_children(body: bytes):
    """Yield (fourcc, chunk_body) walking a RIFF/LIST body with
    word-aligned advance."""
    i = 0
    while i + 8 <= len(body):
        cid = body[i : i + 4]
        size = struct.unpack_from("<I", body, i + 4)[0]
        sub = body[i + 8 : i + 8 + size]
        if len(sub) < size:
            raise ValueError("truncated RIFF chunk")
        yield cid, sub
        i += 8 + size + (size & 1)


def decode_avi(
    payload: bytes,
) -> tuple[float, int, int, list[list[list[tuple[int, int, int]]]]]:
    """Decode a minimal AVI → (fps, width, height, frames with rows
    top-down). Walks the RIFF tree (unknown chunks/LISTs are skipped).
    '00db' uncompressed-DIB frames and palettized BI_RLE8 '00dc'
    frames (strf biCompression=1, palette from the strf tail) are
    supported; any other compression raises."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    size = struct.unpack_from("<I", payload, 4)[0]
    body = payload[8 : 8 + size]
    avih = None
    compression = 0
    palette: list[tuple[int, int, int]] = []
    frame_bodies: list[tuple[bytes, bool]] = []  # (body, is_rle)
    for cid, sub in _riff_children(body[4:]):
        if cid != b"LIST" or len(sub) < 4:
            continue
        kind, inner = sub[:4], sub[4:]
        if kind == b"hdrl":
            for c2, s2 in _riff_children(inner):
                if c2 == b"avih":
                    if len(s2) < _AVIH.size:
                        raise ValueError("truncated avih header")
                    avih = _AVIH.unpack_from(s2, 0)
                elif c2 == b"LIST" and s2[:4] == b"strl":
                    for c3, s3 in _riff_children(s2[4:]):
                        if c3 != b"strf" or len(s3) < _BIH.size:
                            continue
                        bih = _BIH.unpack_from(s3, 0)
                        compression = bih[5]
                        n_colors = bih[9] or (256 if bih[4] == 8 else 0)
                        if _BIH.size + 4 * n_colors > len(s3):
                            raise ValueError("truncated strf palette")
                        palette = [
                            (s3[_BIH.size + 4 * j + 2],
                             s3[_BIH.size + 4 * j + 1],
                             s3[_BIH.size + 4 * j])
                            for j in range(n_colors)
                        ]
        elif kind == b"movi":
            for c2, s2 in _riff_children(inner):
                if c2 == b"00dc":
                    if compression != 1:
                        raise ValueError(
                            "compressed AVI frames other than BI_RLE8 not supported"
                        )
                    frame_bodies.append((s2, True))
                if c2 == b"00db":
                    frame_bodies.append((s2, False))
    if avih is None:
        raise ValueError("AVI missing avih header")
    usec, w, h = avih[0], avih[8], avih[9]
    if w <= 0 or h <= 0 or usec <= 0:
        raise ValueError("bad AVI dimensions or frame rate")
    stride = 3 * w + ((-3 * w) % 4)
    frames = []
    for fb, is_rle in frame_bodies:
        if is_rle:
            idx = _rle8_decompress(fb, w, h)
            try:
                grid = [[palette[v] for v in row] for row in idx]
            except IndexError:
                raise ValueError("RLE8 index outside the strf palette") from None
            frames.append(grid)
            continue
        if len(fb) < stride * h:
            raise ValueError("truncated AVI frame")
        grid = []
        for y in range(h):
            base = (h - 1 - y) * stride  # bottom-up storage
            grid.append(
                [
                    (fb[base + 3 * x + 2], fb[base + 3 * x + 1], fb[base + 3 * x])
                    for x in range(w)
                ]
            )
        frames.append(grid)
    return 1_000_000 / usec, w, h, frames


def video_features(payload: bytes, kind: str) -> list[float]:
    """Codec hook for ``decode_media`` on video rows: real AVI decode →
    [n_frames, fps, width, height, mean_luma] (Rec.601 luma over all
    frames, 0–255 scale)."""
    if kind != "video":
        raise ValueError(f"video_features got kind={kind!r}")
    fps, w, h, frames = decode_avi(payload)
    n_px = len(frames) * w * h
    luma = 0.0
    for f in frames:
        for row in f:
            for r, g, b in row:
                luma += 0.299 * r + 0.587 * g + 0.114 * b
    return [float(len(frames)), round(fps, 6), float(w), float(h),
            luma / n_px if n_px else 0.0]


def audio_resample(payload: bytes, kind: str, target_bytes: int) -> bytes:
    """Real resize hook for ``resize_media`` on audio rows: decode →
    nearest-neighbor frame resample so the 16-bit PCM body fits
    ``target_bytes`` (channel count preserved; the sample rate scales
    by the same factor so duration is unchanged) → re-encode."""
    if kind != "audio":
        raise ValueError(f"audio_resample got kind={kind!r}")
    rate, n_ch, frames = decode_wav(payload)
    if not frames:
        # decodable but empty data chunk: nothing to resample, and
        # encode_wav (rightly) refuses empty frame lists — same
        # quarantine signal as an undecodable payload
        raise ValueError("empty WAV data chunk: nothing to resample")
    is_ulaw = _wav_fmt_tag(payload) == 7
    bytes_per = n_ch if is_ulaw else 2 * n_ch
    out_n = max(min(target_bytes // bytes_per, len(frames)), 1)
    out = [frames[(i * len(frames)) // out_n] for i in range(out_n)]
    out_rate = max(round(rate * out_n / len(frames)), 1)
    return encode_wav(out, out_rate, ulaw=is_ulaw)


def _wav_fmt_tag(payload: bytes) -> int:
    """The RIFF fmt chunk's format tag (1 = PCM, 7 = µ-law); resize
    uses it to re-encode in the payload's own format."""
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    for cid, body in _riff_children(payload[12:end]):
        if cid == b"fmt " and len(body) >= 2:
            return struct.unpack_from("<H", body, 0)[0]
    raise ValueError("WAV missing fmt chunk")


def video_resize(payload: bytes, kind: str, target_bytes: int) -> bytes:
    """Real resize hook for ``resize_media`` on video rows: decode →
    keep frame COUNT and fps, nearest-neighbor resample each frame to
    the largest square whose total pixel data fits ``target_bytes`` →
    re-encode."""
    if kind != "video":
        raise ValueError(f"video_resize got kind={kind!r}")
    fps, w, h, frames = decode_avi(payload)
    if not frames:
        # valid header, empty movi: nothing to resample (the features
        # path reports n_frames=0; resize has no payload to produce)
        raise ValueError("AVI has no frames: nothing to resample")
    side = max(int((target_bytes / (3 * len(frames))) ** 0.5), 1)
    # usec round-trips the exact dwMicroSecPerFrame (fps == 1e6/usec),
    # so non-integer frame rates like 29.97 re-encode unchanged;
    # BI_RLE8 sources re-encode as BI_RLE8 (NN resample only reuses
    # existing pixels, so the <=256-color palette constraint holds)
    return encode_avi(
        [resample_nn(f, side, side) for f in frames],
        usec_per_frame=round(1_000_000 / fps),
        rle8=_avi_compression(payload) == 1,
    )


def _avi_compression(payload: bytes) -> int:
    """The strf BITMAPINFOHEADER's biCompression (0 when the minimal
    uncompressed form carries no strl); resize uses it to re-encode in
    the payload's own format — the _wav_fmt_tag analogue."""
    size = struct.unpack_from("<I", payload, 4)[0]
    for cid, sub in _riff_children(payload[8 : 8 + size][4:]):
        if cid == b"LIST" and sub[:4] == b"hdrl":
            for c2, s2 in _riff_children(sub[4:]):
                if c2 == b"LIST" and s2[:4] == b"strl":
                    for c3, s3 in _riff_children(s2[4:]):
                        if c3 == b"strf" and len(s3) >= _BIH.size:
                            return _BIH.unpack_from(s3, 0)[5]
    return 0


def media_resize_router(payload: bytes, kind: str, target_bytes: int) -> bytes:
    """Kind-routing resizer for mixed tables — the resize twin of
    ``media_features``."""
    if kind == "image":
        return image_resize(payload, kind, target_bytes)
    if kind == "audio":
        return audio_resample(payload, kind, target_bytes)
    if kind == "video":
        return video_resize(payload, kind, target_bytes)
    raise ValueError(f"no pure-python resizer for kind={kind!r}")
