"""Stdlib-only media codecs: PNG (zlib + numpy) and WAV PCM (wave).

No external image/audio libraries ship in this container, but neither
format needs one: PNG's container is length-prefixed chunks with a zlib
stream of filtered scanlines (public spec, RFC 2083 / W3C PNG), and WAV
PCM is handled by the stdlib ``wave`` module. These codecs make the
multimodal operators (image_features, image_hashes, audio_features) decode
REAL bytes end-to-end instead of deriving fake pixels from the payload.

Scope — the cases a synthetic/media-hash pipeline needs, rejected loudly
otherwise:
- PNG decode: 8-bit depth, color types 0 (gray), 2 (RGB), 6 (RGBA),
  non-interlaced, all five scanline filters. Output is always H x W x 3
  uint8 (gray replicated, alpha dropped) — the contract the hash kernels
  (multimodal.ahash_bits et al.) consume.
- PNG encode: H x W x 3 uint8 -> filter-0 scanlines. Lossless, so
  encode->decode round-trips bit-exactly (property-tested).
- WAV: 8/16/32-bit integer PCM, any channel count; decoded to float64 in
  [-1, 1), channel-averaged to mono.

The deterministic generators at the bottom (pixels_from_bytes,
png_from_bytes, wav_from_bytes) produce seeded synthetic media payloads
from arbitrary bytes — the data-generation side of the same contract, used
by sources/synth.py and the driver oracle fixtures. pixels_from_bytes keeps
the exact derivation the pre-r4 fake decoder used, so image-hash oracle
values are unchanged while the decode path is now a real PNG round-trip.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS_BY_COLOR_TYPE = {0: 1, 2: 3, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter_scanline(
    ftype: int, line: np.ndarray, prev: np.ndarray, ch: int
) -> np.ndarray:
    """Reverse one PNG scanline filter. `line` and `prev` are uint8 arrays
    of stride w*ch; uint8 arithmetic wraps mod 256, which is exactly the
    spec's semantics."""
    if ftype == 0:  # None
        return line
    if ftype == 2:  # Up
        return line + prev
    if ftype == 1:  # Sub: recon[i] = line[i] + recon[i-ch] — per-channel
        # prefix dependency == per-channel cumulative sum mod 256
        out = line.reshape(-1, ch).astype(np.uint64).cumsum(axis=0)
        return (out % 256).astype(np.uint8).reshape(-1)
    out = np.zeros_like(line)
    if ftype == 3:  # Average
        for i in range(line.size):
            left = int(out[i - ch]) if i >= ch else 0
            out[i] = (int(line[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        return out
    if ftype == 4:  # Paeth
        for i in range(line.size):
            left = int(out[i - ch]) if i >= ch else 0
            upleft = int(prev[i - ch]) if i >= ch else 0
            out[i] = (int(line[i]) + _paeth(left, int(prev[i]), upleft)) & 0xFF
        return out
    raise ValueError(f"PNG: unknown scanline filter type {ftype}")


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> H x W x 3 uint8 pixel array (stdlib zlib + numpy)."""
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG payload (bad signature)")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # 4 length + 4 type + data + 4 crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG: missing IHDR or IDAT chunk")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"PNG: unsupported (depth={depth}, interlace={interlace}) — "
            "only 8-bit non-interlaced streams are handled"
        )
    if color_type not in _CHANNELS_BY_COLOR_TYPE:
        raise ValueError(f"PNG: unsupported color type {color_type}")
    ch = _CHANNELS_BY_COLOR_TYPE[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG: decompressed size does not match dimensions")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).copy()
        prev = _unfilter_scanline(ftype, line, prev, ch)
        out[y] = prev
    px = out.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3].copy()


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, compress_level: int = 6) -> bytes:
    """H x W x 3 uint8 -> PNG bytes (color type 2, filter 0 scanlines)."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_png expects an H x W x 3 uint8 array")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    scan = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * 3)], axis=1
    )
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scan.tobytes(), compress_level))
        + _chunk(b"IEND", b"")
    )


def decode_wav(payload: bytes) -> tuple:
    """WAV PCM bytes -> (mono float64 samples in [-1, 1), sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n_ch = wf.getnchannels()
        width = wf.getsampwidth()
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    if width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"WAV: unsupported sample width {width} bytes")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """float samples in [-1, 1] -> 16-bit mono PCM WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# GIF (87a/89a) — the third of the big-three web image formats. Public
# spec: W3C/CompuServe GIF89a. Decoder: full variable-width LZW, global and
# local color tables, interlacing, transparency-less first frame of
# animated streams (frame extraction for animation would mirror
# frame_sample's container dispatch). Encoder: minimal spec-valid stream —
# 256-entry global table, literal 9-bit LZW codes with periodic clear
# codes (the standard "uncompressed GIF" technique), used by tests/synth.

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _gif_lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    dictionary = [(i,) for i in range(clear)] + [None, None]
    out = []
    prev = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels and pos <= len(data):
        while nbits < width and pos < len(data):
            acc |= data[pos] << nbits  # GIF packs LSB-first
            nbits += 8
            pos += 1
        if nbits < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dictionary = [(i,) for i in range(clear)] + [None, None]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(dictionary) and dictionary[code] is not None:
            entry = dictionary[code]
        elif code == len(dictionary) and prev is not None:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError("GIF: corrupt LZW stream (bad code)")
        out.extend(entry)
        if prev is not None and len(dictionary) < 4096:
            dictionary.append(prev + (entry[0],))
            if len(dictionary) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out[:n_pixels]


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> H x W x 3 uint8 of the FIRST image frame."""
    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF payload (bad signature)")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(
            payload[pos:pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label + length-prefixed sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, w, h, ipacked = struct.unpack(
                "<HHHHB", payload[pos + 1:pos + 10]
            )
            pos += 10
            table = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                table = np.frombuffer(
                    payload[pos:pos + 3 * n], dtype=np.uint8
                ).reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise ValueError("GIF: image has no color table")
            min_code = payload[pos]
            pos += 1
            lzw = bytearray()
            while payload[pos] != 0:
                ln = payload[pos]
                lzw += payload[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            idx = np.array(
                _gif_lzw_decode(min_code, bytes(lzw), w * h), dtype=np.int64
            )
            if idx.size != w * h:
                raise ValueError("GIF: LZW stream short of pixel count")
            img = table[np.clip(idx, 0, len(table) - 1)].reshape(h, w, 3)
            if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
                order = np.concatenate([
                    np.arange(0, h, 8), np.arange(4, h, 8),
                    np.arange(2, h, 4), np.arange(1, h, 2),
                ])
                out = np.empty_like(img)
                out[order] = img
                img = out
            return img.copy()
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
    raise ValueError("GIF: no image block found")


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """H x W uint8 palette indices + (N<=256, 3) palette -> GIF89a bytes.
    Emits literal 9-bit LZW codes with a clear code before each dictionary
    overflow — larger than a real compressor's output but spec-valid and
    decodable by any GIF reader."""
    h, w = indices.shape
    if palette.shape[0] > 256:
        raise ValueError("GIF palette limited to 256 entries")
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[: palette.shape[0]] = palette
    head = b"GIF89a" + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # 256-GCT
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = 8
    clear, end = 256, 257
    bits = bytearray()
    acc = 0
    nbits = 0

    def emit(code, width=9):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    count = end + 1
    for v in indices.reshape(-1):
        emit(int(v))
        count += 1
        # each literal would grow the dict; clear before width must bump
        if count == 511:
            emit(clear)
            count = end + 1
    emit(end)
    if nbits:
        bits.append(acc & 0xFF)
    sub = b""
    mv = bytes(bits)
    for i in range(0, len(mv), 255):
        chunk = mv[i:i + 255]
        sub += bytes([len(chunk)]) + chunk
    return (
        head + pal.tobytes() + desc + bytes([min_code]) + sub
        + b"\x00" + b"\x3b"
    )


# ---------------------------------------------------------------------------
# AVI (RIFF) container for MJPEG — the format webcams/ffmpeg '-c:v mjpeg'
# actually produce. Public spec: Microsoft RIFF/AVI (also OpenDML). Only the
# container is handled here; frame payloads are baseline JPEGs decoded by
# jpegcodec. Writer emits the minimal spec-complete layout (hdrl with
# avih+strl, movi with 00dc chunks, idx1); reader walks the chunk tree and
# is tolerant of extra chunks/lists it does not know.


def _riff_chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""  # RIFF chunks are word-aligned
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _riff_list(list_type: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames: list, width: int, height: int, fps: int = 10
) -> bytes:
    """JPEG frame payloads (already-encoded bytes) -> AVI/MJPEG file."""
    if not frames:
        raise ValueError("encode_avi_mjpeg: no frames")
    us_per_frame = 1_000_000 // fps
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, max_bytes * fps, 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack(
            "<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames),
            max_bytes, 0xFFFFFFFF, 0, 0,
        ) + struct.pack("<HHHH", 0, 0, width, height)
    )
    # BITMAPINFOHEADER
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0x47504A4D,  # 'MJPG'
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh)
                     + _riff_chunk(b"strf", strf)),
    )
    movi_body = b"movi"
    idx = b""
    for f in frames:
        off = len(movi_body)  # offset of the 00dc fourcc from 'movi' start
        movi_body += _riff_chunk(b"00dc", f)
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
    movi = _riff_chunk(b"LIST", movi_body)
    idx1 = _riff_chunk(b"idx1", idx)
    riff_body = b"AVI " + hdrl + movi + idx1
    return _riff_chunk(b"RIFF", riff_body)


def avi_mjpeg_frames(payload: bytes) -> list:
    """AVI bytes -> list of JPEG frame payloads ('00dc'/'00db' video
    chunks of stream 0, in file order). Walks the RIFF tree; skips chunks
    and lists it does not recognize, so index-less or OpenDML-extended
    files still parse."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (bad RIFF/AVI magic)")
    frames = []

    def walk(buf: bytes, pos: int, end: int):
        while pos + 8 <= end:
            fourcc = buf[pos:pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4:pos + 8])
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if fourcc in (b"RIFF", b"LIST"):
                walk(buf, body_start + 4, body_end)  # skip the list type
            elif fourcc in (b"00dc", b"00db") and size > 0:
                frames.append(buf[body_start:body_end])
            pos = body_start + size + (size % 2)  # word alignment

    walk(payload, 0, len(payload))
    return frames


# ---------------------------------------------------------------------------
# deterministic synthetic-media generators (seeded from arbitrary bytes)


def pixels_from_bytes(data: bytes) -> np.ndarray:
    """Deterministic pseudo-image (H x W x 3 uint8) derived from arbitrary
    bytes — dimensions from byte sums, pixels from a seeded RNG. This is
    the exact derivation the pre-r4 fake decoder used, preserved so media
    payloads regenerated as real PNGs hash to the same oracle values."""
    h = (sum(data[:16]) % 48) + 16 if data else 16
    w = (sum(data[16:32]) % 48) + 16 if len(data) > 16 else 16
    seed = int.from_bytes(data[:8].ljust(8, b"\0"), "little") % (2**32)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def png_from_bytes(data: bytes) -> bytes:
    """Arbitrary bytes -> real PNG payload of the derived pseudo-image."""
    return encode_png(pixels_from_bytes(data))


def jpeg_from_bytes(data: bytes, quality: int = 92) -> bytes:
    """Arbitrary bytes -> real baseline-JPEG payload of the derived
    pseudo-image (lossy: decode gives approximately, not exactly, the
    pixels_from_bytes array — both sides of an oracle must decode the
    BYTES, not re-derive the pixels)."""
    from similarities_spark.functions import jpegcodec

    return jpegcodec.encode_jpeg(pixels_from_bytes(data), quality=quality)


def video_from_bytes(data: bytes, frames_max: int = 5) -> bytes:
    """Arbitrary bytes -> deterministic video payload in one of the three
    supported stream formats, chosen by the derived seed (seed % 3:
    0 = concatenated-PNG stream, 1 = bare MJPEG, 2 = AVI/MJPEG container),
    so a corpus-derived video column exercises every container path."""
    seed = int.from_bytes(data[:8].ljust(8, b"\0"), "little")
    n_frames = 1 + (seed >> 8) % frames_max
    keys = [data + b"|frame|%d" % f for f in range(n_frames)]
    fmt = seed % 3
    if fmt == 0:
        return b"".join(png_from_bytes(k) for k in keys)
    jpegs = [jpeg_from_bytes(k) for k in keys]
    if fmt == 1:
        return b"".join(jpegs)
    h, w = pixels_from_bytes(keys[0]).shape[:2]
    return encode_avi_mjpeg(jpegs, width=w, height=h)


def wav_from_bytes(
    data: bytes, sample_rate: int = 8000, max_samples: int = 4000
) -> bytes:
    """Arbitrary bytes -> real WAV payload: a seeded sine + noise mixture
    whose length/frequency/amplitude derive from the bytes."""
    seed = int.from_bytes(data[:8].ljust(8, b"\0"), "little") % (2**32)
    rng = np.random.RandomState(seed)
    n = 400 + (int.from_bytes(data[8:12].ljust(4, b"\0"), "little") % max_samples)
    freq = 100.0 + (seed % 1900)
    t = np.arange(n, dtype=np.float64) / sample_rate
    x = 0.6 * np.sin(2 * np.pi * freq * t) + 0.1 * rng.randn(n)
    return encode_wav(x, sample_rate)
