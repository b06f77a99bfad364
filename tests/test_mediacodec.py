"""Stdlib PNG/WAV codec tests: encode->decode round trips, all five PNG
scanline filters against an independent byte-at-a-time reference unfilter,
gray/RGBA color types, WAV widths, and the deterministic generators."""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from similarities_spark.functions import mediacodec as mc


def _ref_unfilter(ftype, line, prev, ch):
    """Byte-at-a-time PNG unfilter, straight from the spec prose."""
    out = bytearray(len(line))
    for i in range(len(line)):
        a = out[i - ch] if i >= ch else 0
        b = prev[i]
        c = prev[i - ch] if i >= ch else 0
        x = line[i]
        if ftype == 0:
            r = x
        elif ftype == 1:
            r = x + a
        elif ftype == 2:
            r = x + b
        elif ftype == 3:
            r = x + ((a + b) >> 1)
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            r = x + pred
        out[i] = r & 0xFF
    return bytes(out)


def _png_from_raw(raw, w, h, color_type):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        mc.PNG_SIGNATURE
        + mc._chunk(b"IHDR", ihdr)
        + mc._chunk(b"IDAT", zlib.compress(raw))
        + mc._chunk(b"IEND", b"")
    )


def test_png_round_trip_shapes():
    rng = np.random.RandomState(7)
    for shape in [(16, 16), (33, 17), (1, 1), (64, 48), (2, 63)]:
        img = rng.randint(0, 256, size=(*shape, 3), dtype=np.uint8)
        assert (mc.decode_png(mc.encode_png(img)) == img).all(), shape


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_all_filters_match_reference(ftype):
    rng = np.random.RandomState(100 + ftype)
    h, w, ch = 12, 9, 3
    stride = w * ch
    lines = [rng.randint(0, 256, stride).astype(np.uint8).tobytes() for _ in range(h)]
    raw = b"".join(bytes([ftype]) + ln for ln in lines)
    got = mc.decode_png(_png_from_raw(raw, w, h, 2))
    prev = bytes(stride)
    exp = []
    for y in range(h):
        prev = _ref_unfilter(ftype, lines[y], prev, ch)
        exp.append(np.frombuffer(prev, np.uint8))
    assert (got == np.stack(exp).reshape(h, w, ch)).all()


def test_png_mixed_filters_per_row():
    rng = np.random.RandomState(55)
    h, w, ch = 10, 7, 3
    stride = w * ch
    lines = [rng.randint(0, 256, stride).astype(np.uint8).tobytes() for _ in range(h)]
    ftypes = [y % 5 for y in range(h)]
    raw = b"".join(bytes([ftypes[y]]) + lines[y] for y in range(h))
    got = mc.decode_png(_png_from_raw(raw, w, h, 2))
    prev = bytes(stride)
    exp = []
    for y in range(h):
        prev = _ref_unfilter(ftypes[y], lines[y], prev, ch)
        exp.append(np.frombuffer(prev, np.uint8))
    assert (got == np.stack(exp).reshape(h, w, ch)).all()


def test_png_gray_and_rgba_color_types():
    rng = np.random.RandomState(8)
    gray = rng.randint(0, 256, size=(8, 8), dtype=np.uint8)
    raw = b"".join(bytes([0]) + gray[y].tobytes() for y in range(8))
    g3 = mc.decode_png(_png_from_raw(raw, 8, 8, 0))
    assert g3.shape == (8, 8, 3)
    assert (g3 == gray[:, :, None]).all()
    rgba = rng.randint(0, 256, size=(8, 8, 4), dtype=np.uint8)
    raw = b"".join(bytes([0]) + rgba[y].tobytes() for y in range(8))
    assert (mc.decode_png(_png_from_raw(raw, 8, 8, 6)) == rgba[:, :, :3]).all()


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        mc.decode_png(b"not a png at all")
    # 16-bit depth: unsupported, loud
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    png = (
        mc.PNG_SIGNATURE
        + mc._chunk(b"IHDR", ihdr)
        + mc._chunk(b"IDAT", zlib.compress(b"\0" * 100))
        + mc._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        mc.decode_png(png)
    # truncated / size-mismatched stream
    img = np.zeros((4, 4, 3), np.uint8)
    raw = zlib.compress(b"\0" * 10)
    bad = _png_from_raw(raw, 4, 4, 2)
    with pytest.raises(ValueError, match="size"):
        mc.decode_png(bad)
    del img


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_round_trip_property(h, w, seed):
    img = np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )
    assert (mc.decode_png(mc.encode_png(img)) == img).all()


def test_wav_round_trip_and_widths():
    import io
    import wave

    x = np.sin(np.linspace(0, 100, 3000))
    y, r = mc.decode_wav(mc.encode_wav(x, 8000))
    assert r == 8000 and y.size == 3000
    assert np.abs(y - np.clip(x, -1, 1)).max() < 1 / 16384
    # stereo int16 -> mono mean
    stereo = np.stack(
        [np.full(100, 16384, "<i2"), np.zeros(100, "<i2")], axis=1
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(4000)
        wf.writeframes(stereo.tobytes())
    y, r = mc.decode_wav(buf.getvalue())
    assert r == 4000 and np.allclose(y, 0.25)
    # 8-bit unsigned
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(4000)
        wf.writeframes(bytes([128, 255, 0] * 10))
    y, _ = mc.decode_wav(buf.getvalue())
    assert abs(y[0]) < 1e-9 and y[1] > 0.9 and y[2] == -1.0


def test_generators_deterministic_and_round_trip():
    # png_from_bytes decodes back to exactly pixels_from_bytes (lossless),
    # which is the invariant the image-hash oracle fixture relies on
    for key in [b"", b"x", b"hello world", bytes(range(256))]:
        assert (
            mc.decode_png(mc.png_from_bytes(key)) == mc.pixels_from_bytes(key)
        ).all()
    a, ra = mc.decode_wav(mc.wav_from_bytes(b"abc"))
    b, rb = mc.decode_wav(mc.wav_from_bytes(b"abc"))
    c, _ = mc.decode_wav(mc.wav_from_bytes(b"abd"))
    assert ra == rb and (a == b).all()
    assert a.size != c.size or not (a == c).all()


# ------------------------------------------------------------------- GIF


def _ref_lzw_compress(min_code_size, indices):
    """Independent REAL LZW compressor (dictionary-building, variable
    width, straight from the GIF89a spec prose) so the decoder's
    dictionary-code and KwKwK paths are exercised — the in-repo encoder
    emits only literal codes."""
    clear = 1 << min_code_size
    end = clear + 1
    out_codes = []
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    out_codes.append((clear, width))
    buf = ()
    for v in indices:
        cand = buf + (int(v),)
        if cand in table:
            buf = cand
            continue
        out_codes.append((table[buf], width))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code == 4096:
            out_codes.append((clear, width))
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        buf = (int(v),)
    if buf:
        out_codes.append((table[buf], width))
    out_codes.append((end, width))
    acc = nbits = 0
    data = bytearray()
    for code, w in out_codes:
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def _gif_wrap(w, h, pal, min_code, lzw, interlace=False):
    import struct as st

    head = b"GIF89a" + st.pack("<HHBBB", w, h, 0xF7, 0, 0)
    palette = np.zeros((256, 3), dtype=np.uint8)
    palette[: pal.shape[0]] = pal
    desc = b"\x2c" + st.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    sub = b""
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        sub += bytes([len(chunk)]) + chunk
    return (
        head + palette.tobytes() + desc + bytes([min_code]) + sub
        + b"\x00\x3b"
    )


def test_gif_round_trip_literal_encoder():
    rng = np.random.default_rng(9)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8).astype(np.uint8)
    idx = rng.integers(0, 256, (19, 27), dtype=np.uint8).astype(np.uint8)
    out = mc.decode_gif(mc.encode_gif(idx, pal))
    assert np.array_equal(out, pal[idx])


def test_gif_decodes_real_lzw_compression():
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8).astype(np.uint8)
    # repetitive data drives real dictionary growth (incl. KwKwK patterns)
    idx = np.tile(
        rng.integers(0, 16, (4, 30), dtype=np.uint8), (8, 1)
    ).astype(np.uint8)
    h, w = idx.shape
    lzw = _ref_lzw_compress(4, idx.reshape(-1))
    out = mc.decode_gif(_gif_wrap(w, h, pal, 4, lzw))
    assert np.array_equal(out, pal[np.clip(idx, 0, 15)])


def test_gif_interlaced_rows_reorder():
    rng = np.random.default_rng(6)
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8).astype(np.uint8)
    idx = rng.integers(0, 8, (13, 5), dtype=np.uint8).astype(np.uint8)
    h, w = idx.shape
    order = np.concatenate([
        np.arange(0, h, 8), np.arange(4, h, 8),
        np.arange(2, h, 4), np.arange(1, h, 2),
    ])
    lzw = _ref_lzw_compress(3, idx[order].reshape(-1))
    out = mc.decode_gif(_gif_wrap(w, h, pal, 3, lzw, interlace=True))
    assert np.array_equal(out, pal[idx])


def test_gif_rejects_garbage():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="signature"):
        mc.decode_gif(b"NOTAGIF" + b"\x00" * 20)
    with _pytest.raises(ValueError):
        mc.decode_gif(b"GIF89a" + b"\x00" * 7 + b"\xff")


def test_decode_image_dispatches_gif():
    from similarities_spark.functions.multimodal import decode_image

    rng = np.random.default_rng(2)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8).astype(np.uint8)
    idx = rng.integers(0, 256, (11, 9), dtype=np.uint8).astype(np.uint8)
    out = decode_image(mc.encode_gif(idx, pal))
    assert np.array_equal(out, pal[idx])
