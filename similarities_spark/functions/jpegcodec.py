"""Stdlib+numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1, public spec).

Closes the "richer media formats" seam (reference utils/image_util.py reads
JPEG via PIL; this container has no image library): `decode_image` can now
dispatch JPEG payloads (SOI magic 0xFFD8) to a real entropy-decode + IDCT
pipeline instead of raising.

Scope — baseline sequential DCT, the format >99% of web JPEGs use:
- decode: 8-bit baseline (SOF0), 1 or 3 components, arbitrary sampling
  factors h,v in {1,2} (so 4:4:4, 4:2:2 and 4:2:0 all work), restart
  markers (DRI/RSTn), Huffman tables read from the stream's own DHT
  segments. Progressive (SOF2), arithmetic coding, and 12-bit streams are
  rejected loudly by marker, never mis-decoded.
- encode: quality-scaled Annex-K quantization, standard Annex-K Huffman
  tables, 4:4:4 or 4:2:0 (``subsample=True``), JFIF APP0 header.

Correctness strategy: JPEG is lossy, so unlike the PNG codec the round-trip
contract is tolerance-based — encode->decode at high quality must stay
within a small per-pixel error of the source (property-tested in
tests/test_jpegcodec.py), and both paths are deterministic byte-for-byte.
The decoder trusts the tables embedded in the stream, so it decodes foreign
baseline JPEGs too, not just its own output.

All DCT/quantization math is vectorized numpy over (N, 8, 8) block stacks;
only the entropy coder is a Python bit loop (it is inherently sequential),
which is fine for the Arrow-batch media kernels this feeds.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SOI = b"\xff\xd8"

# ---------------------------------------------------------------------------
# constant tables (ITU-T T.81 Annex K)

# K.1 / K.2 quantization tables, natural (row-major) order
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
)

# K.3-K.5 Huffman specs: (BITS counts for code lengths 1..16, HUFFVAL)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUMA_VALS = [
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
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag_order() -> np.ndarray:
    """Natural-order index for each zigzag position, generated (not
    transcribed) from the anti-diagonal traversal rule so there is no
    64-entry table to mistype."""
    coords = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag.reverse()  # even anti-diagonals run bottom-left -> top-right
        coords.extend(diag)
    return np.array([i * 8 + j for i, j in coords], dtype=np.int64)


_ZIGZAG = _zigzag_order()  # zigzag position -> natural index
_UNZIGZAG = np.argsort(_ZIGZAG)  # natural index -> zigzag position


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    mat = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    mat[0] *= np.sqrt(0.5)
    return mat * 0.5  # orthonormal: T @ T.T == I


_DCT = _dct_matrix()


def _canonical_codes(bits, vals):
    """(BITS, HUFFVAL) -> {symbol: (code, length)} per T.81 Annex C."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("JPEG: Huffman BITS overflow the code space")
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    if k != len(vals):
        raise ValueError("JPEG: BITS counts do not cover HUFFVAL")
    return codes


def _decode_table(bits, vals):
    """(BITS, HUFFVAL) -> {(length, code): symbol} for the bit-serial
    decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


def _quality_tables(quality: int):
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(
        np.uint8
    )


def _plane_to_blocks(plane: np.ndarray) -> np.ndarray:
    """H x W float plane (H, W multiples of 8) -> (n_v, n_h, 8, 8)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


# ---------------------------------------------------------------------------
# encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad to byte boundary with 1s
        return bytes(self.out)


def _magnitude(v: int):
    """value -> (size, code) per T.81 F.1.2.1 (two's-complement-ish)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def _encode_blocks(
    writer, blocks_q: np.ndarray, dc_codes, ac_codes, dc_pred: int
) -> int:
    """blocks_q: (N, 64) zigzag-ordered quantized int32. Returns new DC
    predictor."""
    for blk in blocks_q:
        diff = int(blk[0]) - dc_pred
        dc_pred = int(blk[0])
        size, code = _magnitude(diff)
        hcode, hlen = dc_codes[size]
        writer.write(hcode, hlen)
        if size:
            writer.write(code, size)
        nz = np.nonzero(blk[1:])[0]
        pos = 0
        for idx in nz:
            run = int(idx) - pos
            while run >= 16:
                zcode, zlen = ac_codes[0xF0]  # ZRL
                writer.write(zcode, zlen)
                run -= 16
            size, code = _magnitude(int(blk[1 + idx]))
            hcode, hlen = ac_codes[(run << 4) | size]
            writer.write(hcode, hlen)
            writer.write(code, size)
            pos = int(idx) + 1
        if pos < 63:
            ecode, elen = ac_codes[0x00]  # EOB
            writer.write(ecode, elen)
    return dc_pred


def _fdct_quant(plane: np.ndarray, qtbl: np.ndarray) -> np.ndarray:
    """Padded float plane -> (n_v, n_h, 64) zigzag quantized coefficients."""
    blocks = _plane_to_blocks(plane - 128.0)
    coef = np.einsum("ij,abjk,lk->abil", _DCT, blocks, _DCT)
    q = qtbl.reshape(8, 8).astype(np.float64)
    quant = np.round(coef / q).astype(np.int32)
    return quant.reshape(*quant.shape[:2], 64)[..., _ZIGZAG]


def _dht_segment(tc_th: int, bits, vals) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _encode_gray(img: np.ndarray, qluma: np.ndarray) -> bytes:
    h, w = img.shape
    y = _pad_to(img.astype(np.float64), 8)
    zz = _fdct_quant(y, qluma)
    dc_l = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    writer = _BitWriter()
    _encode_blocks(writer, zz.reshape(-1, 64), dc_l, ac_l, 0)
    entropy = writer.flush()
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    body = bytes([0]) + bytes(int(v) for v in qluma[_ZIGZAG])
    dqt = b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof_body = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    sof = b"\xff\xc0" + struct.pack(">H", len(sof_body) + 2) + sof_body
    dht = (
        _dht_segment(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS)
        + _dht_segment(0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)
    )
    sos_body = bytes([1, 1, 0x00, 0, 63, 0])
    sos = b"\xff\xda" + struct.pack(">H", len(sos_body) + 2) + sos_body
    return JPEG_SOI + app0 + dqt + sof + dht + sos + entropy + b"\xff\xd9"


def encode_jpeg(
    img: np.ndarray, quality: int = 90, subsample: bool = False
) -> bytes:
    """H x W x 3 uint8 RGB (or H x W uint8 grayscale) -> baseline JFIF JPEG.

    ``subsample=True`` emits 4:2:0 (2x2 chroma averaging — the common web
    layout); default is 4:4:4 for maximum round-trip fidelity. A 2-D input
    is encoded as a single-component (grayscale) scan.
    """
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("encode_jpeg expects a uint8 HxW or HxWx3 array")
    if img.ndim == 3 and img.shape[2] != 3:
        raise ValueError("encode_jpeg expects an H x W x 3 uint8 array")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("encode_jpeg: empty image")
    qluma, qchroma = _quality_tables(quality)
    if img.ndim == 2:
        return _encode_gray(img, qluma)
    ycc = _rgb_to_ycbcr(img)
    y = ycc[..., 0]
    if subsample:
        # pad chroma source to even dims, then 2x2 box average
        cpad = _pad_to(ycc[..., 1], 2), _pad_to(ycc[..., 2], 2)
        cb, cr = (
            c.reshape(c.shape[0] // 2, 2, c.shape[1] // 2, 2).mean(axis=(1, 3))
            for c in cpad
        )
        y = _pad_to(y, 16)
        cb = _pad_to(cb, 8)
        cr = _pad_to(cr, 8)
        hv = [(2, 2), (1, 1), (1, 1)]
    else:
        y = _pad_to(y, 8)
        cb = _pad_to(ycc[..., 1], 8)
        cr = _pad_to(ycc[..., 2], 8)
        hv = [(1, 1), (1, 1), (1, 1)]

    zz = [
        _fdct_quant(y, qluma),
        _fdct_quant(cb, qchroma),
        _fdct_quant(cr, qchroma),
    ]

    dc_l = _canonical_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _canonical_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _canonical_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _canonical_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    writer = _BitWriter()
    preds = [0, 0, 0]
    hmax = max(hh for hh, _ in hv)
    vmax = max(vv for _, vv in hv)
    mcus_y = y.shape[0] // (8 * vmax)
    mcus_x = y.shape[1] // (8 * hmax)
    tables = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for c in range(3):
                hh, vv = hv[c]
                for by in range(vv):
                    for bx in range(hh):
                        blk = zz[c][my * vv + by, mx * hh + bx][None, :]
                        preds[c] = _encode_blocks(
                            writer, blk, tables[c][0], tables[c][1], preds[c]
                        )
    entropy = writer.flush()

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HHBB", 1, 1, 0, 0)
    dqt = b""
    for tq, tbl in ((0, qluma), (1, qchroma)):
        body = bytes([tq]) + bytes(int(v) for v in tbl[_ZIGZAG])
        dqt += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof_body = struct.pack(">BHHB", 8, h, w, 3)
    for cid, (hh, vv) in zip((1, 2, 3), hv):
        sof_body += bytes([cid, (hh << 4) | vv, 0 if cid == 1 else 1])
    sof = b"\xff\xc0" + struct.pack(">H", len(sof_body) + 2) + sof_body
    dht = (
        _dht_segment(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS)
        + _dht_segment(0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)
        + _dht_segment(0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        + _dht_segment(0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    )
    sos_body = bytes([3])
    for cid in (1, 2, 3):
        sos_body += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos_body += bytes([0, 63, 0])
    sos = b"\xff\xda" + struct.pack(">H", len(sos_body) + 2) + sos_body
    return JPEG_SOI + app0 + dqt + sof + dht + sos + entropy + b"\xff\xd9"


# ---------------------------------------------------------------------------
# decoder


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.byte_pos = 0
        self.bit_pos = 0

    def read_bit(self) -> int:
        if self.byte_pos >= len(self.data):
            raise ValueError("JPEG: entropy stream truncated")
        bit = (self.data[self.byte_pos] >> (7 - self.bit_pos)) & 1
        self.bit_pos += 1
        if self.bit_pos == 8:
            self.bit_pos = 0
            self.byte_pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: invalid Huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_block(reader, dc_tbl, ac_tbl, pred: int):
    """-> (zigzag int32[64], new DC predictor)."""
    blk = np.zeros(64, dtype=np.int32)
    size = _huff_decode(reader, dc_tbl)
    diff = _extend(reader.read_bits(size), size) if size else 0
    pred += diff
    blk[0] = pred
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_tbl)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG: AC coefficient index overflows block")
        blk[k] = _extend(reader.read_bits(size), size)
        k += 1
    return blk, pred


def _split_entropy(data: bytes, start: int):
    """Entropy bytes from `start` to the next non-RST marker: returns
    (list of de-stuffed restart intervals, position of terminating marker)."""
    intervals = []
    cur = bytearray()
    i = start
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = data[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:  # stuffed 0xFF data byte
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn: new interval, predictors reset
            intervals.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    intervals.append(bytes(cur))
    return intervals, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> H x W x 3 uint8 RGB (gray replicated)."""
    if payload[:2] != JPEG_SOI:
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables = {}
    htables = {}  # (class, id) -> decode dict
    frame = None  # (h, w, [(cid, hh, vv, tq), ...])
    comp_tbls = {}  # cid -> (dc_id, ac_id)
    dri = 0  # MCUs per restart interval (0 = no restarts)
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG: expected marker at byte {pos}")
        while payload[pos + 1] == 0xFF:  # optional fill bytes (B.1.1.2)
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                if pq != 0:
                    raise ValueError("JPEG: 16-bit quant tables unsupported")
                zz = np.frombuffer(
                    body, np.uint8, 64, off + 1
                ).astype(np.int32)
                nat = np.empty(64, np.int32)
                nat[_ZIGZAG] = zz  # stream stores zigzag order
                qtables[tq] = nat
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17 : off + 17 + nvals])
                htables[(tc, th)] = _decode_table(bits, vals)
                off += 17 + nvals
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            depth, h, w, nc = struct.unpack(">BHHB", body[:6])
            if depth != 8:
                raise ValueError("JPEG: only 8-bit precision supported")
            if nc not in (1, 3):
                raise ValueError(f"JPEG: {nc}-component frames unsupported")
            comps = []
            for c in range(nc):
                cid, hv_, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv_ >> 4, hv_ & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG: non-baseline frame marker 0xFF{marker:02X} "
                "(progressive/arithmetic) unsupported"
            )
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            for c in range(ns):
                cid, tbl = body[1 + 2 * c], body[2 + 2 * c]
                comp_tbls[cid] = (tbl >> 4, tbl & 0x0F)
            intervals, pos = _split_entropy(payload, pos)
            return _decode_scan(
                frame, comp_tbls, qtables, htables, intervals, dri
            )
        # APPn / COM / others: skipped via seglen
    raise ValueError("JPEG: no SOS marker found")


def _decode_scan(frame, comp_tbls, qtables, htables, intervals, dri=0):
    if frame is None:
        raise ValueError("JPEG: SOS before SOF")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        raise ValueError("JPEG: sampling factors beyond 2 unsupported")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = {}
    for cid, hh, vv, _tq in comps:
        planes[cid] = np.zeros(
            (mcus_y * vv * 8, mcus_x * hh * 8), dtype=np.float64
        )
    total_mcus = mcus_x * mcus_y
    if len(intervals) > 1 and dri == 0:
        raise ValueError("JPEG: RST markers present but no DRI segment")
    mcu_index = 0
    for interval in intervals:
        reader = _BitReader(interval)
        preds = {cid: 0 for cid, *_ in comps}  # reset at restart boundaries
        n_here = min(dri or total_mcus, total_mcus - mcu_index)
        for _ in range(n_here):
            my, mx = divmod(mcu_index, mcus_x)
            for cid, hh, vv, tq in comps:
                dc_id, ac_id = comp_tbls[cid]
                dc_tbl = htables[(0, dc_id)]
                ac_tbl = htables[(1, ac_id)]
                q = qtables[tq].reshape(8, 8).astype(np.float64)
                for by in range(vv):
                    for bx in range(hh):
                        zz, preds[cid] = _decode_block(
                            reader, dc_tbl, ac_tbl, preds[cid]
                        )
                        nat = np.empty(64, np.int32)
                        nat[_ZIGZAG] = zz
                        coef = nat.reshape(8, 8).astype(np.float64) * q
                        pix = _DCT.T @ coef @ _DCT + 128.0
                        y0 = (my * vv + by) * 8
                        x0 = (mx * hh + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_index += 1
    if mcu_index < total_mcus:
        raise ValueError(
            f"JPEG: entropy stream ended after {mcu_index}/{total_mcus} MCUs"
        )

    # upsample each component to the luma grid, crop to (h, w)
    out = []
    for cid, hh, vv, _tq in comps:
        p = planes[cid]
        if hh < hmax:
            p = np.repeat(p, hmax // hh, axis=1)
        if vv < vmax:
            p = np.repeat(p, vmax // vv, axis=0)
        out.append(p[:h, :w])
    if len(out) == 1:
        gray = np.clip(out[0].round(), 0, 255).astype(np.uint8)
        return np.repeat(gray[:, :, None], 3, axis=2)
    return _ycbcr_to_rgb(out[0], out[1], out[2])
