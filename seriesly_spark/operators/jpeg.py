"""Baseline JPEG codec — pure numpy + stdlib, no imaging library.

Implements the baseline sequential DCT process of the public JPEG spec
(ITU-T T.81 / ISO 10918-1): 8x8 forward/inverse DCT as an orthonormal
matrix product, Annex-K quantisation tables with IJG-style quality
scaling, canonical Huffman code construction (spec C.2) from the
Annex-K table specifications, zigzag coefficient ordering, DC
differential + run-length AC entropy coding with 0xFF byte stuffing,
and the JFIF YCbCr <-> RGB transform. Supported layouts: single
component (grayscale), 3-component 4:4:4, and 3-component 4:2:0
(2x2 chroma subsampling). Progressive, arithmetic-coded, 12-bit and
restart-interval streams raise ValueError — strict like the PPM/PNG
codecs in this package (``operators/multimodal.py``), never a silent
mis-decode.

Like the PNG codec, the decoder trusts the tables IN THE STREAM (DQT /
DHT / SOF0 are parsed, not assumed), so it decodes any conforming
baseline file, not just this encoder's output.

Why this exists: the multimodal decode surface treats images as opaque
``binary`` columns decoded inside Arrow-batched ``mapInPandas``
(`image_channel_stats`). PPM proved the plumbing, PNG the
deflate/filter machinery; JPEG is the dominant real-world web-image
format and exercises the full lossy transform path. The per-block
Huffman entropy decode is a sequential bit walk by definition; the
dequantise + un-zigzag + IDCT stage is vectorised across all blocks of
an image in one (n_blocks, 8, 8) einsum.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- tables

def _zigzag() -> "np.ndarray":
    """Zigzag scan order: array of 64 raster offsets (r*8+c), index =
    position in the scan. Generated, not transcribed: diagonal s is
    walked upward (by column) when s is even, downward (by row) when s
    is odd — the T.81 figure A.6 traversal."""
    cells = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            rc[0] if (rc[0] + rc[1]) % 2 else rc[1],
        ),
    )
    return np.array([r * 8 + c for r, c in cells], dtype=np.int64)


ZIGZAG = _zigzag()

# Annex K.1 / K.2 reference quantisation tables (public spec constants).
STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# Annex K.3-K.6 Huffman table specifications: (BITS[1..16], HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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

# Orthonormal 8x8 DCT-II basis: forward F = M @ b @ M.T, inverse
# b = M.T @ F @ M. M[0] row carries the 1/sqrt(2) DC normalisation, so
# a constant block of value v has F[0,0] = 8v exactly (modulo float
# rounding ~1e-13 — absorbed by quantiser rounding on encode and pixel
# rounding on decode).
_k = np.arange(8)
_DCT_M = (
    0.5
    * np.where(_k == 0, 1.0 / np.sqrt(2.0), 1.0)[:, None]
    * np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16.0)
)


def quality_scale(table: "np.ndarray", quality: int) -> "np.ndarray":
    """IJG quality scaling: 50 keeps the Annex-K table verbatim, higher
    shrinks the steps, lower grows them; entries clamp to [1, 255]
    (8-bit DQT precision)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _build_codes(bits: list, vals: list) -> dict:
    """Canonical Huffman codes from a (BITS, HUFFVAL) spec (T.81 C.2):
    symbol -> (code, length)."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _build_decoder(bits: list, vals: list) -> dict:
    """(length, code) -> symbol, for the bit-at-a-time decoder."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return out


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

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
            if byte == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # 1-pad the final byte
        return bytes(self.buf)


class _BitReader:
    """MSB-first bit reader over entropy-coded data, un-stuffing
    0xFF 0x00 and refusing embedded markers (no DRI support)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            marker = self.data[self.pos]
            if marker == 0x00:
                self.pos += 1
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{marker:02X} in entropy data "
                    "(restart intervals not supported)"
                )
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map `size` raw bits to the signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _size_of(v: int) -> int:
    return abs(v).bit_length()


def _encode_block(
    coeffs: "np.ndarray", prev_dc: int, dc_codes: dict, ac_codes: dict,
    w: "_BitWriter",
) -> int:
    """Entropy-code one zigzag-ordered quantised block; returns its DC."""
    dc = int(coeffs[0])
    diff = dc - prev_dc
    size = _size_of(diff)
    code, length = dc_codes[size]
    w.put(code, length)
    if size:
        w.put(diff if diff >= 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(coeffs)[0])) if np.any(coeffs[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(coeffs[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            w.put(code, length)
            run -= 16
        size = _size_of(v)
        code, length = ac_codes[(run << 4) | size]
        w.put(code, length)
        w.put(v if v >= 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        w.put(code, length)
    return dc


def _fdct_quant(plane: "np.ndarray", qt: "np.ndarray") -> "np.ndarray":
    """Forward DCT + quantise an (H, W) float plane (level-shifted) into
    zigzag-ordered int blocks, raster block order: (n_blocks, 64)."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    f = np.einsum("ux,nxy,vy->nuv", _DCT_M, blocks, _DCT_M)
    q = np.round(f / qt[None, :, :]).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _marker(tag: int, body: bytes) -> bytes:
    return bytes([0xFF, tag]) + (len(body) + 2).to_bytes(2, "big") + body


def _dqt_seg(tid: int, qt: "np.ndarray") -> bytes:
    return _marker(0xDB, bytes([tid]) + bytes(qt.reshape(64)[ZIGZAG].astype(np.uint8)))


def _dht_seg(cls: int, tid: int, bits: list, vals: list) -> bytes:
    return _marker(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))


def encode_jpeg(
    arr: "np.ndarray", quality: int = 75, subsampling: str = "4:2:0"
) -> bytes:
    """Serialize an (h, w, 3) or (h, w) uint8 array as a baseline JFIF
    JPEG. Grayscale input emits a single-component scan; RGB emits
    YCbCr at 4:2:0 (default) or 4:4:4. Arbitrary dimensions are edge-
    replicated up to the MCU grid (the decoder crops back to the SOF
    dimensions — standard JPEG behaviour)."""
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise ValueError("expected (h, w[, 3]) uint8")
    gray = arr.ndim == 2
    if not gray and arr.shape[2] != 3:
        raise ValueError("expected 3 channels")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt_l = quality_scale(STD_LUMA_Q, quality)
    qt_c = quality_scale(STD_CHROMA_Q, quality)
    sub = not gray and subsampling == "4:2:0"
    if not gray and subsampling not in ("4:2:0", "4:4:4"):
        raise ValueError("subsampling must be 4:2:0 or 4:4:4")
    mcu = 16 if sub else 8

    ph, pw = -h % mcu, -w % mcu
    padded = np.pad(arr, [(0, ph), (0, pw)] + ([] if gray else [(0, 0)]),
                    mode="edge").astype(np.float64)
    if gray:
        planes = [padded - 128.0]
    else:
        r, g, b = padded[:, :, 0], padded[:, :, 1], padded[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
        if sub:
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
        planes = [y - 128.0, cb - 128.0, cr - 128.0]

    qblocks = [
        _fdct_quant(p, qt_l if i == 0 else qt_c) for i, p in enumerate(planes)
    ]

    dc_l = _build_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _build_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw = _BitWriter()
    prev = [0] * len(planes)
    if gray or not sub:
        n_bx = planes[0].shape[1] // 8
        n_by = planes[0].shape[0] // 8
        for by in range(n_by):
            for bx in range(n_bx):
                for ci, qb in enumerate(qblocks):
                    codes = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                    prev[ci] = _encode_block(
                        qb[by * n_bx + bx], prev[ci], codes[0], codes[1], bw
                    )
    else:
        n_mx = planes[0].shape[1] // 16
        n_my = planes[0].shape[0] // 16
        ybx = planes[0].shape[1] // 8
        cbx = planes[1].shape[1] // 8
        for my in range(n_my):
            for mx in range(n_mx):
                for dy in range(2):
                    for dx in range(2):
                        idx = (my * 2 + dy) * ybx + (mx * 2 + dx)
                        prev[0] = _encode_block(
                            qblocks[0][idx], prev[0], dc_l, ac_l, bw
                        )
                for ci in (1, 2):
                    prev[ci] = _encode_block(
                        qblocks[ci][my * cbx + mx], prev[ci], dc_c, ac_c, bw
                    )

    app0 = _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    segs = [b"\xff\xd8", app0, _dqt_seg(0, qt_l)]
    if not gray:
        segs.append(_dqt_seg(1, qt_c))
    ncomp = 1 if gray else 3
    sof_comps = b""
    for ci in range(ncomp):
        samp = 0x11
        if sub and ci == 0:
            samp = 0x22
        sof_comps += bytes([ci + 1, samp, 0 if ci == 0 else 1])
    segs.append(_marker(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([ncomp]) + sof_comps,
    ))
    segs.append(_dht_seg(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    segs.append(_dht_seg(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if not gray:
        segs.append(_dht_seg(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
        segs.append(_dht_seg(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    sos_comps = b"".join(
        bytes([ci + 1, 0x00 if ci == 0 else 0x11]) for ci in range(ncomp)
    )
    segs.append(_marker(0xDA, bytes([ncomp]) + sos_comps + b"\x00\x3f\x00"))
    segs.append(bw.flush())
    segs.append(b"\xff\xd9")
    return b"".join(segs)


def _decode_huff(br: "_BitReader", table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG stream")


def decode_jpeg(payload: bytes) -> "np.ndarray":
    """Parse a baseline JFIF/JPEG payload to an (h, w, 3) uint8 array
    (grayscale replicated across channels, like a convert-to-RGB).
    Tables are read from the stream; layouts beyond grayscale / 4:4:4 /
    4:2:0, progressive (SOF2), arithmetic coding, 12-bit precision and
    restart intervals raise ValueError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict = {}
    dc_tabs: dict = {}
    ac_tabs: dict = {}
    sof = None
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        tag = payload[pos + 1]
        if tag == 0xD9:
            break
        size = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        body = payload[pos + 4 : pos + 2 + size]
        if len(body) != size - 2:
            raise ValueError("truncated JPEG segment")
        if tag == 0xDB:
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0x0F
                if pq != 0:
                    raise ValueError("only 8-bit quantisation tables supported")
                zz = np.frombuffer(
                    body[bpos + 1 : bpos + 65], dtype=np.uint8
                ).astype(np.int64)
                qt = np.zeros(64, dtype=np.int64)
                qt[ZIGZAG] = zz
                qtabs[tq] = qt.reshape(8, 8)
                bpos += 65
        elif tag == 0xC4:
            bpos = 0
            while bpos < len(body):
                cls, tid = body[bpos] >> 4, body[bpos] & 0x0F
                bits = list(body[bpos + 1 : bpos + 17])
                n = sum(bits)
                vals = list(body[bpos + 17 : bpos + 17 + n])
                (ac_tabs if cls else dc_tabs)[tid] = _build_decoder(bits, vals)
                bpos += 17 + n
        elif tag == 0xC0:
            prec = body[0]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            fh = int.from_bytes(body[1:3], "big")
            fw = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            sof = (fh, fw, comps)
        elif tag in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                     0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential DCT (SOF0) supported")
        elif tag == 0xDD:
            raise ValueError("restart intervals not supported")
        elif tag == 0xDA:
            ns = body[0]
            scomp = []
            for i in range(ns):
                cs, tabs = body[1 + 2 * i : 3 + 2 * i]
                scomp.append((cs, tabs >> 4, tabs & 0x0F))
            scan = (scomp, pos + 2 + size)
            break
        pos += 2 + size
    if sof is None or scan is None:
        raise ValueError("missing SOF0/SOS segment")
    fh, fw, comps = sof
    scomp, data_pos = scan
    if len(scomp) != len(comps):
        raise ValueError("scan/frame component mismatch")
    hs = [c[1] for c in comps]
    vs = [c[2] for c in comps]
    hmax, vmax = max(hs), max(vs)
    if len(comps) == 1:
        layouts_ok = True
    elif len(comps) == 3 and hs == [1, 1, 1] and vs == [1, 1, 1]:
        layouts_ok = True
    elif len(comps) == 3 and hs == [2, 1, 1] and vs == [2, 1, 1]:
        layouts_ok = True
    else:
        layouts_ok = False
    if not layouts_ok:
        raise ValueError("only grayscale, 4:4:4 and 4:2:0 layouts supported")

    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    n_mx = -(-fw // mcu_w)
    n_my = -(-fh // mcu_h)
    # per-component block grids (within the MCU tiling)
    grids = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        grids.append((n_mx * hi, n_my * vi))
    coeff = [
        np.zeros((gx * gy, 64), dtype=np.int64) for (gx, gy) in grids
    ]
    br = _BitReader(payload, data_pos)
    pred = [0] * len(comps)
    for my in range(n_my):
        for mx in range(n_mx):
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                td, ta = scomp[ci][1], scomp[ci][2]
                dct, act = dc_tabs.get(td), ac_tabs.get(ta)
                if dct is None or act is None:
                    raise ValueError("scan references undefined Huffman table")
                gx = grids[ci][0]
                for dy in range(vi):
                    for dx in range(hi):
                        blk = coeff[ci][(my * vi + dy) * gx + (mx * hi + dx)]
                        size = _decode_huff(br, dct)
                        diff = _extend(br.bits(size), size) if size else 0
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC coefficient overrun")
                            blk[k] = _extend(br.bits(s), s)
                            k += 1

    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        qt = qtabs.get(tq)
        if qt is None:
            raise ValueError("frame references undefined quantisation table")
        gx, gy = grids[ci]
        deq = np.zeros((len(coeff[ci]), 64), dtype=np.float64)
        deq[:, ZIGZAG] = coeff[ci].astype(np.float64)
        deq = deq.reshape(-1, 8, 8) * qt[None, :, :]
        blocks = np.einsum("xu,nuv,yv->nxy", _DCT_M.T, deq, _DCT_M.T)
        plane = (
            blocks.reshape(gy, gx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(gy * 8, gx * 8)
        ) + 128.0
        # upsample subsampled components to the full MCU grid (nearest)
        ry, rx = vmax // vi, hmax // hi
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
