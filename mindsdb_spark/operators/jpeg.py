"""Baseline JPEG codec on the standard library + numpy.

Round-8 counterpart to the round-7 PNG codec (multimodal.py): the
reference's file/media readers lean on PIL (reference:
mindsdb/integrations/utilities/files — image handling delegates to
libraries); this container has none, so `decode_media` was honestly
env-gated for JPEG. This module closes that gap for the dominant interchange
subset — ITU-T T.81 BASELINE sequential DCT, 8-bit, grayscale or YCbCr with
1x1 / 2x1 / 2x2 luma sampling, restart intervals — implemented from the
public spec (tables from Annex K). Progressive, arithmetic-coded and 12-bit
streams raise `NotImplementedError` with a clear message rather than
returning garbage.

Design notes for the Spark deployment: encode/decode run on the EXECUTORS
inside Arrow-batched `mapInPandas` stages (multimodal.decode_media /
jpeg_blockmean_media), so payload bytes never cross the driver and codec
CPU scales with executor count. The DCT/IDCT is an 8x8 matrix sandwich on
numpy (vectorized over every block of a component at once); only the
entropy coding is per-symbol Python, which is inherent to a stdlib Huffman
codec and stays executor-side — the same trade the PNG scanline filters
make.
"""

from __future__ import annotations

import struct

import numpy as np

# --- ITU-T T.81 Annex K tables (public spec) --------------------------------

# K.1 — luminance quantization, row-major
QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

# K.2 — chrominance quantization
QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# zigzag scan order: ZIGZAG[i] = row-major index of the i-th zigzag element
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# K.3-K.6 — standard Huffman tables: (BITS[1..16], HUFFVAL)
HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUM = (
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
HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
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
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: dct2(B) = D @ B @ D.T."""
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    d[0, :] = 1.0
    scale = np.full((8, 1), 0.5)
    scale[0, 0] = 1.0 / (2 * np.sqrt(2.0))
    return d * scale


_DCT = _dct_matrix()


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG-style quality scaling (public libjpeg convention)."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = (base * scale + 50) // 100
    return np.clip(qt, 1, 255).astype(np.int32)


def _build_codes(bits: list, huffval: list) -> dict:
    """Canonical Huffman: symbol -> (code, length)."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_map(bits: list, huffval: list) -> dict:
    """(length, code) -> symbol for bit-serial decoding."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, coeffs: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """Entropy-encode one quantized, zigzagged 64-coefficient block."""
    dc = int(coeffs[0])
    diff = dc - pred
    size = _category(diff)
    code, length = dc_codes[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    run = 0
    last_nz = int(np.max(np.nonzero(coeffs)[0])) if np.any(coeffs[1:]) else 0
    for i in range(1, 64):
        v = int(coeffs[i])
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size = _category(v)
        code, length = ac_codes[run * 16 + size]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << size) - 1, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def encode_jpeg(raster: bytes, width: int, height: int, channels: int = 1,
                quality: int = 90, subsample: bool = False) -> bytes:
    """Encode an 8-bit raster (gray or interleaved RGB) as baseline JFIF.

    ``subsample=True`` writes 4:2:0 chroma (2x2 luma sampling) — the
    common camera layout; default is 4:4:4. Grayscale ignores subsample.
    """
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if len(raster) != width * height * channels:
        raise ValueError(
            f"raster size {len(raster)} != width*height*channels "
            f"({width}x{height}x{channels} = {width * height * channels})"
        )
    img = np.frombuffer(raster, dtype=np.uint8).reshape(height, width, channels)
    qt_l = _scaled_qt(QT_LUM, quality)
    qt_c = _scaled_qt(QT_CHROM, quality)

    if channels == 3:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128.0
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128.0
        y, cb, cr = (np.clip(p, 0, 255) for p in (y, cb, cr))
        if subsample:
            # pad to even dims, then 2x2 box-average the chroma planes
            ph, pw = -(-height // 2) * 2, -(-width // 2) * 2
            cbp = np.pad(cb, ((0, ph - height), (0, pw - width)), mode="edge")
            crp = np.pad(cr, ((0, ph - height), (0, pw - width)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qts = [qt_l, qt_c, qt_c]
        qsel = [0, 1, 1]
    else:
        planes = [img[..., 0].astype(np.float64)]
        qts = [qt_l]
        qsel = [0]
        samp = [(1, 1)]

    zz_inv = ZIGZAG  # zigzag index i reads row-major position ZIGZAG[i]

    def blocks_of(plane, qt):
        h, w = plane.shape
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        padded = np.pad(plane - 128.0, ((0, ph - h), (0, pw - w)), mode="edge")
        bv, bh = ph // 8, pw // 8
        b = padded.reshape(bv, 8, bh, 8).transpose(0, 2, 1, 3)
        coeffs = np.einsum("ij,abjk,lk->abil", _DCT, b, _DCT)
        q = np.round(coeffs / qt.reshape(8, 8)).astype(np.int32).reshape(bv, bh, 64)
        return q[:, :, zz_inv], bv, bh  # to zigzag order

    comp_blocks = []
    for plane, qt in zip(planes, qts):
        comp_blocks.append(blocks_of(plane, qt))

    # --- headers ---
    out = bytearray(b"\xFF\xD8")  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(
        [1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    for tid, qt in ((0, qt_l), (1, qt_c))[: (2 if channels == 3 else 1)]:
        out += b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(qt[z]) for z in ZIGZAG)  # stored in zigzag order
    nc = channels
    out += b"\xFF\xC0" + struct.pack(">H", 8 + 3 * nc) + bytes([8])
    out += struct.pack(">HH", height, width) + bytes([nc])
    for ci in range(nc):
        hs, vs = samp[ci]
        out += bytes([ci + 1, (hs << 4) | vs, qsel[ci]])
    tables = [(0x00, HUFF_DC_LUM), (0x10, HUFF_AC_LUM)]
    if channels == 3:
        tables += [(0x01, HUFF_DC_CHROM), (0x11, HUFF_AC_CHROM)]
    for tc, (bits, vals) in tables:
        out += b"\xFF\xC4" + struct.pack(">H", 19 + len(vals)) + bytes([tc])
        out += bytes(bits) + bytes(vals)
    out += b"\xFF\xDA" + struct.pack(">H", 6 + 2 * nc) + bytes([nc])
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += bytes([0, 63, 0])

    # --- entropy-coded data ---
    dc_l, ac_l = _build_codes(*HUFF_DC_LUM), _build_codes(*HUFF_AC_LUM)
    dc_c, ac_c = _build_codes(*HUFF_DC_CHROM), _build_codes(*HUFF_AC_CHROM)
    bw = _BitWriter()
    preds = [0] * nc
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-width // mcu_w)
    mcus_y = -(-height // mcu_h)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nc):
                hs, vs = samp[ci]
                blocks, bv, bh = comp_blocks[ci]
                dc_t, ac_t = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
                for by in range(vs):
                    for bx in range(hs):
                        row = min(my * vs + by, bv - 1)
                        colb = min(mx * hs + bx, bh - 1)
                        preds[ci] = _encode_block(
                            bw, blocks[row, colb], preds[ci], dc_t, ac_t
                        )
    bw.flush()
    out += bw.out
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 de-stuffing and
    restart-marker awareness."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None  # pending non-RST marker (e.g. EOI)

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8  # pad past end (spec: pad bits)
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: stop filling; reset() consumes it
                    self.marker = nxt
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
                else:
                    self.marker = nxt
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume a restart marker and realign to a byte boundary."""
        # drop pad bits to the marker
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                self.marker = None
                return
            self.pos += 1
        raise ValueError("jpeg: expected restart marker")


def _decode_huff(br: _BitReader, dmap: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = dmap.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: bad huffman code")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(content: bytes) -> tuple:
    """Decode a baseline JPEG to ``(width, height, channels, raster)``.

    Supports: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
    luma sampling factors (1,1)/(2,1)/(1,2)/(2,2) with 1x1 chroma, restart
    intervals, JFIF/EXIF APPn segments. Progressive (SOF2), arithmetic
    coding and 12-bit precision raise NotImplementedError.
    """
    if content[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps = []  # (id, hs, vs, qsel)
    width = height = None
    restart_interval = 0
    scan_comps = []
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            pos += 1
            continue
        marker = content[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", content[pos + 2: pos + 4])
        data = content[pos + 4: pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(data):
                pq, tq = data[off] >> 4, data[off] & 0x0F
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant tables")
                tab = np.zeros(64, dtype=np.int32)
                tab[ZIGZAG] = np.frombuffer(
                    data[off + 1: off + 65], dtype=np.uint8
                ).astype(np.int32)
                qts[tq] = tab
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(data):
                tc, th = data[off] >> 4, data[off] & 0x0F
                bits = list(data[off + 1: off + 17])
                cnt = sum(bits)
                vals = list(data[off + 17: off + 17 + cnt])
                dmap = _build_decode_map(bits, vals)
                (huff_ac if tc else huff_dc)[th] = dmap
                off += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec = data[0]
            if prec != 8:
                raise NotImplementedError(f"jpeg: {prec}-bit precision")
            height, width = struct.unpack(">HH", data[1:5])
            nc = data[5]
            comps = []
            for i in range(nc):
                cid, hv, qsel = data[6 + 3 * i: 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, qsel))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: SOF{marker - 0xC0} (progressive/arithmetic/"
                "hierarchical) — only baseline sequential is stdlib-decoded"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS
            ns = data[0]
            scan_comps = []
            for i in range(ns):
                cid, tsel = data[1 + 2 * i: 3 + 2 * i]
                scan_comps.append((cid, tsel >> 4, tsel & 0x0F))
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if width is None or not scan_comps:
        raise ValueError("jpeg: missing SOF/SOS")

    order = []
    for cid, dsel, asel in scan_comps:
        spec = next(c for c in comps if c[0] == cid)
        order.append((spec, dsel, asel))
    hmax = max(c[0][1] for c in order)
    vmax = max(c[0][2] for c in order)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    planes = {}
    bdims = {}
    for (cid, hs, vs, qsel), _, _ in order:
        bw_, bh_ = mcus_y * vs, mcus_x * hs
        planes[cid] = np.zeros((bw_, bh_, 64), dtype=np.int32)
        bdims[cid] = (bw_, bh_)

    br = _BitReader(content, pos)
    preds = {cid: 0 for (cid, *_), _, _ in order}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                preds = {cid: 0 for (cid, *_), _, _ in order}
            for (cid, hs, vs, qsel), dsel, asel in order:
                dmap_dc, dmap_ac = huff_dc[dsel], huff_ac[asel]
                for by in range(vs):
                    for bx in range(hs):
                        size = _decode_huff(br, dmap_dc)
                        diff = _extend(br.bits(size), size) if size else 0
                        preds[cid] += diff
                        blk = planes[cid][my * vs + by, mx * hs + bx]
                        blk[0] = preds[cid]
                        k = 1
                        while k < 64:
                            sym = _decode_huff(br, dmap_ac)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = sym >> 4, sym & 0x0F
                            k += run
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            blk[k] = _extend(br.bits(size), size)
                            k += 1
            mcu_count += 1

    # dequantize + inverse zigzag + IDCT per component (vectorized)
    out_planes = {}
    for (cid, hs, vs, qsel), _, _ in order:
        bv, bh = bdims[cid]
        zz = planes[cid] * qts[qsel][ZIGZAG][None, None, :]
        rm = np.zeros((bv, bh, 64), dtype=np.float64)
        rm[:, :, ZIGZAG] = zz
        blocks = rm.reshape(bv, bh, 8, 8)
        pix = np.einsum("ji,abjk,kl->abil", _DCT, blocks, _DCT)
        pix = np.clip(np.round(pix + 128.0), 0, 255)
        plane = pix.transpose(0, 2, 1, 3).reshape(bv * 8, bh * 8)
        # upsample to full resolution (nearest) if subsampled
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes[cid] = plane[:height, :width]

    if len(order) == 1:
        gray = out_planes[order[0][0][0]].astype(np.uint8)
        return width, height, 1, gray.tobytes()
    y = out_planes[order[0][0][0]]
    cb = out_planes[order[1][0][0]] - 128.0
    cr = out_planes[order[2][0][0]] - 128.0
    r = np.clip(np.round(y + 1.402 * cr), 0, 255)
    g = np.clip(np.round(y - 0.344136 * cb - 0.714136 * cr), 0, 255)
    b = np.clip(np.round(y + 1.772 * cb), 0, 255)
    rgb = np.stack([r, g, b], axis=-1).astype(np.uint8)
    return width, height, 3, rgb.tobytes()
