"""Pure-Python baseline JPEG (JFIF) codec — numpy DCT, stdlib-only.

Scope (documented, honest): baseline sequential DCT (SOF0), 8-bit,
grayscale or YCbCr without chroma subsampling (4:4:4), single scan,
restart markers tolerated. That covers everything ``encode_jpeg``
produces and the common "quality 90+, no subsampling" export shape;
progressive (SOF2) and subsampled streams raise ValueError with a
clear message. All constants (zigzag order, quantization and Huffman
tables) are the public ISO/IEC 10918-1 Annex K examples.

JPEG is lossy: roundtrip tests assert bounded per-pixel error (the
quantization error bound), not byte equality — see tests/test_llm.py.

Scale note: like codec.py, decoding runs inside Arrow-batched
mapInPandas kernels; a production deployment swaps in libjpeg-turbo
via PIL transparently (same dispatch point, llm/codec.py
``decode_image``).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i in scan order -> linear index (row*8+col)
ZIGZAG = np.array(
    [
         0,  1,  8, 16,  9,  2,  3, 10,
        17, 24, 32, 25, 18, 11,  4,  5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13,  6,  7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K quantization tables (natural row-major order)
STD_LUM_QT = np.array(
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
    dtype=np.int64,
)
STD_CHR_QT = np.array(
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
    dtype=np.int64,
)

# Annex K Huffman tables: (bits[1..16] counts, symbol values)
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
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
AC_CHR = (
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
    """Orthonormal 8x8 DCT-II basis: dct = A @ block @ A.T."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_A = _dct_matrix()


def _huff_codes(bits, values):
    """Annex C code assignment: (symbol -> (code, length))."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decoder(bits, values):
    """(length, code) -> symbol map for the bit-at-a-time decoder."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
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
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.buf)


class _BitReader:
    """Entropy-stream bit reader: un-stuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
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
            elif 0xD0 <= nxt <= 0xD7:  # RSTn: reset handled by caller
                raise _RestartMarker()
            else:
                raise ValueError(f"marker 0xFF{nxt:02X} inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
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

    def sync_restart(self) -> None:
        """Skip to just past the RSTn marker, clearing bit state."""
        self.acc = 0
        self.nbits = 0
        while not (
            self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


class _RestartMarker(Exception):
    pass


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (category, appended bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _blocks(comp: np.ndarray) -> np.ndarray:
    """(H, W) padded component -> (n_by, n_bx, 8, 8) block view."""
    h, w = comp.shape
    return comp.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """Encode (H, W) gray or (H, W, 3) uint8 RGB as baseline JFIF
    (4:4:4, standard Annex K Huffman tables, quality-scaled Annex K
    quantization tables using the libjpeg scaling formula)."""
    if arr.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("encode_jpeg expects (H,W) or (H,W,3)")
    h, w = arr.shape[:2]

    # libjpeg quality scaling of the Annex K tables
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def scaled(tbl):
        t = (tbl * scale + 50) // 100
        return np.clip(t, 1, 255).astype(np.int64)

    qts = [scaled(STD_LUM_QT)] if gray else [scaled(STD_LUM_QT), scaled(STD_CHR_QT)]

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        planes = list(np.moveaxis(_rgb_to_ycbcr(arr.astype(np.float64)), -1, 0))
    padded = []
    for p in planes:
        padded.append(np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge"))

    n_comp = 1 if gray else 3
    dc_tabs = [_huff_codes(*DC_LUM), _huff_codes(*DC_CHR)]
    ac_tabs = [_huff_codes(*AC_LUM), _huff_codes(*AC_CHR)]

    bw = _BitWriter()
    pred = [0] * n_comp
    nby, nbx = ph // 8, pw // 8
    # precompute quantized coefficients per component (vectorized DCT)
    coefs = []
    for ci in range(n_comp):
        qt = qts[min(ci, len(qts) - 1)].reshape(8, 8)
        blocks = _blocks(padded[ci] - 128.0)
        d = np.einsum("ux,byxv,wv->byuw", _A, blocks, _A)
        coefs.append(np.round(d / qt).astype(np.int64))
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(n_comp):
                ti = min(ci, 1)
                dc_tab, ac_tab = dc_tabs[ti], ac_tabs[ti]
                zz = coefs[ci][by, bx].reshape(64)[ZIGZAG]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                cat, mbits = _magnitude(diff)
                code, length = dc_tab[cat]
                bw.write(code, length)
                if cat:
                    bw.write(mbits, cat)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        if k > last_nz:
                            code, length = ac_tab[0x00]  # EOB
                            bw.write(code, length)
                            break
                        run += 1
                        if run == 16:
                            code, length = ac_tab[0xF0]  # ZRL
                            bw.write(code, length)
                            run = 0
                        continue
                    cat, mbits = _magnitude(v)
                    code, length = ac_tab[(run << 4) | cat]
                    bw.write(code, length)
                    bw.write(mbits, cat)
                    run = 0
    entropy = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HHBB", 1, 1, 0, 0
    )
    for i, qt in enumerate(qts):
        out += b"\xff\xdb" + struct.pack(">HB", 67, i)
        out += bytes(int(x) for x in qt[ZIGZAG])
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * n_comp, 8, h, w, n_comp)
    for ci in range(n_comp):
        out += struct.pack("BBB", ci + 1, 0x11, min(ci, len(qts) - 1))
    # DHT
    for cls, idx, (bits, values) in (
        (0, 0, DC_LUM),
        (1, 0, AC_LUM),
        (0, 1, DC_CHR),
        (1, 1, AC_CHR),
    )[: (2 if gray else 4)]:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), (cls << 4) | idx)
        out += bytes(bits) + bytes(values)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * n_comp, n_comp)
    for ci in range(n_comp):
        ti = min(ci, 1)
        out += struct.pack("BB", ci + 1, (ti << 4) | ti)
    out += b"\x00\x3f\x00"
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JFIF stream (SOF0, 8-bit, 4:4:4 or grayscale)
    to a uint8 array: (H, W) for 1 component, (H, W, 3) RGB for 3."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_dec: dict[int, dict] = {}
    ac_dec: dict[int, dict] = {}
    comps = None
    h = w = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(
                    np.int64
                )
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = tbl  # zigzag -> natural order
                qts[tq] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, n_comp = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for ci in range(n_comp):
                cid, samp, tq = struct.unpack_from("BBB", seg, 6 + 3 * ci)
                if samp != 0x11:
                    raise ValueError(
                        "chroma subsampling unsupported (baseline 4:4:4 only)"
                    )
                comps.append({"id": cid, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X} (baseline only)")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, idx = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                nvals = sum(bits)
                values = list(seg[p + 17 : p + 17 + nvals])
                (dc_dec if cls == 0 else ac_dec)[idx] = _huff_decoder(bits, values)
                p += 17 + nvals
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            n_scan = seg[0]
            scan_tabs = []
            for ci in range(n_scan):
                cid, tt = struct.unpack_from("BB", seg, 1 + 2 * ci)
                scan_tabs.append((cid, tt >> 4, tt & 0x0F))
            pos += seglen
            return _decode_scan(
                data, pos, h, w, comps, scan_tabs, qts, dc_dec, ac_dec,
                restart_interval,
            )
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_huff(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _decode_scan(
    data, pos, h, w, comps, scan_tabs, qts, dc_dec, ac_dec, restart_interval
):
    n_comp = len(comps)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    nby, nbx = ph // 8, pw // 8
    coefs = [np.zeros((nby, nbx, 8, 8), dtype=np.int64) for _ in range(n_comp)]
    br = _BitReader(data, pos)
    pred = [0] * n_comp
    mcu = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.sync_restart()
                pred = [0] * n_comp
            try:
                for ci in range(n_comp):
                    _cid, dct_i, act_i = scan_tabs[ci]
                    zz = np.zeros(64, dtype=np.int64)
                    cat = _decode_huff(br, dc_dec[dct_i])
                    diff = _extend(br.bits(cat), cat) if cat else 0
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _decode_huff(br, ac_dec[act_i])
                        run, cat = rs >> 4, rs & 0x0F
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("AC index overflow")
                        zz[k] = _extend(br.bits(cat), cat)
                        k += 1
                    nat = np.zeros(64, dtype=np.int64)
                    nat[ZIGZAG] = zz
                    coefs[ci][by, bx] = nat.reshape(8, 8)
            except _RestartMarker:
                # unexpected RST (lenient): resync and redo this MCU
                br.sync_restart()
                pred = [0] * n_comp
                continue
            mcu += 1
    planes = []
    for ci in range(n_comp):
        qt = qts[comps[ci]["tq"]]
        d = coefs[ci] * qt  # dequantize
        blocks = np.einsum("xu,byuw,vw->byxv", _A.T, d.astype(np.float64), _A.T)
        plane = blocks.transpose(0, 2, 1, 3).reshape(ph, pw) + 128.0
        planes.append(plane[:h, :w])
    if n_comp == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    ycc = np.stack(planes, axis=-1)
    rgb = _ycbcr_to_rgb(ycc)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
