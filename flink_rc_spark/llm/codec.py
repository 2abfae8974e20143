"""Pure-Python image codecs — closes the multimodal decode stub.

The container ships no PIL/ffmpeg, so these decoders are stdlib+numpy
only: BMP (24-bit uncompressed BI_RGB, the format simple enough to
CONSTRUCT in SQL — see q_multimodal_decode) and PNG (8-bit gray/RGB/
RGBA, non-interlaced, all five scanline filters, zlib from stdlib).
Encoders exist for roundtrip tests: encode -> decode must be
byte-exact on the pixel array.

Filter-cost note: None/Up/Sub unfiltering is vectorized numpy;
Average and Paeth are inherently sequential per byte (each
reconstruction feeds the next prediction) and run as O(W*C) Python
loops per scanline — acceptable because decode is an Arrow-batched
executor kernel, but a production deployment should swap in PIL.

Scale note: decoding runs inside Arrow-batched mapInPandas kernels
(llm/multimodal.py) — per-image pure-Python header parsing is trivial
next to payload IO; the pixel math is numpy. A production deployment
swaps `decode_image`'s dispatch for PIL/libvips transparently.

Reference parity: none — the reference is numeric-vector-only
(SURVEY.md §1.1); multimodal columns are driver-north-star surface.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# ---------------------------------------------------------------- BMP


def encode_bmp(arr: np.ndarray) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit BI_RGB BMP
    (bottom-up rows, BGR byte order, rows padded to 4 bytes)."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp expects (H, W, 3) uint8")
    h, w, _ = arr.shape
    row_len = w * 3
    pad = (-row_len) % 4
    img_size = (row_len + pad) * h
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM",
        14 + 40 + img_size,
        0,
        0,
        14 + 40,
        40,
        w,
        h,
        1,
        24,
        0,
        img_size,
        2835,
        2835,
        0,
        0,
    )
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y, :, ::-1].tobytes()  # RGB -> BGR
        body += row + b"\x00" * pad
    return header + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an (H, W, 3) uint8 RGB
    array. Supports the standard bottom-up layout plus top-down
    (negative height)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (offset,) = struct.unpack_from("<I", data, 10)
    (hdr_size, w, h, _planes, bpp, comp) = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
    top_down = h < 0
    h = abs(h)
    row_len = w * 3
    stride = row_len + ((-row_len) % 4)
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        row = np.frombuffer(data, dtype=np.uint8, count=row_len, offset=offset + i * stride)
        y = i if top_down else h - 1 - i
        out[y] = row.reshape(w, 3)[:, ::-1]  # BGR -> RGB
    return out


# ---------------------------------------------------------------- PNG

_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


def encode_png(arr: np.ndarray) -> bytes:
    """Encode (H, W) gray or (H, W, 3|4) uint8 as 8-bit PNG
    (filter 0 on every scanline, single IDAT)."""
    if arr.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if arr.ndim == 2:
        color_type, ch = 0, 1
        flat = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, ch = 2, 3
        flat = arr
    elif arr.ndim == 3 and arr.shape[2] == 4:
        color_type, ch = 6, 4
        flat = arr
    else:
        raise ValueError("encode_png expects (H,W), (H,W,3) or (H,W,4)")
    h, w = arr.shape[:2]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (gray / RGB / RGBA) to a
    uint8 array, reversing all five scanline filters."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color_type = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or interlace != 0 or color_type not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG: depth={depth} color={color_type} "
                    f"interlace={interlace}"
                )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        filt = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if filt == 0:
            recon = line
        elif filt == 1:  # Sub — per-lane prefix sum: recon[i] = line[i]
            # + recon[i-ch], and (&0xFF) distributes over addition, so
            # each residue class mod ch is an independent cumsum.
            recon = (line.reshape(-1, ch).cumsum(axis=0) & 0xFF).reshape(-1)
        elif filt == 2:  # Up
            recon = (line + prev) & 0xFF
        elif filt == 3:  # Average
            recon = line.copy()
            for i in range(stride):
                left = recon[i - ch] if i >= ch else 0
                recon[i] = (recon[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            recon = line.copy()
            for i in range(stride):
                left = recon[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                recon[i] = (recon[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {filt}")
        out[y] = recon.astype(np.uint8)
        prev = recon
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes. Raises ValueError on unknown formats —
    there is no NotImplementedError left in the decode path."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from flink_rc_spark.llm.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise ValueError(f"unsupported image magic: {payload[:8]!r}")
