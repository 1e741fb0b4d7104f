"""Baseline PNG codec — pure Python + stdlib zlib + NumPy, no
external codec libraries.

Implements the PUBLIC PNG specification (ISO/IEC 15948:2004 /
W3C PNG second edition / RFC 2083): the decoder handles 8-bit-depth,
non-interlaced images of color types 0 (grayscale), 2 (truecolor),
3 (indexed with PLTE), 4 (grayscale+alpha) and 6 (truecolor+alpha),
with all five scanline filters (None/Sub/Up/Average/Paeth) and chunk
CRC verification. 16-bit and sub-8-bit packed depths and Adam7
interlace raise NotImplementedError; malformed streams raise
ValueError. The encoder emits 8-bit grayscale/truecolor PNG with a
caller-chosen uniform scanline filter — it exists so every unfilter
path is round-trip-testable in this container and so media fixtures
can be generated without Pillow.

This closes the most common image format still behind the E13
``decoder=`` swap-in: image/png now decodes for real through
:func:`decode_png`; a production deployment can still plug libpng /
Pillow through the ``decoder=`` contract in :mod:`multimodal` for
throughput, but correctness no longer depends on it (the same
contract jpeg.py established for image/jpeg).

Scale note: decoding runs inside Arrow-batched ``mapInPandas`` tasks
(multimodal.extract_features), one blob at a time. None/Up rows
unfilter vectorized; Sub/Average/Paeth rows carry a left-neighbor
dependency and run as per-byte loops — microseconds for
thumbnail-sized fixtures, and the Spark-side plumbing is identical
to what a C codec would use.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left
    to the linear estimate a + b − c, ties left → up → up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Invert the per-scanline filters → (h, stride) uint8 recon."""
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"decompressed IDAT length {len(raw)} != expected "
            f"{h * (stride + 1)} (h={h}, stride={stride})"
        )
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride,
                            offset=pos + 1).copy()
        pos += stride + 1
        if ft == 0:  # None
            cur = row
        elif ft == 2:  # Up — vectorized, no intra-row dependency
            cur = row + prev
        elif ft == 1:  # Sub
            cur = row
            for x in range(bpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
        elif ft == 3:  # Average
            cur = row
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = row
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + _paeth(a, int(prev[x]), c)) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {ft} on row {y}")
        recon[y] = cur
        prev = recon[y]
    return recon


def decode_png(blob: bytes) -> np.ndarray:
    """Decode a PNG → (H, W, 3) uint8 RGB. Grayscale replicates to 3
    channels; indexed images resolve through PLTE; alpha channels
    drop (the featurization consumes RGB — compositing policy belongs
    to a deployment codec behind the ``decoder=`` contract). Raises
    NotImplementedError for interlaced / non-8-bit streams and
    ValueError for malformed ones."""
    if blob[:8] != _SIGNATURE:
        raise ValueError("not a PNG stream (bad signature)")
    pos = 8
    ihdr = None
    plte: np.ndarray | None = None
    idat = bytearray()
    while pos + 8 <= len(blob):
        length, ctype = struct.unpack_from(">I4s", blob, pos)
        data = blob[pos + 8: pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated chunk")
        crc = struct.unpack_from(">I", blob, pos + 8 + length)[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC on {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError("PLTE length not a multiple of 3")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(
            f"unknown compression/filter method ({comp}, {filt})"
        )
    if interlace != 0:
        raise NotImplementedError("Adam7 interlaced PNG not supported")
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} not supported (8 only)")
    if color_type not in _CHANNELS:
        raise ValueError(f"invalid color type {color_type}")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension image")
    ch = _CHANNELS[color_type]
    recon = _unfilter(zlib.decompress(bytes(idat)), h, w * ch, ch)
    px = recon.reshape(h, w, ch)
    if color_type == 2:
        return px
    if color_type == 6:
        return px[:, :, :3]
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # color_type 3: indexed
    if plte is None:
        raise ValueError("indexed PNG missing PLTE")
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= plte.shape[0]:
        raise ValueError("palette index out of range")
    return plte[idx]


def encode_png(pixels: np.ndarray, *, filter_type: int = 0) -> bytes:
    """Encode (H, W, 3) uint8 RGB or (H, W) grayscale as an 8-bit
    non-interlaced PNG, applying ``filter_type`` (0–4) to EVERY
    scanline — uniform filtering keeps the encoder small while
    letting tests round-trip each unfilter path individually."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError("pixels must be (H, W), (H, W, 1) or (H, W, 3)")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError("filter_type must be 0..4")
    h, w, ch = px.shape
    color_type = 0 if ch == 1 else 2
    flat = px.reshape(h, w * ch).astype(np.int64)
    prev = np.zeros(w * ch, dtype=np.int64)
    body = bytearray()
    for y in range(h):
        cur = flat[y]
        left = np.zeros_like(cur)
        left[ch:] = cur[:-ch]
        if filter_type == 0:
            out = cur
        elif filter_type == 1:
            out = cur - left
        elif filter_type == 2:
            out = cur - prev
        elif filter_type == 3:
            out = cur - ((left + prev) >> 1)
        else:
            ul = np.zeros_like(prev)
            ul[ch:] = prev[:-ch]
            out = cur.copy()
            for x in range(w * ch):
                out[x] = cur[x] - _paeth(int(left[x]), int(prev[x]),
                                         int(ul[x]))
        body.append(filter_type)
        body += (out & 0xFF).astype(np.uint8).tobytes()
        prev = cur

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(body), 6))
            + chunk(b"IEND", b""))


__all__ = ["decode_png", "encode_png"]
