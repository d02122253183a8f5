"""Pure-stdlib PNG codec: a REAL image decode lane with zero external
dependencies (``zlib`` + ``struct`` from the standard library, numpy for
the pixel math) — closing the ROADMAP "multimodal codecs stubbed"
limitation for the one format the container can always handle.

Scope: 8-bit, non-interlaced PNGs, color types 0 (gray), 2 (RGB),
4 (gray+alpha), 6 (RGBA); all five scanline filters (None/Sub/Up/
Average/Paeth) on both encode and decode. That covers every PNG this
repo synthesizes and the overwhelming majority of ML-pipeline PNGs;
anything else raises with a precise reason (never silently wrong).

Decode cost model: one zlib inflate per image + per-row numpy
unfiltering — Sub is a per-channel cumulative sum, Up/None are pure
vector adds; only Average/Paeth fall back to a per-pixel loop (their
reconstruction is inherently sequential in x AND depends on y). The
synthetic corpus uses filters 0-2 so the hot path stays vectorized.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filters=None) -> bytes:
    """Encode an (h, w) or (h, w, channels) uint8 array as a PNG.

    ``filters``: per-row filter ids (0-4), an int for all rows, or None
    for filter 0 everywhere. Exercising non-zero filters matters: a
    decoder that only ever sees filter 0 is untested where real encoders
    (which pick filters per row adaptively) actually live."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    if filters is None:
        filters = [0] * h
    elif isinstance(filters, int):
        filters = [filters] * h

    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.int32)
    for y in range(h):
        cur = px[y].astype(np.int32)
        f = filters[y]
        left = np.zeros_like(cur)
        left[1:] = cur[:-1]
        if f == 0:
            flt = cur
        elif f == 1:
            flt = cur - left
        elif f == 2:
            flt = cur - prev
        elif f == 3:
            flt = cur - (left + prev) // 2
        elif f == 4:
            upleft = np.zeros_like(prev)
            upleft[1:] = prev[:-1]
            flt = cur - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"bad filter {f}")
        raw.append(f)
        raw.extend((flt % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(blob: bytes) -> np.ndarray:
    """Decode PNG bytes to an (h, w, channels) uint8 array. Raises
    ValueError with the offending property for unsupported variants."""
    if blob[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("no IHDR chunk")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    if interlace:
        raise ValueError("interlaced PNGs unsupported")
    ch = _CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")

    out = np.zeros((h, w, ch), dtype=np.int32)
    prev = np.zeros((w, ch), dtype=np.int32)
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        f = row[0]
        cur = np.frombuffer(row[1:], np.uint8).astype(np.int32).reshape(w, ch)
        if f == 0:
            rec = cur
        elif f == 1:  # Sub: recon[x] = cur[x] + recon[x-1] -> cumsum
            rec = np.cumsum(cur, axis=0) % 256
        elif f == 2:  # Up
            rec = (cur + prev) % 256
        elif f in (3, 4):  # Average / Paeth: sequential in x
            rec = np.zeros_like(cur)
            for x in range(w):
                left = rec[x - 1] if x else np.zeros(ch, dtype=np.int32)
                up = prev[x]
                upleft = prev[x - 1] if x else np.zeros(ch, dtype=np.int32)
                if f == 3:
                    rec[x] = (cur[x] + (left + up) // 2) % 256
                else:
                    rec[x] = (cur[x] + _paeth(left, up, upleft)) % 256
        else:
            raise ValueError(f"bad filter byte {f} in row {y}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


# ---------------------------------------------------------------------------
# Deterministic synthetic corpus: pixel(x, y, c) is CLOSED-FORM in doc_id,
# so an external SQL oracle can recompute every decoded statistic by
# iterating the same formula — while the Spark side round-trips through
# REAL encoded PNG bytes. A decoder bug (filtering, stride, channel
# order) breaks the hash match; that is the point.

def synth_dims(doc_id: int) -> tuple[int, int, int, int, int]:
    """(w, h, a, b, c0) image parameters for a doc id."""
    return (
        8 + (doc_id * 7) % 25,
        8 + (doc_id * 11) % 25,
        (doc_id % 5) + 1,
        (doc_id % 7) + 1,
        doc_id % 256,
    )


def synth_pixels(doc_id: int) -> np.ndarray:
    """(h, w, 3) uint8: pixel(x,y,c) = (x*a + y*b + c0 + 37*c) % 256."""
    w, h, a, b, c0 = synth_dims(doc_id)
    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    return ((x * a + y * b + c0 + 37 * c) % 256).astype(np.uint8)


def synth_png(doc_id: int) -> bytes:
    """Encode the synthetic image with row-varying filters 0/1/2 (the
    vectorized decode paths all get exercised on every image)."""
    px = synth_pixels(doc_id)
    return encode_png(px, filters=[y % 3 for y in range(px.shape[0])])


def resize_nearest(px: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resize with the integer index map
    ``src = (dst * src_dim) // dst_dim`` — a pure-integer sampling rule
    an external SQL oracle can replay exactly (no float coordinate
    rounding to disagree about)."""
    h, w = px.shape[:2]
    xs = (np.arange(tw) * w) // tw
    ys = (np.arange(th) * h) // th
    return px[ys][:, xs]
