"""PNG codec — pure numpy + stdlib zlib, no PIL.

Together with the baseline JPEG codec (operators/jpeg.py) this closes the
compressed-image gap completely: the two formats that dominate web image
corpora both decode natively inside the mapInPandas stage. PNG is the
simpler half — DEFLATE (stdlib ``zlib``) over per-scanline filtered
bytes (ITU-T T.81's counterpart is ISO/IEC 15948 / RFC 2083).

Decoder (:func:`decode_png`)
    8-bit greyscale (type 0), truecolor (2), palette (3), grey+alpha (4)
    and RGBA (6); all five scanline filters (None/Sub/Up/Average/Paeth);
    multiple IDAT chunks; interlace 0 only (Adam7 raises — rare on the
    web and the PIL fallback picks it up when present). 16-bit depth
    raises (same fallback path). Output contract matches
    ``decode_image_array``: (H, W, 3) uint8 RGB, alpha composited over
    white the way corpus pipelines usually flatten it.

Encoder (:func:`encode_png`)
    8-bit RGB / greyscale, filter type 0 (None) scanlines, one IDAT,
    fixed zlib level 6 — deterministic bytes for golden pinning.

Filter inversion: None/Up are fully vectorized, Sub is a per-channel
cumulative sum; Average/Paeth genuinely recurse on the already-decoded
left neighbor, so those rows fall back to a scalar loop (rare in
encoder output mixes, and still far faster than the JPEG bit loop).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB or (H, W) grey -> PNG bytes (deterministic)."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    color_type = 0 if gray else 2
    raw = bytearray()
    flat = arr.reshape(h, -1)
    for row in flat:
        raw.append(0)  # filter type None
        raw += row.tobytes()
    out = bytearray(_SIG)
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type,
                                       0, 0, 0))
    out += _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
    out += _chunk(b"IEND", b"")
    return bytes(out)


def decode_png(content: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, 3) uint8 RGB (grey replicated, alpha
    composited over white)."""
    d = bytes(content)
    if d[:8] != _SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    trns = None
    while pos < len(d):
        (length,) = struct.unpack_from(">I", d, pos)
        tag = d[pos + 4:pos + 8]
        payload = d[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", payload)
            if depth != 8:
                raise NotImplementedError(f"{depth}-bit PNG")
            if interlace:
                raise NotImplementedError("Adam7 interlaced PNG")
            if comp or filt:
                raise ValueError("invalid compression/filter method")
            ihdr = (w, h, ctype)
        elif tag == b"PLTE":
            palette = np.frombuffer(payload, dtype=np.uint8) \
                .reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(payload, dtype=np.uint8)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("no IHDR chunk")
    w, h, ctype = ihdr
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if nch is None:
        raise NotImplementedError(f"PNG color type {ctype}")
    raw = zlib.decompress(bytes(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    data = rows[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = nch  # 8-bit depth -> bytes per pixel == channels
    for y in range(h):
        f = filters[y]
        line = data[y].copy()
        if f == 0:
            pass
        elif f == 1:  # Sub: per-channel cumulative sum mod 256
            cols = line.reshape(-1, bpp)
            line = ((np.cumsum(cols.astype(np.uint64), axis=0) & 0xFF)
                    .astype(np.uint8).reshape(-1))
        elif f == 2:  # Up
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif f == 3:  # Average
            for x in range(stride):
                left = int(line[x - bpp]) if x >= bpp else 0
                line[x] = (int(line[x])
                           + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else \
                    (b if pb <= pc else c)
                line[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {f}")
        out[y] = line
        prev = line
    px = out.reshape(h, w, nch)
    if ctype == 0:
        g = px[:, :, 0]
        return np.ascontiguousarray(np.stack([g, g, g], axis=-1))
    if ctype == 2:
        return np.ascontiguousarray(px)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        rgb = palette[px[:, :, 0]]
        if trns is not None:
            alpha = np.full(256, 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            a = alpha[px[:, :, 0]].astype(np.float64)[..., None] / 255.0
            rgb = np.round(rgb * a + 255.0 * (1 - a)).astype(np.uint8)
        return np.ascontiguousarray(rgb)
    if ctype == 4:
        g = px[:, :, 0].astype(np.float64)
        a = px[:, :, 1].astype(np.float64) / 255.0
        flat = np.round(g * a + 255.0 * (1 - a)).astype(np.uint8)
        return np.ascontiguousarray(np.stack([flat] * 3, axis=-1))
    # ctype == 6: RGBA over white
    rgb = px[:, :, :3].astype(np.float64)
    a = px[:, :, 3:4].astype(np.float64) / 255.0
    return np.round(rgb * a + 255.0 * (1 - a)).astype(np.uint8)
