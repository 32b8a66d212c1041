"""PNG codec — pure numpy + stdlib zlib, no PIL.

Together with the baseline+progressive JPEG codec (operators/jpeg.py)
this closes the compressed-image gap completely: the two formats that
dominate web image corpora both decode natively inside the mapInPandas
stage. PNG is the simpler half — DEFLATE (stdlib ``zlib``) over
per-scanline filtered bytes (ISO/IEC 15948 / RFC 2083).

Decoder (:func:`decode_png`)
    All five color types (greyscale 0, truecolor 2, palette 3,
    grey+alpha 4, RGBA 6) at every legal bit depth (1/2/4/8/16), all
    five scanline filters (None/Sub/Up/Average/Paeth), multiple IDAT
    chunks, palette tRNS, and BOTH interlace methods — progressive
    Adam7 decodes natively (r5 "what's missing #2" residue closed; the
    seven sub-images unfilter independently and scatter into place).
    16-bit samples reduce to their high byte (the standard 8-bit
    presentation); sub-byte greys scale to full range. Output contract
    matches ``decode_image_array``: (H, W, 3) uint8 RGB, alpha
    composited over white the way corpus pipelines usually flatten it.

Encoder (:func:`encode_png`)
    8-bit RGB / greyscale (pass uint16 for 16-bit output), filter type 0
    scanlines, optional Adam7 interlaced layout (``interlace=True``) for
    decoder fixtures, one IDAT, fixed zlib level 6 — deterministic bytes
    for golden pinning.

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

# Adam7 pass layout: (x0, y0, dx, dy) per ISO 15948 §8.2
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _pass_dims(w: int, h: int, p) -> tuple[int, int]:
    x0, y0, dx, dy = p
    return (w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy


def encode_png(arr: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W, 3) RGB or (H, W) grey -> PNG bytes (deterministic).

    uint8 input writes depth 8; uint16 writes depth 16 (big-endian).
    ``interlace=True`` writes the Adam7 layout (filter 0 scanlines) —
    exists so the decoder's interlace path has native fixtures."""
    arr = np.asarray(arr)
    if arr.dtype == np.uint16:
        depth = 16
    else:
        arr = arr.astype(np.uint8)
        depth = 8
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    color_type = 0 if gray else 2
    a3 = arr.reshape(h, w, -1)

    def _rows(sub: np.ndarray) -> bytes:
        raw = bytearray()
        flat = sub.reshape(sub.shape[0], -1)
        for row in flat:
            raw.append(0)  # filter type None
            raw += (row.astype(">u2").tobytes() if depth == 16
                    else row.tobytes())
        return bytes(raw)

    if interlace:
        raw = bytearray()
        for p in _ADAM7:
            x0, y0, dx, dy = p
            sub = a3[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += _rows(sub)
        raw = bytes(raw)
    else:
        raw = _rows(a3)
    out = bytearray(_SIG)
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth,
                                       color_type, 0, 0,
                                       1 if interlace else 0))
    out += _chunk(b"IDAT", zlib.compress(raw, 6))
    out += _chunk(b"IEND", b"")
    return bytes(out)


def _unfilter(raw: bytes, off: int, hp: int, stride: int,
              bpp: int) -> tuple[int, np.ndarray]:
    """Invert the scanline filters of one (sub-)image: ``hp`` rows of
    ``stride`` filtered bytes each, ``bpp`` bytes per pixel (1 for
    sub-byte depths). Returns (new offset, (hp, stride) uint8)."""
    need = hp * (stride + 1)
    if off + need > len(raw):
        raise ValueError("PNG data length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8,
                         count=need, offset=off).reshape(hp, stride + 1)
    filters = rows[:, 0]
    data = rows[:, 1:]
    out = np.zeros((hp, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(hp):
        f = filters[y]
        line = data[y].copy()
        if f == 0:
            pass
        elif f == 1:  # Sub: per-channel cumulative sum mod 256
            pad = (-stride) % bpp
            if pad:
                line = np.concatenate(
                    [line, np.zeros(pad, dtype=np.uint8)])
            cols = line.reshape(-1, bpp)
            line = ((np.cumsum(cols.astype(np.uint64), axis=0) & 0xFF)
                    .astype(np.uint8).reshape(-1))[:stride]
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
    return off + need, out


def _samples(block: np.ndarray, wp: int, nch: int,
             depth: int) -> np.ndarray:
    """(hp, stride) unfiltered bytes -> (hp, wp, nch) raw samples
    (uint8 for depths <= 8, uint16 for 16)."""
    hp = block.shape[0]
    if depth == 8:
        return block[:, : wp * nch].reshape(hp, wp, nch)
    if depth == 16:
        b = block[:, : wp * nch * 2].reshape(hp, wp * nch, 2)
        return ((b[..., 0].astype(np.uint16) << 8)
                | b[..., 1]).reshape(hp, wp, nch)
    # sub-byte depths: only legal with one channel (grey / palette idx)
    bits = np.unpackbits(block, axis=1)[:, : wp * depth]
    vals = bits.reshape(hp, wp, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    return (vals * weights).sum(axis=2, dtype=np.uint16) \
        .astype(np.uint8).reshape(hp, wp, 1)


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
            if depth not in (1, 2, 4, 8, 16):
                raise ValueError(f"illegal PNG bit depth {depth}")
            if interlace not in (0, 1):
                raise ValueError(f"illegal interlace method {interlace}")
            if comp or filt:
                raise ValueError("invalid compression/filter method")
            ihdr = (w, h, depth, ctype, interlace)
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
    w, h, depth, ctype, interlace = ihdr
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if nch is None:
        raise NotImplementedError(f"PNG color type {ctype}")
    if depth < 8 and ctype not in (0, 3):
        raise ValueError(f"depth {depth} illegal for color type {ctype}")
    if depth == 16 and ctype == 3:
        raise ValueError("16-bit palette PNG is illegal")

    raw = zlib.decompress(bytes(idat))
    bpp = max(1, (nch * depth) // 8)
    img = np.zeros((h, w, nch),
                   dtype=np.uint16 if depth == 16 else np.uint8)
    passes = _ADAM7 if interlace else [(0, 0, 1, 1)]
    off = 0
    for p in passes:
        x0, y0, dx, dy = p
        wp, hp = _pass_dims(w, h, p)
        if wp == 0 or hp == 0:
            continue
        stride = (wp * nch * depth + 7) // 8
        off, block = _unfilter(raw, off, hp, stride, bpp)
        img[y0::dy, x0::dx] = _samples(block, wp, nch, depth)
    if off != len(raw):
        raise ValueError("PNG data length mismatch")

    # present raw samples at 8 bits: 16-bit -> high byte; sub-byte
    # greys scale to full range; palette indexes stay raw
    if depth == 16:
        px = (img >> 8).astype(np.uint8)
    elif depth < 8 and ctype == 0:
        px = (img.astype(np.uint16)
              * (255 // ((1 << depth) - 1))).astype(np.uint8)
    else:
        px = img.astype(np.uint8)

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
