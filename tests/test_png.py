"""PNG codec tests (operators/png.py): lossless roundtrip, every filter
type, every supported color type (grey, RGB, palette, grey+alpha, RGBA),
tRNS transparency, multi-IDAT, rejection paths, dispatch integration."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
    multimodal,
    png,
)


def _img(h=23, w=31):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([(xx * 9) % 256, (yy * 17) % 256, (xx * yy) % 256],
                    axis=-1).astype(np.uint8)


def _build(raw: bytes, w: int, h: int, ctype: int,
           extra_chunks=(), split_idat=False) -> bytes:
    """Assemble a PNG from pre-filtered scanline bytes."""
    out = bytearray(b"\x89PNG\r\n\x1a\n")

    def ch(tag, pl):
        return (struct.pack(">I", len(pl)) + tag + pl
                + struct.pack(">I", zlib.crc32(tag + pl) & 0xFFFFFFFF))

    out += ch(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
    for tag, pl in extra_chunks:
        out += ch(tag, pl)
    z = zlib.compress(raw)
    if split_idat:
        mid = len(z) // 2
        out += ch(b"IDAT", z[:mid]) + ch(b"IDAT", z[mid:])
    else:
        out += ch(b"IDAT", z)
    out += ch(b"IEND", b"")
    return bytes(out)


def _raw_scanlines(px: np.ndarray, ftype: int) -> bytes:
    """Forward-apply one filter type to every scanline."""
    h = px.shape[0]
    bpp = px.shape[2] if px.ndim == 3 else 1
    arr = px.reshape(h, -1).astype(np.int16)
    out = bytearray()
    prev = np.zeros(arr.shape[1], dtype=np.int16)
    for y in range(h):
        line = arr[y]
        res = np.empty_like(line)
        for x in range(len(line)):
            a = int(line[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else \
                    (b if pb <= pc else c)
            res[x] = (int(line[x]) - pred) & 0xFF
        out.append(ftype)
        out += (res & 0xFF).astype(np.uint8).tobytes()
        prev = line
    return bytes(out)


def test_rgb_roundtrip_is_lossless():
    img = _img()
    assert np.array_equal(png.decode_png(png.encode_png(img)), img)


def test_gray_roundtrip_replicates_channels():
    g = _img()[..., 0]
    dec = png.decode_png(png.encode_png(g))
    assert np.array_equal(dec[..., 0], g)
    assert np.array_equal(dec[..., 0], dec[..., 2])


def test_encode_is_deterministic():
    img = _img()
    assert png.encode_png(img) == png.encode_png(img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_every_filter_type_decodes(ftype):
    img = _img()
    data = _build(_raw_scanlines(img, ftype), img.shape[1],
                  img.shape[0], 2)
    assert np.array_equal(png.decode_png(data), img), ftype


def test_mixed_filters_and_multi_idat():
    img = _img(16, 16)
    h = 16
    # mixed filters need the running prev row, so apply the row-cycling
    # filter types in one sequential pass:
    arr = img.reshape(h, -1).astype(np.int16)
    bpp = 3
    out = bytearray()
    prev = np.zeros(arr.shape[1], dtype=np.int16)
    for y in range(h):
        ft = y % 5
        line = arr[y]
        res = np.empty_like(line)
        for x in range(len(line)):
            a = int(line[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            pred = [0, a, b, (a + b) >> 1, None][ft]
            if pred is None:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else \
                    (b if pb <= pc else c)
            res[x] = (int(line[x]) - pred) & 0xFF
        out.append(ft)
        out += (res & 0xFF).astype(np.uint8).tobytes()
        prev = line
    data = _build(bytes(out), 16, 16, 2, split_idat=True)
    assert np.array_equal(png.decode_png(data), img)


def test_palette_color_type():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]],
                   dtype=np.uint8)
    idx = (np.arange(48).reshape(6, 8) % 4).astype(np.uint8)
    raw = bytearray()
    for row in idx:
        raw.append(0)
        raw += row.tobytes()
    data = _build(bytes(raw), 8, 6, 3,
                  extra_chunks=[(b"PLTE", pal.tobytes())])
    assert np.array_equal(png.decode_png(data), pal[idx])


def test_palette_trns_composites_over_white():
    pal = np.array([[200, 0, 0], [0, 200, 0]], dtype=np.uint8)
    idx = np.array([[0, 1]], dtype=np.uint8)
    raw = b"\x00" + idx.tobytes()
    data = _build(raw, 2, 1, 3,
                  extra_chunks=[(b"PLTE", pal.tobytes()),
                                (b"tRNS", bytes([0]))])  # idx0 invisible
    dec = png.decode_png(data)
    assert tuple(dec[0, 0]) == (255, 255, 255)  # fully transparent
    assert tuple(dec[0, 1]) == (0, 200, 0)      # opaque (no tRNS entry)


def test_rgba_composites_over_white():
    px = np.zeros((1, 2, 4), dtype=np.uint8)
    px[0, 0] = (100, 150, 200, 255)
    px[0, 1] = (100, 150, 200, 0)
    raw = b"\x00" + px.tobytes()
    dec = png.decode_png(_build(raw, 2, 1, 6))
    assert tuple(dec[0, 0]) == (100, 150, 200)
    assert tuple(dec[0, 1]) == (255, 255, 255)


def test_gray_alpha_composites_over_white():
    px = np.array([[[100, 128]]], dtype=np.uint8)  # 50.2% alpha
    dec = png.decode_png(_build(b"\x00" + px.tobytes(), 1, 1, 4))
    v = dec[0, 0, 0]
    assert dec[0, 0, 1] == v and dec[0, 0, 2] == v
    assert abs(int(v) - round(100 * 128 / 255 + 255 * 127 / 255)) <= 1


def test_corrupt_depth_or_interlace_flag_raises():
    """Patching IHDR to claim a different depth/interlace than the data
    carries must fail loudly (length mismatch), not mis-decode."""
    img = _img(4, 4)
    good = png.encode_png(img)
    bad_depth = bytearray(good)
    bad_depth[24] = 16  # IHDR depth byte
    with pytest.raises(ValueError):
        png.decode_png(bytes(bad_depth))
    bad_il = bytearray(good)
    bad_il[28] = 1  # interlace flag without Adam7 layout
    with pytest.raises(ValueError):
        png.decode_png(bytes(bad_il))


def test_adam7_interlace_roundtrips_exactly():
    rng = np.random.default_rng(3)
    for shape in [(1, 1, 3), (7, 5, 3), (8, 8, 3), (17, 23, 3), (3, 9)]:
        arr = rng.integers(0, 256, shape).astype(np.uint8)
        dec = png.decode_png(png.encode_png(arr, interlace=True))
        exp = arr if arr.ndim == 3 else np.stack([arr] * 3, -1)
        assert np.array_equal(dec, exp), shape


def test_16bit_decodes_to_high_byte():
    rng = np.random.default_rng(4)
    arr16 = rng.integers(0, 65536, (9, 13, 3)).astype(np.uint16)
    dec = png.decode_png(png.encode_png(arr16))
    assert np.array_equal(dec, (arr16 >> 8).astype(np.uint8))
    g16 = rng.integers(0, 65536, (6, 4)).astype(np.uint16)
    dec = png.decode_png(png.encode_png(g16, interlace=True))
    assert np.array_equal(dec[..., 0], (g16 >> 8).astype(np.uint8))


def _hand_chunk(tag, payload):
    import struct
    import zlib

    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def test_sub_byte_depths_decode():
    """4-bit palette and 1-bit grey PNGs (web icons) — hand-built files
    since the encoder writes 8/16 only."""
    import struct
    import zlib

    w, h, depth = 5, 3, 4
    idx = np.array([[0, 1, 2, 3, 4], [5, 4, 3, 2, 1], [0, 0, 5, 5, 3]],
                   dtype=np.uint8)
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30],
                    [200, 200, 200], [1, 2, 3]], dtype=np.uint8)
    raw = bytearray()
    for row in idx:
        raw.append(0)
        packed = np.zeros((w * depth + 7) // 8, dtype=np.uint8)
        for i, v in enumerate(row):
            packed[i // 2] |= v << (4 if i % 2 == 0 else 0)
        raw += packed.tobytes()
    data = (b"\x89PNG\r\n\x1a\n"
            + _hand_chunk(b"IHDR", struct.pack(
                ">IIBBBBB", w, h, depth, 3, 0, 0, 0))
            + _hand_chunk(b"PLTE", pal.tobytes())
            + _hand_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _hand_chunk(b"IEND", b""))
    assert np.array_equal(png.decode_png(data), pal[idx])

    bits = np.array([[1, 0, 1, 1, 0, 0, 1, 0, 1, 1],
                     [0, 1, 0, 0, 1, 1, 0, 1, 0, 0]], dtype=np.uint8)
    raw = bytearray()
    for row in bits:
        raw.append(0)
        raw += np.packbits(row).tobytes()
    data = (b"\x89PNG\r\n\x1a\n"
            + _hand_chunk(b"IHDR", struct.pack(
                ">IIBBBBB", 10, 2, 1, 0, 0, 0, 0))
            + _hand_chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _hand_chunk(b"IEND", b""))
    assert np.array_equal(png.decode_png(data)[..., 0], bits * 255)


def test_non_png_raises_value_error():
    with pytest.raises(ValueError):
        png.decode_png(b"not a png at all....")


def test_dispatch_decodes_png_natively():
    img = _img(12, 12)
    arr = multimodal.decode_image_array(png.encode_png(img))
    assert np.array_equal(arr, img)
