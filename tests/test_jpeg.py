"""Baseline JPEG codec tests (operators/jpeg.py): roundtrip error bounds
per quality/sampling, restart markers, 16-bit DQT, grayscale, dispatch
integration, non-baseline rejection, and hypothesis properties."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
    jpeg,
    multimodal,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [xx * 255 / max(w - 1, 1), yy * 255 / max(h - 1, 1),
         (xx + yy) * 255 / max(h + w - 2, 1)], axis=-1
    ).astype(np.uint8)


def test_flat_color_roundtrips_exactly():
    img = np.full((16, 24, 3), (200, 30, 90), dtype=np.uint8)
    for sub in (False, True):
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 90, sub))
        assert dec.shape == img.shape
        assert np.array_equal(dec, img), f"subsample={sub}"


def test_gradient_error_bounds_by_quality():
    img = _gradient(37, 53)  # odd dims exercise edge padding
    for q, sub, bound in [(95, False, 4), (85, True, 10), (60, True, 16)]:
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, q, sub))
        err = np.abs(dec.astype(int) - img.astype(int)).max()
        assert err <= bound, (q, sub, err)


def test_all_sampling_modes_roundtrip():
    img = _gradient(41, 67)
    for mode in (False, True, "420", "422", "440"):
        dec = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 85, mode))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int)).max()
        assert err <= 12, (mode, err)


def test_grayscale_replicates_channels():
    g = _gradient(33, 29)[..., 0]
    dec = jpeg.decode_jpeg(jpeg.encode_jpeg(g, 90))
    assert dec.shape == (33, 29, 3)
    assert np.array_equal(dec[..., 0], dec[..., 1])
    assert np.array_equal(dec[..., 1], dec[..., 2])
    assert np.abs(dec[..., 0].astype(int) - g.astype(int)).max() <= 3


def test_restart_markers_do_not_change_pixels():
    img = _gradient(41, 67)
    base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 85, True))
    for ri in (1, 2, 3, 7):
        e = jpeg.encode_jpeg(img, 85, True, restart_interval=ri)
        assert b"\xff\xdd" in e  # DRI present
        assert np.array_equal(jpeg.decode_jpeg(e), base), ri


def test_encode_is_deterministic():
    img = _gradient(24, 24)
    assert jpeg.encode_jpeg(img, 85, True) == jpeg.encode_jpeg(img, 85, True)


def _widen_dqt_to_16bit(data: bytes) -> bytes:
    """Rewrite every 8-bit DQT segment as the 16-bit (Pq=1) form — the
    values are identical, so decode must be identical too."""
    out = bytearray()
    pos = 0
    while pos < len(data):
        if data[pos] == 0xFF and data[pos + 1] == 0xDB:
            (seglen,) = struct.unpack_from(">H", data, pos + 2)
            seg = data[pos + 4:pos + 2 + seglen]
            tq = seg[0] & 0x0F
            vals = seg[1:65]
            payload = bytes([0x10 | tq]) + b"".join(
                struct.pack(">H", v) for v in vals)
            out += b"\xff\xdb" + struct.pack(">H", 2 + len(payload))
            out += payload
            pos += 2 + seglen
        else:
            out.append(data[pos])
            pos += 1
    return bytes(out)


def test_16bit_dqt_parses_identically():
    img = _gradient(24, 40)
    e8 = jpeg.encode_jpeg(img, 85, True)
    e16 = _widen_dqt_to_16bit(e8)
    assert e16 != e8
    assert np.array_equal(jpeg.decode_jpeg(e16), jpeg.decode_jpeg(e8))


def test_sof2_with_baseline_scan_header_rejected():
    """Rewriting SOF0->SOF2 on baseline bytes yields a progressive frame
    whose single scan claims Ss=0..Se=63 — illegal per Annex G (a
    progressive scan may carry DC or AC, never both)."""
    e = bytearray(jpeg.encode_jpeg(_gradient(16, 16), 85, True))
    i = bytes(e).find(b"\xff\xc0")
    e[i + 1] = 0xC2
    with pytest.raises(ValueError, match="DC and AC"):
        jpeg.decode_jpeg(bytes(e))


def test_progressive_decode_matches_baseline_exactly():
    """Progressive and baseline encodes share the quantized coefficient
    stores, so their decodes must be bit-identical — this pins all four
    Annex-G scan kernels (DC/AC x first/refine) and EOBRUN."""
    rng = np.random.default_rng(42)
    for shape, sub in [((40, 56, 3), True), ((17, 23, 3), True),
                       ((24, 24, 3), "422"), ((33, 9, 3), "440"),
                       ((16, 16, 3), False)]:
        base = rng.integers(0, 256, (4, 4, 3))
        img = np.kron(base, np.ones((shape[0] // 4 + 1,
                                     shape[1] // 4 + 1, 1)))
        img = (img[:shape[0], :shape[1]] +
               rng.normal(0, 12, shape)).clip(0, 255).astype(np.uint8)
        for q in (60, 85, 95):
            d_base = jpeg.decode_jpeg(jpeg.encode_jpeg(img, q, sub))
            d_prog = jpeg.decode_jpeg(
                jpeg.encode_jpeg_progressive(img, q, sub))
            assert np.array_equal(d_base, d_prog), (shape, sub, q)


def test_progressive_grayscale_and_restart_markers():
    rng = np.random.default_rng(7)
    img = (np.kron(rng.integers(0, 256, (6, 6, 3)),
                   np.ones((8, 8, 1)))
           + rng.normal(0, 10, (48, 48, 3))).clip(0, 255).astype(np.uint8)
    ref = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 75))
    for ri in (1, 3, 5):
        got = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(img, 75, restart_interval=ri))
        assert np.array_equal(ref, got), ri
    g = img[..., 0]
    assert np.array_equal(
        jpeg.decode_jpeg(jpeg.encode_jpeg(g, 85)),
        jpeg.decode_jpeg(jpeg.encode_jpeg_progressive(g, 85)))


def test_progressive_custom_scan_scripts():
    """Spectral-selection-only (no refinement) and 3-level successive
    approximation scripts must reconstruct identically to baseline."""
    rng = np.random.default_rng(11)
    img = (np.kron(rng.integers(0, 256, (5, 7, 3)), np.ones((8, 8, 1)))
           + rng.normal(0, 8, (40, 56, 3))).clip(0, 255).astype(np.uint8)
    ref = jpeg.decode_jpeg(jpeg.encode_jpeg(img, 75))
    ss_only = [([0, 1, 2], 0, 0, 0, 0), ([0], 1, 63, 0, 0),
               ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0)]
    deep = [([0, 1, 2], 0, 0, 0, 2), ([0, 1, 2], 0, 0, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([0], 1, 63, 0, 3), ([0], 1, 63, 3, 2), ([0], 1, 63, 2, 1),
            ([0], 1, 63, 1, 0), ([1], 1, 63, 0, 0), ([2], 1, 63, 0, 0)]
    for script in (ss_only, deep):
        got = jpeg.decode_jpeg(
            jpeg.encode_jpeg_progressive(img, 75, scans=script))
        assert np.array_equal(ref, got)


def test_progressive_hypothesis_equivalence():
    pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=15, deadline=None)
    @given(h=st.integers(4, 40), w=st.integers(4, 40),
           seed=st.integers(0, 2**32 - 1),
           q=st.sampled_from([70, 85, 95]),
           sub=st.sampled_from([False, True, "422"]))
    def prop(h, w, seed, q, sub):
        rng = np.random.default_rng(seed)
        base = rng.integers(0, 256, (3, 3, 3)).astype(np.float64)
        img = np.clip(
            np.round(_bilinear_up(base, h, w)), 0, 255).astype(np.uint8)
        e = jpeg.encode_jpeg_progressive(img, q, sub)
        assert e == jpeg.encode_jpeg_progressive(img, q, sub)
        assert np.array_equal(
            jpeg.decode_jpeg(e),
            jpeg.decode_jpeg(jpeg.encode_jpeg(img, q, sub)))

    prop()


def test_non_jpeg_payload_raises_value_error():
    with pytest.raises(ValueError):
        jpeg.decode_jpeg(b"BM" + b"\x00" * 64)


def test_dispatch_decodes_jpeg_natively():
    """decode_image_array must route ff d8 payloads to the native
    baseline decoder (no PIL in this container)."""
    img = _gradient(19, 23)
    arr = multimodal.decode_image_array(jpeg.encode_jpeg(img, 90, False))
    assert arr.shape == img.shape
    assert np.abs(arr.astype(int) - img.astype(int)).max() <= 4


def test_resize_path_accepts_jpeg():
    img = _gradient(32, 32)
    arr = multimodal.decode_image_array(jpeg.encode_jpeg(img, 90, True))
    small = multimodal.resize_nearest(arr, 8, 8)
    assert small.shape == (8, 8, 3)


def test_hypothesis_roundtrip_bound():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        h=st.integers(4, 40), w=st.integers(4, 40),
        seed=st.integers(0, 2**32 - 1),
        q=st.sampled_from([70, 85, 95]),
        sub=st.sampled_from([False, True, "422"]),
    )
    def prop(h, w, seed, q, sub):
        rng = np.random.default_rng(seed)
        # smooth field: random low-res upsampled (JPEG's design domain —
        # white noise has unbounded quantization error by construction)
        base = rng.integers(0, 256, (3, 3, 3)).astype(np.float64)
        img = np.clip(
            np.round(_bilinear_up(base, h, w)), 0, 255).astype(np.uint8)
        e = jpeg.encode_jpeg(img, q, sub)
        assert e == jpeg.encode_jpeg(img, q, sub)  # deterministic
        dec = jpeg.decode_jpeg(e)
        assert dec.shape == (h, w, 3)
        # The ONLY loss in the codec is coefficient quantization, which
        # is deterministic — so decode(encode(x)) must EXACTLY equal the
        # simulated pad->DCT->quantize->dequantize->IDCT->upsample
        # pipeline (same float ops on both paths). This pins the entire
        # entropy/bit layer with zero tolerance; pointwise error vs the
        # ORIGINAL is legitimately large on noise content and is not a
        # codec property.
        assert np.array_equal(dec, _simulate(img, q, sub)), \
            (h, w, seed, q, sub)

    prop()


def _simulate(img: np.ndarray, q: int, sub) -> np.ndarray:
    """Reference reconstruction: the codec's own transform chain without
    the entropy layer (quantization is the only loss, so the full codec
    must reproduce this bit-for-bit)."""
    rgb = img.astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    fy, fx = {False: (1, 1), True: (2, 2), "422": (1, 2)}[sub]
    h0, w0 = img.shape[:2]
    ql = jpeg._quality_scale(jpeg.QT_LUMA, q)
    qc = jpeg._quality_scale(jpeg.QT_CHROMA, q)

    def chain(plane, qt, mh, mw):
        p = jpeg._pad_replicate(plane - 128.0, mh, mw)
        out = np.empty_like(p)
        for y0 in range(0, mh, 8):
            for x0 in range(0, mw, 8):
                c = jpeg.DCT_M @ p[y0:y0 + 8, x0:x0 + 8] @ jpeg.DCT_M.T
                qc_ = np.round(c / qt) * qt
                out[y0:y0 + 8, x0:x0 + 8] = \
                    jpeg.DCT_M.T @ qc_ @ jpeg.DCT_M
        return out + 128.0

    bh, bw = 8 * fy, 8 * fx  # MCU size
    mh, mw = -(-h0 // bh) * bh, -(-w0 // bw) * bw
    yr = chain(y, ql, mh, mw)
    if (fy, fx) == (1, 1):
        cbr = chain(cb, qc, mh, mw)
        crr = chain(cr, qc, mh, mw)
    else:
        cbd = jpeg._downsample(cb, fy, fx)
        crd = jpeg._downsample(cr, fy, fx)
        cbr = chain(cbd, qc, mh // fy, mw // fx)
        crr = chain(crd, qc, mh // fy, mw // fx)
        cbr = np.repeat(np.repeat(cbr, fy, axis=0), fx, axis=1)
        crr = np.repeat(np.repeat(crr, fy, axis=0), fx, axis=1)
    yr, cbr, crr = yr[:h0, :w0], cbr[:h0, :w0] - 128.0, \
        crr[:h0, :w0] - 128.0
    rr = yr + 1.402 * crr
    gg = yr - 0.344136 * cbr - 0.714136 * crr
    bb = yr + 1.772 * cbr
    out = np.stack([rr, gg, bb], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _bilinear_up(base: np.ndarray, h: int, w: int) -> np.ndarray:
    bh, bw = base.shape[1], base.shape[2]
    yi = np.linspace(0, bh - 1, h)
    xi = np.linspace(0, bw - 1, w)
    y0 = np.floor(yi).astype(int)
    x0 = np.floor(xi).astype(int)
    y1 = np.minimum(y0 + 1, bh - 1)
    x1 = np.minimum(x0 + 1, bw - 1)
    fy = (yi - y0)[:, None, None]
    fx = (xi - x0)[None, :, None]
    img = np.empty((h, w, 3))
    for c in range(3):
        p = base[c]
        img[..., c:c + 1] = (
            p[y0][:, x0, None] * (1 - fy) * (1 - fx)
            + p[y0][:, x1, None] * (1 - fy) * fx
            + p[y1][:, x0, None] * fy * (1 - fx)
            + p[y1][:, x1, None] * fy * fx
        )
    return img
