"""Foreign-codec fixtures: the native JPEG/PNG kernels vs javax.imageio.

r6/r7 VERDICT top correctness risk: progressive JPEG (T.81 Annex G) and
Adam7 PNG were validated only by self-roundtrip against the repo's own
encoders — a *symmetric* misunderstanding of the wire format (EOBRUN,
refinement bits, interlace pass layout) would decode the repo's own
files fine and every foreign file wrong, silently under
``prefer="native"``. These fixtures were produced by OpenJDK 17's
javax.imageio (an independent public T.81 / RFC 2083 implementation;
generator: tools/gen_foreign_fixtures.py + tools/ForeignCodec.java) and
close the gap in BOTH directions:

* decode direction — ImageIO-encoded progressive/baseline JPEGs must
  decode natively to ImageIO's own pixel reading (tolerance: JPEG
  permits per-sample IDCT rounding differences between conforming
  decoders; the observed max is asserted tight).
* encode direction — ImageIO's readings of the repo encoders' output
  (progressive JPEG, Adam7 PNG, BMP) are committed and pinned. PNG and
  BMP are lossless, so those comparisons are byte-exact.

A live-JDK test re-runs the whole loop at a different quality when
``java`` is on PATH (it is in this container), so the committed dumps
can't drift from what ImageIO actually says.
"""
from __future__ import annotations

import pathlib
import shutil
import struct
import subprocess

import numpy as np
import pytest

from build_a_market_data_etl_strategy_backtesting_engine_spark.operators import (
    jpeg,
    multimodal,
    png,
)

FIXDIR = pathlib.Path(__file__).resolve().parent / "fixtures" / "foreign"
REPO = pathlib.Path(__file__).resolve().parent.parent


def foreign_pattern(h: int = 48, w: int = 64) -> np.ndarray:
    """Deterministic RGB test card: smooth gradients (DC/low-frequency
    progressive scans), an 8px checker (mid-frequency), and LCG noise
    (high-frequency AC + successive-approximation refinement bits all
    the way down) — chosen so every Annex-G scan kind carries data."""
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255) // max(w - 1, 1)
    g = (yy * 255) // max(h - 1, 1)
    b = ((xx // 8 + yy // 8) % 2) * 200
    state = np.uint64(0x9E3779B97F4A7C15)
    lcg = np.empty(h * w, dtype=np.uint64)
    for i in range(h * w):
        state = np.uint64(
            (int(state) * 6364136223846793005 + 1442695040888963407)
            & 0xFFFFFFFFFFFFFFFF)
        lcg[i] = state
    noise = (lcg >> np.uint64(33)).astype(np.int64) % 64
    arr = np.stack([r, g, b], axis=-1).astype(np.int64)
    arr += noise.reshape(h, w, 1) - 32
    return np.clip(arr, 0, 255).astype(np.uint8)


def read_raw(path: pathlib.Path) -> np.ndarray:
    buf = path.read_bytes()
    w, h = struct.unpack(">ii", buf[:8])
    return (np.frombuffer(buf, dtype=np.uint8, offset=8)
            .reshape(h, w, 3).copy())


def _fixture(name: str) -> pathlib.Path:
    p = FIXDIR / name
    assert p.exists(), (
        f"missing committed fixture {p}; regenerate with "
        f"python3 tools/gen_foreign_fixtures.py (needs a JDK)")
    return p


def _assert_rgb_tight(ours: np.ndarray, theirs: np.ndarray) -> None:
    """4:4:4 comparison: no chroma upsampling is involved, so any delta
    is IDCT/rounding only. A wire-format bug corrupts whole 8x8 blocks
    (>=64 samples massively wrong), which the distribution bounds kill:
    observed vs OpenJDK 17 at generation: max 6, 99.6% of samples <=1."""
    assert ours.shape == theirs.shape
    d = np.abs(ours.astype(np.int64) - theirs.astype(np.int64))
    assert d.max() <= 8, f"max|diff|={d.max()}"
    assert np.quantile(d, 0.99) <= 1, f"p99={np.quantile(d, 0.99)}"
    assert d.mean() < 0.5, f"mean={d.mean():.3f}"


def _assert_luma_tight(ours: np.ndarray, theirs: np.ndarray) -> None:
    """4:2:0 comparison: T.81 leaves the chroma upsampling FILTER to the
    decoder (ImageIO/libjpeg: triangle; native kernel: box), so chroma
    legitimately differs at color edges — but recomputed luma must agree
    to rounding, and luma is where the interleaved-MCU progressive scans
    live. Observed: Y max 5.2 (saturation crosstalk), mean 0.46."""
    assert ours.shape == theirs.shape

    def luma(a):
        a = a.astype(np.float64)
        return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]

    d = np.abs(luma(ours) - luma(theirs))
    assert d.max() <= 10, f"luma max|diff|={d.max():.2f}"
    # p99 4: observed 3.25 at q=0.7 (coarser quant -> more saturation
    # crosstalk); block-level wire corruption lands in the tens.
    assert np.quantile(d, 0.99) <= 4, f"luma p99={np.quantile(d, 0.99):.2f}"
    assert d.mean() < 1.0, f"luma mean={d.mean():.3f}"


# ------------------------------------------------------------------ decode
# foreign bitstream -> native kernels


def test_foreign_prog444_jpeg_decodes_to_imageio_pixels():
    ours = jpeg.decode_jpeg(_fixture("imageio_prog444.jpg").read_bytes())
    theirs = read_raw(_fixture("imageio_prog444.raw"))
    assert ours.shape == (48, 64, 3)
    _assert_rgb_tight(ours, theirs)


def test_foreign_progressive_420_jpeg_luma_matches_imageio():
    ours = jpeg.decode_jpeg(_fixture("imageio_progressive.jpg").read_bytes())
    theirs = read_raw(_fixture("imageio_progressive.raw"))
    _assert_luma_tight(ours, theirs)


def _assert_rgb_tight_420(ours: np.ndarray, theirs: np.ndarray) -> None:
    """4:2:0 with ``upsample="triangle"``: the chroma filter now matches
    libjpeg/ImageIO, so the comparison is tight in FULL RGB (r8 VERDICT
    #4). Observed vs the committed OpenJDK dumps: max 8, p99 2,
    mean 0.41 (box upsampling reads mean 8.1, p99 58 on the same card —
    the filter, not the wire format, was the whole gap)."""
    assert ours.shape == theirs.shape
    d = np.abs(ours.astype(np.int64) - theirs.astype(np.int64))
    assert d.max() <= 8, f"max|diff|={d.max()}"
    assert np.quantile(d, 0.99) <= 2, f"p99={np.quantile(d, 0.99)}"
    assert d.mean() < 0.5, f"mean={d.mean():.3f}"


def test_foreign_progressive_420_rgb_tight_with_triangle_upsample():
    ours = jpeg.decode_jpeg(
        _fixture("imageio_progressive.jpg").read_bytes(),
        upsample="triangle")
    _assert_rgb_tight_420(ours, read_raw(_fixture("imageio_progressive.raw")))


def test_foreign_baseline_420_rgb_tight_with_triangle_upsample():
    ours = jpeg.decode_jpeg(
        _fixture("imageio_baseline.jpg").read_bytes(),
        upsample="triangle")
    _assert_rgb_tight_420(ours, read_raw(_fixture("imageio_baseline.raw")))


def test_box_stays_default_and_444_unaffected_by_triangle():
    """Goldens pin box outputs — the default must stay box; on 4:4:4
    there is no upsampling, so the modes must agree bit-exactly."""
    payload = _fixture("imageio_prog444.jpg").read_bytes()
    assert np.array_equal(
        jpeg.decode_jpeg(payload),
        jpeg.decode_jpeg(payload, upsample="box"))
    assert np.array_equal(
        jpeg.decode_jpeg(payload),
        jpeg.decode_jpeg(payload, upsample="triangle"))
    with pytest.raises(ValueError, match="expected 'box' or 'triangle'"):
        jpeg.decode_jpeg(_fixture("imageio_baseline.jpg").read_bytes(),
                         upsample="bilinear")


def test_foreign_baseline_420_jpeg_luma_matches_imageio():
    ours = jpeg.decode_jpeg(_fixture("imageio_baseline.jpg").read_bytes())
    theirs = read_raw(_fixture("imageio_baseline.raw"))
    _assert_luma_tight(ours, theirs)


def test_foreign_progressive_matches_source_within_q85_loss():
    """Sanity anchor independent of BOTH decoders: the decoded foreign
    file must resemble the original pattern within quality-85 loss."""
    ours = jpeg.decode_jpeg(_fixture("imageio_progressive.jpg").read_bytes())
    src = foreign_pattern()
    d = np.abs(ours.astype(np.int64) - src.astype(np.int64))
    assert d.mean() < 12.0  # lossy, but nowhere near garbage


def test_dispatch_decodes_foreign_progressive_natively():
    out = multimodal.decode_image_array(
        _fixture("imageio_progressive.jpg").read_bytes(), prefer="native")
    assert out.shape == (48, 64, 3)


# ------------------------------------------------------------------ encode
# native encoder output -> foreign decoder (pinned ImageIO readings)


def test_my_progressive_jpeg_bytes_are_pinned():
    """The committed bitstreams are exactly what the encoder emits today —
    so the ImageIO readings alongside them stay valid foreign witnesses."""
    assert (jpeg.encode_jpeg_progressive(foreign_pattern(), 85)
            == _fixture("my_progressive.jpg").read_bytes())
    assert (jpeg.encode_jpeg_progressive(foreign_pattern(), 85,
                                         subsample=False)
            == _fixture("my_prog444.jpg").read_bytes())


def test_imageio_reads_my_prog444_jpeg_as_my_decoder_does():
    blob = _fixture("my_prog444.jpg").read_bytes()
    _assert_rgb_tight(jpeg.decode_jpeg(blob),
                      read_raw(_fixture("my_prog444.raw")))


def test_imageio_reads_my_progressive_420_jpeg_in_luma():
    blob = _fixture("my_progressive.jpg").read_bytes()
    _assert_luma_tight(jpeg.decode_jpeg(blob),
                       read_raw(_fixture("my_progressive.raw")))


def test_my_adam7_png_bytes_are_pinned():
    regenerated = png.encode_png(foreign_pattern(), interlace=True)
    assert regenerated == _fixture("my_adam7.png").read_bytes()


def test_imageio_reads_my_adam7_png_byte_exactly():
    """PNG is lossless: a foreign decoder's reading of the repo's Adam7
    output must equal the repo decoder's reading EXACTLY — this is the
    assertion that kills any symmetric interlace-layout misunderstanding."""
    blob = _fixture("my_adam7.png").read_bytes()
    ours = png.decode_png(blob)
    theirs = read_raw(_fixture("my_adam7.raw"))
    assert np.array_equal(ours, theirs)
    assert np.array_equal(ours, foreign_pattern())  # and both == source


def test_source_bmp_pinned_and_roundtrips():
    blob = _fixture("source.bmp").read_bytes()
    assert blob == multimodal.encode_bmp(foreign_pattern())
    assert np.array_equal(multimodal.decode_bmp(blob), foreign_pattern())


# --------------------------------------------------------------- live JDK


@pytest.mark.skipif(shutil.which("java") is None, reason="no JDK on PATH")
def test_live_imageio_loop_fresh_quality(tmp_path):
    """Re-run the whole foreign loop at q=0.7 (different quant tables,
    different scan data than the committed fixtures) so the pinned dumps
    can't mask a regression that only shows on other bitstreams."""
    arr = foreign_pattern(40, 56)
    src = tmp_path / "src.bmp"
    src.write_bytes(multimodal.encode_bmp(arr))
    tool = str(REPO / "tools" / "ForeignCodec.java")

    for samp, check in (("444", _assert_rgb_tight),
                        ("420", _assert_luma_tight)):
        jpg = tmp_path / f"prog{samp}.jpg"
        subprocess.run(["java", tool, "encode", str(src), str(jpg),
                        "0.7", "1", samp], check=True, capture_output=True)
        raw = tmp_path / f"prog{samp}.raw"
        subprocess.run(["java", tool, "decode", str(jpg), str(raw)],
                       check=True, capture_output=True)
        check(jpeg.decode_jpeg(jpg.read_bytes()), read_raw(raw))

    mine = tmp_path / "mine.png"
    mine.write_bytes(png.encode_png(arr, interlace=True))
    raw2 = tmp_path / "mine.raw"
    subprocess.run(["java", tool, "decode", str(mine), str(raw2)],
                   check=True, capture_output=True)
    assert np.array_equal(read_raw(raw2), arr)
