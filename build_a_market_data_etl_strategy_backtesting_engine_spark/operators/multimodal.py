"""Multimodal columns: opaque binary payloads + typed metadata, processed by
Arrow-batched pandas UDFs over ``mapInPandas``.

Beyond-reference operators (SURVEY §7.6): images/audio/video ride as
``binary`` columns (MEDIA_SCHEMA in schemas.py); decode / feature-extract /
resize / frame-sample run as mapInPandas stages so each Arrow batch crosses
the Python boundary once.

The actual codec work is STUBBED in this container (no PIL/ffmpeg —
environment rule: no installs): ``decode_image`` raises
``NotImplementedError`` unless a decoder import succeeds, and
``fake_decode_stats`` provides a deterministic stand-in so the Spark-side
plumbing — schema, batching, partition sizing — is real and tested. On a
real cluster, swap the stub for PIL/torchvision inside the same UDF body.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = ("media_id long, kind string, n_bytes int, sha256 string, "
                 "width int, height int, feature_norm double")


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def decode_image(content: bytes) -> "object":
    """Real decode path — requires PIL, absent in this container."""
    Image = _try_import_pil()
    if Image is None:
        raise NotImplementedError(
            "image decode requires PIL/Pillow; not available in this "
            "environment — use fake_decode_stats for plumbing tests"
        )
    import io

    return Image.open(io.BytesIO(content))


def media_features(
    media: DataFrame,
    batch_size_hint: int = 256,
    use_real_decoder: bool = False,
) -> DataFrame:
    """Per-item features over the binary column via mapInPandas.

    Deterministic stub stats (size, sha256, a pseudo 'feature_norm' from the
    digest) keep the pipeline testable; ``use_real_decoder=True`` switches to
    the PIL path (raises here, by design). Partitioning note: binary rows are
    large — size ``spark.sql.files.maxPartitionBytes`` / repartition so an
    Arrow batch (~batch_size_hint rows) fits executor memory.
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(
                    lambda b: len(b) if b is not None else 0).astype("int32"),
                "sha256": pdf["content"].map(
                    lambda b: hashlib.sha256(b or b"").hexdigest()),
            })
            if use_real_decoder:
                imgs = pdf["content"].map(decode_image)  # raises w/o PIL
                out["width"] = imgs.map(lambda i: i.width).astype("int32")
                out["height"] = imgs.map(lambda i: i.height).astype("int32")
            else:
                out["width"] = pdf.get(
                    "width", pd.Series([None] * len(pdf))).astype("Int32")
                out["height"] = pdf.get(
                    "height", pd.Series([None] * len(pdf))).astype("Int32")
            # deterministic pseudo-embedding norm from the content digest
            out["feature_norm"] = out["sha256"].map(
                lambda h: int(h[:8], 16) / 0xFFFFFFFF)
            yield out

    return media.mapInPandas(_run, DECODE_SCHEMA)


RESIZE_SCHEMA = ("media_id long, kind string, content binary, width int, "
                 "height int, resized boolean")


def resize_images(
    media: DataFrame,
    target_width: int = 224,
    target_height: int = 224,
    use_real_decoder: bool = False,
) -> DataFrame:
    """Image resize stage via mapInPandas (the preprocessing step before
    feature extraction in a vision-training pipeline).

    Real path (``use_real_decoder=True``): PIL decode -> resize ->
    re-encode inside the UDF — raises in this container (no PIL, by rule).
    Stub path: passes the payload through untouched and stamps the target
    dims + ``resized`` flag, keeping the batch shape, schema, and binary
    round-trip through Arrow real (binary columns survive the Python
    boundary byte-exact — asserted in tests). Items already at target size
    are passed through with ``resized=false`` in both paths.
    """

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["kind"] == "image"
            at_size = (
                (pdf["width"] == target_width)
                & (pdf["height"] == target_height)
            ).fillna(False)
            if use_real_decoder:
                # PIL path: decode/resize/re-encode each image payload
                pdf["content"] = pdf.apply(
                    lambda r: _resize_one(
                        r["content"], target_width, target_height)
                    if r["kind"] == "image" else r["content"], axis=1)
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "content": pdf["content"],
                "width": pdf["width"].where(~is_img, target_width)
                .astype("Int32"),
                "height": pdf["height"].where(~is_img, target_height)
                .astype("Int32"),
                "resized": (is_img & ~at_size),
            })
            yield out

    return media.select(
        "media_id", "kind", "content", "width", "height"
    ).mapInPandas(_run, RESIZE_SCHEMA)


def _resize_one(content: bytes, w: int, h: int) -> bytes:
    """Real PIL decode->resize->PNG re-encode; raises without PIL."""
    img = decode_image(content)
    import io

    buf = io.BytesIO()
    img.resize((w, h)).save(buf, format="PNG")
    return buf.getvalue()


AUDIO_SCHEMA = ("media_id long, n_bytes int, n_samples int, "
                "duration_s double, rms double, peak double")


def audio_features(media: DataFrame, sample_rate: int = 16000) -> DataFrame:
    """Waveform features over raw PCM16 audio payloads — a REAL decode
    (unlike the stubbed image path): little-endian int16 PCM needs only
    numpy, so rms/peak/duration are computed from the actual bytes.

    mapInPandas keeps one Python crossing per Arrow batch; the numpy body
    is vectorized per item. Containerized formats (wav/mp3/flac) would
    strip headers in the same UDF body on a real cluster — the engine-side
    contract (binary column in, typed feature rows out) is unchanged.
    """
    import numpy as np

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(b or b"")
                raw = raw[: len(raw) - (len(raw) % 2)]
                a = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                a /= 32768.0
                n = len(a)
                feats.append((
                    mid, len(bytes(b or b"")), n, n / sample_rate,
                    float(np.sqrt(np.mean(a * a))) if n else 0.0,
                    float(np.max(np.abs(a))) if n else 0.0,
                ))
            yield pd.DataFrame(feats, columns=[
                "media_id", "n_bytes", "n_samples",
                "duration_s", "rms", "peak",
            ])

    return media.filter(F.col("kind") == "audio").mapInPandas(
        _run, AUDIO_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plan: explode (media_id, frame_ts_ms) rows from
    duration metadata — the shuffle-free fan-out that precedes per-frame
    decode. Pure expressions; the decode itself is the stubbed UDF above."""
    n_frames = F.greatest(
        (F.col("duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), n_frames - 1),
                        lambda i: i * every_ms)
        ).alias("frame_ts_ms"),
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes) for
    plumbing tests, conforming to MEDIA_SCHEMA."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(str(i).encode()).digest() * 8
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, bytearray(payload), f"fake/{kind}",
                     64, 48, 5000 if kind == "video" else None, {}))
    from build_a_market_data_etl_strategy_backtesting_engine_spark.schemas import (
        MEDIA_SCHEMA,
    )

    return spark.createDataFrame(rows, MEDIA_SCHEMA)
