"""Multimodal columns: image/audio as opaque binary + typed metadata.

The reference has no multimodal surface (its payloads are text lines,
SURVEY.md §1.1); this module is the training-data extension: assets
travel as a `binary` column, metadata passes stay JVM-side, and every
decode/transform stage is an Arrow-batched `mapInPandas` over real
container formats — 24-bit BMP, binary PPM/PGM, PCM WAV — decoded by
the dependency-free codecs in `llm.codecs` (no PIL/ffmpeg in this
container, and none needed for these formats).

`fake=True` keeps the deterministic byte-level stand-in (shape +
checksum derived from raw bytes) for plumbing tests and for formats
outside the codec set; the default `fake=False` path does REAL pixel /
sample work. Undecodable assets quarantine as null-feature rows by
default (`on_error="null"`) — at 100 TB a malformed asset must never
kill the job — or raise with `on_error="raise"`.

Schema convention for a multimodal asset column:
    asset: struct<data: binary, mime: string, width: int, height: int>

At 100 TB the binary payloads dominate partition sizing — callers
should repartition by size (`spark.sql.files.maxPartitionBytes` for
scans; explicit repartition before heavy decode) so one Arrow batch of
assets fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator
from struct import error as struct_error

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crane_spark.llm import codecs
from crane_spark.llm.codecs import DecodedAudio, DecodedImage

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("mime", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def _fake_decode(data: bytes) -> list[float]:
    """Deterministic byte-level stand-in: 4 moments of the byte
    histogram. Kept for plumbing tests and unsupported containers."""
    if not data:
        return [0.0, 0.0, 0.0, 0.0]
    n = float(len(data))
    s = float(sum(data))
    mean = s / n
    var = float(sum((b - mean) ** 2 for b in data)) / n
    return [n, mean, var, float(data[0])]


def _real_feature(data: bytes) -> list[float] | None:
    """Decode and featurize one asset; None for undecodable input.

    Feature layout (first element discriminates the modality):
      image: [0, width, height, channels, mean/255, std/255]
      audio: [1, n_frames, sample_rate, channels, rms, mean]
    """
    try:
        dec = codecs.decode_asset(data)
    except (ValueError, struct_error):
        return None
    if isinstance(dec, DecodedImage):
        px = dec.pixels.astype(np.float64) / 255.0
        return [
            0.0,
            float(dec.width),
            float(dec.height),
            float(dec.channels),
            float(px.mean()),
            float(px.std()),
        ]
    s = dec.samples
    return [
        1.0,
        float(dec.n_frames),
        float(dec.sample_rate),
        float(dec.channels),
        float(np.sqrt((s * s).mean())) if s.size else 0.0,
        float(s.mean()) if s.size else 0.0,
    ]


def extract_features(
    assets: DataFrame, fake: bool = False, on_error: str = "null"
) -> DataFrame:
    """Decode + featurize binary assets via Arrow-batched mapInPandas.

    Real path (default): BMP/PPM/PGM pixels and WAV samples are decoded
    by `llm.codecs` and summarized into a modality-tagged feature
    vector (see `_real_feature`). Undecodable bytes produce a
    null-feature row (`on_error="null"`, the quarantine-not-crash
    behavior a 100 TB scan needs) or raise (`on_error="raise"`).

    The UDF sees pandas batches (whole Arrow record batches, not rows);
    this is the pattern for any per-asset Python/native codec at scale.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def feat(d):
            d = d or b""
            if fake:
                return _fake_decode(d)
            f = _real_feature(d)
            if f is None and on_error == "raise":
                raise ValueError("undecodable asset (and on_error='raise')")
            return f

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["data"].map(lambda d: len(d) if d is not None else 0),
                    "checksum": pdf["data"].map(
                        lambda d: hashlib.md5(d or b"").hexdigest()
                    ),
                    "feature": pdf["data"].map(feat),
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(
    assets: DataFrame, every_n_bytes: int = 1024, fake: bool = False
) -> DataFrame:
    """Frame/sample extraction (UDTF-shaped: one asset row -> many
    frame rows). Real path: audio assets emit every N-th PCM frame
    (`frame_value` = first-channel 16-bit amplitude, `offset` = frame
    index); image assets emit every N-th pixel in row-major order
    (`frame_value` = 0-255 luminance, `offset` = pixel index). With
    fake=True the 'frame' is the raw byte at each sampled offset —
    the stride parameter keeps its name from that original byte-level
    semantics."""
    frame_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("frame_no", T.LongType()),
            T.StructField("offset", T.LongType()),
            T.StructField("frame_value", T.LongType()),
        ]
    )
    step = max(1, every_n_bytes)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                data = data or b""
                if fake:
                    for frame_no, off in enumerate(range(0, len(data), step)):
                        rows.append((int(aid), frame_no, off, int(data[off])))
                    continue
                try:
                    dec = codecs.decode_asset(data)
                except (ValueError, struct_error):
                    continue  # quarantine: no frames for bad assets
                if isinstance(dec, DecodedImage):
                    lum = dec.pixels.mean(axis=2).reshape(-1)
                    vals = lum[::step]
                else:
                    pcm = np.clip(
                        np.round(dec.samples[:, 0] * 32767.0), -32768, 32767
                    )
                    vals = pcm[::step]
                for frame_no, v in enumerate(vals):
                    rows.append((int(aid), frame_no, frame_no * step, int(v)))
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_no", "offset", "frame_value"]
            )

    return assets.mapInPandas(run, schema=frame_schema)


def asset_stats(assets: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass (no decode): size/mime distribution.
    This is the cheap pre-filter that runs BEFORE any decode at scale."""
    return (
        assets.select("mime", F.octet_length("data").cast("long").alias("n_bytes"))
        .groupBy("mime")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.min("n_bytes").alias("min_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("resized_bytes", T.LongType()),
    ]
)


def _resize_real(data: bytes, target_bytes: int) -> bytes:
    """Shrink one decoded asset to approximately `target_bytes`,
    re-encoded in its ORIGINAL container: images downscale by
    nearest-neighbor on the pixel grid, audio decimates frames.
    Already-small or undecodable assets pass through unchanged."""
    if len(data) <= target_bytes:
        return bytes(data)
    try:
        dec = codecs.decode_asset(data)
    except (ValueError, struct_error):
        return bytes(data)
    if isinstance(dec, DecodedImage):
        bytes_per_px = dec.channels  # 1 gray / 3 RGB, any container
        budget_px = max(1, (target_bytes - 64) // bytes_per_px)
        cur_px = dec.width * dec.height
        if cur_px <= budget_px:
            return bytes(data)
        scale = (budget_px / cur_px) ** 0.5
        nw = max(1, int(dec.width * scale))
        nh = max(1, int(dec.height * scale))
        ys = np.linspace(0, dec.height - 1, nh).round().astype(int)
        xs = np.linspace(0, dec.width - 1, nw).round().astype(int)
        dec.pixels = dec.pixels[ys][:, xs]
        return codecs.encode_like(dec)
    # audio: 16-bit frames; keep the same duration by decimation
    frame_bytes = 2 * dec.channels
    budget_frames = max(1, (target_bytes - 44) // frame_bytes)
    if dec.n_frames <= budget_frames:
        return bytes(data)
    idx = np.linspace(0, dec.n_frames - 1, budget_frames).round().astype(int)
    dec.samples = dec.samples[idx]
    return codecs.encode_like(dec)


def resize_assets(
    assets: DataFrame, target_bytes: int = 256, fake: bool = False
) -> DataFrame:
    """Resize/transcode: binary in -> (smaller) binary out, with
    before/after sizes as typed metadata. Real path: nearest-neighbor
    pixel-grid downscale for BMP/PPM/PGM, frame decimation for WAV,
    re-encoded in the same container so the output remains a valid
    decodable asset (round-trip tested). The fake path STRIDES raw
    bytes (content-dependent but not format-aware). Arrow-batched
    mapInPandas, binary-safe both directions."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def shrink(d):
            d = d or b""
            if not fake:
                return _resize_real(d, target_bytes)
            if len(d) <= target_bytes:
                return bytes(d)
            step = max(1, len(d) // target_bytes)
            return bytes(d[::step][:target_bytes])

        for pdf in batches:
            resized = pdf["data"].map(shrink)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": pdf["mime"],
                    "data": resized,
                    "orig_bytes": pdf["data"].map(
                        lambda d: len(d) if d is not None else 0
                    ),
                    "resized_bytes": resized.map(len),
                }
            )

    return assets.mapInPandas(run, schema=RESIZE_SCHEMA)
