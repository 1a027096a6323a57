"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side design is real and tested — typed schema, Arrow-batched
mapInPandas, partition-size control — while the codec step itself is
stubbed (no image/audio libraries in this container): `decode_image`
raises NotImplementedError unless `fake=True`, in which case a
deterministic fake "decode" (shape + checksum derived from the bytes)
stands in so the pipeline shape is exercised end-to-end.

Schema convention for a multimodal asset column:
    asset: struct<data: binary, mime: string, width: int, height: int>

At 100 TB the binary payloads dominate partition sizing — callers
should repartition by size (`spark.sql.files.maxPartitionBytes` for
scans; explicit repartition before heavy decode) so one Arrow batch of
assets fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    """Deterministic stand-in for a real decoder: 4 moments of the
    byte histogram. Replace with PIL/torchvision/ffmpeg at deploy."""
    if not data:
        return [0.0, 0.0, 0.0, 0.0]
    n = float(len(data))
    s = float(sum(data))
    mean = s / n
    var = float(sum((b - mean) ** 2 for b in data)) / n
    return [n, mean, var, float(data[0])]


def extract_features(assets: DataFrame, fake: bool = False) -> DataFrame:
    """Decode + featurize binary assets via Arrow-batched mapInPandas.

    The UDF sees pandas batches (whole Arrow record batches, not rows);
    at scale this is the pattern for any per-asset Python/native codec.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image/audio decode requires codec libraries not "
                    "present in this environment; pass fake=True for the "
                    "deterministic stand-in"
                )
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["data"].map(lambda d: len(d) if d is not None else 0),
                    "checksum": pdf["data"].map(
                        lambda d: hashlib.md5(d or b"").hexdigest()
                    ),
                    "feature": pdf["data"].map(lambda d: _fake_decode(d or b"")),
                }
            )
            yield out

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_n_bytes: int = 1024, fake: bool = False) -> DataFrame:
    """'Frame sampling' plumbing: emit one row per sampled offset of
    each asset (UDTF-shaped: one input row -> many output rows).
    With fake=True the 'frame' is the byte at each sampled offset."""
    frame_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("frame_no", T.LongType()),
            T.StructField("offset", T.LongType()),
            T.StructField("frame_value", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame decode not available; use fake=True")
            rows = []
            for aid, data in zip(pdf["asset_id"], pdf["data"]):
                data = data or b""
                for frame_no, off in enumerate(range(0, len(data), every_n_bytes)):
                    rows.append((int(aid), frame_no, off, int(data[off])))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_no", "offset", "frame_value"])

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


def resize_assets(
    assets: DataFrame, target_bytes: int = 256, fake: bool = False
) -> DataFrame:
    """Resize/transcode plumbing: binary in -> (smaller) binary out,
    with before/after sizes carried as typed metadata. The real op is
    PIL `Image.resize` / ffmpeg scale behind the same signature; the
    deterministic stand-in STRIDES the byte stream down to
    ``target_bytes`` (every k-th byte), which preserves the
    content-dependence tests need (two different inputs resize to two
    different outputs). Arrow-batched mapInPandas, binary-safe both
    directions — the round-trip every multimodal pipeline stage
    (decode -> transform -> re-encode) rides on."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image/video resize requires codec libraries not "
                    "present in this environment; pass fake=True"
                )

            def shrink(d):
                d = d or b""
                if len(d) <= target_bytes:
                    return bytes(d)
                step = max(1, len(d) // target_bytes)
                return bytes(d[::step][:target_bytes])

            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": pdf["mime"],
                    "data": pdf["data"].map(shrink),
                    "orig_bytes": pdf["data"].map(
                        lambda d: len(d) if d is not None else 0
                    ),
                    "resized_bytes": pdf["data"].map(
                        lambda d: len(shrink(d))
                    ),
                }
            )
            yield out

    return assets.mapInPandas(run, schema=RESIZE_SCHEMA)
