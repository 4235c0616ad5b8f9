"""Multimodal columns: images/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas``.

Beyond-reference layer (BASELINE.json): the Spark-side plumbing —
schema, partition-preserving mapInPandas, batch shapes — is real and
tested; the codec step is stubbed (this container ships no image/audio
libraries) behind ``try: import PIL`` with a deterministic fallback
feature extractor, so swapping in a real decoder changes ONE function.

Scale posture: payload bytes never leave the executor (mapInPandas is
per-partition), metadata-only plans prune the binary column at the
parquet scan, and batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table: payload = repeated sha256
    stream seeded by media_id (stable across runs/partitionings)."""
    rows = []
    for i in range(n):
        seed = hashlib.sha256(f"media-{i}".encode()).digest()
        payload = (seed * ((i % 7) + 1))[: 64 + (i * 13) % 512]
        kind = ("image", "audio", "video")[i % 3]
        rows.append((i, kind, bytearray(payload), f"application/x-fake-{kind}", len(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_real(payload: bytes) -> tuple[int, int, list[float]]:
    """The real codec hook. Swap this for PIL/librosa/ffmpeg when the
    runtime ships them."""
    raise NotImplementedError("no media codecs in this container")


def _decode_fake(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in decode: 'dimensions' and an 8-dim feature
    derived purely from the bytes — stable for tests and benchmarks.
    md5-based so an ANSI-SQL oracle can recompute the dimensions
    (DuckDB ships md5 but no sha1) — the mapInPandas output itself
    sits under the driver's value-hash gate (plans/media_stream.py
    ``mm_features``)."""
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    feature = [round(b / 255.0, 6) for b in h[2:10]]
    return width, height, feature


try:  # pragma: no cover - codec libs absent in this container
    import PIL  # noqa: F401

    _decode = _decode_real
except ImportError:
    _decode = _decode_fake


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + featurize every payload, Arrow batch at a time."""
    from ..session import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["n_bytes"],
                "sha1": [hashlib.sha1(bytes(p)).hexdigest() for p in pdf["payload"]],
            }
            dims = [_decode(bytes(p)) for p in pdf["payload"]]
            out["width"] = pd.array([d[0] for d in dims], dtype="int32")
            out["height"] = pd.array([d[1] for d in dims], dtype="int32")
            out["feature"] = [d[2] for d in dims]
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("resized_bytes", T.LongType()),
        T.StructField("resized_md5", T.StringType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
    ]
)


def resize(media: DataFrame, factor: int = 2) -> DataFrame:
    """'Resize' image payloads by stride-``factor`` byte sampling — the
    shape of a real downsample (payload in, smaller payload + scaled
    dims out), with the pixel resampler stubbed to a byte slice like
    ``_decode``. Runs per Arrow batch inside ``mapInPandas``; payload
    bytes never reach the driver, and the output carries only the
    resized content hash + metadata, so downstream plans stay narrow.
    Swap the slice for a PIL ``Image.resize`` when codecs ship."""
    from ..session import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            originals = [bytes(p) for p in pdf["payload"]]
            resized = [p[::factor] for p in originals]
            dims = [_decode(p) for p in originals]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "resized_bytes": [len(p) for p in resized],
                    "resized_md5": [
                        hashlib.md5(p).hexdigest() for p in resized
                    ],
                    "new_width": pd.array(
                        [max(d[0] // factor, 1) for d in dims], dtype="int32"
                    ),
                    "new_height": pd.array(
                        [max(d[1] // factor, 1) for d in dims], dtype="int32"
                    ),
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, RESIZE_SCHEMA
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' for video payloads: one row per sampled offset
    (explode of byte offsets — the shape of real frame extraction,
    with the codec stubbed to a byte slice)."""
    video = media.filter(F.col("kind") == "video")
    offsets = F.sequence(
        F.lit(0),
        F.greatest(F.col("n_bytes") - 1, F.lit(0)),
        F.lit(every_n_bytes),
    )
    return video.select(
        "media_id",
        F.explode(offsets).alias("frame_offset"),
        F.substring(F.col("payload"), F.col("frame_offset") + 1, 8).alias("frame_bytes"),
    )


AUDIO_WINDOWS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("win_idx", T.IntegerType()),
        T.StructField("energy", T.LongType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def audio_windows(
    media: DataFrame, window_bytes: int = 16, center: int = 80
) -> DataFrame:
    """Frame-windowed energy/peak over audio payloads: treat the
    payload as 8-bit PCM samples, cut fixed windows, emit per-window
    energy = sum((sample - center)^2) and peak = max(|sample -
    center|) — the shape of a real audio feature pass (RMS/VAD
    framing), with the decoder stubbed to raw-byte samples. Runs per
    Arrow batch inside ``mapInPandas`` (numpy reshape + integer sums);
    payload bytes never reach the driver. Swap the frombuffer for a
    soundfile/librosa decode when codecs ship — the framing, schema,
    and batch shape stay identical."""
    from ..session import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, wins, energies, peaks = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                    np.int64
                )
                n_win = len(samples) // window_bytes
                dev = samples[: n_win * window_bytes].reshape(
                    n_win, window_bytes
                ) - center
                ids.extend([mid] * n_win)
                wins.extend(range(n_win))
                energies.extend((dev * dev).sum(axis=1).tolist())
                peaks.extend(np.abs(dev).max(axis=1).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "win_idx": pd.array(wins, dtype="int32"),
                    "energy": pd.array(energies, dtype="int64"),
                    "peak": pd.array(peaks, dtype="int32"),
                }
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, AUDIO_WINDOWS_SCHEMA
    )
