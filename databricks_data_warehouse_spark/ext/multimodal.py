"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, decoded/featurized through Arrow-batched ``mapInPandas``.

The image/audio libraries are not available in this environment, so the
DECODE step is a deterministic stand-in (clearly marked below); when a
real codec is importable it is used instead. Everything around the
decode — the binary column handling, the struct metadata schema, the
``mapInPandas`` batch iteration, the one-row-in/many-rows-out frame
sampling shape, and the ``array<float>`` feature output — is the real
production plumbing and is what the tests exercise.

Scale notes: payload bytes cross into Python as Arrow buffers (no
per-row pickling); metadata extraction is pure JVM column work so
filters on it (media_type, n_bytes) prune BEFORE any Python boundary;
frame sampling emits rows keyed by (doc, frame) — the layout a
downstream shuffle would want.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..queries._util import load

try:  # real decoder if the environment has one
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

_N_FEATURES = 8


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents re-cast as a media table: the text payload as an opaque
    ``binary`` column (stand-in for image/audio bytes) + media_type."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        # deterministic media-type assignment so type-pruning is testable
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
        .alias("media_type"),
    )


def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the binary column — pure JVM expressions
    (length, md5), so predicates on it never reach Python."""
    media = media_table(spark, sf_dir)
    return media.select(
        "doc_id",
        "media_type",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("checksum_md5"),
    )


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(FloatType()), True),
        # pooled statistic computed in float64 BEFORE the float32
        # narrowing of the feature vector (float32 round-trip would
        # diverge from any SQL oracle)
        StructField("feature_mean", DoubleType(), True),
    ]
)


def _decode_features(payload: bytes) -> list[float]:
    """DECODE STAND-IN. A real deployment decodes the payload (PIL /
    torchaudio / pyav) and pools pixels/samples into a feature vector.
    This deterministic fake keeps the identical signature and output
    shape: feature i = ((n_bytes * (i + 1)) % 256) / 255."""
    n = len(payload)
    return [float((n * (i + 1)) % 256) / 255.0 for i in range(_N_FEATURES)]


def decode_featurize(media: DataFrame) -> DataFrame:
    """Arrow-batched decode + featurize: one ``mapInPandas`` pass, one
    output row per input row, features as ``array<float>``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_decode_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len),
                    "features": feats,
                    "feature_mean": feats.map(lambda v: sum(v) / len(v)),
                }
            )

    return media.mapInPandas(run, _FEATURE_SCHEMA)


def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Featurization entry: stable scalar projection of the decoded
    features (mean rounded to 6dp) so the oracle can hash it."""
    feats = decode_featurize(media_table(spark, sf_dir))
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        (F.floor(F.col("feature_mean") * 1_000_000 + F.lit(0.5)) / 1_000_000).alias(
            "feature_mean"
        ),
    )


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("frame_idx", LongType(), True),
        StructField("byte_offset", LongType(), True),
        StructField("frame_checksum", StringType(), True),
    ]
)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling shape: one input row fans out to ``n_frames`` rows
    (byte-offset strided). The checksum hashes the payload slice a real
    decoder would hand to the model — computed here on the raw bytes.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "byte_offset": [], "frame_checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for i in range(n_frames):
                    off = (n * i) // n_frames
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["byte_offset"].append(off)
                    rows["frame_checksum"].append(
                        hashlib.md5(payload[off:] + str(i).encode()).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, _FRAME_SCHEMA)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling entry over the video subset (media_type pruning
    happens JVM-side before the Python boundary)."""
    media = media_table(spark, sf_dir).filter(F.col("media_type") == "video/mp4")
    return frame_sample(media, n_frames=4)
