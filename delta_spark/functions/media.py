"""Multimodal columns: image/audio/video as opaque ``binary`` with
typed metadata; decode / feature-extract as Arrow-batched pandas UDFs
over ``mapInPandas``.

The container ships no image/audio libraries, so the decode step is a
clearly marked deterministic STUB (`_fake_decode`); the Spark-side
plumbing — schema, batch iteration, partitioning, UDF signatures — is
real and tested. Swapping in PIL/librosa is a one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.StringType(), True),  # JSON sidecar
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def synth_media_from_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media: the text's bytes become the binary
    payload; kind cycles by id. Stands in for real image/audio blobs
    in tests and benches."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "utf-8").alias("payload"),
        F.to_json(F.struct(F.col(id_col).alias("src_id"))).alias("meta"),
    )


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches
    out, one Python process per partition — never per-row Python.

    The closure is fully self-contained (no references to this module)
    so cloudpickle ships it by value and executors never need
    ``delta_spark`` importable on their PYTHONPATH."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def _fake_decode(kind: str, payload: bytes) -> dict:
            # STUB decode — deterministic pseudo-metadata from the
            # payload. A real deployment swaps in PIL.Image.open /
            # soundfile.read / pyav frame iteration; the Arrow
            # batching, schema, and partitioning around it are real.
            n = len(payload or b"")
            sha = hashlib.sha256(payload or b"").hexdigest()[:16]
            seed = int(sha[:8], 16)
            if kind == "image":
                return {"width": 64 + seed % 1920, "height": 64 + (seed >> 8) % 1080,
                        "duration_s": None, "n_frames": 1}
            if kind == "audio":
                return {"width": None, "height": None,
                        "duration_s": round((n + 1) / 16000.0, 4), "n_frames": None}
            return {"width": 64 + seed % 1280, "height": 64 + (seed >> 8) % 720,
                    "duration_s": round((n + 1) / 24.0, 4), "n_frames": n % 600 + 1}

        for pdf in batches:
            metas = [
                _fake_decode(k, p) for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "sha": [
                        hashlib.sha256(p or b"").hexdigest()[:16]
                        for p in pdf["payload"]
                    ],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "duration_s": [m["duration_s"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                }
            )
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            out["n_frames"] = out["n_frames"].astype("Int32")
            out["n_bytes"] = out["n_bytes"].astype("int32")
            yield out

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plan: which frame indices to decode per
    video (the decode itself is the stubbed step). Pure column ops."""
    feats = extract_features(df).filter(F.col("kind") == "video")
    return feats.select(
        "media_id",
        F.sequence(
            F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n)
        ).alias("frame_indices"),
    )
