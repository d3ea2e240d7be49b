"""Multimodal column plumbing for training-data pipelines.

Images/audio/video are carried as opaque `binary` columns plus typed
metadata; the decode/feature steps run as Arrow-batched kernels over
mapInPandas. The actual media codecs are NOT available in this container,
so the decode step is STUBBED behind a deterministic fake (or
NotImplementedError for the real-codec path) — but everything Spark-side
is real and tested: schema, batch iteration, partition sizing, UDF
signatures, and the metadata fan-out.

Design notes for 100 TB:
* media bytes never pass through a shuffle — all per-asset work is
  map-side (mapInPandas), and only extracted features / metadata (tiny)
  continue into joins and aggregations;
* batch memory is bounded by spark.sql.execution.arrow.maxRecordsPerBatch
  and per-file partition sizing (maxPartitionBytes), not by asset count;
* frame sampling emits (asset_id, frame_no, feature) rows — an explode
  that multiplies row count but not byte volume, since features are small.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .._pickle import register_by_value

MEDIA_SCHEMA = (
    "asset_id long, kind string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURE_DIM = 16


class MediaDecodeUnavailable(NotImplementedError):
    """Raised by the real-codec path: image/audio libs absent here."""


def decode_real(payload: bytes, mime: str):
    raise MediaDecodeUnavailable(
        f"no codec for {mime} in this container; use fake_features (deterministic stub)"
    )


def _fake_feature_matrix(payloads: pd.Series, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a decoder+embedder: sha256 of the bytes,
    expanded to `dim` floats in [-1, 1). Stable across partitionings."""
    out = np.empty((len(payloads), dim), dtype=np.float64)
    for i, b in enumerate(payloads):  # hashing loop over assets (not rows of data)
        h = hashlib.sha256(b or b"").digest()
        raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
        out[i] = raw.astype(np.float64) / 2**31 - 1.0
    return out


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """(asset rows) -> (asset_id, kind, feature: array<double>) via an
    Arrow-batched kernel. Bytes stay map-side; only features flow on."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _fake_feature_matrix(pdf["payload"], dim)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "feature": list(feats),
                }
            )

    return media.mapInPandas(kernel, "asset_id long, kind string, feature array<double>")


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video rows -> (asset_id, frame_no, ts_ms, frame_feature). Frame
    decode is stubbed (deterministic from (payload, frame_no)); the
    explode shape and schema are the real thing."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():  # per-asset loop (few assets/batch)
                n_frames = max(1, int(r["duration_ms"] or 0) // every_ms)
                base = _fake_feature_matrix(pd.Series([r["payload"]]), FEATURE_DIM)[0]
                for fno in range(n_frames):
                    rows.append(
                        {
                            "asset_id": int(r["asset_id"]),
                            "frame_no": fno,
                            "ts_ms": fno * every_ms,
                            "frame_feature": list(np.roll(base, fno)),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "frame_no", "ts_ms", "frame_feature"],
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        kernel, "asset_id long, frame_no int, ts_ms int, frame_feature array<double>"
    )


def synth_media(spark: SparkSession, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}|{i}".encode()).digest() * 8
        kind = kinds[i % 3]
        rows.append(
            {
                "asset_id": i,
                "kind": kind,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "width": 64 + i % 512 if kind != "audio" else 0,
                "height": 64 + (i * 7) % 512 if kind != "audio" else 0,
                "duration_ms": (i % 10) * 1000 if kind != "image" else 0,
                "payload": payload,
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows), MEDIA_SCHEMA)


register_by_value(__name__)
