"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (BASELINE.json north star): image/audio/video cells are opaque
``binary`` columns plus typed metadata columns; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
``mapInPandas`` so the bytes never round-trip through Python row objects.

The decode step is STUBBED — the image/audio libraries are not in this
container. ``extract_binary_features`` is the real, tested plumbing
(schema, partitioning, batch shape, Arrow transfer) with a deterministic
fake "decode" (byte length + md5). ``decode_image_stub`` marks where a real
decoder (PIL/libvips/ffmpeg) plugs in.

Scale notes: binary payloads inflate row size — keep
``spark.sql.files.maxPartitionBytes`` low enough that an Arrow batch of
payloads fits executor memory, and select the payload column as late as
possible so column pruning keeps it out of unrelated scans.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_binary_payload(
    df: DataFrame, text_col: str = "text", payload_col: str = "payload"
) -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of ``text_col``).

    Stands in for reading real image/audio bytes; the rest of the pipeline
    treats it as opaque media bytes."""
    return df.withColumn(payload_col, F.encode(F.col(text_col), "UTF-8"))


def decode_image_stub(payload: bytes) -> "object":
    """Where a real image decoder would run. Deliberately unimplemented —
    no imaging library ships in this environment."""
    raise NotImplementedError(
        "image decode requires an imaging library (PIL/libvips); "
        "wire it here — the Spark-side plumbing is extract_binary_features"
    )


def extract_image_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Image-metadata decode stub: width/height derived deterministically
    from the payload's md5 (1 + first/second 16 bits mod 512) — a real
    decoder reads the codec header here; the Arrow-batched shape is the
    production plumbing."""
    import pandas as pd

    out_schema = f"{id_col} long, width long, height long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hexes = pdf[payload_col].map(
                lambda b: hashlib.md5(bytes(b)).hexdigest()
            )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": hexes.map(lambda h: 1 + int(h[:4], 16) % 512),
                    "height": hexes.map(lambda h: 1 + int(h[4:8], 16) % 512),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def resize_dims(width, height, max_dim: int = 256):
    """Aspect-preserving thumbnail dimensions as Column expressions
    (integer math, floor scaling, min 1px). The geometry half of a resize
    operator — the pixel half plugs into decode_image_stub."""
    from pyspark.sql import Column

    w = F.col(width) if isinstance(width, str) else width
    h = F.col(height) if isinstance(height, str) else height
    longest = F.greatest(w, h)
    new_w = F.greatest(F.floor(w * max_dim / longest), F.lit(1)).cast("long")
    new_h = F.greatest(F.floor(h * max_dim / longest), F.lit(1)).cast("long")
    keep = longest <= max_dim
    return (
        F.when(keep, w).otherwise(new_w).cast("long"),
        F.when(keep, h).otherwise(new_h).cast("long"),
    )


def decode_audio_stub(payload: bytes) -> "object":
    """Where a real audio decoder (ffmpeg/soundfile) would run.
    Deliberately unimplemented — no audio library ships in this
    environment; the Spark-side plumbing is extract_audio_meta."""
    raise NotImplementedError(
        "audio decode requires an audio library (ffmpeg/soundfile); "
        "wire it here — the Spark-side plumbing is extract_audio_meta"
    )


AUDIO_RATES = (8000, 16000, 22050, 44100)


def extract_audio_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Audio-metadata decode stub: sample rate / sample count / duration
    derived deterministically from the payload md5 and byte length — a
    real decoder reads the container header here. Arrow-batched
    mapInPandas; output (id, sample_rate, n_samples, duration_ms)."""

    out_schema = f"{id_col} long, sample_rate long, n_samples long, duration_ms long"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hexes = pdf[payload_col].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            rates = hexes.map(lambda h: AUDIO_RATES[int(h[:2], 16) % 4])
            n_samples = (
                hexes.map(lambda h: int(h[8:12], 16) % 100_000)
                + pdf[payload_col].map(len)
            ).astype("int64")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": rates.astype("int64"),
                    "n_samples": n_samples,
                    "duration_ms": (n_samples * 1000 // rates).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_ms: int = 500,
    max_frames: int = 8,
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame —
    (id, frame_idx, frame_ts_ms, frame_hash). The 'video duration' comes
    from the same deterministic header-stub as extract_audio_meta; a real
    implementation decodes and emits actual frame tensors/bytes in the
    same one-in-many-out Arrow batch shape (the row-explosion plumbing is
    the production part)."""

    out_schema = f"{id_col} long, frame_idx long, frame_ts_ms long, frame_hash string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, hashes = [], [], [], []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                h = hashlib.md5(b).hexdigest()
                rate = AUDIO_RATES[int(h[:2], 16) % 4]
                n_samples = int(h[8:12], 16) % 100_000 + len(b)
                duration_ms = n_samples * 1000 // rate
                n_frames = min(duration_ms // every_ms + 1, max_frames)
                for i in range(n_frames):
                    ids.append(rid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    hashes.append(hashlib.md5(f"{h}:{i}".encode()).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame_hash": pd.Series(hashes, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)


def extract_binary_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Deterministic fake decode: byte_len + md5 hex of the payload. The
    mapInPandas shape (iterator of pandas batches in/out, explicit output
    schema) is exactly what a real decoder uses; swap the body, keep the
    harness."""
    out_schema = f"{id_col} long, byte_len long, content_hash string"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "byte_len": payloads.map(len).astype("int64"),
                    "content_hash": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, schema=out_schema)
