"""Multimodal columns: opaque binary payloads with typed metadata, and
Arrow-batched feature extraction via ``mapInPandas``.

The Spark-side plumbing is real and tested: binary column + metadata
struct schema, partition-sized Arrow batches into pandas, explicit output
schema. The actual media decode is a clearly-marked stub (image/audio
libraries are not in this container): ``decode_stub`` derives
deterministic pseudo-features (byte length, md5, fake dimensions) so the
pipeline shape — including oracle verification — is exercised end-to-end.
Swap ``_extract_features`` for PIL/librosa/ffmpeg in production; the
DataFrame plumbing does not change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema of the feature extractor
FEATURE_SCHEMA = ("doc_id long, n_bytes int, payload_md5 string, "
                  "width int, height int, decoder string")


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column + typed metadata (mime, size), the
    storage layout for image/audio/video at scale: payload stays a black
    box to the engine; metadata columns drive pruning/partitioning."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(F.lit("application/octet-stream").alias("mime"),
                 F.octet_length(payload).alias("n_bytes")),
    )


def _extract_features(payload: bytes) -> dict:
    """STUB decoder. Real deployments replace this body with an image/
    audio decode (PIL.Image.open(BytesIO(payload)) etc.). Deterministic
    fake: dimensions derived from the byte length."""
    import hashlib

    n = len(payload)
    return {
        "n_bytes": n,
        "payload_md5": hashlib.md5(payload).hexdigest(),
        "width": n % 640,
        "height": (n * 7) % 480,
        "decoder": "stub-v1",
    }


def extract_media_features(df: DataFrame, id_col: str = "doc_id",
                           payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` keeps the Python boundary at one Arrow exchange per
    partition batch — the correct shape for heavy per-item decode work
    (decode cost dominates; transfer is amortized)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_extract_features(p) for p in pdf[payload_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col).mapInPandas(run, schema=FEATURE_SCHEMA)


#: output schema of the frame sampler — one row PER FRAME
FRAME_SCHEMA = ("doc_id long, frame_idx int, frame_payload binary, "
                "frame_ms int, decoder string")


def sample_frames(df: DataFrame, *, n_frames: int = 4,
                  id_col: str = "doc_id", payload_col: str = "payload",
                  frame_interval_ms: int = 1000) -> DataFrame:
    """Video frame sampling plumbing: each payload row EXPLODES into
    ``n_frames`` frame rows — the one-to-many ``mapInPandas`` shape
    (yielding more rows than arrive) that real frame extraction uses.

    STUB decode: frame i is the i-th contiguous byte slice of the
    payload (deterministic); production swaps the slicing for
    ffmpeg/PyAV keyframe extraction without touching the plan. At scale
    the output is written partitioned by (doc bucket) so per-video frame
    groups stay co-located for the encoder stage."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n = len(payload)
                step = max(1, n // n_frames)
                for i in range(n_frames):
                    rows.append({
                        "doc_id": doc_id,
                        "frame_idx": i,
                        "frame_payload": bytes(payload[i * step:(i + 1) * step]),
                        "frame_ms": i * frame_interval_ms,
                        "decoder": "stub-v1",
                    })
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx",
                                              "frame_payload", "frame_ms",
                                              "decoder"])

    return df.select(id_col, payload_col).mapInPandas(run, schema=FRAME_SCHEMA)


#: output schema of the resizer — transformed payload + new dimensions
RESIZE_SCHEMA = ("doc_id long, payload binary, width int, height int, "
                 "decoder string")


def resize_images(df: DataFrame, *, width: int, height: int,
                  id_col: str = "doc_id", payload_col: str = "payload",
                  ) -> DataFrame:
    """Image resize plumbing: payload-in, payload-out transform at a
    fixed target size — the one-to-one ``mapInPandas`` shape.

    STUB decode: output payload is the input truncated/padded to
    width*height bytes (deterministic); production replaces the body
    with PIL ``Image.resize``. Binary in AND out exercises Arrow's
    binary columns in both directions."""
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p[:target]).ljust(target, b"\0")
                        for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "payload": payloads,
                "width": width,
                "height": height,
                "decoder": "stub-v1",
            })

    return df.select(id_col, payload_col).mapInPandas(run, schema=RESIZE_SCHEMA)
