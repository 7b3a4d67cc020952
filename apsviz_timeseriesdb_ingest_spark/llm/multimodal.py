"""Multimodal columns: opaque binary payloads with typed metadata, and
Arrow-batched feature extraction via ``mapInPandas``.

The Spark-side plumbing is real and tested: binary column + metadata
struct schema, partition-sized Arrow batches into pandas, explicit
output schema. The decode itself is LAYERED (r3 verdict task 4):

1. PIL, when importable (try-import at module load — absent from this
   sandbox, exercised on deployments and by a skip-gated test): full
   ``Image.open`` decode → real width/height/mode, ``decoder='pil'``.
2. A pure-stdlib HEADER parse for PNG/GIF/JPEG payloads
   (``_sniff_dimensions``): real dimensions+mode from the container
   header with no image library at all, ``decoder='header-v1'`` — so
   real image bytes produce real metadata even here.
3. The deterministic stub for anything undecodable (byte length, md5,
   fake dimensions, NULL mode) — keeps the oracle-verified pipeline
   shape for opaque payloads.

``sample_frames`` / ``resize_images`` follow the same pattern: PIL body
when available, documented deterministic stub otherwise; the DataFrame
plumbing never changes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # deployment-optional image library (absent in this sandbox)
    from PIL import Image as _PIL_Image
except ImportError:  # pragma: no cover - exercised when PIL exists
    _PIL_Image = None

#: output schema of the feature extractor
FEATURE_SCHEMA = ("doc_id long, n_bytes int, payload_md5 string, "
                  "width int, height int, mode string, decoder string")

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: PNG color type -> PIL mode name (PNG spec, public)
_PNG_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}


def _sniff_dimensions(payload: bytes) -> tuple[int, int, str] | None:
    """(width, height, mode) parsed from a PNG/GIF/JPEG container
    header — pure stdlib, no decode of pixel data. Returns None for
    anything unrecognized (malformed headers included: this runs inside
    a distributed map, so it must never raise)."""
    try:
        if payload[:8] == _PNG_MAGIC and payload[12:16] == b"IHDR" \
                and len(payload) >= 26:
            w, h = struct.unpack(">II", payload[16:24])
            return w, h, _PNG_MODES.get(payload[25], "?")
        if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
            w, h = struct.unpack("<HH", payload[6:10])
            return w, h, "P"
        if payload[:2] == b"\xff\xd8":
            i = 2  # walk JPEG segments to a start-of-frame marker
            while i + 1 < len(payload) and payload[i] == 0xFF:
                # 0xFF fill/padding bytes may precede any marker
                while i + 1 < len(payload) and payload[i + 1] == 0xFF:
                    i += 1
                marker = payload[i + 1]
                # every SOF variant carries dimensions: 0xC0-0xCF minus
                # DHT (0xC4), JPG (0xC8), DAC (0xCC)
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8,
                                                             0xCC):
                    if i + 9 >= len(payload):
                        return None
                    h, w = struct.unpack(">HH", payload[i + 5:i + 9])
                    return w, h, ("RGB" if payload[i + 9] == 3 else "L")
                if marker == 0xD9:  # EOI with no frame seen
                    return None
                if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                    i += 2  # TEM/RSTn are length-less standalone markers
                    continue
                i += 2 + struct.unpack(">H", payload[i + 2:i + 4])[0]
    except (struct.error, IndexError):  # truncated header
        return None
    return None


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
    """Layered decoder (module docstring): PIL → header parse → stub.
    The stub branch keeps the r1-r3 deterministic pseudo-features
    (dimensions from the byte length, NULL mode) so opaque payloads
    stay oracle-verifiable."""
    import hashlib
    import io

    payload = bytes(payload)
    base = {"n_bytes": len(payload),
            "payload_md5": hashlib.md5(payload).hexdigest()}
    if _PIL_Image is not None:
        try:
            img = _PIL_Image.open(io.BytesIO(payload))
            return {**base, "width": img.width, "height": img.height,
                    "mode": img.mode, "decoder": "pil"}
        except Exception:
            pass  # not an image PIL knows: fall through
    sniffed = _sniff_dimensions(payload)
    if sniffed is not None:
        w, h, mode = sniffed
        return {**base, "width": w, "height": h, "mode": mode,
                "decoder": "header-v1"}
    n = len(payload)
    return {**base, "width": n % 640, "height": (n * 7) % 480,
            "mode": None, "decoder": "stub-v1"}


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

    When PIL is importable and the payload decodes, the body is a REAL
    ``Image.resize`` re-encoded as PNG (``decoder='pil'``); otherwise
    the stub truncates/pads the payload to width*height bytes
    (deterministic). Binary in AND out exercises Arrow's binary columns
    in both directions."""
    target = width * height

    def _resize_one(payload: bytes) -> tuple[bytes, str]:
        if _PIL_Image is not None:
            try:
                import io

                img = _PIL_Image.open(io.BytesIO(payload))
                out = io.BytesIO()
                img.resize((width, height)).save(out, format="PNG")
                return out.getvalue(), "pil"
            except Exception:
                pass
        return bytes(payload[:target]).ljust(target, b"\0"), "stub-v1"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            done = [_resize_one(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].values,
                "payload": [p for p, _ in done],
                "width": width,
                "height": height,
                "decoder": [d for _, d in done],
            })

    return df.select(id_col, payload_col).mapInPandas(run, schema=RESIZE_SCHEMA)
