"""Layered media decode (r3 verdict task 4): real PNG/GIF/JPEG payloads
produce REAL dimensions through the stdlib header parser (and through
PIL when installed — skip-gated), opaque payloads keep the
deterministic stub, and the mapInPandas plumbing carries all branches
in one frame."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

from apsviz_timeseriesdb_ingest_spark.llm.multimodal import (
    _PIL_Image,
    _sniff_dimensions,
    extract_media_features,
    resize_images,
)


def _png(width: int, height: int, color=(250, 10, 20, 255)) -> bytes:
    """A fully valid RGBA PNG built with the stdlib only."""
    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 6, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(color) * width for _ in range(height))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00" * 6


def _jpeg_header(width: int, height: int) -> bytes:
    """SOI + a minimal SOF0 segment (enough for the header parser; not
    a decodable image, which is exactly the PIL-fails→sniff-works
    fallback case)."""
    sof = struct.pack(">BBHBHHB", 0xFF, 0xC0, 11, 8, height, width, 3)
    return b"\xff\xd8" + sof + b"\x01\x11\x00"


def test_sniff_dimensions_pure():
    assert _sniff_dimensions(_png(8, 5)) == (8, 5, "RGBA")
    assert _sniff_dimensions(_gif(33, 12)) == (33, 12, "P")
    assert _sniff_dimensions(_jpeg_header(640, 480)) == (640, 480, "RGB")
    assert _sniff_dimensions(b"plain text payload") is None
    assert _sniff_dimensions(b"") is None
    # truncated PNG header must not raise inside a distributed map
    assert _sniff_dimensions(_png(8, 5)[:20]) is None


def test_sniff_jpeg_marker_variants():
    """The segment walk handles real-world JPEG marker streams (ADVICE
    r4): 0xFF fill bytes before a marker, length-less standalone
    markers (TEM, RSTn), every SOF variant that carries dimensions
    (e.g. SOF9 arithmetic, SOF7 lossless), and gives up cleanly at EOI
    or on DHT-only streams instead of misreading them as frames."""
    def seg(marker, body=b""):
        return struct.pack(">BBH", 0xFF, marker, 2 + len(body)) + body

    sof_body = struct.pack(">BHHB", 8, 480, 640, 3) + b"\x01\x11\x00"
    # fill bytes + TEM + RST2 + an APP0 segment before SOF9
    jpg = (b"\xff\xd8" + b"\xff" * 3 + b"\x01" + b"\xff\xd2"
           + seg(0xE0, b"JFIF\x00") + seg(0xC9, sof_body))
    assert _sniff_dimensions(jpg) == (640, 480, "RGB")
    # SOF7 (lossless), single component -> mode L
    sof_gray = struct.pack(">BHHB", 8, 12, 34, 1) + b"\x01\x11\x00"
    assert _sniff_dimensions(
        b"\xff\xd8" + seg(0xC7, sof_gray)) == (34, 12, "L")
    # DHT (0xC4) is NOT a frame; EOI terminates the walk -> None
    assert _sniff_dimensions(
        b"\xff\xd8" + seg(0xC4, b"\x00" * 4) + b"\xff\xd9") is None
    # truncated mid-SOF must not raise
    assert _sniff_dimensions(jpg[:len(jpg) - 6]) is None


def test_extract_features_mixed_branches(spark):
    png, gif = _png(8, 5), _gif(33, 12)
    txt = b"just some opaque bytes"
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(gif)), (3, bytearray(txt))],
        "doc_id long, payload binary")
    got = {r.doc_id: r for r in extract_media_features(df).collect()}
    # real image bytes -> real dimensions (pil when installed, header
    # parse otherwise — identical dimensions either way)
    assert (got[1].width, got[1].height, got[1].mode) == (8, 5, "RGBA")
    assert got[1].decoder == ("pil" if _PIL_Image else "header-v1")
    assert (got[2].width, got[2].height, got[2].mode) == (33, 12, "P")
    # opaque payload -> unchanged r1-r3 stub contract
    n = len(txt)
    assert (got[3].width, got[3].height) == (n % 640, (n * 7) % 480)
    assert got[3].mode is None and got[3].decoder == "stub-v1"
    assert got[3].payload_md5 == hashlib.md5(txt).hexdigest()


@pytest.mark.skipif(_PIL_Image is None,
                    reason="PIL not installed (offline sandbox)")
def test_pil_decode_and_resize_end_to_end(spark):
    """Deployment branch: with PIL present the decoder reports 'pil'
    and resize_images re-encodes a real resized PNG."""
    df = spark.createDataFrame([(1, bytearray(_png(16, 10)))],
                               "doc_id long, payload binary")
    feat = extract_media_features(df).collect()[0]
    assert feat.decoder == "pil" and (feat.width, feat.height) == (16, 10)
    out = resize_images(df, width=4, height=3).collect()[0]
    assert out.decoder == "pil"
    assert _sniff_dimensions(bytes(out.payload))[:2] == (4, 3)


def test_resize_stub_branch_without_pil(spark):
    """The stub resize contract holds for undecodable payloads (and for
    everything when PIL is absent)."""
    df = spark.createDataFrame([(7, bytearray(b"xy"))],
                               "doc_id long, payload binary")
    out = resize_images(df, width=3, height=2).collect()[0]
    assert out.decoder == "stub-v1"
    assert bytes(out.payload) == b"xy\x00\x00\x00\x00"
