"""Multimodal decode: stub determinism and the optional real-codec hook."""

from __future__ import annotations

import hashlib

import pytest

from opensnowcat_collector_spark.engine.llmdata import multimodal as mm


def test_stub_decode_deterministic():
    meta = mm.decode_image(b"plain text payload")
    assert meta == mm.decode_image_stub(b"plain text payload")
    digest = hashlib.md5(b"plain text payload").hexdigest()
    assert meta["content_md5"] == digest
    assert meta["fake_width"] == int(digest[0], 16) * 16 + int(digest[1], 16)


def test_real_magic_unparseable_without_pil_raises(monkeypatch):
    """A payload with a real codec magic number but an unparseable header
    must not silently get fabricated dimensions: without PIL it raises,
    documenting the boundary."""
    monkeypatch.setattr(mm, "_try_import_pil", lambda: None)
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n\x1a\nrest")
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\xff\xd8\xffgarbage")


def _make_png(w: int, h: int) -> bytes:
    """Minimal valid RGB PNG, stdlib-only (struct + zlib)."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x00\x00\x00" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _make_jpeg_header(w: int, h: int) -> bytes:
    """JPEG preamble: SOI + APP0 + SOF0 with real dimensions (enough for
    the header parser; not a complete decodable image)."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">HBHHB", 17, 8, h, w, 3)
        + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0


def test_header_parse_real_dims_without_pil(monkeypatch):
    """The real-codec path is executable WITHOUT PIL: PNG IHDR / JPEG SOF
    headers carry the true dimensions and the pure-Python parser reads
    them from the actual bytes."""
    monkeypatch.setattr(mm, "_try_import_pil", lambda: None)
    png = _make_png(17, 5)
    meta = mm.decode_image(png)
    assert (meta["fake_width"], meta["fake_height"]) == (17, 5)
    assert meta["fake_format"] == "png"
    assert meta["n_bytes"] == len(png)
    jpg = _make_jpeg_header(640, 480)
    meta = mm.decode_image(jpg)
    assert (meta["fake_width"], meta["fake_height"]) == (640, 480)
    assert meta["fake_format"] == "jpeg"


def test_pil_branch_decodes_real_png():
    """Exercises the REAL codec hook — skipped where PIL is absent (this
    container), runs in deployments that install it."""
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (17, 5)).save(buf, format="PNG")
    meta = mm.decode_image(buf.getvalue())
    assert (meta["fake_width"], meta["fake_height"]) == (17, 5)
    assert meta["fake_format"] == "png"
