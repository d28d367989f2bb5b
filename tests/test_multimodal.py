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


def test_real_magic_without_pil_raises(monkeypatch):
    """A payload with a real codec magic number must not silently get
    fabricated dimensions: without PIL it raises, documenting the
    boundary."""
    monkeypatch.setattr(mm, "_try_import_pil", lambda: None)
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG\r\n\x1a\nrest")


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
