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


def decode_image_stub(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder.

    A real deployment replaces this body with e.g. PIL/libvips decode; the
    Spark plumbing (mapInPandas batching, schema, partitioning) is
    identical.  Raises NotImplementedError for payloads that declare a real
    codec marker, documenting the boundary.
    """
    if payload.startswith(b"\x89PNG") or payload.startswith(b"\xff\xd8"):
        raise NotImplementedError("real image decoding is not available in this container")
    digest = hashlib.md5(payload).hexdigest()
    return {
        "n_bytes": len(payload),
        "content_md5": digest,
        "fake_width": int(digest[0], 16) * 16 + int(digest[1], 16),
        "fake_height": int(digest[2], 16) * 16 + int(digest[3], 16),
        "fake_format": _FORMATS[int(digest[4], 16) % 4],
    }


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [decode_image_stub(p) for p in pdf["payload"]]
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
