"""T9: CollectorPayload Thrift wire codec (pure Python, no dependency).

reference: SplitBatch.scala:36-38,82-83 serializes the event with a
thread-local TSerializer (TBinaryProtocol).  The struct is the public
``collector-payload-1`` IDL (iglu:com.snowplowanalytics.snowplow/
CollectorPayload/thrift/1-0-0), field ids below.  This module implements
TBinaryProtocol directly — ~100 lines — so the engine can emit/ingest
byte-compatible records at the wire edges while keeping struct columns
internally (SURVEY §1.1 design choice).

Fields are written in ascending field-id order; Thrift readers are
field-id-tagged and order-insensitive, so any compliant consumer
(e.g. the Snowplow enrich stage) parses these records.

Spark integration: ``with_thrift_bytes`` adds a BinaryType column via an
Arrow-batched pandas UDF — only used when wire parity is requested; the
default pipeline stays JVM-side with JSON serialization.
"""

from __future__ import annotations

import struct as _struct

import pandas as pd

# TBinaryProtocol type codes
_T_STOP = 0
_T_I64 = 10
_T_STRING = 11
_T_LIST = 15

# field id -> (payload column, thrift type) — collector-payload-1 IDL
FIELDS: list[tuple[int, str, int]] = [
    (100, "ip_address", _T_STRING),
    (200, "timestamp", _T_I64),
    (210, "encoding", _T_STRING),
    (220, "collector", _T_STRING),
    (300, "user_agent", _T_STRING),
    (310, "referer_uri", _T_STRING),
    (320, "path", _T_STRING),
    (330, "querystring", _T_STRING),
    (340, "body", _T_STRING),
    (350, "headers", _T_LIST),
    (360, "content_type", _T_STRING),
    (400, "hostname", _T_STRING),
    (410, "network_user_id", _T_STRING),
    (31337, "schema", _T_STRING),
]
_BY_ID = {fid: (name, ftype) for fid, name, ftype in FIELDS}


def _write_string(out: bytearray, s: str) -> None:
    b = s.encode("utf-8")
    out += _struct.pack(">i", len(b))
    out += b


def encode_collector_payload(row: dict) -> bytes:
    """dict of payload columns -> TBinaryProtocol bytes (None fields are
    omitted, exactly like Thrift optional-field serialization)."""
    out = bytearray()
    for fid, name, ftype in FIELDS:
        v = row.get(name)
        if v is None:
            continue
        out.append(ftype)
        out += _struct.pack(">h", fid)
        if ftype == _T_STRING:
            _write_string(out, v)
        elif ftype == _T_I64:
            out += _struct.pack(">q", int(v))
        elif ftype == _T_LIST:
            out.append(_T_STRING)
            out += _struct.pack(">i", len(v))
            for el in v:
                _write_string(out, el)
    out.append(_T_STOP)
    return bytes(out)


def decode_collector_payload(data: bytes) -> dict:
    """TBinaryProtocol bytes -> dict (unknown field ids are skipped, so
    records from other writers with extra fields still decode)."""
    row: dict = {}
    i = 0
    while True:
        ftype = data[i]
        i += 1
        if ftype == _T_STOP:
            break
        (fid,) = _struct.unpack_from(">h", data, i)
        i += 2
        if ftype == _T_STRING:
            (n,) = _struct.unpack_from(">i", data, i)
            i += 4
            val: object = data[i : i + n].decode("utf-8")
            i += n
        elif ftype == _T_I64:
            (val,) = _struct.unpack_from(">q", data, i)
            i += 8
        elif ftype == _T_LIST:
            elem_t = data[i]
            (cnt,) = _struct.unpack_from(">i", data, i + 1)
            i += 5
            if elem_t != _T_STRING:
                raise ValueError(f"unsupported list element type {elem_t}")
            lst = []
            for _ in range(cnt):
                (n,) = _struct.unpack_from(">i", data, i)
                i += 4
                lst.append(data[i : i + n].decode("utf-8"))
                i += n
            val = lst
        else:
            raise ValueError(f"unsupported thrift type {ftype}")
        name_type = _BY_ID.get(fid)
        if name_type is not None:
            row[name_type[0]] = val
    return row


def with_thrift_bytes(df, out_col: str = "thrift_bytes"):
    """Adds a BinaryType column with the Thrift serialization of the
    payload columns (Arrow-batched; wire-parity edge only)."""
    from pyspark.sql import functions as F  # noqa: PLC0415
    from pyspark.sql.types import BinaryType  # noqa: PLC0415

    cols = [name for _, name, _ in FIELDS]

    @F.pandas_udf(BinaryType())
    def enc(pdf: pd.DataFrame) -> pd.Series:
        # struct input arrives as a DataFrame of its fields (Arrow batch)
        return pd.Series(
            [encode_collector_payload(rec) for rec in pdf.to_dict("records")]
        )

    return df.withColumn(out_col, enc(F.struct(*[F.col(c) for c in cols if c in df.columns])))


def read_thrift_records(df, bytes_col: str = "thrift_bytes", passthrough: tuple = ()):
    """BinaryType column of Thrift records -> payload struct columns (the
    ingest direction: consume records produced by the reference collector
    or any Thrift writer).  Arrow-batched mapInPandas, one output row per
    record.

    ``passthrough`` names extra input columns carried alongside the
    decoded fields (record provenance — file path, offset, ingest id) so
    consumers never need a post-decode join back to the source frame."""
    from pyspark.sql.types import (  # noqa: PLC0415
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    decoded_names = {name for _, name, _ in FIELDS}
    clash = [c for c in passthrough if c in decoded_names]
    if clash:
        # without this guard the output StructType gets duplicate fields
        # and pandas' out.insert raises an opaque error at EXECUTOR
        # runtime; fail fast on the driver with the fix spelled out
        raise ValueError(
            f"passthrough column(s) {clash} collide with decoded payload "
            f"field names {sorted(decoded_names)} — alias them before "
            "read_thrift_records"
        )
    in_fields = {f.name: f for f in df.schema.fields}
    fields = [in_fields[c] for c in passthrough]
    for _, name, ftype in FIELDS:
        if ftype == _T_I64:
            t = LongType()
        elif ftype == _T_LIST:
            t = ArrayType(StringType())
        else:
            t = StringType()
        fields.append(StructField(name, t))
    schema = StructType(fields)
    names = [name for _, name, _ in FIELDS]

    def decode_batches(batches):
        for pdf in batches:
            rows = [decode_collector_payload(bytes(b)) for b in pdf[bytes_col]]
            out = pd.DataFrame(
                [{n: r.get(n) for n in names} for r in rows], columns=names
            )
            for c in passthrough:
                out.insert(list(passthrough).index(c), c, pdf[c].values)
            yield out

    return df.select(*passthrough, bytes_col).mapInPandas(decode_batches, schema)
