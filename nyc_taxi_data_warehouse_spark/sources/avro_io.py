"""Minimal Apache Avro Object Container File reader/writer — pure
Python, no avro/fastavro dependency (the sandbox ships neither, and
Spark's bundled avro jars expose no Python-facing data source).

Exists for one purpose: Iceberg table metadata. The Iceberg spec
(https://iceberg.apache.org/spec/) stores manifest lists and manifests
as Avro OCF files, so reading (or writing) an Iceberg table from this
engine requires decoding a handful of KB-scale Avro files driver-side —
the same metadata boundary :mod:`.delta_read` occupies for Delta JSON
commits. This is NOT a general data-plane Avro source; row data stays
parquet.

Implements the core binary encoding (null, boolean, int/long zigzag
varints, float, double, bytes, string, record, enum, array, map, union,
fixed), named-type references, and the ``null``/``deflate`` block
codecs. Schema resolution/evolution is out of scope: records decode
against the writer schema embedded in the file header, which is exactly
what a generic manifest parser needs. Logical types pass through as
their underlying primitive.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}


class AvroError(RuntimeError):
    pass


# --- binary decoding -------------------------------------------------------


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise AvroError("truncated avro data")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def _resolve(schema, names: dict):
    """Dereference named-type references ("r102", "my.ns.Rec")."""
    if isinstance(schema, str) and schema not in _PRIMITIVES:
        if schema not in names:
            raise AvroError(f"unresolved named type {schema!r}")
        return names[schema]
    return schema


def _register(schema, names: dict) -> None:
    if isinstance(schema, dict) and schema.get("type") in ("record", "enum", "fixed"):
        name = schema.get("name")
        if name:
            names[name] = schema
            ns = schema.get("namespace")
            if ns:
                names[f"{ns}.{name}"] = schema


def _decode(r: _Reader, schema, names: dict):
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise AvroError(f"union index {idx} out of range")
        return _decode(r, schema[idx], names)
    if isinstance(schema, dict):
        t = schema["type"]
        if t in _PRIMITIVES:
            return _decode(r, t, names)
        if t == "record":
            _register(schema, names)
            out = {}
            for f in schema["fields"]:
                out[f["name"]] = _decode(r, f["type"], names)
            return out
        if t == "enum":
            _register(schema, names)
            return schema["symbols"][r.read_long()]
        if t == "fixed":
            _register(schema, names)
            return r.read(schema["size"])
        if t == "array":
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    break
                if n < 0:
                    r.read_long()  # block byte size, unused
                    n = -n
                for _ in range(n):
                    out.append(_decode(r, schema["items"], names))
            return out
        if t == "map":
            out = {}
            while True:
                n = r.read_long()
                if n == 0:
                    break
                if n < 0:
                    r.read_long()
                    n = -n
                for _ in range(n):
                    k = _decode(r, "string", names)
                    out[k] = _decode(r, schema["values"], names)
            return out
        raise AvroError(f"unsupported complex type {t!r}")
    # primitive by name
    if schema == "null":
        return None
    if schema == "boolean":
        return r.read(1) != b"\x00"
    if schema in ("int", "long"):
        return r.read_long()
    if schema == "float":
        return struct.unpack("<f", r.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", r.read(8))[0]
    if schema == "bytes":
        return r.read(r.read_long())
    if schema == "string":
        return r.read(r.read_long()).decode("utf-8")
    raise AvroError(f"unsupported type {schema!r}")


# --- binary encoding -------------------------------------------------------


def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(w: io.BytesIO, schema, value, names: dict) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: first branch whose type matches
        for i, branch in enumerate(schema):
            if _matches(branch, value, names):
                w.write(_zigzag(i))
                _encode(w, branch, value, names)
                return
        raise AvroError(f"no union branch for {type(value).__name__}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t in _PRIMITIVES:
            return _encode(w, t, value, names)
        if t == "record":
            _register(schema, names)
            for f in schema["fields"]:
                if f["name"] not in value:
                    raise AvroError(f"record missing field {f['name']!r}")
                _encode(w, f["type"], value[f["name"]], names)
            return
        if t == "enum":
            _register(schema, names)
            return w.write(_zigzag(schema["symbols"].index(value)))
        if t == "fixed":
            _register(schema, names)
            if len(value) != schema["size"]:
                raise AvroError("fixed size mismatch")
            return w.write(value)
        if t == "array":
            if value:
                w.write(_zigzag(len(value)))
                for v in value:
                    _encode(w, schema["items"], v, names)
            return w.write(_zigzag(0))
        if t == "map":
            if value:
                w.write(_zigzag(len(value)))
                for k, v in value.items():
                    _encode(w, "string", k, names)
                    _encode(w, schema["values"], v, names)
            return w.write(_zigzag(0))
        raise AvroError(f"unsupported complex type {t!r}")
    if schema == "null":
        return
    if schema == "boolean":
        return w.write(b"\x01" if value else b"\x00")
    if schema in ("int", "long"):
        return w.write(_zigzag(value))
    if schema == "float":
        return w.write(struct.pack("<f", value))
    if schema == "double":
        return w.write(struct.pack("<d", value))
    if schema == "bytes":
        return w.write(_zigzag(len(value)) + bytes(value))
    if schema == "string":
        b = value.encode("utf-8")
        return w.write(_zigzag(len(b)) + b)
    raise AvroError(f"unsupported type {schema!r}")


def _matches(schema, value, names: dict) -> bool:
    schema = _resolve(schema, names)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, float)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t in ("string", "enum"):
        return isinstance(value, str)
    if t == "array":
        return isinstance(value, list)
    if t in ("map", "record"):
        return isinstance(value, dict)
    return False


# --- object container files ------------------------------------------------


def read_ocf(path: str) -> tuple[dict | str | list, list]:
    """Read an Avro OCF; returns (writer schema, records)."""
    with open(path, "rb") as f:
        data = f.read()
    r = _Reader(data)
    if r.read(4) != _MAGIC:
        raise AvroError(f"{path}: not an Avro object container file")
    names: dict = {}
    # header metadata is a map<string, bytes>
    meta = _decode(r, {"type": "map", "values": "bytes"}, names)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    sync = r.read(16)
    records = []
    while not r.at_end():
        count = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode(br, schema, names))
        if r.read(16) != sync:
            raise AvroError(f"{path}: sync marker mismatch")
    return schema, records


def write_ocf(
    path: str, schema: dict | str | list, records: list, codec: str = "deflate"
) -> None:
    """Write records as a single-block Avro OCF (atomic temp+rename)."""
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported codec {codec!r}")
    names: dict = {}
    body = io.BytesIO()
    for rec in records:
        _encode(body, schema, rec, names)
    payload = body.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(wbits=-15)
        payload = co.compress(payload) + co.flush()
    sync = os.urandom(16)
    out = io.BytesIO()
    out.write(_MAGIC)
    header_names: dict = {}
    _encode(
        out,
        {"type": "map", "values": "bytes"},
        {
            "avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode(),
        },
        header_names,
    )
    out.write(sync)
    out.write(_zigzag(len(records)))
    out.write(_zigzag(len(payload)))
    out.write(payload)
    out.write(sync)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(out.getvalue())
    os.replace(tmp, path)
