"""Minimal Avro 1.x Object Container File writer/reader (stdlib only).

The Iceberg table format stores its manifest lists and manifest files
as Avro OCF (spec: avro.apache.org/docs/current/specification — magic
``Obj\\x01``, file-metadata map carrying the writer schema JSON, then
null-codec blocks of binary-encoded records separated by a 16-byte
sync marker). No Avro library ships in this sandbox, so the subset
Iceberg metadata needs is implemented here from the public spec:

  * primitives: null, boolean, int, long (zigzag varint), float,
    double, bytes, string
  * complex: record, array, map, fixed, union (any branch count)

The writer is schema-driven off plain JSON Avro schemas (attributes
like Iceberg's ``field-id`` ride along untouched — Iceberg readers
resolve manifest columns by those ids). The reader decodes with the
embedded writer schema, which is exactly how an Iceberg reader starts;
it exists so tests can verify exported metadata through a SECOND,
independent decode path. This file implements the public Avro wire
format; it is not a copy of any Avro library.
"""

from __future__ import annotations

import io
import json
import os
import struct


# ------------------------------------------------------------ binary
# encoding primitives (Avro spec "Binary Encoding")


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    u = _zigzag(n) & ((1 << 64) - 1)
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def read_long(buf) -> int:
    shift = 0
    u = 0
    while True:
        (b,) = buf.read(1)
        u |= (b & 0x7F) << shift
        if not (b & 0x80):
            return _unzigzag(u)
        shift += 7


def _write_bytes(buf: io.BytesIO, b: bytes) -> None:
    write_long(buf, len(b))
    buf.write(b)


def _read_bytes(buf) -> bytes:
    return buf.read(read_long(buf))


# ------------------------------------------------------------ schema-
# driven encode/decode. Schemas are plain parsed-JSON Avro schemas;
# named-type references are resolved through a registry built as
# definitions are first seen (Iceberg reuses e.g. record names).


def _encode(buf: io.BytesIO, schema, value, names: dict) -> None:
    if isinstance(schema, str) and schema in names:
        schema = names[schema]
    if isinstance(schema, list):  # union: branch index, then value
        idx = _pick_branch(schema, value, names)
        write_long(buf, idx)
        _encode(buf, schema[idx], value, names)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        write_long(buf, int(value))
    elif t == "float":
        buf.write(struct.pack("<f", float(value)))
    elif t == "double":
        buf.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_bytes(buf, bytes(value))
    elif t == "string":
        _write_bytes(buf, value.encode("utf-8"))
    elif t == "fixed":
        names[schema["name"]] = schema
        if len(value) != schema["size"]:
            raise ValueError("fixed size mismatch")
        buf.write(bytes(value))
    elif t == "record":
        names[schema["name"]] = schema
        for f in schema["fields"]:
            try:
                _encode(buf, f["type"], value.get(f["name"]), names)
            except Exception as e:
                raise ValueError(f"field {f['name']!r}: {e}") from e
    elif t == "array":
        if value:
            write_long(buf, len(value))
            for item in value:
                _encode(buf, schema["items"], item, names)
        write_long(buf, 0)
    elif t == "map":
        if value:
            write_long(buf, len(value))
            for k, v in value.items():
                _write_bytes(buf, k.encode("utf-8"))
                _encode(buf, schema["values"], v, names)
        write_long(buf, 0)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def _pick_branch(union: list, value, names: dict) -> int:
    def kind(s):
        if isinstance(s, str) and s in names:
            s = names[s]
        return s["type"] if isinstance(s, dict) else s

    if value is None:
        for i, s in enumerate(union):
            if kind(s) == "null":
                return i
        raise ValueError("None for non-nullable union")
    for i, s in enumerate(union):
        if kind(s) != "null":
            return i  # Iceberg unions are ["null", X] — first non-null
    raise ValueError("no non-null union branch")


def _decode(buf, schema, names: dict):
    if isinstance(schema, str) and schema in names:
        schema = names[schema]
    if isinstance(schema, list):
        return _decode(buf, schema[read_long(buf)], names)
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        names[schema["name"]] = schema
        return buf.read(schema["size"])
    if t == "record":
        names[schema["name"]] = schema
        return {f["name"]: _decode(buf, f["type"], names) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                read_long(buf)
                n = -n
            for _ in range(n):
                out.append(_decode(buf, schema["items"], names))
    if t == "map":
        out = {}
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:
                read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(buf, schema["values"], names)
    raise ValueError(f"unsupported Avro type {t!r}")


# ------------------------------------------------------------ OCF

_MAGIC = b"Obj\x01"


def write_ocf(
    path: str,
    schema: dict,
    records: list[dict],
    sync: bytes | None = None,
    meta: dict | None = None,
) -> None:
    """Write records as a null-codec Avro Object Container File.
    ``meta`` adds file-metadata entries (str or bytes values) — Iceberg
    manifests carry e.g. ``schema`` / ``partition-spec`` / ``content``
    header properties that readers inspect."""
    if sync is None:
        sync = os.urandom(16)
    body = io.BytesIO()
    for r in records:
        _encode(body, schema, r, {})
    data = body.getvalue()
    out = io.BytesIO()
    out.write(_MAGIC)
    meta_schema = {"type": "map", "values": "bytes"}
    all_meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": b"null",
    }
    for k, v in (meta or {}).items():
        all_meta[k] = v.encode("utf-8") if isinstance(v, str) else bytes(v)
    _encode(out, meta_schema, all_meta, {})
    out.write(sync)
    if records:
        write_long(out, len(records))
        write_long(out, len(data))
        out.write(data)
        out.write(sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out.getvalue())
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def read_ocf(path: str) -> tuple[dict, list[dict]]:
    """Read a null-codec OCF; returns (writer schema, records)."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != _MAGIC:
        raise ValueError(f"not an Avro OCF: {path}")
    meta = _decode(buf, {"type": "map", "values": "bytes"}, {})
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b""):
        raise ValueError(f"unsupported Avro codec {codec!r}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    sync = buf.read(16)
    records = []
    while True:
        head = buf.read(1)
        if not head:
            return schema, records
        buf.seek(-1, 1)
        n = read_long(buf)
        read_long(buf)  # block byte size
        for _ in range(n):
            records.append(_decode(buf, schema, {}))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch")
