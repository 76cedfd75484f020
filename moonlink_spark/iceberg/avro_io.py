"""Minimal Apache Avro Object Container File writer/reader (pure Python).

Iceberg manifests and manifest lists MUST be Avro per the public spec; this
container has no Avro library, so the subset the Iceberg file formats need
is implemented here from the public Avro 1.11 specification: null/boolean/
int/long/float/double/bytes/string primitives, records, arrays, maps,
fixed, and [null, X] unions, with the null codec.

The writer's output is validated in tests against the REFERENCE Java Avro
implementation (avro-1.12.1.jar on Spark's classpath, driven through the
JVM gateway) — i.e. the bytes are checked by an independent decoder, not
just round-tripped through this module.
"""

from __future__ import annotations

import io
import json
import os
import struct


# --------------------------------------------------------- binary encoding
def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def write_long(out: io.BytesIO, v: int) -> None:
    n = _zigzag(int(v)) & ((1 << 64) - 1)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return _unzigzag(acc)


def write_bytes(out: io.BytesIO, v: bytes) -> None:
    write_long(out, len(v))
    out.write(v)


def read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(read_long(buf))


def _branch_index(schema_list: list, value) -> int:
    """Union branch resolution for the [null, X] (and [X, null]) shapes the
    Iceberg schemas use."""
    for i, s in enumerate(schema_list):
        if (s == "null") == (value is None):
            return i
    raise ValueError(f"no union branch for {value!r} in {schema_list}")


def encode(out: io.BytesIO, schema, value) -> None:
    """Encode *value* per the (parsed-JSON) Avro *schema*."""
    if isinstance(schema, list):  # union
        idx = _branch_index(schema, value)
        write_long(out, idx)
        encode(out, schema[idx], value)
        return
    t = schema["type"] if isinstance(schema, dict) else schema
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t == "int" or t == "long":
        write_long(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        write_bytes(out, bytes(value))
    elif t == "string":
        write_bytes(out, value.encode("utf-8"))
    elif t == "fixed":
        assert len(value) == schema["size"]
        out.write(bytes(value))
    elif t == "record":
        for f in schema["fields"]:
            try:
                encode(out, f["type"], value.get(f["name"]))
            except Exception as e:  # pragma: no cover - debugging aid
                raise ValueError(f"field {f['name']!r}: {e}") from e
    elif t == "array":
        items = list(value or [])
        if items:
            write_long(out, len(items))
            for it in items:
                encode(out, schema["items"], it)
        write_long(out, 0)
    elif t == "map":
        entries = dict(value or {})
        if entries:
            write_long(out, len(entries))
            for k, v in entries.items():
                write_bytes(out, k.encode("utf-8"))
                encode(out, schema["values"], v)
        write_long(out, 0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def decode(buf: io.BytesIO, schema):
    if isinstance(schema, list):  # union
        return decode(buf, schema[read_long(buf)])
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
        return read_bytes(buf)
    if t == "string":
        return read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "record":
        return {f["name"]: decode(buf, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = read_long(buf)
            if n == 0:
                return out
            if n < 0:  # block with byte-size prefix
                read_long(buf)
                n = -n
            out.extend(decode(buf, schema["items"]) for _ in range(n))
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
                k = read_bytes(buf).decode("utf-8")
                out[k] = decode(buf, schema["values"])
        return out
    raise ValueError(f"unsupported avro type {t!r}")


# ------------------------------------------------------------ container file
_MAGIC = b"Obj\x01"


def write_avro_file(
    path: str,
    schema: dict,
    records: list[dict],
    metadata: dict[str, bytes] | None = None,
    sync_seed: bytes | None = None,
) -> int:
    """Write an Avro Object Container File (null codec); returns byte size.

    *sync_seed* pins the 16-byte sync marker for deterministic output (the
    marker only needs to be unlikely to appear in data)."""
    import hashlib

    sync = hashlib.md5(sync_seed or path.encode()).digest()
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": b"null",
        **(metadata or {}),
    }
    body = io.BytesIO()
    for r in records:
        encode(body, schema, r)
    payload = body.getvalue()

    out = io.BytesIO()
    out.write(_MAGIC)
    write_long(out, len(meta))
    for k, v in meta.items():
        write_bytes(out, k.encode("utf-8"))
        write_bytes(out, v)
    write_long(out, 0)
    out.write(sync)
    if records:
        write_long(out, len(records))
        write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    data = out.getvalue()
    tmp = path + ".inprogress"
    with open(tmp, "wb") as f:
        f.write(data)
    os.rename(tmp, path)
    return len(data)


def read_avro_file(path: str) -> tuple[dict, dict[str, bytes], list[dict]]:
    """Read an Avro OCF written with the null codec; returns
    (schema, metadata, records)."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = read_long(buf)
        if n == 0:
            break
        if n < 0:
            read_long(buf)
            n = -n
        for _ in range(n):
            k = read_bytes(buf).decode("utf-8")
            meta[k] = read_bytes(buf)
    if meta.get("avro.codec", b"null") not in (b"null", b""):
        raise ValueError(f"{path}: unsupported codec {meta['avro.codec']!r}")
    schema = json.loads(meta["avro.schema"])
    sync = buf.read(16)
    records: list[dict] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        n = read_long(buf)
        read_long(buf)  # serialized byte size
        for _ in range(n):
            records.append(decode(buf, schema))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, meta, records
