"""Iceberg partition transforms — the metadata-pruning functions.

Implements the spec's partition transforms ("Partition Transforms" +
Appendix B "32-bit Hash Requirements", https://iceberg.apache.org/spec/)
so the spec reader can prune bucket-/date-/truncate-partitioned EXTERNAL
tables from manifest metadata alone. All constructions are public
knowledge: Murmur3 x86 32-bit is Austin Appleby's public-domain algorithm;
the per-type hash serializations and the truncate/temporal definitions are
verbatim from the spec (unit tests pin the spec's own published test
vectors, e.g. bucket hash of int 34 = 2017239379).

These run DRIVER-SIDE over manifest-cardinality metadata (one transform
application per partition filter per file), never per data row — at 100 TB
the whole point is that pruned partitions cost zero I/O and zero compute.
"""

from __future__ import annotations

import re
import struct
from datetime import date, datetime, timedelta, timezone

import pandas as pd

_EPOCH_DT = datetime(1970, 1, 1)
_EPOCH_D = date(1970, 1, 1)
_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$")
_TRUNCATE_RE = re.compile(r"^truncate\[(\d+)\]$")

SUPPORTED_TRANSFORMS = (
    "identity",
    "void",
    "year",
    "month",
    "day",
    "hour",
    "bucket[N]",
    "truncate[W]",
)


def is_supported_transform(transform: str) -> bool:
    return (
        transform in ("identity", "void", "year", "month", "day", "hour")
        or bool(_BUCKET_RE.match(transform))
        or bool(_TRUNCATE_RE.match(transform))
    )


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Murmur3 x86 32-bit, returned as a SIGNED 32-bit int (Java parity —
    Iceberg's bucket transform is defined on the Java hash value)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    rounded = n & ~3
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[rounded:]
    k = 0
    if len(tail) == 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _to_micros(value) -> int:
    """Timestamp value → microseconds since epoch (naive treated as UTC).
    Exact integer arithmetic — no float round-trip. ISO strings accepted
    (per-file catalog stats serialize timestamps as isoformat)."""
    if isinstance(value, str):
        value = datetime.fromisoformat(value)
    if isinstance(value, datetime):
        if value.tzinfo is not None:
            # convert aware datetimes to UTC before dropping tzinfo — a
            # bare replace() would transform WALL-CLOCK micros and prune
            # the wrong files for any non-UTC filter value
            value = value.astimezone(timezone.utc).replace(tzinfo=None)
        td = value - _EPOCH_DT
        return (td.days * 86_400 + td.seconds) * 1_000_000 + td.microseconds
    return int(value)


def _to_days(value) -> int:
    """Date value → days since epoch (ISO strings accepted)."""
    if isinstance(value, str):
        value = date.fromisoformat(value[:10])
    if isinstance(value, datetime):
        if value.tzinfo is not None:
            value = value.astimezone(timezone.utc).replace(tzinfo=None)
        return (value.date() - _EPOCH_D).days
    if isinstance(value, date):
        return (value - _EPOCH_D).days
    return int(value)


def _temporal_parts(value, source_type: str, unit: str) -> int:
    """year/month/day/hour transform result (spec: signed count of the time
    unit since 1970; floor semantics for pre-epoch values)."""
    is_ts = source_type.startswith("timestamp")
    if unit == "hour":
        if not is_ts:
            raise ValueError(f"hour transform needs a timestamp source, got {source_type}")
        return _to_micros(value) // 3_600_000_000
    if is_ts:
        days = _to_micros(value) // 86_400_000_000
    else:
        days = _to_days(value)
    if unit == "day":
        return days
    d = _EPOCH_D + timedelta(days=days)
    if unit == "month":
        return (d.year - 1970) * 12 + (d.month - 1)
    if unit == "year":
        return d.year - 1970
    raise ValueError(f"unknown temporal unit {unit!r}")


def bucket_bytes(value, source_type: str) -> bytes:
    """The spec's Appendix-B hash serialization per source type."""
    if source_type in ("int", "long"):
        return struct.pack("<q", int(value))
    if source_type == "date":
        return struct.pack("<q", _to_days(value))
    if source_type.startswith("timestamp"):
        return struct.pack("<q", _to_micros(value))
    if source_type == "time":
        return struct.pack("<q", int(value))
    if source_type == "string":
        return str(value).encode("utf-8")
    if source_type in ("binary",) or source_type.startswith("fixed"):
        return bytes(value)
    if source_type == "uuid":
        import uuid as _uuid

        return value.bytes if isinstance(value, _uuid.UUID) else _uuid.UUID(str(value)).bytes
    if source_type.startswith("decimal"):
        from decimal import Decimal

        unscaled = int(Decimal(str(value)).scaleb(int(source_type.split(",")[1].rstrip(") "))))
        length = max(1, (unscaled.bit_length() + 8) // 8)
        return unscaled.to_bytes(length, "big", signed=True)
    raise ValueError(f"bucket transform unsupported for source type {source_type!r}")


def apply_transform(transform: str, value, source_type: str):
    """Compute the partition value the spec assigns to *value* under
    *transform* — what a writer stores in the manifest entry, hence what a
    filter value must be transformed to before comparing for pruning.
    None propagates (a NULL source yields a NULL partition value)."""
    if value is None:
        return None
    if transform == "identity":
        # temporal sources normalize to the spec's integer representation
        # (days / micros since epoch); ISO strings come from catalog stats
        if source_type == "date":
            return (
                _to_days(value) if isinstance(value, (date, datetime, str)) else value
            )
        if source_type.startswith("timestamp"):
            return _to_micros(value) if isinstance(value, (datetime, str)) else value
        return value
    if transform == "void":
        return None
    if transform in ("year", "month", "day", "hour"):
        return _temporal_parts(value, source_type, transform)
    m = _BUCKET_RE.match(transform)
    if m:
        n = int(m.group(1))
        return (murmur3_x86_32(bucket_bytes(value, source_type)) & 0x7FFFFFFF) % n
    m = _TRUNCATE_RE.match(transform)
    if m:
        w = int(m.group(1))
        if source_type in ("int", "long"):
            v = int(value)
            return v - (v % w)  # Python % is floor-mod: matches the spec
        if source_type == "string":
            return str(value)[:w]
        if source_type == "binary":
            return bytes(value)[:w]
        raise ValueError(f"truncate unsupported for source type {source_type!r}")
    raise ValueError(f"unsupported partition transform {transform!r}")


_EXPR_RE = re.compile(
    r"^(year|month|day|hour|bucket\[\d+\]|truncate\[\d+\]|identity)\((\w+)\)$"
)
_BARE_RE = re.compile(r"^\w+$")


def parse_partition_expr(expr: str) -> tuple[str, str]:
    """``"day(ts)"`` → ``("day", "ts")``; a bare column name is identity.
    The accepted grammar is exactly the spec's transform set — the same
    strings `partition_by=` and align clustering's `by=` take."""
    m = _EXPR_RE.match(expr.strip())
    if m:
        return m.group(1), m.group(2)
    if _BARE_RE.match(expr.strip()):
        return "identity", expr.strip()
    raise ValueError(
        f"bad partition expression {expr!r} — use a column name or "
        f"transform(column) with transform in year/month/day/hour/"
        f"bucket[N]/truncate[W]"
    )


def partition_field_name(transform: str, source: str) -> str:
    """Iceberg's conventional partition-field naming (ts_day, id_bucket...)."""
    if transform == "identity":
        return source
    base = transform.split("[", 1)[0]
    return f"{source}_{base}"


def transform_column(transform: str, col_name: str, source_type: str):
    """The transform as a JVM-side pyspark Column over *col_name* —
    whole-stage-codegen for everything except bucket (whose Murmur3 seed-0
    hash has no Spark builtin; Spark's `hash()` is seed-42 and a different
    byte layout). Bucket callers get a vectorized Arrow-batched fallback
    via `bucket_series`. Temporal results match apply_transform exactly
    (session timezone must be UTC, which moonlink_spark sessions pin)."""
    from pyspark.sql import functions as F

    if transform == "identity":
        return F.col(col_name)
    if transform == "day":
        return F.datediff(F.col(col_name).cast("date"), F.lit("1970-01-01"))
    if transform == "year":
        return F.year(F.col(col_name)) - F.lit(1970)
    if transform == "month":
        return (F.year(F.col(col_name)) - F.lit(1970)) * F.lit(12) + (
            F.month(F.col(col_name)) - F.lit(1)
        )
    if transform == "hour":
        return F.floor(F.col(col_name).cast("double") / F.lit(3600.0)).cast("int")
    m = _TRUNCATE_RE.match(transform)
    if m:
        w = int(m.group(1))
        if source_type in ("int", "long"):
            return F.col(col_name) - F.pmod(F.col(col_name), F.lit(w))
        if source_type == "string":
            return F.substring(F.col(col_name), 1, w)
        raise ValueError(f"truncate unsupported for source type {source_type!r}")
    m = _BUCKET_RE.match(transform)
    if m:
        n = int(m.group(1))
        src_ty = source_type

        from pyspark.sql import functions as F2

        @F2.pandas_udf("int")
        def _bucket(col: pd.Series) -> pd.Series:
            import numpy as np

            if src_ty in ("int", "long"):
                vals = murmur3_x86_32_long(col.to_numpy(dtype=np.int64))
            else:
                vals = np.fromiter(
                    (murmur3_x86_32(bucket_bytes(v, src_ty)) for v in col),
                    dtype=np.int64,
                    count=len(col),
                )
            return pd.Series(((vals & 0x7FFFFFFF) % n).astype(np.int32))

        return _bucket(F.col(col_name))
    raise ValueError(f"unsupported partition transform {transform!r}")


def murmur3_x86_32_long(vals: "object") -> "object":
    """Vectorized numpy Murmur3 x86/32 over int64 values serialized as
    8-byte little-endian (the Appendix-B long layout): the two 4-byte
    blocks are the low and high words, so the whole hash is closed-form
    over uint32 arrays — no per-row Python."""
    import numpy as np

    v = vals.astype(np.uint64)
    c1 = np.uint32(0xCC9E2D51)
    c2 = np.uint32(0x1B873593)

    def _mix_k(k):
        k = (k * c1).astype(np.uint32)
        k = ((k << np.uint32(15)) | (k >> np.uint32(17))).astype(np.uint32)
        return (k * c2).astype(np.uint32)

    h = np.zeros(len(v), dtype=np.uint32)
    for word in (
        (v & np.uint64(0xFFFFFFFF)).astype(np.uint32),        # low LE block
        (v >> np.uint64(32)).astype(np.uint32),               # high LE block
    ):
        h ^= _mix_k(word)
        h = ((h << np.uint32(13)) | (h >> np.uint32(19))).astype(np.uint32)
        h = (h * np.uint32(5) + np.uint32(0xE6546B64)).astype(np.uint32)
    h ^= np.uint32(8)  # length
    h ^= h >> np.uint32(16)
    h = (h * np.uint32(0x85EBCA6B)).astype(np.uint32)
    h ^= h >> np.uint32(13)
    h = (h * np.uint32(0xC2B2AE35)).astype(np.uint32)
    h ^= h >> np.uint32(16)
    return h.astype(np.int64) - (h >= np.uint32(1 << 31)).astype(np.int64) * (1 << 32)


def partition_value_avro_type(transform: str, source_type: str) -> str:
    """Avro manifest type of a partition VALUE under *transform* — shared
    by the export writer, the external-table writer, and the reader's
    manifest-summary decode so all three agree byte-for-byte."""
    if transform.startswith("bucket[") or transform in ("year", "month", "day", "hour"):
        return "int"
    # identity / truncate carry the source's representation; temporal
    # identities use the spec's integer forms
    prim = {
        "string": "string",
        "int": "int",
        "long": "long",
        "double": "double",
        "float": "float",
        "boolean": "boolean",
        "date": "int",
        "timestamp": "long",
        "timestamptz": "long",
    }
    if source_type in prim:
        return prim[source_type]
    raise ValueError(
        f"cannot derive manifest Avro type for transform {transform!r} "
        f"over source type {source_type!r}"
    )
