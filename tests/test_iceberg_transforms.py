"""Partition transforms in the external spec reader: bucket[N] /
truncate[W] / year-month-day-hour pruning over hand-built spec-compliant
tables (the shapes Spark/Flink/Trino writers actually produce).

The Murmur3 vectors are the Iceberg spec's own published Appendix-B test
values — if those pin, every bucket boundary agrees with Java writers.
"""

import json
import os
from datetime import date, datetime

import pytest

from moonlink_spark.iceberg.transforms import (
    apply_transform,
    bucket_bytes,
    is_supported_transform,
    murmur3_x86_32,
)


def test_murmur3_spec_vectors():
    """Iceberg spec Appendix B: hash values every implementation must
    reproduce bit-for-bit."""
    assert murmur3_x86_32(bucket_bytes(34, "int")) == 2017239379
    assert murmur3_x86_32(bucket_bytes(34, "long")) == 2017239379
    assert murmur3_x86_32(bucket_bytes("iceberg", "string")) == 1210000089
    assert murmur3_x86_32(bucket_bytes(date(2017, 11, 16), "date")) == -653330422
    assert (
        murmur3_x86_32(bucket_bytes(datetime(2017, 11, 16, 22, 31, 8), "timestamp"))
        == -2047944441
    )


def test_transform_semantics():
    assert apply_transform("bucket[16]", 34, "int") == 2017239379 % 16
    assert apply_transform("truncate[10]", -1, "int") == -10  # floor, not trunc
    assert apply_transform("truncate[10]", 17, "long") == 10
    assert apply_transform("truncate[3]", "iceberg", "string") == "ice"
    ts = datetime(2017, 11, 16, 22, 31, 8)
    assert apply_transform("day", ts, "timestamp") == 17486
    assert apply_transform("hour", ts, "timestamp") == 17486 * 24 + 22
    assert apply_transform("month", date(2017, 11, 16), "date") == 47 * 12 + 10
    assert apply_transform("year", date(2017, 11, 16), "date") == 47
    assert apply_transform("identity", ts, "timestamp") == 1510871468000000
    assert apply_transform("bucket[8]", None, "string") is None  # NULL propagates
    assert is_supported_transform("bucket[512]")
    assert not is_supported_transform("zorder")
    with pytest.raises(ValueError, match="unsupported partition transform"):
        apply_transform("sha256", 1, "int")


def _build_bucket_day_table(root, n_buckets=4):
    """Spec-compliant v2 table partitioned by (day(ts), bucket[N](id)):
    ids 0..99 on 2024-01-01, 100..199 on 2024-01-02, one data file per
    (day, bucket) — exactly what an Iceberg-native writer produces."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from moonlink_spark.iceberg.avro_io import write_avro_file
    from moonlink_spark.iceberg.spec import MANIFEST_FILE_SCHEMA, manifest_entry_schema

    (root / "data").mkdir(parents=True)
    (root / "metadata").mkdir()

    schema_json = json.dumps(
        {
            "type": "struct",
            "schema-id": 0,
            "fields": [
                {"id": 1, "name": "id", "required": True, "type": "long"},
                {"id": 2, "name": "ts", "required": False, "type": "timestamp"},
                {"id": 3, "name": "v", "required": False, "type": "long"},
            ],
        }
    )
    spec_fields = [
        {"name": "ts_day", "transform": "day", "source-id": 2, "field-id": 1000},
        {
            "name": "id_bucket",
            "transform": f"bucket[{n_buckets}]",
            "source-id": 1,
            "field-id": 1001,
        },
    ]
    part_avro = [
        {"name": "ts_day", "field-id": 1000, "type": "int"},
        {"name": "id_bucket", "field-id": 1001, "type": "int"},
    ]

    days = [datetime(2024, 1, 1, 6, 30), datetime(2024, 1, 2, 18, 45)]
    entries = []
    groups = {}
    for i in range(200):
        d = days[i // 100]
        b = apply_transform(f"bucket[{n_buckets}]", i, "long")
        groups.setdefault((apply_transform("day", d, "timestamp"), b), []).append(
            (i, d)
        )
    for (day_val, b), rows in sorted(groups.items()):
        p = str(root / "data" / f"d{day_val}-b{b}.parquet")
        pq.write_table(
            pa.table(
                {
                    "id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                    "v": pa.array([r[0] * 10 for r in rows], pa.int64()),
                }
            ),
            p,
        )
        entries.append(
            {
                "status": 1,
                "snapshot_id": 9,
                "sequence_number": 1,
                "file_sequence_number": 1,
                "data_file": {
                    "content": 0,
                    "file_path": p,
                    "file_format": "PARQUET",
                    "partition": {"ts_day": int(day_val), "id_bucket": int(b)},
                    "record_count": len(rows),
                    "file_size_in_bytes": os.path.getsize(p),
                },
            }
        )

    mdir = str(root / "metadata")
    mp = os.path.join(mdir, "manifest-data.avro")
    size = write_avro_file(
        mp,
        manifest_entry_schema(part_avro),
        entries,
        metadata={
            "schema": schema_json.encode(),
            "schema-id": b"0",
            "partition-spec": json.dumps(spec_fields).encode(),
            "partition-spec-id": b"0",
            "format-version": b"2",
            "content": b"data",
        },
    )
    ml = os.path.join(mdir, "snap-9-1-x.avro")
    write_avro_file(
        ml,
        MANIFEST_FILE_SCHEMA,
        [
            {
                "manifest_path": mp,
                "manifest_length": size,
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "min_sequence_number": 1,
                "added_snapshot_id": 9,
                "added_data_files_count": len(entries),
                "existing_data_files_count": 0,
                "deleted_data_files_count": 0,
                "added_rows_count": 200,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
                "partitions": None,
            }
        ],
        metadata={
            "format-version": b"2",
            "snapshot-id": b"9",
            "sequence-number": b"1",
        },
    )
    meta = {
        "format-version": 2,
        "table-uuid": "1" * 36,
        "location": str(root),
        "last-sequence-number": 1,
        "last-updated-ms": 1,
        "last-column-id": 3,
        "current-schema-id": 0,
        "schemas": [json.loads(schema_json)],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "last-partition-id": 1001,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": 9,
        "snapshots": [
            {
                "snapshot-id": 9,
                "sequence-number": 1,
                "timestamp-ms": 1,
                "manifest-list": ml,
                "summary": {"operation": "append"},
                "schema-id": 0,
            }
        ],
        "snapshot-log": [{"snapshot-id": 9, "timestamp-ms": 1}],
        "metadata-log": [],
    }
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(mdir, "version-hint.text"), "w") as f:
        f.write("1")
    return len(groups)


def test_bucket_and_day_pruning(spark, tmp_path):
    from moonlink_spark.iceberg import read_iceberg_scan

    root = tmp_path / "ext"
    n_files = _build_bucket_day_table(root)

    full = read_iceberg_scan(spark, str(root))
    assert full.count() == 200
    assert len(full.inputFiles()) == n_files

    # bucket pruning: files of bucket(57) only, across both days — the
    # filter prunes FILES; the composed row filter isolates the row
    b57 = apply_transform("bucket[4]", 57, "long")
    by_id = read_iceberg_scan(spark, str(root), partition_filter={"id": 57})
    kept = len(by_id.inputFiles())
    assert kept == sum(
        1 for f in full.inputFiles() if f"-b{b57}.parquet" in f
    ) and 0 < kept < n_files
    assert by_id.filter("id = 57").count() == 1
    assert by_id.filter("id = 57").first()["v"] == 570

    # day pruning: one day's files, datetime filter value
    jan2 = read_iceberg_scan(
        spark, str(root), partition_filter={"ts": datetime(2024, 1, 2, 0, 0, 1)}
    )
    assert jan2.count() == 100
    assert {r["id"] for r in jan2.select("id").collect()} == set(range(100, 200))
    assert all("-b" in f and "d19724-" in f for f in jan2.inputFiles())

    # composed: both transforms prune (1 file: the day-2 file of bucket(157))
    both = read_iceberg_scan(
        spark,
        str(root),
        partition_filter={"ts": datetime(2024, 1, 2, 12, 0), "id": 157},
    )
    assert len(both.inputFiles()) == 1
    assert both.filter("id = 157").count() == 1

    # unknown filter column still rejected with the full source list
    with pytest.raises(ValueError, match="non-partition column"):
        read_iceberg_scan(spark, str(root), partition_filter={"nope": 1})

    # unknown FUTURE transform still rejected up front
    mpath = os.path.join(str(root), "metadata", "v1.metadata.json")
    meta = json.load(open(mpath))
    meta["partition-specs"][0]["fields"][0]["transform"] = "zstd-shard"
    json.dump(meta, open(mpath, "w"))
    with pytest.raises(ValueError, match="unsupported partition transform"):
        read_iceberg_scan(spark, str(root))


def test_range_partition_filter(spark, tmp_path):
    """(lo, hi) filter values range-prune order-preserving transforms: a
    2-day window over the day-partitioned table plans exactly those days'
    files; a range on the bucket source keeps everything (hashing destroys
    order, so bucket fields must not range-prune)."""
    from moonlink_spark.iceberg import read_iceberg_scan

    root = tmp_path / "ext"
    n_files = _build_bucket_day_table(root)
    full = read_iceberg_scan(spark, str(root))

    # both days inside the window → everything; sub-day window → one day
    win = read_iceberg_scan(
        spark,
        str(root),
        partition_filter={
            "ts": (datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 23, 59))
        },
    )
    assert win.count() == 100
    assert {r["id"] for r in win.select("id").collect()} == set(range(100))
    assert len(win.inputFiles()) < n_files

    both = read_iceberg_scan(
        spark,
        str(root),
        partition_filter={"ts": (datetime(2024, 1, 1), datetime(2024, 1, 2, 12))},
    )
    assert both.count() == 200

    # range on the bucketed source: no pruning, full row set
    rng = read_iceberg_scan(
        spark, str(root), partition_filter={"id": (50, 60)}
    )
    assert rng.count() == 200
    assert len(rng.inputFiles()) == len(full.inputFiles())

    with pytest.raises(ValueError, match="must be \\(lo, hi\\)"):
        read_iceberg_scan(
            spark, str(root), partition_filter={"id": (1, 2, 3)}
        ).count()


def test_bounds_filter_pruning(spark, tmp_path):
    """Column-bounds pruning off manifest lower/upper_bounds: a clustered
    export carries per-file Appendix-D bound bytes, and a bounds_filter
    range plans only intersecting files — the external-reader equivalent
    of the native clustered_range_scan. Exact results come from composing
    a row filter over the pruned scan."""
    from pyspark.sql import functions as F

    from moonlink_spark.iceberg import export_iceberg, read_iceberg_scan
    from moonlink_spark.operators.optimize import optimize
    from moonlink_spark.sources.fixtures import create_images_table

    t = create_images_table(spark, str(tmp_path / "tbl"), 2000, seed=42)
    # single-dimension z-order == range clustering on phash: per-file
    # phash intervals are disjoint, so a bounds window MUST prune
    total = sum(f.file_size_bytes for f in t.data_files())
    optimize(t, mode="full", cluster_by=["phash"],
             target_bytes=max(1, total // 6), run_id="z1")
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)

    full = read_iceberg_scan(spark, dest)
    n_files = len(full.inputFiles())
    assert n_files >= 4

    los = [f.stats["phash"]["min"] for f in t.data_files()]
    his = [f.stats["phash"]["max"] for f in t.data_files()]
    lo, hi = sorted(los)[0], sorted(his)[1]  # a window covering ~2 files

    rng = read_iceberg_scan(spark, dest, bounds_filter={"phash": (lo, hi)})
    kept = len(rng.inputFiles())
    assert 0 < kept < n_files
    expect = t.scan().filter(
        (F.col("phash") >= lo) & (F.col("phash") <= hi)
    ).count()
    got = rng.filter((F.col("phash") >= lo) & (F.col("phash") <= hi)).count()
    assert got == expect > 0

    # exact-value form + empty result shortcut
    nothing = read_iceberg_scan(
        spark, dest, bounds_filter={"phash": (max(his) + 1, max(his) + 2)}
    )
    assert nothing.count() == 0

    # unknown column rejected
    with pytest.raises(ValueError, match="unknown"):
        read_iceberg_scan(spark, dest, bounds_filter={"nope": 1})

    # string bounds work too (fmt is a low-cardinality string)
    jp = read_iceberg_scan(spark, dest, bounds_filter={"fmt": "jpeg"})
    assert jp.filter("fmt = 'jpeg'").count() == t.scan().filter(
        "fmt = 'jpeg'"
    ).count()


def test_decode_bound_roundtrip():
    import datetime as _dt

    import pyspark.sql.types as T

    from moonlink_spark.iceberg.spec import bound_bytes, decode_bound

    cases = [
        (T.StringType(), "string", "héllo"),
        (T.LongType(), "long", -123456789012),
        (T.IntegerType(), "int", -42),
        (T.DoubleType(), "double", 3.5),
        (T.FloatType(), "float", 2.0),
        (T.BooleanType(), "boolean", True),
        (T.DateType(), "date", "2024-01-15"),
        (T.TimestampType(), "timestamptz", "2024-01-15T12:34:56.789012"),
    ]
    for dt, itype, v in cases:
        b = bound_bytes(dt, v)
        out = decode_bound(itype, b)
        if itype == "date":
            assert out == (_dt.date(2024, 1, 15) - _dt.date(1970, 1, 1)).days
        elif itype == "timestamptz":
            assert out == 1705322096789012
        else:
            assert out == v, (itype, out, v)


def test_import_adopts_transform_partitioned_table(spark, tmp_path):
    """import_iceberg adopts a bucket+day-partitioned external table: the
    derived-transform sources are always materialized in the data files
    (unlike identity), so adoption is metadata-only and the MoonTable scan
    equals the spec scan."""
    from moonlink_spark.iceberg import import_iceberg, read_iceberg_scan

    root = tmp_path / "ext"
    _build_bucket_day_table(root)
    t = import_iceberg(spark, str(root), str(tmp_path / "adopted"))
    assert t.scan().count() == 200
    spec_ids = {r["id"] for r in read_iceberg_scan(
        spark, str(root), columns=["id"]).collect()}
    native_ids = {r["id"] for r in t.scan(columns=["id"]).collect()}
    assert native_ids == spec_ids and len(native_ids) == 200


def test_manifest_summary_skipping(spark, tmp_path, monkeypatch):
    """Manifest-LIST level pruning: per-manifest field_summary bounds let
    the reader skip whole manifest files before opening them — a
    day-filtered scan over day-grouped manifests must never read the
    other day's manifest Avro (O(manifests) planning, not O(files))."""
    import pyarrow as pa

    import moonlink_spark.iceberg.reader as rd
    from moonlink_spark.iceberg import read_iceberg_scan
    from moonlink_spark.iceberg.external import write_external_iceberg

    schema_fields = [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "ts", "required": False, "type": "timestamp"},
    ]
    spec_fields = [
        {"name": "ts_day", "transform": "day", "source-id": 2, "field-id": 1000}
    ]
    days = [datetime(2024, 1, 1, 8), datetime(2024, 1, 2, 9)]
    parts = []
    for di, d in enumerate(days):
        for b in range(3):  # 3 files per day
            ids = [di * 100 + b * 10 + k for k in range(10)]
            parts.append(
                (
                    {"ts_day": apply_transform("day", d, "timestamp")},
                    pa.table(
                        {
                            "id": pa.array(ids, pa.int64()),
                            "ts": pa.array([d] * 10, pa.timestamp("us")),
                        }
                    ),
                )
            )
    root = str(tmp_path / "ext")
    # 3 entries per manifest == one manifest per day
    write_external_iceberg(root, schema_fields, spec_fields, parts,
                           entries_per_manifest=3)

    opened: list[str] = []
    real = rd._manifest_entries

    def spy(spark_, path):
        opened.append(path)
        return real(spark_, path)

    monkeypatch.setattr(rd, "_manifest_entries", spy)

    jan2 = read_iceberg_scan(
        spark, root, partition_filter={"ts": datetime(2024, 1, 2, 12)}
    )
    assert len(opened) == 1  # day-1's manifest never opened
    assert jan2.count() == 30
    assert {r["id"] for r in jan2.select("id").collect()} == {
        100 + b * 10 + k for b in range(3) for k in range(10)
    }

    # filter outside every summary: ALL manifests skipped, clean empty scan
    opened.clear()
    none = read_iceberg_scan(
        spark, root, partition_filter={"ts": datetime(2030, 1, 1)}
    )
    assert opened == [] and none.count() == 0

    # range filter covering both days: nothing skipped, all rows
    opened.clear()
    both = read_iceberg_scan(
        spark, root,
        partition_filter={"ts": (datetime(2024, 1, 1), datetime(2024, 1, 2, 23))},
    )
    assert len(opened) == 2 and both.count() == 60


def test_export_writes_manifest_summaries(spark, tmp_path):
    """Engine exports carry field_summary bounds in the manifest list, so
    EXTERNAL readers get manifest skipping over our mirrors too."""
    from pyspark.sql import functions as F

    from moonlink_spark.iceberg import export_iceberg
    from moonlink_spark.iceberg.reader import (
        _manifest_list_entries,
        load_iceberg_metadata,
    )
    from moonlink_spark.operators.optimize import optimize
    from moonlink_spark.sources.fixtures import IMAGES_SCHEMA, generate_images_df
    from moonlink_spark.table import MoonTable

    t = MoonTable.create(spark, str(tmp_path / "tbl"), IMAGES_SCHEMA,
                         key_columns=["image_id"])
    t.append(generate_images_df(spark, 400, seed=42), run_id="a1")
    optimize(t, mode="full", cluster_by=["fmt"], curve="align", run_id="al")
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest, partition_by=["fmt"])

    meta = load_iceberg_metadata(dest)
    snap = meta["snapshots"][-1]
    data_ms = [
        m for m in _manifest_list_entries(spark, snap["manifest-list"])
        if m["content"] == 0
    ]
    assert data_ms and all(m.get("partitions") for m in data_ms)
    s = data_ms[0]["partitions"][0]
    assert s["lower_bound"] is not None and not s["contains_null"]
    assert s["lower_bound"].decode() in ("jpeg", "png")
