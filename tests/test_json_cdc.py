"""REST-style JSON-lines CDC source: typed coercion against the declared
schema (incl. base64 binary), strict rejection of malformed events, and
the streaming twin feeding the same MERGE kernel."""

import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from moonlink_spark.operators.merge import merge_into
from moonlink_spark.sources.fixtures import create_images_table, generate_changes_df
from moonlink_spark.sources.json_cdc import read_json_cdc, stream_json_cdc  # noqa: F401
from moonlink_spark.streaming.ingest import ingest_cdc_dir

COLS = ["image_id", "w", "h", "fmt", "caption", "phash"]


def _rows(t):
    return sorted(tuple(r) for r in t.scan(columns=COLS).collect())


def test_json_cdc_round_trip_matches_parquet(spark, tmp_path):
    """The same change batch staged as JSONL (binary base64-encoded by the
    JSON writer) and as parquet must produce identical merge results —
    byte payloads included."""
    ta = create_images_table(spark, str(tmp_path / "a"), 400, seed=42)
    tb = create_images_table(spark, str(tmp_path / "b"), 400, seed=42)
    ch = generate_changes_df(spark, 400, 100, seed=42)
    jdir = str(tmp_path / "events.jsonl")
    ch.write.json(jdir)

    parsed = read_json_cdc(spark, jdir, ta.schema)
    assert parsed.schema["bytes"].dataType.typeName() == "binary"
    merge_into(ta, parsed, run_id="mj")
    merge_into(tb, ch, run_id="mp")
    assert _rows(ta) == _rows(tb)
    # byte-exact: compare payload digests too
    da = sorted(r[0] for r in ta.scan().select(F.md5("bytes")).collect())
    db = sorted(r[0] for r in tb.scan().select(F.md5("bytes")).collect())
    assert da == db


def test_json_cdc_strict_rejects_malformed(spark, tmp_path):
    t = create_images_table(spark, str(tmp_path / "t"), 50, seed=42)
    jdir = str(tmp_path / "ev")
    os.makedirs(jdir)
    with open(os.path.join(jdir, "part-0.json"), "w") as f:
        f.write('{"op": "I", "lsn": 1, "image_id": "img-42-000000000099"}\n')
        f.write("{this is not json\n")
        f.write('{"op": "X", "lsn": 2, "image_id": "img-42-000000000098"}\n')

    with pytest.raises(Exception) as ei:
        read_json_cdc(spark, jdir, t.schema).collect()
    assert "malformed CDC event" in str(ei.value)

    # tolerant mode: malformed + unknown-op rows dropped, valid row kept
    got = read_json_cdc(spark, jdir, t.schema, strict=False).collect()
    assert [r["image_id"] for r in got] == ["img-42-000000000099"]
    assert got[0]["op"] == "I" and got[0]["bytes"] is None


def test_streaming_json_ingest(spark, tmp_path):
    """ingest_cdc_dir(format='json'): the JSONL drop-dir drains through the
    same per-epoch MERGE commits as the parquet path."""
    t = create_images_table(spark, str(tmp_path / "t"), 300, seed=42)
    twin = create_images_table(spark, str(tmp_path / "twin"), 300, seed=42)
    ch = generate_changes_df(spark, 300, 80, seed=42)
    jdir = str(tmp_path / "drop")
    ch.coalesce(1).write.json(jdir)
    merge_into(twin, ch, run_id="tm")

    ingest_cdc_dir(t, jdir, str(tmp_path / "ckpt"), format="json")
    assert _rows(t) == _rows(twin)
    assert [s.operation for s in t.snapshots()].count("merge") == 1


def test_nested_binary_column_roundtrip(spark, tmp_path):
    """A BinaryType field nested inside a struct column (round-4 ADVICE):
    the JSON read schema remaps it to string at depth and the post-scan
    rebuild unbase64s it back, preserving NULL structs and sibling fields."""
    import base64

    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from moonlink_spark.sources.json_cdc import read_json_cdc

    schema = T.StructType([
        T.StructField("id", T.StringType(), False),
        T.StructField("blob", T.StructType([
            T.StructField("data", T.BinaryType(), True),
            T.StructField("n", T.LongType(), True),
        ]), True),
    ])
    payload = base64.b64encode(b"\x00\xffbin").decode()
    lines = "\n".join([
        '{"op": "I", "lsn": 1, "id": "a", "blob": {"data": "%s", "n": 7}}' % payload,
        '{"op": "I", "lsn": 2, "id": "b", "blob": null}',
        '{"op": "I", "lsn": 3, "id": "c", "blob": {"data": null, "n": 9}}',
    ])
    p = tmp_path / "ev.jsonl"
    p.write_text(lines)

    df = read_json_cdc(spark, str(p), schema)
    assert df.schema["blob"].dataType["data"].dataType == T.BinaryType()
    rows = {r["id"]: r for r in df.collect()}
    assert bytes(rows["a"]["blob"]["data"]) == b"\x00\xffbin"
    assert rows["a"]["blob"]["n"] == 7
    assert rows["b"]["blob"] is None
    assert rows["c"]["blob"]["data"] is None and rows["c"]["blob"]["n"] == 9


def test_map_binary_key_roundtrip(spark, tmp_path):
    """map<binary, binary> column (round-5 ADVICE): _read_type remaps map
    KEYS to base64 strings for the JSON scan, so the rebuild must
    transform_keys as well as transform_values — otherwise the returned
    column is map<string,...>, mismatching the declared table schema."""
    import base64

    import pyspark.sql.types as T

    from moonlink_spark.sources.json_cdc import read_json_cdc

    schema = T.StructType([
        T.StructField("id", T.StringType(), False),
        T.StructField("m", T.MapType(T.BinaryType(), T.BinaryType()), True),
    ])
    k = base64.b64encode(b"\x01key").decode()
    v = base64.b64encode(b"\x02val").decode()
    p = tmp_path / "ev.jsonl"
    p.write_text('{"op": "I", "lsn": 1, "id": "a", "m": {"%s": "%s"}}' % (k, v))

    df = read_json_cdc(spark, str(p), schema)
    mt = df.schema["m"].dataType
    assert mt.keyType == T.BinaryType() and mt.valueType == T.BinaryType()
    row = df.collect()[0]
    assert {bytes(kk): bytes(vv) for kk, vv in row["m"].items()} == {
        b"\x01key": b"\x02val"
    }
