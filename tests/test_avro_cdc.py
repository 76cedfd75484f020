"""Avro CDC source: landed Kafka-topic dumps of binary Avro event payloads
→ the (op, lsn, <row>) change frame (reference surface:
rest_ingest/avro_converter.rs, rest_source.rs event framing). The binary
codec is from-spec (Avro 1.12 §Binary encoding) and cross-validated BOTH
ways against the Java org.apache.avro implementation on Spark's classpath."""

import io
import json

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from moonlink_spark.operators.merge import merge_into
from moonlink_spark.sources.avro_cdc import (
    _compile_decoder,
    _compile_encoder,
    _event_struct,
    read_avro_cdc,
    spark_to_avro_schema,
    stage_avro_dump,
)
from moonlink_spark.table import MoonTable

SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("w", T.IntegerType(), True),
    T.StructField("flag", T.BooleanType(), True),
    T.StructField("blob", T.BinaryType(), True),
])

EV_SCHEMA = T.StructType([
    T.StructField("op", T.StringType(), False),
    T.StructField("lsn", T.LongType(), False),
    *SCHEMA.fields,
])


def _stage(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, EV_SCHEMA)
    p = str(tmp_path / "dump")
    stage_avro_dump(df, p)
    return p


def test_avro_roundtrip_and_merge(spark, tmp_path):
    rows = [
        ("I", 10, "a1", 640, True, bytearray(b"\x00\xff")),
        ("I", 10, "a2", 480, False, None),
        ("U", 20, "a1", 1024, None, None),
        ("D", 20, "a2", None, None, None),
    ]
    p = _stage(spark, tmp_path, rows)
    ch = read_avro_cdc(spark, p, SCHEMA)
    assert ch.schema == _event_struct(SCHEMA)
    got = {(r["op"], r["image_id"]): r for r in ch.collect()}
    assert set(got) == {("I", "a1"), ("I", "a2"), ("U", "a1"), ("D", "a2")}
    assert got[("I", "a1")]["w"] == 640 and got[("I", "a1")]["flag"] is True
    assert bytes(got[("I", "a1")]["blob"]) == b"\x00\xff"
    assert got[("U", "a1")]["flag"] is None
    assert got[("D", "a2")]["w"] is None

    t = MoonTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         key_columns=["image_id"])
    t.append(spark.createDataFrame(
        [("a2", 1, True, None), ("a9", 9, False, None)], SCHEMA),
        run_id="base")
    merge_into(t, ch, run_id="m1")
    final = {r["image_id"]: r for r in t.scan().collect()}
    assert set(final) == {"a1", "a9"}
    assert final["a1"]["w"] == 1024
    assert t.current_flush_lsn() == 20


def test_avro_nested_types_roundtrip(spark, tmp_path):
    """Nested record / array / map columns survive the codec — the converter
    accepts the same composite surface as the reference's schema_util."""
    nested = T.StructType([
        T.StructField("id", T.StringType(), False),
        T.StructField("meta", T.StructType([
            T.StructField("k", T.StringType(), True),
            T.StructField("n", T.LongType(), True),
        ]), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("attrs", T.MapType(T.StringType(), T.LongType()), True),
    ])
    ev = T.StructType([
        T.StructField("op", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        *nested.fields,
    ])
    rows = [
        ("I", 1, "x", {"k": "a", "n": 7}, ["t1", "t2"], {"p": 1, "q": 2}),
        ("I", 2, "y", None, [], None),
    ]
    stage_avro_dump(spark.createDataFrame(rows, ev), str(tmp_path / "d"))
    got = {r["id"]: r for r in
           read_avro_cdc(spark, str(tmp_path / "d"), nested).collect()}
    assert got["x"]["meta"]["n"] == 7 and got["x"]["tags"] == ["t1", "t2"]
    assert dict(got["x"]["attrs"]) == {"p": 1, "q": 2}
    assert got["y"]["meta"] is None and got["y"]["tags"] == []
    assert got["y"]["attrs"] is None


def test_avro_strict_rejects(spark, tmp_path):
    # garbage payload
    bad = spark.createDataFrame([(bytearray(b"\xff\xfe\x99garbage"),)],
                                "value binary")
    bad.write.parquet(str(tmp_path / "bad"))
    with pytest.raises(Exception, match="malformed avro"):
        read_avro_cdc(spark, str(tmp_path / "bad"), SCHEMA).collect()

    # structurally valid record with an unknown op
    p = _stage(spark, tmp_path, [("X", 10, "a1", 1, True, None)])
    with pytest.raises(Exception, match="unknown op"):
        read_avro_cdc(spark, p, SCHEMA).collect()

    # trailing bytes after a valid record
    enc = [( f.name, _compile_encoder(f.dataType, f.nullable))
           for f in _event_struct(SCHEMA).fields]
    out = io.BytesIO()
    for name, e in enc:
        e(out, {"op": "I", "lsn": 1, "image_id": "a", "w": 1,
                "flag": True, "blob": b"z"}[name])
    out.write(b"\x00extra")
    spark.createDataFrame([(bytearray(out.getvalue()),)], "value binary") \
        .write.parquet(str(tmp_path / "trail"))
    with pytest.raises(Exception, match="trailing"):
        read_avro_cdc(spark, str(tmp_path / "trail"), SCHEMA).collect()

    # strict=False drops all three instead
    assert read_avro_cdc(spark, str(tmp_path / "bad"), SCHEMA,
                         strict=False).count() == 0
    assert read_avro_cdc(spark, p, SCHEMA, strict=False).count() == 0


def test_avro_streaming_ingest(spark, tmp_path):
    from moonlink_spark.streaming.ingest import ingest_cdc_dir

    t = MoonTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         key_columns=["image_id"])
    t.append(spark.createDataFrame([("a2", 1, True, None)], SCHEMA),
             run_id="base")
    p = _stage(spark, tmp_path, [
        ("I", 10, "a1", 640, True, None),
        ("D", 20, "a2", None, None, None),
    ])
    ingest_cdc_dir(t, p, str(tmp_path / "ckpt"), format="avro")
    got = {r["image_id"] for r in t.scan().collect()}
    assert got == {"a1"}
    assert t.current_flush_lsn() == 20


def test_avro_codec_matches_java_avro(spark):
    """Cross-validation against the independent Java implementation
    (org.apache.avro, on Spark's classpath): Java-encoded payloads decode
    identically with our from-spec decoder, and our encoder's bytes decode
    identically with Java's GenericDatumReader — both directions, including
    null unions, bytes, and negative zigzag values."""
    jvm = spark._jvm
    schema_json = json.dumps(spark_to_avro_schema(SCHEMA))
    jschema = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    ev = _event_struct(SCHEMA)

    # Java encode -> our decode
    rec = jvm.org.apache.avro.generic.GenericData.Record(jschema)
    rec.put("op", "U")
    rec.put("lsn", -3)  # negative exercises zigzag
    rec.put("image_id", "img-1")
    rec.put("w", 1024)
    rec.put("flag", True)
    rec.put("blob", jvm.java.nio.ByteBuffer.wrap(bytearray(b"\x00\x7f\xff")))
    writer = jvm.org.apache.avro.generic.GenericDatumWriter(jschema)
    baos = jvm.java.io.ByteArrayOutputStream()
    benc = jvm.org.apache.avro.io.EncoderFactory.get().binaryEncoder(baos, None)
    writer.write(rec, benc)
    benc.flush()
    payload = bytes(baos.toByteArray())

    decs = [(f.name, _compile_decoder(f.dataType, f.nullable)) for f in ev.fields]
    pos, row = 0, {}
    for name, dec in decs:
        row[name], pos = dec(payload, pos)
    assert pos == len(payload)
    assert row == {"op": "U", "lsn": -3, "image_id": "img-1", "w": 1024,
                   "flag": True, "blob": b"\x00\x7f\xff"}

    # our encode -> Java decode (with a null union this time)
    encs = [(f.name, _compile_encoder(f.dataType, f.nullable)) for f in ev.fields]
    out = io.BytesIO()
    vals = {"op": "D", "lsn": 99, "image_id": "gone", "w": None,
            "flag": False, "blob": None}
    for name, enc in encs:
        enc(out, vals[name])
    reader = jvm.org.apache.avro.generic.GenericDatumReader(jschema)
    bdec = jvm.org.apache.avro.io.DecoderFactory.get().binaryDecoder(
        bytearray(out.getvalue()), None)
    jrec = reader.read(None, bdec)
    assert str(jrec.get("op")) == "D" and jrec.get("lsn") == 99
    assert str(jrec.get("image_id")) == "gone"
    assert jrec.get("w") is None and jrec.get("flag") is False
    assert jrec.get("blob") is None


# ------------------------------------------- schema registry + wire format

OLD_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("w", T.IntegerType(), True),
])


def test_avro_registry_idempotent(tmp_path):
    """Registering a semantically identical schema returns the existing id
    (Confluent contract); a different schema draws the next id."""
    from moonlink_spark.sources.avro_cdc import (
        load_avro_registry,
        register_avro_schema,
    )

    reg = str(tmp_path / "registry")
    s1 = spark_to_avro_schema(OLD_SCHEMA)
    s2 = spark_to_avro_schema(SCHEMA)
    id1 = register_avro_schema(reg, s1)
    assert register_avro_schema(reg, json.dumps(s1)) == id1
    id2 = register_avro_schema(reg, s2)
    assert id2 != id1
    assert set(load_avro_registry(reg)) == {id1, id2}


def test_avro_schema_inversion():
    """avro_to_spark_schema inverts spark_to_avro_schema on the supported
    subset, preserving nullability and nested types."""
    from moonlink_spark.sources.avro_cdc import avro_to_spark_schema

    nested = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("meta", T.StructType([
            T.StructField("x", T.LongType(), True)]), True),
        T.StructField("tags", T.ArrayType(T.StringType(), True), True),
        T.StructField("attrs", T.MapType(T.StringType(), T.DoubleType(), True), True),
        T.StructField("ts", T.TimestampType(), True),
    ])
    st = avro_to_spark_schema(spark_to_avro_schema(nested))
    assert st == _event_struct(nested)

    with pytest.raises(ValueError, match="op/lsn"):
        avro_to_spark_schema(
            {"type": "record", "name": "r",
             "fields": [{"name": "a", "type": "string"}]})


def test_avro_wire_multi_version_decode_and_merge(spark, tmp_path):
    """Confluent wire framing (0x00 + schema-id + body): events produced
    under TWO registered schema versions coexist in one landed dump; each
    decodes with its own version and coerces onto the current table schema
    (since-added columns → NULL), then merges — the reference's evolving
    registered-schema converter semantics (avro_converter.rs,
    rest_api.rs:122-135)."""
    import shutil

    from moonlink_spark.sources.avro_cdc import (
        read_avro_cdc_wire,
        register_avro_schema,
        stage_avro_wire_dump,
    )

    reg = str(tmp_path / "registry")
    id_old = register_avro_schema(reg, spark_to_avro_schema(OLD_SCHEMA))
    id_new = register_avro_schema(reg, spark_to_avro_schema(SCHEMA))

    old_ev = T.StructType([
        T.StructField("op", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        *OLD_SCHEMA.fields,
    ])
    d1 = spark.createDataFrame(
        [("I", 10, "a1", 640), ("I", 10, "a2", 480)], old_ev)
    d2 = spark.createDataFrame(
        [("U", 20, "a1", 1024, True, bytearray(b"\x01\x02")),
         ("D", 20, "a2", None, None, None)], EV_SCHEMA)
    stage_avro_wire_dump(d1, str(tmp_path / "b1"), id_old)
    stage_avro_wire_dump(d2, str(tmp_path / "b2"), id_new)
    topic = tmp_path / "topic"
    topic.mkdir()
    for i, b in enumerate(("b1", "b2")):
        for f in (tmp_path / b).glob("*.parquet"):
            shutil.copy(f, topic / f"{i}-{f.name}")

    ch = read_avro_cdc_wire(spark, str(topic), SCHEMA, reg)
    assert ch.schema == _event_struct(SCHEMA)
    got = {(r["op"], r["image_id"]): r for r in ch.collect()}
    assert set(got) == {("I", "a1"), ("I", "a2"), ("U", "a1"), ("D", "a2")}
    # old-version rows surface the since-added columns as NULL
    assert got[("I", "a1")]["flag"] is None and got[("I", "a1")]["blob"] is None
    assert got[("U", "a1")]["flag"] is True

    t = MoonTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         key_columns=["image_id"])
    merge_into(t, ch, run_id="m1")
    final = {r["image_id"]: r for r in t.scan().collect()}
    assert set(final) == {"a1"}
    assert final["a1"]["w"] == 1024 and final["a1"]["flag"] is True


def test_avro_wire_strict_rejects(spark, tmp_path):
    """Strict mode fails loudly on bad magic, unknown schema id, or a
    truncated frame; non-strict drops those rows and keeps the rest."""
    import struct as _struct

    from moonlink_spark.sources.avro_cdc import (
        read_avro_cdc_wire,
        register_avro_schema,
        stage_avro_wire_dump,
    )

    reg = str(tmp_path / "registry")
    sid = register_avro_schema(reg, spark_to_avro_schema(OLD_SCHEMA))
    old_ev = T.StructType([
        T.StructField("op", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        *OLD_SCHEMA.fields,
    ])
    stage_avro_wire_dump(
        spark.createDataFrame([("I", 5, "ok", 1)], old_ev),
        str(tmp_path / "good"), sid)
    good = spark.read.parquet(str(tmp_path / "good")).collect()[0]["value"]
    bad_rows = [
        (bytearray(b"\x07" + bytes(good[1:])),),            # bad magic
        (bytearray(_struct.pack(">bI", 0, 999) + bytes(good[5:])),),  # unknown id
        (bytearray(b"\x00\x00"),),                          # truncated
        (bytearray(bytes(good)),),                          # valid row rides along
    ]
    spark.createDataFrame(bad_rows, "value binary") \
        .write.parquet(str(tmp_path / "mixed"))

    with pytest.raises(Exception, match="malformed"):
        read_avro_cdc_wire(spark, str(tmp_path / "mixed"), OLD_SCHEMA, reg).collect()
    kept = read_avro_cdc_wire(spark, str(tmp_path / "mixed"), OLD_SCHEMA, reg,
                              strict=False).collect()
    assert [(r["op"], r["image_id"]) for r in kept] == [("I", "ok")]


def test_avro_wire_streaming_ingest(spark, tmp_path):
    """ingest_cdc_dir(format='avro_wire') drains a registry-framed topic
    dump through the epoch loop — the streaming twin of the wire reader."""
    from moonlink_spark.sources.avro_cdc import (
        register_avro_schema,
        stage_avro_wire_dump,
    )
    from moonlink_spark.streaming.ingest import ingest_cdc_dir

    reg = str(tmp_path / "registry")
    sid = register_avro_schema(reg, spark_to_avro_schema(SCHEMA))
    t = MoonTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         key_columns=["image_id"])
    t.append(spark.createDataFrame([("a2", 1, True, None)], SCHEMA),
             run_id="base")
    stage_avro_wire_dump(
        spark.createDataFrame([
            ("I", 10, "a1", 640, True, None),
            ("D", 20, "a2", None, None, None),
        ], EV_SCHEMA),
        str(tmp_path / "topic"), sid)
    with pytest.raises(ValueError, match="avro_registry_dir"):
        ingest_cdc_dir(t, str(tmp_path / "topic"), str(tmp_path / "ckpt0"),
                       format="avro_wire")
    ingest_cdc_dir(t, str(tmp_path / "topic"), str(tmp_path / "ckpt"),
                   format="avro_wire", avro_registry_dir=reg)
    assert {r["image_id"] for r in t.scan().collect()} == {"a1"}
    assert t.current_flush_lsn() == 20
