"""wal2json CDC source: Postgres logical-decoding transaction lines →
the (op, lsn, <row>) change frame, parsed JVM-side (reference surface:
pg_replicate/conversions/cdc_event.rs, moonlink_sink.rs final-LSN
stamping)."""

import base64  # noqa: F401  (kept for parity with json_cdc tests)

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from moonlink_spark.operators.merge import merge_into
from moonlink_spark.sources.wal2json import read_wal2json
from moonlink_spark.table import MoonTable

SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType(), False),
    T.StructField("w", T.IntegerType(), True),
    T.StructField("flag", T.BooleanType(), True),
    T.StructField("blob", T.BinaryType(), True),
])


def _lines():
    return "\n".join([
        # txn 1 @ LSN 0/10: two inserts — both stamped with the txn LSN
        '{"xid": 1, "nextlsn": "0/10", "change": ['
        '{"kind":"insert","schema":"public","table":"images",'
        '"columnnames":["image_id","w","flag","blob"],'
        '"columnvalues":["a1",640,true,"\\\\x00ff"]},'
        '{"kind":"insert","schema":"public","table":"images",'
        '"columnnames":["image_id","w","flag","blob"],'
        '"columnvalues":["a2",480,"f",null]}]}',
        # txn 2 @ LSN 1/5 (high half set): update a1, delete a2 via oldkeys
        '{"xid": 2, "lsn": "1/5", "change": ['
        '{"kind":"update","schema":"public","table":"images",'
        '"columnnames":["image_id","w","flag","blob"],'
        '"columnvalues":["a1",1024,false,null]},'
        '{"kind":"delete","schema":"public","table":"images",'
        '"oldkeys":{"keynames":["image_id"],"keyvalues":["a2"]}}]}',
        # other-table noise, filtered out by table=
        '{"xid": 3, "nextlsn": "1/6", "change": ['
        '{"kind":"insert","schema":"public","table":"other",'
        '"columnnames":["image_id"],"columnvalues":["zz"]}]}',
    ])


def test_wal2json_parse_and_merge(spark, tmp_path):
    p = tmp_path / "wal.jsonl"
    p.write_text(_lines())
    ch = read_wal2json(spark, str(p), SCHEMA, table="images")
    rows = {(r["op"], r["image_id"]): r for r in ch.collect()}
    assert set(rows) == {("I", "a1"), ("I", "a2"), ("U", "a1"), ("D", "a2")}
    # txn-level final-LSN stamping + X/Y hex parse: (X<<32)|Y
    assert rows[("I", "a1")]["lsn"] == 0x10
    assert rows[("U", "a1")]["lsn"] == (1 << 32) + 5
    assert rows[("I", "a1")]["w"] == 640 and rows[("I", "a1")]["flag"] is True
    assert bytes(rows[("I", "a1")]["blob"]) == b"\x00\xff"
    assert rows[("I", "a2")]["flag"] is False  # Postgres 'f' text
    # delete reconstructed from oldkeys: key present, non-key NULL
    assert rows[("D", "a2")]["w"] is None

    # end-to-end: the frame drives the same MERGE kernel as every source
    t = MoonTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         key_columns=["image_id"])
    t.append(spark.createDataFrame(
        [("a2", 1, True, None), ("a9", 9, False, None)], SCHEMA),
        run_id="base")
    merge_into(t, ch, run_id="m1")
    got = {r["image_id"]: r for r in t.scan().collect()}
    assert set(got) == {"a1", "a9"}  # a2 deleted, a1 upserted
    assert got["a1"]["w"] == 1024 and got["a1"]["flag"] is False
    assert t.current_flush_lsn() == (1 << 32) + 5


def test_wal2json_pk_changing_update(spark, tmp_path):
    """A PK-changing UPDATE (oldkeys differ from the new row's key) must
    retire the OLD key's row — the reference applies update as
    delete(old)+insert(new) (moonlink_sink.rs); wal2json ships oldkeys on
    updates precisely for this. A same-key update with oldkeys present must
    NOT emit an extra delete."""
    p = tmp_path / "wal.jsonl"
    p.write_text("\n".join([
        '{"xid": 1, "nextlsn": "0/10", "change": ['
        '{"kind":"insert","table":"images",'
        '"columnnames":["image_id","w","flag","blob"],'
        '"columnvalues":["k1",10,true,null]},'
        '{"kind":"insert","table":"images",'
        '"columnnames":["image_id","w","flag","blob"],'
        '"columnvalues":["k2",20,true,null]}]}',
        # same-key update WITH oldkeys: no extra delete
        '{"xid": 2, "nextlsn": "0/20", "change": ['
        '{"kind":"update","table":"images",'
        '"columnnames":["image_id","w","flag","blob"],'
        '"columnvalues":["k2",21,false,null],'
        '"oldkeys":{"keynames":["image_id"],"keyvalues":["k2"]}}]}',
        # PK-changing update: k1 renamed to k3
        '{"xid": 3, "nextlsn": "0/30", "change": ['
        '{"kind":"update","table":"images",'
        '"columnnames":["image_id","w","flag","blob"],'
        '"columnvalues":["k3",11,true,null],'
        '"oldkeys":{"keynames":["image_id"],"keyvalues":["k1"]}}]}',
    ]))
    ch = read_wal2json(spark, str(p), SCHEMA, table="images")
    ops = sorted((r["op"], r["image_id"], r["lsn"]) for r in ch.collect())
    # exactly ONE synthetic delete — for the old key of the renaming txn,
    # stamped with that transaction's LSN
    assert ops == [
        ("D", "k1", 0x30),
        ("I", "k1", 0x10), ("I", "k2", 0x10),
        ("U", "k2", 0x20), ("U", "k3", 0x30),
    ]
    d_row = [r for r in ch.collect() if r["op"] == "D"][0]
    assert d_row["w"] is None  # reconstructed from oldkeys: non-key NULL

    # end-to-end through the merge kernel: old key gone, new key present
    t = MoonTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         key_columns=["image_id"])
    merge_into(t, ch, run_id="m1")
    got = {r["image_id"]: r for r in t.scan().collect()}
    assert set(got) == {"k2", "k3"}
    assert got["k3"]["w"] == 11 and got["k2"]["w"] == 21


def test_wal2json_strict_rejects(spark, tmp_path):
    bad = tmp_path / "bad.jsonl"
    bad.write_text('{"xid": 1, "nextlsn": "0/10", "change": [}')
    with pytest.raises(Exception, match="malformed"):
        read_wal2json(spark, str(bad), SCHEMA).collect()

    unk = tmp_path / "unk.jsonl"
    unk.write_text('{"xid":1,"nextlsn":"0/10","change":[{"kind":"truncate",'
                   '"table":"images"}]}')
    with pytest.raises(Exception, match="unknown wal2json kind"):
        read_wal2json(spark, str(unk), SCHEMA).collect()

    nolsn = tmp_path / "nolsn.jsonl"
    nolsn.write_text('{"xid":1,"change":[{"kind":"insert","table":"images",'
                     '"columnnames":["image_id"],"columnvalues":["a"]}]}')
    with pytest.raises(Exception, match="include-lsn"):
        read_wal2json(spark, str(nolsn), SCHEMA).collect()

    # strict=False drops the malformed line instead
    assert read_wal2json(spark, str(bad), SCHEMA, strict=False).count() == 0


def test_wal2json_streaming_ingest(spark, tmp_path):
    """ingest_cdc_dir(format="wal2json"): the streaming twin drains a WAL
    drop-directory with one transactional MERGE per micro-batch — the
    shape of the reference's continuous replication loop."""
    from moonlink_spark.streaming.ingest import ingest_cdc_dir

    t = MoonTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         key_columns=["image_id"])
    t.append(spark.createDataFrame(
        [("a2", 1, True, None), ("a9", 9, False, None)], SCHEMA),
        run_id="base")
    stage = tmp_path / "wal"
    stage.mkdir()
    (stage / "w1.jsonl").write_text(_lines())
    ingest_cdc_dir(t, str(stage), str(tmp_path / "ckpt"),
                   format="wal2json", wal2json_table="images")
    got = {r["image_id"]: r for r in t.scan().collect()}
    assert set(got) == {"a1", "a9"}
    assert got["a1"]["w"] == 1024
    assert t.current_flush_lsn() == (1 << 32) + 5
