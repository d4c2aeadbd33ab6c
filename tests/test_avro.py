"""Avro OCF source/sink (pure stdlib implementation, avro.py): typed
roundtrips through both codecs, the nullable/NaN convention, schema
rejection, and malformed-file raises."""

import datetime
import math
import shutil

import pytest

from delta_lake_spark.avro import (
    avro_schema_for,
    read_avro,
    write_avro,
)


def test_avro_roundtrip_all_types_both_codecs(spark, tmp_path):
    rows = [
        (
            1, 7, "alpha", 1.5, 2.25, True, b"\x00\xff",
            datetime.date(2024, 1, 2),
            datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
        ),
        (2, None, None, None, None, None, None, None, None),
        (
            3, -7, "γράμμα", -2.5, -0.125, False, b"",
            datetime.date(1969, 12, 31),
            datetime.datetime(1970, 1, 1, 0, 0, 0),
        ),
    ]
    df = spark.createDataFrame(
        rows,
        "id long, i int, s string, f float, d double, b boolean,"
        " raw binary, dt date, ts timestamp_ntz",
    ).repartition(2)
    orig = {r.id: r for r in df.collect()}
    for codec in ("null", "deflate"):
        path = str(tmp_path / f"rt_{codec}")
        shutil.rmtree(path, ignore_errors=True)
        manifest = write_avro(df, path, codec=codec)
        assert manifest.count() == 2  # one part file per partition
        assert sum(r.n_records for r in manifest.collect()) == 3
        back = read_avro(spark, path)
        assert [f.name for f in back.schema.fields] == [
            "id", "i", "s", "f", "d", "b", "raw", "dt", "ts",
        ]
        got = {r.id: r for r in back.collect()}
        assert set(got) == {1, 2, 3}
        for k in got:
            for field in ("i", "s", "f", "d", "b", "raw", "dt", "ts"):
                assert getattr(got[k], field) == getattr(orig[k], field), (
                    codec, k, field,
                )


def test_avro_blocks_and_long_edges(spark, tmp_path):
    # multi-block file (records_per_block below row count) + zigzag
    # edges (min/max long, -1, 0)
    rows = [
        (0, 0), (1, -1), (2, 2**63 - 1), (3, -(2**63)), (4, 12345),
    ] + [(i, i * 977) for i in range(5, 300)]
    df = spark.createDataFrame(rows, "id long, v long").coalesce(1)
    path = str(tmp_path / "blocks")
    write_avro(df, path, records_per_block=64)
    got = {r.id: r.v for r in read_avro(spark, path).collect()}
    assert got == {i: v for i, v in rows}


def test_avro_nan_null_convention_and_schema_reject(spark, tmp_path):
    # nullable double: NaN unifies to null (the Arrow-interchange loss
    # every pandas path shares) — documented contract
    df = spark.createDataFrame(
        [(1, float("nan")), (2, 0.5), (3, None)], "id long, d double"
    ).coalesce(1)
    path = str(tmp_path / "nan")
    write_avro(df, path)
    got = {r.id: r.d for r in read_avro(spark, path).collect()}
    assert got[2] == 0.5 and got[1] is None and got[3] is None
    # unsupported (nested) types raise at schema derivation
    nested = spark.createDataFrame(
        [(1, [1, 2])], "id long, xs array<int>"
    )
    with pytest.raises(ValueError, match="unsupported Spark type"):
        avro_schema_for(nested)
    with pytest.raises(ValueError, match="codec must be"):
        write_avro(df, str(tmp_path / "x"), codec="snappy")


def test_avro_malformed_raises(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "id long, s string").coalesce(1)
    path = str(tmp_path / "mal")
    write_avro(df, path)
    # corrupt magic
    f = path + "/part-00000.avro"
    buf = bytearray(open(f, "rb").read())
    bad1 = str(tmp_path / "bad1")
    import os

    os.makedirs(bad1)
    open(bad1 + "/part-00000.avro", "wb").write(b"XXXX" + bytes(buf[4:]))
    with pytest.raises(Exception, match="bad magic"):
        read_avro(spark, bad1).collect()
    # corrupt the sync marker of the first block
    bad2 = str(tmp_path / "bad2")
    os.makedirs(bad2)
    flipped = bytearray(buf)
    flipped[-1] ^= 0xFF
    open(bad2 + "/part-00000.avro", "wb").write(bytes(flipped))
    with pytest.raises(Exception, match="sync marker|truncated|malformed"):
        read_avro(spark, bad2).collect()
    with pytest.raises(ValueError, match="no .avro files"):
        read_avro(spark, str(tmp_path / "empty_dir_nope"))


def test_avro_nan_encodes_as_ieee_value():
    """The binary encoder itself preserves NaN — the NaN->null
    unification happens only at the nullable-field writer branch."""
    import struct

    from delta_lake_spark.avro import _decode_value, _encode_value

    out = bytearray()
    _encode_value("double", float("nan"), out)
    assert math.isnan(struct.unpack("<d", bytes(out))[0])
    v, pos = _decode_value("double", bytes(out), 0)
    assert math.isnan(v) and pos == 8
