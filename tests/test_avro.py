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


def test_avro_reversed_union_order_foreign_file(spark, tmp_path):
    """A spec-valid foreign file may declare the union as [T, "null"]
    (value branch 0, null branch 1). The reader must honor the
    declared null-branch index instead of assuming ["null", T]."""
    import os

    from delta_lake_spark.avro import _write_header, _zigzag_encode

    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "v", "type": ["long", "null"]},  # reversed order
        ],
    }
    block = bytearray()
    # row 1: id=1, v=42 -> union index 0 (the value branch here)
    block += _zigzag_encode(1) + _zigzag_encode(0) + _zigzag_encode(42)
    # row 2: id=2, v=null -> union index 1 (the null branch here)
    block += _zigzag_encode(2) + _zigzag_encode(1)
    d = str(tmp_path / "rev")
    os.makedirs(d)
    sync = b"S" * 16
    with open(d + "/part-00000.avro", "wb") as out:
        _write_header(out, schema, "null", sync)
        out.write(_zigzag_encode(2))
        out.write(_zigzag_encode(len(block)))
        out.write(bytes(block))
        out.write(sync)
    got = {r.id: r.v for r in read_avro(spark, d).collect()}
    assert got == {1: 42, 2: None}
    # a union index outside {0, 1} raises loudly, not silent garbage
    bad = bytearray()
    bad += _zigzag_encode(3) + _zigzag_encode(2)
    d2 = str(tmp_path / "badunion")
    os.makedirs(d2)
    with open(d2 + "/part-00000.avro", "wb") as out:
        _write_header(out, schema, "null", sync)
        out.write(_zigzag_encode(1))
        out.write(_zigzag_encode(len(bad)))
        out.write(bytes(bad))
        out.write(sync)
    with pytest.raises(Exception, match="bad union index"):
        read_avro(spark, d2).collect()


def test_avro_timestamp_instant_under_session_timezone(spark, tmp_path):
    """timestamp-micros is an INSTANT: under a non-UTC session zone the
    on-disk epoch micros must be zone-corrected (an external
    spec-compliant reader sees the true instant), and the roundtrip
    back through read_avro must return the original session-local wall
    clock."""
    import calendar
    import glob

    from delta_lake_spark.avro import _read_header, _zigzag_decode

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        from pyspark.sql import functions as F

        dt = datetime.datetime(2024, 6, 1, 12, 0, 0, 250000)
        df = spark.createDataFrame(
            [(1, dt)], "id long, ts timestamp"
        ).coalesce(1)
        # the instant Spark itself holds (epoch micros) is the spec for
        # what must land on disk — independent of how createDataFrame
        # zoned the naive input
        want = df.select(F.unix_micros("ts")).collect()[0][0]
        path = str(tmp_path / "tzinst")
        write_avro(df, path)
        buf = open(glob.glob(path + "/*.avro")[0], "rb").read()
        _, _, _, pos = _read_header(buf)
        _, pos = _zigzag_decode(buf, pos)  # n_records
        _, pos = _zigzag_decode(buf, pos)  # block size
        _, pos = _zigzag_decode(buf, pos)  # id union index
        _, pos = _zigzag_decode(buf, pos)  # id value
        _, pos = _zigzag_decode(buf, pos)  # ts union index
        micros, _ = _zigzag_decode(buf, pos)
        # the UDF saw the NY wall clock, so a timegm()-style encode
        # (the old bug) would land 4-5 h off this instant
        assert micros == want
        back = read_avro(spark, path).collect()[0]
        assert back.ts == dt
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_avro_tzinfo_offset_style_zones():
    """Spark's session timezone accepts java.time ZoneId OFFSET forms
    ('+08:00', 'GMT+8', '-0530'), not only region IDs — _tzinfo must
    parse them into fixed offsets instead of raising
    ZoneInfoNotFoundError."""
    import pytest as _pytest

    from delta_lake_spark.avro import _tzinfo

    ref = datetime.datetime(2024, 1, 1)
    cases = {
        "+08:00": 8 * 3600,
        "+8": 8 * 3600,
        "-0530": -(5 * 3600 + 30 * 60),
        "GMT+8": 8 * 3600,
        "UTC+08:00": 8 * 3600,
        "UT-5": -5 * 3600,
        "gmt-02:30": -(2 * 3600 + 30 * 60),
        "+08:00:30": 8 * 3600 + 30,
    }
    for zone, secs in cases.items():
        off = _tzinfo(zone).utcoffset(ref)
        assert off.total_seconds() == secs, zone
    # region IDs still resolve via ZoneInfo; garbage still raises
    assert _tzinfo("America/New_York").utcoffset(ref) is not None
    with _pytest.raises(Exception):
        _tzinfo("+25:00")
    with _pytest.raises(Exception):
        _tzinfo("Not/AZone")


def test_avro_tzinfo_rejects_non_zoneoffset_forms():
    """The offset grammar is anchored to the exact java.time
    ZoneOffset forms: mixed separators, over-bound totals WITH
    minutes (not just hh > 18), and one-digit-hour colon forms must
    raise — never silently parse into a fixed offset."""
    import pytest as _pytest

    from delta_lake_spark.avro import _tzinfo

    for bad in (
        "+08:0030",   # mixed separators
        "+0800:30",   # mixed separators the other way
        "+18:30",     # total over +18:00 with hh == 18
        "+1830",      # same, compact form
        "+18:00:01",  # one second over the bound
        "+8:30",      # colon forms require a two-digit hour
        "+080",       # three digits fit no form
        "GMT+18:30",  # prefix does not relax the bound
    ):
        with _pytest.raises(ValueError):
            _tzinfo(bad)
    # the exact boundary stays accepted
    ref = __import__("datetime").datetime(2024, 1, 1)
    assert _tzinfo("+18:00").utcoffset(ref).total_seconds() == 18 * 3600
    assert _tzinfo("-180000").utcoffset(ref).total_seconds() == -18 * 3600


def test_avro_timestamp_roundtrip_offset_session_zone(spark, tmp_path):
    """End-to-end write/read of a timestamp column under an
    offset-style session timezone ('+08:00') — the config shape that
    used to raise ZoneInfoNotFoundError at runtime."""
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "+08:00")
    try:
        from pyspark.sql import functions as F

        dt = datetime.datetime(2024, 6, 1, 12, 0, 0, 250000)
        df = spark.createDataFrame(
            [(1, dt)], "id long, ts timestamp"
        ).coalesce(1)
        want = df.select(F.unix_micros("ts")).collect()[0][0]
        path = str(tmp_path / "tzoff")
        write_avro(df, path)
        back = read_avro(spark, path)
        assert back.select(F.unix_micros("ts")).collect()[0][0] == want
        assert back.collect()[0].ts == dt
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


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
