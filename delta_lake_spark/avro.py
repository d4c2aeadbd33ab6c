"""Avro Object Container File source/sink in pure stdlib.

The environment ships neither the ``spark-avro`` external module (it is
not bundled with a pyspark pip install and there is no network to fetch
the jar) nor a Python avro package — probed at round 10 — yet Avro is
the second-most-common landing format after JSON for the ETL tier the
reference covers (its Kafka-simulated feed would be Avro in most real
deployments). So, like the JPEG/GIF/WAV/TAR/MP4 tiers in
``operators/multimodal.py``, the container format is implemented
directly from the public specification
(https://avro.apache.org/docs/1.11.1/specification/): zigzag-varint
primitives, the OCF header/metadata/sync-marker framing, null and
deflate codecs — no third-party code.

Scope (the flat-record subset an ETL landing zone uses): records whose
fields are boolean / int / long / float / double / string / bytes,
date (int + logicalType date) and timestamp-micros (long), each
optionally nullable as a two-branch union with "null" (the sink always
writes ["null", T]; the source accepts either order, honoring the
declared null-branch index per the spec). timestamp-micros is an
instant: encode/decode go through spark.sql.session.timeZone, so the
on-disk epoch micros are correct for external readers under any
session zone. Nested records, arrays, maps, enums and fixed raise
loudly.

Scale shape: writing is one ``mapInPandas`` pass — every partition
serializes its own ``part-NNNNN.avro`` file executor-side and yields
ONE manifest row (path, n_records), so the only driver traffic is the
O(#partitions) manifest; reading lists the directory driver-side
(metadata-bounded), reads ONE header for the schema, and parses files
executor-side from a parallelized path relation. On a real cluster the
open/write calls go through the mounted object store exactly like
parquet part files.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = b"Obj\x01"

_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
    "timestamp_ntz": {
        "type": "long",
        "logicalType": "local-timestamp-micros",
    },
}

_AVRO_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "bytes": "binary",
}


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    u = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")
    return (u >> 1) ^ -(u & 1), pos


def avro_schema_for(df: DataFrame, name: str = "row") -> dict:
    """Avro record schema (as a dict) for a DataFrame's flat schema.
    Nullable Spark fields become the union ["null", T]."""
    fields = []
    for f in df.schema.fields:
        t = f.dataType.typeName()
        if t not in _SPARK_TO_AVRO:
            raise ValueError(
                f"unsupported Spark type for Avro sink: {f.name} {t} "
                "(flat boolean/int/long/float/double/string/binary/"
                "date/timestamp only)"
            )
        at = _SPARK_TO_AVRO[t]
        fields.append(
            {"name": f.name, "type": ["null", at] if f.nullable else at}
        )
    return {"type": "record", "name": name, "fields": fields}


def _field_plan(schema: dict) -> list[tuple[str, str, bool, int]]:
    """(name, primitive avro type, nullable, null_branch_index) per
    field; logical types collapse to their storage primitive tagged
    'date'/'timestamp'. The spec allows the union in either order
    (["null", T] or [T, "null"]) — the null branch's index is recorded
    per field and used by BOTH the encode and decode paths, so a
    spec-valid foreign file declaring [T, "null"] decodes correctly
    instead of reading every value as null."""
    if schema.get("type") != "record":
        raise ValueError(f"not a record schema: {schema.get('type')!r}")
    plan = []
    for f in schema["fields"]:
        t = f["type"]
        nullable = False
        null_idx = 0
        if isinstance(t, list):
            if len(t) != 2 or "null" not in t:
                raise ValueError(f"unsupported union for field {f['name']}")
            nullable = True
            null_idx = t.index("null")
            t = t[0] if t[1] == "null" else t[1]
        if isinstance(t, dict):
            lt = t.get("logicalType")
            if lt == "date" and t.get("type") == "int":
                t = "date"
            elif lt == "timestamp-micros" and t.get("type") == "long":
                t = "timestamp"
            elif lt == "local-timestamp-micros" and t.get("type") == "long":
                t = "timestamp_ntz"
            else:
                t = t.get("type")
        if t not in (
            "boolean", "int", "long", "float", "double", "string",
            "bytes", "date", "timestamp", "timestamp_ntz",
        ):
            raise ValueError(
                f"unsupported Avro type {t!r} for field {f['name']}"
            )
        plan.append((f["name"], t, nullable, null_idx))
    return plan


def _tzinfo(tz: str):
    """tzinfo for a Spark session-timezone string.

    Spark's ``spark.sql.session.timeZone`` accepts the full java.time
    ZoneId grammar, not only region IDs: bare offsets ('+08:00',
    '-0530', '+8'), prefixed offsets ('GMT+8', 'UTC+08:00', 'UT-5'),
    and 'Z'. Parse the offset forms into a fixed ``datetime.timezone``
    directly — ZoneInfo only knows region IDs and would raise
    ZoneInfoNotFoundError on them — and fall back to ZoneInfo for
    region IDs like 'America/New_York'.

    The grammar is anchored to the exact java.time ZoneOffset forms
    (+h, +hh, +hh:mm, +hhmm, +hh:mm:ss, +hhmmss — separators
    consistent within one string), and the TOTAL is bounded at
    ±18:00, matching ZoneOffset's invariants: mixed separators
    ('+08:0030') and over-bound totals with minutes ('+18:30') must
    raise, never silently yield a fixed offset."""
    import datetime
    import re

    if tz.upper() in ("UTC", "GMT", "UT", "Z", "ETC/UTC", "ETC/GMT"):
        return datetime.timezone.utc
    m = re.fullmatch(
        r"(?:GMT|UTC|UT)?([+-])"
        r"(?:(\d{1,2})"                      # +h / +hh
        r"|(\d{2}):(\d{2})(?::(\d{2}))?"     # +hh:mm[:ss]
        r"|(\d{2})(\d{2})(\d{2})?)",         # +hhmm[ss]
        tz,
        re.IGNORECASE,
    )
    if m:
        sign = -1 if m.group(1) == "-" else 1
        hh = int(m.group(2) or m.group(3) or m.group(6))
        mm = int(m.group(4) or m.group(7) or 0)
        ss = int(m.group(5) or m.group(8) or 0)
        total = hh * 3600 + mm * 60 + ss
        if mm > 59 or ss > 59 or total > 18 * 3600:
            raise ValueError(f"invalid zone offset {tz!r}")
        return datetime.timezone(
            sign * datetime.timedelta(seconds=total)
        )
    if re.match(r"(?:GMT|UTC|UT)?[+-]", tz, re.IGNORECASE):
        # offset-shaped but outside the ZoneOffset grammar (mixed
        # separators, wrong digit counts) — ZoneInfo would also
        # reject it, but raise the precise error here
        raise ValueError(f"invalid zone offset {tz!r}")
    from zoneinfo import ZoneInfo

    return ZoneInfo(tz)


def _encode_value(t: str, v, out: bytearray, tz: str = "UTC") -> None:
    if t == "boolean":
        out.append(1 if v else 0)
    elif t in ("int", "long"):
        out += _zigzag_encode(int(v))
    elif t == "date":
        import datetime

        out += _zigzag_encode((v - datetime.date(1970, 1, 1)).days)
    elif t == "timestamp":
        # Avro timestamp-micros is an INSTANT (micros since the UTC
        # epoch). Arrow hands the pandas UDF session-local naive
        # datetimes, so localize in the session zone before taking the
        # epoch delta — a spec-compliant external reader then sees the
        # correct instant under any spark.sql.session.timeZone.
        import datetime

        dt = v.to_pydatetime() if hasattr(v, "to_pydatetime") else v
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=_tzinfo(tz))
        delta = dt - datetime.datetime(
            1970, 1, 1, tzinfo=datetime.timezone.utc
        )
        micros = (
            delta.days * 86_400 + delta.seconds
        ) * 1_000_000 + delta.microseconds
        out += _zigzag_encode(micros)
    elif t == "timestamp_ntz":
        # local-timestamp-micros is a WALL CLOCK — zone-free by spec
        import calendar

        micros = (
            calendar.timegm(v.timetuple()) * 1_000_000 + v.microsecond
        )
        out += _zigzag_encode(micros)
    elif t == "float":
        out += struct.pack("<f", float(v))
    elif t == "double":
        out += struct.pack("<d", float(v))
    elif t == "string":
        b = str(v).encode("utf-8")
        out += _zigzag_encode(len(b)) + b
    elif t == "bytes":
        b = bytes(v)
        out += _zigzag_encode(len(b)) + b
    else:  # pragma: no cover - _field_plan rejects earlier
        raise ValueError(f"unsupported type {t}")


def _decode_value(t: str, buf: bytes, pos: int, tz: str = "UTC"):
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if t == "date":
        import datetime

        days, pos = _zigzag_decode(buf, pos)
        return datetime.date(1970, 1, 1) + datetime.timedelta(days=days), pos
    if t == "timestamp":
        # instant -> session-local naive wall clock (what Spark expects
        # back from a pandas UDF for a timestamp column)
        import datetime

        micros, pos = _zigzag_decode(buf, pos)
        aware = datetime.datetime(
            1970, 1, 1, tzinfo=datetime.timezone.utc
        ) + datetime.timedelta(microseconds=micros)
        return aware.astimezone(_tzinfo(tz)).replace(tzinfo=None), pos
    if t == "timestamp_ntz":
        import datetime

        micros, pos = _zigzag_decode(buf, pos)
        return (
            datetime.datetime(1970, 1, 1)
            + datetime.timedelta(microseconds=micros)
        ), pos
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("string", "bytes"):
        n, pos = _zigzag_decode(buf, pos)
        if n < 0 or pos + n > len(buf):
            raise ValueError("bad length")
        raw = buf[pos : pos + n]
        return (raw.decode("utf-8") if t == "string" else bytes(raw)), pos + n
    raise ValueError(f"unsupported type {t}")


def _write_header(out: io.BufferedWriter, schema: dict, codec: str,
                  sync: bytes) -> None:
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    out.write(_zigzag_encode(len(meta)))
    for k, v in sorted(meta.items()):
        kb = k.encode()
        out.write(_zigzag_encode(len(kb)) + kb)
        out.write(_zigzag_encode(len(v)) + v)
    out.write(_zigzag_encode(0))
    out.write(sync)


def _read_header(buf: bytes) -> tuple[dict, str, bytes, int]:
    if buf[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    meta = {}
    while True:
        n, pos = _zigzag_decode(buf, pos)
        if n == 0:
            break
        if n < 0:  # spec: negative count precedes a byte-size long
            n = -n
            _, pos = _zigzag_decode(buf, pos)
        for _ in range(n):
            kl, pos = _zigzag_decode(buf, pos)
            k = buf[pos : pos + kl].decode()
            pos += kl
            vl, pos = _zigzag_decode(buf, pos)
            meta[k] = buf[pos : pos + vl]
            pos += vl
    sync = buf[pos : pos + 16]
    pos += 16
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro.codec {codec!r}")
    return schema, codec, sync, pos


def write_avro(
    df: DataFrame,
    path: str,
    codec: str = "null",
    records_per_block: int = 4096,
) -> DataFrame:
    """Write a flat DataFrame as a directory of Avro OCF part files —
    one per partition, serialized executor-side. Returns the collected
    manifest as a small DataFrame (file, n_records); the write is
    therefore eager, like DataFrameWriter. ``codec``: 'null' or
    'deflate' (stdlib zlib, raw-deflate framing per the spec).

    Null convention: Spark's Arrow interchange unifies float NaN with
    null, so nullable float/double fields write NaN as null (the same
    loss every pandas-UDF path in Spark has); non-nullable float
    fields preserve NaN as an IEEE value."""
    import hashlib
    import os

    if codec not in ("null", "deflate"):
        raise ValueError(f"codec must be 'null' or 'deflate', got {codec!r}")
    schema = avro_schema_for(df)
    plan = _field_plan(schema)
    os.makedirs(path, exist_ok=True)
    spark = df.sparkSession
    tz = spark.conf.get("spark.sql.session.timeZone")
    names = [n for n, _, _, _ in plan]

    def part(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.avro")
        sync = hashlib.md5(fname.encode()).digest()
        n_total = 0
        block = bytearray()
        n_block = 0
        with open(fname, "wb") as out:
            _write_header(out, schema, codec, sync)

            def flush():
                nonlocal block, n_block
                if not n_block:
                    return
                data = bytes(block)
                if codec == "deflate":
                    c = zlib.compressobj(wbits=-15)
                    data = c.compress(data) + c.flush()
                out.write(_zigzag_encode(n_block))
                out.write(_zigzag_encode(len(data)))
                out.write(data)
                out.write(sync)
                block = bytearray()
                n_block = 0

            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    for (name, t, nullable, null_idx), v in zip(plan, row):
                        # pandas surfaces nulls as None/NaN/NaT, and
                        # Spark's Arrow interchange itself unifies
                        # float NaN with null — so a nullable float
                        # field cannot distinguish them end to end;
                        # this sink adopts the same convention (NaN
                        # -> null when nullable, NaN preserved when
                        # the field is declared non-nullable)
                        isnull = v is None or (
                            not isinstance(v, (bytes, str)) and pd.isna(v)
                        )
                        if isnull and not nullable and t in ("float", "double"):
                            isnull = v is None
                        if nullable:
                            block += _zigzag_encode(
                                null_idx if isnull else 1 - null_idx
                            )
                            if isnull:
                                continue
                        elif isnull:
                            raise ValueError(
                                f"null in non-nullable field {name}"
                            )
                        _encode_value(t, v, block, tz)
                    n_block += 1
                    n_total += 1
                    if n_block >= records_per_block:
                        flush()
            flush()
        yield pd.DataFrame({"file": [fname], "n_records": [n_total]})

    manifest = df.select(names).mapInPandas(
        part, schema="file string, n_records long"
    )
    rows = manifest.collect()  # bounded: one row per partition
    return spark.createDataFrame(rows, "file string, n_records long")


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of Avro OCF part files (or a single file). The
    schema comes from ONE header read driver-side; file payloads parse
    executor-side from a parallelized path relation. Malformed files
    (bad magic, sync-marker mismatch, truncated blocks) raise with
    their path."""
    import os

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".avro")
        )
    elif os.path.isfile(path):
        files = [path]
    else:
        files = []
    if not files:
        raise ValueError(f"no .avro files under {path}")
    with open(files[0], "rb") as fh:
        head = fh.read(65536)
    schema, _, _, _ = _read_header(head)
    plan = _field_plan(schema)
    spark_types = dict(
        _AVRO_TO_SPARK,
        date="date",
        timestamp="timestamp",
        timestamp_ntz="timestamp_ntz",
    )
    ddl = ", ".join(f"`{n}` {spark_types[t]}" for n, t, _, _ in plan)
    tz = spark.conf.get("spark.sql.session.timeZone")
    paths = spark.createDataFrame([(f,) for f in files], "file string")

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            cols = {n: [] for n, _, _, _ in plan}
            for fname in pdf["file"]:
                with open(fname, "rb") as fh:
                    buf = fh.read()
                try:
                    fschema, codec, sync, pos = _read_header(buf)
                    fplan = _field_plan(fschema)
                    if [p[:2] for p in fplan] != [p[:2] for p in plan]:
                        raise ValueError("schema mismatch across files")
                    while pos < len(buf):
                        n_rec, pos = _zigzag_decode(buf, pos)
                        size, pos = _zigzag_decode(buf, pos)
                        data = buf[pos : pos + size]
                        if len(data) != size:
                            raise ValueError("truncated block")
                        pos += size
                        if buf[pos : pos + 16] != sync:
                            raise ValueError("sync marker mismatch")
                        pos += 16
                        if codec == "deflate":
                            data = zlib.decompress(data, wbits=-15)
                        dpos = 0
                        for _ in range(n_rec):
                            for name, t, nullable, null_idx in fplan:
                                if nullable:
                                    idx, dpos = _zigzag_decode(data, dpos)
                                    if idx not in (0, 1):
                                        raise ValueError(
                                            f"bad union index {idx} for "
                                            f"field {name}"
                                        )
                                    if idx == null_idx:
                                        cols[name].append(None)
                                        continue
                                v, dpos = _decode_value(t, data, dpos, tz)
                                cols[name].append(v)
                        if dpos != len(data):
                            raise ValueError("trailing bytes in block")
                except (ValueError, KeyError, struct.error) as e:
                    raise ValueError(
                        f"malformed avro file {fname}: {e}"
                    ) from e
            yield pd.DataFrame(cols)

    return paths.mapInPandas(parse, schema=ddl)
