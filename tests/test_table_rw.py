"""ACID read/write path: append, overwrite, partitioning, time travel,
schema enforcement/evolution, convert-to-delta. Mirrors the reference's
expected-failure probes (SURVEY.md §5.1)."""

import pytest
from pyspark.sql import functions as F

from delta_lake_spark import (
    DataFileLostError,
    DeltaTable,
    SchemaMismatchError,
    convert_to_delta,
    read_delta,
    write_delta,
)


def _events(spark, n=100, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5).cast("int").alias("device_id"),
        (F.col("id") * 1.5).alias("value"),
    )


def test_append_roundtrip(spark, tmp_table):
    df = _events(spark)
    v = write_delta(df, tmp_table, mode="append")
    assert v == 0
    got = read_delta(spark, tmp_table)
    assert got.count() == 100
    assert got.dtypes == df.dtypes  # names/types survive; parquet reads are nullable
    v2 = write_delta(_events(spark, 50, offset=100), tmp_table)
    assert v2 == 1
    assert read_delta(spark, tmp_table).count() == 150


def test_overwrite_and_time_travel(spark, tmp_table):
    write_delta(_events(spark, 100), tmp_table)
    write_delta(_events(spark, 30), tmp_table, mode="overwrite")
    assert read_delta(spark, tmp_table).count() == 30
    assert read_delta(spark, tmp_table, version=0).count() == 100


def test_partitioned_write_keeps_columns_and_prunes(spark, tmp_table):
    write_delta(_events(spark, 100), tmp_table, partition_by=["device_id"])
    got = read_delta(spark, tmp_table)
    assert set(got.columns) == {"event_id", "device_id", "value"}
    assert got.count() == 100
    pruned = read_delta(spark, tmp_table, partition_filter={"device_id": 3})
    assert pruned.count() == 20
    assert pruned.select("device_id").distinct().collect()[0][0] == 3
    # log records partition values on every file
    snap = DeltaTable.forPath(spark, tmp_table)._log.snapshot()
    assert all("device_id" in a.partitionValues for a in snap.files.values())


def test_schema_enforcement_rejects_mismatch(spark, tmp_table):
    write_delta(_events(spark, 10), tmp_table)
    bad_type = _events(spark, 10).withColumn("value", F.col("value").cast("string"))
    with pytest.raises(SchemaMismatchError):
        write_delta(bad_type, tmp_table)
    extra_col = _events(spark, 10).withColumn("device_type", F.lit("sensor"))
    with pytest.raises(SchemaMismatchError):
        write_delta(extra_col, tmp_table)


def test_merge_schema_evolution(spark, tmp_table):
    write_delta(_events(spark, 10), tmp_table)
    evolved = _events(spark, 5, offset=10).withColumn("device_type", F.lit("sensor"))
    write_delta(evolved, tmp_table, merge_schema=True)
    got = read_delta(spark, tmp_table)
    assert "device_type" in got.columns
    assert got.count() == 15
    # old rows read null for the new column
    assert got.filter(F.col("device_type").isNull()).count() == 10


def test_missing_columns_fill_null(spark, tmp_table):
    write_delta(_events(spark, 10), tmp_table)
    narrow = _events(spark, 5, offset=10).drop("value")
    write_delta(narrow, tmp_table)
    got = read_delta(spark, tmp_table)
    assert got.filter(F.col("value").isNull()).count() == 5


def test_convert_parquet_to_delta_partitioned(spark, tmp_path):
    p = str(tmp_path / "plain")
    _events(spark, 100).withColumnRenamed("device_id", "p_device_id").write.partitionBy(
        "p_device_id"
    ).parquet(p)
    convert_to_delta(spark, p, "p_device_id int")
    got = read_delta(spark, p)
    assert got.count() == 100
    assert dict(got.dtypes)["p_device_id"] == "int"
    assert got.filter(F.col("p_device_id") == 2).count() == 20


def test_vacuum_then_time_travel_fails(spark, tmp_table):
    write_delta(_events(spark, 50), tmp_table)
    write_delta(_events(spark, 20), tmp_table, mode="overwrite")
    dt = DeltaTable.forPath(spark, tmp_table)
    spark.conf.set("spark.delta_lake_spark.retentionDurationCheck.enabled", "false")
    try:
        deleted = dt.vacuum(0)
    finally:
        spark.conf.set("spark.delta_lake_spark.retentionDurationCheck.enabled", "true")
    assert deleted  # v0's files are unreferenced now
    assert read_delta(spark, tmp_table).count() == 20  # current still fine
    with pytest.raises(DataFileLostError):
        read_delta(spark, tmp_table, version=0).count()


def test_vacuum_retention_safety(spark, tmp_table):
    from delta_lake_spark import RetentionSafetyError

    write_delta(_events(spark, 10), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    with pytest.raises(RetentionSafetyError):
        dt.vacuum(0)


def test_history_and_detail(spark, tmp_table):
    write_delta(_events(spark, 10), tmp_table)
    write_delta(_events(spark, 10, offset=10), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    hist = dt.history().collect()
    assert [r.version for r in hist] == [1, 0]
    assert hist[0].operation == "APPEND"
    d = dt.detail().collect()[0]
    assert d.format == "delta_lake_spark"
    assert d.numFiles >= 1


def test_timestamp_as_of_time_travel(spark, tmp_table):
    """timestampAsOf: resolve the latest version committed at or before
    the requested instant (API + SQL surface)."""
    import json as _json
    import os as _os

    import pytest as _pytest

    from delta_lake_spark.errors import VersionNotFoundError
    from delta_lake_spark.log import DeltaLog

    write_delta(spark.range(10), tmp_table)          # v0
    write_delta(spark.range(10, 30), tmp_table)      # v1
    write_delta(spark.range(30, 35), tmp_table)      # v2

    # rewrite commit timestamps to known instants (ms since epoch)
    log_dir = _os.path.join(tmp_table, "_delta_log")
    instants = [1_000_000, 2_000_000, 3_000_000]
    for v, t in enumerate(instants):
        p = _os.path.join(log_dir, f"{v:020d}.json")
        lines = [_json.loads(x) for x in open(p)]
        for a in lines:
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = t
        with open(p, "w") as fh:
            for a in lines:
                fh.write(_json.dumps(a) + "\n")

    log = DeltaLog(tmp_table)
    assert log.version_at_timestamp(1_500_000) == 0
    assert log.version_at_timestamp(2_000_000) == 1
    assert log.version_at_timestamp(9_999_999) == 2
    with _pytest.raises(VersionNotFoundError):
        log.version_at_timestamp(999)

    assert read_delta(spark, tmp_table, timestamp=1_500_000).count() == 10
    assert read_delta(spark, tmp_table, timestamp=2_500_000).count() == 30
    with _pytest.raises(ValueError):
        read_delta(spark, tmp_table, version=1, timestamp=1_500_000)

    # SQL surface: TIMESTAMP AS OF with an ISO string (epoch 2_000_000 ms
    # = 1970-01-01 00:33:20 UTC)
    from delta_lake_spark.catalog import Catalog
    from delta_lake_spark.sql import sql as dsql

    cat = Catalog(spark)
    dsql(cat, f"CREATE TABLE tt_tbl USING DELTA LOCATION '{tmp_table}'")
    n = dsql(
        cat,
        "SELECT COUNT(*) AS n FROM tt_tbl TIMESTAMP AS OF '1970-01-01 00:33:20'",
    ).first()["n"]
    assert n == 30


def test_files_metadata_table(spark, tmp_path):
    from delta_lake_spark.table import DeltaTable
    from delta_lake_spark.writer import write_delta

    p = str(tmp_path / "t")
    write_delta(
        spark.createDataFrame(
            [(i, "a" if i % 2 else "b") for i in range(10)], "id long, k string"
        ),
        p,
        partition_by=["k"],
    )
    dt = DeltaTable.forPath(spark, p)
    files = dt.files()
    rows = files.collect()
    assert sum(r.num_records for r in rows) == 10
    assert all(not r.has_deletion_vector for r in rows)
    import json

    parts = {json.loads(r.partition_values).get("k") for r in rows}
    assert parts == {"a", "b"}
    dt.delete("id = 0", use_dv=True)
    assert dt.files().filter("has_deletion_vector").count() >= 1


def test_optimized_write_one_file_per_partition(spark, tmp_table):
    """Partitioned stages shuffle on the partition columns first: a
    many-task source writes ONE file per partition value, not one
    sliver per (task x partition)."""
    from delta_lake_spark import DeltaTable, read_delta, write_delta

    df = (
        spark.range(1000)
        .selectExpr("id", "CAST(id % 4 AS INT) AS g")
        .repartition(16)  # many upstream tasks, all holding all 4 groups
    )
    write_delta(df, tmp_table, partition_by=["g"])
    files = DeltaTable.forPath(spark, tmp_table).files().collect()
    assert len(files) == 4  # one per partition value
    assert read_delta(spark, tmp_table).count() == 1000
