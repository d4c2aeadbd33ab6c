"""SQL front-end: the reference's compliance-pipeline SQL shapes
(05_compliance.py) running end-to-end against our catalog + engine."""

import pytest
from pyspark.sql import functions as F

from delta_lake_spark import read_delta, write_delta
from delta_lake_spark.catalog import Catalog
from delta_lake_spark.sql import sql


@pytest.fixture()
def catalog(spark, tmp_path):
    users = spark.createDataFrame(
        [
            (1, '{"user":"alice","v":10}', "new"),
            (2, '{"user":"bob","v":20}', "new"),
            (3, '{"user":"eve","v":30}', "new"),
            (4, '{"user":"mallory","v":40}', "new"),
        ],
        "user_id long, value string, status string",
    )
    path = str(tmp_path / "silver")
    write_delta(users, path)
    cat = Catalog(spark)
    sql(cat, f"CREATE TABLE health_silver USING DELTA LOCATION '{path}'")
    return cat


def test_select_over_view(spark, catalog):
    got = sql(catalog, "SELECT COUNT(*) AS n FROM health_silver").collect()
    assert got[0].n == 4


def test_sql_merge_delete_rlike(spark, catalog):
    """GDPR delete via MERGE with RLIKE condition (05_compliance.py:100-107)."""
    spark.createDataFrame([("alice",), ("eve",)], "user string") \
        .createOrReplaceTempView("deletion_users")
    sql(
        catalog,
        "MERGE INTO health_silver AS t USING deletion_users AS d "
        "ON t.value RLIKE d.user "
        "WHEN MATCHED THEN DELETE",
    )
    got = sql(catalog, "SELECT user_id FROM health_silver ORDER BY user_id").collect()
    assert [r.user_id for r in got] == [2, 4]


def test_sql_merge_update_and_insert(spark, catalog):
    spark.createDataFrame(
        [(1, "loaded"), (99, "late")], "user_id long, new_status string"
    ).createOrReplaceTempView("updates")
    sql(
        catalog,
        "MERGE INTO health_silver AS t USING updates AS u ON t.user_id = u.user_id "
        "WHEN MATCHED THEN UPDATE SET status = u.new_status "
        "WHEN NOT MATCHED THEN INSERT (user_id, value, status) "
        "VALUES (u.user_id, '{}', u.new_status)",
    )
    rows = {
        r.user_id: r.status
        for r in sql(catalog, "SELECT user_id, status FROM health_silver").collect()
    }
    assert rows[1] == "loaded" and rows[99] == "late" and rows[2] == "new"


def test_sql_delete_and_time_travel_and_insert_back(spark, catalog):
    """Rollback-by-reinsert (05_compliance.py:203-209): DELETE, then
    INSERT INTO ... SELECT * FROM t VERSION AS OF 0 WHERE ..."""
    sql(catalog, "DELETE FROM health_silver WHERE user_id <= 2")
    assert sql(catalog, "SELECT COUNT(*) AS n FROM health_silver").collect()[0].n == 2
    # v0 still visible through time travel
    n_v0 = sql(
        catalog, "SELECT COUNT(*) AS n FROM health_silver VERSION AS OF 0"
    ).collect()[0].n
    assert n_v0 == 4
    sql(
        catalog,
        "INSERT INTO health_silver "
        "SELECT * FROM health_silver VERSION AS OF 0 WHERE user_id = 1",
    )
    got = sql(catalog, "SELECT user_id FROM health_silver ORDER BY user_id").collect()
    assert [r.user_id for r in got] == [1, 3, 4]


def test_sql_describe_history_and_vacuum(spark, catalog):
    sql(catalog, "DELETE FROM health_silver WHERE user_id = 1")
    hist = sql(catalog, "DESCRIBE HISTORY health_silver").collect()
    assert hist[0].operation == "DELETE"
    detail = sql(catalog, "DESCRIBE DETAIL health_silver").collect()[0]
    assert detail.format == "delta_lake_spark"
    # low-retention vacuum refuses until the safety flag is disabled
    from delta_lake_spark import RetentionSafetyError

    with pytest.raises(RetentionSafetyError):
        sql(catalog, "VACUUM health_silver RETAIN 0 HOURS")
    spark.conf.set("spark.delta_lake_spark.retentionDurationCheck.enabled", "false")
    try:
        out = sql(catalog, "VACUUM health_silver RETAIN 0 HOURS").collect()[0]
        assert out.files_deleted >= 1
    finally:
        spark.conf.set("spark.delta_lake_spark.retentionDurationCheck.enabled", "true")


def test_sql_optimize_cluster_by(spark, tmp_path):
    from delta_lake_spark.catalog import Catalog
    from delta_lake_spark.sql import sql

    cat = Catalog(spark)
    path = str(tmp_path / "opt_t")
    write_delta(
        spark.range(5000).select(F.col("id"), (F.col("id") % 3).alias("v")).repartition(6),
        path,
    )
    sql(cat, f"CREATE TABLE opt_t USING DELTA LOCATION '{path}'")
    out = sql(cat, "OPTIMIZE opt_t CLUSTER BY (id)")
    assert out.first()["version"] == 1
    got = read_delta(spark, path, predicate="id = 777")
    assert len(got.inputFiles()) == 1  # clustered -> point lookup hits one file
    assert sql(cat, "SELECT COUNT(*) AS n FROM opt_t").first()["n"] == 5000
    # plain OPTIMIZE (no CLUSTER BY) is also accepted
    out2 = sql(cat, "OPTIMIZE opt_t")
    assert out2.first()["version"] >= 1


def test_sql_update_and_restore(spark, catalog):
    sql(catalog, "UPDATE health_silver SET status = 'done' WHERE user_id <= 2")
    got = {
        r.user_id: r.status
        for r in sql(catalog, "SELECT user_id, status FROM health_silver").collect()
    }
    assert got == {1: "done", 2: "done", 3: "new", 4: "new"}
    # unconditional UPDATE (no WHERE)
    sql(catalog, "UPDATE health_silver SET status = 'all'")
    n = sql(
        catalog, "SELECT COUNT(*) AS n FROM health_silver WHERE status = 'all'"
    ).first()["n"]
    assert n == 4
    # RESTORE back to v0 undoes both updates
    out = sql(catalog, "RESTORE TABLE health_silver TO VERSION AS OF 0")
    assert out.first()["version"] == 3
    again = {
        r.user_id: r.status
        for r in sql(catalog, "SELECT user_id, status FROM health_silver").collect()
    }
    assert set(again.values()) == {"new"}


def test_sql_tblproperties_reorg_clone(spark, tmp_path):
    """SQL-only deletion-vector lifecycle: enable via TBLPROPERTIES,
    DELETE runs in DV mode, REORG APPLY (PURGE) folds vectors away,
    SHALLOW CLONE forks without copying bytes."""
    from delta_lake_spark.catalog import Catalog
    from delta_lake_spark.sql import sql

    cat = Catalog(spark)
    path = str(tmp_path / "props_t")
    write_delta(
        spark.range(100).select(F.col("id"), (F.col("id") % 4).alias("g")), path
    )
    sql(cat, f"CREATE TABLE props_t USING DELTA LOCATION '{path}'")
    sql(cat, "ALTER TABLE props_t SET TBLPROPERTIES ('deletionVectors' = 'true')")

    from delta_lake_spark import DeltaTable

    dt = DeltaTable.forPath(spark, path)
    files_before = set(dt._log.snapshot().files)
    sql(cat, "DELETE FROM props_t WHERE id < 30")
    assert set(dt._log.snapshot().files) == files_before  # DV mode: no rewrite
    assert sql(cat, "SELECT COUNT(*) AS n FROM props_t").first()["n"] == 70

    sql(cat, "REORG TABLE props_t APPLY (PURGE)")
    assert not any(a.deletionVector for a in dt._log.snapshot().files.values())
    assert sql(cat, "SELECT COUNT(*) AS n FROM props_t").first()["n"] == 70

    clone_loc = str(tmp_path / "props_clone")
    sql(cat, f"CREATE TABLE props_c SHALLOW CLONE props_t LOCATION '{clone_loc}'")
    assert sql(cat, "SELECT COUNT(*) AS n FROM props_c").first()["n"] == 70
    sql(cat, "DELETE FROM props_c WHERE id >= 90")
    assert sql(cat, "SELECT COUNT(*) AS n FROM props_c").first()["n"] == 60
    assert sql(cat, "SELECT COUNT(*) AS n FROM props_t").first()["n"] == 70

    sql(cat, "ALTER TABLE props_t UNSET TBLPROPERTIES ('deletionVectors')")
    sql(cat, "DELETE FROM props_t WHERE id >= 90")  # back to rewrite mode
    snap = dt._log.snapshot()
    assert not any(a.deletionVector for a in snap.files.values())
    assert sql(cat, "SELECT COUNT(*) AS n FROM props_t").first()["n"] == 60


def test_show_tblproperties_and_restore_timestamp(spark, tmp_path):
    from delta_lake_spark.catalog import Catalog
    from delta_lake_spark.sql import sql
    from delta_lake_spark.table import DeltaTable
    from delta_lake_spark.writer import write_delta

    p = str(tmp_path / "t")
    write_delta(spark.createDataFrame([(1,)], "id long"), p)
    cat = Catalog(spark)
    sql(cat, f"CREATE TABLE props_t USING DELTA LOCATION '{p}'")
    sql(cat, "ALTER TABLE props_t SET TBLPROPERTIES ('autoCompact' = 'true')")
    rows = {r.key: r.value for r in sql(cat, "SHOW TBLPROPERTIES props_t").collect()}
    assert rows.get("autoCompact") == "true"

    # advance the table, then restore to the creation commit's timestamp
    import time

    dt = DeltaTable.forPath(spark, p)
    ts0 = dt._log.history()[-1]["timestamp"]
    write_delta(spark.createDataFrame([(2,)], "id long"), p)
    assert spark.read.parquet(p + "/data/*").count() >= 2
    from datetime import datetime, timezone

    exact = datetime.fromtimestamp(ts0 / 1000, tz=timezone.utc).strftime(
        "%Y-%m-%d %H:%M:%S.%f"
    )
    sql(cat, f"RESTORE props_t TO TIMESTAMP AS OF '{exact}'")
    from delta_lake_spark.reader import read_delta

    assert read_delta(spark, p).count() == 1


def test_create_database_and_use(spark, tmp_path):
    """D1 (reference includes/configuration.py:30-31): CREATE DATABASE
    IF NOT EXISTS + USE through the session catalog; tables created
    while the database is current land in it and resolve unqualified."""
    spark.sql("CREATE DATABASE IF NOT EXISTS dls_db")
    try:
        spark.sql("USE dls_db")
        assert spark.catalog.currentDatabase() == "dls_db"
        spark.sql("CREATE TABLE t_d1 (id BIGINT, v DOUBLE) USING PARQUET")
        spark.sql("INSERT INTO t_d1 VALUES (1, 1.5), (2, 2.5)")
        assert spark.sql("SELECT COUNT(*) AS n FROM t_d1").collect()[0].n == 2
        assert spark.sql(
            "SELECT COUNT(*) AS n FROM dls_db.t_d1"
        ).collect()[0].n == 2  # qualified resolution too
    finally:
        spark.sql("USE default")
        spark.sql("DROP DATABASE IF EXISTS dls_db CASCADE")
    assert spark.catalog.currentDatabase() == "default"


def test_external_parquet_table_msck_repair(spark, tmp_path):
    """D3 (reference delta_lake_rapid_start.py:137-151): an EXTERNAL
    partitioned parquet table over a pre-existing directory sees zero
    partitions until MSCK REPAIR registers them in the catalog."""
    from pyspark.sql import functions as F

    loc = str(tmp_path / "ext_events")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("part")
    )
    df.write.partitionBy("part").parquet(loc)

    spark.sql(
        "CREATE TABLE ext_events (id BIGINT, part INT) "
        f"USING PARQUET PARTITIONED BY (part) LOCATION '{loc}'"
    )
    try:
        # catalog has no partition metadata yet -> empty scan
        assert spark.sql("SELECT COUNT(*) AS n FROM ext_events").collect()[0].n == 0
        spark.sql("MSCK REPAIR TABLE ext_events")
        assert spark.sql("SELECT COUNT(*) AS n FROM ext_events").collect()[0].n == 100
        parts = spark.sql("SHOW PARTITIONS ext_events").collect()
        assert len(parts) == 4
        # partition pruning works through the repaired catalog entry
        assert (
            spark.sql("SELECT COUNT(*) AS n FROM ext_events WHERE part = 1")
            .collect()[0].n == 25
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS ext_events")


def test_show_partitions_truncate_describe(spark, tmp_path):
    from pyspark.sql import functions as F

    from delta_lake_spark import write_delta
    from delta_lake_spark.catalog import Catalog
    from delta_lake_spark.sql import sql

    p = str(tmp_path / "pt")
    write_delta(
        spark.range(40).select(
            F.col("id"), (F.col("id") % 4).cast("int").alias("g")
        ),
        p,
        partition_by=["g"],
    )
    cat = Catalog(spark)
    cat.register("pt", p)

    parts = sorted(r.partition for r in sql(cat, "SHOW PARTITIONS pt").collect())
    assert parts == ["g=0", "g=1", "g=2", "g=3"]

    desc = {r.col_name: r for r in sql(cat, "DESCRIBE TABLE pt").collect()}
    assert desc["id"].data_type == "bigint"
    assert desc["g"].extra == "partition"

    sql(cat, "TRUNCATE TABLE pt")
    assert sql(cat, "SELECT COUNT(*) AS n FROM pt").collect()[0].n == 0
    # history preserved: pre-truncate version still readable
    from delta_lake_spark import read_delta

    assert read_delta(spark, p, version=0).count() == 40


def test_insert_replace_where_sql(spark, tmp_path):
    from delta_lake_spark import write_delta
    from delta_lake_spark.catalog import Catalog
    from delta_lake_spark.sql import sql

    p = str(tmp_path / "rw")
    write_delta(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)],
            "id long, grp string, v double",
        ),
        p,
    )
    cat = Catalog(spark)
    cat.register("rw_t", p)
    sql(
        cat,
        "INSERT INTO rw_t REPLACE WHERE grp = 'a' "
        "SELECT CAST(9 AS BIGINT) AS id, 'a' AS grp, CAST(99 AS DOUBLE) AS v",
    )
    rows = sorted(
        (r.id, r.grp, r.v)
        for r in sql(cat, "SELECT * FROM rw_t").collect()
    )
    assert rows == [(2, "b", 2.0), (9, "a", 99.0)]


def test_partitions_metadata_and_table_changes_sql(spark, tmp_path):
    from pyspark.sql import functions as F

    from delta_lake_spark import DeltaTable, write_delta
    from delta_lake_spark.catalog import Catalog
    from delta_lake_spark.sql import sql

    p = str(tmp_path / "pmeta")
    write_delta(
        spark.range(40).select(
            F.col("id"), (F.col("id") % 2).cast("int").alias("g")
        ),
        p,
        partition_by=["g"],
    )  # v0
    write_delta(
        spark.createDataFrame([(100, 0)], "id long, g int"), p
    )  # v1 append

    dt = DeltaTable.forPath(spark, p)
    parts = {r.partition: (r.num_files, r.num_rows) for r in dt.partitions().collect()}
    assert parts['{"g": "0"}'] == (2, 21)
    assert parts['{"g": "1"}'] == (1, 20)

    cat = Catalog(spark)
    cat.register("pmeta", p)
    rows = sql(
        cat,
        "SELECT _change_type, COUNT(*) AS n FROM table_changes('pmeta', 1) "
        "GROUP BY _change_type",
    ).collect()
    assert {(r._change_type, r.n) for r in rows} == {("insert", 1)}


def test_show_create_table(spark, tmp_path):
    from delta_lake_spark.catalog import Catalog
    from delta_lake_spark.sql import sql
    from delta_lake_spark.writer import write_delta

    path = str(tmp_path / "sct")
    df = spark.range(5).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v", "'x' AS p"
    )
    write_delta(
        df, path, partition_by=["p"],
        properties={"delta.appendOnly": "false"},
    )
    cat = Catalog(spark)
    cat.register("sct_t", path)
    stmt = sql(cat, "SHOW CREATE TABLE sct_t").collect()[0].createtab_stmt
    assert "CREATE TABLE sct_t" in stmt
    assert "k BIGINT" in stmt and "v DOUBLE" in stmt and "p STRING" in stmt
    assert "USING DELTA" in stmt
    assert "PARTITIONED BY (p)" in stmt
    assert f"LOCATION '{path}'" in stmt
    assert "'delta.appendOnly' = 'false'" in stmt


def test_sql_merge_not_matched_by_source(spark, tmp_path):
    from delta_lake_spark import read_delta, write_delta
    from delta_lake_spark.catalog import Catalog
    from delta_lake_spark.sql import sql

    path = str(tmp_path / "mbs")
    write_delta(
        spark.range(10).selectExpr("id AS k", "'live' AS status"), path
    )
    cat = Catalog(spark)
    cat.register("mbs_t", path)
    spark.range(5).selectExpr("id AS k", "'fresh' AS status"
        ).createOrReplaceTempView("mbs_src")
    sql(cat, """
        MERGE INTO mbs_t AS t USING mbs_src AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET status = s.status
        WHEN NOT MATCHED BY SOURCE AND t.k >= 8 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = 'stale'
    """)
    rows = {r.k: r.status for r in read_delta(spark, path).collect()}
    assert rows == {
        **{k: "fresh" for k in range(5)},
        **{k: "stale" for k in range(5, 8)},
    }
