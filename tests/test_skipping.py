"""Data skipping: file pruning from log min/max stats."""

from pyspark.sql import functions as F

from delta_lake_spark import DeltaTable, read_delta, write_delta
from delta_lake_spark.log import AddFile
from delta_lake_spark.skipping import file_may_match, parse_conjuncts, prune_adds


def _add(mins, maxs, pv=None):
    return AddFile(
        path="f.parquet",
        partitionValues=pv or {},
        stats={"minValues": mins, "maxValues": maxs, "nullCount": {}},
    )


def test_parse_conjuncts():
    assert parse_conjuncts("a = 1 AND b < 2.5") == [("a", "=", 1), ("b", "<", 2.5)]
    assert parse_conjuncts("s = 'x'") == [("s", "=", "x")]
    assert parse_conjuncts("k IN (1, 2, 3)") == [("k", "IN", [1, 2, 3])]
    assert parse_conjuncts("a = b") is None  # col-col: not skippable
    assert parse_conjuncts("a RLIKE 'x'") is None


def test_file_may_match_ranges():
    add = _add({"x": 10, "s": "carol"}, {"x": 20, "s": "frank"})
    assert file_may_match(add, [("x", "=", 15)])
    assert not file_may_match(add, [("x", "=", 25)])
    assert not file_may_match(add, [("x", "<", 10)])
    assert file_may_match(add, [("x", "<=", 10)])
    assert not file_may_match(add, [("x", ">", 20)])
    assert file_may_match(add, [("x", ">=", 20)])
    assert not file_may_match(add, [("s", "=", "alice")])
    assert file_may_match(add, [("s", "=", "dave")])
    assert file_may_match(add, [("y", "=", 99)])  # no stats for y -> keep


def test_partition_value_beats_stats():
    add = _add({}, {}, pv={"p": "3"})
    assert file_may_match(add, [("p", "=", 3)])
    assert not file_may_match(add, [("p", "=", 4)])
    assert not file_may_match(add, [("p", "IN", [1, 2])])
    assert file_may_match(add, [("p", "IN", [3, 4])])


def test_end_to_end_scan_skips_files(spark, tmp_table):
    # 10 appends with disjoint id ranges -> 10+ files with tight stats
    for i in range(10):
        write_delta(
            spark.range(i * 100, (i + 1) * 100).select(
                F.col("id"), (F.col("id") * 2).alias("v")
            ).coalesce(1),
            tmp_table,
        )
    full = read_delta(spark, tmp_table)
    pruned = read_delta(spark, tmp_table, predicate="id = 450")
    assert len(pruned.inputFiles()) == 1
    assert len(full.inputFiles()) >= 10
    assert pruned.filter("id = 450").count() == 1
    # unparseable predicate: no pruning, still correct
    nop = read_delta(spark, tmp_table, predicate="id = v")
    assert len(nop.inputFiles()) == len(full.inputFiles())


def test_delete_scans_only_overlapping_files(spark, tmp_table):
    for i in range(10):
        write_delta(
            spark.range(i * 100, (i + 1) * 100).select(F.col("id")).coalesce(1),
            tmp_table,
        )
    dt = DeltaTable.forPath(spark, tmp_table)
    before = set(dt._log.snapshot().files)
    dt.delete("id >= 850")
    after = set(dt._log.snapshot().files)
    # only the files overlapping [850, inf) were rewritten
    assert len(before - after) == 2  # ranges 800-899 and 900-999
    assert read_delta(spark, tmp_table).count() == 850


def test_optimize_cluster_by_tightens_skipping(spark, tmp_table):
    """Clustered compaction (single-dim Z-order) must make point-lookup
    skipping prune most files; unclustered hash layout prunes none."""
    # hash-shuffled layout: every file spans nearly the full id range
    df = spark.range(10_000).select(F.col("id")).repartition(8)
    write_delta(df, tmp_table)
    before = read_delta(spark, tmp_table, predicate="id = 4242")
    assert len(before.inputFiles()) == 8  # nothing skippable

    dt = DeltaTable.forPath(spark, tmp_table)
    dt.optimize(target_file_bytes=16 * 1024, cluster_by=["id"])

    after_full = read_delta(spark, tmp_table)
    assert after_full.count() == 10_000  # clustering is content-preserving
    assert after_full.orderBy("id").first()["id"] == 0

    after = read_delta(spark, tmp_table, predicate="id = 4242")
    assert len(after.inputFiles()) == 1  # tight ranges -> one file scanned
    assert after.filter("id = 4242").count() == 1
    # history records the clustering
    hist = dt._log.history()[0]
    assert hist["operation"] == "OPTIMIZE"
    assert hist["operationParameters"]["clusterBy"] == ["id"]


def test_partition_value_numeric_compare():
    """partitionValues store cast-to-string values: a DOUBLE partition
    column stores '1.0' while the predicate `p = 1` parses to int 1 —
    numeric literals must compare numerically or live files get pruned."""
    from delta_lake_spark.log import AddFile
    from delta_lake_spark.skipping import file_may_match, parse_conjuncts

    add = AddFile(path="f.parquet", partitionValues={"p": "1.0"})
    assert file_may_match(add, parse_conjuncts("p = 1"))
    assert file_may_match(add, parse_conjuncts("p IN (1, 2)"))
    assert not file_may_match(add, parse_conjuncts("p = 2"))
    assert not file_may_match(add, parse_conjuncts("p IN (2, 3)"))
    # string literals stay string-compared
    s = AddFile(path="g.parquet", partitionValues={"c": "west"})
    assert file_may_match(s, parse_conjuncts("c = 'west'"))
    assert not file_may_match(s, parse_conjuncts("c = 'east'"))
    # unparseable partition value for a numeric literal -> fail open
    w = AddFile(path="h.parquet", partitionValues={"p": "oops"})
    assert file_may_match(w, parse_conjuncts("p = 1"))


def test_null_conjunct_pruning():
    """IS NULL prunes files with zero nulls; IS NOT NULL prunes all-null
    files; partition columns use their single value directly."""
    from delta_lake_spark.log import AddFile
    from delta_lake_spark.skipping import file_may_match, parse_conjuncts

    no_nulls = AddFile(
        path="a.parquet", numRecords=10,
        stats={"minValues": {"v": 1}, "maxValues": {"v": 5}, "nullCount": {"v": 0}},
    )
    all_nulls = AddFile(
        path="b.parquet", numRecords=10,
        stats={"minValues": {}, "maxValues": {}, "nullCount": {"v": 10}},
    )
    some = AddFile(
        path="c.parquet", numRecords=10,
        stats={"minValues": {"v": 1}, "maxValues": {"v": 5}, "nullCount": {"v": 3}},
    )
    isnull = parse_conjuncts("v IS NULL")
    notnull = parse_conjuncts("v IS NOT NULL")
    assert not file_may_match(no_nulls, isnull)
    assert file_may_match(no_nulls, notnull)
    assert file_may_match(all_nulls, isnull)
    assert not file_may_match(all_nulls, notnull)
    assert file_may_match(some, isnull) and file_may_match(some, notnull)
    # partition column: one value for every row
    p_set = AddFile(path="d.parquet", partitionValues={"p": "x"})
    p_null = AddFile(path="e.parquet", partitionValues={"p": None})
    assert not file_may_match(p_set, parse_conjuncts("p IS NULL"))
    assert file_may_match(p_set, parse_conjuncts("p IS NOT NULL"))
    assert file_may_match(p_null, parse_conjuncts("p IS NULL"))
    assert not file_may_match(p_null, parse_conjuncts("p IS NOT NULL"))
    # mixed with comparisons still parses
    assert parse_conjuncts("v IS NOT NULL AND v > 3") is not None
