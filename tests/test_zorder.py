"""Z-order clustering: multi-dimensional layout must let file-level
min/max skipping prune on ANY clustered column, where lexicographic
range clustering only serves the leading column."""

import pytest
from pyspark.sql import functions as F

from delta_lake_spark import DeltaTable, read_delta, write_delta
from delta_lake_spark.skipping import prune_adds
from delta_lake_spark.sql import sql as dls_sql


def _grid(spark, n=40_000):
    """Two independent uniform dimensions (x, y) — the worst case for
    single-column clustering."""
    return spark.range(n).select(
        (F.col("id") % 200).cast("int").alias("x"),
        ((F.col("id") * 7919 + 13) % 200).cast("int").alias("y"),
        F.col("id").alias("payload"),
    )


def _prune_frac(table, pred):
    adds = list(table._log.snapshot().files.values())
    kept, skipped = prune_adds(adds, pred)
    return skipped / (len(kept) + skipped)


@pytest.fixture()
def table(spark, tmp_table):
    write_delta(_grid(spark), tmp_table)
    return DeltaTable.forPath(spark, tmp_table)


def test_zorder_prunes_both_dimensions(spark, table, tmp_table):
    before_rows = read_delta(spark, tmp_table).count()
    before_sum = read_delta(spark, tmp_table).agg(F.sum("payload")).collect()[0][0]

    table.optimize(target_file_bytes=24 * 1024, zorder_by=["x", "y"])
    snap = table._log.snapshot()
    assert snap.num_files >= 8  # enough output files for pruning to mean anything

    # content unchanged (clustering is layout-only)
    after = read_delta(spark, tmp_table)
    assert after.count() == before_rows
    assert after.agg(F.sum("payload")).collect()[0][0] == before_sum

    # point predicates on EITHER dimension prune a real fraction of files
    fx = _prune_frac(table, "x = 5")
    fy = _prune_frac(table, "y = 5")
    assert fx >= 0.4, f"x pruning too weak: {fx}"
    assert fy >= 0.4, f"y pruning too weak: {fy}"


def test_range_cluster_only_serves_leading_column(spark, table):
    table.optimize(target_file_bytes=24 * 1024, cluster_by=["x", "y"])
    fx = _prune_frac(table, "x = 5")
    fy = _prune_frac(table, "y = 5")
    assert fx >= 0.4
    # lexicographic layout leaves y unclustered across files
    assert fy <= fx


def test_zorder_sql_form(spark, table, tmp_table):
    from delta_lake_spark.catalog import Catalog

    cat = Catalog(spark)
    cat.register("zgrid", tmp_table)
    dls_sql(cat, "OPTIMIZE zgrid ZORDER BY (x, y)")
    hist = table._log.history()
    assert hist[0]["operation"] == "OPTIMIZE"
    assert hist[0]["operationParameters"]["zorderBy"] == ["x", "y"]


def test_zorder_rejects_both_modes(table):
    with pytest.raises(ValueError):
        table.optimize(cluster_by=["x"], zorder_by=["y"])


def test_clustered_table_property_drives_bare_optimize(spark, tmp_path):
    """delta.clusteringColumns: OPTIMIZE with no args re-clusters on the
    declared columns (single col -> range clustering, several ->
    Z-order), so stats-based skipping prunes after a bare OPTIMIZE."""
    from delta_lake_spark import write_delta
    from delta_lake_spark.table import DeltaTable

    path = str(tmp_path / "liquid")
    df = spark.range(4000).selectExpr(
        "id AS k", "CAST(id % 97 AS INT) AS probe", "id * 2.0 AS v"
    ).repartition(8)
    write_delta(
        df, path, properties={"delta.clusteringColumns": "probe"}
    )
    dt = DeltaTable.forPath(spark, path)
    dt.optimize(target_file_bytes=16 * 1024)
    snap = dt._log.snapshot()
    # clustered layout: most files carry a tight probe min/max range,
    # so a point predicate keeps only a fraction of files
    from delta_lake_spark.skipping import prune_adds

    kept, skipped = prune_adds(list(snap.files.values()), "probe = 7")
    assert 0 < len(kept) < len(snap.files)
    assert skipped >= len(snap.files) - len(kept) - 1
    # and the ranges are genuinely tight: the kept files' min/max
    # bracket the probe value
    import json as _json

    for a in kept:
        st = a.stats if isinstance(a.stats, dict) else _json.loads(a.stats)
        assert st["minValues"]["probe"] <= 7 <= st["maxValues"]["probe"]


def test_detail_reports_clustering_columns(spark, tmp_path):
    from delta_lake_spark import write_delta
    from delta_lake_spark.table import DeltaTable

    path = str(tmp_path / "dcc")
    write_delta(
        spark.range(5).withColumnRenamed("id", "k"), path,
        properties={"delta.clusteringColumns": "k"},
    )
    d = DeltaTable.forPath(spark, path).detail().collect()[0]
    assert d.clusteringColumns == ["k"]


def test_hilbert_index_matches_reference_and_is_bijective(spark):
    import itertools

    from delta_lake_spark.zorder import hilbert_index_expr

    def xy2d_ref(order, x, y):
        n = 1 << order
        d, s = 0, n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = n - 1 - x, n - 1 - y
                x, y = y, x
            s //= 2
        return d

    pts = list(itertools.product(range(16), range(16)))
    df = spark.createDataFrame(pts, "x int, y int")
    got = {
        (r.x, r.y): r.h
        for r in df.withColumn(
            "h", hilbert_index_expr("x", "y", 4)
        ).collect()
    }
    ref = {(x, y): xy2d_ref(4, x, y) for x, y in pts}
    assert got == ref
    assert len(set(got.values())) == 256  # bijective over the grid
    # continuity: consecutive indexes are grid-adjacent — the property
    # Morton interleaving lacks and the reason file boxes are tighter
    inv = {d: xy for xy, d in ref.items()}
    assert all(
        abs(inv[d][0] - inv[d + 1][0]) + abs(inv[d][1] - inv[d + 1][1]) == 1
        for d in range(255)
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bits"):
        hilbert_index_expr("x", "y", 0)


def test_hilbert_layout_preserves_content(spark):
    from delta_lake_spark.zorder import hilbert_layout

    ev = spark.range(500).select(
        F.col("id"),
        F.expr("pmod(id * 48271, 97)").alias("a"),
        F.expr("pmod(id * 16807, 89)").alias("b"),
    )
    laid = hilbert_layout(ev, ["a", "b"], bits=4)
    out = (
        laid.repartitionByRange(4, "__hilbert")
        .sortWithinPartitions("__hilbert")
        .drop("__hilbert")
    )
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, ev.collect())
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exactly 2"):
        hilbert_layout(ev, ["a"], bits=4)
