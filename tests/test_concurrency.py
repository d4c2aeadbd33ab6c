"""Optimistic concurrency: racing appends serialize through the atomic
create-if-absent commit; losers retry and land on later versions."""

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from delta_lake_spark import read_delta, write_delta


def test_concurrent_appends_all_land(spark, tmp_table):
    write_delta(spark.range(10).select(F.col("id")), tmp_table)

    def append(i: int) -> int:
        df = spark.range(i * 100, i * 100 + 10).select(F.col("id"))
        return write_delta(df, tmp_table)

    with ThreadPoolExecutor(max_workers=4) as pool:
        versions = list(pool.map(append, range(1, 5)))

    # every append won a distinct version and no rows were lost
    assert sorted(versions) == [1, 2, 3, 4]
    assert read_delta(spark, tmp_table).count() == 50


def _inject_competitor_before_commit(dt_log, competitor_actions):
    """Wrap log.commit so the first attempt loses the race: a competing
    writer (fresh DeltaLog handle) lands the same version first."""
    from delta_lake_spark.log import DeltaLog

    original = dt_log.commit
    state = {"injected": False}

    def racing_commit(version, actions):
        if not state["injected"]:
            state["injected"] = True
            DeltaLog(dt_log.table_path).commit(version, competitor_actions)
        return original(version, actions)

    dt_log.commit = racing_commit


def test_mutation_losing_race_raises_not_silent(spark, tmp_table):
    """A DELETE that loses the commit race must raise (its rewrite was
    computed against a stale snapshot), never blind-retry."""
    import pytest as _pytest

    from delta_lake_spark import DeltaTable, read_delta, write_delta
    from delta_lake_spark.errors import ConcurrentModificationError
    from delta_lake_spark.log import AddFile, CommitInfo

    write_delta(spark.range(100).selectExpr("id", "id % 5 AS g"), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    competitor = [
        CommitInfo(operation="APPEND").to_action(),
        AddFile(path="data/competitor.parquet", numRecords=1, size=1).to_action(),
    ]
    _inject_competitor_before_commit(dt._log, competitor)
    with _pytest.raises(ConcurrentModificationError):
        dt.delete("g = 3")
    # caller re-runs against the new snapshot and succeeds
    dt2 = DeltaTable.forPath(spark, tmp_table)
    # drop the phantom competitor file so the table stays readable
    from delta_lake_spark.log import RemoveFile

    dt2._log.commit_next(
        [
            CommitInfo(operation="CLEANUP").to_action(),
            RemoveFile(path="data/competitor.parquet").to_action(),
        ]
    )
    DeltaTable.forPath(spark, tmp_table).delete("g = 3")
    assert read_delta(spark, tmp_table).count() == 80


def test_append_losing_race_retries_when_metadata_unchanged(
    spark, tmp_table, monkeypatch
):
    """An append that loses the commit race retries and lands AFTER the
    competitor when table metadata is unchanged; both appends survive."""
    import os
    import shutil

    import delta_lake_spark.writer as W
    from delta_lake_spark import read_delta, write_delta
    from delta_lake_spark.log import AddFile, CommitInfo, DeltaLog

    write_delta(spark.range(10), tmp_table)  # v0
    snap = DeltaLog(tmp_table).snapshot()
    src_rel = next(iter(snap.files))
    comp_rel = "data/competitor_append.parquet"
    shutil.copy(
        os.path.join(tmp_table, src_rel), os.path.join(tmp_table, comp_rel)
    )
    n_comp = snap.files[src_rel].numRecords

    state = {"raced": False}

    class RacingLog(DeltaLog):
        def commit(self, version, actions):
            if not state["raced"]:
                state["raced"] = True
                DeltaLog(self.table_path).commit(
                    version,
                    [
                        CommitInfo(operation="APPEND").to_action(),
                        AddFile(path=comp_rel, numRecords=n_comp, size=1).to_action(),
                    ],
                )
            return super().commit(version, actions)

    monkeypatch.setattr(W, "DeltaLog", RacingLog)
    write_delta(spark.range(10, 30), tmp_table)  # loses v1, retries at v2
    assert state["raced"]
    assert read_delta(spark, tmp_table).count() == 10 + 20 + n_comp


def test_append_racing_schema_change_raises(spark, tmp_table, monkeypatch):
    """An append racing a concurrent METADATA change must surface the
    conflict — its staged files were validated against the old schema."""
    import pytest as _pytest

    import delta_lake_spark.writer as W
    from delta_lake_spark import write_delta
    from delta_lake_spark.errors import ConcurrentModificationError
    from delta_lake_spark.log import CommitInfo, DeltaLog, Metadata

    write_delta(spark.range(10), tmp_table)  # v0
    old_meta = DeltaLog(tmp_table).snapshot().metadata

    state = {"raced": False}

    class RacingLog(DeltaLog):
        def commit(self, version, actions):
            if not state["raced"]:
                state["raced"] = True
                new_meta = Metadata(
                    schemaString=old_meta.schemaString,
                    partitionColumns=old_meta.partitionColumns,
                    configuration={"constraint.c1": "id >= 0"},
                    id=old_meta.id,
                    createdTime=old_meta.createdTime,
                )
                DeltaLog(self.table_path).commit(
                    version,
                    [
                        CommitInfo(operation="ADD CONSTRAINT").to_action(),
                        new_meta.to_action(),
                    ],
                )
            return super().commit(version, actions)

    monkeypatch.setattr(W, "DeltaLog", RacingLog)
    with _pytest.raises(ConcurrentModificationError):
        write_delta(spark.range(10, 20), tmp_table)


def test_delete_rebases_over_concurrent_optimize(spark, tmp_table):
    """Conflict RESOLUTION: a DELETE racing a layout-only commit
    (dataChange=False, disjoint files) rebases and lands instead of
    raising."""
    import os
    import shutil

    from delta_lake_spark import DeltaTable, read_delta, write_delta
    from delta_lake_spark.log import AddFile, CommitInfo, DeltaLog, RemoveFile

    write_delta(
        spark.range(100).selectExpr("id", "CAST(id % 5 AS INT) AS g"),
        tmp_table,
        partition_by=["g"],
    )
    dt = DeltaTable.forPath(spark, tmp_table)
    snap = dt._log.snapshot()
    # competitor "compacts" one g=0 file (disjoint from our g=3 delete)
    g0 = next(
        p for p, a in snap.files.items() if a.partitionValues.get("g") == "0"
    )
    comp_rel = "data/compacted_g0.parquet"
    shutil.copy(os.path.join(tmp_table, g0), os.path.join(tmp_table, comp_rel))
    competitor = [
        CommitInfo(operation="OPTIMIZE").to_action(),
        RemoveFile(path=g0, dataChange=False).to_action(),
        AddFile(
            path=comp_rel,
            partitionValues={"g": "0"},
            numRecords=snap.files[g0].numRecords,
            size=snap.files[g0].size,
            stats=snap.files[g0].stats,
            dataChange=False,
        ).to_action(),
    ]
    _inject_competitor_before_commit(dt._log, competitor)
    dt.delete("g = 3")  # must rebase, not raise
    got = read_delta(spark, tmp_table)
    assert got.count() == 80
    assert got.filter("g = 0").count() == 20


def test_optimize_rebases_over_concurrent_append(spark, tmp_table):
    """A compaction racing an append rebases (appends can't invalidate
    a rewrite of files the append didn't touch)."""
    import os
    import shutil

    from delta_lake_spark import DeltaTable, read_delta, write_delta
    from delta_lake_spark.log import AddFile, CommitInfo

    write_delta(spark.range(50).selectExpr("id").repartition(4), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    snap = dt._log.snapshot()
    src_rel = next(iter(snap.files))
    comp_rel = "data/competitor_append2.parquet"
    shutil.copy(os.path.join(tmp_table, src_rel), os.path.join(tmp_table, comp_rel))
    n_comp = snap.files[src_rel].numRecords
    competitor = [
        CommitInfo(operation="APPEND").to_action(),
        AddFile(
            path=comp_rel,
            numRecords=n_comp,
            size=snap.files[src_rel].size,
            stats=snap.files[src_rel].stats,
        ).to_action(),
    ]
    _inject_competitor_before_commit(dt._log, competitor)
    dt.optimize()  # must rebase, not raise
    assert read_delta(spark, tmp_table).count() == 50 + n_comp


def test_mutation_racing_remove_only_delete_raises(spark, tmp_table):
    """Concurrent-delete-read rule: a winner that REMOVED (dataChange=
    True) a file this mutation read must conflict — FIND/anti-join
    decisions were made against rows that no longer exist."""
    import pytest as _pytest

    from delta_lake_spark import DeltaTable, write_delta
    from delta_lake_spark.errors import ConcurrentModificationError
    from delta_lake_spark.log import CommitInfo, RemoveFile

    write_delta(spark.range(100).selectExpr("id").repartition(4), tmp_table)
    dt = DeltaTable.forPath(spark, tmp_table)
    snap = dt._log.snapshot()
    # competitor deletes a whole file (remove-only, dataChange=True);
    # our predicate (id % 2 = 0 is outside the skipping subset) reads
    # every file, including the victim
    victim = next(iter(snap.files))
    competitor = [
        CommitInfo(operation="DELETE").to_action(),
        RemoveFile(path=victim).to_action(),
    ]
    _inject_competitor_before_commit(dt._log, competitor)
    with _pytest.raises(ConcurrentModificationError):
        dt.update("id % 2 = 0", {"id": "id + 1000"})


def test_partition_disjoint_delete_rebases_over_remove(spark, tmp_table):
    """A remove-only winner in partition g=0 does NOT conflict with a
    delete whose pruned read set is partition g=3 only — the read-set
    tracking keeps disjoint-partition mutations concurrent."""
    from delta_lake_spark import DeltaTable, read_delta, write_delta
    from delta_lake_spark.log import CommitInfo, RemoveFile

    write_delta(
        spark.range(100).selectExpr("id", "CAST(id % 5 AS INT) AS g"),
        tmp_table,
        partition_by=["g"],
    )
    dt = DeltaTable.forPath(spark, tmp_table)
    snap = dt._log.snapshot()
    g0 = next(
        p for p, a in snap.files.items() if a.partitionValues.get("g") == "0"
    )
    competitor = [
        CommitInfo(operation="DELETE").to_action(),
        RemoveFile(path=g0).to_action(),
    ]
    n_victim = snap.files[g0].numRecords
    _inject_competitor_before_commit(dt._log, competitor)
    dt.delete("g = 3")  # read set pruned to g=3 -> must rebase, not raise
    got = read_delta(spark, tmp_table)
    assert got.filter("g = 3").count() == 0
    # competitor's remove of one g=0 file held through the rebase
    assert got.filter("g = 0").count() == 20 - n_victim
    assert got.count() == 80 - n_victim


def test_commit_store_seam_is_pluggable(spark, tmp_path):
    """The log's only storage primitive is put_if_absent: a store that
    vetoes a version makes commit raise ConcurrentModificationError; a
    recording store sees exactly one call per commit."""
    from delta_lake_spark.errors import ConcurrentModificationError
    from delta_lake_spark.log import CommitInfo, CommitStore, DeltaLog

    calls = []

    class Recording(CommitStore):
        def put_if_absent(self, target, payload):
            calls.append(target)
            return super().put_if_absent(target, payload)

    class Vetoing(CommitStore):
        def put_if_absent(self, target, payload):
            return False

    path = str(tmp_path / "cs")
    log = DeltaLog(path, commit_store=Recording())
    log.commit_next([CommitInfo(operation="CREATE").to_action()])
    log.commit_next([CommitInfo(operation="WRITE").to_action()])
    assert len(calls) == 2 and calls[0].endswith("00000000000000000000.json")

    vet = DeltaLog(path, commit_store=Vetoing())
    import pytest

    with pytest.raises(ConcurrentModificationError):
        vet.commit_next([CommitInfo(operation="WRITE").to_action()], retries=0)
    # the real log is untouched by the vetoed attempt
    assert DeltaLog(path).latest_version() == 1


# ---------------------------------------------------------------------------
# Funnel memo concurrency + cache-retention contracts (queries/llm.py).
# These pin the two round-8 review findings: (1) a repeat q147
# invocation must NOT lose its fresh report caches to the unpersist of
# the previous invocation's plan-identical frames (uncacheQuery matches
# by plan equality, so ordering matters), and (2) two concurrent FIRST
# invocations of the shared funnel chain must build it exactly once —
# the loser of the old unguarded race leaked its persisted frames until
# session end.
# ---------------------------------------------------------------------------

from tests.conftest import SF_DIR


def test_q147_repeat_invocation_keeps_fresh_caches(spark):
    """Invoke q147 twice in one session: the second run must return
    identical rows AND its per-query report frames must still be
    cached afterwards (storageLevel reflects the live CacheManager
    state — if _swap_extras unpersisted the old frames AFTER the new
    plan-identical ones were persisted, these would read NONE and the
    report would recompute uncached)."""
    from delta_lake_spark.queries.llm import (
        _funnel_slot,
        clear_funnel_memo,
        q147_pretrain_funnel_full,
    )

    clear_funnel_memo(spark)
    try:
        first = q147_pretrain_funnel_full(spark, SF_DIR).collect()
        second_df = q147_pretrain_funnel_full(spark, SF_DIR)
        second = second_df.collect()
        assert sorted(map(tuple, first)) == sorted(map(tuple, second))
        frames = _funnel_slot(spark)["extras"]["q147"]
        assert frames, "second invocation registered no report frames"
        for f in frames:
            lvl = f.storageLevel
            assert lvl.useMemory or lvl.useDisk, (
                "a fresh frame lost its cache to the previous "
                f"invocation's unpersist: {lvl}"
            )
    finally:
        clear_funnel_memo(spark)


def test_funnel_concurrent_first_invocations_build_once(spark):
    """Two threads race the FIRST _funnel_core invocation: the
    double-checked memo under the slot's build lock must run exactly
    one build, hand both callers the same memoized result tuple, and
    leave no orphaned persisted frames behind (the persistent-RDD
    census returns to its pre-test size once the memo is cleared)."""
    import threading

    from delta_lake_spark.queries import llm

    llm.clear_funnel_memo(spark)
    persistent_before = len(spark.sparkContext._jsc.getPersistentRDDs())
    builds = []
    orig = llm._funnel_build

    def counting_build(spark_, slot, sf_dir, near_dup):
        builds.append(near_dup)
        return orig(spark_, slot, sf_dir, near_dup)

    llm._funnel_build = counting_build
    results = [None, None]
    errors = []

    def run(i):
        try:
            results[i] = llm._funnel_core(spark, SF_DIR)
        except BaseException as e:  # pragma: no cover - surfaced below
            errors.append(e)

    try:
        threads = [
            threading.Thread(target=run, args=(i,)) for i in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        assert len(builds) == 1, f"chain built {len(builds)} times"
        assert results[0] is results[1], "callers got different chains"
    finally:
        llm._funnel_build = orig
        llm.clear_funnel_memo(spark)
    persistent_after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert persistent_after == persistent_before, (
        f"leaked persisted frames: {persistent_before} -> "
        f"{persistent_after}"
    )
