"""DeltaTable handle: the mutation API surface of the engine.

Re-creates the ``delta.tables.DeltaTable`` API the reference drives
(SURVEY.md §3.3): ``forPath``, ``toDF``, ``alias``, ``merge`` builder
(M1-M4), ``delete`` (M5), ``update``, ``history`` (M9/D9), ``vacuum``
(M8), ``detail`` (D8), plus ``optimize`` (compaction) and ``restore``.

Execution model (Spark-first, SURVEY.md §4 "MERGE touched-file pruning"):
every mutation is three distributed phases —
  1. FIND: one scan with ``_metadata.file_path`` to learn which files
     contain affected rows (Catalyst pushes the predicate into the
     parquet scan, so this prunes with row-group stats);
  2. REWRITE: read ONLY the touched files, apply the change as a plain
     DataFrame transform, stage new parquet in parallel;
  3. COMMIT: one atomic log entry (remove touched + add staged).
Optimistic concurrency with conflict RESOLUTION (_commit_mutation):
a lost commit race rebases and retries only when the winner provably
cannot invalidate this mutation (metadata unchanged, our touched files
byte-identical, and — for predicate mutations — no concurrent
dataChange adds, since an append may hold rows the predicate should
have seen); anything else surfaces as ConcurrentModificationError and
the caller re-runs against the new snapshot.
Untouched files are never read or rewritten — at 100 TB a MERGE that
touches 0.1% of files costs 0.1% of a table rewrite plus one scan of
the join's pruned candidate set.
"""

from __future__ import annotations

import os
import time
from dataclasses import replace
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .errors import (
    ConcurrentModificationError,
    MergeAmbiguityError,
    RetentionSafetyError,
    TableNotFoundError,
)
from . import rowtracking
from .log import ICT_PROP, AddFile, CommitInfo, DeltaLog, RemoveFile, _utc_millis
from .reader import FILE_COL as _FILE_COL
from .reader import ROW_COL as _ROW_COL
from .reader import file_uri, read_delta, scan_adds
from .writer import check_append_only, enforce_constraints, schema_of, stage_files

DEFAULT_RETENTION_HOURS = 168  # 7 days, matching Delta's default
RETENTION_CHECK_CONF = "spark.delta_lake_spark.retentionDurationCheck.enabled"
DV_CONF = "deletionVectors"  # table configuration key: "true" => DV deletes

_ACTION_COL = "__dls_action"


_INT_WIDTH = {"byte": 1, "short": 2, "integer": 3, "long": 4}


def _is_type_widening(old, new) -> bool:
    """True when every value representable in ``old`` reads losslessly
    under ``new`` from existing parquet files (Delta typeWidening)."""
    from pyspark.sql.types import DecimalType

    if old == new:
        return False
    on, nn = old.typeName(), new.typeName()
    if on in _INT_WIDTH and nn in _INT_WIDTH:
        return _INT_WIDTH[nn] > _INT_WIDTH[on]
    if on == "float" and nn == "double":
        return True
    if isinstance(old, DecimalType) and isinstance(new, DecimalType):
        return (
            new.scale >= old.scale
            and new.precision - new.scale >= old.precision - old.scale
            and (new.precision, new.scale) != (old.precision, old.scale)
        )
    return False


def _as_column(cond: str | Column | None) -> Column | None:
    if cond is None:
        return None
    return F.expr(cond) if isinstance(cond, str) else cond


class MergeBuilder:
    """Accumulates WHEN MATCHED / WHEN NOT MATCHED clauses, then executes.

    Mirrors the reference's builder usage exactly
    (operations.py:149-166; delta_lake_rapid_start.py:398-420;
    utilities.py:61-73). Conditions may be SQL strings or Columns,
    including non-equi/RLIKE predicates (J4, 05_compliance.py:100-107) —
    Spark plans those as broadcast-nested-loop joins on its own.
    Clause order matters: the first clause whose condition holds wins,
    per Delta semantics.
    """

    def __init__(self, table: "DeltaTable", source: DataFrame, condition: str | Column):
        self._table = table
        self._source = source
        self._condition = condition
        self._matched: list[dict[str, Any]] = []
        self._not_matched: list[dict[str, Any]] = []
        self._not_matched_by_source: list[dict[str, Any]] = []
        self._evolve = False

    def with_schema_evolution(self):
        """MERGE schema evolution: source columns absent from the target
        are appended to the table schema by this merge; pre-existing rows
        read back as null for them (delta-spark's withSchemaEvolution)."""
        self._evolve = True
        return self

    # snake_case and delta-spark camelCase spellings both supported
    def when_matched_update(self, set: dict[str, str | Column], condition=None):
        self._matched.append({"kind": "update", "set": dict(set), "condition": condition})
        return self

    def when_matched_update_all(self, condition=None):
        self._matched.append({"kind": "update_all", "condition": condition})
        return self

    def when_matched_delete(self, condition=None):
        self._matched.append({"kind": "delete", "condition": condition})
        return self

    def when_not_matched_insert(self, values: dict[str, str | Column], condition=None):
        self._not_matched.append({"kind": "insert", "values": dict(values), "condition": condition})
        return self

    def when_not_matched_insert_all(self, condition=None):
        self._not_matched.append({"kind": "insert_all", "condition": condition})
        return self

    def when_not_matched_by_source_update(
        self, set: dict[str, str | Column], condition=None
    ):
        """Target rows with NO matching source row: update in place.
        Conditions/values may reference target columns only (there is
        no source row to read) — delta-spark's
        whenNotMatchedBySourceUpdate, the clause that makes one MERGE a
        full two-way sync (upsert + deprecate-missing)."""
        self._not_matched_by_source.append(
            {"kind": "update", "set": dict(set), "condition": condition}
        )
        return self

    def when_not_matched_by_source_delete(self, condition=None):
        """Target rows with NO matching source row: delete."""
        self._not_matched_by_source.append(
            {"kind": "delete", "condition": condition}
        )
        return self

    whenMatchedUpdate = when_matched_update
    whenMatchedUpdateAll = when_matched_update_all
    whenMatchedDelete = when_matched_delete
    whenNotMatchedInsert = when_not_matched_insert
    whenNotMatchedInsertAll = when_not_matched_insert_all
    whenNotMatchedBySourceUpdate = when_not_matched_by_source_update
    whenNotMatchedBySourceDelete = when_not_matched_by_source_delete
    withSchemaEvolution = with_schema_evolution

    # ---------- execution ----------

    def _source_col(self, name: str) -> Column:
        alias = self._table._source_alias
        if alias:
            return F.col(f"{alias}.{name}")
        return self._source[name]

    def _target_cols(self, schema: StructType, t_alias: str) -> list[Column]:
        return [F.col(f"{t_alias}.{f.name}") for f in schema.fields]

    def execute(self, operation_parameters: dict[str, Any] | None = None) -> int:
        t = self._table
        spark = t.spark
        log = t._log
        snap = log.snapshot()
        schema = schema_of(snap)
        new_fields: list = []
        if self._evolve:
            from pyspark.sql.types import StructField

            tbl_names = {f.name for f in schema.fields}
            new_fields = [
                StructField(f.name, f.dataType, True)
                for f in self._source.schema.fields
                if f.name not in tbl_names
            ]
            if new_fields:
                schema = StructType(list(schema.fields) + new_fields)
        new_names = {f.name for f in new_fields}
        col_names = [f.name for f in schema.fields]
        t_alias = t._alias or "target"
        src = self._source
        if t._source_alias:
            src = src.alias(t._source_alias)
        cond = _as_column(self._condition)

        bys = self._not_matched_by_source
        insert_only = not self._matched and not bys
        if not insert_only:
            # insert-only MERGE is a pure append and stays allowed
            check_append_only(snap, "MERGE with matched clauses")
        rt = rowtracking.enabled(snap)

        touched: list[str] = []
        if not insert_only and snap.files:
            with_file = t._read_files(sorted(snap.files), with_meta=True).alias(t_alias)
            uri_to_log = {file_uri(t.path, p): p for p in snap.files}
            touched_set: set[str] = set()
            if self._matched:
                # only matched clauses mutate rows that DO match the
                # source; a by-source-only merge leaves matched rows
                # untouched, so those files need no rewrite (and no scan)
                touched_rows = (
                    with_file.join(src, cond, "left_semi")
                    .select(_FILE_COL)
                    .distinct()
                    .collect()
                )
                touched_set = {uri_to_log[r[_FILE_COL]] for r in touched_rows}
            if bys:
                # by-source clauses mutate target rows that match NOTHING
                # in the source, so files untouched by the semi-join may
                # still need a rewrite: any file holding an anti-join row
                # where some clause condition fires
                fire = F.lit(False)
                for clause in bys:
                    ci = _as_column(clause.get("condition"))
                    fire = fire | (ci if ci is not None else F.lit(True))
                bys_rows = (
                    with_file.join(src, cond, "left_anti")
                    .filter(fire)
                    .select(_FILE_COL)
                    .distinct()
                    .collect()
                )
                touched_set |= {uri_to_log[r[_FILE_COL]] for r in bys_rows}
            touched = sorted(touched_set)

        outputs: list[DataFrame] = []
        n_update_clauses = sum(1 for c in self._matched if c["kind"] != "delete")

        if touched:
            t_touched = t._read_files(touched, with_meta=True, row_ids=rt).alias(
                t_alias
            )

            joined = t_touched.join(src, cond, "inner")
            # first-matching-clause disposition; -1 = no clause applies -> keep row as-is
            action: Column = F.lit(-1)
            chain = F.when(F.lit(False), F.lit(-1))
            for i, clause in enumerate(self._matched):
                ci = _as_column(clause.get("condition"))
                chain = chain.when(ci if ci is not None else F.lit(True), F.lit(i))
            action = chain.otherwise(F.lit(-1))
            joined = joined.withColumn(_ACTION_COL, action)

            if n_update_clauses:
                # Delta semantics: a target row matched by >1 source row is
                # ambiguous when an update clause exists
                dup = (
                    joined.groupBy(F.col(f"{t_alias}.{_FILE_COL}"), F.col(f"{t_alias}.{_ROW_COL}"))
                    .count()
                    .filter(F.col("count") > 1)
                    .limit(1)
                    .count()
                )
                if dup:
                    raise MergeAmbiguityError(
                        "MERGE: a target row matched multiple source rows "
                        "while an update clause is present"
                    )

            delete_ids = [i for i, c in enumerate(self._matched) if c["kind"] == "delete"]
            out_cols = []
            for name in col_names:
                base = (
                    F.lit(None).cast(schema[name].dataType)
                    if name in new_names  # evolved: target files lack it
                    else F.col(f"{t_alias}.{name}")
                )
                val = base
                expr_chain = None
                for i, clause in enumerate(self._matched):
                    if clause["kind"] == "update":
                        upd = clause["set"].get(name)
                        v = _as_column(upd) if upd is not None else base
                    elif clause["kind"] == "update_all":
                        # UPDATE SET * maps source columns; target-only
                        # columns keep their current values
                        v = (
                            self._source_col(name)
                            if name in self._source.columns
                            else base
                        )
                    else:
                        continue
                    branch = (F.col(_ACTION_COL) == i, v.cast(schema[name].dataType))
                    expr_chain = (
                        F.when(*branch) if expr_chain is None else expr_chain.when(*branch)
                    )
                if expr_chain is not None:
                    val = expr_chain.otherwise(base)
                out_cols.append(val.alias(name))
            if rt:
                # updated rows keep their row id but take this commit's
                # version (null materialized -> new file's default);
                # rows kept as-is keep both
                update_ids = [
                    i
                    for i, c in enumerate(self._matched)
                    if c["kind"] in ("update", "update_all")
                ]
                out_cols.append(
                    F.col(f"{t_alias}.{rowtracking.ROW_ID}").alias(
                        rowtracking.MAT_ROW_ID
                    )
                )
                rcv = F.col(f"{t_alias}.{rowtracking.ROW_COMMIT}")
                if update_ids:
                    rcv = F.when(
                        F.col(_ACTION_COL).isin(update_ids),
                        F.lit(None).cast("long"),
                    ).otherwise(rcv)
                out_cols.append(rcv.alias(rowtracking.MAT_ROW_COMMIT))

            if n_update_clauses:
                matched_out = joined
                if delete_ids:
                    matched_out = matched_out.filter(
                        ~F.col(_ACTION_COL).isin(delete_ids)
                    )
                matched_out = matched_out.select(*out_cols)
            else:
                # No update clause: every surviving matched row keeps its
                # current values, so rebuild from the target side alone.
                # left_semi emits each target row exactly once even when
                # >1 source row matches — the inner join above would write
                # a multiply-matched row once per matching source row.
                matched_out = t_touched.join(src, cond, "left_semi")
                if delete_ids:
                    # drop rows where ANY matching source row fires a
                    # delete clause (Delta allows multi-match for
                    # delete-only merges; the result is deterministic)
                    del_keys = (
                        joined.filter(F.col(_ACTION_COL).isin(delete_ids))
                        .select(
                            F.col(f"{t_alias}.{_FILE_COL}").alias(_FILE_COL),
                            F.col(f"{t_alias}.{_ROW_COL}").alias(_ROW_COL),
                        )
                        .distinct()
                    )
                    matched_out = matched_out.join(
                        del_keys, [_FILE_COL, _ROW_COL], "left_anti"
                    )
                matched_out = matched_out.select(*out_cols)
            outputs.append(matched_out)

            anti = t_touched.join(src, cond, "left_anti")
            if bys:
                # first-true by-source clause per row; -1 = keep as-is
                chain = F.when(F.lit(False), F.lit(-1))
                for i, clause in enumerate(bys):
                    ci = _as_column(clause.get("condition"))
                    chain = chain.when(
                        ci if ci is not None else F.lit(True), F.lit(i)
                    )
                anti = anti.withColumn(_ACTION_COL, chain.otherwise(F.lit(-1)))
                bys_delete_ids = [
                    i for i, c in enumerate(bys) if c["kind"] == "delete"
                ]
                bys_update_ids = [
                    i for i, c in enumerate(bys) if c["kind"] == "update"
                ]
                unmatched_cols = []
                for n in col_names:
                    base = (
                        F.lit(None).cast(schema[n].dataType)
                        if n in new_names
                        else F.col(f"{t_alias}.{n}")
                    )
                    val = base
                    expr_chain = None
                    for i, clause in enumerate(bys):
                        if clause["kind"] != "update":
                            continue
                        upd = clause["set"].get(n)
                        v = _as_column(upd) if upd is not None else base
                        branch = (
                            F.col(_ACTION_COL) == i,
                            v.cast(schema[n].dataType),
                        )
                        expr_chain = (
                            F.when(*branch)
                            if expr_chain is None
                            else expr_chain.when(*branch)
                        )
                    if expr_chain is not None:
                        val = expr_chain.otherwise(base)
                    unmatched_cols.append(val.alias(n))
                if rt:
                    unmatched_cols.append(
                        F.col(f"{t_alias}.{rowtracking.ROW_ID}").alias(
                            rowtracking.MAT_ROW_ID
                        )
                    )
                    rcv = F.col(f"{t_alias}.{rowtracking.ROW_COMMIT}")
                    if bys_update_ids:
                        rcv = F.when(
                            F.col(_ACTION_COL).isin(bys_update_ids),
                            F.lit(None).cast("long"),
                        ).otherwise(rcv)
                    unmatched_cols.append(rcv.alias(rowtracking.MAT_ROW_COMMIT))
                if bys_delete_ids:
                    anti = anti.filter(~F.col(_ACTION_COL).isin(bys_delete_ids))
                outputs.append(anti.select(*unmatched_cols))
            else:
                unmatched_cols = [
                    F.lit(None).cast(schema[n].dataType).alias(n)
                    if n in new_names
                    else F.col(f"{t_alias}.{n}").alias(n)
                    for n in col_names
                ]
                if rt:
                    unmatched_cols += [
                        F.col(f"{t_alias}.{rowtracking.ROW_ID}").alias(
                            rowtracking.MAT_ROW_ID
                        ),
                        F.col(f"{t_alias}.{rowtracking.ROW_COMMIT}").alias(
                            rowtracking.MAT_ROW_COMMIT
                        ),
                    ]
                outputs.append(anti.select(*unmatched_cols))

        if self._not_matched:
            t_for_anti = t.toDF().alias(t_alias)
            src_unmatched = src.join(t_for_anti, cond, "left_anti")
            for clause in self._not_matched:
                branch = src_unmatched
                ci = _as_column(clause.get("condition"))
                if ci is not None:
                    branch = branch.filter(ci)
                if clause["kind"] == "insert_all":
                    cols = [
                        self._source_col(n).cast(schema[n].dataType).alias(n)
                        if n in src_unmatched.columns
                        else F.lit(None).cast(schema[n].dataType).alias(n)
                        for n in col_names
                    ]
                else:
                    values = clause["values"]
                    cols = [
                        _as_column(values[n]).cast(schema[n].dataType).alias(n)
                        if n in values
                        else F.lit(None).cast(schema[n].dataType).alias(n)
                        for n in col_names
                    ]
                if rt:
                    # inserted rows get fresh ids: baseRowId + position
                    cols += [
                        F.lit(None).cast("long").alias(rowtracking.MAT_ROW_ID),
                        F.lit(None).cast("long").alias(rowtracking.MAT_ROW_COMMIT),
                    ]
                outputs.append(branch.select(*cols))

        if not outputs:
            return snap.version

        new_data = outputs[0]
        for o in outputs[1:]:
            new_data = new_data.unionByName(o)

        from .writer import fill_generated

        new_data = fill_generated(new_data, snap.metadata.configuration)
        enforce_constraints(new_data, snap.metadata.configuration)
        from .writer import with_physical_names

        schema = with_physical_names(schema, snap.metadata.configuration)
        adds = stage_files(
            new_data, t.path, list(snap.metadata.partitionColumns), schema=schema
        )
        now = _utc_millis()
        actions: list[dict[str, Any]] = [
            CommitInfo(
                operation="MERGE",
                operationParameters={
                    "predicate": str(self._condition),
                    "matchedClauses": [c["kind"] for c in self._matched],
                    "notMatchedClauses": [c["kind"] for c in self._not_matched],
                    "notMatchedBySourceClauses": [
                        c["kind"] for c in self._not_matched_by_source
                    ],
                    **(operation_parameters or {}),
                },
                readVersion=snap.version,
                operationMetrics={
                    "numTargetFilesRemoved": len(touched),
                    "numTargetFilesAdded": len(adds),
                },
            ).to_action()
        ]
        if new_fields:
            from .log import Metadata

            actions.append(
                Metadata(
                    schemaString=schema.json(),
                    partitionColumns=list(snap.metadata.partitionColumns),
                    configuration=dict(snap.metadata.configuration),
                    id=snap.metadata.id,
                    name=snap.metadata.name,
                    createdTime=snap.metadata.createdTime,
                ).to_action()
            )
        actions.extend(t._rt_assign(snap, adds))
        actions.extend(RemoveFile(p, deletionTimestamp=now).to_action() for p in touched)
        actions.extend(a.to_action() for a in adds)
        return t._commit_mutation(
            actions,
            touched,
            snap,
            content_neutral=False,
            rt_adds=adds if rt else None,
        )


class DeltaTable:
    """Handle over one versioned table (``DeltaTable.forPath`` analogue)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self._log = DeltaLog(self.path)
        self._alias: str | None = None
        self._source_alias: str | None = None
        if not self._log.exists():
            raise TableNotFoundError(f"{path} is not a delta_lake_spark table")

    # ---------- constructors ----------

    @classmethod
    def forPath(cls, spark: SparkSession, path: str) -> "DeltaTable":
        return cls(spark, path)

    for_path = forPath

    @classmethod
    def isDeltaTable(cls, spark: SparkSession, path: str) -> bool:
        return DeltaLog(path).exists()

    @classmethod
    def convertToDelta(
        cls, spark: SparkSession, parquet_path: str, partition_schema: str | None = None
    ) -> "DeltaTable":
        from .writer import convert_to_delta

        convert_to_delta(spark, parquet_path, partition_schema)
        return cls(spark, parquet_path)

    # ---------- reading ----------

    def alias(self, name: str) -> "DeltaTable":
        out = DeltaTable(self.spark, self.path)
        out._alias = name
        return out

    def toDF(self, version: int | None = None, row_ids: bool = False) -> DataFrame:
        df = read_delta(self.spark, self.path, version=version, row_ids=row_ids)
        return df.alias(self._alias) if self._alias else df

    to_df = toDF

    def version(self) -> int:
        return self._log.latest_version()

    def _read_files(
        self,
        rel_files: list[str],
        with_meta: bool = False,
        row_ids: bool = False,
    ) -> DataFrame:
        """Read a subset of the current snapshot's files (deletion
        vectors applied; optional FILE/ROW metadata columns;
        ``row_ids=True`` appends _row_id/_row_commit_version for
        rewrite paths that must preserve row identity)."""
        snap = self._log.snapshot()
        adds = [snap.files[f] for f in rel_files]
        return scan_adds(
            self.spark, self.path, adds, snap, with_meta=with_meta, row_ids=row_ids
        )

    def _rt_assign(self, snap, adds: list[AddFile]) -> list[dict[str, Any]]:
        """Row tracking for a mutation commit: give staged files fresh
        disjoint baseRowId ranges (the fallback id source for rows whose
        materialized __dls_row_id is null, e.g. MERGE inserts) and
        advance the high-water mark. Empty when the feature is off."""
        if not rowtracking.enabled(snap) or not adds:
            return []
        acts, _ = rowtracking.assign_fresh_ids(
            adds, rowtracking.high_water_mark(snap), snap.version + 1
        )
        return acts

    # ---------- metadata ----------

    def history(self) -> DataFrame:
        import json as _json

        rows = [
            (
                h["version"],
                h.get("timestamp"),
                h.get("operation"),
                _json.dumps(h.get("operationParameters") or {}),
                _json.dumps(h.get("operationMetrics") or {}),
                h.get("readVersion"),
            )
            for h in self._log.history()
        ]
        return self.spark.createDataFrame(
            rows,
            "version long, timestamp long, operation string, "
            "operationParameters string, operationMetrics string, readVersion long",
        )

    def detail(self) -> DataFrame:
        snap = self._log.snapshot()
        dv_adds = [a for a in snap.files.values() if a.deletionVector]
        return self.spark.createDataFrame(
            [
                (
                    "delta_lake_spark",
                    snap.metadata.id,
                    self.path,
                    snap.metadata.partitionColumns,
                    snap.num_files,
                    snap.size_bytes,
                    snap.metadata.createdTime,
                    len(dv_adds),
                    sum(
                        int(a.deletionVector.get("cardinality", 0)) for a in dv_adds
                    ),
                    snap.protocol.minReaderVersion,
                    snap.protocol.minWriterVersion,
                    sorted(snap.protocol.readerFeatures),
                    [
                        c.strip()
                        for c in snap.metadata.configuration.get(
                            "delta.clusteringColumns", ""
                        ).split(",")
                        if c.strip()
                    ],
                )
            ],
            "format string, id string, location string, "
            "partitionColumns array<string>, numFiles long, sizeInBytes long, "
            "createdTime long, numFilesWithDeletionVectors long, "
            "numDeletedRows long, minReaderVersion long, minWriterVersion long, "
            "tableFeatures array<string>, clusteringColumns array<string>",
        )

    def files(self) -> DataFrame:
        """Queryable file inventory of the current snapshot (the shape of
        an Iceberg-style ``files`` metadata table): path, size, rows,
        partition values, deletion-vector state. Driver cost is O(#files)
        metadata only — no data is read."""
        import json as _json

        snap = self._log.snapshot()
        rows = [
            (
                a.path,
                a.size,
                a.numRecords,
                _json.dumps(a.partitionValues or {}),
                a.deletionVector is not None,
                int((a.deletionVector or {}).get("cardinality", 0)),
            )
            for a in snap.files.values()
        ]
        return self.spark.createDataFrame(
            rows,
            "path string, size_bytes long, num_records long, "
            "partition_values string, has_deletion_vector boolean, "
            "deleted_rows long",
        )

    # ---------- mutations ----------

    def _commit_mutation(
        self,
        actions: list[dict[str, Any]],
        removed_paths: list[str],
        read_snap,
        content_neutral: bool,
        read_paths: list[str] | None = None,
        rt_adds: list[AddFile] | None = None,
    ) -> int:
        """Commit a mutation with conflict RESOLUTION, not just detection
        (Delta's disjoint-file rule). On a lost commit race, rebase and
        retry iff the winner provably cannot invalidate this mutation:

          - table metadata (schema/partitioning/constraints) unchanged;
          - every file this mutation removes/re-adds is byte-identical
            in the new snapshot (path, size, deletion vector) — nobody
            rewrote what we rewrote;
          - for predicate mutations (content_neutral=False): the winner
            added no dataChange files — a concurrent append/update could
            contain rows our predicate should have affected, which must
            serialize as a conflict — AND removed no file we read
            (Delta's concurrent-delete-read rule): a remove-only winner
            (DELETE dropping whole files, RESTORE) invalidates FIND /
            anti-join decisions made against those rows, e.g. a MERGE
            that skipped inserting a source row because it matched a
            now-deleted target row. Layout-only winners (OPTIMIZE,
            PURGE, metadata commits) are always safe to rebase over.
            Content-neutral mutations (our own OPTIMIZE/PURGE) rebase
            over appends too — compaction ignores files it didn't read.

        Domain metadata: a winner that wrote a domain this commit also
        writes conflicts (last-writer-wins would silently drop the
        winner's state) — EXCEPT the row-tracking high-water mark,
        which is pure allocator state: when ``rt_adds`` (this commit's
        staged files) is passed, the rebase reassigns their baseRowId
        ranges against the winner's advanced mark instead of raising.
        """
        read_snap.protocol.check_write_support(self.path)
        our_domains = {
            x["domainMetadata"]["domain"] for x in actions if "domainMetadata" in x
        }
        for attempt in range(4):
            try:
                return self._log.commit_next(actions, retries=0)
            except ConcurrentModificationError:
                if attempt == 3:
                    raise
                new_snap = self._log.snapshot()
                if (
                    new_snap.metadata.to_action()
                    != read_snap.metadata.to_action()
                ):
                    raise
                for p in removed_paths:
                    old = read_snap.files.get(p)
                    new = new_snap.files.get(p)
                    if old is None or new is None or old.to_action() != new.to_action():
                        raise
                if our_domains:
                    for v in range(read_snap.version + 1, new_snap.version + 1):
                        for action in self._log._read_actions(v):
                            dm = action.get("domainMetadata")
                            if not dm or dm["domain"] not in our_domains:
                                continue
                            if (
                                dm["domain"] != rowtracking.ROW_TRACKING_DOMAIN
                                or rt_adds is None
                            ):
                                raise
                if not content_neutral:
                    for p, a in new_snap.files.items():
                        if p not in read_snap.files and a.dataChange:
                            raise
                    # concurrent-delete-read: a winner whose commit
                    # REMOVED (dataChange=True) a file this txn read
                    # invalidates FIND / anti-join decisions made against
                    # those rows (e.g. a MERGE that skipped inserting a
                    # source row matched to a now-deleted target row).
                    # dataChange=False removals (OPTIMIZE/PURGE moves)
                    # keep every row live in re-added files, so reads
                    # stay valid. read_paths = the stats/partition-pruned
                    # scan set when the caller tracked it; default is
                    # conservative (everything in the read snapshot).
                    read_set = (
                        set(read_paths)
                        if read_paths is not None
                        else set(read_snap.files)
                    )
                    for v in range(
                        read_snap.version + 1, new_snap.version + 1
                    ):
                        for action in self._log._read_actions(v):
                            rm = action.get("remove")
                            if (
                                rm
                                and rm.get("dataChange", True)
                                and rm["path"] in read_set
                            ):
                                raise
                if rt_adds is not None and rowtracking.enabled(new_snap):
                    # the winner may have consumed our id range — rebase
                    # reassigns fresh baseRowIds above its high-water mark
                    rt_acts, _ = rowtracking.assign_fresh_ids(
                        rt_adds,
                        rowtracking.high_water_mark(new_snap),
                        new_snap.version + 1,
                    )
                    add_paths = {a.path for a in rt_adds}
                    actions = [
                        x
                        for x in actions
                        if not (
                            ("add" in x and x["add"]["path"] in add_paths)
                            or x.get("domainMetadata", {}).get("domain")
                            == rowtracking.ROW_TRACKING_DOMAIN
                        )
                    ]
                    actions.extend(rt_acts)
                    actions.extend(a.to_action() for a in rt_adds)
        raise AssertionError("unreachable")

    def _touched_files(
        self, cond: Column, cond_str: str | None = None
    ) -> tuple[list[str], list[str]]:
        """Exact touched-file discovery: one scan with _metadata.file_path,
        pre-pruned by log stats when the condition is a simple SQL string
        (data skipping — at scale the FIND scan touches only files whose
        min/max ranges overlap the predicate). Returns (touched paths,
        read paths): the second is the pruned scan set, which bounds the
        concurrent-delete-read conflict check in _commit_mutation."""
        from .skipping import prune_adds

        from .writer import column_mapping

        snap = self._log.snapshot()
        adds = list(snap.files.values())
        if cond_str:
            adds, _ = prune_adds(
                adds, cond_str, colmap=column_mapping(schema_of(snap))
            )
        if not adds:
            return [], []
        read_paths = [a.path for a in adds]
        df = self._read_files(read_paths, with_meta=True)
        rows = df.filter(cond).select(_FILE_COL).distinct().collect()
        uri_to_log = {file_uri(self.path, a.path): a.path for a in adds}
        return sorted(uri_to_log[r[_FILE_COL]] for r in rows), read_paths

    def delete(
        self, condition: str | Column | None = None, use_dv: bool | None = None
    ) -> int:
        """Predicate delete (M5; reference delta_lake_rapid_start.py:585-587).

        Only files containing matching rows are rewritten; a predicate on
        the partition column therefore touches exactly that partition's
        files (partition-pruned delete, SURVEY.md §4).

        ``use_dv=True`` (or table configuration ``deletionVectors=true``)
        switches to deletion vectors: instead of rewriting touched files,
        commit a (file, row position) sidecar marking rows deleted. At
        100 TB, deleting 0.01% of rows scattered across every file costs
        one scan + a tiny sidecar write instead of a full-table rewrite;
        ``purge_deletion_vectors()`` (REORG APPLY PURGE) folds them back
        into clean files later.
        """
        snap = self._log.snapshot()
        check_append_only(snap, "DELETE")
        cond = _as_column(condition)
        if use_dv is None:
            use_dv = snap.metadata.configuration.get(DV_CONF, "").lower() == "true"
        if use_dv and cond is not None:
            return self._dv_delete(
                cond, condition if isinstance(condition, str) else None, snap
            )
        now = _utc_millis()
        rt = rowtracking.enabled(snap)
        if cond is None:
            touched = sorted(snap.files)
            read_paths = touched
            adds = []
        else:
            touched, read_paths = self._touched_files(
                cond, condition if isinstance(condition, str) else None
            )
            if not touched:
                return snap.version
            kept = self._read_files(touched, row_ids=rt).filter(
                ~F.coalesce(cond, F.lit(False))
            )
            if rt:
                kept = rowtracking.materialize(kept)
            adds = stage_files(
                kept,
                self.path,
                list(snap.metadata.partitionColumns),
                schema=schema_of(snap),
            )
        actions: list[dict[str, Any]] = [
            CommitInfo(
                operation="DELETE",
                operationParameters={"predicate": str(condition)},
                readVersion=snap.version,
                operationMetrics={
                    "numRemovedFiles": len(touched),
                    "numAddedFiles": len(adds),
                },
            ).to_action()
        ]
        actions.extend(self._rt_assign(snap, adds))
        actions.extend(RemoveFile(p, deletionTimestamp=now).to_action() for p in touched)
        actions.extend(a.to_action() for a in adds)
        return self._commit_mutation(
            actions,
            touched,
            snap,
            content_neutral=False,
            read_paths=read_paths,
            rt_adds=adds if rt else None,
        )

    def _dv_delete(self, cond: Column, cond_str: str | None, snap) -> int:
        """DELETE via deletion vectors: no data file is rewritten.

        FIND is the same stats-pruned scan as the rewrite path, but the
        output is the matching (file, row position) set, written as one
        parquet sidecar per commit. Touched files are re-added pointing
        at the sidecar; when a file already carries a DV the old deleted
        set is folded into the new sidecar (the scan excluded those rows,
        so old and new sets are disjoint and cardinalities add)."""
        import uuid as _uuid

        from .skipping import prune_adds
        from .writer import column_mapping

        adds = list(snap.files.values())
        if cond_str:
            # colmap mirrors _touched_files: stats are keyed by PHYSICAL
            # names, so under columnMapping a renamed logical column must
            # translate before consulting min/max or pruning goes wrong
            adds, _ = prune_adds(
                adds, cond_str, colmap=column_mapping(schema_of(snap))
            )
        if not adds:
            return snap.version

        df = scan_adds(self.spark, self.path, adds, snap, with_meta=True)
        uri_map = self.spark.createDataFrame(
            [(file_uri(self.path, a.path), a.path) for a in adds],
            f"{_FILE_COL} string, path string",
        )
        new_dv = (
            df.filter(F.coalesce(cond, F.lit(False)))
            .select(_FILE_COL, F.col(_ROW_COL).alias("row_index"))
            .join(F.broadcast(uri_map), _FILE_COL)
            .select("path", "row_index")
        )
        new_counts = {
            r["path"]: r["count"]
            for r in new_dv.groupBy("path").count().collect()
        }
        if not new_counts:
            return snap.version

        by_path = {a.path: a for a in adds}
        touched = sorted(new_counts)
        # carry over prior DV rows of touched files into the new sidecar,
        # rekeyed to the current add path (a cloned file's old sidecar is
        # keyed by the source table's path, recorded in deletionVector.key)
        carried: list[DataFrame] = [new_dv]
        old_card: dict[str, int] = {}
        prior: dict[str, list[tuple[str, str]]] = {}  # sidecar -> [(old_key, new_key)]
        for p in touched:
            a = by_path[p]
            if a.deletionVector:
                old_key = a.deletionVector.get("key", a.path)
                prior.setdefault(a.deletionVector["path"], []).append((old_key, p))
                old_card[p] = int(a.deletionVector.get("cardinality", 0))
        for sidecar, keymap in prior.items():
            sc_abs = (
                sidecar if os.path.isabs(sidecar) else os.path.join(self.path, sidecar)
            )
            rekey = self.spark.createDataFrame(
                keymap, "path string, __dls_newpath string"
            )
            carried.append(
                self.spark.read.parquet(sc_abs)
                .join(F.broadcast(rekey), "path")
                .select(F.col("__dls_newpath").alias("path"), "row_index")
            )
        dv_rows = carried[0]
        for c in carried[1:]:
            dv_rows = dv_rows.unionByName(c)

        dv_rel = os.path.join("deletion_vectors", _uuid.uuid4().hex[:16])
        dv_rows.write.parquet(os.path.join(self.path, dv_rel))

        now = _utc_millis()
        actions: list[dict[str, Any]] = [
            CommitInfo(
                operation="DELETE",
                operationParameters={"predicate": str(cond_str or cond), "mode": "dv"},
                readVersion=snap.version,
                operationMetrics={
                    "numDeletedRows": sum(new_counts.values()),
                    "numDeletionVectorsAdded": len(touched),
                },
            ).to_action()
        ]
        actions.extend(self._feature_upgrade(snap, "deletionVectors"))
        for p in touched:
            a = by_path[p]
            actions.append(
                AddFile(
                    path=a.path,
                    partitionValues=a.partitionValues,
                    size=a.size,
                    numRecords=a.numRecords,
                    stats=a.stats,
                    modificationTime=now,
                    dataChange=True,
                    deletionVector={
                        "path": dv_rel,
                        "cardinality": new_counts[p] + old_card.get(p, 0),
                    },
                    # file bytes are untouched, so row ids survive a DV
                    # delete with zero extra work
                    baseRowId=a.baseRowId,
                    defaultRowCommitVersion=a.defaultRowCommitVersion,
                ).to_action()
            )
        return self._commit_mutation(
            actions,
            touched,
            snap,
            content_neutral=False,
            read_paths=[a.path for a in adds],
        )

    def purge_deletion_vectors(self) -> int:
        """REORG TABLE ... APPLY (PURGE): rewrite every file that carries
        a deletion vector into a clean file (dataChange=False — the
        table's logical content is unchanged), so sidecars become
        unreferenced and VACUUM can reclaim them."""
        snap = self._log.snapshot()
        dv_adds = [a for a in snap.files.values() if a.deletionVector]
        if not dv_adds:
            return snap.version
        rt = rowtracking.enabled(snap)
        df = scan_adds(self.spark, self.path, dv_adds, snap, row_ids=rt)
        if rt:
            df = rowtracking.materialize(df)
        adds = stage_files(
            df,
            self.path,
            list(snap.metadata.partitionColumns),
            data_change=False,
            schema=schema_of(snap),
        )
        now = _utc_millis()
        actions: list[dict[str, Any]] = [
            CommitInfo(
                operation="PURGE",
                readVersion=snap.version,
                operationMetrics={
                    "numFilesPurged": len(dv_adds),
                    "numFilesAdded": len(adds),
                },
            ).to_action()
        ]
        actions.extend(self._rt_assign(snap, adds))
        actions.extend(
            RemoveFile(a.path, deletionTimestamp=now, dataChange=False).to_action()
            for a in dv_adds
        )
        actions.extend(a.to_action() for a in adds)
        return self._commit_mutation(
            actions,
            [a.path for a in dv_adds],
            snap,
            content_neutral=True,
            rt_adds=adds if rt else None,
        )

    def clone(self, target_path: str, shallow: bool = True) -> "DeltaTable":
        """CLONE: create an independent table at ``target_path``.

        Shallow clone is metadata-only — version 0 of the clone references
        the source's CURRENT data files by absolute path (zero bytes
        copied; at 100 TB this is how you fork a table for experiments).
        Writes/mutations on the clone stage new files locally and never
        touch the source; the clone's VACUUM only walks its own directory
        so source files are never reclaimed by the clone. Deep clone
        copies the data through a staged write."""
        from .log import Metadata

        target_path = os.path.abspath(target_path)
        snap = self._log.snapshot()
        target_log = DeltaLog(target_path)
        if target_log.exists():
            raise ValueError(f"{target_path} is already a table")

        if not shallow:
            from .writer import write_delta

            write_delta(
                self.toDF(),
                target_path,
                mode="append",
                partition_by=list(snap.metadata.partitionColumns),
                operation="CLONE",
                operation_parameters={"source": self.path, "shallow": False},
            )
            return DeltaTable(self.spark, target_path)

        def _abs(p: str) -> str:
            return p if os.path.isabs(p) else os.path.join(self.path, p)

        meta = Metadata(
            schemaString=snap.metadata.schemaString,
            partitionColumns=list(snap.metadata.partitionColumns),
            configuration=dict(snap.metadata.configuration),
            name=snap.metadata.name,
        )
        actions: list[dict[str, Any]] = [
            CommitInfo(
                operation="CLONE",
                operationParameters={
                    "source": self.path,
                    "sourceVersion": snap.version,
                    "shallow": True,
                },
                operationMetrics={"numCopiedFiles": 0, "numReferencedFiles": len(snap.files)},
            ).to_action(),
            snap.protocol.to_action(),  # clone inherits the feature set
            meta.to_action(),
        ]
        for a in snap.files.values():
            dv = None
            if a.deletionVector:
                dv = dict(
                    a.deletionVector,
                    path=_abs(a.deletionVector["path"]),
                    key=a.deletionVector.get("key", a.path),
                )
            actions.append(
                AddFile(
                    path=_abs(a.path),
                    partitionValues=a.partitionValues,
                    size=a.size,
                    numRecords=a.numRecords,
                    stats=a.stats,
                    modificationTime=a.modificationTime,
                    dataChange=True,
                    deletionVector=dv,
                ).to_action()
            )
        target_log.commit(0, actions)
        return DeltaTable(self.spark, target_path)

    def update(self, condition: str | Column, set: dict[str, str | Column]) -> int:
        """UPDATE t SET ... WHERE ... via touched-file rewrite."""
        snap = self._log.snapshot()
        check_append_only(snap, "UPDATE")
        schema = schema_of(snap)
        cond = _as_column(condition)
        touched, read_paths = self._touched_files(
            cond, condition if isinstance(condition, str) else None
        )
        if not touched:
            return snap.version
        rt = rowtracking.enabled(snap)
        df = self._read_files(touched, row_ids=rt)
        match = F.coalesce(cond, F.lit(False))
        out_cols = []
        for f in schema.fields:
            if f.name in set:
                new_v = _as_column(set[f.name]).cast(f.dataType)
                out_cols.append(
                    F.when(match, new_v).otherwise(F.col(f.name)).alias(f.name)
                )
            else:
                out_cols.append(F.col(f.name))
        if rt:
            # updated rows keep their id but take THIS commit's version
            # (materialized null -> falls back to the new file's
            # defaultRowCommitVersion); untouched rows keep both
            out_cols.append(F.col(rowtracking.ROW_ID).alias(rowtracking.MAT_ROW_ID))
            out_cols.append(
                F.when(match, F.lit(None).cast("long"))
                .otherwise(F.col(rowtracking.ROW_COMMIT))
                .alias(rowtracking.MAT_ROW_COMMIT)
            )
        rewritten = df.select(*out_cols)
        from .writer import apply_generated

        rewritten = apply_generated(rewritten, snap.metadata.configuration)
        enforce_constraints(rewritten, snap.metadata.configuration)
        adds = stage_files(
            rewritten,
            self.path,
            list(snap.metadata.partitionColumns),
            schema=schema_of(snap),
        )
        now = _utc_millis()
        actions: list[dict[str, Any]] = [
            CommitInfo(
                operation="UPDATE",
                operationParameters={"predicate": str(condition)},
                readVersion=snap.version,
                operationMetrics={
                    "numRemovedFiles": len(touched),
                    "numAddedFiles": len(adds),
                },
            ).to_action()
        ]
        actions.extend(self._rt_assign(snap, adds))
        actions.extend(RemoveFile(p, deletionTimestamp=now).to_action() for p in touched)
        actions.extend(a.to_action() for a in adds)
        return self._commit_mutation(
            actions,
            touched,
            snap,
            content_neutral=False,
            read_paths=read_paths,
            rt_adds=adds if rt else None,
        )

    def merge(
        self,
        source: DataFrame,
        condition: str | Column,
        source_alias: str | None = None,
    ) -> MergeBuilder:
        """Start a MERGE. ``condition`` may reference the target through
        this handle's ``alias()`` (default alias: ``target``) and the
        source through ``source_alias`` (or an alias already applied to
        the source DataFrame by the caller)."""
        self._source_alias = source_alias
        return MergeBuilder(self, source, condition)

    # ---------- maintenance ----------

    def vacuum(
        self,
        retention_hours: float = DEFAULT_RETENTION_HOURS,
        dry_run: bool = False,
        lite: bool = False,
    ) -> list[str]:
        """Physically delete files unreferenced by the CURRENT version and
        older than the retention window (M8; reference
        05_compliance.py:295-336). Refuses retention below 168h unless
        ``spark.delta_lake_spark.retentionDurationCheck.enabled=false``,
        mirroring Delta's safety flag. Returns deleted paths; old-version
        time travel whose files were removed now raises
        DataFileLostError (reader.py). ``dry_run=True`` (VACUUM ... DRY
        RUN) lists the candidates without deleting anything.

        ``lite=True`` (VACUUM ... LITE): candidates come from the
        transaction log's ``remove`` actions instead of a full directory
        listing — at object-store scale a recursive LIST over 10^6+ keys
        is the expensive operation, while the log already knows every
        file a commit removed and when. LITE cannot reclaim orphans the
        log never saw (files staged by crashed writers before their
        commit); run a full VACUUM occasionally for those."""
        check_enabled = (
            str(self.spark.conf.get(RETENTION_CHECK_CONF, "true")).lower() != "false"
        )
        if retention_hours < DEFAULT_RETENTION_HOURS and check_enabled:
            raise RetentionSafetyError(
                f"retention {retention_hours}h < {DEFAULT_RETENTION_HOURS}h; set "
                f"{RETENTION_CHECK_CONF}=false to override"
            )
        snap = self._log.snapshot()
        live = {os.path.normpath(p) for p in snap.files}
        # deletion-vector sidecar dirs referenced by the current snapshot
        # are live too (their part files would otherwise look unreferenced)
        live_dv_dirs = {
            os.path.normpath(a.deletionVector["path"])
            for a in snap.files.values()
            if a.deletionVector
        }
        cutoff = time.time() - retention_hours * 3600
        deleted: list[str] = []
        if lite:
            # log-driven candidates: every `remove` action across the
            # log whose deletionTimestamp is past retention and whose
            # path isn't live again (re-added by RESTORE) — no LIST
            seen: set[str] = set()
            for v in self._log._versions():
                try:
                    acts = self._log._read_actions(v)
                except OSError:
                    continue  # expired commit behind a checkpoint
                for action in acts:
                    if "remove" not in action:
                        continue
                    rel = os.path.normpath(action["remove"]["path"])
                    if rel in live or rel in seen:
                        continue
                    ts = action["remove"].get("deletionTimestamp")
                    if ts is not None and ts / 1000.0 > cutoff:
                        continue
                    seen.add(rel)
                    abs_f = os.path.join(self.path, rel)
                    if os.path.exists(abs_f):
                        if not dry_run:
                            os.unlink(abs_f)
                        deleted.append(rel)
            return deleted
        for root, _dirs, names in os.walk(self.path):
            if "_delta_log" in root:
                continue
            for name in names:
                if not name.endswith(".parquet"):
                    continue
                abs_f = os.path.join(root, name)
                rel = os.path.normpath(os.path.relpath(abs_f, self.path))
                if rel in live:
                    continue
                if any(
                    rel == d or rel.startswith(d + os.sep) for d in live_dv_dirs
                ):
                    continue
                if os.path.getmtime(abs_f) <= cutoff:
                    if not dry_run:
                        os.unlink(abs_f)
                    deleted.append(rel)
        if dry_run:
            return deleted
        # drop now-empty data dirs
        for root, dirs, names in os.walk(os.path.join(self.path, "data"), topdown=False):
            if not dirs and not names:
                try:
                    os.rmdir(root)
                except OSError:
                    pass
        return deleted

    def optimize(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        small_file_bytes: int | None = None,
        cluster_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        zorder_bits: int = 6,
        partition_filter: dict[str, object] | None = None,
    ) -> int:
        """Bin-packing compaction: rewrite each partition's small files
        into ~target-size files, committed with dataChange=False so
        downstream incremental readers ignore it. (BASELINE.json approach
        line: compaction/vacuum; not present in the reference itself.)

        ``cluster_by``: range-cluster the rewritten rows on these columns
        (repartitionByRange + in-file sort), so each output file covers a
        tight min/max range and stats-based data skipping on those columns
        prunes most files — the single-dimension form of Z-ordering.

        ``zorder_by``: Morton-interleave the quantile-bucket bits of
        SEVERAL columns into one sort key (zorder.py), so skipping prunes
        on any clustered column, not just the first. With either
        clustering option, ALL files in the partition are rewritten
        (clustering is a layout change, not just small-file cleanup).

        ``partition_filter`` ({partition col: value}) scopes the whole
        operation to matching partitions — the daily pattern at scale:
        compact/re-cluster just the partition that took today's small
        appends instead of touching the other 10^3 partitions."""
        if cluster_by and zorder_by:
            raise ValueError("pass cluster_by OR zorder_by, not both")
        snap = self._log.snapshot()
        if cluster_by is None and zorder_by is None:
            # clustered table (delta.clusteringColumns, Delta's liquid-
            # clustering declaration): a bare OPTIMIZE re-clusters on
            # the table-declared columns, so ingestion jobs never need
            # to repeat the layout choice at every call site
            declared = snap.metadata.configuration.get(
                "delta.clusteringColumns"
            )
            if declared:
                cols = [c.strip() for c in declared.split(",") if c.strip()]
                if len(cols) == 1:
                    cluster_by = cols
                elif cols:
                    zorder_by = cols
        small_file_bytes = small_file_bytes or target_file_bytes // 2
        clustering = bool(cluster_by or zorder_by)
        wanted = None
        if partition_filter:
            wanted = {
                k: (None if v is None else str(v))
                for k, v in partition_filter.items()
            }
        by_part: dict[tuple, list] = {}
        for add in snap.files.values():
            if wanted is not None and not all(
                add.partitionValues.get(k) == v for k, v in wanted.items()
            ):
                continue
            if clustering or add.size < small_file_bytes:
                key = tuple(sorted(add.partitionValues.items()))
                by_part.setdefault(key, []).append(add)

        zcol = None
        if zorder_by:
            from .zorder import zvalue_expr

            zcol = zvalue_expr(self.toDF(), zorder_by, bits=zorder_bits)

        rt = rowtracking.enabled(snap)
        removes: list[str] = []
        all_adds = []
        for _key, adds in by_part.items():
            if len(adds) < 2 and not clustering:
                continue
            total = sum(a.size for a in adds)
            n_out = max(1, -(-total // target_file_bytes))
            df = self._read_files([a.path for a in adds], row_ids=rt)
            if rt:
                df = rowtracking.materialize(df)
            if zcol is not None:
                df = (
                    df.withColumn("__dls_z", zcol)
                    .repartitionByRange(n_out, "__dls_z")
                    .sortWithinPartitions("__dls_z")
                    .drop("__dls_z")
                )
            elif cluster_by:
                df = df.repartitionByRange(n_out, *cluster_by).sortWithinPartitions(
                    *cluster_by
                )
            else:
                df = df.coalesce(n_out)
            all_adds.extend(
                stage_files(
                    df,
                    self.path,
                    list(snap.metadata.partitionColumns),
                    data_change=False,
                    schema=schema_of(snap),
                )
            )
            removes.extend(a.path for a in adds)
        if not removes:
            return snap.version
        now = _utc_millis()
        actions: list[dict[str, Any]] = [
            CommitInfo(
                operation="OPTIMIZE",
                operationParameters={
                    "targetFileBytes": target_file_bytes,
                    "clusterBy": cluster_by or [],
                    "zorderBy": zorder_by or [],
                },
                readVersion=snap.version,
                operationMetrics={
                    "numRemovedFiles": len(removes),
                    "numAddedFiles": len(all_adds),
                },
            ).to_action()
        ]
        actions.extend(self._rt_assign(snap, all_adds))
        actions.extend(
            RemoveFile(p, deletionTimestamp=now, dataChange=False).to_action()
            for p in removes
        )
        actions.extend(a.to_action() for a in all_adds)
        return self._commit_mutation(
            actions,
            removes,
            snap,
            content_neutral=True,
            rt_adds=all_adds if rt else None,
        )

    # ---------- CHECK constraints ----------

    def add_constraint(self, name: str, expr: str) -> int:
        """ALTER TABLE ADD CONSTRAINT name CHECK (expr): validate the
        CURRENT data satisfies it, then record it in table configuration
        so every future write/merge/update enforces it at commit time."""
        snap = self._log.snapshot()
        key = f"constraint.{name}"
        if key in snap.metadata.configuration:
            raise ValueError(f"constraint {name} already exists")
        enforce_constraints(self.toDF(), {key: expr})
        meta = self._metadata_with_configuration(
            snap, {**snap.metadata.configuration, key: expr}
        )
        return self._log.commit_next(
            [
                CommitInfo(
                    operation="ADD CONSTRAINT",
                    operationParameters={"name": name, "expr": expr},
                    readVersion=snap.version,
                ).to_action(),
                meta.to_action(),
            ],
            retries=0,
        )

    def drop_constraint(self, name: str) -> int:
        snap = self._log.snapshot()
        key = f"constraint.{name}"
        if key not in snap.metadata.configuration:
            raise ValueError(f"constraint {name} does not exist")
        conf = {k: v for k, v in snap.metadata.configuration.items() if k != key}
        meta = self._metadata_with_configuration(snap, conf)
        return self._log.commit_next(
            [
                CommitInfo(
                    operation="DROP CONSTRAINT",
                    operationParameters={"name": name},
                    readVersion=snap.version,
                ).to_action(),
                meta.to_action(),
            ],
            retries=0,
        )

    # ---------- schema evolution (ALTER TABLE ... COLUMN) ----------

    def _commit_schema(
        self, snap, new_schema, operation: str, params: dict[str, Any],
        configuration: dict[str, str] | None = None,
        extra_actions: list[dict[str, Any]] | None = None,
        at_version: int | None = None,
    ) -> int:
        from .log import Metadata

        snap.protocol.check_write_support(self.path)
        meta = Metadata(
            schemaString=new_schema.json(),
            partitionColumns=list(snap.metadata.partitionColumns),
            configuration=(
                configuration
                if configuration is not None
                else snap.metadata.configuration
            ),
            id=snap.metadata.id,
            name=snap.metadata.name,
            createdTime=snap.metadata.createdTime,
        )
        actions = [
            CommitInfo(
                operation=operation,
                operationParameters=params,
                readVersion=snap.version,
            ).to_action(),
            *(extra_actions or []),
            meta.to_action(),
        ]
        if at_version is not None:
            # pin the exact version: the caller embedded it in the
            # metadata (e.g. typeChanges tableVersion provenance), so a
            # concurrent commit must fail loudly, never land elsewhere
            return self._log.commit(at_version, actions)
        return self._log.commit_next(actions, retries=0)

    def _feature_upgrade(self, snap, feature: str) -> list[dict[str, Any]]:
        """Protocol action adding a reader feature, or [] when the table
        already declares it (committed alongside the enabling change)."""
        if feature in snap.protocol.readerFeatures:
            return []
        return [snap.protocol.with_features(reader=[feature]).to_action()]

    def _assert_column_alterable(self, snap, col: str, action: str) -> None:
        import re as _re

        if col in snap.metadata.partitionColumns:
            raise ValueError(f"cannot {action} partition column {col}")
        for k, v in snap.metadata.configuration.items():
            for prefix in ("constraint.", "generated.", "identity."):
                if not k.startswith(prefix):
                    continue
                target = k[len(prefix):]
                if target.lower() == col.lower() or _re.search(
                    rf"\b{_re.escape(col)}\b", str(v), _re.IGNORECASE
                ):
                    raise ValueError(
                        f"cannot {action} column {col}: referenced by table "
                        f"configuration {k!r}"
                    )

    def _mapped_schema(self, snap, schema):
        """Freeze every field's current name as its physical name (first
        RENAME/DROP upgrades the table to columnMapping.mode=name — the
        names already on disk become the immutable physical names)."""
        from pyspark.sql.types import StructField, StructType

        from .writer import MAPPING_MODE_KEY, PHYSICAL_KEY, physical_name

        conf = dict(snap.metadata.configuration)
        if conf.get(MAPPING_MODE_KEY) == "name":
            return schema, conf
        conf[MAPPING_MODE_KEY] = "name"
        frozen = StructType(
            [
                StructField(
                    f.name,
                    f.dataType,
                    f.nullable,
                    {**(f.metadata or {}), PHYSICAL_KEY: physical_name(f)},
                )
                for f in schema.fields
            ]
        )
        return frozen, conf

    def add_columns(
        self, columns: dict[str, str], defaults: dict[str, str] | None = None
    ) -> int:
        """ALTER TABLE ADD COLUMNS ({name: ddl type}). Metadata-only:
        existing files simply lack the column and readers surface NULL
        (the parquet scan fills missing fields); no data is rewritten.
        Under column mapping, new columns get fresh physical names so a
        re-added name never resurrects dropped data.

        ``defaults`` ({name: sql expr}) records a column DEFAULT: future
        writes that omit the column get the expression computed JVM-side
        (apply_defaults); existing rows still read NULL — Delta's
        allowColumnDefaults semantics, where defaults apply to new
        writes only."""
        from pyspark.sql.types import StructField, StructType

        from .writer import DEFAULT_PREFIX, with_physical_names

        snap = self._log.snapshot()
        schema = schema_of(snap)
        existing = {f.name.lower() for f in schema.fields}
        new_fields = []
        for name, ddl in columns.items():
            if name.lower() in existing:
                raise ValueError(f"column {name} already exists")
            dt = StructType.fromDDL(f"`{name}` {ddl}").fields[0].dataType
            new_fields.append(StructField(name, dt, True))
        for name in defaults or {}:
            if name not in columns:
                raise ValueError(
                    f"default for {name!r} must accompany its ADD COLUMN"
                )
        new_schema = with_physical_names(
            StructType(list(schema.fields) + new_fields),
            snap.metadata.configuration,
        )
        configuration = None
        if defaults:
            configuration = {
                **snap.metadata.configuration,
                **{DEFAULT_PREFIX + c: e for c, e in defaults.items()},
            }
        return self._commit_schema(
            snap,
            new_schema,
            "ADD COLUMNS",
            {"columns": dict(columns), **({"defaults": dict(defaults)} if defaults else {})},
            configuration=configuration,
        )

    def drop_feature(self, feature: str) -> int:
        """ALTER TABLE DROP FEATURE — remove a table feature from the
        protocol so pre-feature clients can use the table again, with
        the safety gates Delta applies: a feature whose TRACES are still
        in the table is not droppable until those traces are gone.

          - deletionVectors: requires purge_deletion_vectors first (a
            live DV sidecar would silently resurrect deleted rows for
            a reader that ignores the feature);
          - inCommitTimestamp / rowTracking: the enabling property is
            switched off in the same commit; historical commit fields
            are harmless to feature-unaware readers;
          - columnMapping / typeWidening: refused — data files depend
            on them permanently (physical names; narrow on-disk types).
        """
        snap = self._log.snapshot()
        features = set(snap.protocol.readerFeatures) | set(
            snap.protocol.writerFeatures
        )
        if feature not in features:
            raise ValueError(f"table does not declare feature {feature!r}")
        if feature in ("columnMapping", "typeWidening"):
            raise ValueError(
                f"feature {feature!r} cannot be dropped: existing data "
                "files depend on it (physical column names / narrow "
                "on-disk types)"
            )
        conf = dict(snap.metadata.configuration)
        if feature == "deletionVectors":
            if any(a.deletionVector for a in snap.files.values()):
                raise ValueError(
                    "cannot drop deletionVectors while files carry DV "
                    "sidecars; run purge_deletion_vectors() first"
                )
            conf.pop("delta.enableDeletionVectors", None)
        elif feature == "inCommitTimestamp":
            conf.pop(ICT_PROP, None)
            conf.pop("delta.inCommitTimestampEnablementVersion", None)
            conf.pop("delta.inCommitTimestampEnablementTimestamp", None)
        elif feature == "rowTracking":
            conf.pop("delta.enableRowTracking", None)
        meta = self._metadata_with_configuration(snap, conf)
        return self._log.commit_next(
            [
                CommitInfo(
                    operation="DROP FEATURE",
                    operationParameters={"feature": feature},
                    readVersion=snap.version,
                ).to_action(),
                snap.protocol.without_feature(feature).to_action(),
                meta.to_action(),
            ],
            retries=0,
        )

    def alter_column_type(self, name: str, new_type_ddl: str) -> int:
        """ALTER TABLE ALTER COLUMN ... TYPE — Delta type widening
        (``typeWidening`` table feature): a metadata-only schema change
        to a strictly WIDER type. Existing files keep their narrow
        physical type; Spark's vectorized parquet reader up-casts at
        scan time (int32 files under a bigint schema, float under
        double, decimal under higher precision), so no data moves.
        Narrowing or unrelated conversions are refused — they would
        corrupt reads of existing files. The per-column change history
        is recorded in the field metadata (``delta.typeChanges``)."""
        from pyspark.sql.types import StructField, StructType

        snap = self._log.snapshot()
        schema = schema_of(snap)
        match = [f for f in schema.fields if f.name.lower() == name.lower()]
        if not match:
            raise ValueError(f"no such column {name}")
        f0 = match[0]
        new_dt = StructType.fromDDL(f"`x` {new_type_ddl}").fields[0].dataType
        if not _is_type_widening(f0.dataType, new_dt):
            raise ValueError(
                f"{f0.dataType.simpleString()} -> {new_dt.simpleString()} "
                "is not a widening conversion; only byte/short/int->"
                "bigger ints, float->double, and decimal precision/scale "
                "growth keep existing files readable"
            )
        self._assert_column_alterable(snap, f0.name, "alter the type of")
        meta = dict(f0.metadata or {})
        changes = list(meta.get("delta.typeChanges", []))
        changes.append(
            {
                "fromType": f0.dataType.simpleString(),
                "toType": new_dt.simpleString(),
                "tableVersion": snap.version + 1,
            }
        )
        meta["delta.typeChanges"] = changes
        new_schema = StructType(
            [
                StructField(f.name, new_dt, f.nullable, meta)
                if f.name == f0.name
                else f
                for f in schema.fields
            ]
        )
        return self._commit_schema(
            snap,
            new_schema,
            "ALTER COLUMN TYPE",
            {
                "column": name,
                "from": f0.dataType.simpleString(),
                "to": new_dt.simpleString(),
            },
            extra_actions=self._feature_upgrade(snap, "typeWidening"),
            at_version=snap.version + 1,
        )

    def rename_column(self, old: str, new: str) -> int:
        """ALTER TABLE RENAME COLUMN old TO new — metadata-only via
        column mapping (Delta columnMapping.mode=name): the field keeps
        its physical parquet name, only the logical name changes, so no
        file is rewritten and every existing file stays readable."""
        from pyspark.sql.types import StructField, StructType

        snap = self._log.snapshot()
        schema = schema_of(snap)
        match = [f for f in schema.fields if f.name.lower() == old.lower()]
        if not match:
            raise ValueError(f"no such column {old}")
        if any(f.name.lower() == new.lower() for f in schema.fields):
            raise ValueError(f"column {new} already exists")
        self._assert_column_alterable(snap, match[0].name, "rename")
        frozen, conf = self._mapped_schema(snap, schema)
        new_schema = StructType(
            [
                StructField(new, f.dataType, f.nullable, f.metadata)
                if f.name == match[0].name
                else f
                for f in frozen.fields
            ]
        )
        return self._commit_schema(
            snap, new_schema, "RENAME COLUMN", {"from": old, "to": new},
            configuration=conf,
            extra_actions=self._feature_upgrade(snap, "columnMapping"),
        )

    def drop_column(self, name: str) -> int:
        """ALTER TABLE DROP COLUMN — metadata-only: the field leaves the
        logical schema; its bytes stay in the files (invisible to every
        reader) until files are naturally rewritten. Upgrades the table
        to column mapping so a future ADD COLUMN with the same name maps
        to a fresh physical name and never resurrects the old values."""
        from pyspark.sql.types import StructType

        snap = self._log.snapshot()
        schema = schema_of(snap)
        match = [f for f in schema.fields if f.name.lower() == name.lower()]
        if not match:
            raise ValueError(f"no such column {name}")
        if len(schema.fields) == 1:
            raise ValueError("cannot drop the only column of a table")
        self._assert_column_alterable(snap, match[0].name, "drop")
        frozen, conf = self._mapped_schema(snap, schema)
        new_schema = StructType(
            [f for f in frozen.fields if f.name != match[0].name]
        )
        return self._commit_schema(
            snap, new_schema, "DROP COLUMN", {"column": name},
            configuration=conf,
            extra_actions=self._feature_upgrade(snap, "columnMapping"),
        )

    def replace_where(self, df: DataFrame, predicate: str) -> int:
        """Selective overwrite (Delta's ``replaceWhere``): atomically
        replace exactly the rows matching ``predicate`` with ``df``, in
        ONE commit — delete-matching + append as a single transaction,
        so readers never observe the gap between them.

        Every incoming row must satisfy the predicate (enforced with a
        limit(1) probe, not a full count); files straddling the
        predicate are rewritten keeping their non-matching rows
        (arbitrary-predicate replaceWhere, not just partition-aligned).
        FIND is stats/partition-pruned like DELETE, so a
        partition-aligned predicate touches only that partition's files.
        """
        from .writer import apply_generated

        snap = self._log.snapshot()
        check_append_only(snap, "replaceWhere overwrite")
        schema = schema_of(snap)
        cond = _as_column(predicate)
        bad = df.filter(~F.coalesce(cond, F.lit(False))).limit(1).collect()
        if bad:
            raise ValueError(
                f"replace_where: incoming row violates predicate {predicate!r}: "
                f"{bad[0]}"
            )
        rt = rowtracking.enabled(snap)
        touched, read_paths = self._touched_files(cond, predicate)
        adds = []
        if touched:
            kept = self._read_files(touched, row_ids=rt).filter(
                ~F.coalesce(cond, F.lit(False))
            )
            if rt:
                kept = rowtracking.materialize(kept)
            adds = stage_files(
                kept,
                self.path,
                list(snap.metadata.partitionColumns),
                schema=schema,
            )
        new_df = apply_generated(
            df.select(
                *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields
                  if f.name in df.columns]
            ),
            snap.metadata.configuration,
        )
        enforce_constraints(new_df, snap.metadata.configuration)
        new_adds = stage_files(
            new_df,
            self.path,
            list(snap.metadata.partitionColumns),
            schema=schema,
        )
        now = _utc_millis()
        actions: list[dict[str, Any]] = [
            CommitInfo(
                operation="WRITE",
                operationParameters={
                    "mode": "Overwrite",
                    "predicate": predicate,
                },
                readVersion=snap.version,
                operationMetrics={
                    "numRemovedFiles": len(touched),
                    "numAddedFiles": len(adds) + len(new_adds),
                },
            ).to_action()
        ]
        actions.extend(self._rt_assign(snap, adds + new_adds))
        actions.extend(
            RemoveFile(p, deletionTimestamp=now).to_action() for p in touched
        )
        actions.extend(a.to_action() for a in adds)
        actions.extend(a.to_action() for a in new_adds)
        return self._commit_mutation(
            actions,
            touched,
            snap,
            content_neutral=False,
            read_paths=read_paths,
            rt_adds=(adds + new_adds) if rt else None,
        )

    def partitions(self) -> DataFrame:
        """Per-partition inventory (Iceberg's ``partitions`` metadata
        table shape): partition values, file count, row count, bytes —
        O(#files) driver-side log arithmetic, no data read. Raises on an
        unpartitioned table."""
        import json as _json

        snap = self._log.snapshot()
        pcols = list(snap.metadata.partitionColumns)
        if not pcols:
            raise ValueError(f"table {self.path} is not partitioned")
        agg: dict[tuple, list[int]] = {}
        for a in snap.files.values():
            key = tuple(a.partitionValues.get(c) for c in pcols)
            n_rows = (a.numRecords or 0) - int(
                (a.deletionVector or {}).get("cardinality", 0)
            )
            cur = agg.setdefault(key, [0, 0, 0])
            cur[0] += 1
            cur[1] += n_rows
            cur[2] += a.size
        rows = [
            (_json.dumps(dict(zip(pcols, k))), v[0], v[1], v[2])
            for k, v in sorted(agg.items(), key=lambda kv: str(kv[0]))
        ]
        return self.spark.createDataFrame(
            rows,
            "partition string, num_files long, num_rows long, size_bytes long",
        )

    def row_count(self) -> int | None:
        """Metadata-only row count: sum of per-file numRecords minus
        deletion-vector cardinalities — O(#files) driver arithmetic, no
        scan (the answer a 100 TB COUNT(*) should come from). Returns
        None when any file lacks numRecords (pre-stats writer) so the
        caller falls back to a scan instead of trusting a partial sum."""
        snap = self._log.snapshot()
        total = 0
        for a in snap.files.values():
            if a.numRecords is None:
                return None
            total += a.numRecords - int((a.deletionVector or {}).get("cardinality", 0))
        return total

    def analyze(
        self, columns: list[str] | None = None, exact_ndv: bool = False
    ) -> int:
        """ANALYZE TABLE ... COMPUTE STATISTICS: one aggregation pass
        computing per-column null_count / min / max / ndv plus the table
        row count, committed as a dataChange=False statistics commit
        (table property ``dls.tableStats``) so planners and users read
        them from the log without scanning. ``exact_ndv=False`` (default)
        uses HyperLogLog approx_count_distinct — at 100 TB an exact
        distinct per column is a full shuffle per column, while HLL is
        one map-side pass; pass True when exact cardinalities matter
        more than cost. Returns the committed version."""
        import json as _json

        from .reader import read_delta

        snap = self._log.snapshot()
        schema = schema_of(snap)
        cols = columns or [f.name for f in schema.fields]
        df = read_delta(self.spark, self.path)
        ndv = (
            (lambda c: F.count_distinct(F.col(c)))
            if exact_ndv
            else (lambda c: F.approx_count_distinct(F.col(c)))
        )
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for c in cols:
            aggs.extend(
                [
                    F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nc_{c}"),
                    F.min(c).alias(f"__min_{c}"),
                    F.max(c).alias(f"__max_{c}"),
                    ndv(c).alias(f"__ndv_{c}"),
                ]
            )
        row = df.agg(*aggs).collect()[0]  # one row of stats — not data
        stats = {
            "rowCount": row["__rows"],
            "columns": {
                c: {
                    "nullCount": int(row[f"__nc_{c}"] or 0),
                    "min": str(row[f"__min_{c}"]) if row[f"__min_{c}"] is not None else None,
                    "max": str(row[f"__max_{c}"]) if row[f"__max_{c}"] is not None else None,
                    "ndv": int(row[f"__ndv_{c}"] or 0),
                }
                for c in cols
            },
        }
        return self.set_properties(
            {"dls.tableStats": _json.dumps(stats, separators=(",", ":"))}
        )

    def statistics(self) -> DataFrame:
        """Statistics recorded by the last ANALYZE as a relation:
        (column, null_count, min, max, ndv, row_count). Raises if the
        table was never analyzed."""
        import json as _json

        raw = self._log.snapshot().metadata.configuration.get("dls.tableStats")
        if not raw:
            raise ValueError(
                f"table {self.path} has no statistics; run analyze() first"
            )
        st = _json.loads(raw)
        rows = [
            (c, v["nullCount"], v["min"], v["max"], v["ndv"], st["rowCount"])
            for c, v in sorted(st["columns"].items())
        ]
        return self.spark.createDataFrame(
            rows,
            "column string, null_count long, min string, max string, "
            "ndv long, row_count long",
        )

    def set_properties(self, props: dict[str, str]) -> int:
        """ALTER TABLE SET TBLPROPERTIES: merge keys into table
        configuration (e.g. ``{"deletionVectors": "true"}`` flips
        DELETE to deletion-vector mode for all writers).

        Enabling ``delta.enableRowTracking`` on an existing table
        upgrades the protocol (rowTracking + domainMetadata writer
        features) and BACKFILLS: every live file is re-added
        (dataChange=False — a metadata-only commit, no bytes move) with
        a fresh disjoint ``baseRowId`` range, so ``_row_id`` is defined
        for pre-existing rows too."""
        from . import rowtracking

        snap = self._log.snapshot()
        conf = {**snap.metadata.configuration, **{k: str(v) for k, v in props.items()}}
        meta = self._metadata_with_configuration(snap, conf)
        actions: list[dict[str, Any]] = [
            CommitInfo(
                operation="SET TBLPROPERTIES",
                operationParameters={"properties": dict(props)},
                readVersion=snap.version,
            ).to_action(),
            meta.to_action(),
        ]
        from .log import _ict_enabled

        if _ict_enabled(conf) and not _ict_enabled(
            snap.metadata.configuration
        ):
            actions.insert(
                1,
                snap.protocol.with_features(
                    writer=["inCommitTimestamp"]
                ).to_action(),
            )
        if rowtracking.enabled(conf) and not rowtracking.enabled(snap):
            actions.insert(
                1,
                snap.protocol.with_features(
                    writer=rowtracking.ROW_TRACKING_FEATURES
                ).to_action(),
            )
            backfill = [
                replace(a, dataChange=False)
                for a in snap.files.values()
                if a.baseRowId is None
            ]
            rt_actions, _ = rowtracking.assign_fresh_ids(
                backfill, rowtracking.high_water_mark(snap), snap.version + 1
            )
            actions.extend(rt_actions)
            actions.extend(a.to_action() for a in backfill)
        return self._log.commit_next(actions, retries=0)

    def unset_properties(self, keys: list[str]) -> int:
        """ALTER TABLE UNSET TBLPROPERTIES."""
        snap = self._log.snapshot()
        conf = {
            k: v for k, v in snap.metadata.configuration.items() if k not in set(keys)
        }
        meta = self._metadata_with_configuration(snap, conf)
        return self._log.commit_next(
            [
                CommitInfo(
                    operation="UNSET TBLPROPERTIES",
                    operationParameters={"properties": list(keys)},
                    readVersion=snap.version,
                ).to_action(),
                meta.to_action(),
            ],
            retries=0,
        )

    def _metadata_with_configuration(self, snap, configuration):
        from .log import Metadata

        return Metadata(
            schemaString=snap.metadata.schemaString,
            partitionColumns=list(snap.metadata.partitionColumns),
            configuration=configuration,
            id=snap.metadata.id,
            name=snap.metadata.name,
            createdTime=snap.metadata.createdTime,
        )

    def restore(self, version: int) -> int:
        """RESTORE to an earlier version: commit the file-set diff so the
        table content equals that snapshot (history is preserved)."""
        old = self._log.snapshot(version)
        cur = self._log.snapshot()
        check_append_only(cur, "RESTORE")
        now = _utc_millis()
        # a path present in both but with a different deletion vector must
        # be re-added with the old DV state (re-add replaces on replay)
        adds = [
            a
            for p, a in old.files.items()
            if p not in cur.files or cur.files[p].deletionVector != a.deletionVector
        ]
        removes = [p for p in cur.files if p not in old.files]
        actions: list[dict[str, Any]] = [
            CommitInfo(
                operation="RESTORE",
                operationParameters={"version": version},
                readVersion=cur.version,
            ).to_action()
        ]
        actions.extend(RemoveFile(p, deletionTimestamp=now).to_action() for p in removes)
        actions.extend(a.to_action() for a in adds)
        return self._log.commit_next(actions, retries=0)
