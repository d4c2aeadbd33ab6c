"""Thin SQL front-end for the table-format statements stock Spark can't
parse without delta-spark: MERGE INTO, DELETE FROM, VACUUM, DESCRIBE
HISTORY/DETAIL, VERSION AS OF, CREATE/DROP TABLE USING DELTA, INSERT
INTO. Everything else passes straight to ``spark.sql`` over the
catalog's refreshed views (SURVEY.md §3.2/§7.2 chose this dispatch
route over a Catalyst extension — the reference's own library code uses
the Python builder API underneath, operations.py:149-166).

Covers the reference's SQL shapes:
  - MERGE INTO t USING s ON <cond> WHEN MATCHED [AND c] THEN
    UPDATE SET a = b / DELETE; WHEN NOT MATCHED THEN INSERT * /(...)
    VALUES (...)                 (05_compliance.py:100-138, M4)
  - SELECT ... FROM t VERSION AS OF n   (05_compliance.py:161-167, S6)
  - INSERT INTO t SELECT ... [VERSION AS OF n]  (:203-209, M6)
  - VACUUM t RETAIN n HOURS             (:295-304, M8)
  - DESCRIBE HISTORY / DETAIL t         (:142-148, D8/D9)
  - CREATE TABLE t USING DELTA LOCATION '...' / DROP TABLE (D2/D5)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from .catalog import Catalog
from .table import DeltaTable
from .writer import write_delta

_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>[\w.]+)(?:\s+(?:AS\s+)?(?P<talias>\w+))?"
    r"\s+USING\s+(?:(?P<source>[\w.]+)|\((?P<subquery>.+?)\))"
    r"(?:\s+(?:AS\s+)?(?P<salias>\w+))?"
    r"\s+ON\s+(?P<cond>.+?)"
    r"(?P<clauses>\s+WHEN\s+.+)$",
    re.IGNORECASE | re.DOTALL,
)

_CLAUSE_RE = re.compile(
    r"WHEN\s+(?P<notm>NOT\s+)?MATCHED(?P<bysrc>\s+BY\s+SOURCE)?"
    r"(?:\s+AND\s+(?P<cond>.+?))?\s+THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+.+?|DELETE|INSERT\s*\*|INSERT\s*\(.+?\)\s*VALUES\s*\(.+?\))"
    r"(?=\s+WHEN\s+|\s*$)",
    re.IGNORECASE | re.DOTALL,
)

_VERSION_AS_OF_RE = re.compile(
    r"(?P<table>[\w.]+)\s+VERSION\s+AS\s+OF\s+(?P<version>\d+)", re.IGNORECASE
)

_TIMESTAMP_AS_OF_RE = re.compile(
    r"(?P<table>[\w.]+)\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)'", re.IGNORECASE
)


def _parse_assignments(text: str) -> dict[str, str]:
    """Split 'a = expr, b = expr' respecting parens/quotes."""
    out: dict[str, str] = {}
    depth = 0
    in_str: str | None = None
    current = []
    parts = []
    for ch in text:
        if in_str:
            if ch == in_str:
                in_str = None
        elif ch in "'\"":
            in_str = ch
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(current))
            current = []
            continue
        current.append(ch)
    if current:
        parts.append("".join(current))
    for part in parts:
        k, _, v = part.partition("=")
        out[k.strip().split(".")[-1]] = v.strip()
    return out


def _exec_merge(catalog: Catalog, m: re.Match) -> DataFrame:
    spark = catalog.spark
    target_name = m.group("target")
    t_alias = m.group("talias") or target_name
    source_name = m.group("source")
    s_alias = m.group("salias") or source_name or "source"
    cond = m.group("cond").strip()

    dt = DeltaTable.forPath(spark, catalog.path_of(target_name)).alias(t_alias)
    if source_name:
        source_df = spark.table(source_name)  # view or refreshed catalog table
    else:
        source_df = spark.sql(m.group("subquery"))  # USING (SELECT ...)
    builder = dt.merge(source_df, cond, source_alias=s_alias)

    for cm in _CLAUSE_RE.finditer(m.group("clauses")):
        action = cm.group("action").strip()
        clause_cond = cm.group("cond")
        if cm.group("notm") and cm.group("bysrc"):
            # WHEN NOT MATCHED BY SOURCE THEN UPDATE SET ... / DELETE
            if re.match(r"DELETE", action, re.IGNORECASE):
                builder.when_not_matched_by_source_delete(
                    condition=clause_cond
                )
            else:
                set_text = re.sub(
                    r"^UPDATE\s+SET\s+", "", action, flags=re.IGNORECASE
                )
                builder.when_not_matched_by_source_update(
                    set=_parse_assignments(set_text), condition=clause_cond
                )
        elif cm.group("notm"):
            if re.match(r"INSERT\s*\*", action, re.IGNORECASE):
                builder.when_not_matched_insert_all(condition=clause_cond)
            else:
                im = re.match(
                    r"INSERT\s*\((?P<cols>.+?)\)\s*VALUES\s*\((?P<vals>.+)\)",
                    action,
                    re.IGNORECASE | re.DOTALL,
                )
                cols = [c.strip() for c in im.group("cols").split(",")]
                vals = re.split(r",(?![^()]*\))", im.group("vals"))
                builder.when_not_matched_insert(
                    values=dict(zip(cols, [v.strip() for v in vals])),
                    condition=clause_cond,
                )
        elif re.match(r"DELETE", action, re.IGNORECASE):
            builder.when_matched_delete(condition=clause_cond)
        else:
            set_text = re.sub(r"^UPDATE\s+SET\s+", "", action, flags=re.IGNORECASE)
            builder.when_matched_update(
                set=_parse_assignments(set_text), condition=clause_cond
            )
    builder.execute()
    catalog.refresh(target_name)
    return spark.createDataFrame([(True,)], "merged boolean")


def _sql_type(t) -> str:
    """Delta schema-JSON type -> SQL DDL type name (via Spark's own
    type parser, so nested struct/array/map render correctly)."""
    from pyspark.sql.types import StructType

    st = StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {"name": "c", "type": t, "nullable": True, "metadata": {}}
            ],
        }
    )
    return st["c"].dataType.simpleString().upper()


def sql(catalog: Catalog, statement: str) -> DataFrame:
    """Execute one statement; returns a DataFrame result (possibly a
    one-row status frame for DDL/DML)."""
    spark = catalog.spark
    s = statement.strip().rstrip(";")

    m = re.match(
        r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s+USING\s+DELTA"
        r"\s+LOCATION\s+'(?P<loc>[^']+)'\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        catalog.register(m.group("name"), m.group("loc"))
        return spark.createDataFrame([(m.group("name"),)], "registered string")

    m = re.match(
        r"^\s*CREATE\s+TABLE\s+(?P<name>[\w.]+)\s+(?:(?P<kind>SHALLOW|DEEP)\s+)?CLONE"
        r"\s+(?P<src>[\w.]+)\s+LOCATION\s+'(?P<loc>[^']+)'\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        src = DeltaTable.forPath(spark, catalog.path_of(m.group("src")))
        shallow = (m.group("kind") or "SHALLOW").upper() == "SHALLOW"
        src.clone(m.group("loc"), shallow=shallow)
        catalog.register(m.group("name"), m.group("loc"))
        return spark.createDataFrame(
            [(m.group("name"), shallow)], "registered string, shallow boolean"
        )

    m = re.match(
        r"^\s*REORG\s+TABLE\s+(?P<name>[\w.]+)\s+APPLY\s*\(\s*PURGE\s*\)\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        version = DeltaTable.forPath(
            spark, catalog.path_of(m.group("name"))
        ).purge_deletion_vectors()
        catalog.refresh(m.group("name"))
        return spark.createDataFrame([(version,)], "version long")

    m = re.match(
        r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+(?P<un>UNSET|SET)\s+TBLPROPERTIES"
        r"\s*\((?P<props>[^)]*)\)\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        dt = DeltaTable.forPath(spark, catalog.path_of(m.group("name")))
        if m.group("un").upper() == "SET":
            props = dict(
                re.findall(r"'([^']+)'\s*=\s*'([^']*)'", m.group("props"))
            )
            version = dt.set_properties(props)
        else:
            keys = re.findall(r"'([^']+)'", m.group("props"))
            version = dt.unset_properties(keys)
        return spark.createDataFrame([(version,)], "version long")

    m = re.match(
        r"^\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(?P<name>[\w.]+)\s*$", s, re.IGNORECASE
    )
    if m:
        catalog.unregister(m.group("name"))
        return spark.createDataFrame([(m.group("name"),)], "dropped string")

    m = re.match(
        r"^\s*DESCRIBE\s+HISTORY\s+(?P<name>[\w.]+)\s*$", s, re.IGNORECASE
    )
    if m:
        return DeltaTable.forPath(spark, catalog.path_of(m.group("name"))).history()

    m = re.match(r"^\s*DESCRIBE\s+DETAIL\s+(?P<name>[\w.]+)\s*$", s, re.IGNORECASE)
    if m:
        return DeltaTable.forPath(spark, catalog.path_of(m.group("name"))).detail()

    m = re.match(
        r"^\s*VACUUM\s+(?P<name>[\w.]+)(?:\s+(?P<lite>LITE))?"
        r"(?:\s+RETAIN\s+(?P<hours>[\d.]+)\s+HOURS?)?"
        r"(?:\s+(?P<dry>DRY\s+RUN))?\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        hours = float(m.group("hours")) if m.group("hours") else 168.0
        deleted = DeltaTable.forPath(spark, catalog.path_of(m.group("name"))).vacuum(
            hours, dry_run=bool(m.group("dry")), lite=bool(m.group("lite"))
        )
        return spark.createDataFrame([(len(deleted),)], "files_deleted long")

    m = re.match(
        r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+ADD\s+CONSTRAINT\s+"
        r"(?P<cname>\w+)\s+CHECK\s*\((?P<expr>.+)\)\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        dt = DeltaTable.forPath(spark, catalog.path_of(m.group("name")))
        v = dt.add_constraint(m.group("cname"), m.group("expr").strip())
        return spark.createDataFrame([(v,)], "version long")

    m = re.match(
        r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+DROP\s+CONSTRAINT\s+(?P<cname>\w+)\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        dt = DeltaTable.forPath(spark, catalog.path_of(m.group("name")))
        v = dt.drop_constraint(m.group("cname"))
        return spark.createDataFrame([(v,)], "version long")

    m = re.match(
        r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+ADD\s+COLUMNS?\s*"
        r"\(?\s*(?P<cols>[^)]+?)\s*\)?\s*$",
        s,
        re.IGNORECASE,
    )
    if m and " CONSTRAINT " not in s.upper():
        dt = DeltaTable.forPath(spark, catalog.path_of(m.group("name")))
        cols: dict[str, str] = {}
        defaults: dict[str, str] = {}
        for part in m.group("cols").split(","):
            part = part.strip()
            dm = re.match(
                r"^(?P<spec>.+?)\s+DEFAULT\s+(?P<expr>.+)$", part, re.IGNORECASE
            )
            if dm:
                part = dm.group("spec").strip()
            name_type = part.split(None, 1)
            if len(name_type) != 2:
                raise ValueError(f"bad column spec {part!r}")
            cname = name_type[0].strip("`")
            cols[cname] = name_type[1]
            if dm:
                defaults[cname] = dm.group("expr").strip()
        v = dt.add_columns(cols, defaults=defaults or None)
        catalog.refresh(m.group("name"))
        return spark.createDataFrame([(v,)], "version long")

    m = re.match(
        r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+RENAME\s+COLUMN\s+"
        r"`?(?P<old>\w+)`?\s+TO\s+`?(?P<new>\w+)`?\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        dt = DeltaTable.forPath(spark, catalog.path_of(m.group("name")))
        v = dt.rename_column(m.group("old"), m.group("new"))
        catalog.refresh(m.group("name"))
        return spark.createDataFrame([(v,)], "version long")

    m = re.match(
        r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+DROP\s+FEATURE\s+"
        r"(?P<feat>\w+)\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        dt = DeltaTable.forPath(spark, catalog.path_of(m.group("name")))
        v = dt.drop_feature(m.group("feat"))
        return spark.createDataFrame([(v,)], "version long")

    m = re.match(
        r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+ALTER\s+COLUMN\s+"
        r"`?(?P<col>\w+)`?\s+TYPE\s+(?P<ddl>[\w(),\s]+?)\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        dt = DeltaTable.forPath(spark, catalog.path_of(m.group("name")))
        v = dt.alter_column_type(m.group("col"), m.group("ddl").strip())
        catalog.refresh(m.group("name"))
        return spark.createDataFrame([(v,)], "version long")

    m = re.match(
        r"^\s*ALTER\s+TABLE\s+(?P<name>[\w.]+)\s+DROP\s+COLUMN\s+`?(?P<col>\w+)`?\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        dt = DeltaTable.forPath(spark, catalog.path_of(m.group("name")))
        v = dt.drop_column(m.group("col"))
        catalog.refresh(m.group("name"))
        return spark.createDataFrame([(v,)], "version long")

    m = re.match(
        r"^\s*UPDATE\s+(?P<name>[\w.]+)\s+SET\s+(?P<sets>.+?)"
        r"(?:\s+WHERE\s+(?P<pred>.+))?\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        dt = DeltaTable.forPath(spark, catalog.path_of(m.group("name")))
        dt.update(
            m.group("pred") if m.group("pred") else "true",
            _parse_assignments(m.group("sets")),
        )
        catalog.refresh(m.group("name"))
        return spark.createDataFrame([(True,)], "updated boolean")

    m = re.match(
        r"^\s*RESTORE\s+(?:TABLE\s+)?(?P<name>[\w.]+)\s+TO\s+VERSION\s+AS\s+OF\s+(?P<v>\d+)\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        dt = DeltaTable.forPath(spark, catalog.path_of(m.group("name")))
        version = dt.restore(int(m.group("v")))
        catalog.refresh(m.group("name"))
        return spark.createDataFrame([(version,)], "version long")

    m = re.match(
        r"^\s*RESTORE\s+(?:TABLE\s+)?(?P<name>[\w.]+)\s+TO\s+TIMESTAMP\s+AS\s+OF"
        r"\s+'(?P<ts>[^']+)'\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        from .reader import _to_millis

        dt = DeltaTable.forPath(spark, catalog.path_of(m.group("name")))
        target = dt._log.version_at_timestamp(_to_millis(m.group("ts")))
        version = dt.restore(target)
        catalog.refresh(m.group("name"))
        return spark.createDataFrame([(version,)], "version long")

    m = re.match(
        r"^\s*SHOW\s+PARTITIONS\s+(?P<name>[\w.]+)\s*$", s, re.IGNORECASE
    )
    if m:
        snap = DeltaTable.forPath(
            spark, catalog.path_of(m.group("name"))
        )._log.snapshot()
        pcols = list(snap.metadata.partitionColumns)
        if not pcols:
            raise ValueError(
                f"table {m.group('name')!r} is not partitioned"
            )
        vals = sorted(
            {
                tuple(a.partitionValues.get(c) for c in pcols)
                for a in snap.files.values()
            }
        )
        rows = [
            ("/".join(f"{c}={v}" for c, v in zip(pcols, t)),) for t in vals
        ]
        return spark.createDataFrame(rows or [("",)], "partition string").filter(
            "partition <> ''"
        )

    m = re.match(
        r"^\s*TRUNCATE\s+TABLE\s+(?P<name>[\w.]+)\s*$", s, re.IGNORECASE
    )
    if m:
        dt = DeltaTable.forPath(spark, catalog.path_of(m.group("name")))
        version = dt.delete(None)  # remove-all commit; history preserved
        catalog.refresh(m.group("name"))
        return spark.createDataFrame([(version,)], "version long")

    m = re.match(
        r"^\s*DESCRIBE\s+(?:TABLE\s+)?(?P<name>[\w.]+)\s*$", s, re.IGNORECASE
    )
    if m and m.group("name").upper() not in ("HISTORY", "DETAIL"):
        from .writer import schema_of

        snap = DeltaTable.forPath(
            spark, catalog.path_of(m.group("name"))
        )._log.snapshot()
        pcols = set(snap.metadata.partitionColumns)
        rows = [
            (
                f.name,
                f.dataType.simpleString(),
                "YES" if f.nullable else "NO",
                "partition" if f.name in pcols else "",
            )
            for f in schema_of(snap).fields
        ]
        return spark.createDataFrame(
            rows, "col_name string, data_type string, nullable string, extra string"
        )

    m = re.match(
        r"^\s*ANALYZE\s+TABLE\s+(?P<name>[\w.]+)\s+COMPUTE\s+STATISTICS"
        r"(?:\s+FOR\s+COLUMNS\s+(?P<cols>[\w,\s]+))?\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        dt = DeltaTable.forPath(spark, catalog.path_of(m.group("name")))
        cols = (
            [c.strip() for c in m.group("cols").split(",")]
            if m.group("cols")
            else None
        )
        version = dt.analyze(columns=cols)
        return spark.createDataFrame([(version,)], "version long")

    m = re.match(
        r"^\s*SHOW\s+TBLPROPERTIES\s+(?P<name>[\w.]+)\s*$", s, re.IGNORECASE
    )
    if m:
        dt = DeltaTable.forPath(spark, catalog.path_of(m.group("name")))
        conf = dt._log.snapshot().metadata.configuration
        rows = sorted(conf.items()) or [("", "")]
        return spark.createDataFrame(rows, "key string, value string").filter(
            "key <> ''"
        )

    m = re.match(
        r"^\s*SHOW\s+CREATE\s+TABLE\s+(?P<name>[\w.]+)\s*$", s, re.IGNORECASE
    )
    if m:
        name = m.group("name")
        path = catalog.path_of(name)
        snap = DeltaTable.forPath(spark, path)._log.snapshot()
        import json as _json

        fields = _json.loads(snap.metadata.schemaString)["fields"]
        col_defs = ",\n  ".join(
            f"{f['name']} {_sql_type(f['type'])}" for f in fields
        )
        stmt = f"CREATE TABLE {name} (\n  {col_defs}\n)\nUSING DELTA"
        if snap.metadata.partitionColumns:
            stmt += (
                "\nPARTITIONED BY ("
                + ", ".join(snap.metadata.partitionColumns)
                + ")"
            )
        stmt += f"\nLOCATION '{path}'"
        conf = snap.metadata.configuration
        if conf:
            props = ",\n  ".join(
                f"'{k}' = '{v}'" for k, v in sorted(conf.items())
            )
            stmt += f"\nTBLPROPERTIES (\n  {props}\n)"
        return spark.createDataFrame([(stmt,)], "createtab_stmt string")

    m = re.match(
        r"^\s*OPTIMIZE\s+(?P<name>[\w.]+)"
        r"(?:\s+WHERE\s+(?P<pcol>\w+)\s*=\s*'?(?P<pval>[^'\s]+)'?)?"
        r"(?:\s+(?P<kind>CLUSTER|ZORDER)\s+BY\s+\(?(?P<cols>[\w,\s]+?)\)?)?\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        cols = (
            [c.strip() for c in m.group("cols").split(",")]
            if m.group("cols")
            else None
        )
        pf = {m.group("pcol"): m.group("pval")} if m.group("pcol") else None
        dt = DeltaTable.forPath(spark, catalog.path_of(m.group("name")))
        if cols and m.group("kind").upper() == "ZORDER":
            version = dt.optimize(zorder_by=cols, partition_filter=pf)
        else:
            version = dt.optimize(cluster_by=cols, partition_filter=pf)
        catalog.refresh(m.group("name"))
        return spark.createDataFrame([(version,)], "version long")

    m = re.match(
        r"^\s*COPY\s+INTO\s+(?P<name>[\w.]+)\s+FROM\s+'(?P<src>[^']+)'"
        r"(?:\s+FILEFORMAT\s*=\s*(?P<fmt>\w+))?\s*$",
        s,
        re.IGNORECASE,
    )
    if m:
        from .writer import copy_into

        version, n_files = copy_into(
            spark,
            catalog.path_of(m.group("name")),
            m.group("src"),
            file_format=(m.group("fmt") or "parquet").lower(),
        )
        catalog.refresh(m.group("name"))
        return spark.createDataFrame(
            [(version, n_files)], "version long, files_loaded long"
        )

    m = re.match(
        r"^\s*DELETE\s+FROM\s+(?P<name>[\w.]+)(?:\s+WHERE\s+(?P<pred>.+))?\s*$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        dt = DeltaTable.forPath(spark, catalog.path_of(m.group("name")))
        dt.delete(m.group("pred"))
        catalog.refresh(m.group("name"))
        return spark.createDataFrame([(True,)], "deleted boolean")

    m = _MERGE_RE.match(s)
    if m:
        catalog.refresh_all()
        return _exec_merge(catalog, m)

    m = re.match(
        r"^\s*INSERT\s+INTO\s+(?P<name>[\w.]+)\s+REPLACE\s+WHERE\s+"
        r"(?P<pred>.+?)\s+(?P<select>SELECT\s+.+)$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        catalog.refresh_all()
        df = spark.sql(_rewrite_time_travel(catalog, m.group("select")))
        dt = DeltaTable.forPath(spark, catalog.path_of(m.group("name")))
        version = dt.replace_where(df, m.group("pred").strip())
        catalog.refresh(m.group("name"))
        return spark.createDataFrame([(version,)], "version long")

    m = re.match(
        r"^\s*INSERT\s+INTO\s+(?P<name>[\w.]+)\s+(?P<select>SELECT\s+.+)$",
        s,
        re.IGNORECASE | re.DOTALL,
    )
    if m:
        catalog.refresh_all()
        select_text = _rewrite_time_travel(catalog, m.group("select"))
        df = spark.sql(select_text)
        write_delta(df, catalog.path_of(m.group("name")), operation="INSERT")
        catalog.refresh(m.group("name"))
        return spark.createDataFrame([(True,)], "inserted boolean")

    # plain query — refresh views, rewrite VERSION AS OF and
    # table_changes(...) calls, delegate
    catalog.refresh_all()
    return spark.sql(
        _rewrite_table_changes(catalog, _rewrite_time_travel(catalog, s))
    )


_TABLE_CHANGES_RE = re.compile(
    r"TABLE_CHANGES\s*\(\s*'(?P<name>[\w.]+)'\s*,\s*(?P<from>\d+)"
    r"\s*(?:,\s*(?P<to>\d+))?\s*\)",
    re.IGNORECASE,
)


def _rewrite_table_changes(catalog: Catalog, statement: str) -> str:
    """Delta's ``SELECT ... FROM table_changes('t', from[, to])`` SQL
    form: each call is materialized as the CDF relation under a temp
    view and the call text is replaced by the view name."""
    import uuid as _uuid

    from .cdf import table_changes

    def repl(m: re.Match) -> str:
        df = table_changes(
            catalog.spark,
            catalog.path_of(m.group("name")),
            int(m.group("from")),
            int(m.group("to")) if m.group("to") else None,
        )
        view = f"__dls_cdf_{_uuid.uuid4().hex[:12]}"
        df.createOrReplaceTempView(view)
        return view

    return _TABLE_CHANGES_RE.sub(repl, statement)


def _rewrite_time_travel(catalog: Catalog, statement: str) -> str:
    """Rewrite ``t VERSION AS OF n`` / ``t TIMESTAMP AS OF 'ts'`` to a
    temp view pinned at that snapshot (resolution pins the snapshot's
    file list BEFORE optimization, so pruning applies to that version's
    files — SURVEY.md §3.2)."""

    def repl(m: re.Match) -> str:
        name, version = m.group("table"), int(m.group("version"))
        if name not in catalog.names():
            return m.group(0)
        view = f"__{name}_v{version}"
        catalog.refresh(name, version=version).createOrReplaceTempView(view)
        return view

    def repl_ts(m: re.Match) -> str:
        name = m.group("table")
        if name not in catalog.names():
            return m.group(0)
        from .log import DeltaLog
        from .reader import _to_millis

        version = DeltaLog(catalog.path_of(name)).version_at_timestamp(
            _to_millis(m.group("ts"))
        )
        view = f"__{name}_v{version}"
        catalog.refresh(name, version=version).createOrReplaceTempView(view)
        return view

    statement = _TIMESTAMP_AS_OF_RE.sub(repl_ts, statement)
    return _VERSION_AS_OF_RE.sub(repl, statement)
