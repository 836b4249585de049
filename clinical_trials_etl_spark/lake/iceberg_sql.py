"""Iceberg DDL/DML generation — the "same apply path on a real catalog"
seam, made concrete.

``lake/table.py`` is the self-contained stand-in (no Iceberg runtime
jar ships in this container). On a cluster with an Iceberg catalog the
SAME inputs that drive the stand-in — the registry diff ops from
``cdc/apply.evolve_for_batch`` and the (fields, key) the MERGE uses —
are rendered here into executable Spark SQL:

- :func:`create_table_statement`  — bucketed table spec
  (``bucket(N, url)``, the layout lake/table.py emulates with
  ``pmod(xxhash64(url), N)``).
- :func:`alter_statements`        — ADD COLUMNS / RENAME COLUMN /
  ALTER COLUMN TYPE from the exact op dicts ``cdc/registry.diff``
  produces (rename-by-field-id, Iceberg's native model).
- :func:`merge_statement`         — the LSN-guarded MERGE INTO with
  tombstone semantics matching ``LakeTable.merge``: max-LSN wins,
  deletes keep their lsn so a late lower-lsn update cannot resurrect
  the row.

``cdc.apply.apply_batch`` calls these generators when the
``SPARK_GRAFT_ICEBERG_TABLE`` env var names a catalog table, returning
the statements in its stats (and executing them via ``spark.sql`` when
``SPARK_GRAFT_ICEBERG_EXECUTE=1`` — requires the Iceberg runtime on the
cluster). Generated SQL is golden-tested in
tests/test_iceberg_sql.py against the full v1 -> v4 registry evolution.
"""

from __future__ import annotations

_ICEBERG_TYPES = {
    "int": "int",
    "long": "bigint",
    "double": "double",
    "string": "string",
    "timestamp": "timestamp",
    "binary": "binary",
    "boolean": "boolean",
}


def _t(typ: str) -> str:
    return _ICEBERG_TYPES[typ]


def create_table_statement(
    table_name: str, fields: list[dict], key: str, n_buckets: int = 16
) -> str:
    cols = ",\n  ".join(f"{f['name']} {_t(f['type'])}" for f in fields)
    return (
        f"CREATE TABLE {table_name} (\n"
        f"  {cols},\n"
        f"  _lsn bigint,\n"
        f"  _deleted boolean\n"
        f") USING iceberg\n"
        f"PARTITIONED BY (bucket({n_buckets}, {key}))"
    )


def alter_statements(table_name: str, ops: list[dict]) -> list[str]:
    """Registry diff ops (cdc/registry.diff output) -> Iceberg DDL.
    Op shapes: {op: add, field: {...}} | {op: rename, from, to} |
    {op: widen, id, from, to} (widen carries types; the column name is
    resolved by the caller via the evolved field list when needed —
    here rename ops precede widen ops exactly as diff emits them, so
    the widen target name is the post-rename name)."""
    out: list[str] = []
    renamed: dict[int, str] = {}
    for op in ops:
        if op["op"] == "add":
            f = op["field"]
            out.append(
                f"ALTER TABLE {table_name} ADD COLUMNS "
                f"({f['name']} {_t(f['type'])})"
            )
        elif op["op"] == "rename":
            renamed[op["id"]] = op["to"]
            out.append(
                f"ALTER TABLE {table_name} RENAME COLUMN "
                f"{op['from']} TO {op['to']}"
            )
        elif op["op"] == "widen":
            # widen applies to the field's CURRENT name (post-rename)
            name = renamed.get(op["id"])
            if name is None:
                name = op.get("name")
            if name is None:
                raise ValueError(f"widen op missing field name: {op}")
            out.append(
                f"ALTER TABLE {table_name} ALTER COLUMN {name} "
                f"TYPE {_t(op['to'])}"
            )
        else:
            raise ValueError(f"unknown op {op}")
    return out


def merge_statement(
    table_name: str, source_view: str, fields: list[dict], key: str
) -> str:
    """The LSN-guarded MERGE with tombstone semantics (LakeTable.merge
    parity): the source is the post-dedup batch (one row per key) with
    columns = table data columns + lsn + op.

    Tie rule: LakeTable.merge's winner is ``max_by(payload,
    struct(lsn, deleted))``, so at EQUAL lsn a tombstone outranks a
    live row (a delete redelivered with the same lsn as the live write
    still deletes). The delete branch therefore fires on
    ``lsn = _lsn AND NOT _deleted`` too, not only on a strictly newer
    lsn — with a strict guard the rendered MERGE would diverge from
    the stand-in on lsn ties."""
    names = [f["name"] for f in fields]
    set_cols = ",\n    ".join(f"t.{n} = s.{n}" for n in names)
    ins_cols = ", ".join(names + ["_lsn", "_deleted"])
    ins_vals = ", ".join([f"s.{n}" for n in names] + ["s.lsn", "s.op = 'D'"])
    return (
        f"MERGE INTO {table_name} t\n"
        f"USING {source_view} s\n"
        f"ON t.{key} = s.{key}\n"
        f"WHEN MATCHED AND (s.lsn > t._lsn OR (s.lsn = t._lsn "
        f"AND NOT t._deleted)) AND s.op = 'D' THEN UPDATE SET\n"
        f"    t._deleted = true,\n"
        f"    t._lsn = s.lsn\n"
        f"WHEN MATCHED AND s.lsn > t._lsn THEN UPDATE SET\n"
        f"    {set_cols},\n"
        f"    t._lsn = s.lsn,\n"
        f"    t._deleted = false\n"
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols})\n"
        f"VALUES ({ins_vals})"
    )


def replace_partition_statement(
    table_name: str, key: str, old_n: int, new_n: int
) -> str:
    """Partition evolution DDL matching :meth:`LakeTable.rebucket`:
    swap the bucket transform's width on the key. Iceberg applies this
    lazily (new data only) — the stand-in rewrites eagerly so pruning
    math holds for the whole table; pair this statement with a
    ``rewrite_data_files`` call on a real catalog for the same effect."""
    return (
        f"ALTER TABLE {table_name} REPLACE PARTITION FIELD "
        f"bucket({old_n}, {key}) WITH bucket({new_n}, {key})"
    )


def time_travel_select(
    table_name: str,
    version: int | None = None,
    as_of_ts: str | None = None,
    columns: list[str] | None = None,
) -> str:
    """Time-travel SELECT matching :meth:`LakeTable.read`'s
    ``version=`` / ``as_of=`` options on a real catalog: Spark's
    native time-travel clause (``VERSION AS OF`` / ``TIMESTAMP AS
    OF``, executed by Iceberg against its snapshot log). Exactly one
    of ``version`` / ``as_of_ts`` must be given; ``as_of_ts`` is an
    ANSI timestamp string (the caller formats — the stand-in's float
    epoch is a local-format concern, not SQL surface)."""
    if (version is None) == (as_of_ts is None):
        raise ValueError("pass exactly one of version / as_of_ts")
    cols = ", ".join(columns) if columns else "*"
    if version is not None:
        clause = f"VERSION AS OF {int(version)}"
    else:
        clause = f"TIMESTAMP AS OF TIMESTAMP '{as_of_ts}'"
    return f"SELECT {cols} FROM {table_name} {clause}"


def create_branch_statement(table_name: str, branch: str,
                            version: int | None = None) -> str:
    """Branch-create DDL matching :meth:`LakeTable.create_branch` on a
    real catalog (Iceberg branching DDL, Spark 3.4+ / Iceberg 1.2+).
    ``version`` pins the fork point (the stand-in's ``version=`` arg);
    omitted = current head, same default both sides."""
    at = f" AS OF VERSION {int(version)}" if version is not None else ""
    return f"ALTER TABLE {table_name} CREATE BRANCH {branch}{at}"


def drop_branch_statement(table_name: str, branch: str) -> str:
    return f"ALTER TABLE {table_name} DROP BRANCH {branch}"


def branch_select(table_name: str, branch: str,
                  columns: list[str] | None = None) -> str:
    """Read a branch head on a real catalog — Spark's ``VERSION AS
    OF`` clause accepts a branch name (Iceberg ref resolution), the
    twin of ``table.branch(name).read()``."""
    cols = ", ".join(columns) if columns else "*"
    return f"SELECT {cols} FROM {table_name} VERSION AS OF '{branch}'"


def fast_forward_call(catalog: str, table_name: str, branch: str,
                      to_branch: str = "main") -> str:
    """The publish step matching :meth:`LakeTable.fast_forward` on a
    real catalog: Iceberg's ``fast_forward`` procedure moves
    ``to_branch`` (main) to the audit branch's head. Same ancestry
    contract — the procedure fails unless the target is an ancestor of
    the branch head, exactly the stand-in's CommitConflict guard."""
    return (
        f"CALL {catalog}.system.fast_forward("
        f"table => '{table_name}', "
        f"branch => '{to_branch}', "
        f"to => '{branch}')"
    )


def write_to_branch_statements(table_name: str, branch: str) -> list[str]:
    """The write-audit-publish session setup on a real catalog: route
    the ingest stream's writes to the audit branch via the WAP session
    conf (Iceberg ``spark.wap.branch``) — the deployment twin of
    pointing ``run_stream``/``replay`` at ``table.branch(name)``."""
    return [
        f"ALTER TABLE {table_name} SET TBLPROPERTIES "
        f"('write.wap.enabled'='true')",
        f"SET spark.wap.branch = {branch}",
    ]


def delete_where_statement(table_name: str, fields: list[dict],
                           key: str, predicate: str) -> str:
    """Row-level predicate delete on a real catalog, matching
    :meth:`LakeTable.delete_where`'s semantics EXACTLY: the row
    becomes a payload-free tombstone that KEEPS its lsn, so the
    engine's late-arrival guard still holds (a redelivered lower-lsn
    event cannot resurrect it, a genuinely newer event can). A plain
    ``DELETE FROM t WHERE p`` would drop the lsn memory — on an
    Iceberg deployment that form is the *final erasure* step (the
    twin of tombstone + compact + expire), not the live-table
    correction."""
    nulls = "".join(f",\n    {f['name']} = NULL" for f in fields
                    if f["name"] != key)
    return (
        f"UPDATE {table_name} SET\n"
        f"    _deleted = true"
        f"{nulls}\n"
        f"WHERE NOT _deleted AND ({predicate})"
    )


def update_where_statement(table_name: str, assignments: dict,
                           fence_lsn: int, predicate: str) -> str:
    """Row-level predicate update on a real catalog, matching
    :meth:`LakeTable.update_where`: assignments apply over the old
    row and the corrected rows are stamped at the fence LSN, so the
    max-(lsn, deleted) ordering vs future upstream events is
    identical to the stand-in's (correction wins until a strictly
    newer source event)."""
    if not assignments:
        raise ValueError("update_where_statement needs at least one "
                         "assignment (the engine twin validates the "
                         "same)")
    sets = ",\n    ".join(f"{c} = {expr}"
                          for c, expr in assignments.items())
    return (
        f"UPDATE {table_name} SET\n"
        f"    {sets},\n"
        f"    _lsn = {int(fence_lsn)}\n"
        f"WHERE NOT _deleted AND ({predicate})"
    )
