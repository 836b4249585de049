"""Golden tests for the Iceberg SQL seam: the exact DDL/MERGE text the
apply path emits for a real catalog, driven by the same registry diff
ops and field lists the parquet stand-in uses."""

from __future__ import annotations

import os

import pytest

from clinical_trials_etl_spark.cdc.apply import apply_batch
from clinical_trials_etl_spark.cdc.registry import PAGES_REGISTRY, diff
from clinical_trials_etl_spark.cdc.replay import create_pages_table
from clinical_trials_etl_spark.lake import iceberg_sql as I


def test_create_table_golden():
    got = I.create_table_statement("lake.pages", PAGES_REGISTRY[1], "url", 32)
    assert got == (
        "CREATE TABLE lake.pages (\n"
        "  url string,\n"
        "  warc_ts timestamp,\n"
        "  html binary,\n"
        "  text string,\n"
        "  lang string,\n"
        "  _lsn bigint,\n"
        "  _deleted boolean\n"
        ") USING iceberg\n"
        "PARTITIONED BY (bucket(32, url))"
    )


def test_alter_statements_full_evolution_chain():
    # v1 -> v2: add; v2 -> v3: rename; v3 -> v4: widen
    assert I.alter_statements("t", diff(PAGES_REGISTRY[1], PAGES_REGISTRY[2])) == [
        "ALTER TABLE t ADD COLUMNS (fetch_status int)"
    ]
    assert I.alter_statements("t", diff(PAGES_REGISTRY[2], PAGES_REGISTRY[3])) == [
        "ALTER TABLE t RENAME COLUMN lang TO language"
    ]
    assert I.alter_statements("t", diff(PAGES_REGISTRY[3], PAGES_REGISTRY[4])) == [
        "ALTER TABLE t ALTER COLUMN fetch_status TYPE bigint"
    ]
    # v1 -> v4 in one jump: add lands with the final type, rename applies
    assert I.alter_statements("t", diff(PAGES_REGISTRY[1], PAGES_REGISTRY[4])) == [
        "ALTER TABLE t RENAME COLUMN lang TO language",
        "ALTER TABLE t ADD COLUMNS (fetch_status bigint)",
    ]


def test_merge_statement_golden():
    got = I.merge_statement("lake.pages", "batch_v", PAGES_REGISTRY[1], "url")
    assert got == (
        "MERGE INTO lake.pages t\n"
        "USING batch_v s\n"
        "ON t.url = s.url\n"
        "WHEN MATCHED AND (s.lsn > t._lsn OR (s.lsn = t._lsn "
        "AND NOT t._deleted)) AND s.op = 'D' THEN UPDATE SET\n"
        "    t._deleted = true,\n"
        "    t._lsn = s.lsn\n"
        "WHEN MATCHED AND s.lsn > t._lsn THEN UPDATE SET\n"
        "    t.url = s.url,\n"
        "    t.warc_ts = s.warc_ts,\n"
        "    t.html = s.html,\n"
        "    t.text = s.text,\n"
        "    t.lang = s.lang,\n"
        "    t._lsn = s.lsn,\n"
        "    t._deleted = false\n"
        "WHEN NOT MATCHED THEN INSERT "
        "(url, warc_ts, html, text, lang, _lsn, _deleted)\n"
        "VALUES (s.url, s.warc_ts, s.html, s.text, s.lang, s.lsn, s.op = 'D')"
    )


def test_apply_batch_emits_sql_behind_flag(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ICEBERG_TABLE", "lake.pages")
    table = create_pages_table(spark, str(tmp_path / "t"), n_buckets=4)
    cols = (
        "lsn long, op string, url string, warc_ts timestamp, html binary,"
        " lang string, language string, fetch_status long, schema_ver int"
    )
    batch = spark.createDataFrame(
        [(1, "I", "https://a/1", None, b"<p>x</p>", "en", None, None, 1)], cols
    )
    stats = apply_batch(table, batch, "ice-1")
    assert "iceberg_sql" in stats
    assert stats["iceberg_sql"][-1].startswith("MERGE INTO lake.pages t")
    # no DDL for a v1 batch on a v1 table
    assert len(stats["iceberg_sql"]) == 1


def test_apply_batch_no_sql_without_flag(spark, tmp_path):
    assert "SPARK_GRAFT_ICEBERG_TABLE" not in os.environ
    table = create_pages_table(spark, str(tmp_path / "t2"), n_buckets=4)
    cols = (
        "lsn long, op string, url string, warc_ts timestamp, html binary,"
        " lang string, language string, fetch_status long, schema_ver int"
    )
    batch = spark.createDataFrame(
        [(1, "I", "https://a/1", None, b"<p>x</p>", "en", None, None, 1)], cols
    )
    stats = apply_batch(table, batch, "noice-1")
    assert "iceberg_sql" not in stats


def test_replace_partition_golden():
    from clinical_trials_etl_spark.lake.iceberg_sql import (
        replace_partition_statement,
    )

    assert replace_partition_statement("lake.pages", "url", 16, 64) == (
        "ALTER TABLE lake.pages REPLACE PARTITION FIELD "
        "bucket(16, url) WITH bucket(64, url)"
    )


def test_every_rendered_statement_parses_with_sparks_own_parser(spark):
    """Syntax-drift gate (VERDICT.md round-3 item 3): no catalog is
    available in-sandbox, but Spark's own SQL parser IS — every
    rendered DDL/DML statement must produce a logical plan through
    ``sessionState.sqlParser.parsePlan``. Golden tests pin the exact
    text; this pins that the text is *valid Spark SQL*, so a rendering
    bug (missing comma, misplaced clause) can't hide behind a matching
    golden."""
    parser = spark._jsparkSession.sessionState().sqlParser()
    stmts = [
        I.create_table_statement("lake.pages", PAGES_REGISTRY[1], "url", 32),
        *I.alter_statements("t", diff(PAGES_REGISTRY[1], PAGES_REGISTRY[2])),
        *I.alter_statements("t", diff(PAGES_REGISTRY[2], PAGES_REGISTRY[3])),
        *I.alter_statements("t", diff(PAGES_REGISTRY[3], PAGES_REGISTRY[4])),
        *I.alter_statements("t", diff(PAGES_REGISTRY[1], PAGES_REGISTRY[4])),
        I.merge_statement("lake.pages", "batch_v", PAGES_REGISTRY[1], "url"),
        I.merge_statement("lake.pages", "batch_v", PAGES_REGISTRY[4], "url"),
        I.time_travel_select("lake.pages", version=7),
        I.time_travel_select("lake.pages",
                             as_of_ts="2026-08-19 00:00:00",
                             columns=["url", "lang"]),
    ]
    for s in stmts:
        parser.parsePlan(s)  # raises ParseException on invalid SQL


def test_time_travel_select_golden():
    assert I.time_travel_select("lake.pages", version=3) == (
        "SELECT * FROM lake.pages VERSION AS OF 3"
    )
    assert I.time_travel_select(
        "lake.pages", as_of_ts="2026-08-19 00:00:00", columns=["url"]
    ) == (
        "SELECT url FROM lake.pages "
        "TIMESTAMP AS OF TIMESTAMP '2026-08-19 00:00:00'"
    )
    with pytest.raises(ValueError, match="exactly one"):
        I.time_travel_select("t")
    with pytest.raises(ValueError, match="exactly one"):
        I.time_travel_select("t", version=1, as_of_ts="2026-01-01")


def test_replace_partition_is_iceberg_extension_syntax(spark):
    """REPLACE PARTITION FIELD is *Iceberg-extension* grammar — parsed
    by IcebergSparkSessionExtensions on a real catalog, NOT by Spark's
    base parser. Pin that fact: if a Spark upgrade ever starts
    accepting it natively (or the statement is reworded into base
    grammar) this test flags the seam for re-review."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from clinical_trials_etl_spark.lake.iceberg_sql import (
        replace_partition_statement,
    )

    parser = spark._jsparkSession.sessionState().sqlParser()
    stmt = replace_partition_statement("lake.pages", "url", 16, 64)
    with pytest.raises(Exception) as exc:
        parser.parsePlan(stmt)
    assert "PARSE_SYNTAX_ERROR" in str(exc.value)


def test_branch_statements_golden_and_parse_split(spark):
    """Branch DDL twins of the stand-in's branch surface
    (``create_branch``/``fast_forward``/``branch()``-reads,
    tests/test_branches.py). Golden text plus the same parser split as
    REPLACE PARTITION FIELD: branch reads, the fast_forward procedure
    CALL, and the WAP session conf parse with Spark's base parser;
    CREATE/DROP BRANCH are Iceberg-extension grammar and must NOT
    (pins the seam for re-review if a Spark upgrade absorbs them)."""
    assert I.create_branch_statement("lake.pages", "audit") == (
        "ALTER TABLE lake.pages CREATE BRANCH audit"
    )
    assert I.create_branch_statement("lake.pages", "audit", 3) == (
        "ALTER TABLE lake.pages CREATE BRANCH audit AS OF VERSION 3"
    )
    assert I.drop_branch_statement("lake.pages", "audit") == (
        "ALTER TABLE lake.pages DROP BRANCH audit"
    )
    assert I.branch_select("lake.pages", "audit", ["url"]) == (
        "SELECT url FROM lake.pages VERSION AS OF 'audit'"
    )
    assert I.fast_forward_call("cat", "db.pages", "audit") == (
        "CALL cat.system.fast_forward(table => 'db.pages', "
        "branch => 'main', to => 'audit')"
    )

    parser = spark._jsparkSession.sessionState().sqlParser()
    for s in [
        I.branch_select("lake.pages", "audit"),
        I.fast_forward_call("cat", "db.pages", "audit"),
        *I.write_to_branch_statements("lake.pages", "audit"),
    ]:
        parser.parsePlan(s)
    for s in [
        I.create_branch_statement("lake.pages", "audit"),
        I.drop_branch_statement("lake.pages", "audit"),
    ]:
        with pytest.raises(Exception) as exc:
            parser.parsePlan(s)
        assert "PARSE_SYNTAX_ERROR" in str(exc.value)


def test_row_op_statements_golden_and_parse(spark):
    """delete_where/update_where rendered twins: the tombstoning
    UPDATE form (NOT a plain DELETE FROM — the stand-in's late-arrival
    guard keeps the lsn, see delete_where_statement docstring), both
    valid Spark SQL."""
    del_stmt = I.delete_where_statement(
        "lake.pages", PAGES_REGISTRY[1], "url", "lang = 'xx'")
    assert del_stmt == (
        "UPDATE lake.pages SET\n"
        "    _deleted = true,\n"
        "    warc_ts = NULL,\n"
        "    html = NULL,\n"
        "    text = NULL,\n"
        "    lang = NULL\n"
        "WHERE NOT _deleted AND (lang = 'xx')"
    )
    upd_stmt = I.update_where_statement(
        "lake.pages", {"lang": "'en'"}, 4711, "lang = 'eng'")
    assert upd_stmt == (
        "UPDATE lake.pages SET\n"
        "    lang = 'en',\n"
        "    _lsn = 4711\n"
        "WHERE NOT _deleted AND (lang = 'eng')"
    )
    parser = spark._jsparkSession.sessionState().sqlParser()
    for s in (del_stmt, upd_stmt):
        parser.parsePlan(s)
