"""Avro-schema front end for the registry (north rule: "Avro-schema-
registry-driven column evolution"): real Avro record-schema JSON with
Iceberg-convention ``field-id`` props resolves to the same field-list
model ``cdc/registry.py`` diffs, and drives the identical evolution
end-to-end through ``apply_batch``."""

from __future__ import annotations

import json

import pytest

from clinical_trials_etl_spark.cdc import avro_registry as avro
from clinical_trials_etl_spark.cdc import registry as reg
from clinical_trials_etl_spark.cdc.apply import apply_batch
from clinical_trials_etl_spark.cdc.replay import create_pages_table

COLS = (
    "lsn long, op string, url string, warc_ts timestamp, html binary, "
    "lang string, language string, fetch_status long, schema_ver int"
)


def test_roundtrip_pages_registry():
    """to_avro -> parse is the identity on every registry version, and
    a {ver: json-string} map resolves to exactly PAGES_REGISTRY."""
    for ver, fields in reg.PAGES_REGISTRY.items():
        assert avro.parse_avro_schema(avro.to_avro_schema(fields)) == fields
    dump = {
        str(v): json.dumps(avro.to_avro_schema(f))
        for v, f in reg.PAGES_REGISTRY.items()
    }
    assert avro.registry_from_avro(dump) == reg.PAGES_REGISTRY


def test_type_mapping_variants():
    schema = {
        "type": "record", "name": "t", "fields": [
            {"name": "a", "type": ["null", "string"], "field-id": 1},
            {"name": "b", "type": {"type": "long",
                                   "logicalType": "timestamp-millis"},
             "field-id": 2},
            {"name": "c", "type": "float", "field-id": 3},
            {"name": "d", "type": {"type": "bytes"}, "field-id": 4},
            {"name": "e", "type": ["boolean", "null"], "field-id": 5},
        ],
    }
    assert avro.parse_avro_schema(json.dumps(schema)) == [
        {"id": 1, "name": "a", "type": "string"},
        {"id": 2, "name": "b", "type": "timestamp"},
        {"id": 3, "name": "c", "type": "double"},  # Avro float->double promotion
        {"id": 4, "name": "d", "type": "binary"},
        {"id": 5, "name": "e", "type": "boolean"},
    ]


@pytest.mark.parametrize("bad_field,msg", [
    ({"name": "x", "type": "string"}, "field-id"),
    ({"name": "x", "type": "string", "field-id": True}, "field-id"),
    ({"name": "x", "type": {"type": "record", "name": "n", "fields": []},
      "field-id": 9}, "unsupported"),
    ({"name": "x", "type": ["null", "string", "long"], "field-id": 9},
     "nullable unions"),
    ({"name": "x", "type": {"type": "array", "items": "string"},
      "field-id": 9}, "unsupported"),
])
def test_rejects_bad_fields(bad_field, msg):
    schema = {"type": "record", "name": "t", "fields": [bad_field]}
    with pytest.raises(ValueError, match=msg):
        avro.parse_avro_schema(schema)


def test_rejects_duplicate_ids_and_non_record():
    with pytest.raises(ValueError, match="duplicate field-id"):
        avro.parse_avro_schema({"type": "record", "name": "t", "fields": [
            {"name": "a", "type": "string", "field-id": 1},
            {"name": "b", "type": "string", "field-id": 1},
        ]})
    with pytest.raises(ValueError, match="record schema"):
        avro.parse_avro_schema({"type": "enum", "name": "t",
                                "symbols": ["A"]})


def test_load_validates_evolution_at_startup():
    """An incompatible registry dump (narrowing / removal between
    consecutive versions) fails at LOAD time, before any stream runs."""
    v1 = avro.to_avro_schema([{"id": 1, "name": "a", "type": "long"}])
    v2_narrow = avro.to_avro_schema([{"id": 1, "name": "a", "type": "int"}])
    with pytest.raises(ValueError, match="incompatible"):
        avro.registry_from_avro({1: v1, 2: v2_narrow})
    v2_dropped = avro.to_avro_schema(
        [{"id": 2, "name": "b", "type": "string"}])
    with pytest.raises(ValueError, match="removal"):
        avro.registry_from_avro({1: v1, 2: v2_dropped})


def test_load_file_shapes(tmp_path):
    """Both accepted file shapes — plain {ver: schema} map and a
    Confluent subject dump — resolve identically."""
    plain = tmp_path / "plain.json"
    plain.write_text(json.dumps({
        str(v): avro.to_avro_schema(f)
        for v, f in reg.PAGES_REGISTRY.items()
    }))
    confluent = tmp_path / "subject.json"
    confluent.write_text(json.dumps({
        "subject": "pages-value",
        "versions": [
            {"version": v, "schema": json.dumps(avro.to_avro_schema(f))}
            for v, f in sorted(reg.PAGES_REGISTRY.items())
        ],
    }))
    a = avro.load_avro_registry(str(plain))
    b = avro.load_avro_registry(str(confluent))
    assert a == b == reg.PAGES_REGISTRY


def test_job_cli_avro_registry(spark, tmp_path):
    """--avro-registry on the spark-submit entry point: a registry dump
    file drives the full replay to the same final state (rows, fields,
    registry_version) as the built-in hand-written registry."""
    from clinical_trials_etl_spark.datagen.changelog import (
        LogSpec,
        write_changelog_segments,
    )
    from clinical_trials_etl_spark.job import main
    from clinical_trials_etl_spark.lake.table import LakeTable

    log_dir = str(tmp_path / "log")
    write_changelog_segments(
        spark, LogSpec(n_events=400, n_hosts=4, paths_per_host=20, seed=9),
        log_dir, n_segments=2)
    dump = tmp_path / "registry.json"
    dump.write_text(json.dumps({
        str(v): avro.to_avro_schema(f)
        for v, f in reg.PAGES_REGISTRY.items()
    }))

    got = main(["--log-dir", log_dir, "--table", str(tmp_path / "t_avro"),
                "--avro-registry", str(dump)])
    want = main(["--log-dir", log_dir, "--table", str(tmp_path / "t_ref")])
    assert got["rows"] == want["rows"] > 0

    t_avro = LakeTable(spark, str(tmp_path / "t_avro"))
    t_ref = LakeTable(spark, str(tmp_path / "t_ref"))
    assert t_avro.fields() == t_ref.fields()
    assert t_avro.registry_version() == t_ref.registry_version()
    rows = lambda t: sorted(
        t.read().collect(), key=lambda r: r["url"])  # noqa: E731
    assert rows(t_avro) == rows(t_ref)

    # a corrupt dump fails at startup, before any stream work
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"1": {"type": "enum", "symbols": ["A"]}}))
    with pytest.raises(ValueError, match="record schema"):
        main(["--log-dir", log_dir, "--table", str(tmp_path / "t_bad"),
              "--avro-registry", str(bad)])


def test_avro_driven_evolution_end_to_end(spark, tmp_path):
    """apply_batch driven by an Avro-derived registry produces the
    identical evolution (fields, registry_version) as the hand-written
    one — the two front ends are interchangeable."""
    dump = {v: json.dumps(avro.to_avro_schema(f))
            for v, f in reg.PAGES_REGISTRY.items()}
    registry = avro.registry_from_avro(dump)

    table = create_pages_table(spark, str(tmp_path / "tbl"), n_buckets=2)
    b1 = spark.createDataFrame(
        [(1, "I", "u1", None, b"<p>one</p>", "en", None, None, 1)], COLS)
    apply_batch(table, b1, "b1", registry=registry)
    assert table.fields() == reg.PAGES_REGISTRY[1]

    b2 = spark.createDataFrame(
        [(2, "U", "u1", None, b"<p>two</p>", None, "fr", 200, 4)], COLS)
    apply_batch(table, b2, "b2", registry=registry)
    assert table.fields() == reg.PAGES_REGISTRY[4]
    assert table.registry_version() == 4
    rows = {r["url"]: r for r in table.read().collect()}
    assert rows["u1"]["language"] == "fr"
    assert rows["u1"]["fetch_status"] == 200
