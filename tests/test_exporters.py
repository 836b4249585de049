"""Export sink parity tests (SURVEY.md §2.1 S5-S9).

Asserts the Spark writers reproduce the reference's export semantics:
JSONL one-object-per-line (json_exporter.py:104-128), CSV QUOTE_ALL
dialect (csv_exporter.py:30-35), and the nested-doc -> parent + child
tables flatten with parent-key propagation (csv_exporter.py:49-304).
"""

from __future__ import annotations

import csv
import glob
import json
import os

import pytest
from pyspark.sql import Row

from clinical_trials_etl_spark import exporters


@pytest.fixture(scope="module")
def nested_df(spark):
    rows = [
        Row(
            url="https://a.example.com/1",
            header=Row(title="alpha page", lang="en"),
            countries=["France", "Spain"],
            sites=[
                Row(name="site-a", city="Paris"),
                Row(name="site-b", city="Madrid"),
            ],
        ),
        Row(
            url="https://b.example.com/2",
            header=Row(title='quoted "beta"', lang="de"),
            countries=[],
            sites=[Row(name="site-c", city="Berlin")],
        ),
    ]
    return spark.createDataFrame(rows)


def test_flatten_entities_parent_and_children(nested_df):
    ents = exporters.flatten_entities(nested_df, key="url")
    assert set(ents) == {"main", "countries", "sites"}

    main = {r["url"]: r for r in ents["main"].collect()}
    # struct star-expanded with prefix, scalar kept
    assert main["https://a.example.com/1"]["header_title"] == "alpha page"
    assert main["https://b.example.com/2"]["header_lang"] == "de"

    # child rows carry the parent key (J2), empty arrays produce no rows
    sites = [(r["url"], r["name"], r["city"]) for r in ents["sites"].collect()]
    assert ("https://a.example.com/1", "site-a", "Paris") in sites
    assert ("https://b.example.com/2", "site-c", "Berlin") in sites
    countries = [(r["url"], r["value"]) for r in ents["countries"].collect()]
    assert sorted(countries) == [
        ("https://a.example.com/1", "France"),
        ("https://a.example.com/1", "Spain"),
    ]


def test_jsonl_one_object_per_line(nested_df, tmp_path):
    out = str(tmp_path / "jsonl")
    exporters.write_jsonl(nested_df.select("url", "countries"), out)
    lines = []
    for part in glob.glob(os.path.join(out, "part-*")):
        with open(part) as f:
            lines += [json.loads(line) for line in f if line.strip()]
    assert len(lines) == 2
    assert {l["url"] for l in lines} == {
        "https://a.example.com/1",
        "https://b.example.com/2",
    }


def test_csv_quote_all_dialect(nested_df, tmp_path):
    out = str(tmp_path / "csv")
    ents = exporters.export_entities_csv(nested_df, key="url", out_dir=out)
    assert set(ents) == {"main", "countries", "sites"}

    raw, rows = [], []
    for part in glob.glob(os.path.join(ents["main"], "part-*.csv")):
        with open(part, encoding="utf-8") as f:
            raw += [line for line in f if line.strip()]
            f.seek(0)
            rows += list(csv.DictReader(f))
    # every field quoted (QUOTE_ALL), embedded quotes escaped per RFC
    data_lines = [l for l in raw if not l.startswith('"url"')]
    assert all(line.startswith('"') for line in data_lines)
    by_url = {r["url"]: r for r in rows}
    assert by_url["https://b.example.com/2"]["header_title"] == 'quoted "beta"'


def test_json_sections(nested_df, tmp_path):
    out = str(tmp_path / "sections")
    exporters.write_json_sections(nested_df, out, sections=["header"])
    hdr = []
    for part in glob.glob(os.path.join(out, "header", "part-*")):
        with open(part) as f:
            hdr += [json.loads(line) for line in f if line.strip()]
    assert {h["title"] for h in hdr} == {"alpha page", 'quoted "beta"'}
    assert os.path.isdir(os.path.join(out, "full"))


def test_filtered_limited_jsonl_export(nested_df, tmp_path):
    """(S13) find(query).limit(n) -> JSON parity
    (mongodb_storage.py:443-493)."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "filtered")
    exporters.export_filtered_jsonl(
        nested_df.select("url", "header"),
        F.col("header.lang") == "en",
        limit=1,
        path=out,
    )
    recs = []
    for part in glob.glob(os.path.join(out, "part-*")):
        with open(part) as f:
            recs += [json.loads(line) for line in f if line.strip()]
    assert len(recs) == 1
    assert recs[0]["header"]["lang"] == "en"


def test_recursive_and_flat_dir_scan(spark, tmp_path):
    """(S3/S4) binaryFile scan parity with find_html_files' os.walk
    (batch_utils.py:127-143) and the flat main.py:134-138 listing."""
    from clinical_trials_etl_spark.sources.scan import scan_files

    top = tmp_path / "pages"
    (top / "deep" / "deeper").mkdir(parents=True)
    (top / "a.html").write_text("<p>a</p>")
    (top / "skip.txt").write_text("not html")
    (top / "deep" / "b.html").write_text("<p>b</p>")
    (top / "deep" / "deeper" / "c.html").write_text("<p>c</p>")

    rec = scan_files(spark, str(top), recursive=True)
    names = {os.path.basename(r["path"]) for r in rec.select("path").collect()}
    assert names == {"a.html", "b.html", "c.html"}
    # content is the raw bytes (feeds the same Arrow extraction kernel)
    row = rec.filter(rec.path.endswith("a.html")).collect()[0]
    assert bytes(row["content"]) == b"<p>a</p>"

    flat = scan_files(spark, str(top), recursive=False)
    flat_names = {
        os.path.basename(r["path"]) for r in flat.select("path").collect()
    }
    assert flat_names == {"a.html"}
