"""Composed nested-document assembly (the reference's main extraction
program, main.py:225-243): a spec mirroring the five-section selector
config applied to the CTIS-shaped fixture must produce the expected
nested document — section scoping, text fields through the full
selector grammar, tables, enumerations, and label maps together."""

from __future__ import annotations

import json

from pyspark.sql import functions as F, types as T

from clinical_trials_etl_spark.functions import document_extract as DX
from clinical_trials_etl_spark.functions import htmldom
from tests.test_html_golden import CTIS_FIXTURE

# selector strings verbatim from trials_extractor/config/selectors.py;
# structure mirrors HEADER/SUMMARY/LOCATIONS_SELECTORS
SPEC = {
    "header": {
        "title": "p.bolder:-soup-contains('Title:') + p",
        "euct_number": "p.bolder:-soup-contains('EUCT number:') + p",
        "protocol_code": "p.bolder:-soup-contains('Protocol code:') + p",
    },
    "summary": {
        "__scope__": "div#summary",
        "trial_information": {
            "__scope__": "div#trial_information",
            "medical_condition": "p.bolder:-soup-contains('Medical condition') + p",
            "trial_phase": "p.bolder:-soup-contains('Trial Phase:') + p",
            "sponsor": "p.bolder:-soup-contains('Sponsor:') + p",
            "age_range": "p.bolder:-soup-contains('Age range:') + p",
        },
        "applications": {
            "__scope__": "div#applications",
            "application_type": "p.bolder:-soup-contains('Application type:') + p",
            "decision_table": {
                "__kind__": "table",
                "selector": "h4:-soup-contains('Decision') + table",
            },
        },
    },
    "locations": {
        "__scope__": "div#locations",
        "countries": {"__kind__": "all", "selector": "div#locations > div > h3"},
        "site_fields": {"__kind__": "labels", "selector": "div"},
    },
    "missing_section": {
        "__scope__": "div#does_not_exist",
        "anything": "p",
    },
}

EXPECTED = {
    "header": {
        "title": "A Study of Example vs Placebo",
        "euct_number": "2024-510001-34-00",
        "protocol_code": "EX-2024-01",
    },
    "summary": {
        "trial_information": {
            "medical_condition": "Severe asthma",
            "trial_phase": "Phase III",
            "sponsor": "Acme Pharma",
            "age_range": "18-64",
        },
        "applications": {
            "application_type": "Initial",
            "decision_table": [{"MS": "FR", "Decision": "Authorised"}],
        },
    },
    "locations": {
        "countries": ["France", "Germany"],
        # first div under #locations is the France site block
        "site_fields": {"Planned number of subjects": "120"},
    },
    "missing_section": {},
}


def test_extract_document_nested_assembly():
    root = htmldom.parse(CTIS_FIXTURE)
    assert DX.extract_document(root, SPEC) == EXPECTED


def test_document_extractor_udf_roundtrip(spark):
    df = spark.createDataFrame(
        [("p1", CTIS_FIXTURE.encode())],
        T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("html", T.BinaryType()),
            ]
        ),
    )
    udf = DX.make_document_extractor(SPEC)
    doc_json = df.select(udf("html").alias("doc")).collect()[0]["doc"]
    assert json.loads(doc_json) == EXPECTED
    # downstream relational access through get_json_object (F20)
    got = df.select(
        F.get_json_object(udf("html"), "$.header.euct_number").alias("k")
    ).collect()[0]["k"]
    assert got == "2024-510001-34-00"
