"""Spec-driven nested document assembly — the reference's top-level
extraction shape (trials_extractor/main.py:225-243: five section
extractors composed into one nested dict per page), re-expressed as a
declarative spec over the htmldom selector engine.

Spec grammar (a nested dict, mirroring config/selectors.py's layout):

- ``"field": "css selector"``          -> cleaned text ('' default,
  extractors/base.py:88-101 semantics)
- ``"sub": {"__scope__": sel, ...}``   -> nested dict extracted inside
  the first match of ``sel`` (extract_subsections analog,
  extractors/base.py:145-194); missing scope -> {}
- ``{"__kind__": "table", "selector": sel}``  -> list of header-keyed
  records (html_utils.py:124-164, ragged rows skipped)
- ``{"__kind__": "list", "selector": sel}``   -> list of item strings
  (html_utils.py:166-179)
- ``{"__kind__": "labels", "selector": sel}`` -> label->value dict from
  p.bolder pairs under the selected container (html_utils.py:181-210)
- ``{"__kind__": "all", "selector": sel}``    -> list of cleaned texts
  of every match (the countries/h3 enumeration pattern,
  extractors/locations.py:43-70)

All plain-string fields of one dict level are resolved with ONE
document walk (htmldom.select_first_many). The Spark-side wrapper is an
Arrow pandas UDF emitting the nested doc as a JSON string — downstream
queries use from_json/get_json_object (F20), exporters flatten it (S9).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clinical_trials_etl_spark.functions import htmldom
from clinical_trials_etl_spark.functions.html_extract import (
    _decode,
    clean_text_py,
    label_values,
    list_items,
    table_records,
)


def _clean_node(node) -> str:
    return "" if node is None else clean_text_py(node.text.strip())


def extract_document(scope, spec: dict) -> dict:
    """Assemble the nested doc for one (sub)tree per the spec."""
    out: dict = {}
    flat: dict[str, str] = {}
    for name, rule in spec.items():
        if name == "__scope__":
            continue
        if isinstance(rule, str):
            flat[name] = rule
        elif isinstance(rule, dict) and "__kind__" in rule:
            kind, sel = rule["__kind__"], rule["selector"]
            if kind == "table":
                out[name] = table_records(htmldom.select_one(scope, sel))
            elif kind == "list":
                out[name] = list_items(htmldom.select_one(scope, sel))
            elif kind == "labels":
                out[name] = label_values(htmldom.select_one(scope, sel))
            elif kind == "all":
                out[name] = [
                    _clean_node(n) for n in htmldom.select(scope, sel)
                ]
            else:
                raise ValueError(f"unknown __kind__ {kind!r} for {name}")
        elif isinstance(rule, dict):
            sub_scope = scope
            if "__scope__" in rule:
                sub_scope = htmldom.select_one(scope, rule["__scope__"])
            out[name] = (
                {} if sub_scope is None else extract_document(sub_scope, rule)
            )
        else:
            raise ValueError(f"bad spec rule for {name}: {rule!r}")
    if flat:
        found = htmldom.select_first_many(scope, flat)
        for name in flat:
            out[name] = _clean_node(found[name])
    return out


def make_document_extractor(spec: dict, compact: bool = False):
    """Arrow pandas UDF: html binary -> nested document as JSON string
    (one parse + spec-driven assembly per page; the CDC-scale analog of
    the reference's process_file extract_data step, main.py:160-243).

    ``compact=True`` emits ``{"k":"v"}`` separators (no spaces) — the
    byte format DuckDB's ``to_json`` produces, so the output can be
    hash-compared against a SQL oracle."""
    separators = (",", ":") if compact else None

    @F.pandas_udf(T.StringType())
    def doc_udf(html: pd.Series) -> pd.Series:
        def one(payload):
            root = htmldom.parse(_decode(payload))
            return json.dumps(
                extract_document(root, spec),
                ensure_ascii=False,
                sort_keys=True,
                separators=separators,
            )

        return html.map(one)

    return doc_udf
