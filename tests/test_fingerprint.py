"""Definitional oracle for the winnowing rolling-hash fingerprint
(operators/textstats.py::q_rolling_fingerprint): an independent
pure-Python implementation of Schleimer et al.'s scheme, plus the
property the scheme exists for — local edits preserve most of the
fingerprint set, which whole-document digests (text_fingerprint) do not.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from clinical_trials_etl_spark.operators.textstats import (
    WINNOW_K,
    WINNOW_MOD,
    WINNOW_POW,
    WINNOW_W,
    q_rolling_fingerprint,
)


def py_winnow(text: str) -> list[int]:
    """Independent reference: k-gram polynomial hashes, min per window,
    distinct + sorted."""
    n = len(text)
    if n >= WINNOW_K:
        hashes = [
            sum(
                ord(text[i + j]) * WINNOW_POW[j] for j in range(WINNOW_K)
            )
            % WINNOW_MOD
            for i in range(n - WINNOW_K + 1)
        ]
    else:
        hashes = [sum(ord(c) for c in text) % WINNOW_MOD]
    if len(hashes) >= WINNOW_W:
        wins = [
            min(hashes[j : j + WINNOW_W])
            for j in range(len(hashes) - WINNOW_W + 1)
        ]
    else:
        wins = [min(hashes)]
    return sorted(set(wins))


def spark_fp_rows(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.createOrReplaceTempView("documents")

    class _FakeReader:
        def parquet(self, path):
            return df

    class _FakeSpark:
        read = _FakeReader()

    out = q_rolling_fingerprint(_FakeSpark(), "unused")
    return {r["doc_id"]: r for r in out.collect()}


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),  # 3-char edit
    (2, "short"),  # < WINNOW_K chars -> degenerate hash
    (3, "exactly8"),  # == WINNOW_K chars -> single gram
    (4, "aaaaaaaaaaaaaaaaaaaa"),  # repeated grams collapse to one fp
]


def test_matches_pure_python_reference(spark):
    got = spark_fp_rows(spark, DOCS)
    for doc_id, text in DOCS:
        fp = py_winnow(text)
        digest = hashlib.md5(
            ",".join(str(x) for x in fp).encode()
        ).hexdigest()
        row = got[doc_id]
        assert row["n_fp"] == len(fp), (doc_id, text)
        assert row["fp_min"] == fp[0], (doc_id, text)
        assert row["fp_digest"] == digest, (doc_id, text)


def test_local_edit_preserves_most_fingerprints(spark):
    """The winnowing property: a 1-word edit at the end of a 43-char
    document disturbs only the grams overlapping the edit, so the two
    fingerprint sets overlap heavily — while their md5 whole-doc digests
    (by construction) differ completely."""
    a = set(py_winnow(DOCS[0][1]))
    b = set(py_winnow(DOCS[1][1]))
    assert a != b
    overlap = len(a & b) / len(a | b)
    assert overlap >= 0.5, overlap


def test_repeated_text_collapses(spark):
    got = spark_fp_rows(spark, DOCS)
    assert got[4]["n_fp"] == 1  # all grams identical -> one fingerprint
