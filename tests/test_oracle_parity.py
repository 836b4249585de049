"""Replicates the driver's correctness gate locally: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB at
sf0.001, compare row count, column names, and order-insensitive values.

Comparison is strict (exact equality after canonicalization) — the
operators are engineered for bit-identical numerics (see
operators/analytics.py docstring), so no tolerance is needed.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bool):
        return bool(v)
    return v


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(_canon_cell(row[i]) for i in order))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


ORACLES = entry_mod.oracle_sql()
ALL = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = ALL[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns {spark_cols} != {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: rowcount {len(spark_rows)} != {len(duck_rows)}"
    )
    s_canon = _canon(spark_rows, spark_cols)
    d_canon = _canon(duck_rows, duck_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_emits_no_hugeint(name, duck):
    """The external driver's value hasher canonicalizes DuckDB HUGEINT
    (int128) differently from BIGINT, so an oracle emitting HUGEINT
    hash-mismatches even when every value is identical (bit r2:
    w4_sessionize, text_rolling_fingerprint). Guard the whole registry:
    DESCRIBE plans the query without executing it and reports column
    types; any HUGEINT/UHUGEINT column must be CAST to BIGINT in the
    oracle SQL."""
    rows = duck.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    bad = [(r[0], r[1]) for r in rows if "HUGEINT" in str(r[1]).upper()]
    assert not bad, f"{name}: HUGEINT oracle columns {bad} — CAST to BIGINT"


@pytest.mark.parametrize(
    "name", sorted(set(ALL) - set(ORACLES))
)
def test_rows_only_queries_run(name, spark, sf_dir):
    sdf = ALL[name](spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_a3b_approx_distinct_within_rsd(spark, sf):
    """a3b's accuracy contract: the HLL++ estimate must sit within
    3x the default relative standard deviation (5%) of the exact
    distinct counts at both scale factors (the estimator has no
    exactness regime to pin an oracle to — see the query docstring)."""
    sf_dir = f"/root/testdata/{sf}"
    from clinical_trials_etl_spark.operators.analytics import (
        q_a3_distinct_users,
        q_a3b_distinct_users_approx,
    )

    exact = q_a3_distinct_users(spark, sf_dir).collect()[0]
    approx = q_a3b_distinct_users_approx(spark, sf_dir).collect()[0]
    for col in ("n_users", "n_event_types"):
        e, a = exact[col], approx[col]
        assert abs(a - e) <= max(1, 3 * 0.05 * e), (col, e, a)
