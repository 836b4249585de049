"""Definitional guarantee test for a17b (approx_percentile twin of
a17): independent of the DuckDB oracle, assert the Greenwald-Khanna
sketch's contract directly — each returned value is an actual element
of its group and its rank is within n/accuracy (+1 for boundary) of the
target rank p*n. At test scale (group sizes « accuracy) this means the
discrete quantile is exact."""

from __future__ import annotations

import bisect
import math

from clinical_trials_etl_spark.operators.olap import (
    A17B_ACCURACY,
    q_a17b_value_percentiles_approx,
)


def test_a17b_rank_error_within_sketch_bound(spark, sf_dir):
    rows = q_a17b_value_percentiles_approx(spark, sf_dir).collect()
    vals = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "value")
        .collect()
    )
    by_type: dict[str, list[float]] = {}
    for r in vals:
        by_type.setdefault(r.event_type, []).append(r.value)
    for v in by_type.values():
        v.sort()
    assert {r.event_type for r in rows} == set(by_type)
    for r in rows:
        group = by_type[r.event_type]
        n = len(group)
        tol = n / A17B_ACCURACY + 1
        for p, got in ((0.5, r.ap50), (0.9, r.ap90), (0.99, r.ap99)):
            lo = bisect.bisect_left(group, got)
            hi = bisect.bisect_right(group, got)
            assert lo < hi, f"{r.event_type} p{p}: {got} not in group"
            target = p * n
            err = min(abs(rank - target) for rank in (lo + 1, hi))
            assert err <= tol, (
                f"{r.event_type} p{p}: rank error {err} > {tol}"
            )
            if n <= A17B_ACCURACY:
                # sketch provably exact: must be the discrete quantile
                exact = group[min(n - 1, max(0, math.ceil(p * n) - 1))]
                assert got == exact
