#!/usr/bin/env python
"""Hot-key skew evidence (north rule: 'key-salted repartition on
url-hash to defeat hot-host skew').

Builds an EXTREME hot-key change log — a handful of distinct urls, so
nearly every event lands on the same dedup key — and replays it twice:

- salted       (n_salt=16, the design-scale setting, SPARK_GRAFT_SALT):
  two-phase salted max_by — the hot key's reducer fan-in spreads over
  16 phase-1 reducers.
- single-phase (n_salt=1): plain groupBy(key).max_by.

Measured finding (see BENCH/BASELINE.md): because max_by is algebraic,
map-side partial aggregation ALREADY collapses the hot key to one row
per map partition, so at sandbox payload sizes (~300 B html) the
single-phase plan wins — the salt's second shuffle is pure overhead.
What partial aggregation does not bound is reducer fan-in
(#map_partitions x payload for the hot key), which is why the salted
plan is the recommended setting at design scale (the shipped default
stays n_salt=1; opt in via SPARK_GRAFT_SALT): at ~100 KB html and 10^4
map tasks the unsalted hot-key reducer would absorb ~1 GB; n_salt=16
divides it.

Usage: python bench_skew.py [n_events]   (default 1_000_000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clinical_trials_etl_spark.cdc.replay import create_pages_table  # noqa: E402
from clinical_trials_etl_spark.cdc.apply import apply_batch  # noqa: E402
from clinical_trials_etl_spark.datagen.changelog import (  # noqa: E402
    LogSpec,
    changelog_df,
)
from clinical_trials_etl_spark.session import get_spark  # noqa: E402


def run(spark, df, work: str, n_salt: int) -> float:
    table = create_pages_table(spark, os.path.join(work, f"table_salt{n_salt}"))
    t0 = time.perf_counter()
    apply_batch(table, df, batch_id="skew-batch", n_salt=n_salt)
    return time.perf_counter() - t0


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("skew-bench", cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    work = tempfile.mkdtemp(prefix="bench_skew_")
    try:
        # 4 distinct urls across n_events: the worst hot-key regime
        spec = LogSpec(
            n_events=n_events, n_hosts=2, paths_per_host=2, seed=42,
            p_insert=0.6, p_update=0.4, dup_rate=0.0, skew_exp=1.0,
        )
        df = changelog_df(spark, spec).cache()
        df.count()

        salted = run(spark, df, work, n_salt=16)
        single = run(spark, df, work, n_salt=1)
        print(json.dumps({
            "n_events": n_events,
            "distinct_keys": df.select("url").distinct().count(),
            "salted_sec": round(salted, 3),
            "single_phase_sec": round(single, 3),
            "salt_overhead_x": round(salted / single, 2),
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
