"""Manifest-stats file-skipping evidence: what a time-windowed read
costs with and without the sorted-compaction + stats layout
(lake/table.py::_read_skipping, compact(sort_by=...)).

Builds a pages table by replaying a changelog (warc_ts correlates with
commit order, as in real ingest), then times a narrow window read on
two file layouts with IDENTICAL file counts — unsorted split files vs
sorted split files — so the only variable is range clustering:

- filter_scan   : read() + row filter on the unsorted layout — the
                  no-feature baseline; plans every file
- skip_unsorted : read(between=...) on the unsorted layout — stats
                  exist but each file covers a wide range, so the
                  manifest can prove almost nothing disjoint
- skip_sorted   : read(between=...) after compact(sort_by="warc_ts",
                  rows_per_file=k) — range-clustered files, the layout
                  the feature is for

Each leg cross-checks row counts across the three paths (equal-output
or the timing is meaningless) and reports files-planned per path from
df.inputFiles(). The claim is file-count asymptotics, not constants:
the sorted+skipped read plans O(window) files while both others plan
O(table) — at design scale 'yesterday's pages out of a year-long
table' is the difference between touching a day and touching a year.

Usage: python BENCH/exp_skip.py [--cores 16] [--bases 200000,800000]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from clinical_trials_etl_spark.session import get_spark  # noqa: E402
from clinical_trials_etl_spark.cdc.replay import replay  # noqa: E402
from clinical_trials_etl_spark.datagen.changelog import (  # noqa: E402
    LogSpec,
    write_changelog_segments,
)


def _consume(df) -> int:
    row = df.agg(F.count("*").alias("n"),
                 F.sum(F.length("text")).alias("b")).collect()[0]
    return row["n"]


def one_leg(spark, base_events: int) -> dict:
    work = tempfile.mkdtemp(prefix=f"skip_{base_events}_")
    spec = LogSpec(n_events=base_events,
                   n_hosts=max(50, base_events // 200), seed=17)
    write_changelog_segments(spark, spec, f"{work}/log", n_segments=8)
    table = replay(spark, f"{work}/log", f"{work}/table",
                   segments_per_batch=2)

    lo, hi = table.read().agg(
        F.min("warc_ts"), F.max("warc_ts")).collect()[0]
    span = hi - lo
    w_lo, w_hi = lo + span / 2, lo + span / 2 + span / 16  # 1/16 window

    def timed(df):
        t0 = time.monotonic()
        n = _consume(df)
        return n, round(time.monotonic() - t0, 3), len(set(df.inputFiles()))

    # target ~16 range files per bucket on BOTH layouts
    n_rows = table.read().count()
    rows_per_file = max(1000, int(
        n_rows / table.snapshot()["n_buckets"] / 16))

    # layout A: same file count, NO range clustering (shuffle order)
    table.compact(max_files_per_bucket=0, rows_per_file=rows_per_file)
    files_unsorted = len({e["path"] for e in table.files()})
    n_filter, t_filter, f_filter = timed(
        table.read().where(F.col("warc_ts").between(F.lit(w_lo),
                                                    F.lit(w_hi))))
    n_unsorted, t_unsorted, f_unsorted = timed(
        table.read(between=("warc_ts", w_lo, w_hi)))

    # layout B: range-clustered sorted runs
    table.compact(sort_by="warc_ts", rows_per_file=rows_per_file)
    files_sorted = len({e["path"] for e in table.files()})
    n_sorted, t_sorted, f_sorted = timed(
        table.read(between=("warc_ts", w_lo, w_hi)))

    assert n_filter == n_unsorted == n_sorted, "paths diverge"
    return {
        "base_events": base_events,
        "table_rows": n_rows,
        "window_rows": n_filter,
        "files_unsorted_layout": files_unsorted,
        "files_sorted_layout": files_sorted,
        "filter_scan": {"sec": t_filter, "files": f_filter},
        "skip_unsorted": {"sec": t_unsorted, "files": f_unsorted},
        "skip_sorted": {"sec": t_sorted, "files": f_sorted},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--bases", default="200000,800000")
    args = ap.parse_args()
    spark = get_spark(cores=args.cores)
    legs = [one_leg(spark, int(b)) for b in args.bases.split(",")]
    print(json.dumps({"cores": args.cores, "legs": legs}))


if __name__ == "__main__":
    main()
