"""Z-order vs lexicographic clustering: two-dimensional file-skipping
evidence (lake/table.py::compact(zorder_by=...)).

A pages table serves two access patterns at once: time-window reads
("yesterday's pages", warc_ts) and key-range reads (a host/url slice).
One sort order cannot cluster both. This experiment replays a
changelog into a table, then builds the SAME file count under two
layouts and probes a narrow window on each dimension:

- lex layout : compact(sort_by=["warc_ts", "url"]) — perfect leading-
               column clustering, trailing column unclustered
- z layout   : compact(zorder_by=["warc_ts", "url"]) — Morton
               interleaving, every file's [min,max] box tight on BOTH

Per probe it reports wall seconds and files planned (df.inputFiles())
and cross-checks row counts across layouts (equal-output or the
timing is meaningless). The claim is the asymptotic shape: lex plans
O(window) files on warc_ts but O(table) on url; Z-order plans
~O(F^(1/2)) on each — at design scale the difference between a
url-sliced audit touching a year of files or only its slice.

Usage: python BENCH/exp_zorder.py [--cores 16] [--bases 200000]
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


def _timed(df):
    t0 = time.monotonic()
    n = _consume(df)
    return n, round(time.monotonic() - t0, 3), len(set(df.inputFiles()))


def one_leg(spark, base_events: int) -> dict:
    work = tempfile.mkdtemp(prefix=f"zorder_{base_events}_")
    spec = LogSpec(n_events=base_events,
                   n_hosts=max(50, base_events // 200), seed=23)
    write_changelog_segments(spark, spec, f"{work}/log", n_segments=8)
    table = replay(spark, f"{work}/log", f"{work}/table",
                   segments_per_batch=2)

    ts_lo, ts_hi = table.read().agg(
        F.min("warc_ts"), F.max("warc_ts")).collect()[0]
    span = ts_hi - ts_lo
    ts_win = (ts_lo + span / 2, ts_lo + span / 2 + span / 16)
    # url window: a ~1/16 slice of the sorted key space, bounds from a
    # bounded sample (driver holds ~1% of distinct urls, never all)
    urls = sorted(r.url for r in
                  table.read(columns=["url"]).sample(0.05, seed=1)
                  .collect())
    url_win = (urls[len(urls) // 2],
               urls[len(urls) // 2 + max(1, len(urls) // 16)])

    # ~16 range files per bucket: the url probe must visit every
    # bucket (the table hash-buckets on url), so all its pruning is
    # WITHIN buckets — per-bucket file resolution is the experiment
    n_rows = table.read().count()
    rows_per_file = max(250, int(
        n_rows / table.snapshot()["n_buckets"] / 16))

    out: dict = {"base_events": base_events, "table_rows": n_rows}
    checks: dict[str, set[int]] = {"ts": set(), "url": set()}
    for name, kw in (("lex", {"sort_by": ["warc_ts", "url"]}),
                     ("z", {"zorder_by": ["warc_ts", "url"]})):
        table.compact(rows_per_file=rows_per_file, **kw)
        files = len({e["path"] for e in table.files()})
        n_ts, t_ts, f_ts = _timed(
            table.read(between=("warc_ts", *ts_win)))
        n_url, t_url, f_url = _timed(
            table.read(between=("url", *url_win)))
        checks["ts"].add(n_ts)
        checks["url"].add(n_url)
        out[name] = {"files": files,
                     "ts_window": {"sec": t_ts, "files": f_ts,
                                   "rows": n_ts},
                     "url_window": {"sec": t_url, "files": f_url,
                                    "rows": n_url}}
    assert len(checks["ts"]) == 1 and len(checks["url"]) == 1, \
        "layouts diverge"
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--bases", default="200000")
    args = ap.parse_args()
    spark = get_spark(cores=args.cores)
    legs = [one_leg(spark, int(b)) for b in args.bases.split(",")]
    print(json.dumps({"cores": args.cores, "legs": legs}))


if __name__ == "__main__":
    main()
