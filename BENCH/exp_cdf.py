"""Change-data-feed cost evidence: what a downstream consumer pays per
poll with the feed vs without it, as the table grows.

Builds a pages table by replaying a base log, then applies ONE small
incremental batch and times, at several base sizes:

- feed        : changes(v, v+1) consume (count+collect of the net rows)
- full_scan   : read() full-table consume — the no-CDF consumer's poll
- mirror_sync : end-to-end downstream apply of the same window
                (feed read + mirror MERGE commit)
- ivm_refresh : advance a materialized per-language count/avg view by
                the same window from the signed pre/post-image feed
                (cdc/ivm.py) — includes the view's own MERGE commit
- agg_recompute : the no-IVM consumer's poll — the identical aggregate
                recomputed from a full base-table scan (the reference's
                per-poll pattern, mongodb_storage.py:154-245)

The claim under test is asymptotic, not constant: feed cost tracks the
BATCH size while the full scan tracks the TABLE size, so the ratio
must widen as the base grows. The same shape is expected for
ivm_refresh vs agg_recompute; each leg also cross-checks the refreshed
view against the recompute, so the speedup is certified equal-output.
Run on a quiet host (canary protocol as in bench_scaling.py); archive
with BENCH/cdf_run_*.json.

Usage: python BENCH/exp_cdf.py [--cores 16] [--bases 50000,200000]
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
from clinical_trials_etl_spark.cdc.ivm import (  # noqa: E402
    create_agg_view,
    read_agg_view,
    refresh_agg_view,
)
from clinical_trials_etl_spark.cdc.mirror import (  # noqa: E402
    create_mirror,
    sync_mirror,
)
from clinical_trials_etl_spark.cdc.replay import replay  # noqa: E402
from clinical_trials_etl_spark.datagen.changelog import (  # noqa: E402
    LogSpec,
    write_changelog_segments,
)

INC_EVENTS = 4_000


def one_leg(spark, base_events: int, mode: str,
            inc_segments: int = 1) -> dict:
    work = tempfile.mkdtemp(prefix=f"cdf_{base_events}_")
    # base load: one log; incremental: a second log phase whose lsns
    # continue after the base (lsn_offset), same key space so the
    # batch UPDATES existing rows (the worst case for COW diffing)
    base_spec = LogSpec(n_events=base_events,
                        n_hosts=max(50, base_events // 200), seed=11)
    write_changelog_segments(spark, base_spec, f"{work}/base",
                             n_segments=8)
    # same seed => same url universe, so the increment is a realistic
    # mix of updates to existing keys and fresh inserts; lsn_offset
    # keeps its lsns strictly after the base phase
    inc_spec = LogSpec(n_events=INC_EVENTS,
                       n_hosts=max(50, base_events // 200), seed=11,
                       lsn_offset=base_events * 4)
    write_changelog_segments(spark, inc_spec, f"{work}/inc",
                             n_segments=inc_segments)

    table = replay(spark, f"{work}/base", f"{work}/table",
                   segments_per_batch=2, batch_prefix="base",
                   merge_mode=mode)
    v_base = table.current_version()

    # a mirror already caught up to the base (the steady-state consumer)
    mirror = create_mirror(spark, table, f"{work}/mirror")
    sync_mirror(table, mirror)

    # a materialized aggregate view already caught up to the base:
    # per-language page count + mean fetch_status (the log's schema
    # ramp completes inside the base load, so the final names apply)
    view = create_agg_view(
        spark, table, f"{work}/view",
        group_cols=["language"],
        aggs=[("count", None, "pages"),
              ("avg", "fetch_status", "mean_status")])
    refresh_agg_view(table, view)

    replay(spark, f"{work}/inc", f"{work}/table",
           batch_prefix="inc", merge_mode=mode,
           segments_per_batch=1)
    v_cur = table.current_version()

    # both consumers actually read the text payloads (a bare count()
    # would collapse to a parquet footer count and time nothing)
    def consume(df):
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.length("text")).alias("b")).collect()[0]
        return row["n"]

    t0 = time.monotonic()
    feed_rows = consume(table.changes(v_base, v_cur))
    t_feed = time.monotonic() - t0

    # the same window through the one-pass two-sided diff (the fold
    # cdc/ivm.py uses for multi-commit refresh windows): per-commit
    # feed cost grows with the number of commits in the window, the
    # window diff does not (VERDICT r4 #7)
    t0 = time.monotonic()
    window_rows = consume(table.changes_window(v_base, v_cur))
    t_window = time.monotonic() - t0

    t0 = time.monotonic()
    table_rows = consume(table.read())
    t_scan = time.monotonic() - t0

    t0 = time.monotonic()
    stats = sync_mirror(table, mirror)
    t_sync = time.monotonic() - t0

    t0 = time.monotonic()
    ivm_stats = refresh_agg_view(table, view)
    t_ivm = time.monotonic() - t0

    def recompute(df):
        return df.groupBy("language").agg(
            F.count("*").alias("pages"),
            F.avg("fetch_status").alias("mean_status"))

    t0 = time.monotonic()
    recomputed = {r["language"]: (r["pages"], r["mean_status"])
                  for r in recompute(table.read()).collect()}
    t_recompute = time.monotonic() - t0

    # the speedup only counts if the outputs agree
    maintained = {r["language"]: (r["pages"], r["mean_status"])
                  for r in read_agg_view(view).collect()}
    assert maintained.keys() == recomputed.keys(), "group sets diverge"
    for lang, (n, m) in maintained.items():
        rn, rm = recomputed[lang]
        assert n == rn and abs((m or 0) - (rm or 0)) < 1e-9, lang

    return {
        "base_events": base_events,
        "inc_events": INC_EVENTS,
        "inc_commits": inc_segments,
        "mode": mode,
        "table_rows": table_rows,
        "feed_rows": feed_rows,
        "mirror_rows_merged": stats["rows"],
        "view_groups_touched": ivm_stats["groups"],
        "window_rows": window_rows,
        "feed_sec": round(t_feed, 3),
        "window_feed_sec": round(t_window, 3),
        "full_scan_sec": round(t_scan, 3),
        "mirror_sync_sec": round(t_sync, 3),
        "ivm_refresh_sec": round(t_ivm, 3),
        "agg_recompute_sec": round(t_recompute, 3),
        "scan_over_feed": round(t_scan / t_feed, 2) if t_feed else None,
        "recompute_over_ivm": (
            round(t_recompute / t_ivm, 2) if t_ivm else None),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--bases", default="50000,200000")
    ap.add_argument("--modes", default="cow,delta")
    ap.add_argument("--inc-segments", type=int, default=1,
                    help="number of commits the increment lands as")
    args = ap.parse_args()
    spark = get_spark(cores=args.cores)
    legs = [
        one_leg(spark, int(b), m, inc_segments=args.inc_segments)
        for b in args.bases.split(",")
        for m in args.modes.split(",")
    ]
    print(json.dumps({"cores": args.cores, "legs": legs}))


if __name__ == "__main__":
    main()
