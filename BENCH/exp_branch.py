"""Branch fast_forward cost — metadata-only publish, measured.

The claim under test: ``fast_forward`` (the audit-branch publish,
tests/test_branches.py) costs O(net files + table metadata), NOT
O(table data) — no row is read or written at publish time. At design
scale that is the difference between an audit gate you can run per
load window and one you can only afford nightly.

Method: build base tables of increasing size (same changelog
generator, growing event counts), fork a branch on each, ingest the
SAME fixed-size update log into the branch (delta mode — the streaming
regime), then measure

- ``ff_s``          — fast_forward wall (the publish itself),
- ``feed_s``        — reading the published commit's change feed
                      (what a mirror/IVM consumer pays downstream),
- ``ingest_s``      — the branch ingest leg (context, scales with the
                      update, not the base),

plus the base table's row count and file count. Expectation: ff_s and
feed_s ~flat as the base grows 16x; a publish that re-wrote data
would grow with the base instead. Also asserts state parity: the
published table equals a control that ingested base+update directly.

Run:  python BENCH/exp_branch.py [--cores 16]
Emits one JSON line; archive as BENCH/branch_run_r5*.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clinical_trials_etl_spark.datagen.changelog import (  # noqa: E402
    LogSpec,
    write_changelog_segments,
)
from clinical_trials_etl_spark.cdc.replay import replay  # noqa: E402
from clinical_trials_etl_spark.lake.table import LakeTable  # noqa: E402
from clinical_trials_etl_spark.session import get_spark  # noqa: E402

UPDATE_EVENTS = 20_000


def _leg(spark, work, base_events):
    base_log = f"{work}/log-base-{base_events}"
    # key space scales with the base (paths_per_host ∝ events) so the
    # base TABLE actually grows 16x across legs — fixed key space
    # would just churn the same rows
    write_changelog_segments(
        spark, LogSpec(n_events=base_events, n_hosts=64,
                       paths_per_host=max(200, base_events // 100),
                       seed=3),
        base_log, n_segments=4)
    upd_log = f"{work}/log-upd-{base_events}"
    write_changelog_segments(
        spark, LogSpec(n_events=UPDATE_EVENTS, n_hosts=64,
                       paths_per_host=200, seed=9,
                       lsn_offset=base_events * 4),
        upd_log, n_segments=2)

    root = f"{work}/t-{base_events}"
    table = replay(spark, base_log, root, n_buckets=32)
    base_rows = table.read().count()
    base_files = len(table.files())

    table.create_branch("audit")
    bt = table.branch("audit")
    t0 = time.monotonic()
    replay(spark, upd_log, root, batch_prefix="upd",
           merge_mode="delta", table=bt)
    ingest_s = time.monotonic() - t0

    t0 = time.monotonic()
    ff = table.fast_forward("audit")
    ff_s = time.monotonic() - t0

    t0 = time.monotonic()
    feed_rows = table.changes(
        ff["version"] - 1, ff["version"]).count()
    feed_s = time.monotonic() - t0

    # parity vs direct ingest of both logs
    ctl = replay(spark, base_log, f"{work}/ctl-{base_events}",
                 n_buckets=32)
    replay(spark, upd_log, f"{work}/ctl-{base_events}",
           batch_prefix="upd", merge_mode="delta", table=ctl)
    a = sorted((r["url"], r["text"]) for r in table.read().collect())
    b = sorted((r["url"], r["text"]) for r in ctl.read().collect())
    assert a == b, "published state != direct-ingest control"

    return {
        "base_events": base_events,
        "base_rows": base_rows,
        "base_files": base_files,
        "ingest_s": round(ingest_s, 3),
        "ff_s": round(ff_s, 4),
        "ff_net_files": ff["net_files"],
        "feed_s": round(feed_s, 3),
        "feed_rows": feed_rows,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()
    spark = get_spark(cores=args.cores)
    import tempfile

    work = tempfile.mkdtemp(prefix="exp-branch-")
    legs = [_leg(spark, work, n) for n in (50_000, 200_000, 800_000)]
    out = {"metric": "branch_fast_forward_cost", "cores": args.cores,
           "update_events": UPDATE_EVENTS, "legs": legs}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
