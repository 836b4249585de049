"""Out-of-band maintenance vs in-stream cadence — A/B + true-race stress.

The question: delta-mode ingest accretes layer files that must be
compacted, and there are two deployment shapes for the fold:

- **in-stream** (``compact_every=K``): the ingest driver runs the fold
  itself every K micro-batches — maintenance SERIALIZES with ingest,
  so every fold's wall-clock comes straight out of ingest throughput;
- **out-of-band** (``job.py --maintain`` beside the stream): a separate
  maintenance job compacts the same table root while ingest keeps
  committing — sanctioned by the two rebase paths (a compaction losing
  the snapshot race to delta merges adopts their layers on top of the
  fold; a delta merge losing to a compaction re-commits its layer on
  top of the winner), so neither side aborts.

This experiment measures both shapes on the same changelog AND
stress-tests the rebase paths under a real race (two threads, one
table root, no injection): every commit's ``rebases`` counter is
summed, and the final state is asserted byte-identical across legs
and against the reference in-memory fold.

Run:  python BENCH/exp_oob_maintain.py [--events 200000] [--cores 16]
Emits one JSON line; archive as BENCH/oob_maintain_r5*.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clinical_trials_etl_spark.datagen.changelog import (  # noqa: E402
    LogSpec,
    write_changelog_segments,
)
from clinical_trials_etl_spark.cdc.replay import replay  # noqa: E402
from clinical_trials_etl_spark.lake.table import (  # noqa: E402
    CommitConflict,
    LakeTable,
)


def _state_digest(table: LakeTable) -> list[tuple]:
    rows = table.read().select(
        "url", "warc_ts", "language", "text").collect()
    return sorted(tuple(r) for r in rows)


def _run_in_stream(spark, log_dir, root, compact_every):
    t0 = time.monotonic()
    table = replay(spark, log_dir, root, merge_mode="delta",
                   compact_every=compact_every)
    return table, {"ingest_s": round(time.monotonic() - t0, 2),
                   "total_s": round(time.monotonic() - t0, 2)}


def _run_out_of_band(spark, log_dir, root, poll_s):
    """Ingest on the main thread; a maintenance thread compacts the
    same table root whenever layers accrete — the real race."""
    stats = {"passes": 0, "compact_rebases": 0, "conflicts": 0}
    stop = threading.Event()

    def maintainer():
        # separate handle, like a separate spark-submit --maintain job
        cur = os.path.join(root, "_meta", "_current")
        while not stop.is_set() and not os.path.exists(cur):
            stop.wait(0.2)
        if stop.is_set():
            return
        m = LakeTable(spark, root)
        while not stop.is_set():
            try:
                res = m.compact(max_files_per_bucket=4)
                if res.get("compacted_buckets"):
                    stats["passes"] += 1
                    stats["compact_rebases"] += res.get("rebases", 0)
            except CommitConflict:
                # stale inputs (shouldn't happen under delta rivals) or
                # retry budget exhausted — rerun on the next poll
                stats["conflicts"] += 1
            stop.wait(poll_s)

    th = threading.Thread(target=maintainer, daemon=True)
    th.start()
    t0 = time.monotonic()
    table = replay(spark, log_dir, root, merge_mode="delta")
    ingest_s = time.monotonic() - t0
    stop.set()
    th.join()
    # final fold so both legs end fully compacted
    fin = table.compact(max_files_per_bucket=1)
    if fin.get("compacted_buckets"):
        stats["passes"] += 1
    total_s = time.monotonic() - t0
    stats.update(ingest_s=round(ingest_s, 2), total_s=round(total_s, 2))
    return table, stats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=200_000)
    ap.add_argument("--segments", type=int, default=20)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--compact-every", type=int, default=5)
    ap.add_argument("--poll-s", type=float, default=0.5)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    from clinical_trials_etl_spark.session import get_spark
    import tempfile

    spark = get_spark("exp-oob-maintain", cores=args.cores)
    work = args.workdir or tempfile.mkdtemp(prefix="oob_maintain_")
    log_dir = os.path.join(work, "log")
    spec = LogSpec(n_events=args.events, n_hosts=200, seed=11)
    write_changelog_segments(spark, spec, log_dir,
                             n_segments=args.segments)

    # merge-side rebase counter: sum over the ingest leg's commits
    t_b, oob = _run_out_of_band(
        spark, log_dir, os.path.join(work, "t_oob"), args.poll_s)
    merge_rebases = sum(
        1 for h in t_b.history()
        if h["operation"] == "merge" and h.get("detail", {}).get("rebases"))
    oob["merge_commit_rebases"] = merge_rebases

    t_a, instream = _run_in_stream(
        spark, log_dir, os.path.join(work, "t_in"), args.compact_every)

    # correctness: both legs byte-identical, and identical to the fold
    da, db = _state_digest(t_a), _state_digest(t_b)
    assert da == db, "out-of-band leg diverged from in-stream leg"
    from clinical_trials_etl_spark.datagen.changelog import changelog_df
    from clinical_trials_etl_spark.datagen.reference_fold import (
        fold_changelog,
    )
    exp = fold_changelog(
        [r.asDict() for r in changelog_df(spark, spec).collect()])
    got = {r[0]: r[3] for r in db}
    assert set(got) == set(exp) and all(
        got[u] == exp[u]["text"] for u in exp), "state != reference fold"

    out = {
        "metric": "oob_maintain_ab",
        "events": args.events,
        "cores": args.cores,
        "in_stream": instream,
        "out_of_band": oob,
        "rows": len(db),
        "states_identical": True,
        "ingest_speedup": round(
            instream["ingest_s"] / oob["ingest_s"], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
