#!/usr/bin/env python
"""Decompose per-epoch streaming cost: shell vs apply path.

stream_run_r3.json showed the streaming shell sustaining far less than
the batch replay of the SAME log (delta 6.8k ev/s vs ~59k ev/s batch at
1M events) — ~8 s/epoch of cost beyond the actual per-event work. This
experiment isolates where that time goes:

- the listener's ``durationMs`` splits each micro-batch into
  ``addBatch`` (the foreachBatch body = our apply) vs source/offset
  bookkeeping (``latestOffset``/``getBatch``/``walCommit``/
  ``commitOffsets``/``queryPlanning``/``triggerExecution`` total);
- a monkeypatched ``apply_batch`` stamps wall-time per phase
  (meta-agg action, evolution, merge action, snapshot IO).

Usage: python BENCH/exp_stream_profile.py [n_events] [n_segments] [mode]
       (defaults 200_000 / 8 / cow)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_segments = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    mode = sys.argv[3] if len(sys.argv) > 3 else "cow"

    from clinical_trials_etl_spark.session import get_spark
    from clinical_trials_etl_spark.datagen.changelog import (
        LogSpec, write_changelog_segments,
    )
    from clinical_trials_etl_spark.cdc import apply as apply_mod
    from clinical_trials_etl_spark.cdc import stream as stream_mod
    from clinical_trials_etl_spark.cdc.replay import create_pages_table

    spark = get_spark("stream-profile",
                      cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    work = tempfile.mkdtemp(prefix="stream_profile_")
    log_dir = os.path.join(work, "log")
    spec = LogSpec(n_events=n_events, n_hosts=max(100, n_events // 500),
                   paths_per_host=400, seed=42, html_pad_blocks=80)
    write_changelog_segments(spark, spec, log_dir,
                             n_segments=n_segments, files_per_segment=32)

    # ---- phase-timing shim around apply_batch ---------------------
    phases: list[dict] = []
    real_merge = apply_mod.LakeTable.merge
    real_apply = apply_mod.apply_batch

    def timed_apply(table, batch, batch_id, **kw):
        rec = {"batch_id": batch_id}
        t0 = time.perf_counter()

        def merge_shim(self, *a, **k):
            m0 = time.perf_counter()
            out = real_merge(self, *a, **k)
            rec["merge_sec"] = round(time.perf_counter() - m0, 3)
            return out

        apply_mod.LakeTable.merge = merge_shim
        try:
            out = real_apply(table, batch, batch_id, **kw)
        finally:
            apply_mod.LakeTable.merge = real_merge
        rec["apply_total_sec"] = round(time.perf_counter() - t0, 3)
        rec["pre_merge_sec"] = round(
            rec["apply_total_sec"] - rec.get("merge_sec", 0.0), 3)
        phases.append(rec)
        return out

    stream_mod.apply_batch = timed_apply
    try:
        table = create_pages_table(spark, os.path.join(work, "tbl"),
                                   n_buckets=64)
        t0 = time.perf_counter()
        progress = stream_mod.run_stream(
            spark, log_dir, table, os.path.join(work, "ckpt"),
            max_files_per_trigger=32,
            merge_mode=None if mode == "cow" else mode,
        )
        wall = time.perf_counter() - t0
    finally:
        stream_mod.apply_batch = real_apply

    shell = []
    for p in progress:
        d = json.loads(p["duration_ms"]) if p["duration_ms"] else {}
        shell.append({
            "batch_id": p["batch_id"],
            "rows": p["num_input_rows"],
            **{k: d.get(k) for k in (
                "triggerExecution", "addBatch", "getBatch",
                "latestOffset", "queryPlanning", "walCommit",
                "commitOffsets")},
        })
    print(json.dumps({
        "mode": mode, "n_events": n_events, "n_segments": n_segments,
        "wall_sec": round(wall, 3),
        "events_per_sec": round(n_events / wall, 1),
        "shell_per_batch_ms": shell,
        "apply_phases_sec": phases,
    }, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
