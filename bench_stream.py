#!/usr/bin/env python
"""Streaming-path throughput: COW vs merge-on-read delta commits at
scale-representative micro-batch sizes (VERDICT r2 item 6 — bench_mor
measured the bytes story under batch replay; this measures the ev/s
story under the REAL streaming shell, run_stream + foreachBatch +
checkpoint, at 1M events).

Each mode processes the identical generated change log through
Structured Streaming micro-batches (one segment per trigger). The
delta leg compacts every 4 applied epochs — the design-scale streaming
configuration — and its wall time INCLUDES those compactions.

Per-leg spin canaries carry the host-contention reading (quiet ~0.19 s;
see BENCH/BASELINE.md "Host noise").

Usage: python bench_stream.py [n_events] [n_segments] [modes]
       (defaults 1_000_000 / 16 / cow,delta)

Each leg also reports per-epoch addBatch seconds in batch order — the
ev/s-vs-table-size curve that separates the two modes' asymptotics
(VERDICT r3 item 4): COW's per-epoch cost grows with table size, delta's
stays ~flat.

Prints one JSON line with ev/s, bytes written, and canaries per mode.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))

_LEG_SNIPPET = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from clinical_trials_etl_spark.session import get_spark
from clinical_trials_etl_spark.cdc.replay import create_pages_table
from clinical_trials_etl_spark.cdc.stream import run_stream

def spin_canary():
    t0 = time.perf_counter()
    x = 0
    for i in range(4_000_000):
        x += i * i
    return round(time.perf_counter() - t0, 3)

def dir_bytes(path):
    total = 0
    for dirpath, _d, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                total += os.path.getsize(os.path.join(dirpath, fn))
    return total

spark = get_spark("stream-bench", cores={cores})
# warmup: JIT + codegen + Python worker spawn on a throwaway table
wt = create_pages_table(spark, {work!r} + "/warmup_tbl_{mode}", n_buckets={buckets})
run_stream(spark, {warmup_log!r}, wt, {work!r} + "/warmup_ckpt_{mode}",
           max_files_per_trigger=64, merge_mode={mode!r} if {mode!r} != "cow" else None)

table = create_pages_table(spark, {work!r} + "/tbl_{mode}", n_buckets={buckets})
kwargs = dict(max_files_per_trigger={files_per_trigger})
if {mode!r} == "delta":
    kwargs.update(merge_mode="delta", compact_every=4)
c0 = spin_canary()
t0 = time.perf_counter()
progress = run_stream(spark, {log_dir!r}, table,
                      {work!r} + "/ckpt_{mode}", **kwargs)
wall = time.perf_counter() - t0
c1 = spin_canary()
# per-epoch addBatch seconds, in batch order: the ev/s-vs-table-size
# curve. COW's epochs slow down as the table grows (each rewrites
# ever-larger buckets); delta's stay ~flat (O(batch) commits) with
# periodic compaction spikes.
epoch_secs = [
    round(json.loads(p["duration_ms"]).get("addBatch", 0) / 1000.0, 2)
    for p in sorted(progress, key=lambda p: p["batch_id"])
]
print("RESULT " + json.dumps({{
    "mode": {mode!r},
    "wall_sec": round(wall, 3),
    "events_per_sec": round({n_events} / wall, 1),
    "bytes_written": dir_bytes({work!r} + "/tbl_{mode}"),
    "final_rows": table.read().count(),
    "n_commits": table.current_version(),
    "epoch_addbatch_sec": epoch_secs,
    "spin_canary_sec": [c0, c1],
}}))
spark.stop()
"""


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_segments = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    modes = (sys.argv[3].split(",") if len(sys.argv) > 3
             else ["cow", "delta"])
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    buckets = 64
    work = tempfile.mkdtemp(prefix="bench_stream_")
    log_dir = os.path.join(work, "log")
    warmup_log = os.path.join(work, "warmup_log")
    try:
        from clinical_trials_etl_spark.datagen.changelog import (
            LogSpec,
            write_changelog_segments,
        )
        from clinical_trials_etl_spark.session import get_spark

        print(f"generating {n_events} events / {n_segments} segments ...",
              file=sys.stderr)
        spark = get_spark("stream-gen", cores=32)
        spec = LogSpec(
            n_events=n_events,
            n_hosts=max(100, n_events // 500),
            paths_per_host=400,
            seed=42,
            html_pad_blocks=80,  # ~2 KB body; same regime as bench_scaling
        )
        write_changelog_segments(spark, spec, log_dir,
                                 n_segments=n_segments,
                                 files_per_segment=32)
        write_changelog_segments(
            spark,
            LogSpec(n_events=20_000, n_hosts=500, paths_per_host=50,
                    seed=9, html_pad_blocks=80),
            warmup_log, n_segments=1, files_per_segment=32,
        )
        spark.stop()

        results = {}
        # one file-group per trigger => n_segments micro-batches
        fpt = 32
        for mode in modes:
            print(f"streaming leg: {mode} ...", file=sys.stderr)
            code = _LEG_SNIPPET.format(
                repo=REPO, cores=cores, work=work, log_dir=log_dir,
                warmup_log=warmup_log, mode=mode, buckets=buckets,
                n_events=n_events, files_per_trigger=fpt,
            )
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, text=True,
                                 timeout=14400)
            for line in out.stdout.splitlines():
                if line.startswith("RESULT "):
                    results[mode] = json.loads(line[len("RESULT "):])
                    break
            else:
                raise RuntimeError(
                    f"{mode} leg produced no RESULT:\n{out.stdout[-2000:]}"
                    f"\n{out.stderr[-2000:]}"
                )

        summary = {
            "n_events": n_events,
            "n_segments": n_segments,
            "cores": cores,
            **{f"{m}_{k}": v for m, r in results.items()
               for k, v in r.items() if k != "mode"},
        }
        if "cow" in results and "delta" in results:
            assert (results["cow"]["final_rows"]
                    == results["delta"]["final_rows"])
            summary["delta_vs_cow_speedup"] = round(
                results["cow"]["wall_sec"] / results["delta"]["wall_sec"], 2)
            summary["write_amplification_ratio"] = round(
                results["cow"]["bytes_written"]
                / max(results["delta"]["bytes_written"], 1), 2)
        print(json.dumps(summary))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
