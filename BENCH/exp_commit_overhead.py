"""Per-commit metadata overhead A/B (VERDICT r4 #6): replay the same
seeded change log with the round-4 commit-path features individually
toggled, on one quiet window, and report the cost of each:

- base        : shipped defaults (manifest min/max stats ON, blooms OFF)
- no_stats    : footer STATS stripped (row counts kept — they come from
                the same footer read and are needed regardless)
- blooms      : per-file key blooms ON (key_bloom_bits=2048) — the one
                feature that adds a real Spark job per commit
- The lsn-range lineage is not toggled: it rides the batch's single
  pre-existing metadata aggregation (cdc/apply.py:268-281), zero extra
  jobs by construction.

Each leg replays the identical log into a fresh table; canary readings
bracket each leg so contention is visible in the archive. Output: one
JSON line.

Run: python BENCH/exp_commit_overhead.py [--events 200000] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from bench import spin_canary  # noqa: E402
from clinical_trials_etl_spark.session import get_spark  # noqa: E402
from clinical_trials_etl_spark.cdc.replay import replay  # noqa: E402
from clinical_trials_etl_spark.datagen.changelog import (  # noqa: E402
    LogSpec,
    write_changelog_segments,
)
from clinical_trials_etl_spark.lake import table as table_mod  # noqa: E402


def one_leg(spark, log_dir: str, n_events: int, variant: str) -> dict:
    work = tempfile.mkdtemp(prefix=f"ovh_{variant}_")
    real_footer = table_mod._parquet_footer

    def footer_no_stats(path, stat_cols):
        n_rows, _stats = real_footer(path, set())
        return n_rows, {}

    if variant == "no_stats":
        table_mod._parquet_footer = footer_no_stats
    kwargs = {}
    if variant == "blooms":
        kwargs["key_bloom_bits"] = 2048
    c0 = spin_canary()
    try:
        t0 = time.perf_counter()
        table = replay(spark, log_dir, f"{work}/table",
                       segments_per_batch=1, **kwargs)
        wall = time.perf_counter() - t0
    finally:
        table_mod._parquet_footer = real_footer
    rows = table.read().count()
    return {
        "variant": variant,
        "wall_sec": round(wall, 2),
        "events_per_sec": round(n_events / wall),
        "final_rows": rows,
        "canary_before": c0,
        "canary_after": spin_canary(),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=200_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()
    spark = get_spark(cores=args.cores)
    work = tempfile.mkdtemp(prefix="ovh_log_")
    spec = LogSpec(n_events=args.events,
                   n_hosts=max(50, args.events // 200),
                   paths_per_host=200, seed=42)
    write_changelog_segments(spark, spec, f"{work}/log", n_segments=8)
    # JVM/python-worker warmup leg (not reported)
    one_leg(spark, f"{work}/log", args.events, "base")
    legs = [one_leg(spark, f"{work}/log", args.events, v)
            for v in ("base", "no_stats", "blooms", "base")]
    rows = {legs[0]["final_rows"]} | {l["final_rows"] for l in legs}
    assert len(rows) == 1, f"variants diverged: {rows}"
    base = min(l["wall_sec"] for l in legs if l["variant"] == "base")
    for l in legs:
        l["vs_base_pct"] = round(100 * (l["wall_sec"] - base) / base, 1)
    print(json.dumps({"events": args.events, "cores": args.cores,
                      "legs": legs}))


if __name__ == "__main__":
    main()
