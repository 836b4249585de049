"""Envelope topic log compaction — late-joiner replay cost, measured.

The claim compaction makes: a late joiner replaying a churned topic
should pay O(live keys), not O(events). Setup: a source table applies
a high-churn WAL (many updates per key) as N micro-batches, publishing
an envelope window per batch. Two fresh replica sites then consume:

- ``full``:      the original N-window topic (O(events) lines);
- ``compacted``: the same topic after ``compact_envelope_windows``
                 (one window, one winning envelope per key).

Reported per leg: topic line count, window count, wall seconds of
``apply_envelopes`` into a fresh replica, and the states asserted
identical to the source. The honest caveat travels with the numbers:
the window poller already folds ALL pending windows into one merge
(``windows_per_commit=None``), so the consumer-side win is line
volume + read/parse cost, not per-window commit overhead — the
dominant term as churn (events per live key) grows.

Run:  python BENCH/exp_topic_compact.py [--events 200000] [--cores 16]
Emits one JSON line; archive as BENCH/topic_compact_r5*.json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clinical_trials_etl_spark.cdc.envelope import (  # noqa: E402
    apply_envelopes,
    compact_envelope_windows,
    publish_envelope_window,
)
from clinical_trials_etl_spark.cdc.replay import (  # noqa: E402
    create_pages_table,
    replay,
)
from clinical_trials_etl_spark.datagen.changelog import (  # noqa: E402
    LogSpec,
    write_changelog_segments,
)
from clinical_trials_etl_spark.lake.table import LakeTable  # noqa: E402
from clinical_trials_etl_spark.session import get_spark  # noqa: E402


def _live(t):
    return {r["url"]: r["text"] for r in t.read().collect()}


def _topic_stats(env):
    lines = 0
    for part in glob.glob(os.path.join(env, "window-*", "part-*")):
        with open(part) as f:
            lines += sum(1 for _ in f)
    windows = len([d for d in os.listdir(env) if d.startswith("window-")])
    return lines, windows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=200_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--segments", type=int, default=16)
    args = ap.parse_args()

    spark = get_spark(cores=args.cores,
                      shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="topic_compact_")

    # high churn: few hosts/paths so each key is rewritten many times
    spec = LogSpec(n_events=args.events, n_hosts=40, paths_per_host=60,
                   seed=11)
    write_changelog_segments(spark, spec, f"{work}/log",
                             n_segments=args.segments)

    # ingest batch-per-segment, publishing a window per commit
    from clinical_trials_etl_spark.cdc.apply import apply_batch
    from clinical_trials_etl_spark.cdc.registry import PAGES_REGISTRY
    from clinical_trials_etl_spark.cdc.replay import (
        TRANSPORT_SCHEMA,
        list_segments,
    )

    src = create_pages_table(spark, f"{work}/src", 32)
    env = f"{work}/env"
    for i, seg in enumerate(list_segments(f"{work}/log")):
        batch = (spark.read.schema(TRANSPORT_SCHEMA)
                 .option("basePath", f"{work}/log").parquet(seg))
        apply_batch(src, batch, batch_id=f"replay-{i}",
                    registry=PAGES_REGISTRY, merge_mode="delta")
        publish_envelope_window(src, env)
    want = _live(src)

    out = {"events": args.events, "cores": args.cores,
           "live_keys": len(want)}

    legs = {}
    full_lines, full_windows = _topic_stats(env)
    t0 = time.time()
    rep = LakeTable.create(spark, f"{work}/rep_full", src.fields(),
                           src.key_field(), n_buckets=32)
    apply_envelopes(rep, env)
    full_s = time.time() - t0
    assert _live(rep) == want
    legs["full"] = {"lines": full_lines, "windows": full_windows,
                    "apply_s": round(full_s, 2)}

    t0 = time.time()
    cstats = compact_envelope_windows(src, env)
    compact_s = time.time() - t0
    c_lines, c_windows = _topic_stats(env)
    t0 = time.time()
    rep2 = LakeTable.create(spark, f"{work}/rep_compact", src.fields(),
                            src.key_field(), n_buckets=32)
    apply_envelopes(rep2, env)
    c_s = time.time() - t0
    assert _live(rep2) == want
    legs["compacted"] = {"lines": c_lines, "windows": c_windows,
                         "apply_s": round(c_s, 2),
                         "compact_s": round(compact_s, 2),
                         **cstats}

    out["legs"] = legs
    out["line_ratio"] = round(full_lines / max(c_lines, 1), 2)
    out["apply_speedup"] = round(full_s / max(c_s, 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
