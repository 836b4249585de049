"""Envelope topic end-to-end throughput — producer + both consumers.

The CDC fan-out path (lake -> Debezium-style JSONL windows -> replica)
measured as a pipeline: a source table ingests a WAL, publishes the
topic window-per-batch on the way, then two fresh replica sites
consume the SAME topic — the window poller (``apply_envelopes``) and
the Structured Streaming tail (``run_envelope_stream``) — each timed
end-to-end and asserted live-state-identical to the source.

Reported per leg: wall seconds and events/sec over the WAL event
count (the honest denominator — it includes superseded duplicates the
pipeline must absorb, same denominator as the main CDC bench).

Run:  python BENCH/exp_envelope.py [--events 200000] [--cores 16]
Emits one JSON line; archive as BENCH/envelope_run_r5*.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clinical_trials_etl_spark.cdc.envelope import (  # noqa: E402
    apply_envelopes,
    export_changes_envelope,
    run_envelope_stream,
)
from clinical_trials_etl_spark.cdc.replay import (  # noqa: E402
    create_pages_table,
    replay,
)
from clinical_trials_etl_spark.datagen.changelog import (  # noqa: E402
    LogSpec,
    write_changelog_segments,
)
from clinical_trials_etl_spark.session import get_spark  # noqa: E402


def _live(t):
    return {r["url"]: r["text"] for r in t.read().collect()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=200_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--segments", type=int, default=8)
    args = ap.parse_args()
    spark = get_spark(cores=args.cores)
    work = tempfile.mkdtemp(prefix="exp-envelope-")

    log = f"{work}/log"
    # single schema version: this harness measures THROUGHPUT; the
    # mid-topic evolution contract is pinned functionally in
    # tests/test_change_feed.py (a ramped topic correctly makes the
    # fixed-schema streaming leg refuse, which is not a perf number)
    write_changelog_segments(
        spark, LogSpec(n_events=args.events, n_hosts=200,
                       paths_per_host=max(200, args.events // 200),
                       seed=7, n_schema_versions=1),
        log, n_segments=args.segments)

    # producer: one replay batch per segment, publishing the topic
    # window after each batch — the run_stream publish cadence
    src_root = f"{work}/src"
    env = f"{work}/env"
    t0 = time.monotonic()
    src = replay(spark, log, src_root, segments_per_batch=1,
                 n_buckets=32)
    produce_s = time.monotonic() - t0
    t0 = time.monotonic()
    n_windows = 0
    last = 0
    for v in range(1, src.current_version() + 1):
        export_changes_envelope(
            src, f"{env}/window-{last:08d}-{v:08d}", last, v)
        last = v
        n_windows += 1
    publish_s = time.monotonic() - t0

    # consumer leg 1: window poller
    rep1 = create_pages_table(spark, f"{work}/rep1", n_buckets=32)
    t0 = time.monotonic()
    apply_envelopes(rep1, env)
    poll_s = time.monotonic() - t0
    assert _live(rep1) == _live(src), "poller replica diverged"

    # consumer leg 2: streaming tail
    rep2 = create_pages_table(spark, f"{work}/rep2", n_buckets=32)
    t0 = time.monotonic()
    run_envelope_stream(spark, env, rep2, f"{work}/ckpt",
                        max_files_per_trigger=64)
    stream_s = time.monotonic() - t0
    assert _live(rep2) == _live(src), "streaming replica diverged"

    out = {
        "metric": "envelope_pipeline_throughput",
        "events": args.events,
        "cores": args.cores,
        "windows": n_windows,
        "produce_s": round(produce_s, 2),
        "publish_s": round(publish_s, 2),
        "poll_consume_s": round(poll_s, 2),
        "poll_events_per_sec": round(args.events / poll_s, 1),
        "stream_consume_s": round(stream_s, 2),
        "stream_events_per_sec": round(args.events / stream_s, 1),
        "source_rows": src.read().count(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
