"""Point-lookup cost on a layer-accreting delta table: manifest key
blooms vs min/max-stats-only.

The scenario blooms exist for: a streaming table between compactions,
whose buckets each hold one base file plus many delta layers. The
min/max skipping rule must read EVERY layered file (a range-skipped
delta could hide a key's max-LSN winner), so a lookup's planned file
count grows with commits-since-compaction. A bloom miss is key-exact,
so bloom skipping holds the planned count at O(files-holding-the-key).

Run: python BENCH/exp_bloom.py   (writes bloom_run_*.json next to it)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clinical_trials_etl_spark.lake.table import LakeTable  # noqa: E402
from clinical_trials_etl_spark.session import get_spark  # noqa: E402

FIELDS = [
    {"id": 1, "name": "url", "type": "string"},
    {"id": 2, "name": "val", "type": "string"},
]
N_COMMITS = 30
ROWS_PER_COMMIT = 500
N_BUCKETS = 4
PROBE_KEYS = 24


def build(spark, root, key_bloom_bits):
    t = LakeTable.create(spark, root, FIELDS, "url",
                         n_buckets=N_BUCKETS,
                         key_bloom_bits=key_bloom_bits)
    for i in range(N_COMMITS):
        rows = [(f"u{i}-{k}", f"v{i}", i * ROWS_PER_COMMIT + k, "I")
                for k in range(ROWS_PER_COMMIT)]
        t.merge(
            spark.createDataFrame(
                rows, "url string, val string, lsn long, op string"),
            batch_id=f"e-{i}", mode="delta")
    return t


def probe(t, label):
    keys = [f"u{i}-{7 * i % ROWS_PER_COMMIT}"
            for i in range(0, N_COMMITS, max(1, N_COMMITS // PROBE_KEYS))]
    # warmup one lookup (JVM/codegen)
    t.lookup(keys[0]).collect()
    files_planned, t0 = 0, time.time()
    for k in keys:
        df = t.lookup(k)
        rows = df.collect()
        assert len(rows) == 1, (label, k, rows)
        files_planned += len(set(df.inputFiles()))
    wall = time.time() - t0
    return {
        "label": label,
        "lookups": len(keys),
        "total_files_in_table": len(t.files()),
        "avg_files_planned": round(files_planned / len(keys), 2),
        "avg_lookup_sec": round(wall / len(keys), 4),
    }


def main():
    import tempfile

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    work = tempfile.mkdtemp(prefix="bloom_bench_")
    out = {"n_commits": N_COMMITS, "rows_per_commit": ROWS_PER_COMMIT,
           "n_buckets": N_BUCKETS, "legs": []}
    for bits, label in [(None, "stats_only"), (8192, "key_bloom_8192")]:
        t = build(spark, os.path.join(work, label), bits)
        out["legs"].append(probe(t, label))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bloom_run_r4.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
