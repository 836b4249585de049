"""COUNT DISTINCT view maintenance cost evidence (cdc/ivm.py).

The metric is distinct pages (urls) per language over a replayed pages
table — a realistic crawler rollup whose multiset state is as large as
the table (the honest worst case for the exact view) and whose group
count is tiny (the honest worst case for the approx view's
delete-recompute, since one flagged group is a whole language).

Per base size, times:

- exact_refresh_mixed  : exact multiset view advanced over a mixed
                         insert/update/delete window (4k events) —
                         pure counting, O(changes) regardless of which
                         occurrence of a value was deleted
- approx_refresh_insert: HLL view advanced over an INSERT-ONLY window
                         (fresh urls) — the sketch-union fast path,
                         O(changes)
- approx_refresh_mixed : HLL view advanced over the mixed window —
                         retractions flag groups, each flagged group
                         recomputes its sketch from a (group,value)-
                         pruned read: O(flagged groups' rows), which
                         with language-coarse groups approaches a
                         column-pruned scan — reported honestly
- distinct_recompute   : COUNT(DISTINCT url) BY language from the
                         base table — the no-IVM consumer's poll

Claims under test: exact_refresh and approx_refresh_insert track the
BATCH size while distinct_recompute tracks the TABLE size (ratios must
widen with the base); the exact view equals recompute exactly at every
point; the approx estimate stays within HLL error of exact.

Usage: python BENCH/exp_distinct_ivm.py [--cores 16] [--bases 200000,800000]
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
    create_distinct_view,
    read_agg_view,
    read_distinct_view,
    refresh_agg_view,
)
from clinical_trials_etl_spark.cdc.replay import replay  # noqa: E402
from clinical_trials_etl_spark.datagen.changelog import (  # noqa: E402
    LogSpec,
    write_changelog_segments,
)

INC_EVENTS = 4_000


def _fresh_insert_batch(spark, n: int, lsn0: int):
    """n guaranteed-new keys (their host namespace never collides with
    the generator's host<id> urls), so the feed window is pure inserts."""
    return spark.range(n).select(
        F.concat(F.lit("https://fresh.example/p"), F.col("id"))
        .alias("url"),
        F.lit("2025-06-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.lit(b"<html><body>x</body></html>").alias("html"),
        F.lit("x").alias("text"),
        F.lit("en").alias("language"),
        F.lit(200).cast("long").alias("fetch_status"),
        (F.lit(lsn0) + F.col("id")).alias("lsn"),
        F.lit("I").alias("op"),
    )


def one_leg(spark, base_events: int) -> dict:
    work = tempfile.mkdtemp(prefix=f"dv_{base_events}_")
    spec = LogSpec(n_events=base_events,
                   n_hosts=max(50, base_events // 200), seed=11)
    write_changelog_segments(spark, spec, f"{work}/base", n_segments=8)
    inc_spec = LogSpec(n_events=INC_EVENTS,
                       n_hosts=max(50, base_events // 200), seed=11,
                       lsn_offset=base_events * 4)
    write_changelog_segments(spark, inc_spec, f"{work}/inc",
                             n_segments=1)

    table = replay(spark, f"{work}/base", f"{work}/table",
                   segments_per_batch=2, batch_prefix="base",
                   merge_mode="delta")

    exact = create_distinct_view(spark, table, f"{work}/vx",
                                 ["language"], "url", "nd_pages")
    refresh_agg_view(table, exact)
    approx = create_agg_view(
        spark, table, f"{work}/va", ["language"],
        [("count", None, "n"), ("approx_distinct", "url", "nd_pages")])
    refresh_agg_view(table, approx)

    # --- insert-only window: the HLL union fast path
    table.merge(_fresh_insert_batch(spark, INC_EVENTS,
                                    base_events * 8),
                batch_id="insonly-1", mode="delta")
    t0 = time.monotonic()
    refresh_agg_view(table, approx)
    t_approx_ins = time.monotonic() - t0
    t0 = time.monotonic()
    refresh_agg_view(table, exact)
    t_exact_ins = time.monotonic() - t0

    # --- mixed window: updates/deletes force the approx recompute
    replay(spark, f"{work}/inc", f"{work}/table",
           batch_prefix="inc", merge_mode="delta", segments_per_batch=1)
    t0 = time.monotonic()
    refresh_agg_view(table, approx)
    t_approx_mix = time.monotonic() - t0
    t0 = time.monotonic()
    refresh_agg_view(table, exact)
    t_exact_mix = time.monotonic() - t0

    t0 = time.monotonic()
    rec = {r["language"]: (r["nd"], r["sk"]) for r in
           table.read(columns=["language", "url"])
           .groupBy("language")
           .agg(F.count_distinct("url").alias("nd"),
                F.hll_sketch_estimate(F.hll_sketch_agg("url"))
                .alias("sk")).collect()}
    t_recompute = time.monotonic() - t0
    recomputed = {k: v[0] for k, v in rec.items()}
    fresh_sketch = {k: v[1] for k, v in rec.items()}

    got_exact = {r["language"]: r["nd_pages"]
                 for r in read_distinct_view(exact).collect()}
    assert got_exact == recomputed, "exact view diverged from recompute"
    got_approx = {r["language"]: r["nd_pages"]
                  for r in read_agg_view(approx).collect()}
    assert got_approx.keys() == recomputed.keys()
    # the claim maintenance must answer for: the MAINTAINED sketch is
    # as accurate as a FRESH single-shot sketch over the same data —
    # incremental unions add no error of their own (vs-exact error is
    # the sketch's, ~1.6% sigma at the default lgK=12; reported, not
    # asserted — measured +-2.3% per group at 200k, symmetric signs)
    max_drift = max(
        abs(got_approx[k] - fresh_sketch[k]) / max(fresh_sketch[k], 1)
        for k in recomputed)
    assert max_drift < 0.01, f"maintained sketch drifted {max_drift:.3f}"
    max_err = max(
        abs(got_approx[k] - recomputed[k]) / max(recomputed[k], 1)
        for k in recomputed)

    table_rows = table.read().count()
    return {
        "base_events": base_events,
        "inc_events": INC_EVENTS,
        "table_rows": table_rows,
        "n_groups": len(recomputed),
        "exact_refresh_insert_sec": round(t_exact_ins, 3),
        "exact_refresh_mixed_sec": round(t_exact_mix, 3),
        "approx_refresh_insert_sec": round(t_approx_ins, 3),
        "approx_refresh_mixed_sec": round(t_approx_mix, 3),
        "distinct_recompute_sec": round(t_recompute, 3),
        "hll_max_rel_err": round(max_err, 4),
        "maintained_vs_fresh_sketch_drift": round(max_drift, 4),
        "recompute_over_exact_mixed": round(t_recompute / t_exact_mix, 2),
        "recompute_over_approx_insert": round(
            t_recompute / t_approx_ins, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--bases", default="200000,800000")
    args = ap.parse_args()
    spark = get_spark(cores=args.cores)
    legs = [one_leg(spark, int(b)) for b in args.bases.split(",")]
    print(json.dumps({"cores": args.cores, "legs": legs}))


if __name__ == "__main__":
    main()
