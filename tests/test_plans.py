"""Physical-plan shape assertions — the 100 TB guardrails. These pin
the plans that correctness tests can't see: no global single-partition
sort in pagination, broadcast joins for dims, single Arrow UDF
evaluation for multi-field extraction, pushed-down parquet filters."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinical_trials_etl_spark.operators import analytics as A
from clinical_trials_etl_spark.operators import htmlqueries as HQ


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_p7_pagination_has_no_global_window_sort(spark, sf_dir):
    plan = _plan(A.q_p7_pagination(spark, sf_dir))
    assert "Window" not in plan, "global row_number window is back"
    assert "TakeOrderedAndProject" in plan


def test_j4_dims_are_broadcast(spark, sf_dir):
    plan = _plan(A.q_j4_revenue_by_nation(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_dim_broadcast_gates_on_size(spark, sf_dir):
    """The customer/part/supplier hints are size-conditional
    (VERDICT r4 #3): hinted while Catalyst's estimate fits under
    autoBroadcastJoinThreshold, returned UNhinted above it so the
    planner degrades to a shuffle join instead of OOMing the driver
    at 100× scale. Tiny dims (nation/region/bands) keep the plain
    unconditional F.broadcast at their call sites."""
    from clinical_trials_etl_spark.operators.common import dim_broadcast

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    try:
        assert dim_broadcast(c) is not c   # sandbox scale: hinted
        spark.conf.set(key, "1024")        # pretend customer is huge
        assert dim_broadcast(c) is c       # degrades: planner decides
        # plan-level, both ways: at the forced-low threshold only the
        # unconditionally-hinted tiny dims (nation, region) broadcast;
        # customer joins via shuffle
        plan = _plan(A.q_j4_revenue_by_nation(spark, sf_dir))
        assert plan.count("BroadcastHashJoin") == 2
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        spark.conf.set(key, "-1")          # broadcast disabled outright
        assert dim_broadcast(c) is c
    finally:
        spark.conf.set(key, old)
    plan = _plan(A.q_j4_revenue_by_nation(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 3  # c, n, r all broadcast


def test_multi_field_extractor_evaluates_udf_once(spark, sf_dir):
    df = HQ.q_html_selector_fields(spark, sf_dir)
    plan = _plan(df)
    assert plan.count("ArrowEvalPython") == 1


def test_parquet_filter_pushdown(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderkey") == 42)
        .select("o_orderkey", "o_totalprice")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]" in plan
    # column pruning reaches the scan
    assert "o_comment" not in plan


def test_cow_apply_hands_merge_an_unshuffled_source(spark, tmp_path):
    """Single-shuffle COW guardrail: apply_batch (cow, unsalted) must
    NOT pre-shuffle the batch — max-LSN dedup folds into the merge's
    winner aggregation, so the source handed to merge() carries no
    Exchange and no Arrow kernel, and the extraction arrives as the
    post-winner ``fill`` hook instead."""
    from clinical_trials_etl_spark.cdc import apply as apply_mod
    from clinical_trials_etl_spark.cdc.replay import create_pages_table
    from clinical_trials_etl_spark.datagen.changelog import (
        LogSpec,
        changelog_df,
    )
    from clinical_trials_etl_spark.lake.table import LakeTable

    table = create_pages_table(spark, str(tmp_path / "t"), n_buckets=4)
    batch = changelog_df(spark, LogSpec(n_events=50, n_hosts=5, seed=7))

    seen = {}
    real_merge = LakeTable.merge

    def spy(self, source, **kw):
        seen["plan"] = source._jdf.queryExecution().executedPlan().toString()
        seen["fill"] = kw.get("fill")
        return real_merge(self, source, **kw)

    LakeTable.merge = spy
    try:
        apply_mod.apply_batch(table, batch, "plan-gate", n_salt=1,
                              merge_mode="cow")
    finally:
        LakeTable.merge = real_merge

    assert "Exchange" not in seen["plan"], "batch pre-shuffle is back"
    assert "ArrowEvalPython" not in seen["plan"], (
        "extraction must run post-winner, not on the raw batch"
    )
    assert seen["fill"] is apply_mod.fill_text_post_winner


def test_asof_join_is_windowed_not_nested_loop(spark, sf_dir):
    from clinical_trials_etl_spark.operators import events_ops as E

    plan = _plan(E.q_j5_asof_last_click(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan, (
        "as-of must be the windowed carry-forward, not an inequality join"
    )
    assert "Window" in plan
    assert plan.count("Exchange") <= 2  # one shuffle by user + output sort


def test_range_join_broadcasts_the_band_dimension(spark, sf_dir):
    from clinical_trials_etl_spark.operators import events_ops as E

    plan = _plan(E.q_j6_value_band_rollup(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan  # 5-row dim: the wanted plan


def test_fill_kernel_parses_only_needy_rows(spark):
    """The extraction kernel must PARSE only rows that need text.
    Spark evaluates a Python UDF unconditionally (ArrowEvalPython) even
    under CASE WHEN, and a split-filter-union duplicates the kernel's
    child plan — so the mask lives inside the pandas kernel
    (fill_text_udf). Gate both halves: (a) unit-level, the parser runs
    exactly once per null-text live row; (b) plan-level, the fill stays
    single-branch (one ArrowEvalPython, no Union — the child plan is
    not duplicated)."""
    import pandas as pd

    from clinical_trials_etl_spark.functions import html_extract as hx
    from clinical_trials_etl_spark.cdc.apply import fill_text_post_winner
    from clinical_trials_etl_spark.lake.table import SYS_DELETED, SYS_LSN

    # (a) the pandas function itself, with a counting parser
    calls = []
    real = hx._extract_text_one

    def counting(payload):
        calls.append(payload)
        return real(payload)

    hx._extract_text_one = counting
    try:
        out = hx.fill_text_udf.func(
            pd.Series([b"<p>a</p>", b"<p>b</p>", b"<p>c</p>"]),
            pd.Series([None, "kept", None]),
            pd.Series([False, False, True]),
        )
    finally:
        hx._extract_text_one = real
    assert list(out) == ["a", "kept", None]
    assert len(calls) == 1, "kernel must parse only null-text live rows"

    # (b) single-branch plan
    df = spark.createDataFrame(
        [("a", b"<p>x</p>", None, 1, False)],
        f"url string, html binary, text string, {SYS_LSN} long, "
        f"{SYS_DELETED} boolean",
    )
    plan = _plan(fill_text_post_winner(df))
    assert plan.count("ArrowEvalPython") == 1
    assert "Union" not in plan, "fill must not duplicate its child plan"


def test_cow_broadcast_plan_keeps_target_out_of_winner_exchange(
    spark, tmp_path
):
    """Above the size threshold the COW merge must decide winners via
    broadcast joins: the only hashpartitioning exchanges in the commit
    plan are batch-sized (dedup) plus the final write clustering — the
    full-width target must NOT feed a winner aggregation exchange."""
    from pyspark.sql import functions as F

    from clinical_trials_etl_spark.cdc import apply as apply_mod
    from clinical_trials_etl_spark.cdc.replay import create_pages_table
    from clinical_trials_etl_spark.datagen.changelog import (
        LogSpec,
        changelog_df,
    )
    from clinical_trials_etl_spark.lake.table import LakeTable

    table = create_pages_table(spark, str(tmp_path / "t"), n_buckets=4)
    base = changelog_df(spark, LogSpec(n_events=60, n_hosts=5, seed=7))
    apply_mod.apply_batch(table, base, "seed", n_salt=1, merge_mode="cow")

    batch = changelog_df(
        spark, LogSpec(n_events=40, n_hosts=5, seed=8, lsn_offset=60)
    )
    snap = table.snapshot()
    key = table.key_field(snap)
    from clinical_trials_etl_spark.lake.table import SYS_BUCKET, SYS_DELETED, SYS_LSN

    src = apply_mod.normalize_batch(batch, table.fields(snap)).select(
        *[f["name"] for f in table.fields(snap)],
        F.col("lsn").cast("long").alias(SYS_LSN),
        (F.col("op") == "D").alias(SYS_DELETED),
    ).withColumn(SYS_BUCKET, table.bucket_expr(F.col(key)))

    old = LakeTable.COW_BROADCAST_BYTES
    LakeTable.COW_BROADCAST_BYTES = 0  # force the broadcast plan
    try:
        merged = table._cow_merged(
            snap, src, key, set(range(4)), apply_mod.fill_text_post_winner
        )
    finally:
        LakeTable.COW_BROADCAST_BYTES = old
    plan = _plan(merged)
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "max_by" in plan  # the batch-side dedup
    # The winner decision must NOT be an aggregation over
    # union(target, batch) — in the broadcast plan the Union is the
    # plan ROOT (keep_target U keep_batch) and every aggregation sits
    # on the batch side below it. The old shape (Aggregate over Union)
    # put the full-width target through a table-sized exchange + sort.
    lp = merged._jdf.queryExecution().optimizedPlan().toString()
    lines = [ln for ln in lp.splitlines() if ln.strip()]
    root_zone = "\n".join(lines[:2])
    assert "Union" in root_zone, f"Union must be the plan root:\n{lp}"
    first_agg = next(
        (i for i, ln in enumerate(lines) if "Aggregate" in ln), None)
    first_union = next(
        (i for i, ln in enumerate(lines) if "Union" in ln))
    assert first_agg is None or first_agg > first_union, (
        "winner aggregation above the Union — target is being "
        f"aggregated again:\n{lp}"
    )


def test_mor_read_columns_prunes_the_parquet_scan(spark, tmp_path):
    """Column pruning through merge-on-read reconciliation: Catalyst
    cannot prune through the winner aggregation's payload struct, so
    read(columns=...) must push the projection to _read_files itself —
    the scan of a delta-layered table asked for one field must read
    that field + system cols only, never the html blobs."""
    import re

    from clinical_trials_etl_spark.cdc.replay import replay
    from clinical_trials_etl_spark.datagen.changelog import (
        LogSpec,
        write_changelog_segments,
    )

    log = str(tmp_path / "wal")
    write_changelog_segments(
        spark, LogSpec(n_events=400, n_hosts=6, seed=9), log, n_segments=2
    )
    table = replay(spark, log, str(tmp_path / "tbl"), merge_mode="delta")

    schemas = re.findall(r"ReadSchema: (\S+)",
                         _plan(table.read(columns=["url"])))
    assert schemas, "no parquet scan in plan"
    for s in schemas:
        assert "binary" not in s and "f_3" not in s, s  # html never read
        assert "f_1:string" in s  # url
    # ... while the unhinted path documents the limitation (full width)
    full = re.findall(r"ReadSchema: (\S+)",
                      _plan(table.read().select("url")))
    assert any("binary" in s for s in full)

    # value identity with the unpruned path, both shapes
    a = sorted(tuple(r) for r in table.read(columns=["url", "language"]).collect())
    b = sorted(tuple(r) for r in table.read().select("url", "language").collect())
    assert a == b and a
