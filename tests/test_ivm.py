"""Incremental view maintenance tests (cdc/ivm.py): a materialized
group-by aggregate maintained from the signed pre/post-image feed must
equal a full recompute from the base table after every refresh — under
updates that migrate rows between groups, deletes that empty groups,
null group values, all-null SUM groups, multi-commit windows folded in
one refresh, maintenance commits, and redelivered refreshes.

Reference analog: the reference recomputes its analytics aggregates by
re-scanning full collections each poll
(trials_extractor/storage/mongodb_storage.py:154-245) — SURVEY.md §2.9.
"""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from clinical_trials_etl_spark.cdc.ivm import (
    create_agg_view, last_refreshed, read_agg_view, refresh_agg_view)
from clinical_trials_etl_spark.lake.table import LakeTable

FIELDS = [
    {"id": 1, "name": "url", "type": "string"},
    {"id": 2, "name": "host", "type": "string"},
    {"id": 3, "name": "score", "type": "long"},
]

AGGS = [("count", None, "n_pages"),
        ("sum", "score", "sum_score"),
        ("avg", "score", "avg_score"),
        ("count_col", "score", "n_scored"),
        ("min", "score", "min_score"),
        ("max", "score", "max_score"),
        # HLL is exact at these cardinalities (<=100 distinct), so the
        # sketch estimate must equal COUNT(DISTINCT) in every sweep
        ("approx_distinct", "score", "nd_score")]


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, host string, score long, lsn long, op string")


def _recompute(table):
    return {r["host"]: r.asDict() for r in
            table.read().groupBy("host").agg(
                F.count("*").alias("n_pages"),
                F.sum("score").alias("sum_score"),
                F.avg("score").alias("avg_score"),
                F.count("score").alias("n_scored"),
                F.min("score").alias("min_score"),
                F.max("score").alias("max_score"),
                F.count_distinct("score").alias("nd_score")).collect()}


def _view_state(view):
    return {r["host"]: r.asDict() for r in read_agg_view(view).collect()}


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "t"), FIELDS, "url",
                            n_buckets=4)


def test_refresh_matches_recompute_through_hostile_history(
        spark, tmp_path, table):
    view = create_agg_view(spark, table, str(tmp_path / "v"),
                           ["host"], AGGS)
    steps = [
        # bootstrap: plain inserts, one all-null-score group
        ([("u1", "a", 10, 1, "I"), ("u2", "a", 20, 2, "I"),
          ("u3", "b", None, 3, "I")], "cow"),
        # group migration (u2 a->b) + delete emptying nothing yet
        ([("u2", "b", 25, 10, "U"), ("u1", None, None, 11, "D")], "cow"),
        # delta commit emptying group b entirely
        ([("u3", None, None, 20, "D"), ("u2", None, None, 21, "D")],
         "delta"),
        # new group + null group value
        ([("u4", "c", 7, 22, "I"), ("u5", None, 3, 23, "I")], "cow"),
    ]
    for i, (rows, mode) in enumerate(steps):
        table.merge(_batch(spark, rows), batch_id=f"e-{i}", mode=mode)
        refresh_agg_view(table, view)
        assert _view_state(view) == _recompute(table), f"step {i}"
    # emptied group b is gone from reads, not a zero row
    assert "b" not in _view_state(view)


def test_multi_commit_window_telescopes_in_one_refresh(
        spark, tmp_path, table):
    """A view refreshed once over four commits must equal a view
    refreshed after each — the pre-image telescoping property."""
    eager = create_agg_view(spark, table, str(tmp_path / "v1"),
                            ["host"], AGGS)
    lazy_root = str(tmp_path / "v2")
    steps = [
        [("u1", "a", 1, 1, "I"), ("u2", "b", 2, 2, "I")],
        [("u1", "a", 5, 10, "U"), ("u3", "b", 9, 11, "I")],
        [("u2", None, None, 20, "D")],
        [("u1", "b", 6, 30, "U")],
    ]
    for i, rows in enumerate(steps):
        table.merge(_batch(spark, rows), batch_id=f"e-{i}",
                    mode="delta" if i == 2 else "cow")
        refresh_agg_view(table, eager)
    lazy = create_agg_view(spark, table, lazy_root, ["host"], AGGS)
    refresh_agg_view(table, lazy)      # whole history in one window
    assert _view_state(lazy) == _view_state(eager) == _recompute(table)


def test_refresh_is_exactly_once(spark, tmp_path, table):
    view = create_agg_view(spark, table, str(tmp_path / "v"),
                           ["host"], AGGS)
    table.merge(_batch(spark, [("u1", "a", 10, 1, "I")]), batch_id="e-0")
    r1 = refresh_agg_view(table, view)
    assert not r1["skipped"] and r1["groups"] == 1
    # redelivered refresh for the same window: metadata no-op
    r2 = refresh_agg_view(table, view, to_version=r1["to"])
    assert r2["skipped"] or r2["to"] == r2["from"]
    assert _view_state(view) == _recompute(table)
    # partial then catch-up windows compose
    table.merge(_batch(spark, [("u2", "a", 4, 2, "I")]), batch_id="e-1")
    mid = table.current_version()
    table.merge(_batch(spark, [("u1", "b", 11, 3, "U")]), batch_id="e-2")
    refresh_agg_view(table, view, to_version=mid)
    assert last_refreshed(view) == mid
    refresh_agg_view(table, view)
    assert last_refreshed(view) == table.current_version()
    assert _view_state(view) == _recompute(table)


def test_maintenance_commits_advance_offset_without_state_change(
        spark, tmp_path, table):
    view = create_agg_view(spark, table, str(tmp_path / "v"),
                           ["host"], AGGS)
    table.merge(_batch(spark, [("u1", "a", 10, 1, "I"),
                               ("u2", "b", 5, 2, "I")]),
                batch_id="e-0", mode="delta")
    table.merge(_batch(spark, [("u1", "a", 12, 3, "U")]),
                batch_id="e-1", mode="delta")
    refresh_agg_view(table, view)
    before = _view_state(view)
    table.compact()
    table.rebucket(8)
    r = refresh_agg_view(table, view)
    assert not r["skipped"] and r["groups"] == 0
    assert last_refreshed(view) == table.current_version()
    assert _view_state(view) == before == _recompute(table)


def test_randomized_equivalence(spark, tmp_path, table):
    """Seeded random history — dup deliveries, out-of-order lsns,
    deletes, group churn, cow/delta mix, refresh every k commits —
    view equals recompute at every refresh point."""
    rng = random.Random(4242)
    view = create_agg_view(spark, table, str(tmp_path / "v"),
                           ["host"], AGGS)
    keys = [f"u{i}" for i in range(14)]
    hosts = ["a", "b", "c", None]
    lsn = 0
    for i in range(7):
        rows = []
        for _ in range(rng.randint(2, 9)):
            lsn += rng.choice([1, 1, 1, 2])
            use_lsn = lsn - rng.choice([0, 0, 0, 3])  # some stale
            k = rng.choice(keys)
            if rng.random() < 0.25:
                rows.append((k, None, None, use_lsn, "D"))
            else:
                rows.append((k, rng.choice(hosts),
                             rng.choice([None, rng.randint(0, 99)]),
                             use_lsn, "I"))
        if rng.random() < 0.3 and rows:
            rows.append(rows[0])       # duplicate delivery
        table.merge(_batch(spark, rows), batch_id=f"e-{i}",
                    mode="delta" if i % 3 == 2 else "cow")
        if i % 2 == 1 or i == 6:
            refresh_agg_view(table, view)
            assert _view_state(view) == _recompute(table), f"commit {i}"


def test_spec_validation(spark, tmp_path, table):
    with pytest.raises(ValueError, match="count"):
        create_agg_view(spark, table, str(tmp_path / "v1"), ["host"],
                        [("sum", "score", "s")])
    with pytest.raises(ValueError, match="unknown source columns"):
        create_agg_view(spark, table, str(tmp_path / "v2"), ["nope"],
                        [("count", None, "n")])
    with pytest.raises(ValueError, match="duplicate"):
        create_agg_view(spark, table, str(tmp_path / "v3"), ["host"],
                        [("count", None, "n"), ("sum", "score", "n")])
    with pytest.raises(ValueError, match="unsupported aggregate kind"):
        create_agg_view(spark, table, str(tmp_path / "v4"), ["host"],
                        [("count", None, "n"), ("median", "score", "m")])
    tb = LakeTable.create(
        spark, str(tmp_path / "tb"),
        FIELDS + [{"id": 4, "name": "html", "type": "binary"}], "url",
        n_buckets=2)
    with pytest.raises(ValueError, match="orderable"):
        create_agg_view(spark, tb, str(tmp_path / "v5"), ["host"],
                        [("count", None, "n"), ("min", "html", "m")])


def test_refresh_feed_is_column_pruned(spark, tmp_path):
    """Maintaining a per-host count/sum over a table with a wide html
    column must not move the html: the refresh's feed read passes
    columns=[group+value] down to every scan."""
    fields = FIELDS + [{"id": 4, "name": "html", "type": "binary"}]
    t = LakeTable.create(spark, str(tmp_path / "t"), fields, "url",
                         n_buckets=2)

    def b(rows):
        return spark.createDataFrame(
            rows, "url string, host string, score long, html binary, "
                  "lsn long, op string")

    t.merge(b([("u1", "a", 1, b"x" * 64, 1, "I")]), batch_id="e-0")
    t.merge(b([("u1", "a", 2, b"y" * 64, 9, "U")]), batch_id="e-1")

    feed = t.changes(0, pre_images=True, columns=["host", "score"])
    plan = feed._jdf.queryExecution().executedPlan().toString()
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert schemas
    for s in schemas:
        assert "f_4" not in s, f"html column crossed a scan: {s}"

    view = create_agg_view(spark, t, str(tmp_path / "v"), ["host"],
                           [("count", None, "n"), ("sum", "score", "s")])
    refresh_agg_view(t, view)
    assert _view_state(view)["a"] == {"host": "a", "n": 1, "s": 2}


def test_view_tracks_renamed_source_columns_by_field_id(
        spark, tmp_path, table):
    """A mid-stream rename of the group or value column must not break
    the view: the spec pins source field IDS (the same rename contract
    as cdc/mirror.py), and reads keep the view's original names."""
    view = create_agg_view(spark, table, str(tmp_path / "v"),
                           ["host"], AGGS)
    table.merge(_batch(spark, [("u1", "a", 10, 1, "I"),
                               ("u2", "b", 4, 2, "I")]), batch_id="e-0")
    refresh_agg_view(table, view)
    table.evolve([{"id": 1, "name": "url", "type": "string"},
                  {"id": 2, "name": "site", "type": "string"},
                  {"id": 3, "name": "quality", "type": "long"}],
                 note="rename host->site score->quality")
    src = spark.createDataFrame(
        [("u1", "a", 12, 9, "U"), ("u3", "c", 5, 10, "I")],
        "url string, site string, quality long, lsn long, op string")
    table.merge(src, batch_id="e-1")
    refresh_agg_view(table, view)
    got = _view_state(view)  # view keeps its creation-time names
    exp = {r["site"]: r.asDict() for r in
           table.read().groupBy("site").agg(
               F.count("*").alias("n_pages"),
               F.sum("quality").alias("sum_score"),
               F.avg("quality").alias("avg_score"),
               F.count("quality").alias("n_scored"),
               F.min("quality").alias("min_score"),
               F.max("quality").alias("max_score"),
               F.count_distinct("quality").alias("nd_score")).collect()}
    exp = {k: {"host" if kk == "site" else kk: vv
               for kk, vv in v.items()} for k, v in exp.items()}
    assert got == exp


def test_minmax_extreme_deletion_recomputes_correctly(
        spark, tmp_path, table):
    """The hybrid's hard cases, each checked against recompute:
    deleting the row that HELD the extreme (forces the group
    recompute), deleting a non-extreme row (fast path must not move
    the extreme), ties on the extreme value (conservative recompute
    must keep the surviving duplicate), and an update that moves the
    extreme-holding row's value."""
    view = create_agg_view(spark, table, str(tmp_path / "v"),
                           ["host"], AGGS)
    steps = [
        # a: {10, 20, 20}; b: {5}
        [("u1", "a", 10, 1, "I"), ("u2", "a", 20, 2, "I"),
         ("u3", "a", 20, 3, "I"), ("u4", "b", 5, 4, "I")],
        # delete the min-holder of a (10) -> recompute -> min 20
        [("u1", None, None, 10, "D")],
        # delete ONE of the tied max-holders -> max stays 20
        [("u2", None, None, 11, "D")],
        # non-extreme insert then its delete: fast path both ways
        [("u5", "a", 15, 12, "I")],
        [("u5", None, None, 13, "D")],
        # update moves the extreme-holder's value down then up
        [("u3", "a", 7, 20, "U")],
        [("u3", "a", 99, 21, "U")],
        # empty b entirely; then re-create it
        [("u4", None, None, 30, "D")],
        [("u6", "b", 42, 31, "I")],
    ]
    for i, rows in enumerate(steps):
        table.merge(_batch(spark, rows), batch_id=f"e-{i}",
                    mode="delta" if i % 2 else "cow")
        refresh_agg_view(table, view)
        assert _view_state(view) == _recompute(table), f"step {i}"


def test_minmax_string_extremes_and_multi_commit_window(
        spark, tmp_path, table):
    """MIN/MAX over a string column (url), refreshed once across a
    multi-commit window that includes an extreme deletion — the
    windowed feed path and the hybrid must compose."""
    aggs = [("count", None, "n"), ("min", "url", "first_url"),
            ("max", "url", "last_url")]
    view = create_agg_view(spark, table, str(tmp_path / "v"),
                           ["host"], aggs)
    table.merge(_batch(spark, [("a1", "x", 1, 1, "I"),
                               ("m5", "x", 2, 2, "I"),
                               ("z9", "x", 3, 3, "I")]), batch_id="e-0")
    table.merge(_batch(spark, [("a1", None, None, 10, "D")]),
                batch_id="e-1")
    table.merge(_batch(spark, [("b2", "x", 4, 11, "I")]),
                batch_id="e-2", mode="delta")
    refresh_agg_view(table, view)   # 3 commits in one window
    got = {r["host"]: r.asDict() for r in read_agg_view(view).collect()}
    exp = {r["host"]: r.asDict() for r in
           table.read().groupBy("host").agg(
               F.count("*").alias("n"),
               F.min("url").alias("first_url"),
               F.max("url").alias("last_url")).collect()}
    assert got == exp == {"x": {"host": "x", "n": 3,
                                "first_url": "b2", "last_url": "z9"}}


def test_approx_distinct_delete_edges(spark, tmp_path, table):
    """The HLL hybrid's hard cases: deleting ONE of two occurrences of
    a value must not lower the distinct count (recompute path sees the
    survivor), deleting the LAST occurrence must lower it, and an
    all-null group reads 0 (not NULL)."""
    aggs = [("count", None, "n"), ("approx_distinct", "score", "nd")]
    view = create_agg_view(spark, table, str(tmp_path / "v"),
                           ["host"], aggs)
    steps = [
        # two rows share score 10; one unique score 20; all-null group b
        [("u1", "a", 10, 1, "I"), ("u2", "a", 10, 2, "I"),
         ("u3", "a", 20, 3, "I"), ("u4", "b", None, 4, "I")],
        # delete one of the two 10s: nd stays 2
        [("u1", None, None, 10, "D")],
        # delete the last 10: nd drops to 1
        [("u2", None, None, 11, "D")],
        # update the survivor's value: retraction + insert in one window
        [("u3", "a", 30, 12, "U")],
    ]
    expected_nd = [{"a": 2, "b": 0}, {"a": 2, "b": 0},
                   {"a": 1, "b": 0}, {"a": 1, "b": 0}]
    for i, rows in enumerate(steps):
        table.merge(_batch(spark, rows), batch_id=f"e-{i}",
                    mode="delta" if i % 2 else "cow")
        refresh_agg_view(table, view)
        got = {r["host"]: r["nd"] for r in read_agg_view(view).collect()}
        assert got == expected_nd[i], f"step {i}"


def test_approx_distinct_rejects_unsketchable_type(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        FIELDS + [{"id": 4, "name": "w", "type": "double"}], "url",
        n_buckets=2)
    with pytest.raises(ValueError, match="approx_distinct"):
        create_agg_view(spark, t, str(tmp_path / "v"), ["host"],
                        [("count", None, "n"),
                         ("approx_distinct", "w", "nd")])


def test_exact_distinct_view_hostile_history(spark, tmp_path, table):
    """create_distinct_view: exact COUNT(DISTINCT score) per host via
    the counting-maintained value multiset — equal to recompute through
    dup-value deletes, last-occurrence deletes, group migration, and an
    all-null group (counts 0 but stays visible)."""
    from clinical_trials_etl_spark.cdc.ivm import (
        create_distinct_view, read_distinct_view)

    view = create_distinct_view(spark, table, str(tmp_path / "v"),
                                ["host"], "score", "nd")
    steps = [
        ([("u1", "a", 10, 1, "I"), ("u2", "a", 10, 2, "I"),
          ("u3", "a", 20, 3, "I"), ("u4", "b", None, 4, "I")], "cow"),
        # one of two 10s goes: nd unchanged — THE case signed deltas
        # alone cannot decide, the multiset multiplicity can
        ([("u1", None, None, 10, "D")], "delta"),
        # the last 10 goes: nd drops
        ([("u2", None, None, 11, "D")], "cow"),
        # group migration a->b with a fresh value
        ([("u3", "b", 7, 12, "U")], "delta"),
        # empty group a entirely... (u3 moved, nothing left in a)
        ([("u5", "c", 20, 13, "I"), ("u6", "c", 20, 14, "I")], "cow"),
    ]
    for i, (rows, mode) in enumerate(steps):
        table.merge(_batch(spark, rows), batch_id=f"e-{i}", mode=mode)
        refresh_agg_view(table, view)
        got = {r["host"]: r["nd"]
               for r in read_distinct_view(view).collect()}
        exp = {r["host"]: r["nd"] for r in
               table.read().groupBy("host").agg(
                   F.count_distinct("score").alias("nd")).collect()}
        assert got == exp, f"step {i}"
    # all-null group b is present with 0 at step 0 semantics; final
    # state has b with values {7} -> 1, c with {20} -> 1
    assert got == {"b": 1, "c": 1}


def test_exact_distinct_view_redelivery_noop(spark, tmp_path, table):
    from clinical_trials_etl_spark.cdc.ivm import (
        create_distinct_view, read_distinct_view)

    view = create_distinct_view(spark, table, str(tmp_path / "v"),
                                ["host"], "score", "nd")
    table.merge(_batch(spark, [("u1", "a", 1, 1, "I")]), batch_id="e-0")
    refresh_agg_view(table, view)
    v_before = view.current_version()
    refresh_agg_view(table, view)   # nothing new
    assert view.current_version() == v_before
    assert {r["host"]: r["nd"]
            for r in read_distinct_view(view).collect()} == {"a": 1}
