"""spark-submit job entry-point tests (batch + streaming modes, resume)."""

from __future__ import annotations

from clinical_trials_etl_spark.datagen.changelog import (
    LogSpec,
    write_changelog_segments,
)
from clinical_trials_etl_spark.job import main

SPEC = LogSpec(n_events=800, n_hosts=8, paths_per_host=25, seed=5)


def test_job_batch_and_stream_converge(spark, tmp_path):
    log_dir = str(tmp_path / "log")
    write_changelog_segments(spark, SPEC, log_dir, n_segments=3)

    batch = main(["--log-dir", log_dir, "--table", str(tmp_path / "t_batch")])
    assert batch["mode"] == "replay" and batch["rows"] > 0

    stream = main([
        "--log-dir", log_dir, "--table", str(tmp_path / "t_stream"),
        "--checkpoint", str(tmp_path / "ckpt"), "--stream",
        "--metrics", str(tmp_path / "metrics"),
    ])
    assert stream["mode"] == "stream" and stream["batches"] >= 1
    assert stream["rows"] == batch["rows"]

    # re-invocation resumes from checkpoint: no new data -> same version
    again = main([
        "--log-dir", log_dir, "--table", str(tmp_path / "t_stream"),
        "--checkpoint", str(tmp_path / "ckpt"), "--stream",
    ])
    assert again["version"] == stream["version"]
    assert again["rows"] == stream["rows"]


def test_job_maintain_out_of_band(spark, tmp_path):
    """--maintain: the out-of-band maintenance pass the compaction
    rebase sanctions — delta-ingest with the job, then compact +
    expire + GC against the same table root from a separate
    invocation, state byte-identical throughout."""
    log_dir = str(tmp_path / "log")
    write_changelog_segments(spark, SPEC, log_dir, n_segments=3)

    ingest = main([
        "--log-dir", log_dir, "--table", str(tmp_path / "t"),
        "--merge-mode", "delta",
    ])
    assert ingest["mode"] == "replay" and ingest["rows"] > 0

    from clinical_trials_etl_spark.lake.table import LakeTable
    t = LakeTable(spark, str(tmp_path / "t"))
    before = {r["url"]: r["text"] for r in t.read().collect()}
    layered = max(len(v) for v in t.snapshot()["manifests"].values())
    assert layered > 1  # delta replay left layers for the fold

    maint = main([
        "--table", str(tmp_path / "t"), "--maintain",
        "--compact-sort-by", "warc_ts",
        "--expire-keep", "2", "--gc-orphans-older-than", "0",
    ])
    assert maint["mode"] == "maintain"
    assert maint["compact"]["compacted_buckets"] > 0
    assert maint["version"] == t.current_version()
    assert "expire" in maint and "gc" in maint

    after = {r["url"]: r["text"] for r in t.read().collect()}
    assert after == before
    assert max(len(v) for v in t.snapshot()["manifests"].values()) == 1

    # ingesting without --log-dir is a usage error, not a crash
    import pytest
    with pytest.raises(SystemExit):
        main(["--table", str(tmp_path / "t")])


def test_job_stream_publishes_envelopes(spark, tmp_path):
    """--envelope-dir/--publish-envelopes-every: the spark-submit
    streaming job produces the change topic alongside the table."""
    from clinical_trials_etl_spark.cdc.envelope import last_published

    log_dir = str(tmp_path / "log_env")
    write_changelog_segments(spark, SPEC, log_dir, n_segments=3)
    env = str(tmp_path / "envelopes")
    res = main([
        "--log-dir", log_dir, "--table", str(tmp_path / "t_env"),
        "--checkpoint", str(tmp_path / "ckpt_env"), "--stream",
        "--max-files-per-trigger", "1",
        "--envelope-dir", env, "--publish-envelopes-every", "1",
    ])
    assert res["mode"] == "stream"
    assert last_published(env) == res["version"]


def test_job_refreshes_views_in_all_modes(spark, tmp_path):
    """--view mounts existing materialized views on every job shape:
    batch replay and --maintain refresh to head, --stream refreshes on
    the applied-epoch cadence then converges to head — each checked
    against a recompute of the same aggregate."""
    from pyspark.sql import functions as F

    from clinical_trials_etl_spark.cdc.ivm import (
        create_agg_view,
        create_distinct_view,
        last_refreshed,
        read_agg_view,
        read_distinct_view,
    )
    from clinical_trials_etl_spark.lake.table import LakeTable

    log_dir = str(tmp_path / "log")
    write_changelog_segments(spark, SPEC, log_dir, n_segments=4)
    root = str(tmp_path / "t")

    # seed the table with the first segment so views can be created
    seed_dir = str(tmp_path / "seed")
    write_changelog_segments(
        spark, LogSpec(n_events=200, n_hosts=8, paths_per_host=25,
                       seed=5), seed_dir, n_segments=1)
    main(["--log-dir", seed_dir, "--table", root])
    table = LakeTable(spark, root)
    # field id 5 is lang at v1 (renamed to language later in the ramp)
    gname = next(f["name"] for f in table.fields() if f["id"] == 5)
    view = create_agg_view(
        spark, table, str(tmp_path / "v"), [gname],
        [("count", None, "pages"),
         ("approx_distinct", "url", "nd_pages")])
    dview = create_distinct_view(
        spark, table, str(tmp_path / "dv"), [gname], "url", "nd")

    # batch replay with both views mounted
    out = main(["--log-dir", log_dir, "--table", root,
                "--view", str(tmp_path / "v"),
                "--view", str(tmp_path / "dv")])
    assert out["mode"] == "replay" and len(out["views"]) == 2
    assert last_refreshed(view) == table.current_version()
    assert last_refreshed(dview) == table.current_version()

    def recompute():
        name = next(f["name"] for f in table.fields() if f["id"] == 5)
        return {r[0]: (r[1], r[2]) for r in
                table.read().groupBy(name)
                .agg(F.count("*"), F.count_distinct("url")).collect()}

    exp = recompute()
    got = {r[gname]: (r["pages"], r["nd_pages"])
           for r in read_agg_view(view).collect()}
    assert got == exp
    assert ({r[gname]: r["nd"] for r in read_distinct_view(dview).collect()}
            == {k: v[1] for k, v in exp.items()})

    # --maintain also refreshes (the out-of-band view-maintenance shape)
    write_changelog_segments(
        spark, LogSpec(n_events=300, n_hosts=8, paths_per_host=25,
                       seed=9, lsn_offset=SPEC.n_events * 8),
        str(tmp_path / "log2"), n_segments=1)
    main(["--log-dir", str(tmp_path / "log2"), "--table", root])
    maint = main(["--table", root, "--maintain",
                  "--view", str(tmp_path / "v")])
    assert maint["views"][0]["to"] == table.current_version()
    assert ({r[gname]: (r["pages"], r["nd_pages"])
             for r in read_agg_view(view).collect()} == recompute())

    # --stream on a fresh table+views: cadence + final convergence
    root2 = str(tmp_path / "t2")
    main(["--log-dir", seed_dir, "--table", root2])
    t2 = LakeTable(spark, root2)
    v2 = create_agg_view(spark, t2, str(tmp_path / "v2"), [gname],
                         [("count", None, "pages")])
    out = main(["--log-dir", log_dir, "--table", root2,
                "--checkpoint", str(tmp_path / "ckpt2"), "--stream",
                "--view", str(tmp_path / "v2"),
                "--refresh-views-every", "2"])
    assert out["mode"] == "stream"
    assert last_refreshed(v2) == t2.current_version()
    name2 = next(f["name"] for f in t2.fields() if f["id"] == 5)
    assert ({r[gname]: r["pages"] for r in read_agg_view(v2).collect()}
            == {r[0]: r[1] for r in t2.read().groupBy(name2)
                .agg(F.count("*")).collect()})
