"""VersionedTable: transactional MERGE on plain parquet (operators.table).

Covers the commit protocol the module's docstring promises: atomic
visibility (marker-last), snapshot isolation via time travel, crash
replay idempotence, and vacuum retention.
"""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from mlb_win_predictor_spark.operators.table import VersionedTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def base_df(spark):
    return spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "c")], "k int, bal double, tag string"
    )


def test_merge_upsert_roundtrip(spark, tmp_path, base_df):
    t = VersionedTable(str(tmp_path / "tbl"))
    assert t.init(base_df) == 0
    delta = spark.createDataFrame(
        [(2, 99.0, "B"), (4, 40.0, "d")], "k int, bal double, tag string"
    )
    assert t.merge(delta, keys=["k"]) == 1
    assert _rows(t.read(spark)) == [
        (1, 10.0, "a"),
        (2, 99.0, "B"),
        (3, 30.0, "c"),
        (4, 40.0, "d"),
    ]


def test_time_travel_and_delete(spark, tmp_path, base_df):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.init(base_df)
    t.merge(
        spark.createDataFrame([(1, -1.0, "z")], "k int, bal double, tag string"),
        keys=["k"],
    )
    t.delete_where(spark, F.col("k") == 2)
    assert t.committed_versions() == [0, 1, 2]
    # snapshot isolation: v0 unchanged after two rewrites
    assert _rows(t.read(spark, version=0)) == _rows(base_df)
    assert _rows(t.read(spark)) == [(1, -1.0, "z"), (3, 30.0, "c")]


def test_crash_before_marker_is_invisible_and_retry_commits(spark, tmp_path, base_df):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.init(base_df)
    delta = spark.createDataFrame([(3, 0.0, "X")], "k int, bal double, tag string")
    # simulate a crash: v=1 data fully written but no marker published
    delta.write.mode("overwrite").parquet(str(tmp_path / "tbl" / "v=1"))
    assert t.latest_version() == 0
    assert _rows(t.read(spark)) == _rows(base_df)  # torn write invisible
    # retry recomputes from v0 into its own unique dir and commits;
    # the legacy orphan is left for vacuum
    assert t.merge(delta, keys=["k"]) == 1
    assert _rows(t.read(spark)) == [(1, 10.0, "a"), (2, 20.0, "b"), (3, 0.0, "X")]


def test_merge_rejects_schema_mismatch(spark, tmp_path, base_df):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.init(base_df)
    bad = spark.createDataFrame([(1, 1.0)], "k int, bal double")
    with pytest.raises(ValueError, match="schema mismatch"):
        t.merge(bad, keys=["k"])


def test_vacuum_drops_old_and_orphans_keeps_head(spark, tmp_path, base_df):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.init(base_df)
    for i in range(3):
        t.merge(
            spark.createDataFrame([(1, float(i), "v")], "k int, bal double, tag string"),
            keys=["k"],
        )
    # plant a crashed-writer orphan: a v=* dir no marker references
    orphan = str(tmp_path / "tbl" / "v=9-dead-0")
    old_v0_dir = t._snapshot_dir(0)
    shutil.copytree(old_v0_dir, orphan)
    removed = t.vacuum(keep_last=2)
    assert removed == [0, 1]
    assert t.committed_versions() == [2, 3]
    assert _rows(t.read(spark))[0] == (1, 2.0, "v")
    with pytest.raises(FileNotFoundError):
        t.read(spark, version=0)
    assert not os.path.isdir(old_v0_dir)  # dropped version's data swept
    # the FRESH unreferenced orphan is TTL-protected (could be a live
    # writer in the rename->marker window); past the TTL it's swept
    assert os.path.isdir(orphan)
    t.vacuum(keep_last=2, staging_ttl_s=0.0)
    assert not os.path.isdir(orphan)


def test_merge_rejects_duplicate_source_keys(spark, tmp_path, base_df):
    """Standard MERGE semantics: a source with two rows for one key must
    ERROR, not silently fan the matched target row out through the
    full-outer join (a dup-keyed CDC delta would corrupt invisibly)."""
    t = VersionedTable(str(tmp_path / "tbl"))
    t.init(base_df)
    dup = spark.createDataFrame(
        [(2, 1.0, "x"), (2, 2.0, "y")], "k int, bal double, tag string"
    )
    with pytest.raises(ValueError, match="duplicate rows per key"):
        t.merge(dup, keys=["k"])
    assert t.committed_versions() == [0]  # nothing committed
    assert _rows(t.read(spark)) == _rows(base_df)


def test_vacuum_sweeps_unreferenced_spares_other_names_and_live_staging(
    spark, tmp_path, base_df
):
    """Marker-as-pointer vacuum semantics: any `v=*` dir no kept marker
    references is swept (crashed-writer orphans and stray `v=1.bak`
    backups alike — unreferenced is unreferenced), names NOT starting
    `v=` are untouched, and `_staged/` dirs YOUNGER than the retention
    TTL survive (a live writer's in-flight staging must not be
    destroyed mid-merge)."""
    t = VersionedTable(str(tmp_path / "tbl"))
    t.init(base_df)
    for i in range(2):
        t.merge(
            spark.createDataFrame([(1, float(i), "v")], "k int, bal double, tag string"),
            keys=["k"],
        )
    shutil.copytree(t._snapshot_dir(0), str(tmp_path / "tbl" / "v=1.bak"))
    os.makedirs(str(tmp_path / "tbl" / "notes_dir"))
    live_staging = str(tmp_path / "tbl" / "_staged" / "v=9-live-0")
    os.makedirs(live_staging)
    removed = t.vacuum(keep_last=2)
    assert removed == [0]
    # fresh unreferenced names are TTL-protected like in-flight writers
    assert os.path.isdir(str(tmp_path / "tbl" / "v=1.bak"))
    assert os.path.isdir(str(tmp_path / "tbl" / "notes_dir"))  # non-snapshot: kept
    assert os.path.isdir(live_staging)  # younger than TTL: kept
    assert t.vacuum(keep_last=2, staging_ttl_s=0.0) == []
    assert not os.path.isdir(live_staging)  # past TTL: swept
    assert not os.path.isdir(str(tmp_path / "tbl" / "v=1.bak"))  # unreferenced: swept
    assert os.path.isdir(str(tmp_path / "tbl" / "notes_dir"))  # still kept
    assert t.committed_versions() == [1, 2]


def test_merge_schema_evolution(spark, tmp_path, base_df):
    """Delta-style mergeSchema: a source with a NEW column widens the
    snapshot schema (new column nullable — null on unmatched target
    rows), a source MISSING a target column leaves that column's values
    intact, and old snapshots still time-travel with the old schema."""
    t = VersionedTable(str(tmp_path / "tbl"))
    t.init(base_df)
    evolved = spark.createDataFrame(
        [(2, 99.0, "B", "eu"), (4, 40.0, "d", "us")],
        "k int, bal double, tag string, region string",
    )
    with pytest.raises(ValueError, match="schema mismatch"):
        t.merge(evolved, keys=["k"])  # evolution must be opt-in
    assert t.merge(evolved, keys=["k"], merge_schema=True) == 1
    assert _rows(t.read(spark)) == [
        (1, 10.0, "a", None),
        (2, 99.0, "B", "eu"),
        (3, 30.0, "c", None),
        (4, 40.0, "d", "us"),
    ]
    # time travel: pre-evolution snapshot keeps the 3-column schema
    assert t.read(spark, version=0).columns == ["k", "bal", "tag"]
    assert _rows(t.read(spark, version=0)) == _rows(base_df)
    # narrow source (missing `tag` and `region`) keeps target values on
    # matched rows, nulls only where no target row existed
    narrow = spark.createDataFrame([(1, -5.0), (9, 9.0)], "k int, bal double")
    t.merge(narrow, keys=["k"], merge_schema=True)
    assert _rows(t.read(spark)) == [
        (1, -5.0, "a", None),
        (2, 99.0, "B", "eu"),
        (3, 30.0, "c", None),
        (4, 40.0, "d", "us"),
        (9, 9.0, None, None),
    ]


def test_merge_schema_evolution_crash_replay(spark, tmp_path, base_df):
    """Crash-sim for the evolution path: the widened v=1 written but
    unmarked is invisible (readers still see the old schema); the retry
    commits and the new column appears."""
    t = VersionedTable(str(tmp_path / "tbl"))
    t.init(base_df)
    evolved = spark.createDataFrame(
        [(3, 0.0, "X", "ap")], "k int, bal double, tag string, region string"
    )
    # crash: evolved v=1 data fully written, marker never published
    base_df.join(evolved.select("k", "region"), "k", "left").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "tbl" / "v=1"))
    assert t.read(spark).columns == ["k", "bal", "tag"]
    assert t.merge(evolved, keys=["k"], merge_schema=True) == 1
    assert t.read(spark).columns == ["k", "bal", "tag", "region"]
    assert _rows(t.read(spark)) == [
        (1, 10.0, "a", None),
        (2, 20.0, "b", None),
        (3, 0.0, "X", "ap"),
    ]


def test_merge_retry_is_idempotent(spark, tmp_path, base_df):
    """Replaying the SAME merge (crash-after-data, crash-after-commit,
    or a blind client retry) converges: state equals a single apply.
    The retry writes a NEW version (v2) whose content is a no-op merge."""
    t = VersionedTable(str(tmp_path / "tbl"))
    t.init(base_df)
    delta = spark.createDataFrame(
        [(2, 99.0, "B"), (4, 40.0, "d")], "k int, bal double, tag string"
    )
    t.merge(delta, keys=["k"])
    once = _rows(t.read(spark))
    t.merge(delta, keys=["k"])  # blind retry
    assert _rows(t.read(spark)) == once
    assert t.committed_versions() == [0, 1, 2]


def test_concurrent_merge_loser_raises_and_retry_succeeds(spark, tmp_path, base_df):
    """r4 verdict item #4 (optimistic concurrency): two writers compute
    deltas against the SAME snapshot; the second to commit must raise a
    retryable ConcurrentCommitError instead of silently clobbering, and
    its retry against the new snapshot must land BOTH writers' changes.
    Old snapshots still time-travel."""
    from mlb_win_predictor_spark.operators.table import ConcurrentCommitError

    t = VersionedTable(str(tmp_path / "tbl"))
    t.init(base_df)
    snap = t.latest_version()
    delta_a = spark.createDataFrame([(1, 111.0, "A")], "k int, bal double, tag string")
    delta_b = spark.createDataFrame([(2, 222.0, "B")], "k int, bal double, tag string")
    # writer A commits first against the shared snapshot
    assert t.merge(delta_a, keys=["k"], expected_base=snap) == 1
    # writer B's commit against the now-stale snapshot must LOSE, loudly
    with pytest.raises(ConcurrentCommitError):
        t.merge(delta_b, keys=["k"], expected_base=snap)
    assert t.committed_versions() == [0, 1]  # no torn/phantom version
    # retry on the new snapshot succeeds and preserves A's write
    assert t.merge(delta_b, keys=["k"], expected_base=t.latest_version()) == 2
    assert _rows(t.read(spark)) == [(1, 111.0, "A"), (2, 222.0, "B"), (3, 30.0, "c")]
    # time travel: both earlier snapshots intact
    assert _rows(t.read(spark, version=0)) == _rows(base_df)
    assert _rows(t.read(spark, version=1)) == [
        (1, 111.0, "A"),
        (2, 20.0, "b"),
        (3, 30.0, "c"),
    ]


def test_concurrent_merge_marker_cas_under_true_parallelism(spark, tmp_path, base_df):
    """Same-version race with REAL thread interleaving: both writers pin
    the same expected_base and run concurrently; exactly one commit wins
    the marker CAS, the loser raises, and the table never contains a
    mix of the two snapshots."""
    import threading

    from mlb_win_predictor_spark.operators.table import ConcurrentCommitError

    t = VersionedTable(str(tmp_path / "tbl"))
    t.init(base_df)
    deltas = {
        "a": spark.createDataFrame([(1, 111.0, "A")], "k int, bal double, tag string"),
        "b": spark.createDataFrame([(2, 222.0, "B")], "k int, bal double, tag string"),
    }
    results: dict[str, object] = {}

    def worker(name):
        try:
            results[name] = t.merge(deltas[name], keys=["k"], expected_base=0)
        except ConcurrentCommitError as e:
            results[name] = e

    threads = [threading.Thread(target=worker, args=(n,)) for n in deltas]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    winners = [n for n, r in results.items() if isinstance(r, int)]
    losers = [n for n, r in results.items() if not isinstance(r, int)]
    assert len(winners) == 1 and len(losers) == 1, results
    assert results[winners[0]] == 1
    assert t.committed_versions() == [0, 1]
    # v1 is EXACTLY base + winner's delta — no interleaved/mixed rows
    got = _rows(t.read(spark))
    want = {
        "a": [(1, 111.0, "A"), (2, 20.0, "b"), (3, 30.0, "c")],
        "b": [(1, 10.0, "a"), (2, 222.0, "B"), (3, 30.0, "c")],
    }[winners[0]]
    assert got == want
    # loser retries cleanly on the new snapshot
    assert t.merge(deltas[losers[0]], keys=["k"], expected_base=1) == 2
    assert _rows(t.read(spark)) == [(1, 111.0, "A"), (2, 222.0, "B"), (3, 30.0, "c")]


def test_vacuum_clears_stale_staging(spark, tmp_path, base_df):
    """Conflicted/crashed attempts leave _staged dirs; vacuum removes
    the ones OLDER than the retention TTL (a fresh dir could be a live
    writer's in-flight staging)."""
    t = VersionedTable(str(tmp_path / "tbl"))
    t.init(base_df)
    stale = tmp_path / "tbl" / "_staged" / "v=1-999-0"
    os.makedirs(str(stale), exist_ok=True)
    (stale / "part-junk.parquet").write_text("x")
    t.vacuum(keep_last=1)
    assert os.path.isdir(str(stale))  # younger than default TTL: kept
    t.vacuum(keep_last=1, staging_ttl_s=0.0)
    assert not os.path.isdir(str(stale))  # past TTL: swept
    assert t.latest_version() == 0


def test_vacuum_sweeps_stale_commit_tmp_files(spark, tmp_path, base_df):
    """ADVICE r5: a writer crashing between _publish's tmp-pointer write
    and the finally-unlink leaks `_commits/<N>.<dir>.tmp` forever.
    committed_versions ignores them (no correctness impact), but vacuum
    must sweep them past the staging TTL — and must NOT touch real
    markers or a FRESH tmp (a live writer microseconds from its link)."""
    t = VersionedTable(str(tmp_path / "tbl"))
    t.init(base_df)
    t.merge(
        spark.createDataFrame([(1, 1.0, "x")], "k int, bal double, tag string"),
        keys=["k"],
    )
    leaked = os.path.join(t.path, "_commits", "2.v=2-dead-0-deadbeef.tmp")
    with open(leaked, "w") as fh:
        fh.write("v=2-dead-0-deadbeef")
    assert t.committed_versions() == [0, 1]  # tmp never counts as a commit
    t.vacuum(keep_last=2)
    assert os.path.exists(leaked)  # fresh: could be a live writer's tmp
    t.vacuum(keep_last=2, staging_ttl_s=0.0)
    assert not os.path.exists(leaked)  # past TTL: swept
    assert t.committed_versions() == [0, 1]  # real markers untouched
    assert _rows(t.read(spark)) == [(1, 1.0, "x"), (2, 20.0, "b"), (3, 30.0, "c")]


def test_vacuum_during_loser_retry_no_data_loss(spark, tmp_path, base_df):
    """r5 verdict item #8: vacuum fires DURING a loser's retry-after-
    conflict — after the retry staged its snapshot, before its marker
    CAS. The crashed loser's abandoned staging (older than the TTL) is
    swept by that very vacuum call while the retry's own fresh staging
    survives per the staging_ttl_s contract; the retry then commits a
    clean head containing BOTH writers' rows, and the old version
    vacuum dropped mid-retry was not one the retry depended on (it read
    the kept head)."""
    from mlb_win_predictor_spark.operators.table import ConcurrentCommitError

    t = VersionedTable(str(tmp_path / "tbl"))
    t.init(base_df)
    delta_a = spark.createDataFrame([(1, 111.0, "A")], "k int, bal double, tag string")
    delta_b = spark.createDataFrame([(2, 222.0, "B")], "k int, bal double, tag string")
    assert t.merge(delta_a, keys=["k"], expected_base=0) == 1
    # a loser that CRASHED mid-attempt: staged data abandoned, no cleanup;
    # backdate it past the TTL so the mid-retry vacuum provably sweeps it
    dead = t._stage_dir(1)
    delta_b.write.mode("overwrite").parquet(dead)
    os.utime(dead, (0.0, 0.0))
    # the same loser's in-process conflict attempt raises cleanly
    with pytest.raises(ConcurrentCommitError):
        t.merge(delta_b, keys=["k"], expected_base=0)
    # retry against the new head with vacuum interleaved mid-merge:
    # hook _write_zonemap (runs after the staged parquet write, before
    # _publish) to fire vacuum(keep_last=1) right inside the window
    real_zonemap = t._write_zonemap
    swept: dict[str, object] = {}

    def zonemap_then_vacuum(spark_, staged):
        real_zonemap(spark_, staged)
        swept["versions"] = t.vacuum(keep_last=1, staging_ttl_s=1800.0)
        swept["dead_gone"] = not os.path.isdir(dead)
        swept["live_kept"] = os.path.isdir(staged)

    t._write_zonemap = zonemap_then_vacuum
    try:
        assert t.merge(delta_b, keys=["k"], expected_base=1) == 2
    finally:
        t._write_zonemap = real_zonemap
    assert swept["versions"] == [0]  # v0 dropped mid-retry
    assert swept["dead_gone"] is True  # abandoned loser staging swept
    assert swept["live_kept"] is True  # in-flight retry staging survived
    # clean final head with no data loss: base + A + B
    assert t.committed_versions() == [1, 2]
    assert _rows(t.read(spark)) == [(1, 111.0, "A"), (2, 222.0, "B"), (3, 30.0, "c")]
    assert _rows(t.read(spark, version=1)) == [
        (1, 111.0, "A"),
        (2, 20.0, "b"),
        (3, 30.0, "c"),
    ]


def test_versioned_zonemap_lookup_entry_prunes_files(spark):
    """r5 verdict item #6: the ``versioned_zonemap_lookup`` catalog entry
    must not just be oracle-correct (the parity sweep covers that) — its
    snapshot must actually SKIP files. Rebuild the same content-tagged
    snapshot the entry uses and pin that the narrow key range plans a
    strict subset of the 16 range-clustered files, and that the pruned
    read equals the unpruned filter."""
    from mlb_win_predictor_spark.queries.extra import (
        ZONEMAP_LOOKUP_HI,
        ZONEMAP_LOOKUP_LO,
        versioned_zonemap_lookup,
        zonemap_snapshot_path,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = versioned_zonemap_lookup(spark, sf_dir).collect()[0]  # builds snapshot
    assert out.n_orders > 0 and ZONEMAP_LOOKUP_LO <= out.min_key
    assert out.max_key <= ZONEMAP_LOOKUP_HI
    # the SAME content-tagged path the entry builds (r9: the test used to
    # rebuild the pre-ea99d09 path-only tag and passed only off a stale
    # /tmp dir; a fresh boot exposed it)
    t = VersionedTable(zonemap_snapshot_path(sf_dir))
    kept, total = t.pruned_files("o_orderkey", ZONEMAP_LOOKUP_LO, ZONEMAP_LOOKUP_HI)
    assert total == 16
    # the [1000, 2999] range spans ~1/3 of the sf0.001 keyspace (1..6000)
    # → ~6 of 16 range-disjoint files overlap; the pin is "a strict
    # subset was planned". At the driver's sf0.01 the same range is 3%
    # of the keyspace and prunes 15/16 — skipping scales with data, the
    # point of zone maps.
    assert len(kept) <= 7 < total, (len(kept), total)
    full = (
        t.read(spark)
        .filter(F.col("o_orderkey").between(ZONEMAP_LOOKUP_LO, ZONEMAP_LOOKUP_HI))
        .count()
    )
    assert out.n_orders == full


def test_zonemap_file_skipping_prunes_and_matches(spark, tmp_path):
    """Delta-style data skipping: a range-clustered snapshot must prune
    most files for a narrow range read, and the pruned read must equal
    the full read + filter exactly."""
    t = VersionedTable(str(tmp_path / "tbl"))
    df = (
        spark.range(0, 10_000)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartitionByRange(8, "k")
    )
    t.init(df)
    kept, total = t.pruned_files("k", lo=100, hi=200)
    assert total == 8
    assert len(kept) <= 2, (len(kept), total)  # narrow range hits ~1 range file
    pruned = t.read_pruned(spark, "k", lo=100, hi=200)
    full = t.read(spark).filter((F.col("k") >= 100) & (F.col("k") <= 200))
    assert pruned.count() == full.count() == 101
    assert pruned.exceptAll(full).count() == 0


def test_zonemap_survives_merge_and_empty_range(spark, tmp_path):
    """The zone-map is rewritten with each new version (stats track the
    merged data), and a range outside the domain reads zero files but
    still returns a typed empty DataFrame."""
    t = VersionedTable(str(tmp_path / "tbl"))
    base = spark.range(0, 1000).select(
        F.col("id").alias("k"), F.lit("a").alias("s")
    ).repartitionByRange(4, "k")
    t.init(base)
    delta = spark.range(5000, 5010).select(
        F.col("id").alias("k"), F.lit("b").alias("s")
    )
    t.merge(delta, ["k"])
    kept, total = t.pruned_files("k", lo=5000, hi=5100, version=1)
    assert kept, "merged rows must be discoverable via the new zone-map"
    got = t.read_pruned(spark, "k", lo=5000, hi=5100)
    assert got.count() == 10
    empty = t.read_pruned(spark, "k", lo=90_000, hi=99_000)
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "s"}
    # time-travel still prunes against v0's own manifest
    kept0, total0 = t.pruned_files("k", lo=0, hi=10, version=0)
    assert len(kept0) <= 2 and total0 == 4


def test_publish_interleaving_cannot_lose_winner_data(spark, tmp_path, base_df):
    """Regression for the lost-update race of the shared-dir design:
    writer A renames its snapshot but hasn't created the marker yet when
    writer B publishes the same version completely. Under
    marker-as-pointer, B's marker must reference B's OWN data (never
    A's), A's late marker attempt must lose loudly, and B's committed
    data must survive untouched."""
    from mlb_win_predictor_spark.operators.table import ConcurrentCommitError

    t = VersionedTable(str(tmp_path / "tbl"))
    t.init(base_df)
    # writer A: stage + rename (the pre-marker crash window), no marker
    a_staged = t._stage_dir(1)
    spark.createDataFrame([(1, 111.0, "A")], "k int, bal double, tag string").write.mode(
        "overwrite"
    ).parquet(a_staged)
    a_final = os.path.join(t.path, os.path.basename(a_staged))
    os.rename(a_staged, a_final)
    # writer B publishes version 1 completely while A is in the window
    assert (
        t.merge(
            spark.createDataFrame([(2, 222.0, "B")], "k int, bal double, tag string"),
            keys=["k"],
        )
        == 1
    )
    assert t._snapshot_dir(1) != a_final  # marker points at B's data
    # A's late marker attempt loses loudly instead of clobbering
    with pytest.raises(ConcurrentCommitError):
        t._publish(a_final, 1)
    # B's committed rows are intact (A's delta is NOT silently dropped
    # into v1, and v1 was never replaced by A's data)
    assert _rows(t.read(spark, version=1)) == [
        (1, 10.0, "a"),
        (2, 222.0, "B"),
        (3, 30.0, "c"),
    ]
