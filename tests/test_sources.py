"""Source/sink tests (SURVEY §2.1): Python Data Source scan, JSON log
sink round-trip, email digest content, full E1 prepare-day flow from the
custom source through enrichment."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from mlb_win_predictor_spark.fixtures import write_fixtures
from mlb_win_predictor_spark.pipeline import asof_pitcher_stats, prepare_games
from mlb_win_predictor_spark.session import load_table
from mlb_win_predictor_spark.sources import (
    email_digest,
    json_log_sink,
    register_schedule_source,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("srcfix")
    write_fixtures(str(d))
    return str(d)


def test_schedule_datasource_scan(spark):
    register_schedule_source(spark)
    df = (
        spark.read.format("mlb_schedule")
        .option("date", "8/25/2023")
        .option("numPartitions", "4")
        .load()
    )
    rows = df.collect()
    assert len(rows) == 15
    assert df.rdd.getNumPartitions() == 4
    # deterministic across reads (S1 replay, src/function.py:476 pinned dates)
    again = spark.read.format("mlb_schedule").option("date", "8/25/2023").load()
    assert sorted(map(str, rows)) == sorted(map(str, again.collect()))
    # different date => different schedule
    other = spark.read.format("mlb_schedule").option("date", "8/26/2023").load()
    assert sorted(map(str, rows)) != sorted(map(str, other.collect()))


def test_prepare_games_from_source(spark, fixture_dir):
    """E1 prepare phase end-to-end: custom source -> broadcast dim joins ->
    as-of stats enrichment (replaces ~21 HTTP calls per game)."""
    register_schedule_source(spark)
    sched = spark.read.format("mlb_schedule").option("date", "8/25/2023").load()
    players = spark.read.parquet(f"{fixture_dir}/players.parquet")
    plog = spark.read.parquet(f"{fixture_dir}/pitching_log.parquet")
    stats = asof_pitcher_stats(plog)
    import datetime

    out = prepare_games(sched, players, stats, datetime.date(2023, 8, 25))
    rows = out.collect()
    assert len(rows) == 15
    cols = out.columns
    assert "home_pitcher_era" in cols and "away_pitcher_babip" in cols
    # every pitcher name resolves against the dim (names are generated from
    # the same universe)
    assert out.filter(F.col("home_pitcher_id").isNull()).count() == 0


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Schema evolution on the landing zone (SURVEY §1.3 notes the
    reference has none — the engine supports additive evolution via
    parquet mergeSchema): files written before a column existed read
    back as NULL for that column."""
    d = str(tmp_path / "evolving")
    v1 = spark.range(3).select(F.col("id").alias("game_id"), F.lit("A").alias("team"))
    v1.write.parquet(d + "/batch=1")
    v2 = spark.range(3, 5).select(
        F.col("id").alias("game_id"),
        F.lit("B").alias("team"),
        F.lit(2.5).alias("era"),
    )
    v2.write.parquet(d + "/batch=2")
    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"game_id", "team", "era", "batch"}
    assert merged.count() == 5
    assert merged.filter(F.col("era").isNull()).count() == 3


def test_write_sized_parquet_controls_file_count(spark, tmp_path):
    from mlb_win_predictor_spark.sources import write_sized_parquet
    from mlb_win_predictor_spark.session import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders")  # 1500 rows
    n = o.count()
    out = str(tmp_path / "sized")
    files = write_sized_parquet(o, out, target_rows_per_file=400)
    parts = glob.glob(os.path.join(out, "part-*.parquet"))
    assert files == -(-n // 400)
    assert len(parts) == files, f"{len(parts)} files, wanted {files}"
    assert spark.read.parquet(out).count() == n
    # range-clustered variant: files are key-disjoint => prunable
    out2 = str(tmp_path / "sized_ranged")
    write_sized_parquet(o, out2, 400, order_cols=["o_orderkey"])
    ranges = []
    for f in sorted(glob.glob(os.path.join(out2, "part-*.parquet"))):
        pdf = spark.read.parquet(f).agg(
            F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
        ).collect()[0]
        ranges.append((pdf.lo, pdf.hi))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, f"overlapping key ranges: {ranges}"


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from mlb_win_predictor_spark.sources import read_orc, write_orc

    o = load_table(spark, SF, "orders")
    out = str(tmp_path / "orders_orc")
    write_orc(o, out)
    back = read_orc(spark, out)
    assert back.count() == o.count()
    assert set(back.columns) == set(o.columns)
    sel = back.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    plan = sel._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus" in plan  # predicate reaches the ORC scan node


def test_xml_roundtrip(spark, tmp_path):
    from mlb_win_predictor_spark.sources import read_xml, write_xml

    n = load_table(spark, SF, "nation")
    out = str(tmp_path / "nation_xml")
    write_xml(n, out, row_tag="nation")
    back = read_xml(spark, out, row_tag="nation")
    assert set(back.columns) == set(n.columns)
    orig = {r.n_nationkey: r.n_name for r in n.collect()}
    got = {r.n_nationkey: r.n_name for r in back.collect()}
    assert got == orig


def test_text_source_line_per_row(spark, tmp_path):
    from mlb_win_predictor_spark.sources import read_text

    d = load_table(spark, SF, "documents").select("text")
    out = str(tmp_path / "docs_txt")
    d.write.text(out)
    lines = read_text(spark, out)
    assert lines.columns == ["value"]
    assert lines.count() == d.count()


def test_binary_file_source_reads_media_bytes(spark):
    from mlb_win_predictor_spark.sources import read_binary_files

    files = read_binary_files(spark, SF, glob="*.parquet")
    rows = files.select("path", "length", F.length("content").alias("n")).collect()
    assert len(rows) == 10  # one per testdata table
    for r in rows:
        assert r.n == r.length  # content is the whole file
        assert os.path.getsize(r.path.replace("file:", "")) == r.length


def test_zorder_write_clusters_both_dimensions(spark, tmp_path):
    """Z-order layout: every output file spans a narrow range of BOTH
    cluster columns (a linear sort is only narrow in its leading column).
    16 files ~ 4x4 grid => per-file span ~ 1/4 of the global range per
    dimension; assert < 1/2 with slack for boundary files."""
    from mlb_win_predictor_spark.sources import write_zorder_parquet

    o = load_table(spark, "/root/testdata/sf0.01", "orders")
    out = str(tmp_path / "orders_z")
    write_zorder_parquet(o, out, "o_custkey", "o_orderkey", num_files=16)
    back = spark.read.parquet(out)
    spans = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("o_custkey") - F.min("o_custkey")).alias("span_x"),
            (F.max("o_orderkey") - F.min("o_orderkey")).alias("span_y"),
        )
        .agg(F.avg("span_x").alias("sx"), F.avg("span_y").alias("sy"))
        .collect()[0]
    )
    rng = o.agg(
        (F.max("o_custkey") - F.min("o_custkey")).alias("rx"),
        (F.max("o_orderkey") - F.min("o_orderkey")).alias("ry"),
    ).collect()[0]
    assert back.count() == o.count()
    assert spans.sx < rng.rx * 0.5, (spans.sx, rng.rx)
    assert spans.sy < rng.ry * 0.5, (spans.sy, rng.ry)


def test_hll_rollup_accuracy(spark):
    from mlb_win_predictor_spark.queries.extra import hll_mergeable_rollup
    from mlb_win_predictor_spark.session import load_table

    got = {
        r.n_regionkey: r.approx_customers
        for r in hll_mergeable_rollup(spark, "/root/testdata/sf0.01").collect()
    }
    c = load_table(spark, "/root/testdata/sf0.01", "customer")
    n = load_table(spark, "/root/testdata/sf0.01", "nation")
    exact = {
        r.n_regionkey: r.n
        for r in c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_regionkey")
        .agg(F.countDistinct("c_custkey").alias("n"))
        .collect()
    }
    for k, est in got.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])


def test_json_log_sink_roundtrip(spark, tmp_path):
    events = spark.range(5).select(
        F.lit("game_prepared").alias("event"),
        (F.col("id") + 716352).alias("game_id"),
    )
    path = json_log_sink(events, str(tmp_path), "prepared_games")
    assert os.path.basename(path).endswith("_prepared_games")
    lines = []
    for f in glob.glob(os.path.join(path, "part-*")):
        with open(f) as fh:
            lines += [json.loads(line) for line in fh if line.strip()]
    assert len(lines) == 5
    assert {l["event"] for l in lines} == {"game_prepared"}
    back = spark.read.json(path)
    assert back.count() == 5


def test_email_digest(spark):
    prepared = spark.range(3).select((F.col("id") + 1).alias("game_id"))
    updated = spark.range(2).select((F.col("id") + 10).alias("game_id"))
    rows = {r.bucket: r for r in email_digest(prepared, updated).collect()}
    assert rows["prepared"].n_games == 3
    assert rows["prepared"].html_items == "<li>1</li><li>2</li><li>3</li>"
    assert rows["updated"].html_items == "<li>10</li><li>11</li>"


def test_csv_json_roundtrip(spark, tmp_path):
    from mlb_win_predictor_spark.sources.readers import (
        read_csv,
        read_json,
        write_csv,
        write_json,
    )

    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") * 2.5).alias("val"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
    )
    schema = "id long, val double, name string"
    write_csv(df, str(tmp_path / "csv"))
    back_csv = read_csv(spark, str(tmp_path / "csv"), schema)
    assert back_csv.exceptAll(df).count() == 0 and back_csv.count() == 100

    write_json(df, str(tmp_path / "json"))
    back_json = read_json(spark, str(tmp_path / "json"), schema)
    assert back_json.exceptAll(df).count() == 0

    # malformed CSV row -> PERMISSIVE null, not a job failure (null-on-error
    # parity with the reference's accessors)
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part.csv").write_text("id,val,name\n1,notanumber,x\n2,3.5,y\n")
    got = read_csv(spark, str(bad), schema).collect()
    assert {r.id for r in got} == {1, 2}
    assert [r.val for r in sorted(got, key=lambda r: r.id)][0] is None


def test_jdbc_reader_config(spark):
    from mlb_win_predictor_spark.sources.readers import read_jdbc

    reader = read_jdbc(
        spark,
        "jdbc:postgresql://host/db",
        "games",
        partition_column="game_id",
        num_partitions=8,
        lower_bound=716352,
        upper_bound=748585,
    )
    assert reader is not None  # option plumbing only; no live DB here


def test_save_best_models(spark, fixture_dir, tmp_path):
    import json as _json
    import os

    from mlb_win_predictor_spark.ml.train import (
        FEATURE_FAMILIES,
        MODELS,
        make_pipeline,
        evaluate_predictions,
        save_best_models,
        strip_training_summary,
    )
    from mlb_win_predictor_spark.pipeline import build_features
    from pyspark.ml import PipelineModel

    games = spark.read.parquet(f"{fixture_dir}/games.parquet")
    features = build_features(games).withColumn(
        "label", F.col("winning_team").cast("double")
    )
    train, test = features.randomSplit([0.8, 0.2], seed=42)
    fams = {"all_stats": FEATURE_FAMILIES["all_stats"]}
    fitted, rows = {}, []
    for fam, cols in fams.items():
        for mname in ("logistic_regression",):
            m = make_pipeline(cols, MODELS[mname]()).fit(train)
            strip_training_summary(m)
            fitted[(fam, mname)] = m
            met = evaluate_predictions(m.transform(test), "label")
            rows.append({"family": fam, "model": mname, **met,
                         "n_train": 1, "n_test": 1})
    lb = spark.createDataFrame(rows)
    out = str(tmp_path / "models")
    save_best_models(lb, fitted, out)
    path = os.path.join(out, "all_stats__logistic_regression")
    assert os.path.isdir(path)
    meta = _json.load(open(path + ".json"))
    assert meta["family"] == "all_stats"
    reloaded = PipelineModel.load(path)
    assert reloaded.transform(test).count() == test.count()


def test_schedule_streaming_source_matches_batch(spark, tmp_path):
    """The streaming flavor of the Python Data Source (S1's production
    daily-poll shape): an availableNow run over N offset days yields
    exactly the union of the N batch reads, with (dates x shards)
    partition parallelism and offsets tracked in the checkpoint log."""
    register_schedule_source(spark)
    stream = (
        spark.readStream.format("mlb_schedule")
        .option("startDate", "2023-08-25")
        .option("maxDates", "2")
        .option("numPartitions", "4")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sched_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {tuple(r) for r in spark.sql("SELECT * FROM sched_stream").collect()}
    want = set()
    for d in ("2023-08-25", "2023-08-26"):
        want |= {
            tuple(r)
            for r in spark.read.format("mlb_schedule").option("date", d).load().collect()
        }
    assert got == want and len(got) == 30


def test_theta_overlap_accuracy(spark):
    """Theta set algebra estimates within 5% of exact distinct
    intersections/unions/differences between event-type audiences."""
    from mlb_win_predictor_spark.queries.extra import theta_audience_overlap
    from mlb_win_predictor_spark.session import load_table

    sf = "/root/testdata/sf0.01"
    got = {
        (r.type_a, r.type_b): (r.users_both, r.users_either, r.users_only_a)
        for r in theta_audience_overlap(spark, sf).collect()
    }
    e = load_table(spark, sf, "events").select("event_type", "user_id").collect()
    by_type = {}
    for r in e:
        by_type.setdefault(r.event_type, set()).add(r.user_id)
    for (a, b), (both, either, only_a) in got.items():
        ea, eb = by_type[a], by_type[b]
        for est, exact in (
            (both, len(ea & eb)),
            (either, len(ea | eb)),
            (only_a, len(ea - eb)),
        ):
            if exact:
                assert abs(est - exact) / exact < 0.05, (a, b, est, exact)
            else:
                assert est == 0


def test_kll_quantile_rollup_rank_error(spark):
    """The merged KLL sketch's quantiles land within 1.5% RANK error of
    the exact percentiles (k=200 guarantees ~0.7% one-sided)."""
    from mlb_win_predictor_spark.queries.extra import kll_quantile_rollup
    from mlb_win_predictor_spark.session import load_table

    sf = "/root/testdata/sf0.01"
    row = kll_quantile_rollup(spark, sf).collect()[0]
    vals = sorted(
        r.value
        for r in load_table(spark, sf, "events")
        .filter(F.col("value").isNotNull())
        .select("value")
        .collect()
    )
    n = len(vals)
    assert row.n_rows == n
    import bisect

    for q, est in ((0.5, row.p50), (0.95, row.p95), (0.99, row.p99)):
        rank = bisect.bisect_left(vals, est) / n
        assert abs(rank - q) < 0.015, (q, est, rank)


def test_partition_overwrite_replaces_only_touched_partitions(spark, tmp_path):
    """Dynamic partition overwrite: backfilling one o_orderstatus
    partition must leave the others byte-identical AND be idempotent
    (re-running the same backfill changes nothing)."""
    from mlb_win_predictor_spark.sources import write_partition_overwrite

    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    out = str(tmp_path / "po")
    write_partition_overwrite(o, out, ["o_orderstatus"])
    before = {
        r.o_orderkey: r.o_totalprice for r in spark.read.parquet(out).collect()
    }

    # backfill: recompute ONLY the 'F' partition with doubled prices
    patch = o.filter(F.col("o_orderstatus") == "F").withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    for _ in range(2):  # idempotence: second run must be a no-op
        write_partition_overwrite(patch, out, ["o_orderstatus"])
        after = spark.read.parquet(out)
        got = {r.o_orderkey: r.o_totalprice for r in after.collect()}
        stat = {r.o_orderkey: r.o_orderstatus for r in after.collect()}
        assert len(got) == len(before)  # no rows appended or lost
        for k, v in got.items():
            if stat[k] == "F":
                assert v == before[k] * 2
            else:
                assert v == before[k]  # untouched partitions intact


def test_compact_small_files_reduces_file_count(spark, tmp_path):
    from mlb_win_predictor_spark.sources import compact_small_files

    o = load_table(spark, SF, "orders")
    out = str(tmp_path / "frag")
    o.repartition(24).write.parquet(out)  # simulate micro-batch fragmentation
    n = o.count()
    assert len(glob.glob(os.path.join(out, "part-*.parquet"))) == 24
    files = compact_small_files(spark, out, target_rows_per_file=max(1, n // 2))
    parts = glob.glob(os.path.join(out, "part-*.parquet"))
    # round-robin imbalance can split one straggler via maxRecordsPerFile
    assert files <= len(parts) <= files + 1 <= 4
    assert spark.read.parquet(out).count() == n


def test_object_store_writer_two_phase_commit(spark, tmp_path):
    """Python Data Source WRITER: objects published + atomic manifest."""
    import json as _json

    from mlb_win_predictor_spark.sources.object_store_sink import (
        read_manifest_objects,
        register_object_store_sink,
    )

    register_object_store_sink(spark)
    out = str(tmp_path / "bucket")
    df = (
        load_table(spark, SF, "events")
        .filter(F.col("event_id") < 100)
        .select("event_id", "event_type", "value")
        .repartition(4)
    )
    df.write.format("object_store").mode("append").save(out)
    objs = read_manifest_objects(out)
    assert sum(o["rows"] for o in objs) == 100
    back = []
    for o in objs:
        with open(os.path.join(out, o["object"])) as f:
            back.extend(_json.loads(l) for l in f)
    assert sorted(r["event_id"] for r in back) == sorted(
        r.event_id for r in df.collect()
    )
    assert not os.path.isdir(os.path.join(out, "_staged"))


def test_object_store_append_merges_manifest_overwrite_replaces(spark, tmp_path):
    """Two append jobs to the same bucket must BOTH stay visible through
    the manifest (the only read contract — a manifest naming only the
    second job's objects silently orphans the first); a subsequent
    overwrite replaces the manifest AND reclaims the replaced objects."""
    from mlb_win_predictor_spark.sources.object_store_sink import (
        read_manifest_objects,
        register_object_store_sink,
    )

    register_object_store_sink(spark)
    out = str(tmp_path / "bucket")
    e = load_table(spark, SF, "events").select("event_id").repartition(2)
    e.filter(F.col("event_id") < 40).write.format("object_store").mode("append").save(out)
    e.filter((F.col("event_id") >= 40) & (F.col("event_id") < 70)).write.format(
        "object_store"
    ).mode("append").save(out)
    objs = read_manifest_objects(out)
    assert sum(o["rows"] for o in objs) == 70  # both jobs visible
    # every manifest entry resolves to a real object
    assert all(os.path.exists(os.path.join(out, o["object"])) for o in objs)

    e.filter(F.col("event_id") < 5).write.format("object_store").mode(
        "overwrite"
    ).save(out)
    objs2 = read_manifest_objects(out)
    assert sum(o["rows"] for o in objs2) == 5
    # replaced objects reclaimed: nothing dangling outside the manifest
    on_disk = {p for p in os.listdir(out) if p.startswith("part-")}
    assert on_disk == {o["object"] for o in objs2}


def test_object_store_writer_abort_leaves_nothing_visible(spark, tmp_path):
    """A failed job must publish NO manifest and NO objects (abort path)."""
    import pytest as _pytest

    from mlb_win_predictor_spark.sources.object_store_sink import (
        register_object_store_sink,
    )

    register_object_store_sink(spark)
    out = str(tmp_path / "bucket")
    df = load_table(spark, SF, "events").limit(10).select("event_id")
    with _pytest.raises(Exception):
        (
            df.write.format("object_store")
            .option("inject_fail", "true")
            .mode("append")
            .save(out)
        )
    assert not os.path.exists(os.path.join(out, "_MANIFEST"))
    assert not os.path.isdir(os.path.join(out, "_staged"))
    published = (
        [p for p in os.listdir(out) if p.startswith("part-")]
        if os.path.isdir(out)
        else []
    )
    assert published == []


def test_object_store_stream_replay_retracts_marker_first(tmp_path, monkeypatch):
    """Epoch replay must remove the stale commit marker BEFORE clearing
    the batch dir — otherwise a reader resolving via
    read_committed_stream_batches sees the marker but dangling object
    paths mid-replay. Direct writer-protocol test (no Spark job)."""
    import shutil as _shutil

    from mlb_win_predictor_spark.sources import object_store_sink as oss

    out = str(tmp_path / "bucket")
    w = oss.ObjectStoreStreamWriter({"path": out})

    def stage(name, rows):
        staged = os.path.join(out, "_staged")
        os.makedirs(staged, exist_ok=True)
        with open(os.path.join(staged, name), "w") as f:
            f.write("{}\n" * rows)
        return oss.ObjectCommit(filename=name, n_rows=rows)

    w.commit([stage("part-old.jsonl", 3)], batchId=0)
    assert oss.read_committed_stream_batches(out)[0][0]["object"] == "part-old.jsonl"

    # replay epoch 0: at the moment the batch dir is cleared, the old
    # marker must already be gone (epoch reads as uncommitted)
    real_rmtree = _shutil.rmtree
    seen = {}

    def checking_rmtree(path, **kw):
        if os.path.basename(path) == "batch=0":
            seen["marker_present_at_clear"] = os.path.exists(
                os.path.join(out, "_commits", "0")
            )
        return real_rmtree(path, **kw)

    monkeypatch.setattr(oss.shutil, "rmtree", checking_rmtree)
    w.commit([stage("part-new.jsonl", 5)], batchId=0)
    assert seen["marker_present_at_clear"] is False
    batches = oss.read_committed_stream_batches(out)
    assert [o["object"] for o in batches[0]] == ["part-new.jsonl"]
    assert not os.path.exists(os.path.join(out, "batch=0", "part-old.jsonl"))


def test_object_store_stream_writer_epoch_commits(spark, tmp_path):
    """Streaming Python Data Source writer: per-epoch object prefix +
    commit marker; totals match the source across micro-batches."""
    from mlb_win_predictor_spark.sources.object_store_sink import (
        read_committed_stream_batches,
        register_object_store_sink,
    )

    register_object_store_sink(spark)
    src = tmp_path / "in"
    src.mkdir()
    e = (
        load_table(spark, SF, "events")
        .filter(F.col("event_id") < 60)
        .select("event_id", "event_type", "value")
    )
    e.filter(F.col("event_id") < 30).toPandas().to_parquet(
        str(src / "a.parquet"), index=False
    )
    e.filter(F.col("event_id") >= 30).toPandas().to_parquet(
        str(src / "b.parquet"), index=False
    )
    stream = (
        spark.readStream.schema("event_id long, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = str(tmp_path / "bucket")
    q = (
        stream.writeStream.format("object_store")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    batches = read_committed_stream_batches(out)
    assert len(batches) >= 2  # one epoch per input file
    total = sum(o["rows"] for objs in batches.values() for o in objs)
    assert total == 60
    staged = os.path.join(out, "_staged")
    assert not os.path.isdir(staged) or os.listdir(staged) == []
