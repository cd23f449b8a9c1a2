"""Transaction-log store: versioned snapshots, time travel, snapshot
isolation, optimistic-concurrency conflicts, CDF reads, vacuum."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from mnemo_spark.io import load_table
from mnemo_spark.sources.txlog import CommitConflict, TxTable


@pytest.fixture()
def tx(tmp_path):
    return TxTable(str(tmp_path / "tbl"))


def _orders(spark, sf_dir, lo, hi):
    return load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
    )


def test_append_versions_and_time_travel(spark, sf_dir, tx):
    a = _orders(spark, sf_dir, 0, 100)
    b = _orders(spark, sf_dir, 100, 200)
    assert tx.commit(a) == 0
    assert tx.commit(b) == 1
    na, nb = a.count(), b.count()
    assert tx.snapshot(spark, version=0).count() == na
    assert tx.snapshot(spark).count() == na + nb
    # CDF: the delta between v0 and v1 is exactly batch b
    got = {r["o_orderkey"] for r in tx.changes_between(spark, 0, 1).collect()}
    want = {r["o_orderkey"] for r in b.collect()}
    assert got == want


def test_overwrite_preserves_snapshot_isolation(spark, sf_dir, tx):
    a = _orders(spark, sf_dir, 0, 100)
    tx.commit(a)
    pinned = tx.snapshot(spark, version=0)  # file list resolved now
    n0 = pinned.count()
    replacement = _orders(spark, sf_dir, 500, 550)
    tx.commit(replacement, mode="overwrite")
    # latest sees only the replacement…
    assert tx.snapshot(spark).count() == replacement.count()
    # …while the pinned reader still sees version 0, file-for-file
    assert pinned.count() == n0
    assert tx.snapshot(spark, version=0).count() == n0


def test_commit_conflict_retries_to_next_version(spark, sf_dir, tx):
    tx.commit(_orders(spark, sf_dir, 0, 50))
    # another writer publishes version 1 between our read and publish:
    # pre-create the manifest it would write
    with open(os.path.join(tx.log_dir, "1.json"), "w") as fh:
        json.dump({"version": 1, "adds": [], "removes": [], "ts": 0}, fh)
    v = tx.commit(_orders(spark, sf_dir, 50, 80))
    assert v == 2, "loser must retry and land at the next free version"
    assert tx.versions() == [0, 1, 2]


def test_conflict_exhaustion_raises(spark, sf_dir, tx, monkeypatch):
    tx.commit(_orders(spark, sf_dir, 0, 20))

    def always_conflict(manifest, version):
        raise CommitConflict(version)

    monkeypatch.setattr(tx, "_publish", always_conflict)
    with pytest.raises(CommitConflict):
        tx.commit(_orders(spark, sf_dir, 20, 30), max_retries=3)


def test_vacuum_drops_old_files_keeps_retained(spark, sf_dir, tx):
    tx.commit(_orders(spark, sf_dir, 0, 100))
    tx.commit(_orders(spark, sf_dir, 500, 550), mode="overwrite")
    n1 = tx.snapshot(spark, version=1).count()
    deleted = tx.vacuum(retain_version=1)
    assert deleted, "the overwritten v0 files must be reclaimed"
    # retained snapshot unaffected
    assert tx.snapshot(spark, version=1).count() == n1
    # time travel to v0 is now explicitly gone
    with pytest.raises(Exception):
        tx.snapshot(spark, version=0).count()


def test_crashed_writer_leaves_no_visible_rows(spark, sf_dir, tx):
    tx.commit(_orders(spark, sf_dir, 0, 50))
    n = tx.snapshot(spark).count()
    # simulate a crash after data-file write, before manifest publish
    tx._write_data_files(_orders(spark, sf_dir, 50, 90))
    assert tx.snapshot(spark).count() == n, (
        "unpublished data files must stay invisible"
    )


def test_engine_save_load_roundtrip_with_time_travel(spark, tmp_path):
    import datetime as dt

    from mnemo_spark.engine import MnemoSparkEngine

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = spark.createDataFrame(
        [
            ("m1", "alice", "first fact", "semantic", "private", 0.9, ["a"], t0),
            ("m2", "alice", "second fact", "semantic", "private", 0.5, ["b"], t0),
        ],
        "id string, agent_id string, content string, memory_type string, "
        "scope string, importance float, tags array<string>, "
        "created_at timestamp",
    )
    store = str(tmp_path / "store")
    eng = MnemoSparkEngine(spark).remember_batch(rows)
    v0 = eng.save(store)
    n_mem0 = eng.memories.count()
    n_ev0 = eng.events.count()

    more = spark.createDataFrame(
        [("m3", "bob", "third fact", "semantic", "private", 0.7, ["c"], t0)],
        rows.schema,
    )
    eng2 = eng.remember_batch(more)
    v1 = eng2.save(store)
    assert v1 == v0 + 1

    # latest load sees all three; point-in-time load sees the first two
    latest = MnemoSparkEngine.load(spark, store)
    assert latest.memories.count() == 3
    pinned = MnemoSparkEngine.load(spark, store, version=v0)
    assert pinned.memories.count() == n_mem0
    # the audit log NEVER rolls back: the pinned load still carries the
    # full history, and no event was double-stored by the second save
    assert pinned.events.count() == latest.events.count()
    assert (
        latest.events.count()
        == latest.events.select("event_id").distinct().count()
        > n_ev0 - 1
    )
    # hash chains survive the roundtrip byte-for-byte
    a = {r["id"]: r["chain_hash"] for r in eng2.memories.collect()}
    b = {r["id"]: r["chain_hash"] for r in latest.memories.collect()}
    assert a == b


def test_engine_save_layout_prunes_recall_shaped_loads(spark, tmp_path):
    """r5 partitioned persistence: `engine.save` range-lays-out
    memories by (agent_id, created_at) and events by ts, recording
    per-file min/max in the manifest — so a recall-shaped load (one
    agent / a time window) must open FEWER files than the store holds,
    proven on DataFrame.inputFiles(), not just row counts."""
    import datetime as dt

    from mnemo_spark.engine import MnemoSparkEngine
    from mnemo_spark.sources.txlog import TxTable

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = spark.createDataFrame(
        [
            (f"m{a}{i}", f"agent{a}", f"fact {a}.{i}", "semantic", "private",
             0.5, [], t0 + dt.timedelta(days=a, hours=i))
            for a in range(8)
            for i in range(4)
        ],
        "id string, agent_id string, content string, memory_type string, "
        "scope string, importance float, tags array<string>, "
        "created_at timestamp",
    )
    store = str(tmp_path / "store")
    eng = MnemoSparkEngine(spark).remember_batch(rows)
    eng.save(store, layout_files=4)

    # manifests carry the layout stats save promises
    mem_stats = TxTable(str(tmp_path / "store" / "memories")).file_stats()
    assert all("agent_id" in s and "created_at" in s for s in mem_stats.values())

    full = MnemoSparkEngine.load(spark, store)
    n_mem_files = len(full.memories.inputFiles())
    n_ev_files = len(full.events.inputFiles())
    assert n_mem_files >= 4 and n_ev_files >= 4

    # one-agent load: fewer files opened, only that agent's rows seen
    one = MnemoSparkEngine.load(
        spark, store, mem_where=("agent_id", "agent3", "agent3")
    )
    assert len(one.memories.inputFiles()) < n_mem_files
    assert {r["agent_id"] for r in one.memories.collect()} == {"agent3"}
    assert one.memories.count() == 4

    # time-window event load: fewer files, rows clipped to the window
    lo, hi = t0 + dt.timedelta(days=6), t0 + dt.timedelta(days=8)
    recent = MnemoSparkEngine.load(spark, store, events_where=("ts", lo, hi))
    assert len(recent.events.inputFiles()) < n_ev_files
    ts_vals = [r["ts"] for r in recent.events.collect()]
    assert ts_vals and all(lo <= t <= hi for t in ts_vals)


def test_concurrent_writers_all_land_distinct_versions(spark, sf_dir, tmp_path):
    """Eight threads commit concurrently through the create-exclusive
    manifest protocol: every commit must land, versions must be
    distinct and dense, and the final snapshot must hold every row."""
    from concurrent.futures import ThreadPoolExecutor

    tx = TxTable(str(tmp_path / "conc"))
    batches = [
        _orders(spark, sf_dir, i * 20, i * 20 + 20).persist() for i in range(8)
    ]
    counts = [b.count() for b in batches]  # materialize before racing

    with ThreadPoolExecutor(max_workers=8) as pool:
        versions = list(pool.map(lambda b: tx.commit(b), batches))

    assert sorted(versions) == list(range(8))
    assert tx.snapshot(spark).count() == sum(counts)
    for b in batches:
        b.unpersist()


def test_merge_is_lww_upsert(spark, sf_dir, tx):
    base = _orders(spark, sf_dir, 0, 100)
    tx.commit(base)
    updates = (
        _orders(spark, sf_dir, 50, 120)
        .withColumn("o_orderstatus", F.lit("U"))
    )
    tx.merge(spark, updates, key="o_orderkey")
    snap = tx.snapshot(spark)
    rows = {r["o_orderkey"]: r["o_orderstatus"] for r in snap.collect()}
    # updated keys carry the new status; untouched keys the old one
    upd_keys = {r["o_orderkey"] for r in updates.collect()}
    assert upd_keys and all(rows[k] == "U" for k in upd_keys)
    base_only = {r["o_orderkey"] for r in base.collect()} - upd_keys
    assert base_only and all(rows[k] != "U" for k in base_only)
    assert snap.select("o_orderkey").distinct().count() == len(rows)


def test_log_checkpoint_folds_identically(spark, sf_dir, tx):
    for i in range(4):
        tx.commit(_orders(spark, sf_dir, i * 30, i * 30 + 30))
    full = sorted(tx.live_files())
    cp = tx.checkpoint_log()
    assert cp == 3
    # post-checkpoint fold must see the same files...
    assert sorted(tx.live_files()) == full
    # ...and new commits stack on top of the checkpointed base
    tx.commit(_orders(spark, sf_dir, 200, 220))
    assert set(full) < set(tx.live_files())
    # time travel BEFORE the checkpoint still folds from scratch
    assert tx.snapshot(spark, version=0).count() == _orders(
        spark, sf_dir, 0, 30
    ).count()


def test_file_stats_prune_skips_files(spark, sf_dir, tmp_path):
    """A key-sorted (clustered) layout + manifest min/max stats must
    let a range snapshot skip non-overlapping files entirely —
    metadata-only data skipping, and the pruned read returns exactly
    the rows the unpruned filter would."""
    tx = TxTable(str(tmp_path / "stats"))
    orders = load_table(spark, sf_dir, "orders")
    # clustered write: repartitionByRange gives each file a tight
    # o_orderkey span (the layout OPTIMIZE ZORDER generalizes)
    tx.commit(
        orders.repartitionByRange(8, "o_orderkey"),
        stats_cols=["o_orderkey"],
    )
    stats = tx.file_stats()
    assert len(stats) == 8 and all("o_orderkey" in s for s in stats.values())

    lo, hi = 100, 180
    pruned = tx.snapshot(spark, where=("o_orderkey", lo, hi))
    read_files = {f for f in tx.live_files()
                  if not (stats[f]["o_orderkey"][1] < lo
                          or stats[f]["o_orderkey"][0] > hi)}
    assert len(read_files) < 8, "tight spans must let the range skip files"
    want = orders.filter(F.col("o_orderkey").between(lo, hi))
    assert pruned.count() == want.count() > 0
    # unclustered control: same data committed UNsorted keeps wide
    # per-file spans, so the same predicate prunes nothing
    tx2 = TxTable(str(tmp_path / "nostats"))
    tx2.commit(orders.repartition(8), stats_cols=["o_orderkey"])
    s2 = tx2.file_stats()
    overlap2 = [f for f in tx2.live_files()
                if not (s2[f]["o_orderkey"][1] < lo
                        or s2[f]["o_orderkey"][0] > hi)]
    assert len(overlap2) == 8, "random layout gives no skipping"


def test_compact_shrinks_files_preserves_rows_and_history(spark, sf_dir, tmp_path):
    tx = TxTable(str(tmp_path / "opt"))
    for i in range(5):
        tx.commit(_orders(spark, sf_dir, i * 40, i * 40 + 40))
    n = tx.snapshot(spark).count()
    files_before = len(tx.live_files())
    v_before = tx.latest_version()
    tx.compact(spark, target_files=2)
    assert len(tx.live_files()) == 2 < files_before
    assert tx.snapshot(spark).count() == n
    # pre-compaction versions still time travel
    assert tx.snapshot(spark, version=v_before).count() == n
    assert tx.snapshot(spark, version=0).count() == _orders(
        spark, sf_dir, 0, 40
    ).count()


def test_optimize_zorder_prunes_on_both_dimensions(spark, sf_dir, tmp_path):
    """After OPTIMIZE ZORDER(user_id, day-of-month over events), a
    range predicate on EITHER dimension must skip files — the
    two-dimensional payoff a single-column sort cannot give."""
    tx = TxTable(str(tmp_path / "zopt"))
    events = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.dayofyear("ts").cast("long").alias("doy"),
        "value",
    )
    tx.commit(events.repartition(8))
    tx.optimize_zorder(spark, "user_id", "doy", target_files=16)

    stats = tx.file_stats()
    n_files = len(tx.live_files())

    def overlapping(col, lo, hi):
        return [
            f
            for f in tx.live_files()
            if not (stats[f][col][1] < lo or stats[f][col][0] > hi)
        ]

    # ranges from the DATA's spans (bottom quarter of each dimension),
    # so the test is scale-factor independent
    spans = events.agg(
        F.min("user_id"), F.max("user_id"), F.min("doy"), F.max("doy")
    ).collect()[0]
    ulo, uhi = spans[0], spans[0] + max(1, (spans[1] - spans[0]) // 4)
    dlo, dhi = spans[2], spans[2] + max(1, (spans[3] - spans[2]) // 4)
    assert len(overlapping("user_id", ulo, uhi)) < n_files
    assert len(overlapping("doy", dlo, dhi)) < n_files
    # and the pruned reads stay exact
    for col, lo, hi in (("user_id", ulo, uhi), ("doy", dlo, dhi)):
        got = tx.snapshot(spark, where=(col, lo, hi)).count()
        want = events.filter(F.col(col).between(lo, hi)).count()
        assert got == want > 0


def test_delete_where_is_copy_on_write(spark, sf_dir, tx):
    base = _orders(spark, sf_dir, 0, 100)
    tx.commit(base)
    n = base.count()
    n_del = base.filter("o_orderkey < 20").count()
    v = tx.delete_where(spark, "o_orderkey < 20")
    snap = tx.snapshot(spark)
    assert snap.count() == n - n_del > 0
    assert snap.filter("o_orderkey < 20").count() == 0
    # forgotten rows remain reachable by time travel until vacuum…
    assert tx.snapshot(spark, version=v - 1).count() == n
    # …and vacuum(retain=v) makes the forget durable (GDPR pattern)
    tx.vacuum(retain_version=v)
    with pytest.raises(Exception):
        tx.snapshot(spark, version=v - 1).count()


def test_schema_evolution_is_additive(spark, sf_dir, tx):
    a = _orders(spark, sf_dir, 0, 50).select("o_orderkey", "o_totalprice")
    tx.commit(a)
    b = (
        _orders(spark, sf_dir, 50, 90)
        .select("o_orderkey", "o_totalprice")
        .withColumn("region_tag", F.lit("eu"))
    )
    tx.commit(b)
    snap = tx.snapshot(spark)
    assert "region_tag" in snap.columns
    tagged = snap.filter(F.col("region_tag").isNotNull()).count()
    untagged = snap.filter(F.col("region_tag").isNull()).count()
    assert tagged == b.count() and untagged == a.count()


def test_merge_detects_concurrent_write_conflict(spark, sf_dir, tx):
    """Serializable write-conflict check: a commit landing between
    merge's snapshot read and its publish must make the merge raise
    (not silently drop the concurrent rows); re-running the merge on
    the fresh state succeeds and keeps BOTH updates."""
    tx.commit(_orders(spark, sf_dir, 0, 100))
    base_live = tx.live_files()
    current = tx.snapshot(spark)
    updates = _orders(spark, sf_dir, 50, 120).withColumn(
        "o_orderstatus", F.lit("U")
    )
    survivors = current.join(
        updates.select("o_orderkey").distinct(), "o_orderkey", "left_anti"
    )
    # another writer appends while our merge computes
    concurrent = _orders(spark, sf_dir, 500, 520)
    tx.commit(concurrent)
    with pytest.raises(CommitConflict):
        tx.commit(
            survivors.unionByName(updates),
            mode="overwrite",
            expect_live=base_live,
        )
    # the caller's retry path: re-derive from the fresh snapshot
    tx.merge(spark, updates, key="o_orderkey")
    snap = tx.snapshot(spark)
    got_keys = {r["o_orderkey"] for r in snap.collect()}
    assert {r["o_orderkey"] for r in concurrent.collect()} <= got_keys
    assert {r["o_orderkey"] for r in updates.collect()} <= got_keys
