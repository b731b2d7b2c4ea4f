"""CowTable: transactional MERGE without a jar (VERDICT r7 #2 -- the
sandbox has no network to vendor Delta/Iceberg, so the mechanism is
implemented natively: commit log, atomic commits, copy-on-write file
pruning, time travel).  Semantics are pinned against merge_upsert,
the same transform merge_statement carries to a real catalog."""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from data_wrangling_osm_xml_with_python_into_mongodb_spark.operators.audits import (  # noqa: E402
    merge_upsert,
)
from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (  # noqa: E402
    ConcurrentWriteError,
    CowTable,
    _commit_path,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    # 4 partitions -> 4 data files, so pruning is observable.
    df = spark.range(40).repartition(4).selectExpr("id AS k", "id * 2 AS v")
    return CowTable.create(spark, str(tmp_path / "t"), df)


def test_create_and_read(table):
    assert table.version() == 0
    assert _rows(table.read()) == [(i, 2 * i) for i in range(40)]
    assert len(table.files()) == 4


def test_merge_semantics_match_transform(spark, table):
    """COW merge == merge_upsert over the full snapshot: updates take
    the source row wholesale, unmatched source rows insert, untouched
    target rows persist."""
    target = table.read()
    source = spark.createDataFrame(
        [(5, -5), (39, -39), (100, -100)], "k long, v long"
    )
    table.merge(source, "k")
    assert table.version() == 1
    assert _rows(table.read()) == _rows(merge_upsert(target, source, "k"))


def test_file_pruning(spark, table):
    """A merge touching keys from ONE file carries the other three
    into the new commit by reference -- same paths, not rewritten."""
    one_file = table.files()[0]
    keys = [
        r["k"]
        for r in spark.read.parquet(one_file).select("k").collect()
    ]
    before = set(table.files())
    doc = table.merge(
        spark.createDataFrame([(keys[0], 999)], "k long, v long"), "k"
    )
    assert doc["files_rewritten"] == 1
    assert doc["files_kept"] == 3
    kept = set(table.files()) & before
    assert len(kept) == 3 and one_file not in kept
    # content: exactly one value changed
    assert _rows(table.read().filter(F.col("k") == keys[0]))[0][1] == 999
    assert table.read().count() == 40


def test_insert_only_merge_keeps_all_files(spark, table):
    """No matched keys -> zero rewrites; inserts land in a new file."""
    doc = table.merge(
        spark.createDataFrame([(1000, 1), (1001, 2)], "k long, v long"), "k"
    )
    assert doc["files_rewritten"] == 0
    assert doc["files_kept"] == 4
    assert table.read().count() == 42


def test_time_travel_and_history(spark, table):
    table.merge(spark.createDataFrame([(0, -1)], "k long, v long"), "k")
    table.merge(spark.createDataFrame([(0, -2)], "k long, v long"), "k")
    assert table.version() == 2
    assert _rows(table.read(0).filter("k = 0")) == [(0, 0)]
    assert _rows(table.read(1).filter("k = 0")) == [(0, -1)]
    assert _rows(table.read(2).filter("k = 0")) == [(0, -2)]
    ops = [c["op"] for c in table.history()]
    assert ops == ["create", "merge", "merge"]


def test_concurrent_commit_conflict(spark, table):
    """Optimistic concurrency: a commit racing into an already-taken
    version number must fail atomically, leave the winner's snapshot
    intact, and leave no orphan files visible to readers."""
    # Simulate the race: someone else commits version 1 after this
    # writer read its snapshot (pin the stale read by freezing
    # version(), exactly what a slow writer sees).
    winner = table._commit(1, table.files(0), "merge", {"parent": 0})
    table.version = lambda: 0  # type: ignore[method-assign]
    with pytest.raises(ConcurrentWriteError):
        table.merge(spark.createDataFrame([(0, -1)], "k long, v long"), "k")
    del table.version
    assert table.version() == 1
    assert table._commit_doc(1) == winner
    # loser's data dir was cleaned up
    assert not os.path.exists(os.path.join(table.path, "data", "v1"))
    assert table.read().count() == 40


def test_merge_with_deletes(spark, table):
    """whenMatchedDelete semantics: delete keys vanish, a key in BOTH
    source and deletes ends with the source row (delete-then-upsert
    precedence), deletes of absent keys are no-ops, and files without
    any touched key still carry over by reference."""
    source = spark.createDataFrame([(5, -5), (7, -7)], "k long, v long")
    deletes = spark.createDataFrame([(6,), (7,), (999,)], "k long")
    before = {os.path.basename(f) for f in table.files()}
    stats = table.merge(source, "k", deletes=deletes)
    got = dict(_rows(table.read()))
    assert 6 not in got            # deleted
    assert got[5] == -5            # upserted
    assert got[7] == -7            # delete-then-upsert: source wins
    assert len(got) == 39          # 40 - key 6; keys 5/7 stay present
    assert stats["delete_keys"] == 3
    # pruning still holds: only files containing 5/6/7/999 rewritten
    kept_now = {os.path.basename(f) for f in table.files()} & before
    assert stats["files_kept"] == len(kept_now) > 0


def test_create_refuses_overwrite(spark, table):
    with pytest.raises(FileExistsError):
        CowTable.create(table.spark, table.path, table.read())


def test_commit_path_shape(table):
    assert _commit_path(table.path, 7).endswith("_log/00000007.json")


def test_commit_log_carries_footer_stats(spark, table):
    """Every commit records per-file rows + column min/max harvested
    from the parquet footers; carried-over files keep their parent's
    entry verbatim (the files are immutable)."""
    doc0 = table._commit_doc(0)
    fstats = doc0["file_stats"]
    assert set(fstats) == {os.path.basename(f) for f in table.files()}
    assert sum(s["rows"] for s in fstats.values()) == 40
    mins = [s["cols"]["k"]["min"] for s in fstats.values()]
    maxs = [s["cols"]["k"]["max"] for s in fstats.values()]
    assert min(mins) == 0 and max(maxs) == 39
    # merge: kept files' stats carry, new file gets fresh stats
    table.merge(spark.createDataFrame([(0, 99)], "k long, v long"), "k")
    doc1 = table._commit_doc(1)
    for f in table.files():
        b = os.path.basename(f)
        assert b in doc1["file_stats"]
        if b in fstats:
            assert doc1["file_stats"][b] == fstats[b]


def test_read_range_skips_files(spark, tmp_path):
    """Range-partitioned layout -> disjoint per-file key ranges -> a
    narrow predicate opens ~1 file; results equal the full filter."""
    df = (
        spark.range(1000)
        .selectExpr("id AS k", "id * 3 AS v")
        .repartitionByRange(10, "k")
    )
    table = CowTable.create(spark, str(tmp_path / "rr"), df)
    got = table.read_range("k", 250, 260)
    assert _rows(got) == [(i, 3 * i) for i in range(250, 261)]
    assert table.last_scan["files_total"] == 10
    assert table.last_scan["files_skipped"] >= 8
    # one-sided bounds and the never-skip fallback for unknown columns
    assert table.read_range("k", lo=990).count() == 10
    assert table.read_range("k", hi=9).count() == 10
    got_all = table.read_range("nope_no_stats", lo=None, hi=None)
    assert got_all.count() == 1000
    # empty intersection: zero files opened, schema preserved
    empty = table.read_range("k", 5000, 6000)
    assert empty.count() == 0
    assert empty.columns == ["k", "v"]
    assert table.last_scan["files_scanned"] == 0


def test_compact_binpacks_small_files(spark, tmp_path):
    """OPTIMIZE analogue: small files collapse into ceil(total/target)
    files, big files carry by reference, content is unchanged, and
    history still time-travels to the fragmented version."""
    small = spark.range(64).selectExpr("id AS k", "id AS v").repartition(16)
    table = CowTable.create(spark, str(tmp_path / "c"), small)
    big = spark.createDataFrame(
        [(i, i) for i in range(1000, 1500)], "k long, v long"
    ).coalesce(1)
    table.merge(big, "k")
    before = _rows(table.read())
    n_before = len(table.files())
    stats = table.compact(target_rows=100)
    assert stats["op"] == "compact" and "noop" not in stats
    assert stats["files_kept"] == 1          # the 500-row file survives
    assert stats["files_written"] == 1       # 64+16 rows pack into one
    assert len(table.files()) < n_before
    assert _rows(table.read()) == before     # pure rewrite
    assert _rows(table.read(version=1)) == before  # time travel intact
    # idempotent: a second pass finds nothing to pack
    again = table.compact(target_rows=100)
    assert again.get("noop") is True
    # stats survived compaction: skipping still works on the new layout
    table.read_range("k", 1200, 1210)
    assert table.last_scan["files_skipped"] >= 1


def test_read_range_date_typed_stats(spark, tmp_path):
    """DATE stats encode as ISO strings (lexicographic == chronological)
    and date-typed bounds skip files -- the m13 query's mechanism."""
    import datetime

    df = (
        spark.range(365)
        .selectExpr(
            "date_add(DATE '2020-01-01', CAST(id AS INT)) AS d",
            "id AS v",
        )
        .repartitionByRange(6, "d")
    )
    table = CowTable.create(spark, str(tmp_path / "d"), df)
    got = table.read_range(
        "d", datetime.date(2020, 3, 1), datetime.date(2020, 3, 31)
    )
    assert got.count() == 31
    assert table.last_scan["files_skipped"] >= 4
    full = table.read().filter(
        (F.col("d") >= F.lit(datetime.date(2020, 3, 1)))
        & (F.col("d") <= F.lit(datetime.date(2020, 3, 31)))
    )
    assert _rows(got) == _rows(full)


def test_vacuum_expires_old_versions(spark, table):
    """VACUUM deletes files only expired commits reference; retained
    snapshots stay readable, expired ones keep metadata but lose data
    (Delta's contract)."""
    table.merge(
        spark.createDataFrame([(i, -i) for i in range(40)], "k long, v long"),
        "k",
    )  # rewrites every file -> v0's files become exclusive to v0
    before = _rows(table.read())
    summary = table.vacuum(retain_last=1, orphan_grace_s=0.0)
    assert summary["files_deleted"] >= 4
    assert summary["retained_versions"] == [1, 1]
    assert _rows(table.read()) == before          # latest intact
    assert table._commit_doc(0)["op"] == "create" # history metadata survives
    with pytest.raises(Exception):
        table.read(version=0).collect()           # data gone past horizon


def test_vacuum_keeps_shared_files(spark, table):
    """A file carried by reference into a retained snapshot must
    survive vacuum even though an expired commit also lists it."""
    table.merge(spark.createDataFrame([(0, 99)], "k long, v long"), "k")
    shared = set(table.files(0)) & set(table.files(1))
    assert shared  # 3 of the 4 v0 files carry into v1
    table.vacuum(retain_last=1, orphan_grace_s=0.0)
    for f in shared:
        assert os.path.exists(f)
    assert table.read().count() == 40
    # retain_last=2 keeps both snapshots fully readable
    table2 = CowTable.create(
        spark, table.path + "_2",
        spark.range(10).repartition(2).selectExpr("id AS k", "id AS v"),
    )
    table2.merge(spark.createDataFrame([(0, 1)], "k long, v long"), "k")
    table2.vacuum(retain_last=2, orphan_grace_s=0.0)
    assert table2.read(version=0).count() == 10
    assert table2.read(version=1).count() == 10


def test_vacuum_orphan_grace(spark, table, tmp_path):
    """Files referenced by NO commit (lost-race leftovers) are deleted
    only past the grace window -- a fresh orphan survives."""
    orphan_dir = os.path.join(table.path, "data", "v99")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-leftover.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")
    s1 = table.vacuum(retain_last=1, orphan_grace_s=3600.0)
    assert s1["orphans_in_grace"] == 1 and os.path.exists(orphan)
    s2 = table.vacuum(retain_last=1, orphan_grace_s=0.0)
    assert s2["files_deleted"] == 1
    assert not os.path.exists(orphan_dir)  # emptied dir removed wholesale
    assert table.read().count() == 40


def test_compact_cluster_by_enables_skipping(spark, tmp_path):
    """OPTIMIZE-with-clustering: a hash-fragmented layout (every file
    spans the whole key range -> skipping useless) compacts into
    range-disjoint files, after which read_range prunes most of the
    table.  Content stays a pure rewrite."""
    df = spark.range(1000).selectExpr("id AS k", "id * 7 AS v").repartition(16)
    table = CowTable.create(spark, str(tmp_path / "z"), df)
    table.read_range("k", 100, 120)
    assert table.last_scan["files_skipped"] == 0  # hash layout: no pruning
    before = _rows(table.read())
    stats = table.compact(target_rows=150, cluster_by="k")
    assert stats["cluster_by"] == "k" and stats["files_written"] >= 6
    assert _rows(table.read()) == before          # pure rewrite
    got = table.read_range("k", 100, 120)
    assert _rows(got) == [(i, 7 * i) for i in range(100, 121)]
    assert table.last_scan["files_skipped"] >= stats["files_written"] - 2


def test_timestamp_stats_tz_safety(spark, tmp_path):
    """Round-10 ADVICE (medium): parquet footer stats for Spark-written
    timestamps decode tz-AWARE (UTC-adjusted), while a naive datetime
    bound is session-local wall time.  Comparing the two clocks
    lexicographically could falsely SKIP a file holding matching rows.
    Contract pinned here: aware-vs-naive is never comparable (file is
    scanned -> results equal the exact filter), aware bounds normalize
    to UTC and do skip."""
    import datetime

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (
        _enc_stat,
        _stat_cmp_ok,
    )

    # unit: the comparator refuses mixed-awareness datetime strings,
    # and aware encodings are UTC-normalized (offset folded in).
    est = datetime.timezone(datetime.timedelta(hours=-5))
    aware = datetime.datetime(2024, 1, 2, 3, 0, tzinfo=est)
    naive = datetime.datetime(2024, 1, 2, 3, 0)
    assert _enc_stat(aware) == "2024-01-02T08:00:00+00:00"
    assert _enc_stat(naive) == "2024-01-02T03:00:00"
    assert not _stat_cmp_ok(_enc_stat(aware), _enc_stat(naive))
    assert _stat_cmp_ok(_enc_stat(aware), _enc_stat(naive.replace(
        tzinfo=datetime.timezone.utc)))
    assert _stat_cmp_ok(_enc_stat(naive), _enc_stat(naive))  # same clock
    assert _stat_cmp_ok("plain", "strings")  # non-datetime strings still ok

    # e2e in a non-UTC session with stats-bearing timestamp encoding.
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    ts0 = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        df = spark.range(48).selectExpr(
            "TIMESTAMP '2024-01-02 00:00:00' + "
            "make_interval(0,0,0,0,CAST(id AS INT),0,0) AS ts",
            "id AS v",
        ).repartitionByRange(4, "ts")
        t = CowTable.create(spark, str(tmp_path / "ts"), df)
        lo = datetime.datetime(2024, 1, 2, 3, 0)
        hi = datetime.datetime(2024, 1, 2, 5, 0)
        # naive bounds vs aware stats: NOTHING may be skipped (two
        # clocks -- pyspark itself converts a naive lit via the
        # DRIVER's tz, a third clock, which is exactly why guessing
        # is forbidden), and the result equals the exact filter.
        got = t.read_range("ts", lo, hi)
        exact = t.read().filter(
            (F.col("ts") >= F.lit(lo)) & (F.col("ts") <= F.lit(hi))
        )
        assert _rows(got) == _rows(exact)
        assert t.last_scan["files_skipped"] == 0
        # aware bounds (unambiguous instants): skipping engages, and
        # rows equal the exact aware filter -- 3 hourly rows.
        est5 = datetime.timezone(datetime.timedelta(hours=-5))
        lo_a, hi_a = lo.replace(tzinfo=est5), hi.replace(tzinfo=est5)
        got2 = t.read_range("ts", lo_a, hi_a)
        exact2 = t.read().filter(
            (F.col("ts") >= F.lit(lo_a)) & (F.col("ts") <= F.lit(hi_a))
        )
        assert _rows(got2) == _rows(exact2) and got2.count() == 3
        assert t.last_scan["files_skipped"] >= 2
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
        spark.conf.set("spark.sql.parquet.outputTimestampType", ts0)


def test_empty_snapshot_reads_typed_empty(spark, table):
    """Round-10 ADVICE: a snapshot with zero data files (everything
    deleted / all files skipped) must return a correctly-typed empty
    frame, not IndexError.  The schema rides in every commit doc."""
    empty_src = spark.createDataFrame([], "k long, v long")
    all_keys = table.read().select("k")
    table.merge(empty_src, "k", deletes=all_keys)
    assert table.read().count() == 0
    assert table.read().columns == ["k", "v"]
    assert table.read_range("k", 0, 100).count() == 0
    assert table.read_range("k", 0, 100).columns == ["k", "v"]
    # belt-and-braces: an explicitly file-less commit reads fine too
    v = table.version()
    table._commit(
        v + 1, [], "merge",
        {"parent": v, "schema": table._snapshot_schema(v).jsonValue()},
    )
    assert table.read().count() == 0 and table.read().columns == ["k", "v"]


def test_stats_harvest_executor_side_matches_driver(spark, tmp_path):
    """VERDICT r10 #1: commits with many files harvest footer stats in
    ONE executor-side job instead of a driver loop of footer opens.
    Both paths are the same function over the same footers -- pinned
    byte-equal here on a 20-file create (above _DRIVER_STATS_MAX)."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources import (
        cow_table as ct,
    )

    df = spark.range(400).selectExpr("id AS k", "id * 2 AS v").repartition(20)
    t = CowTable.create(spark, str(tmp_path / "h"), df)
    files = t.files()
    assert len(files) == 20 > ct._DRIVER_STATS_MAX
    driver = {os.path.basename(f): ct._file_footer_stats(f) for f in files}
    assert t._commit_doc(0)["file_stats"] == driver
    # and the harvest helper agrees with itself on both paths
    assert t._harvest_file_stats(files) == driver
    # skipping works off the executor-harvested stats
    t2 = CowTable.create(
        spark,
        str(tmp_path / "h2"),
        spark.range(400).selectExpr("id AS k", "id AS v")
        .repartitionByRange(20, "k"),
    )
    assert t2.read_range("k", 100, 110).count() == 11
    assert t2.last_scan["files_skipped"] >= 17


def test_merge_rebase_lands_disjoint_concurrent(spark, tmp_path, monkeypatch):
    """VERDICT r10 #5: optimistic concurrency with rebase.  Two writers
    merge key-disjoint sources; the loser detects the race, re-resolves
    against the new head, and BOTH updates land (Delta's protocol)."""
    df = (
        spark.range(40)
        .selectExpr("id AS k", "id * 2 AS v")
        .repartitionByRange(4, "k")
    )
    t1 = CowTable.create(spark, str(tmp_path / "race"), df)
    orig = CowTable._commit
    fired = {}

    def racing(self, version, files, op, stats):
        if op == "merge" and not fired:
            fired["x"] = True  # competitor wins the race exactly once
            CowTable(spark, str(tmp_path / "race")).merge(
                spark.createDataFrame([(39, -39)], "k long, v long"), "k"
            )
        return orig(self, version, files, op, stats)

    monkeypatch.setattr(CowTable, "_commit", racing)
    doc = t1.merge(
        spark.createDataFrame([(0, -1)], "k long, v long"), "k", retries=1
    )
    assert doc["version"] == 2 and doc["parent"] == 1
    got = dict(_rows(t1.read()))
    assert got[0] == -1 and got[39] == -39  # both writers' rows landed
    assert [c["op"] for c in t1.history()] == ["create", "merge", "merge"]


def test_merge_rebase_conflict_raises(spark, tmp_path, monkeypatch):
    """Overlapping concurrent merges (same file -> possibly same keys)
    must NOT rebase silently: ConcurrentMergeConflictError, raised
    deterministically even with retries left."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (
        ConcurrentMergeConflictError,
    )

    df = (
        spark.range(40)
        .selectExpr("id AS k", "id * 2 AS v")
        .repartitionByRange(4, "k")
    )
    t1 = CowTable.create(spark, str(tmp_path / "race2"), df)
    orig = CowTable._commit
    fired = {}

    def racing(self, version, files, op, stats):
        if op == "merge" and not fired:
            fired["x"] = True
            CowTable(spark, str(tmp_path / "race2")).merge(
                spark.createDataFrame([(1, -1)], "k long, v long"), "k"
            )
        return orig(self, version, files, op, stats)

    monkeypatch.setattr(CowTable, "_commit", racing)
    with pytest.raises(ConcurrentMergeConflictError):
        t1.merge(
            spark.createDataFrame([(0, -2)], "k long, v long"), "k", retries=3
        )
    # winner's row intact, loser left nothing behind
    assert dict(_rows(t1.read()))[1] == -1
    assert t1.version() == 1


def test_compact_rebase_after_race(spark, tmp_path, monkeypatch):
    """compact() is a pure layout rewrite -- rebase after a lost race
    is always safe: the retry re-plans over the winner's snapshot."""
    df = spark.range(64).selectExpr("id AS k", "id AS v").repartition(16)
    t = CowTable.create(spark, str(tmp_path / "crace"), df)
    orig = CowTable._commit
    fired = {}

    def racing(self, version, files, op, stats):
        if op == "compact" and not fired:
            fired["x"] = True
            CowTable(spark, str(tmp_path / "crace")).merge(
                spark.createDataFrame([(0, 99)], "k long, v long"), "k"
            )
        return orig(self, version, files, op, stats)

    monkeypatch.setattr(CowTable, "_commit", racing)
    before_rows = dict(_rows(t.read()))
    before_rows[0] = 99  # the racing merge lands first
    doc = t.compact(target_rows=100, retries=1)
    assert doc["op"] == "compact" and doc["parent"] == 1
    assert dict(_rows(t.read())) == before_rows


def test_vacuum_under_inflight_reader(spark, table):
    """VERDICT r10 #6: the retention contract for readers.  A DataFrame
    opened against version N fails CLEANLY (missing input files), never
    silently returning stale/partial rows, once vacuum's retention
    excludes N; re-opening N afterwards also fails cleanly.  (v0's
    files are referenced by commit 0, so the orphan grace window does
    not apply -- grace shields only never-committed files.)"""
    df0 = table.read(version=0)
    assert df0.count() == 40  # readable before vacuum
    table.merge(
        spark.createDataFrame([(i, -i) for i in range(40)], "k long, v long"),
        "k",
    )  # rewrites every file -> v0's files become exclusive to v0
    table.vacuum(retain_last=1, orphan_grace_s=3600.0)
    with pytest.raises(Exception) as ei:
        df0.collect()
    msg = str(ei.value)
    assert "not exist" in msg or "FileNotFound" in msg or "PATH_NOT_FOUND" in msg
    with pytest.raises(Exception):
        table.read(version=0).collect()
    # the retained snapshot is untouched throughout
    assert dict(_rows(table.read()))[5] == -5


def test_merge_match_scan_pruned_by_key_range(spark, tmp_path):
    """Data skipping applied to MERGE: on a range-clustered layout a
    narrow-range batch's affected-file scan READS only the files whose
    key range intersects the batch envelope (files_probed < total);
    results equal merge_upsert either way, and a hash layout degrades
    gracefully to probing everything."""
    clustered = CowTable.create(
        spark,
        str(tmp_path / "cl"),
        spark.range(1000)
        .selectExpr("id AS k", "id * 2 AS v")
        .repartitionByRange(10, "k"),
    )
    target = clustered.read()
    src = spark.createDataFrame([(250, -1), (251, -2)], "k long, v long")
    doc = clustered.merge(src, "k")
    assert doc["files_probed"] <= 2 < len(clustered.files(0))
    assert doc["files_rewritten"] <= 2
    assert _rows(clustered.read()) == _rows(merge_upsert(target, src, "k"))

    # an insert-only batch beyond the table's key range probes NOTHING
    # (its envelope intersects no file) and still lands the insert.
    target = clustered.read()
    far = spark.createDataFrame([(2000, -3)], "k long, v long")
    doc_far = clustered.merge(far, "k")
    assert doc_far["files_probed"] == 0 and doc_far["files_rewritten"] == 0
    assert _rows(clustered.read()) == _rows(merge_upsert(target, far, "k"))

    # hash layout: every file's range spans the key space -> no skip,
    # but nothing breaks and everything is probed.
    hashed = CowTable.create(
        spark,
        str(tmp_path / "ha"),
        spark.range(1000).selectExpr("id AS k", "id * 2 AS v").repartition(8),
    )
    doc2 = hashed.merge(src, "k")
    assert doc2["files_probed"] == 8
    hashed.merge(far, "k")
    assert _rows(hashed.read()) == _rows(clustered.read())

    # deletes participate in the envelope: a delete-only batch outside
    # every file's range probes nothing and rewrites nothing.
    doc3 = clustered.merge(
        spark.createDataFrame([], "k long, v long"),
        "k",
        deletes=spark.createDataFrame([(10_000,)], "k long"),
    )
    assert doc3["files_probed"] == 0 and doc3["files_rewritten"] == 0
    # and a delete-only batch INSIDE a range still lands correctly
    doc4 = clustered.merge(
        spark.createDataFrame([], "k long, v long"),
        "k",
        deletes=spark.createDataFrame([(250,)], "k long"),
    )
    assert doc4["files_probed"] <= 2
    assert 250 not in dict(_rows(clustered.read()))


def test_merge_schema_evolution(spark, table):
    """evolve_schema=True (mergeSchema analogue): a source-only column
    joins the table schema; carried files read as NULL for it, the
    rewritten/new rows carry values, old snapshots keep their narrower
    schema, and the default (False) keeps projecting it away."""
    src = spark.createDataFrame(
        [(5, -5, "x"), (100, -100, "y")], "k long, v long, tag string"
    )
    # default: projection drops the unknown column, schema unchanged
    table.merge(src, "k")
    assert table.read().columns == ["k", "v"]
    # evolution: the column lands
    doc = table.merge(src, "k", evolve_schema=True)
    assert doc["files_kept"] > 0  # old-schema files carried by reference
    got = table.read()
    assert got.columns == ["k", "v", "tag"]
    by_k = {r["k"]: r for r in got.collect()}
    assert by_k[5]["tag"] == "x" and by_k[100]["tag"] == "y"
    assert by_k[6]["tag"] is None          # carried file: NULL-filled
    assert got.count() == 41
    # time travel keeps the old shape; a later plain merge preserves
    # the evolved schema (source must now carry every table column)
    assert table.read(version=1).columns == ["k", "v"]
    table.merge(
        spark.createDataFrame([(6, 66, "z")], "k long, v long, tag string"),
        "k",
    )
    assert {r["k"]: r["tag"] for r in table.read().collect()}[6] == "z"
    # read_range on the evolved column: old files lack stats for it ->
    # always scanned, never wrongly skipped
    assert table.read_range("tag", "x", "z").count() == 3


def test_stat_encoding_order_preservation_property():
    """Property pin for the skipping correctness argument: whenever
    _stat_cmp_ok says two encoded stats are comparable, their encoded
    (lexicographic/numeric) order must equal the true order of the
    underlying values.  A violation here is a silent wrong-skip bug;
    refusing to compare (False) is always safe."""
    import datetime

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (
        _enc_stat,
        _stat_cmp_ok,
    )

    utc = datetime.timezone.utc
    zones = st.sampled_from(
        [utc]
        + [
            datetime.timezone(datetime.timedelta(hours=h))
            for h in (-11, -5, -1, 1, 5, 13)
        ]
    )
    aware_dt = st.datetimes(
        min_value=datetime.datetime(1900, 1, 1),
        max_value=datetime.datetime(2200, 1, 1),
        timezones=zones,
    )
    naive_dt = st.datetimes(
        min_value=datetime.datetime(1900, 1, 1),
        max_value=datetime.datetime(2200, 1, 1),
    )
    values = st.one_of(
        st.integers(min_value=-(2**53), max_value=2**53),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        st.dates(),
        naive_dt,
        aware_dt,
    )

    def true_order_known(a, b):
        """True order of the raw values, when Python can compare them."""
        try:
            return (a < b) - (b < a)
        except TypeError:
            return None

    @settings(max_examples=300, deadline=None)
    @given(values, values)
    def prop(a, b):
        ea, eb = _enc_stat(a), _enc_stat(b)
        assert ea is not None and eb is not None
        if not _stat_cmp_ok(ea, eb):
            return  # refusing to compare is always safe
        t = true_order_known(a, b)
        if t is None:
            return  # cross-type pairs Python itself cannot order
        enc = (ea < eb) - (eb < ea)
        # bool-vs-numeric mixes are rejected by _stat_cmp_ok, dates
        # encode as strings vs numeric stay numeric -> comparable
        # pairs must agree with the true order exactly.
        assert enc == t, (a, b, ea, eb)

    prop()


def test_commit_log_checkpointing(spark, tmp_path):
    """VERDICT r11 #1: a checkpoint manifest every N commits bounds
    every metadata walk to O(interval) commit reads.  ~300 commits are
    laid down (metadata-plane: the commit docs reference the create's
    real files -- exactly what a long-lived stream-maintained table
    accrues), then checkpoint-anchored reads are pinned EQUAL to full
    log walks for: snapshot files, schema resolution, vacuum's
    ever-referenced set, and the per-app txn high-water -- with the
    read counts measured, not assumed."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources import (
        cow_table as ct,
    )

    df = spark.range(60).selectExpr("id AS k", "id * 2 AS v").repartition(6)
    t = CowTable.create(spark, str(tmp_path / "ck"), df)
    files = t.files()
    assert t._commit_doc(0)["txn"] == {}

    # ~300 synthetic merge commits: rotate which files stay referenced
    # and which app committed, via the same _commit/_next_txn path a
    # real merge takes (auto-checkpoint fires inside _commit).
    n = 300
    for v in range(1, n + 1):
        refd = files[v % 3:]  # drop 0-2 files from this snapshot
        meta = {"app_id": f"app{v % 2}", "batch_id": v}
        t._commit(
            v, refd, "merge",
            {
                "parent": v - 1,
                "app_meta": meta,
                "txn": t._next_txn(v - 1, meta),
                "file_stats": {
                    os.path.basename(f): t._commit_doc(0)["file_stats"][
                        os.path.basename(f)
                    ]
                    for f in refd
                },
                "schema": t._commit_doc(0)["schema"],
            },
        )
    assert t.version() == n

    # checkpoints exist at every interval multiple; pointer at newest
    interval = t.checkpoint_interval
    ck = t._read_last_checkpoint()
    assert ck is not None and ck["version"] == n - (n % interval)
    for v in range(interval, n + 1, interval):
        assert os.path.exists(ct._checkpoint_path(t.path, v))

    # checkpoint == full walk: ever-referenced set
    full_ever = set()
    for v in range(n + 1):
        full_ever.update(t._commit_doc(v)["files"])
    anchored = set(ck["all_files"])
    for v in range(ck["version"] + 1, n + 1):
        anchored.update(t._commit_doc(v)["files"])
    assert anchored == full_ever

    # checkpoint == full walk: txn high-water per app
    def full_walk_txn(app):
        best = -1
        for v in range(n + 1):
            m = t._commit_doc(v).get("app_meta") or {}
            if m.get("app_id") == app:
                best = max(best, int(m["batch_id"]))
        return best

    for app in ("app0", "app1", "ghost"):
        assert t.txn_version(app) == full_walk_txn(app)

    # and the lookup is O(1): ONE commit-doc read (head carries txn)
    reads = []
    orig = CowTable._commit_doc
    try:
        CowTable._commit_doc = lambda self, v: (reads.append(v), orig(self, v))[1]
        assert t.txn_version("app0") == n if n % 2 == 0 else n - 1
        assert len(reads) == 1
        # schema resolution reads at most O(interval) docs
        reads.clear()
        t._snapshot_schema(n)
        assert len(reads) <= interval + 1
        # vacuum's log walk is checkpoint-anchored: O(interval +
        # retain_last), nowhere near the 301-doc full walk
        reads.clear()
        t.vacuum(retain_last=2, orphan_grace_s=0.0)
        assert len(reads) <= interval + 4
    finally:
        CowTable._commit_doc = orig

    # vacuum preserved exactly the retained snapshots' files
    live = {
        os.path.abspath(f)
        for v in (n - 1, n)
        for f in t.files(v)
    }
    on_disk = {
        os.path.abspath(os.path.join(r, x))
        for r, _, xs in os.walk(os.path.join(t.path, "data"))
        for x in xs
        if x.endswith(".parquet")
    }
    assert on_disk == live
    assert _rows(t.read()) == sorted(
        (r["k"], r["v"])
        for f in t.files(n)
        for r in spark.read.parquet(f).collect()
    )


def test_txn_lookup_on_legacy_log_is_checkpoint_bounded(spark, tmp_path):
    """Pre-txn-tracking logs (commits without the cumulative map) fall
    back to a newest-first app_meta walk -- bounded by the checkpoint,
    which summarizes everything at or below it."""
    df = spark.range(8).selectExpr("id AS k", "id AS v").coalesce(1)
    t = CowTable.create(spark, str(tmp_path / "legacy"), df)
    files, schema = t.files(), t._commit_doc(0)["schema"]
    # 40 legacy commits: app_meta only, NO txn field
    for v in range(1, 41):
        t._commit(
            v, files, "merge",
            {
                "parent": v - 1,
                "app_meta": {"app_id": "legacy_app", "batch_id": v},
                "schema": schema,
            },
        )
    # strip the create's txn to make the WHOLE log legacy
    p = _commit_path(t.path, 0)
    with open(p) as f:
        doc = json.load(f)
    doc.pop("txn", None)
    os.remove(p)
    with open(p, "w") as f:
        json.dump(doc, f)

    t.checkpoint()  # manifest folds app_meta into its txn map
    ck = t._read_last_checkpoint()
    assert ck["version"] == 40 and ck["txn"] == {"legacy_app": 40}

    # lay 5 more legacy commits above the checkpoint for another app
    for v in range(41, 46):
        t._commit(
            v, files, "merge",
            {
                "parent": v - 1,
                "app_meta": {"app_id": "other_app", "batch_id": v},
                "schema": schema,
            },
        )
    reads = []
    orig = CowTable._commit_doc
    try:
        CowTable._commit_doc = lambda self, v: (reads.append(v), orig(self, v))[1]
        assert t.txn_version("legacy_app") == 40   # answered BY the ckpt
        assert len(reads) <= 6                     # head..ckpt, not 46
        reads.clear()
        assert t.txn_version("other_app") == 45    # newest commit wins
        assert len(reads) == 1
        reads.clear()
        assert t.txn_version("ghost") == -1
        assert len(reads) <= 6
    finally:
        CowTable._commit_doc = orig


def test_large_delete_batch_uses_join_path(spark, tmp_path, monkeypatch):
    """Round-11 ADVICE: above _DELETE_INLINE_MAX distinct keys, merge()
    must not inline deletes as an isin() literal (Catalyst-plan /
    driver-memory hazard) -- the join path takes over with IDENTICAL
    semantics.  Threshold shrunk to 5 to exercise the path; results
    pinned equal to the reference transform, NULL-keyed rows survive."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources import (
        cow_table as ct,
    )

    monkeypatch.setattr(ct, "_DELETE_INLINE_MAX", 5)
    df = spark.range(40).selectExpr(
        "CASE WHEN id = 37 THEN NULL ELSE id END AS k", "id * 2 AS v"
    ).repartition(4)
    t = CowTable.create(spark, str(tmp_path / "bigdel"), df)
    dels = spark.range(10, 22).selectExpr("id AS k")  # 12 > 5 keys
    src = spark.createDataFrame([(20, -20), (100, -100)], "k long, v long")
    doc = t.merge(src, "k", deletes=dels)
    assert doc["delete_keys"] == 12
    want = sorted(
        [(k, 2 * k) for k in range(40) if k != 37 and not (10 <= k < 22)]
        + [(None, 74), (20, -20), (100, -100)],
        key=lambda r: (r[0] is not None, r[0] if r[0] is not None else 0, r[1]),
    )
    got = sorted(
        ((r["k"], r["v"]) for r in t.read().collect()),
        key=lambda r: (r[0] is not None, r[0] if r[0] is not None else 0, r[1]),
    )
    assert got == want


def test_concurrent_schema_evolution_rebase(spark, tmp_path, monkeypatch):
    """VERDICT r11 #5: schema evolution UNDER the optimistic-
    concurrency rebase.  A non-evolving merge that loses the race to a
    schema-widening commit must fail DETERMINISTICALLY with the
    missing column named (Delta's MetadataChanged analogue), never a
    silent drop; two concurrent EVOLVING merges rebase into the union
    schema with NULL-fills."""
    df = (
        spark.range(40)
        .selectExpr("id AS k", "id * 2 AS v")
        .repartitionByRange(4, "k")
    )
    path = str(tmp_path / "evorace")
    t = CowTable.create(spark, path, df)
    orig = CowTable._commit

    def make_racer(evolving_src):
        fired = {}

        def racing(self, version, files, op, stats):
            if op == "merge" and not fired:
                fired["x"] = True
                CowTable(spark, path).merge(
                    evolving_src, "k", evolve_schema=True
                )
            return orig(self, version, files, op, stats)

        return racing

    # round 1: plain loser vs evolving winner (disjoint files: winner
    # touches k=39's file, loser k=0's) -> deterministic ValueError
    winner = spark.createDataFrame([(39, -39, "w")], "k long, v long, tag string")
    monkeypatch.setattr(CowTable, "_commit", make_racer(winner))
    with pytest.raises(ValueError, match="tag"):
        t.merge(
            spark.createDataFrame([(0, -1)], "k long, v long"), "k", retries=2
        )
    monkeypatch.setattr(CowTable, "_commit", orig)
    assert t.read().columns == ["k", "v", "tag"]  # winner landed alone
    assert dict((r["k"], r["tag"]) for r in t.read().collect())[39] == "w"

    # round 2: evolving loser vs evolving winner -> union schema,
    # NULL-fill both ways, both writers' rows land
    winner2 = spark.createDataFrame(
        [(38, -38, "W2")], "k long, v long, extra2 string"
    )
    monkeypatch.setattr(CowTable, "_commit", make_racer(winner2))
    t.merge(
        spark.createDataFrame([(1, -2, "L")], "k long, v long, extra1 string"),
        "k", retries=2, evolve_schema=True,
    )
    monkeypatch.setattr(CowTable, "_commit", orig)
    got = {r["k"]: r for r in t.read().collect()}
    assert set(t.read().columns) == {"k", "v", "tag", "extra1", "extra2"}
    assert got[38]["extra2"] == "W2" and got[38]["extra1"] is None
    assert got[1]["extra1"] == "L" and got[1]["extra2"] is None
    assert got[39]["tag"] == "w"  # round-1 winner's file carried intact
    assert t.read().count() == 40


def test_merge_source_missing_column_errors_deterministically(spark, table):
    """The strict-mode schema contract fails BEFORE any data write,
    with the missing columns named -- same error first-attempt or
    post-rebase (cf. test_concurrent_schema_evolution_rebase)."""
    v0 = table.version()
    with pytest.raises(ValueError, match=r"\['v'\]"):
        table.merge(spark.createDataFrame([(5,)], "k long"), "k")
    assert table.version() == v0  # nothing committed
    # evolve_schema=True NULL-fills instead
    table.merge(spark.createDataFrame([(5,)], "k long"), "k",
                evolve_schema=True)
    assert dict(_rows(table.read()))[5] is None


def test_compact_refresh_stats_restores_skipping(spark, tmp_path):
    """VERDICT r11 #6: a log whose recorded timestamp stats are NAIVE
    (legacy writer, pre-UTC-normalization) can never skip against
    aware bounds -- _stat_cmp_ok refuses the comparison forever.  One
    compact(refresh_stats=True) re-harvests the (correct) footers into
    the log and restores skipping WITHOUT rewriting well-packed data."""
    import datetime

    ts0 = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try:
        spark.conf.set(
            "spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS"
        )
        df = spark.range(48).selectExpr(
            "TIMESTAMP '2024-01-02 00:00:00' + "
            "make_interval(0,0,0,0,CAST(id AS INT),0,0) AS ts",
            "id AS v",
        ).repartitionByRange(4, "ts")
        t = CowTable.create(spark, str(tmp_path / "naive"), df)

        # Simulate the legacy log: strip tz offsets from the recorded
        # ts stats (what a pre-normalization writer recorded).
        p = _commit_path(t.path, 0)
        with open(p) as f:
            doc = json.load(f)
        for st in doc["file_stats"].values():
            c = st["cols"].get("ts")
            if c:
                c["min"] = c["min"].replace("+00:00", "")
                c["max"] = c["max"].replace("+00:00", "")
        os.remove(p)
        with open(p, "w") as f:
            json.dump(doc, f)

        utc = datetime.timezone.utc
        lo = datetime.datetime(2024, 1, 2, 3, 0, tzinfo=utc)
        hi = datetime.datetime(2024, 1, 2, 5, 0, tzinfo=utc)
        got = t.read_range("ts", lo, hi)
        assert got.count() == 3
        assert t.last_scan["files_skipped"] == 0  # naive stats: scan all

        # target_rows=1: nothing to bin-pack -> metadata-only commit
        # that refreshes every carried file's stats from its footer
        doc2 = t.compact(target_rows=1, refresh_stats=True)
        assert doc2["files_written"] == 0 and doc2["files_kept"] == 4
        assert set(t.files()) == set(t.files(0))  # no data rewritten
        got2 = t.read_range("ts", lo, hi)
        assert got2.count() == 3
        assert t.last_scan["files_skipped"] >= 2  # skipping restored
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", ts0)


def test_vacuum_prunes_checkpoint_all_files(spark, tmp_path):
    """The checkpoint's ever-referenced list must not grow O(files
    ever) as a maintained table ages: vacuum prunes the entries whose
    files it just deleted (superset-safe -- see vacuum), so the
    manifest stays O(live + since-last-vacuum) while later
    checkpoints, merges, and vacuums keep working off the pruned
    list."""
    df = spark.range(30).selectExpr("id AS k", "id * 2 AS v").repartition(3)
    t = CowTable.create(spark, str(tmp_path / "vp"), df)
    for i in range(4):  # churn: every merge rewrites some files
        t.merge(
            spark.createDataFrame([(i, -i), (i + 10, -i)], "k long, v long"),
            "k",
        )
    out = t.vacuum(retain_last=1, orphan_grace_s=0.0)
    assert out["files_deleted"] > 0
    ck = t._read_last_checkpoint()
    assert ck is not None and ck["version"] == t.version()
    assert all(os.path.exists(f) for f in ck["all_files"])
    live = {os.path.abspath(f) for f in t.files()}
    assert live <= {os.path.abspath(f) for f in ck["all_files"]}
    # the pruned manifest still anchors everything correctly
    t.merge(spark.createDataFrame([(99, 99)], "k long, v long"), "k")
    assert dict(_rows(t.read()))[99] == 99
    t.vacuum(retain_last=1, orphan_grace_s=0.0)
    assert dict(_rows(t.read()))[99] == 99
    ck2 = t._read_last_checkpoint()
    assert all(os.path.exists(f) for f in ck2["all_files"])


def test_txn_lookup_checkpoint_at_head_is_one_read(spark, tmp_path):
    """Round-12 ADVICE #3: when the newest checkpoint sits exactly at
    the head of a legacy log (e.g. written by vacuum or an operator
    checkpoint() on a pre-txn table), txn_version must answer from the
    manifest immediately -- the loop's top-of-iteration floor check
    can never revisit the version it was loaded at, so without the
    load-time short-circuit the walk degrades to O(versions)."""
    df = spark.range(4).selectExpr("id AS k", "id AS v").coalesce(1)
    t = CowTable.create(spark, str(tmp_path / "legacy_head_ck"), df)
    files, schema = t.files(), t._commit_doc(0)["schema"]
    p = _commit_path(t.path, 0)
    with open(p) as f:
        doc = json.load(f)
    doc.pop("txn", None)
    os.remove(p)
    with open(p, "w") as f:
        json.dump(doc, f)
    # 30 legacy commits; the one for buried_app sits deep in the log
    for v in range(1, 31):
        app = "buried_app" if v == 5 else "noise_app"
        t._commit(
            v, files, "merge",
            {
                "parent": v - 1,
                "app_meta": {"app_id": app, "batch_id": v},
                "schema": schema,
            },
        )
    t.checkpoint()  # head checkpoint on an all-legacy log
    assert t._read_last_checkpoint()["version"] == 30
    reads = []
    orig = CowTable._commit_doc
    try:
        CowTable._commit_doc = (
            lambda self, v: (reads.append(v), orig(self, v))[1]
        )
        # head commit is noise_app's; buried_app must come from the
        # manifest after ONE commit-doc read, not a 26-doc walk
        assert t.txn_version("buried_app") == 5
        assert len(reads) == 1
        reads.clear()
        assert t.txn_version("ghost") == -1
        assert len(reads) == 1
    finally:
        CowTable._commit_doc = orig


def test_txn_version_at_reconstructs_legacy_commits(spark, tmp_path):
    """txn_version_at (round-12 ADVICE #2 support) resolves the
    CUMULATIVE high-water at any version: txn-carrying commits answer
    from their map; a txn-less commit reconstructs from the newest
    checkpoint at-or-below it plus the app_meta above -- never from a
    LATER checkpoint, which would time-travel future batches in."""
    df = spark.range(4).selectExpr("id AS k", "id AS v").coalesce(1)
    t = CowTable.create(spark, str(tmp_path / "txn_at"), df)
    files, schema = t.files(), t._commit_doc(0)["schema"]
    t._commit(
        1, files, "merge",
        {
            "parent": 0, "schema": schema,
            "app_meta": {"app_id": "app", "batch_id": 7},
            "txn": {"app": 7},
        },
    )
    # v2: legacy compact (no txn, no app_meta) -- contains batch 7
    t._commit(2, files, "compact", {"parent": 1, "schema": schema})
    # v3: a later txn commit advancing the app
    t._commit(
        3, files, "merge",
        {
            "parent": 2, "schema": schema,
            "app_meta": {"app_id": "app", "batch_id": 8},
            "txn": {"app": 8},
        },
    )
    t.checkpoint(3)  # newest manifest sits ABOVE the legacy commit
    assert t.txn_version_at(0, "app") == -1
    assert t.txn_version_at(1, "app") == 7
    assert t.txn_version_at(2, "app") == 7   # not -1, not 8
    assert t.txn_version_at(3, "app") == 8
    assert t.txn_version_at(2, "ghost") == -1


def test_preimage_walk_all_legacy_reads_each_doc_once(spark, tmp_path):
    """Round-13 ADVICE #3: on an ALL-legacy, checkpoint-less log the
    descending pre-image walk calls txn_version_at per step, and each
    step's reconstruction spans commits 0..v -- O(n^2) commit-doc
    READS without memoization.  _version_before_batch shares one memo
    across the walk, so every commit doc is read from storage at most
    once: total reads stay O(n) no matter how deep the walk goes."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.streaming.index_maint import (
        _version_before_batch,
    )

    df = spark.range(4).selectExpr("id AS k", "id AS v").coalesce(1)
    t = CowTable.create(spark, str(tmp_path / "legacy_walk"), df)
    t.checkpoint_interval = 0  # never auto-checkpoint: worst case
    p = _commit_path(t.path, 0)
    with open(p) as f:
        doc = json.load(f)
    doc.pop("txn", None)
    os.remove(p)
    with open(p, "w") as f:
        json.dump(doc, f)
    files, schema = t.files(), doc["schema"]
    n = 12
    for v in range(1, n + 1):
        # batch 0's app_meta sits at v=1; everything above is txn-less
        # noise, so the walk must descend all the way to the create.
        extra = {"parent": v - 1, "schema": schema}
        if v == 1:
            extra["app_meta"] = {"app_id": "maint", "batch_id": 0}
        t._commit(v, files, "merge", extra)
    assert t._read_last_checkpoint() is None
    reads = []
    orig = CowTable._commit_doc
    try:
        CowTable._commit_doc = (
            lambda self, v: (reads.append(v), orig(self, v))[1]
        )
        assert _version_before_batch(t, "maint", 0) == 0
        # one read per distinct doc (n+1 commits), never the ~n^2/2 an
        # unmemoized descending walk would pay
        assert len(reads) == len(set(reads)) <= n + 1
    finally:
        CowTable._commit_doc = orig
    # and the memo changes no answers: spot-check against fresh calls
    assert t.txn_version_at(n, "maint") == 0
    assert t.txn_version_at(0, "maint") == -1


def test_vacuum_gc_prunes_old_checkpoint_files(spark, tmp_path):
    """Round-13 VERDICT #7: vacuum bounds the checkpoint FILE series
    too (Delta keeps the last N) -- old NNNNNNNN.checkpoint.json
    accumulate one per interval forever otherwise.  Retention anchor =
    newest checkpoint at-or-below the retained-snapshot floor: every
    checkpoint a retained-window reconstruction can touch survives,
    everything below the anchor goes."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (
        _checkpoint_path,
        _log_dir,
    )

    df = spark.range(8).selectExpr("id AS k", "id AS v").coalesce(1)
    t = CowTable.create(spark, str(tmp_path / "ckpt_gc"), df)
    t.checkpoint_interval = 5
    for i in range(31):
        t.merge(
            spark.createDataFrame([(int(i % 8), 100 + i)], "k long, v long"),
            "k",
            meta={"app_id": "writer", "batch_id": i},
        )
    ld = _log_dir(t.path)

    def ck_versions():
        return sorted(
            int(n[:8])
            for n in os.listdir(ld)
            if n.endswith(".checkpoint.json")
        )

    before = ck_versions()
    assert len(before) >= 6          # one per interval accrued
    head = t.version()
    res = t.vacuum(retain_last=3, orphan_grace_s=0.0)
    lo = head - 3 + 1
    after = ck_versions()
    # anchor kept, everything below gone, head checkpoint present
    anchor = max(v for v in before + [head] if v <= lo)
    assert res["checkpoints_deleted"] == len([v for v in before if v < anchor])
    assert after[0] == anchor
    assert head in after
    assert all(v >= anchor for v in after)
    # reconstruction within the retained window still answers right
    # and still anchors on a surviving checkpoint (bounded reads)
    assert t.txn_version("writer") == 30
    assert t.txn_version_at(lo, "writer") == lo - 1
    # idempotent at a FIXED head: re-vacuuming deletes nothing more
    # (the anchor only advances when the retained window moves)
    assert t.vacuum(retain_last=3, orphan_grace_s=0.0)[
        "checkpoints_deleted"
    ] == 0
    # table remains fully readable and maintainable after the GC
    assert sorted(r["k"] for r in t.read().collect()) == list(range(8))
    t.merge(spark.createDataFrame([(99, 99)], "k long, v long"), "k")
    assert 99 in {r["k"] for r in t.read().collect()}
    # ... and once the head moves, the NEXT vacuum advances the anchor
    # and prunes the checkpoints that fell below the new floor
    t.vacuum(retain_last=3, orphan_grace_s=0.0)
    lo2 = t.version() - 3 + 1
    assert ck_versions()[0] == max(v for v in ck_versions() if v <= lo2)
    assert t.txn_version("writer") == 30
    assert sorted(r["k"] for r in t.read().collect()) == list(range(8)) + [99]


# -- Z-order compaction (multi-column cluster_by) --------------------


def _grid_df(spark, n=8000, card=40):
    """Independent x/y grid: x cycles fast, y slow, so single-column
    clustering on x provably leaves every file's y range full-width."""
    return spark.range(n).selectExpr(
        f"id % {card} AS x",
        f"CAST(id / {card} AS LONG) % {card} AS y",
        "id AS payload",
    )


def test_zorder_compact_prunes_every_clustered_dim(spark, tmp_path):
    """ZORDER BY (x, y): after a multi-column compact, range reads on
    EITHER column alone skip files, a 2-dim box scans a small corner,
    and the rewrite is content-pure.  Contrast pinned in
    test_zorder_beats_linear_on_trailing_dim: linear clustering on x
    gives the same data ZERO y-pruning."""
    df = _grid_df(spark)
    t = CowTable.create(spark, str(tmp_path / "z"), df.repartition(16))
    s = t.compact(target_rows=600, cluster_by=["x", "y"])
    assert s["files_written"] >= 9
    assert s["cluster_by"] == ["x", "y"]
    # content purity: same rows, helper column never leaks into files
    assert _rows(t.read()) == _rows(df)
    assert t.read().columns == ["x", "y", "payload"]
    # each axis prunes on its own
    for col in ("x", "y"):
        got = _rows(t.read_ranges({col: (0, 9)}))
        assert got == _rows(df.filter(F.col(col) <= 9))
        assert t.last_scan["files_skipped"] > 0, col
    # the 2-dim box is the headline: a corner touches a corner
    got = _rows(t.read_ranges({"x": (0, 9), "y": (0, 9)}))
    assert got == _rows(df.filter((F.col("x") <= 9) & (F.col("y") <= 9)))
    assert t.last_scan["files_scanned"] <= t.last_scan["files_total"] // 2


def test_zorder_beats_linear_on_trailing_dim(spark, tmp_path):
    """The reason Z-order exists: linear cluster_by='x' makes every
    output file carry the FULL y range (x and y are independent), so a
    y predicate can skip nothing; the same data Z-ordered skips on y."""
    df = _grid_df(spark)
    lin = CowTable.create(spark, str(tmp_path / "lin"), df.repartition(16))
    lin.compact(target_rows=600, cluster_by="x")
    lin.read_ranges({"y": (0, 9)}).count()
    assert lin.last_scan["files_skipped"] == 0
    zt = CowTable.create(spark, str(tmp_path / "z"), df.repartition(16))
    zt.compact(target_rows=600, cluster_by=["x", "y"])
    zt.read_ranges({"y": (0, 9)}).count()
    assert zt.last_scan["files_skipped"] > 0


def test_read_ranges_multi_pred_semantics(spark, tmp_path):
    """Predicates AND together and survivors are exactly re-filtered
    even on an unclustered layout (skipping is an optimization, never
    semantics); open bounds work per side."""
    df = _grid_df(spark, n=2000, card=20)
    t = CowTable.create(spark, str(tmp_path / "t"), df.repartition(5))
    got = _rows(t.read_ranges({"x": (3, None), "y": (None, 7)}))
    assert got == _rows(df.filter((F.col("x") >= 3) & (F.col("y") <= 7)))


def test_zorder_date_column(spark, tmp_path):
    """Date columns quantize through the datediff mapping; a date+int
    Z-order prunes on the date axis with typed bounds."""
    import datetime

    df = spark.range(4000).selectExpr(
        "date_add(DATE '2020-01-01', CAST(id % 365 AS INT)) AS d",
        "CAST(id / 365 AS LONG) % 50 AS g",
        "id AS payload",
    )
    t = CowTable.create(spark, str(tmp_path / "t"), df.repartition(12))
    t.compact(target_rows=400, cluster_by=["d", "g"])
    lo, hi = datetime.date(2020, 2, 1), datetime.date(2020, 3, 1)
    got = _rows(t.read_ranges({"d": (lo, hi)}))
    assert got == _rows(
        df.filter((F.col("d") >= F.lit(lo)) & (F.col("d") <= F.lit(hi)))
    )
    assert t.last_scan["files_skipped"] > 0


# -- per-file Bloom key index ----------------------------------------


def _keyed_df(spark, n=6000):
    """High-cardinality string keys (md5 hex): every file's [min, max]
    spans ~the whole key space, so range stats prune nothing and any
    observed point-lookup pruning is the bloom index's."""
    return spark.range(n).selectExpr(
        "md5(CAST(id AS STRING)) AS k", "id AS v"
    )


@pytest.fixture()
def bloom_table(spark, tmp_path):
    df = _keyed_df(spark)
    return (
        CowTable.create(
            spark, str(tmp_path / "bl"), df.repartition(12), bloom_col="k"
        ),
        df,
    )


def test_bloom_no_false_negatives(spark, bloom_table):
    """EVERY present key survives pruning (the bloom guarantee), and
    pruning is actually active: lookups open a fraction of the files."""
    t, df = bloom_table
    keys = [r["k"] for r in df.filter(F.col("v") % 500 == 7).collect()]
    assert len(keys) >= 10
    scanned = total = 0
    for k in keys:
        rows = t.read_point("k", k).collect()
        assert len(rows) == 1 and rows[0]["k"] == k
        scanned += t.last_scan["files_scanned"]
        total += t.last_scan["files_total"]
        assert t.last_scan["files_skipped_bloom"] > 0
    # across the batch, the index must have skipped most of the work
    assert scanned < total / 3


def test_bloom_absent_key_refuted_by_filter_not_range(spark, bloom_table):
    """An absent key that LOOKS like a present one (md5 hex, inside
    every file's range) is refuted by the bloom alone: near-zero files
    open and the result is exactly empty."""
    import hashlib

    t, _ = bloom_table
    probe = hashlib.md5(b"definitely-not-a-row").hexdigest()
    assert t.read_point("k", probe).count() == 0
    assert t.last_scan["files_skipped_bloom"] > 0
    # fpp at 8192 bits / ~500 keys per file is ~1e-5: expect ~0 scans
    assert t.last_scan["files_scanned"] <= 2


def test_bloom_multi_value_probe(spark, bloom_table):
    """IN-list probe: one scan, pruned to the union of the values'
    candidate files, exact isin() semantics."""
    t, df = bloom_table
    keys = [r["k"] for r in df.filter(F.col("v").isin([3, 1234, 5999])).collect()]
    got = _rows(t.read_point("k", keys))
    assert got == _rows(df.filter(F.col("k").isin(keys)))
    assert t.last_scan["files_scanned"] < t.last_scan["files_total"]


def test_bloom_merge_carries_untouched_file_entries(spark, tmp_path):
    """Merge maintains the index incrementally: only its REWRITTEN
    files get fresh filters, carried files reuse the parent sidecar's
    entries verbatim (same carry-by-reference economics as
    file_stats), and lookups stay correct on old and new rows.
    Range-clustered keys so merge's key-range pruning actually carries
    files (hash keys would touch every file)."""
    df = spark.range(6000).selectExpr(
        "printf('%08d', id) AS k", "id AS v"
    )
    t = CowTable.create(
        spark,
        str(tmp_path / "bl"),
        df.repartitionByRange(12, "k"),
        bloom_col="k",
    )
    parent_map = t._commit_doc(0)["bloom_files"]
    upd = df.filter(F.col("v") < 300).withColumn(
        "v", F.col("v") + 1_000_000
    )
    t.merge(upd, "k")
    doc = t._commit_doc(1)
    assert doc["files_rewritten"] < len(parent_map)
    head_map = doc["bloom_files"]
    carried = set(head_map) & set(parent_map)
    assert len(carried) >= 10  # most files carried by reference...
    # ...verbatim: SAME per-file sidecar names, no recompute/rewrite
    assert all(head_map[b] == parent_map[b] for b in carried)
    assert set(head_map) == {os.path.basename(f) for f in doc["files"]}
    assert t.read_point("k", "00000007").collect()[0]["v"] == 1_000_007
    assert t.read_point("k", "00004321").collect()[0]["v"] == 4321
    assert t.last_scan["files_scanned"] < t.last_scan["files_total"]


def test_bloom_compact_reindexes_output(spark, bloom_table):
    """Compact's freshly packed files get filters in the same commit,
    so point lookups prune on the new layout immediately -- range
    stats stay useless on the hash keys, any pruning is the bloom's."""
    t, df = bloom_table
    t.compact(target_rows=600)
    assert t.version() == 1
    k = df.filter(F.col("v") == 4242).collect()[0]["k"]
    assert t.read_point("k", k).collect()[0]["v"] == 4242
    assert t.last_scan["files_skipped_bloom"] > 0
    assert t.last_scan["files_scanned"] < t.last_scan["files_total"]


def test_bloom_sidecars_reused_when_files_unchanged(spark, bloom_table):
    """A commit that carries the exact file set forward carries every
    per-file sidecar NAME verbatim and writes zero new ones
    (metadata-only commits on a bloom table stay O(1), not O(index))."""
    import os as _os

    t, _ = bloom_table

    def bf_files():
        ld = _os.path.join(t.path, "_log")
        return {n for n in _os.listdir(ld) if n.endswith(".bf.json")}

    before = bf_files()
    t.compact(target_rows=1, refresh_stats=True)  # stats-refresh commit
    head = t._commit_doc(t.version())
    parent = t._commit_doc(t.version() - 1)
    assert head["files"] == parent["files"]
    assert head["bloom_files"] == parent["bloom_files"]
    assert bf_files() == before  # nothing rewritten on disk


def test_bloom_harvest_executor_side_matches_driver(spark, tmp_path):
    """>_DRIVER_STATS_MAX files routes the harvest through the Spark
    job path, where the executors BOTH compute and WRITE the per-file
    sidecars; the written filters must be bit-identical to in-process
    _file_bloom output (and the create commit, which took that path,
    must have indexed every file)."""
    import json as _json

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (
        _DRIVER_STATS_MAX,
        _file_bloom,
    )

    df = _keyed_df(spark, n=2000).repartition(_DRIVER_STATS_MAX + 4)
    t = CowTable.create(spark, str(tmp_path / "bl"), df, bloom_col="k")
    files = t.files()
    assert len(files) > _DRIVER_STATS_MAX
    conf = {"col": "k", "m": 8192, "k": 5, "bpk": 10}
    names = t._commit_doc(0)["bloom_files"]
    assert set(names) == {os.path.basename(f) for f in files}
    ld = os.path.join(t.path, "_log")
    for f in files:
        with open(os.path.join(ld, names[os.path.basename(f)])) as fh:
            written = _json.load(fh)
        expect = _file_bloom(f, "k", conf)
        assert (written["h"], written["m"], written["k"]) == (
            expect["h"], expect["m"], expect["k"],
        )
        assert written["col"] == "k"


def test_vacuum_gc_bloom_sidecars(spark, bloom_table, tmp_path):
    """Sidecars of expired snapshots and losing racers are GC'd;
    whatever a retained commit references survives and lookups still
    prune afterwards."""
    t, df = bloom_table
    for step in range(3):
        src = df.filter(F.col("v") % 50 == step).withColumn(
            "v", F.col("v") + 10 * (step + 1)
        )
        t.merge(src, "k")

    def sidecars():
        ld = os.path.join(t.path, "_log")
        return {n for n in os.listdir(ld) if n.endswith(".bf.json")}

    head_names = set(t._commit_doc(t.version())["bloom_files"].values())
    # rewritten-away files' sidecars outnumber the retained snapshot's
    assert len(sidecars()) > len(head_names)
    summ = t.vacuum(retain_last=1, orphan_grace_s=0.0)
    assert summ["blooms_deleted"] > 0
    kept = sidecars()
    assert head_names <= kept  # everything the head references survives
    k = df.filter(F.col("v") == 4321).collect()[0]["k"]
    assert t.read_point("k", k).count() == 1  # index still functional
    assert t.last_scan["files_skipped_bloom"] >= 0


def test_bloom_rejects_nested_column(spark, tmp_path):
    df = spark.range(10).selectExpr("array(id) AS a", "id AS v")
    with pytest.raises(ValueError, match="scalar"):
        CowTable.create(spark, str(tmp_path / "x"), df, bloom_col="a")


def test_bloom_positions_deterministic_and_typed():
    """Cross-process stability (md5, not hash()) and the numeric
    normalization: 3 and 3.0 collide by design (Spark's `=`), while
    '3' the string does not."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (
        _bloom_positions,
    )

    assert _bloom_positions(3, 8192, 5) == _bloom_positions(3.0, 8192, 5)
    assert _bloom_positions(3, 8192, 5) != _bloom_positions("3", 8192, 5)
    assert _bloom_positions(b"xy", 8192, 5) == _bloom_positions(
        bytearray(b"xy"), 8192, 5
    )
    assert all(0 <= p < 8192 for p in _bloom_positions("abc", 8192, 5))


def test_bloom_byte_buffer_matches_legacy_int_bitmap(tmp_path):
    """The byte-indexed bitmap representation (r17: one indexed byte
    op per bit test instead of an O(m) big-int shift) must be
    BIT-IDENTICAL to the int-era one in both directions: (a) the
    sidecar hex a byte-era build writes equals what the legacy
    ``bits |= 1 << p`` build would have written, and (b) a legacy
    sidecar entry decodes through ``_bloom_buf`` to the exact same
    accept/refute decisions."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (
        _bloom_any_hit,
        _bloom_buf,
        _bloom_hashes,
        _bloom_maybe_contains,
        _bloom_positions,
        _file_bloom,
    )

    keys = [f"key-{i:04d}" for i in range(500)]
    p = str(tmp_path / "f.parquet")
    pq.write_table(pa.table({"k": keys}), p)
    conf = {"col": "k", "m": 8192, "k": 5, "bpk": 10}
    entry = _file_bloom(p, "k", conf)
    m, k = entry["m"], entry["k"]

    # (a) writer parity: rebuild with the legacy big-int algorithm
    legacy = 0
    for key in keys:
        for pos in _bloom_positions(key, m, k):
            legacy |= 1 << pos
    assert entry["h"] == f"{legacy:x}"

    # (b) reader parity: every present key accepted, absent keys get
    # the same decision from the byte path as the legacy shift path
    buf = _bloom_buf(entry["h"], m)
    for key in keys[:50]:
        assert _bloom_maybe_contains(entry["h"], key, m, k)
    for probe in [f"absent-{i}" for i in range(200)]:
        byte_dec = _bloom_any_hit(buf, m, k, [_bloom_hashes(probe)])
        legacy_dec = all(
            legacy >> pos & 1 for pos in _bloom_positions(probe, m, k)
        )
        assert byte_dec == legacy_dec


def test_bloom_prunes_merge_candidate_scan(spark, tmp_path):
    """The bloom index feeds MERGE's file matching: on a hash-keyed
    layout the key-range envelope keeps every file (each spans the
    whole key space), so without the index a 3-key delta merge probes
    all 12 files; with it, files_probed collapses to the files that
    might actually hold the keys.  Same merge, same result -- pinned
    against the no-bloom table row-for-row."""
    df = _keyed_df(spark, n=6000)
    upd = df.filter(F.col("v").isin([11, 2222, 4444])).withColumn(
        "v", F.col("v") + 1_000_000
    )
    plain = CowTable.create(
        spark, str(tmp_path / "plain"), df.repartition(12)
    )
    plain.merge(upd, "k")
    assert plain._commit_doc(1)["files_probed"] == 12  # range-blind
    bl = CowTable.create(
        spark, str(tmp_path / "bl"), df.repartition(12), bloom_col="k"
    )
    bl.merge(upd, "k")
    doc = bl._commit_doc(1)
    assert doc["files_probed"] <= 4  # <=3 true hits + rare fp
    assert doc["files_probed"] >= 1
    assert _rows(bl.read()) == _rows(plain.read())


def test_bloom_merge_prune_respects_deletes(spark, tmp_path):
    """Delete keys join the touch-key set BEFORE bloom pruning, so a
    delete-only merge still locates (and only rewrites) the files
    holding its victims."""
    df = _keyed_df(spark, n=6000)
    t = CowTable.create(
        spark, str(tmp_path / "bl"), df.repartition(12), bloom_col="k"
    )
    victims = [r["k"] for r in df.filter(F.col("v").isin([5, 3003])).collect()]
    dels = spark.createDataFrame([(k,) for k in victims], "k string")
    empty_src = df.filter(F.lit(False))
    t.merge(empty_src, "k", deletes=dels)
    doc = t._commit_doc(1)
    assert doc["files_probed"] <= 3
    assert t.read().filter(F.col("k").isin(victims)).count() == 0
    assert t.read().count() == 5998


# -- round 15: bloom at scale, tz-safe keys, sampled Z-order ---------


def test_bloom_hash_timestamp_aware_naive_agree():
    """ADVICE r14 (high): bloom keys hash datetimes as UTC epoch
    micros, so the SAME INSTANT hashes identically whether it arrives
    tz-aware UTC (pyarrow write side), tz-aware in any other zone, or
    naive with an explicit session tz (collect() probe side)."""
    import datetime
    from zoneinfo import ZoneInfo

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (
        _bloom_positions,
    )

    utc = datetime.timezone.utc
    aware = datetime.datetime(2024, 5, 1, 12, 0, 0, tzinfo=utc)
    ny = aware.astimezone(ZoneInfo("America/New_York"))
    naive_utc = datetime.datetime(2024, 5, 1, 12, 0, 0)
    naive_ny = datetime.datetime(2024, 5, 1, 8, 0, 0)  # same instant, NY wall
    p = _bloom_positions(aware, 8192, 5)
    assert _bloom_positions(ny, 8192, 5) == p
    assert _bloom_positions(naive_utc, 8192, 5) == p  # naive default = UTC
    assert _bloom_positions(
        naive_ny, 8192, 5, tz=ZoneInfo("America/New_York")
    ) == p
    # a DIFFERENT instant does not collide
    assert _bloom_positions(
        aware + datetime.timedelta(microseconds=1), 8192, 5
    ) != p


def test_bloom_timestamp_key_probe_finds_rows(spark, tmp_path):
    """ADVICE r14 (high) end-to-end: a timestamp bloom_col probed with
    the naive DRIVER-LOCAL datetime collect() hands back (session tz
    deliberately non-UTC to prove the two zones are not conflated)
    and with an aware equivalent -- both find the row, and the bloom
    still refutes files (the old ISO-string encoding made every probe
    hash differently from the stored keys, silently returning zero
    rows)."""
    import datetime

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.range(3000).selectExpr(
            "timestamp_micros(1500000000000000 + id * 1000000) AS ts",
            "id AS v",
        )
        t = CowTable.create(
            spark, str(tmp_path / "ts"), df.repartition(8), bloom_col="ts"
        )
        probe = df.filter("v = 1234").collect()[0]["ts"]
        assert probe.tzinfo is None  # collect() really is naive
        got = t.read_point("ts", probe).collect()
        assert [r["v"] for r in got] == [1234]
        assert t.last_scan["files_skipped_bloom"] > 0
        aware = datetime.datetime.fromtimestamp(
            1500000000 + 1234, tz=datetime.timezone.utc
        )
        assert t.read_point("ts", aware).count() == 1
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_bloom_rejects_unsupported_scalar_dtype(spark, tmp_path):
    """ADVICE r14: decimal passes the old nested-only validation and
    then TypeErrors executor-side mid-commit; now it fails at
    create(), named."""
    df = spark.range(10).selectExpr("CAST(id AS DECIMAL(10, 2)) AS d", "id AS v")
    with pytest.raises(ValueError, match="supported"):
        CowTable.create(spark, str(tmp_path / "x"), df, bloom_col="d")


def test_bloom_sized_from_file_rowcount(spark, tmp_path):
    """ADVICE r14: per-file m scales with the file's rows (a fixed
    8192 bits saturates past ~1-2k keys and prunes nothing).  One
    50k-key file gets a ~500k-bit filter recorded in ITS sidecar
    entry, keeps ~1% fpp (>=90 of 100 absent probes refuted), and
    stays exact on present keys."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (
        _bloom_size,
    )

    df = _keyed_df(spark, n=50_000).coalesce(1)
    t = CowTable.create(spark, str(tmp_path / "big"), df, bloom_col="k")
    doc0 = t._commit_doc(0)
    bidx = t._bloom_index(doc0, "k")
    _, m, _k = bidx.entry(os.path.basename(t.files()[0]))
    assert m == _bloom_size(50_000, 10, 8192)
    assert m >= 10 * 50_000  # not the saturated floor
    refuted = 0
    for i in range(100):
        t.read_point("k", f"absent-{i}")
        refuted += t.last_scan["files_skipped_bloom"]
    assert refuted >= 90  # fixed 8192 bits would refute ~0
    present = df.limit(5).collect()
    for r in present:
        assert t.read_point("k", r["k"]).count() == 1


def test_bloom_legacy_monolith_sidecar_reads_and_migrates(spark, tmp_path):
    """Pre-r17 tables stored ALL filters in one monolithic
    ``.bloom.json``.  New code must (a) prune from that legacy
    sidecar unchanged, (b) on the next mutation keep the legacy
    pointer alive for carried files while giving rewritten/new files
    per-file sidecars (hybrid), and (c) drop the legacy pointer once
    a full rewrite leaves no legacy-covered file -- the natural
    migration path, no offline conversion."""
    import json as _json

    df = spark.range(4000).selectExpr(
        "printf('%08d', id) AS k", "id AS v"
    )
    t = CowTable.create(
        spark,
        str(tmp_path / "leg"),
        df.repartitionByRange(8, "k"),
        bloom_col="k",
    )
    ld = os.path.join(t.path, "_log")
    doc0 = t._commit_doc(0)
    # forge the legacy state: fold the per-file sidecars into one
    # monolith exactly as the pre-r17 writer laid it out
    filemap = {}
    for b, name in doc0["bloom_files"].items():
        with open(os.path.join(ld, name)) as fh:
            e = _json.load(fh)
        filemap[b] = {"h": e["h"], "m": e["m"], "k": e["k"]}
        os.unlink(os.path.join(ld, name))
    conf = doc0["bloom_conf"]
    mono = "00000000-deadbeef.bloom.json"
    with open(os.path.join(ld, mono), "w") as fh:
        _json.dump(
            {
                "col": "k", "m": conf["m"], "k": conf["k"],
                "bpk": conf["bpk"], "files": filemap,
            },
            fh,
        )
    doc0.pop("bloom_files")
    doc0["bloom_sidecar"] = mono
    with open(os.path.join(ld, "00000000.json"), "w") as fh:
        _json.dump(doc0, fh)

    # (a) legacy-only: point lookup prunes through the monolith
    assert t.read_point("k", "00000042").collect()[0]["v"] == 42
    assert t.last_scan["files_scanned"] < t.last_scan["files_total"]

    # (b) hybrid: a narrow merge rewrites a few files; carried files
    # stay covered by the legacy pointer, rewritten ones get .bf.json
    upd = df.filter(F.col("v") < 200).withColumn(
        "v", F.col("v") + 1_000_000
    )
    t.merge(upd, "k")
    doc1 = t._commit_doc(1)
    assert doc1.get("bloom_sidecar") == mono  # legacy kept alive
    assert doc1.get("bloom_files")  # new files per-file indexed
    assert t.read_point("k", "00000007").collect()[0]["v"] == 1_000_007
    assert t.last_scan["files_scanned"] < t.last_scan["files_total"]
    assert t.read_point("k", "00003210").collect()[0]["v"] == 3210
    assert t.last_scan["files_scanned"] < t.last_scan["files_total"]

    # (c) full rewrite: no legacy-covered file remains -> pointer gone
    t.compact(target_rows=10**9)
    doc2 = t._commit_doc(t.version())
    assert "bloom_sidecar" not in doc2
    assert set(doc2["bloom_files"]) == {
        os.path.basename(f) for f in doc2["files"]
    }
    assert t.read_point("k", "00000007").collect()[0]["v"] == 1_000_007


def test_bloom_merge_distributed_probe_large_batch(spark, tmp_path):
    """VERDICT r14 #1: a merge batch past _BLOOM_PRUNE_MAX_KEYS (the
    normal delta size at 100 TB) no longer abandons bloom pruning --
    the probe runs executor-side and files_probed stays << files_total.
    Staging: files hold contiguous v ranges but the MERGE KEY is an
    md5 of v, so every file is range-blind on the key; the 12.5k-key
    batch (all from one v range = one file) can only be pruned by the
    blooms.  Sizing contract: a file survives a B-key batch unless
    ALL B absent keys are refuted, so batch pruning needs per-probe
    fpp << 1/B -- 32 bits/key with k=22 gives ~2e-7 (vs the 1%
    point-lookup default, which a 12.5k-key batch would false-hit on
    every file); per-file sizing makes that affordable exactly where
    the file is big enough to matter."""
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (
        _BLOOM_PRUNE_MAX_KEYS,
    )

    n, nf = 200_000, 16
    df = spark.range(n).selectExpr(
        "md5(CAST(id AS STRING)) AS k", "id AS v"
    ).repartitionByRange(nf, "v")
    t = CowTable.create(
        spark, str(tmp_path / "big"), df, bloom_col="k",
        bloom_bits_per_key=32, bloom_k=22,
    )
    assert len(t.files()) == nf
    batch_n = 12_500
    assert batch_n > _BLOOM_PRUNE_MAX_KEYS
    upd = spark.range(batch_n).selectExpr(
        "md5(CAST(id AS STRING)) AS k", "id + 1000000000 AS v"
    )
    doc = t.merge(upd, "k")
    assert doc["bloom_probe"] == "distributed"
    assert doc["files_probed"] <= 3  # 1 true file + rare fp
    assert doc["files_rewritten"] <= 3
    assert t.read().filter(F.col("v") >= 1_000_000_000).count() == batch_n
    assert t.read().count() == n


def test_bloom_probe_paths_agree(spark, tmp_path):
    """Forced driver vs forced distributed probing of the SAME small
    batch prune to the same candidate set and converge to the same
    table content (the distributed path is an execution strategy, not
    a semantics change)."""
    df = _keyed_df(spark, n=6000)
    upd = df.filter(F.col("v").isin([7, 1717, 5005])).withColumn(
        "v", F.col("v") + 1_000_000
    )
    docs = {}
    for mode in ("driver", "distributed"):
        t = CowTable.create(
            spark, str(tmp_path / mode), df.repartition(12), bloom_col="k"
        )
        docs[mode] = t.merge(upd, "k", bloom_probe=mode)
        docs[mode + "_rows"] = _rows(t.read())
    assert docs["driver"]["bloom_probe"] == "driver"
    assert docs["distributed"]["bloom_probe"] == "distributed"
    assert (
        docs["driver"]["files_probed"] == docs["distributed"]["files_probed"]
    )
    assert docs["driver_rows"] == docs["distributed_rows"]


def test_read_point_large_inlist_routes_distributed(spark, tmp_path):
    """VERDICT r14 #5: an IN-list past _BLOOM_PRUNE_MAX_KEYS switches
    read_point to the merge-style path -- envelope range prune,
    executor-side bloom probe, broadcast semi-join (no O(files*probes)
    driver loop, no 10k-literal isin).  With generously-sized filters
    an all-absent 10k+ list scans ZERO files; a mixed list returns
    exactly the present rows."""
    df = _keyed_df(spark, n=6000)
    t = CowTable.create(
        spark, str(tmp_path / "bl"), df.repartition(12),
        bloom_col="k", bloom_bits=1 << 20,
    )
    import hashlib

    # absent keys that are themselves md5 hexes: inside every file's
    # [min, max], so the envelope prune passes them ALL and any
    # skipping below is the distributed bloom probe's.
    absent = [
        hashlib.md5(f"absent-{i}".encode()).hexdigest()
        for i in range(10_500)
    ]
    out = t.read_point("k", absent)
    assert out.count() == 0
    assert t.last_scan["files_scanned"] == 0
    assert t.last_scan["files_skipped_bloom"] == 12
    present = [r["k"] for r in df.limit(600).collect()]
    mixed = present + absent
    out2 = t.read_point("k", mixed)
    assert out2.count() == 600
    assert t.last_scan["files_total"] == 12


def test_zorder_sampled_boundaries_beat_linear_on_skew(spark, tmp_path):
    """VERDICT r14 #2: linear min/max quantization collapses under a
    long-tail outlier -- a handful of a=1e18 rows stretch the span so
    ALL other rows land in bucket 0, the column contributes nothing
    to the Morton code, every file's a-range stays full-width, and a
    selective a-probe scans everything.  Equi-depth sampled
    boundaries (percentile_approx band edges) ignore the outlier's
    leverage: buckets follow the data mass, per-file a-ranges
    tighten, and the same probe skips most files.  Both layouts
    return identical rows -- skipping is never semantics."""
    n = 40_000
    base = spark.range(n).selectExpr(
        # uniform mass in [0, 1e6] plus 4 extreme-tail rows at 1e18
        "CASE WHEN id < 4 THEN CAST(1e18 AS BIGINT) "
        "ELSE (id * 25) % 1000000 END AS a",
        "(id * 7919) % 100003 AS b",
        "id AS v",
    )
    probe = {"a": (100_000, 150_000)}  # ~5% of the mass
    skipped = {}
    rows = {}
    for mode in ("linear", "sampled"):
        t = CowTable.create(
            spark, str(tmp_path / mode), base.repartition(16)
        )
        t.compact(
            target_rows=n // 12, cluster_by=["a", "b"],
            zorder_boundaries=mode,
        )
        out = t.read_ranges(probe)
        rows[mode] = _rows(out.select("v", "a", "b"))
        skipped[mode] = t.last_scan["files_skipped"]
    assert rows["linear"] == rows["sampled"]  # identical answers
    assert skipped["linear"] == 0  # the collapse the verdict predicted
    assert skipped["sampled"] >= 4  # sampled edges keep skipping alive


def test_zorder_string_column_participates(spark, tmp_path):
    """ADVICE r14: a string cluster column used to cast('double') to
    NULL -> constant bucket 0 -> zero clustering contribution,
    silently.  The codepoint-prefix quantization keeps lexicographic
    locality, so per-file min/max tighten on the STRING dimension and
    a string range probe skips files."""
    n = 30_000
    base = spark.range(n).selectExpr(
        "concat(chr(97 + CAST(id % 26 AS INT)), "
        "chr(97 + CAST((id * 17) % 26 AS INT)), "
        "CAST(id AS STRING)) AS s",
        "(id * 31) % 9973 AS b",
        "id AS v",
    )
    t = CowTable.create(spark, str(tmp_path / "s"), base.repartition(16))
    t.compact(target_rows=n // 12, cluster_by=["s", "b"])
    out = t.read_ranges({"s": ("aa", "c")})
    got = _rows(out.select("v"))
    assert t.last_scan["files_skipped"] > 0
    want = _rows(
        base.filter((F.col("s") >= "aa") & (F.col("s") <= "c")).select("v")
    )
    assert got == want


def test_compact_zorder_rebase_survives_foreign_merge(spark, tmp_path):
    """VERDICT r14 #6: a foreign MERGE lands between compact's plan
    and its commit.  Compaction's rebase is re-plan-from-new-head, so
    the retry must (a) actually fire, (b) land, (c) carry the foreign
    row into the compacted layout, and (d) still produce a Z-ordered
    layout whose skipping assertions hold."""
    n = 20_000
    base = spark.range(n).selectExpr(
        "(id * 13) % 100000 AS a", "(id * 7) % 9973 AS b", "id AS v"
    )
    t = CowTable.create(spark, str(tmp_path / "z"), base.repartition(16))
    # foreign KEY is new; its cluster-column values stay inside the
    # existing ranges (an outlier would stretch linear quantization --
    # that failure mode has its own test above).
    foreign = spark.createDataFrame(
        [(50_000, 5_000, 99_999_999)], "a long, b long, v long"
    )
    orig_commit = CowTable._commit
    fired = {}

    def racing_commit(self, version, files, op, stats):
        if op == "compact" and not fired:
            fired["stolen_version"] = version
            CowTable._commit = orig_commit  # unpatch before foreign op
            CowTable(spark, t.path).merge(foreign, "v")
        return orig_commit(self, version, files, op, stats)

    CowTable._commit = racing_commit
    try:
        doc = t.compact(
            target_rows=n // 12, cluster_by=["a", "b"], retries=2
        )
    finally:
        CowTable._commit = orig_commit
    assert fired  # the race happened
    assert doc["version"] == fired["stolen_version"] + 1  # rebase landed
    # the foreign row rode through the rebased compaction
    assert t.read().filter(F.col("v") == 99_999_999).count() == 1
    assert t.read().count() == n + 1
    # the rebased layout still Z-orders: both dimensions prune
    t.read_ranges({"a": (0, 9_999)}).count()
    assert t.last_scan["files_skipped"] > 0
    t.read_ranges({"b": (0, 997)}).count()
    assert t.last_scan["files_skipped"] > 0


def test_bloom_corrupt_sidecar_never_crashes_reads(spark, tmp_path):
    """ADVICE r17: a corrupt-but-parseable ``.bf.json`` (non-hex
    payload, or a payload wider than its recorded m) must degrade to
    'no skipping', never crash the read -- on the driver point-lookup
    path AND the executor-side distributed prune path."""
    import json as _json

    df = spark.range(2000).selectExpr("printf('%08d', id) AS k", "id AS v")
    t = CowTable.create(
        spark, str(tmp_path / "corr"), df.repartition(6), bloom_col="k"
    )
    ld = os.path.join(t.path, "_log")
    doc = t._commit_doc(0)
    names = sorted(doc["bloom_files"].items())
    # corrupt one sidecar with non-hex, another with an over-wide
    # payload (decodes past its recorded m -> OverflowError upstream)
    for (b, name), h in zip(names[:2], ["zzüpq-not-hex", "ff" * 10_000]):
        p = os.path.join(ld, name)
        with open(p) as fh:
            e = _json.load(fh)
        e["h"] = h
        with open(p, "w") as fh:
            _json.dump(e, fh)

    # driver path: every present key still found, no exception
    assert t.read_point("k", "00000042").collect()[0]["v"] == 42
    assert t.read_point("k", "00001999").collect()[0]["v"] == 1999
    # the two corrupt files are never refuted; the healthy ones still
    # prune an absent key (chosen INSIDE the key range so range stats
    # cannot prune it first -- only the blooms decide)
    t.read_point("k", "00000zzz").count()
    assert t.last_scan["files_scanned"] >= 2  # corrupt ones unrefutable
    assert t.last_scan["files_skipped_bloom"] >= 1  # healthy ones prune

    # executor path: a merge whose candidate prune goes distributed
    upd = df.filter(F.col("v") < 50).withColumn("v", F.col("v") + 10)
    mdoc = t.merge(upd, "k", bloom_probe="distributed")
    assert mdoc["op"] == "merge"
    assert t.read_point("k", "00000007").collect()[0]["v"] == 17


def test_maintain_bloom_drops_wrong_column_parent_names(spark, tmp_path):
    """ADVICE r17: after a bloom-column change, parent per-file
    sidecar names must NOT be carried (entry() would reject them at
    probe time, silently disabling pruning for those files forever);
    they count as missing and fresh filters are built on the new
    column."""
    import json as _json

    df = spark.range(500).selectExpr(
        "printf('%08d', id) AS k", "printf('v%08d', id) AS v"
    )
    t = CowTable.create(
        spark, str(tmp_path / "colsw"), df.repartition(4), bloom_col="k"
    )
    doc0 = t._commit_doc(0)
    files = t.files(0)
    # simulate the column change: re-run bloom maintenance for the
    # SAME files under a conf indexing column v
    out = t._maintain_bloom(1, files, {"bloom_conf": {
        "col": "v", "m": 8192, "k": 5, "bpk": 10,
    }})
    assert out["bloom_conf"]["col"] == "v"
    fresh = out["bloom_files"]
    assert set(fresh) == {os.path.basename(f) for f in files}
    # every entry is NEW (not the parent's k-column sidecars) and
    # records the new column
    assert not set(fresh.values()) & set(doc0["bloom_files"].values())
    ld = os.path.join(t.path, "_log")
    for name in fresh.values():
        with open(os.path.join(ld, name)) as fh:
            assert _json.load(fh)["col"] == "v"


def test_file_bloom_adapts_k_when_capped(tmp_path):
    """r18: past ``_BLOOM_BITS_MAX / bpk`` rows the bitmap caps below
    rows*bpk; keeping the conf's k (tuned for the full bpk) would
    drive density toward 1 and fpp toward 1.  The write side shrinks
    k toward the capped ratio's optimum -- recorded per entry, so
    probes stay bit-consistent and present keys are never refuted."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (
        _BLOOM_BITS_MAX,
        _bloom_maybe_contains,
        _file_bloom,
    )

    n = 200_000
    path = str(tmp_path / "big.parquet")
    pq.write_table(
        pa.table({"k": [f"key{i:07d}" for i in range(n)]}), path
    )
    conf = {"col": "k", "m": 8192, "k": 40, "bpk": 64}
    entry = _file_bloom(path, "k", conf)
    assert entry["m"] == _BLOOM_BITS_MAX  # cap bit (n*bpk = 12.8M bits)
    assert 1 <= entry["k"] < 40  # adapted toward m/n * ln2 (~29)
    # no false negatives at the adapted k
    for i in range(0, n, 20_000):
        assert _bloom_maybe_contains(
            entry["h"], f"key{i:07d}", entry["m"], entry["k"]
        )
    # and the filter still refutes most absent keys (fpp sane at the
    # capped ~42 bits/key effective)
    false_hits = sum(
        _bloom_maybe_contains(
            entry["h"], f"absent{i:07d}", entry["m"], entry["k"]
        )
        for i in range(200)
    )
    assert false_hits <= 5, false_hits


def test_bloom_bits_max_raises_the_cap_per_table(spark, tmp_path):
    """r18: tables whose compacted files run past the default 1 MiB
    bitmap cap can opt into a bigger cap at create
    (``bloom_bits_max`` -> conf ``mcap``): files then keep their full
    rows*bpk sizing (batch-prunable), and the saturation gate in
    lsh_store._auto_prune honors the raised cap."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_wrangling_osm_xml_with_python_into_mongodb_spark.operators.lsh_store import (
        _auto_prune,
    )
    from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (
        _BLOOM_BITS_MAX,
        _file_bloom,
    )

    # write-side: same 200k-row file as the adapt-k test, but with a
    # raised cap -- the filter keeps full sizing and the conf's k
    n = 200_000
    path = str(tmp_path / "big2.parquet")
    pq.write_table(pa.table({"k": [f"key{i:07d}" for i in range(n)]}), path)
    conf = {"col": "k", "m": 8192, "k": 12, "bpk": 64, "mcap": 1 << 24}
    entry = _file_bloom(path, "k", conf)
    assert entry["m"] == n * 64  # 12.8M bits: past the DEFAULT cap
    assert entry["m"] > _BLOOM_BITS_MAX
    assert entry["k"] == 12  # no cap -> no k adaptation

    # decision-side: 400k rows/file saturates at the default cap but
    # not under mcap, so the gate defers to the economics
    def doc(mcap=None):
        conf = {"col": "bk2", "bpk": 32}
        if mcap:
            conf["mcap"] = mcap
        return {
            "file_stats": {f"f{i}": {"rows": 400_000} for i in range(40)},
            "bloom_conf": conf,
        }

    assert not _auto_prune(doc(), 40)          # default cap: saturated
    assert _auto_prune(doc(1 << 27), 40)       # raised cap: prunes

    # create() validates and persists the cap
    df = spark.range(100).selectExpr("printf('%06d', id) AS k", "id AS v")
    t = CowTable.create(
        spark, str(tmp_path / "mcap"), df, bloom_col="k",
        bloom_bits_max=1 << 25,
    )
    assert t._commit_doc(0)["bloom_conf"]["mcap"] == 1 << 25
    with pytest.raises(ValueError, match="bloom_bits_max"):
        CowTable.create(
            spark, str(tmp_path / "mcap2"), df, bloom_col="k",
            bloom_bits=8192, bloom_bits_max=100,
        )


def test_bloom_build_fans_out_by_bytes_not_just_file_count(
    spark, tmp_path, monkeypatch
):
    """r18: a fold/compaction leaving a FEW huge files must not build
    multi-second filters serially on the driver -- past the byte
    threshold the build goes executor-side even under 16 files, and
    the entries are identical either way."""
    import data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table as ct

    import json as _json

    df = spark.range(3000).selectExpr("printf('%08d', id) AS k", "id AS v")
    monkeypatch.setattr(ct, "_BLOOM_BUILD_DRIVER_MAX_BYTES", 1)
    t = CowTable.create(
        spark, str(tmp_path / "bb"), df.repartition(3), bloom_col="k"
    )
    doc = t._commit_doc(0)
    assert len(t.files(0)) == 3  # under the FILE-count rule: the
    # byte threshold alone sent this build executor-side
    ld = os.path.join(t.path, "_log")
    conf = doc["bloom_conf"]
    by_base = {os.path.basename(f): f for f in t.files(0)}
    for b, name in doc["bloom_files"].items():
        with open(os.path.join(ld, name)) as fh:
            got = _json.load(fh)
        # strict parity: recompute THIS file's filter in-process
        want = ct._file_bloom(by_base[b], "k", conf)
        assert (got["h"], got["m"], got["k"]) == (
            want["h"], want["m"], want["k"]
        ), b
    # and the lookups prune
    assert t.read_point("k", "00000042").collect()[0]["v"] == 42
    assert t.last_scan["files_skipped_bloom"] >= 1
