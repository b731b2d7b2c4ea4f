"""The r19 FUSED change-feed write (sources/cow_table.py
``_write_fused_cdc_files``): a change-feed cow merge reads the
rewritten files' live rows ONCE and one partitioned staging write
emits data files and change files together.  Invariants pinned here:

* data files physically carry a hidden all-NULL ``_change_type``
  column, and every reader surface (snapshot read, recorded schema)
  projects it away;
* the per-merge Spark JOB budget: the fused shape runs the whole CDF
  merge in a bounded number of driver jobs (the pre-r19 shape ran
  ~15 at this stage count -- VERDICT r18 next #3);
* the bulk matched-key path (> _MATCHED_INLINE_MAX triples) pins the
  matched set as a localCheckpoint instead of driver literals, and
  still produces the exact feed (VERDICT r18 next #7);
* a losing racer's fused output (data dir, change dir, staging dir)
  is cleaned up;
* the change write's file sizing degrades to coalesce(8), not
  shuffle-partition scatter, when a caller-built session has AQE off
  (ADVICE r18 #4).
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources import (  # noqa: E402
    cow_table as ct_mod,
)
from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (  # noqa: E402
    CowTable,
)


def _mk(spark, tmp_path, name, n=40, parts=2):
    df = (
        spark.range(n)
        .selectExpr("id AS k", "id * 10 AS v")
        .repartition(parts)
    )
    return CowTable.create(
        spark, str(tmp_path / name), df, change_feed=True
    )


def _feed(t, lo, hi=None):
    return sorted(
        tuple(r)
        for r in t.read_changes(lo, hi)
        .select("k", "v", "_change_type")
        .collect()
    )


def _merge_once(spark, t):
    """The canonical mixed mutation: update k=5, insert k=100,
    delete k=7."""
    t.merge(
        spark.createDataFrame([(5, 555), (100, 1000)], "k long, v long"),
        "k",
        deletes=spark.createDataFrame([(7,)], "k long"),
    )
    return [
        (5, 50, "update_preimage"),
        (5, 555, "update_postimage"),
        (7, 70, "delete"),
        (100, 1000, "insert"),
    ]


def test_fused_data_files_hide_change_type(spark, tmp_path):
    t = _mk(spark, tmp_path, "hide")
    expect = _merge_once(spark, t)
    assert _feed(t, 1, 1) == expect
    doc = t._commit_doc(1)
    new_files = [
        f for f in doc["files"] if os.path.basename(f) not in {
            os.path.basename(g) for g in t._commit_doc(0)["files"]
        }
    ]
    assert new_files, "fused merge wrote no data files"
    # the raw parquet carries the hidden column, all NULL
    raw = spark.read.parquet(*new_files)
    assert "_change_type" in raw.columns
    assert raw.filter(F.col("_change_type").isNotNull()).count() == 0
    # ...but no reader surface shows it
    assert "_change_type" not in t.read().columns
    rec = [f["name"] for f in doc["schema"]["fields"]]
    assert "_change_type" not in rec
    # snapshot content is the merged row set
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[5] == 555 and got[100] == 1000 and 7 not in got
    # no staging leftovers
    stage = os.path.join(t.path, "_stage")
    assert not os.path.isdir(stage) or os.listdir(stage) == []


def test_fused_merge_job_budget(spark, tmp_path):
    """One CDF cow merge = a bounded driver-job count (VERDICT r18
    next #3).  The pre-r19 shape ran ~15 jobs for this mutation
    (separate change write + data write + per-attempt envelope agg +
    dk probe); the fused shape runs the touch probe, the detection
    collect, and ONE staging write."""
    t = _mk(spark, tmp_path, "budget")
    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup(None))
    _merge_once(spark, t)
    after = set(st.getJobIdsForGroup(None))
    n_jobs = len(after - before)
    assert n_jobs <= 10, (
        f"CDF merge ran {n_jobs} driver jobs -- the fused write "
        "budget (<=10, measured 8-9 incl. AQE stage jobs) regressed"
    )


def test_bulk_matched_path_pins_not_inlines(spark, tmp_path, monkeypatch):
    """Past _MATCHED_INLINE_MAX matched triples the detection probe
    overflows: the matched keys pin as ONE localCheckpoint (driver
    never materializes the set) and the fused write joins against the
    pinned frame -- same feed, same snapshot (VERDICT r18 next #7)."""
    monkeypatch.setattr(ct_mod, "_MATCHED_INLINE_MAX", 3)
    calls = []
    cls = type(spark.range(1))  # the concrete DataFrame class
    orig = cls.localCheckpoint

    def spy(self, *a, **k):
        calls.append(self.columns)
        return orig(self, *a, **k)

    monkeypatch.setattr(cls, "localCheckpoint", spy)
    t = _mk(spark, tmp_path, "bulk")
    src = spark.createDataFrame(
        [(k, k * 1000) for k in range(10)], "k long, v long"
    )
    t.merge(src, "k")
    # the matched triples (cap overflowed at 3 < 10 matches) pinned
    assert ["_file", "_k", "_s"] in calls, calls
    got = {r["k"]: r["v"] for r in t.read().collect()}
    for k in range(10):
        assert got[k] == k * 1000
    feed = _feed(t, 1, 1)
    assert (3, 30, "update_preimage") in feed
    assert (3, 3000, "update_postimage") in feed
    assert len([x for x in feed if x[2] == "insert"]) == 0


def test_fused_loser_cleanup(spark, tmp_path, monkeypatch):
    """A merge that loses the commit race removes its fused output --
    data dir, change dir, staging -- so the raw change-feed glob
    never sees a loser's rows once cleanup ran."""
    t = _mk(spark, tmp_path, "loser")
    # steal version 1 mid-merge: the racing winner's commit lands
    # right after the loser's fused write (stats harvest) finishes
    doc0 = t._commit_doc(0)
    fake = {**doc0, "version": 1, "op": "merge", "parent": 0}
    orig_h = CowTable._harvest_file_stats
    state = {"done": False}

    def steal(self, files):
        if not state["done"]:
            state["done"] = True
            with open(
                os.path.join(t.path, "_log", "00000001.json"), "w"
            ) as f:
                json.dump(fake, f)
        return orig_h(self, files)

    monkeypatch.setattr(CowTable, "_harvest_file_stats", steal)
    chg_root = os.path.join(t.path, "changes")
    with pytest.raises(ct_mod.ConcurrentWriteError):
        _merge_once(spark, t)
    # loser's change dir removed (or empty), no stage leftovers
    leftover = [
        d for d in (os.listdir(chg_root) if os.path.isdir(chg_root) else [])
        if os.listdir(os.path.join(chg_root, d))
    ]
    assert leftover == []
    stage = os.path.join(t.path, "_stage")
    assert not os.path.isdir(stage) or os.listdir(stage) == []
    # the stolen version's files are exactly v0's -- no loser data refs
    assert t.files(1) == doc0["files"]


def test_change_write_coalesces_without_aqe(spark, tmp_path):
    """ADVICE r18 #4: with adaptive execution off, the change write's
    REBALANCE hint would no-op and scatter the delta over
    shuffle-partition near-empty files; the fallback bounds it to 8."""
    t = _mk(spark, tmp_path, "noaqe", n=60, parts=3)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        ddoc = t.delete("k", values=[1, 2, 3, 4, 5])
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert ddoc.get("change_files")
    assert len(ddoc["change_files"]) <= 8
    assert sorted(x[2] for x in _feed(t, 1, 1)) == ["delete"] * 5
