"""The r19 commit-doc memo (sources/cow_table._DOC_CACHE): parsed
commit docs are process-cached keyed by (path, mtime_ns, size) --
commit docs are immutable once linked, but they carry per-file stats,
so one mutation used to re-parse the head doc 6-10 times.  Pinned
here: cache hits return the committed content, and a table REMOVED
and RE-CREATED at the same path can never serve a stale doc (the
stat-identity key)."""

from __future__ import annotations

import shutil
import sys

import pytest

sys.path.insert(0, "/root/repo")

from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (  # noqa: E402
    CowTable,
)


def test_doc_cache_serves_committed_content(spark, tmp_path):
    df = spark.range(10).selectExpr("id AS k", "id AS v")
    t = CowTable.create(spark, str(tmp_path / "t"), df)
    d1 = t._commit_doc(0)
    d2 = CowTable(spark, str(tmp_path / "t"))._commit_doc(0)
    assert d1 is d2  # memo hit across instances
    assert d1["op"] == "create" and d1["version"] == 0


def test_doc_cache_never_stale_after_recreate(spark, tmp_path):
    p = str(tmp_path / "re")
    t = CowTable.create(
        spark, p,
        spark.range(5).selectExpr("id AS k", "id AS v").coalesce(1),
    )
    assert t._commit_doc(0)["files_written"] == 1
    shutil.rmtree(p)
    t2 = CowTable.create(
        spark, p,
        spark.range(20).selectExpr("id AS k", "id AS v").repartition(2),
    )
    doc = t2._commit_doc(0)
    assert doc["files_written"] == 2  # fresh table's doc, not the memo
    assert len(t2.read().collect()) == 20


def test_doc_cache_missing_version_raises(spark, tmp_path):
    t = CowTable.create(
        spark, str(tmp_path / "m"),
        spark.range(3).selectExpr("id AS k", "id AS v"),
    )
    with pytest.raises(OSError):
        t._commit_doc(7)
