"""Profile the CDF cow-merge + dv-delete lifecycle (m22 shape) for the
r19 optimization round: per-phase wall, Spark JOB COUNT per phase (the
per-merge coordination floor VERDICT r18 item 3 targets), and -- the
durable instrument on this noisy box -- process CPU deltas.

Usage:  python tools/prof_cdf_r19.py [n_reps]

Prints one JSON line: {"create": {...}, "merge": {...}, "delete": {...}}
with wall / n_jobs / cpu per phase, averaged over n_reps lifecycles in
ONE JVM (first rep reported separately: it pays first-touch warmup).
"""

from __future__ import annotations

import json
import os
import resource
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_wrangling_osm_xml_with_python_into_mongodb_spark.plans.queries import (  # noqa: E402
    _t,
)
from data_wrangling_osm_xml_with_python_into_mongodb_spark.session import (  # noqa: E402
    get_spark,
)
from data_wrangling_osm_xml_with_python_into_mongodb_spark.sources.cow_table import (  # noqa: E402
    CowTable,
)


def _jvm_pids() -> list[int]:
    """Every live java process of this session (driver-local JVM +
    python workers count separately; workers are tiny here)."""
    me = os.getpid()
    pids = []
    for n in os.listdir("/proc"):
        if not n.isdigit():
            continue
        try:
            with open(f"/proc/{n}/stat") as f:
                parts = f.read().split()
            if "java" in parts[1]:
                pids.append(int(n))
        except OSError:
            continue
    _ = me
    return pids


def _cpu() -> float:
    """Process-tree CPU: this python + LIVE java children via /proc
    (utime+stime incl. dead grandchildren of the JVM)."""
    hz = os.sysconf("SC_CLK_TCK")
    a = resource.getrusage(resource.RUSAGE_SELF)
    b = resource.getrusage(resource.RUSAGE_CHILDREN)
    total = a.ru_utime + a.ru_stime + b.ru_utime + b.ru_stime
    for pid in _jvm_pids():
        try:
            with open(f"/proc/{pid}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            total += (int(parts[11]) + int(parts[12])) / hz
        except OSError:
            continue
    return total


class _JobCounter:
    """Count Spark jobs via the status tracker (no listener plumbing:
    job ids are monotonically increasing per context)."""

    def __init__(self, sc):
        self.sc = sc

    def snapshot(self) -> int:
        ids = self.sc.statusTracker().getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0


def main() -> int:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="prof_cdf_r19")
    sc = spark.sparkContext

    orders = _t(spark, sf_dir, "orders").select(
        F.md5(F.col("o_orderkey").cast("string")).alias("k"),
        "o_orderkey", "o_orderpriority", "o_totalprice",
    )
    updates = orders.filter(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + F.lit(50000.0)
    )
    inserts = orders.filter(F.col("o_orderkey") % 103 == 0).select(
        F.md5((F.col("o_orderkey") + 20000000).cast("string")).alias("k"),
        (F.col("o_orderkey") + 20000000).alias("o_orderkey"),
        "o_orderpriority", "o_totalprice",
    )
    src = updates.unionByName(inserts)
    dels = orders.filter(F.col("o_orderkey") % 97 == 0).select("k")
    dels2 = orders.filter(F.col("o_orderkey") % 89 == 0).select("k")

    # warm footers/JVM once
    orders.count()

    def job_ids():
        ids = sc.statusTracker().getJobIdsForGroup(None)
        return set(ids)

    def job_names(new_ids) -> list[str]:
        st = sc.statusTracker()
        out = []
        for jid in sorted(new_ids):
            ji = st.getJobInfo(jid)
            names = []
            if ji is not None:
                for sid in ji.stageIds:
                    si = st.getStageInfo(sid)
                    if si is not None:
                        names.append(si.name.split("\n")[0][-60:])
            out.append(f"j{jid}: " + " | ".join(names))
        return out

    reps = []
    for rep in range(n_reps):
        work = tempfile.mkdtemp(prefix=f"prof_cdf_{rep}_")
        out: dict = {}
        for name, fn in (
            ("create", lambda: CowTable.create(
                spark, f"{work}/orders", orders.repartition(12),
                change_feed=True,
            )),
        ):
            j0, c0, t0 = job_ids(), _cpu(), time.time()
            table = fn()
            out[name] = {
                "wall": round(time.time() - t0, 3),
                "jobs": len(job_ids() - j0),
                "cpu": round(_cpu() - c0, 2),
            }
        j0, c0, t0 = job_ids(), _cpu(), time.time()
        mdoc = table.merge(src, "k", deletes=dels)
        new = job_ids() - j0
        out["merge"] = {
            "wall": round(time.time() - t0, 3),
            "jobs": len(new),
            "cpu": round(_cpu() - c0, 2),
            "change_files": len(mdoc.get("change_files", [])),
            "files_rewritten": mdoc["files_rewritten"],
            "job_names": job_names(new) if rep == 0 else None,
        }
        j0, c0, t0 = job_ids(), _cpu(), time.time()
        ddoc = table.delete("k", deletes=dels2)
        new = job_ids() - j0
        out["delete"] = {
            "wall": round(time.time() - t0, 3),
            "jobs": len(new),
            "cpu": round(_cpu() - c0, 2),
            "change_files": len(ddoc.get("change_files", [])),
            "job_names": job_names(new) if rep == 0 else None,
        }
        # read-back cost of the feed (what m22 aggregates / m23 streams)
        j0, c0, t0 = job_ids(), _cpu(), time.time()
        table.read_changes(1).groupBy("_change_type").count().collect()
        out["read_changes"] = {
            "wall": round(time.time() - t0, 3),
            "jobs": len(job_ids() - j0),
            "cpu": round(_cpu() - c0, 2),
        }
        reps.append(out)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
